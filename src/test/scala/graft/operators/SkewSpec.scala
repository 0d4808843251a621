package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join on skewed data") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val large = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 5).otherwise(0L).as("k"),
        col("id").as("v"))
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k")).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Skew.saltedJoin(large, small, "k", salts = 8).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(salted.orderBy("name").collect().toSeq ===
      plain.orderBy("name").collect().toSeq)
  }

  test("saltedSum equals plain aggregation") {
    val df = spark.range(5000)
      .select((col("id") % 3).as("k"), col("id").as("v"))
    val plain = df.groupBy(col("k")).agg(sum("v").as("total"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val salted = Skew.saltedSum(df, col("k"), col("v"), salts = 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(salted === plain)
  }
}
