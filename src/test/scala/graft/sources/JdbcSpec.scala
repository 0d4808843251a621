package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** JDBC source/sink round-trip against embedded Derby (ships with
  * Spark for the Hive metastore) — write, full read, partitioned read.
  */
class JdbcSpec extends SparkSpec {

  private lazy val cfg = {
    val dir = java.nio.file.Files.createTempDirectory("derby_db")
    Jdbc.JdbcConfig(
      url = s"jdbc:derby:$dir/testdb;create=true",
      user = "", password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
  }

  test("write then read round-trips rows and schema") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "v")
    Jdbc.write(df, cfg, "t_roundtrip", SaveMode.Overwrite)
    val back = Jdbc.read(spark, cfg, "t_roundtrip")
    assert(back.count() === 100)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq === Seq("id", "name", "v"))
    val row = back.filter(col("id") === 42).collect().head
    assert(row.getAs[String]("name") === "name_42")
    assert(math.abs(row.getAs[Double]("v") - 63.0) < 1e-9)
  }

  test("partitioned read splits the scan and preserves content") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, i % 7)).toDF("id", "grp")
    Jdbc.write(df, cfg, "t_part", SaveMode.Overwrite)
    val back = Jdbc.readPartitioned(spark, cfg, "t_part",
      partitionColumn = "id", lowerBound = 1, upperBound = 500, numPartitions = 4)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 500)
    assert(back.agg(sum("id")).collect().head.getLong(0) === (1L to 500L).sum)
  }
}
