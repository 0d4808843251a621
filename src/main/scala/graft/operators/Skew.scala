package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split handles most cases
  * at runtime; explicit salting remains the tool of choice when one
  * join key dominates so heavily that even split shuffle blocks
  * straggle, or when the skewed side feeds a groupBy.
  */
object Skew {

  /** Salted equi-join of a skewed large side against a smaller side:
    * the large side gets a random salt in [0, salts); the small side is
    * replicated `salts` times (explode of a literal range), so the
    * shuffle key (key, salt) spreads each hot key over `salts`
    * reducers. Use when `small` is modest (it is replicated!) but too
    * big or too dynamic to broadcast. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    // Only join types that never emit an unmatched SMALL-side row are
    // correct here: with right/full outer, an unmatched small row would
    // surface once per salt replica.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin replicates the small side; joinType '$joinType' would " +
        "duplicate unmatched small-side rows (use inner/left/semi/anti)")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed groupBy keys: partial aggregate
    * on (key, salt), then final aggregate on key. `partial` must be an
    * algebraic aggregate expressible in two phases (sum/count/min/max).
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame =
    df.groupBy(key.as("k"),
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)).as("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("k"))
      .agg(sum(col("__partial")).as("total"))
}
