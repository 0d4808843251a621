package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small reusable relational operators (library surface behind several
  * declared queries). */
object Ops {

  /** Exact top-k rows per group, two-phase salted (see windowRank
    * scaladoc: a single window over a low-cardinality partition key
    * serializes into one task per group; phase 1 ranks within
    * (group, salt) at full parallelism and prunes to ≤ groups·salts·k
    * rows, phase 2 ranks the survivors exactly). `ordering` must be a
    * total order (add tie-break columns) for deterministic output. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], ordering: Seq[Column],
      k: Int, salts: Int = 64): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val w1 = Window.partitionBy(groupCols :+ col("__salt"): _*).orderBy(ordering: _*)
    val w2 = Window.partitionBy(groupCols: _*).orderBy(ordering: _*)
    salted
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= k)
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .drop("__salt", "__rn1")
  }

  /** Exact deduplication: keep one row per key, the first under
    * `ordering` (deterministic, unlike dropDuplicates). One shuffle on
    * the key columns. */
  def dedupKeepFirst(df: DataFrame, keyCols: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
