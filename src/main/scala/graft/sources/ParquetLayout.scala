package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout writers — the storage-side half of the 100 TB story.
  *
  * Partitioning prunes IO: a date-partitioned fact table turns a
  * time-range query into a directory listing instead of a full scan.
  * Bucketing pre-shuffles: two tables bucketed on the same key with the
  * same bucket count join with NO exchange — at cluster scale that
  * deletes the dominant cost of repeated fact-fact joins.
  */
object ParquetLayout {

  /** Write `df` partitioned by the given columns (hive-style dirs).
    * Readers filtering on partition columns get pruning for free. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Save as a bucketed (+ optionally sorted) table in the session
    * catalog. Joins/aggregations on the bucket key skip the shuffle
    * when both sides share the bucket spec. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
