package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table; schema is identical across scale factors.
  * Reference analog: the JDBC/Mongo loaders at
  * /root/reference/src/data_processor.py:272-355 — here a columnar scan
  * with pushdown instead of a full-table JDBC read.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read nanos as long and truncate to micros — the
      // same conversion DuckDB applies when it maps the column to its
      // microsecond TIMESTAMP, so oracle comparisons stay exact.
      // NOTE: nanosAsLong has no per-read DataFrameReader option — it is
      // consulted during schema conversion at both planning AND execution,
      // so a set/restore dance around this call would break later task
      // runs. Setting it session-wide is deliberate; it only changes how
      // TIMESTAMP(NANOS) columns surface (as long), and no other testdata
      // table has one, so other reads are unaffected.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
