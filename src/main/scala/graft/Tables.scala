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
      // events.ts has shipped in two physical shapes across fixture
      // generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
      // reader only surfaces as int64 nanos via nanosAsLong — and plain
      // TIMESTAMP(US). Normalize either to a TimestampType micros column
      // (normalizeEventTs), the same value DuckDB sees, so oracle
      // comparisons stay exact.
      // NOTE: nanosAsLong has no per-read DataFrameReader option — it is
      // consulted during schema conversion at both planning AND execution,
      // so a set/restore dance around this call would break later task
      // runs. Setting it session-wide is deliberate; it only changes how
      // TIMESTAMP(NANOS) columns surface (as long), and no other testdata
      // table has one, so other reads are unaffected.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Normalize an events frame's `ts` to TimestampType microseconds
    * regardless of the physical column shape the fixture was written
    * with: int64 nanos (a TIMESTAMP(NANOS) file read under nanosAsLong)
    * truncates to micros; TIMESTAMP_NTZ (a TIMESTAMP(US)
    * isAdjustedToUTC=false file under the default NTZ inference) casts
    * instant-preserving because every graft session pins
    * spark.sql.session.timeZone=UTC; TimestampType passes through.
    * Works identically on batch and streaming frames (pure projection).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // an int64 ts has shipped as NANOS (TIMESTAMP(NANOS) surfaced
        // under nanosAsLong); a future fixture generation could ship
        // MICROS as plain int64, and blindly dividing would silently
        // shift every event timestamp 1000×. The two shapes are
        // unambiguous by magnitude — nanos since epoch are ~1.7e18,
        // micros ~1.7e15, disjoint for any date between 1973 and 5138 —
        // so decide per value (two long compares, codegen'd, works on
        // batch and streaming frames alike) and fail LOUDLY on a
        // magnitude that is neither, rather than guess.
        val nanosLow  = lit(100000000000000000L) // 1e17: 1973 in nanos
        val microsLow = lit(100000000000000L)    // 1e14: 1973 in micros
        df.withColumn("ts", timestamp_micros(
          when(col("ts").isNull, lit(null).cast("long"))
            .when(col("ts") >= nanosLow, expr("ts DIV 1000"))
            .when(col("ts") >= microsLow, col("ts"))
            .otherwise(raise_error(concat(
              lit("events.ts int64 magnitude is neither nanos nor micros since epoch: "),
              col("ts").cast("string"))).cast("long"))))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
