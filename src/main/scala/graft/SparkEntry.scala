package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query registries; every entry in `queries`
  * that is ANSI-SQL-expressible has a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.multiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CandyQueries.queries ++ TextQueries.queries ++
      AnalyticsQueries.queries ++ Analytics2Queries.queries ++ Analytics3Queries.queries ++
      Tpch2Queries.queries ++
      CdcOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++
      graft.multimodal.MultimodalOps.queries ++ graft.sources.LayoutQueries.queries ++
      graft.sources.v2.RangeSourceQueries.queries ++
      graft.sources.BucketedQueries.queries ++ graft.sources.ZOrderQueries.queries ++
      graft.sources.JdbcQueries.queries ++ graft.streaming.StreamingQueries.queries

  /** Queries whose DataFrame side spins a non-relational LIFECYCLE —
    * the real StreamExecution engine (checkpoints, RocksDB state) or an
    * embedded-Derby JDBC round-trip. Shared by SqlParitySpec (their
    * batch oracle SQL replays nothing the streaming specs don't already
    * gate end-to-end) and tools/PlanAudit (no static batch plan exists
    * to census). One list so the two consumers cannot drift when the
    * next streaming query lands. */
  val nonRelationalLifecycle: Set[String] = Set(
    "q71_streaming_daily", "q92_streaming_dedup", "q95_streaming_sessions",
    "q96_stream_stream_join", "q115_foreachbatch_merge", "q118_checkpoint_recovery",
    "q131_mapgroups_totals", "q184_tws_profile", "q185_statestore_read",
    "q72_jdbc_roundtrip")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ CandyQueries.oracle ++ TextQueries.oracle ++
      AnalyticsQueries.oracle ++ Analytics2Queries.oracle ++ Analytics3Queries.oracle ++
      Tpch2Queries.oracle ++
      CdcOps.oracle ++ DedupOps.oracle ++ SimilarityOps.oracle ++
      graft.multimodal.MultimodalOps.oracle ++ graft.sources.LayoutQueries.oracle ++
      graft.sources.v2.RangeSourceQueries.oracle ++
      graft.sources.BucketedQueries.oracle ++ graft.sources.ZOrderQueries.oracle ++
      graft.sources.JdbcQueries.oracle ++ graft.streaming.StreamingQueries.oracle
}
