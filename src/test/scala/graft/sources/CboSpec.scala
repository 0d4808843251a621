package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Pins that ANALYZE TABLE statistics provably change plan STRATEGY
  * (q203): the same filtered dimension join runs sort-merge without
  * CBO and broadcast-hash with it, at a broadcast threshold derived
  * from the engine's own two estimates — so the pin tracks fixture
  * sizes instead of rotting against hardcoded byte counts. */
class CboSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withConfs[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach { case (k, ov) =>
      ov.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** Optimizer estimate of the filtered customer dim under a given CBO
    * setting. Fresh DataFrame per call — QueryExecution memoizes, so a
    * reused one would carry the other setting's plan. */
  private def filteredDimEstimate(cbo: Boolean): BigInt = {
    val (_, ct) = CboQueries.analyzedTables(spark, sf)
    withConfs("spark.sql.cbo.enabled" -> cbo.toString) {
      // same shape JoinSelection costs: the join prunes the dim to its
      // key column, and size-only estimation scales Project output by
      // column width — measuring the unprojected filter would overstate
      // the size the planner actually compares against the threshold
      spark.table(ct).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .queryExecution.optimizedPlan.stats.sizeInBytes
    }
  }

  test("column statistics shrink the filtered-dimension estimate (selectivity = 1/ndv)") {
    val withStats = filteredDimEstimate(cbo = true)
    val sizeOnly = filteredDimEstimate(cbo = false)
    // size-only estimation costs the filter at the full table size;
    // NDV-based selectivity must land strictly below it
    assert(withStats < sizeOnly,
      s"CBO estimate $withStats should be below size-only estimate $sizeOnly")
  }

  test("the same join flips sort-merge -> broadcast-hash when CBO reads the stats") {
    val withStats = filteredDimEstimate(cbo = true)
    val sizeOnly = filteredDimEstimate(cbo = false)
    val thr = ((withStats + sizeOnly) / 2).toString
    // AQE off: the flip under test is the STATIC planner's — AQE's
    // runtime re-plan would broadcast from observed sizes either way
    def join(cbo: Boolean) = withConfs(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> thr) {
      // the production builder: plans eagerly inside its own CBO window
      CboQueries.statsJoinPlanned(spark, sf, cbo).queryExecution.executedPlan
    }
    val off = join(cbo = false).collect { case n => n }
    assert(off.exists(_.isInstanceOf[SortMergeJoinExec]) &&
      !off.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"without CBO the filtered dim should NOT broadcast at threshold $thr:\n${join(cbo = false)}")
    val on = join(cbo = true).collect { case n => n }
    assert(on.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"with CBO the filtered dim should broadcast at threshold $thr:\n${join(cbo = true)}")
  }

  test("CBO on and off produce identical rows") {
    val a = CboQueries.statsJoinPlanned(spark, sf, cbo = true).collect().toSeq
    val b = CboQueries.statsJoinPlanned(spark, sf, cbo = false).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q203 leaves no session-conf residue") {
    val before = spark.conf.getOption("spark.sql.cbo.enabled")
    CboQueries.cboStatsJoin(spark, sf).collect()
    assert(spark.conf.getOption("spark.sql.cbo.enabled") === before)
  }
}
