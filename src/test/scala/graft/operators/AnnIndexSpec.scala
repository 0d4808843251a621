package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Lifecycle pins for the persisted ANN index (q204): build-once,
  * rebuild-on-stale, probe-never-retrains, and cell-level partition
  * pruning in the probe plan. */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: through.flatMap(flatten)
  }

  test("persisted probe answers exactly what the inline trained-IVF build answers") {
    val persisted = AnnIndex.probe(spark, sf).collect().toSeq
    val inline = SimilarityOps.annIvf(spark, sf, trainIters = 2).collect().toSeq
    assert(persisted === inline)
    assert(persisted.size === 50)
  }

  test("build runs once across probes; a stale index rebuilds before answering") {
    AnnIndex.probe(spark, sf).collect()
    val builds = AnnIndex.buildCount.get()
    AnnIndex.probe(spark, sf).collect()
    assert(AnnIndex.buildCount.get() === builds, "second probe must reuse the index")
    AnnIndex.invalidate(spark, sf)
    val again = AnnIndex.probe(spark, sf).collect().toSeq
    assert(AnnIndex.buildCount.get() === builds + 1,
      "a corpus-count mismatch must force a rebuild")
    assert(again === AnnIndex.probe(spark, sf).collect().toSeq)
  }

  test("staleness guard rejects a decimal-prefix collision (recorded 10n, corpus n)") {
    AnnIndex.probe(spark, sf).collect()
    val builds = AnnIndex.buildCount.get()
    // recorded count is a decimal EXTENSION of the live count: a bare
    // substring match on "rows":n would falsely call this fresh and
    // serve the stale index silently — the terminator-inclusive check
    // must see the mismatch and rebuild
    val n = SimilarityOps.embCount(spark, sf)
    AnnIndex.writeMeta(spark, sf, n * 10)
    AnnIndex.probe(spark, sf).collect()
    assert(AnnIndex.buildCount.get() === builds + 1,
      "a prefix-colliding corpus count must still force a rebuild")
  }

  test("probe plan prunes to the nprobe cell directories and never re-trains") {
    val df = AnnIndex.probe(spark, sf)
    df.collect()
    val scans = flatten(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    val indexScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("graft_ivf_index_")))
    assert(indexScans.nonEmpty, "probe must read the persisted index")
    // the IN-list on the partition column is a partition filter: only
    // the probed cells' directories are listed and read
    assert(indexScans.forall(_.partitionFilters.nonEmpty),
      s"index scan must carry partition filters:\n${df.queryExecution.executedPlan}")
    // the original corpus appears exactly once — the 1-row query-vector
    // fetch; any more would mean the probe re-derives index state from
    // the corpus (the re-training smell this lifecycle exists to kill)
    val corpusScans = scans.count(_.relation.location.rootPaths
      .exists(_.toString.contains("embeddings")))
    assert(corpusScans === 1,
      s"probe must read the corpus only for the query vector, saw $corpusScans scans")
  }
}
