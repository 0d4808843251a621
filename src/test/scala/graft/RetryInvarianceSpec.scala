package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Task-RETRY invariance: the sibling of PartitionInvarianceSpec's
  * partition-count pin. A 1000-executor cluster retries tasks as a
  * matter of course (preemption, spot loss, straggler kill); an
  * operator whose answer changes under a retried task is wrong at
  * scale no matter what it scores on a clean local run. The session
  * runs local[8,2] (one retry), and the injector fails partition 0's
  * FIRST attempt — so the map-side work of the aggregation under test
  * really executes twice and the discarded attempt must leave no
  * trace.
  *
  * Two layers: (1) the mergeable-sketch family aggregated over a
  * flaky INPUT (their commutative idempotent merges are the design
  * claim that retries are free — prove it); (2) a sample of declared
  * queries re-collected through a fail-once final stage, which forces
  * shuffle-fetch + recompute of the result stage.
  */
class RetryInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Fails the first attempt of partition 0, passes rows through
    * untouched on the retry. */
  private def flaky[T: Encoder](ds: Dataset[T]): Dataset[T] =
    ds.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected fail-once task failure")
      it
    }

  private def docHashes: Dataset[Long] = {
    import spark.implicits._
    Tables(spark, sf, "documents")
      .select(xxhash64(col("text"))).as[Long].repartition(4)
  }

  test("KMV sketch aggregation is bit-identical under an injected task retry") {
    import spark.implicits._
    val agg = new graft.functions.KmvSketch(64).toColumn
    val clean = docHashes.select(agg).collect().head.toSeq
    val retried = flaky(docHashes).select(agg).collect().head.toSeq
    assert(retried === clean)
    assert(clean.nonEmpty)
  }

  test("Misra-Gries heavy-hitter aggregation is identical under an injected task retry") {
    import spark.implicits._
    val words = Tables(spark, sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).as[String].repartition(4)
    val agg = new graft.functions.MisraGries(8).toColumn
    val clean = words.select(agg).collect().head
    val retried = flaky(words).select(agg).collect().head
    assert(retried === clean)
  }

  test("grouped sum/count over a flaky input matches the clean run") {
    import spark.implicits._
    def rollup(ds: Dataset[(String, Long)]) = ds.toDF("source", "n")
      .groupBy("source").agg(count(lit(1)).as("docs"), sum("n").as("chars"))
      .orderBy("source").collect().toSeq
    val base = Tables(spark, sf, "documents")
      .select(col("source"), col("n_chars")).as[(String, Long)].repartition(4)
    assert(rollup(flaky(base)) === rollup(base))
  }

  test("declared queries re-collected through a fail-once final stage are unchanged") {
    // one per family whose retry story matters most: exact relational
    // agg, hash dedup, bounded-memory sketch, KMV set algebra — plus
    // the round-7 pair: the custom as-of merge exec reached through
    // the injected SQL grammar (deterministic given its sorted
    // co-partitioned inputs, so a recomputed partition must replay
    // bit-identically) and the AQE skew join (runtime-split partitions
    // recompute under retry too)
    val sample = Seq("q01_pricing_summary", "q50_dedup_exact",
      "q73_heavy_hitters", "q199_kmv_intersect",
      "q206_asof_sql_grammar", "q207_aqe_skew_join",
      // round-8: the lake-catalog snapshot read — a recomputed split
      // re-serves the same immutable snapshot rows
      "q208_sql_merge_into")
    for (name <- sample) {
      val clean = SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      val retried = SparkEntry.queries(name)(spark, sf)
        .rdd.mapPartitions { it =>
          val tc = TaskContext.get()
          if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
            throw new RuntimeException("injected fail-once task failure")
          it
        }.collect().map(_.toString).sorted.toSeq
      assert(retried === clean, s"$name changed under a retried task")
    }
  }
}
