package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, BloomFilterAggregate, Complete}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}

/** Explicit Bloom-filter semi-join pruning — the runtime-filter shape
  * Spark's own `InjectRuntimeFilter` rule builds, exposed as a
  * deterministic operator instead of a threshold-gated optimization.
  *
  * Spark only injects its bloom filter when the application side scans
  * >10 GB (`runtime.bloomFilter.applicationSideScanSizeThreshold`) and
  * the creation side aggregates <10 MB, so the rewrite is invisible at
  * fixture scale and — worse — conf-dependent in production: the exact
  * plans a 100 TB job depends on appear and disappear with size
  * estimates. This operator bakes the same two pieces into the logical
  * plan unconditionally:
  *
  *  - a non-correlated scalar subquery aggregating the BUILD side's
  *    join key into a bloom filter (`BloomFilterAggregate` over
  *    `xxhash64(key)` — partial-merged, a few MB of sketch per
  *    executor, broadcast once as a subquery result);
  *  - a `BloomFilterMightContain(sketch, xxhash64(key))` predicate on
  *    the APPLICATION side, evaluated at the scan — rows whose key
  *    cannot possibly join are dropped BEFORE the shuffle.
  *
  * Bloom filters have no false negatives, so composing this filter
  * with the real join changes no result — only the shuffled volume
  * (the q123 oracle is therefore the plain join). False positives just
  * pass through to the join. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling only the ~selectivity
  * fraction that can match a filtered dimension.
  *
  * Null keys: `xxhash64(null)` folds to the seed hash, so null keys
  * survive the bloom probe and die in the join itself — same net
  * semantics as Spark's injected filter.
  */
object BloomFilterPrune {

  /** `app` filtered to rows whose `appKey` might appear in `build`'s
    * `buildKey` set. `expectedItems` sizes the sketch (1M items ≈ 1.2 MB
    * at the default FPP); it is a hint, not a bound — an undersized
    * bloom only raises the false-positive rate.
    */
  def semiFilter(app: DataFrame, appKey: String, build: DataFrame, buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val appPlan = app.queryExecution.analyzed
    val buildPlan = build.queryExecution.analyzed

    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$n' on the $side side (have ${p.output.map(_.name)})"))

    // 42L is XxHash64's default seed (the same one Spark's injected
    // runtime filter and the xxhash64() SQL function use)
    val buildHash = new XxHash64(Seq(attr(buildPlan, buildKey, "build")))
    val bloomAgg = Alias(
      AggregateExpression(
        new BloomFilterAggregate(buildHash, expectedItems), Complete, isDistinct = false),
      "bloom_filter")()
    val bloomPlan: LogicalPlan = Aggregate(Nil, Seq(bloomAgg), buildPlan)

    val probe = BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      new XxHash64(Seq(attr(appPlan, appKey, "application"))))

    classic.Dataset.ofRows(
      app.sparkSession.asInstanceOf[classic.SparkSession],
      Filter(probe, appPlan))
  }
}
