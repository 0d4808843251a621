package graft.operators

import graft.SparkSpec

/** q207: AQE's runtime skew-join split — the optimizer-owned half of
  * the skew playbook (q70's salting is the manual half). Pins that the
  * split actually FIRES on the fixture's engineered hot key (a plan
  * that silently stopped splitting would still pass the oracle — the
  * whole point of the split is the schedule, which no row-compare can
  * see), that the answer is byte-identical to the AQE-off run, and
  * that the tuned thresholds never leak off the session clone. */
class AqeSkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("the hot partition is split at runtime: skew=true in the final adaptive plan") {
    val df = RelationalQueries.aqeSkewJoin(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the skew decision is made at RUNTIME from map-output sizes, so
    // the pin reads the plan AFTER execution (isFinalPlan=true)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(400))
    assert(plan.contains("skew=true"),
      s"OptimizeSkewedJoin did not split the hot partition:\n${plan.take(2000)}")
  }

  test("the split changes the schedule, never the answer (AQE off == AQE on)") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.aqeSkewJoin(spark, sf).collect().toSeq
    // independent AQE-off evaluation of the same semantics on the
    // BASE session (plain shuffles, no runtime re-plan)
    val orig = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val expect = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val li = graft.Tables(spark, sf, "lineitem").select(
        when(col("l_suppkey") % 4 =!= 0, lit(1L))
          .otherwise(col("l_suppkey")).as("suppkey"),
        col("l_extendedprice"))
      val sup = graft.Tables(spark, sf, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      li.join(sup, "suppkey").groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          Exact.sumMoney(col("l_extendedprice")).as("revenue"))
        .orderBy("s_nationkey").collect().toSeq
    } finally spark.conf.set("spark.sql.adaptive.enabled", orig)
    assert(got == expect)
  }

  test("the fixture-sized thresholds never leak off the session clone") {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => spark.conf.getOption(k))
    RelationalQueries.aqeSkewJoin(spark, sf).collect()
    assert(keys.map(k => spark.conf.getOption(k)) == before,
      "q207 mutated the caller's session conf")
  }
}
