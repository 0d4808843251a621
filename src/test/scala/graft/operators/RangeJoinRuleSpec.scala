package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BucketedRangeJoinRule

/** BucketedRangeJoinRule behavior: exactness of the rewrite against the
  * nested-loop baseline (including strict bounds, empty and negative
  * intervals), the plan shape it produces, and the cases where it must
  * NOT fire. The shared session carries GraftExtensions (as Verify and
  * Bench do), so the rule is exercised exactly as deployed; it is
  * conf-gated, so each test controls it via the width key. */
class RangeJoinRuleSpec extends SparkSpec {

  import BucketedRangeJoinRule.WIDTH_KEY

  private def points = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, i * 37 % 5000 - 100)).toDF("id", "p")
  }
  private def intervals = {
    import spark.implicits._
    Seq(
      (1L, 100L, 800L), // spans several buckets
      (2L, 4500L, 4500L), // single point
      (3L, 900L, 250L), // EMPTY (hi < lo) — must not blow up Sequence
      (4L, -150L, 120L) // negative bounds
    ).toDF("iid", "lo", "hi")
  }

  private def expected(strict: Boolean): Seq[(Long, Long)] = {
    val ps = (0L until 1000L).map(i => (i, i * 37 % 5000 - 100))
    val ivs = Seq((1L, 100L, 800L), (2L, 4500L, 4500L), (3L, 900L, 250L), (4L, -150L, 120L))
    for {
      (id, p) <- ps; (iid, lo, hi) <- ivs
      if (if (strict) p > lo && p < hi else p >= lo && p <= hi)
    } yield (id, iid)
  }

  test("rewrites the naive interval join to a bucketed equi-join, results exact") {
    spark.conf.unset(WIDTH_KEY)
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoopJoin") || naivePlan.contains("CartesianProduct"),
      s"baseline should be a nested loop:\n$naivePlan")
    try {
      spark.conf.set(WIDTH_KEY, "256")
      val auto = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = auto.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("Generate explode"), plan)
      val got = auto.select("id", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expected(strict = false).sorted)
    } finally spark.conf.unset(WIDTH_KEY)
  }

  test("strict bounds and flipped operand order rewrite exactly too") {
    try {
      spark.conf.set(WIDTH_KEY, "256")
      // lo < p && hi > p — the bound expressions lead
      val auto = points.join(intervals, col("lo") < col("p") && col("hi") > col("p"))
      val plan = auto.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
      val got = auto.select("id", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expected(strict = true).sorted)
    } finally spark.conf.unset(WIDTH_KEY)
  }

  test("a user's broadcast hint survives the rewrite") {
    try {
      spark.conf.set(WIDTH_KEY, "256")
      val auto = points.join(broadcast(intervals),
        col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = auto.queryExecution.executedPlan.toString
      assert(plan.contains("Generate explode"), plan)
      assert(plan.contains("BroadcastHashJoin"),
        s"hint dropped — exploded side should be broadcast:\n$plan")
      val got = auto.select("id", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expected(strict = false).sorted)
    } finally spark.conf.unset(WIDTH_KEY)
  }

  test("does not fire with an equi key, without the width conf, or on non-inner joins") {
    // equi key present: Spark already has a shuffle key
    try {
      spark.conf.set(WIDTH_KEY, "256")
      val equi = points.join(intervals,
        col("id") === col("iid") && col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!equi.queryExecution.executedPlan.toString.contains("Generate explode"))
      val left = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"), "left")
      assert(!left.queryExecution.executedPlan.toString.contains("Generate explode"))
      // equi-variant results still exact
      assert(equi.count() ===
        expected(strict = false).count { case (id, iid) => id == iid })
    } finally spark.conf.unset(WIDTH_KEY)
    val noConf = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(!noConf.queryExecution.executedPlan.toString.contains("Generate explode"))
  }
}
