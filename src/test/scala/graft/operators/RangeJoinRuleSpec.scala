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

  test("rewriteFrame fires despite an attribute-vs-literal equality conjunct") {
    // a literal's empty reference set is a subset of every outputSet —
    // pre-fix, `flag = 1` masqueraded as an equi join key and the
    // rewrite silently returned the nested-loop plan
    import spark.implicits._
    val ps = points.withColumn("flag", lit(1))
    val joined = ps.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi") && col("flag") === lit(1))
    val rewritten = BucketedRangeJoinRule.rewriteFrame(joined, 256L)
    rewritten.collect()
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"literal equality defeated the rewrite:\n$plan")
    assert(rewritten.select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq === expected(strict = false).sorted)
  }

  test("bucket math is exact at Long extremes (no subtract-pmod underflow)") {
    import spark.implicits._
    // points in the lowest partial bucket: e - pmod(e, w) underflows
    val extremes = Seq(Long.MinValue + 1, Long.MinValue + 5, -10L, 0L, 10L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
    val ivs = Seq((1L, Long.MinValue + 1, Long.MinValue + 6), (2L, -15L, 5L))
      .toDF("iid", "lo", "hi")
    val joined = extremes.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    val got = BucketedRangeJoinRule.rewriteFrame(joined, 10L)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val exp = (for {
      (id, p) <- Seq((0L, Long.MinValue + 1), (1L, Long.MinValue + 5), (2L, -10L), (3L, 0L), (4L, 10L))
      (iid, lo, hi) <- Seq((1L, Long.MinValue + 1, Long.MinValue + 6), (2L, -15L, 5L))
      if p >= lo && p <= hi
    } yield (id, iid)).sorted
    assert(got === exp)
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
