package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Flatten an executed plan ACROSS AQE query-stage boundaries —
    * QueryStageExec nodes are leaves whose real subtree hangs off
    * `plan`, so a plain collect() never sees inside them. */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: through.flatMap(flatten)
  }

  test("bucketed join runs with no shuffle exchange on either side") {
    val df = BucketedQueries.bucketedJoin(spark, sf)
    df.collect() // finalize AQE so the executed plan is the real one
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      s"expected a sort-merge join:\n${df.queryExecution.executedPlan}")
    // no exchange anywhere: bucket co-location replaced the shuffle
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"bucketing should eliminate the shuffle:\n${df.queryExecution.executedPlan}")
    // and the scans really are bucket-pruned bucketed reads
    assert(nodes.map(_.toString).exists(_.contains("Bucketed: true")))
  }

  test("bucketed join result equals the plain join") {
    val got = BucketedQueries.bucketedJoinAgg(spark, sf).collect().toSeq
    val exp = graft.Tables(spark, sf, "orders")
      .join(graft.Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Exact.sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(got === exp)
  }
}
