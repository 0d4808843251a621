package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Plan-level guarantees of the physical layouts: partition pruning on
  * partitioned writes, shuffle-free joins on bucketed tables.
  */
class ParquetLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("date-partitioned write → partition pruning in the read plan") {
    val out = Files.createTempDirectory("events_part").toString
    val events = graft.Tables(spark, sf, "events")
      .withColumn("event_date", to_date(col("ts")))
    ParquetLayout.writePartitioned(events, out, Seq("event_date"))

    val read = spark.read.parquet(out)
      .filter(col("event_date") === "2024-03-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      s"expected partition filters in:\n$plan")
    // pruning really reduces files read: one partition dir only
    val allDates = events.select("event_date").distinct().count()
    assert(allDates > 1)
    assert(read.count() ===
      events.filter(col("event_date") === "2024-03-05").count())
  }

  test("q65: declared query reads the month-partitioned layout with pruning") {
    val df = LayoutQueries.partitionPrunedScan(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_month"),
      s"expected o_month partition filters in:\n$plan")
    // the partition column must not appear as a pushed DATA filter —
    // pruning happens at directory listing, before any row is read
    assert(!plan.contains("PushedFilters: [IsNotNull(o_month"))
    // and the partitioned copy answers exactly like the original table
    val expected = graft.Tables(spark, sf, "orders")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .filter(col("o_month").between("1995-01", "1995-03"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Exact.sumMoney(col("o_totalprice")).as("sum_total"))
      .orderBy("o_month").collect().toSeq
    assert(df.collect().toSeq === expected)
  }

  test("q77: runtime dim filter plants a dynamic-pruning subquery in the fact scan") {
    val df = LayoutQueries.dynamicPartitionPruning(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n$plan")
    // and the pruned execution answers exactly like the original table
    val expected = graft.Tables(spark, sf, "orders")
      .filter(date_format(col("o_orderdate"), "yyyy-MM")
        .isin("1995-04", "1995-05", "1995-06"))
      .agg(count(lit(1)).as("n_orders"),
        graft.operators.Exact.sumMoney(col("o_totalprice")).as("sum_total"))
      .collect().head
    val got = df.collect().head
    assert(got.getLong(1) === expected.getLong(0))
    assert(got.getDouble(2) === expected.getDouble(1))
  }

  test("runtime bloom-filter join pruning fires when thresholds allow") {
    // the non-partition-column sibling of DPP: a selective dim filter
    // injects a bloom filter into the fact scan at runtime, pruning
    // shuffle input row-by-row. Default thresholds target 10GB+ scans,
    // so lower them to demonstrate the mechanism at fixture scale.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // the rule only fires for probable SHUFFLE joins — at fixture
      // scale everything is broadcastable-by-size, which at 100 TB it
      // would not be, so model that by disabling auto-broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val lineitem = graft.Tables(spark, sf, "lineitem")
      val orders = graft.Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      // force the shuffle join path — bloom filters exist to protect
      // shuffles; a broadcast join would not need one
      val joined = lineitem.hint("merge")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"expected an injected runtime bloom filter in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // drop metadata AND any orphaned location from a prior aborted run
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    graft.Tables(spark, sf, "orders").createOrReplaceTempView("tmp_orders_src")
    ParquetLayout.writeBucketed(spark.table("tmp_orders_src"),
      "b_orders", "o_orderkey", 8, Seq("o_orderkey"))
    ParquetLayout.writeBucketed(graft.Tables(spark, sf, "lineitem"),
      "b_lineitem", "l_orderkey", 8, Seq("l_orderkey"))

    // force sort-merge (the strategy big fact-fact joins get; at this
    // fixture size Catalyst would otherwise broadcast and never
    // exercise the bucket layout)
    val joined = spark.table("b_lineitem").hint("merge")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // join + partial agg run shuffle-free on the bucket layout; only
    // the final aggregation over o_orderpriority may exchange
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges <= 1, s"expected bucketed join without join-side shuffles:\n$plan")
    // and the result matches the unbucketed computation
    val expected = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(joined.orderBy("o_orderpriority").collect().toSeq === expected)
  }
}
