package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

class RangeSourceSpec extends SparkSpec {

  private def read(start: Long, end: Long) =
    spark.read.format("graft.sources.v2.DeterministicRangeSource")
      .option("start", start.toString).option("end", end.toString)
      .option("slices", "4").load()

  test("generates the declared deterministic columns") {
    val rows = read(0, 10).orderBy("id").collect()
    assert(rows.length === 10)
    val r7 = rows(7)
    assert(r7.getLong(0) === 7L)
    assert(r7.getLong(1) === 0L) // 7 % 7
    assert(r7.getString(2) === "b") // 7 % 3 = 1 -> labels(1)
    assert(r7.getDouble(3) === (7 * 37 % 10000) / 100.0)
  }

  test("id-range filter is pushed into the scan: range narrows, no residual Filter") {
    val df = read(0, 1000).filter(col("id") >= lit(200L) && col("id") < lit(300L))
    val plan = df.queryExecution.executedPlan
    val scan = plan.collect { case b: BatchScanExec => b.scan }.head
    assert(scan.description().contains("lo=200 hi=300"), scan.description())
    // fully handled by the source: nothing left to re-evaluate above it
    assert(!plan.toString.contains("Filter ("), plan.toString)
    assert(df.count() === 100)
    assert(df.agg(sum("id")).collect().head.getLong(0) === (200L until 300L).sum)
  }

  test("column pruning reaches the generator") {
    val df = read(0, 100).select(col("m7"), col("val"))
    val scan = df.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b.scan }.head
    assert(scan.readSchema().fieldNames.toSeq === Seq("m7", "val"))
    assert(scan.description().contains("cols=m7,val"))
  }

  test("slices produce disjoint covering partitions under pushdown") {
    val df = read(0, 1003).filter(col("id") >= lit(3L))
    // all rows exactly once across the 4 partitions
    assert(df.count() === 1000)
    assert(df.select(countDistinct("id")).collect().head.getLong(0) === 1000)
    // degenerate narrow range still works (single short partition)
    assert(read(0, 1000).filter(col("id") === lit(999L)).count() === 1)
    assert(read(0, 1000).filter(col("id") === lit(1000L)).count() === 0)
  }

  test("pushdown saturates at Long boundaries instead of wrapping") {
    // id > Long.MaxValue is unsatisfiable — a wrapping v+1 would widen
    // the range to everything with no residual Filter to catch it
    assert(read(0, 1000).filter(col("id") > lit(Long.MaxValue)).count() === 0)
    // id <= Long.MaxValue is a tautology — wrapping would empty the scan
    assert(read(0, 1000).filter(col("id") <= lit(Long.MaxValue)).count() === 1000)
    assert(read(0, 1000).filter(col("id") >= lit(Long.MinValue + 1)).count() === 1000)
  }
}
