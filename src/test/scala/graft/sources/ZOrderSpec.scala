package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("zvalue interleaves bits correctly") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("a", "b")
      .select(ZOrderQueries.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // morton(5=101b, 3=011b): a bits -> even positions (1,0,16),
    // b bits -> odd positions (2,8) => 10011b | 01010b = 11011b = 27
    assert(got === Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("zvalueN round-robins bits across three dimensions") {
    import spark.implicits._
    val got = Seq((1L, 1L, 1L), (2L, 0L, 1L), (0L, 4L, 0L))
      .toDF("a", "b", "c")
      .select(ZOrderQueries.zvalueN(
        Seq(col("a"), col("b"), col("c")), bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (1,1,1): bit0 of each dim -> positions 0,1,2 = 0b111 = 7
    // (2,0,1): a bit1 -> pos 3 (8); c bit0 -> pos 2 (4) = 12
    // (0,4,0): b bit2 -> pos 2*3+1 = 7 (128)
    assert(got === Seq(7L, 12L, 128L))
  }

  /** Per-file bounding boxes of a parquet directory on two columns —
    * what footer min/max stats expose to any data-skipping layer. */
  private def fileBoxes(path: String, a: String, b: String): Seq[(Long, Long, Long, Long)] = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(a)), max(col(a)), min(col(b)), max(col(b)))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  private def intersecting(boxes: Seq[(Long, Long, Long, Long)],
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Int =
    boxes.count { case (a0, a1, b0, b1) =>
      a1 >= aLo && a0 <= aHi && b1 >= bLo && b0 <= bHi
    }

  test("z-order gives multi-column skipping a single-key sort cannot") {
    val li = graft.Tables(spark, sf, "lineitem")
    val zPath = java.nio.file.Files.createTempDirectory("zorder_test_").toString
    val sPath = java.nio.file.Files.createTempDirectory("singlesort_test_").toString
    try {
      ZOrderQueries.writeZOrdered(li, col("l_partkey"), col("l_suppkey"), zPath)
      // baseline: the best single-key layout for l_partkey queries
      val n = li.count()
      li.repartitionByRange(6, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.option("maxRecordsPerFile", math.max(1L, n / 48).toString)
        .mode("overwrite").parquet(sPath)

      val zBoxes = fileBoxes(zPath, "l_partkey", "l_suppkey")
      val sBoxes = fileBoxes(sPath, "l_partkey", "l_suppkey")
      assert(zBoxes.size >= 24 && sBoxes.size >= 24,
        s"need granular files for a meaningful test: ${zBoxes.size}/${sBoxes.size}")

      val (pMax, sMax) = {
        val r = li.agg(max("l_partkey"), max("l_suppkey")).collect().head
        (r.getLong(0), r.getLong(1))
      }
      // box on the NON-sorted key only: single-key layout can skip
      // nothing, z-order skips most files
      val bLo = sMax / 2
      val bHi = sMax / 2 + math.max(1, sMax / 10)
      val zHit = intersecting(zBoxes, 0, pMax, bLo, bHi)
      val sHit = intersecting(sBoxes, 0, pMax, bLo, bHi)
      assert(sHit >= (sBoxes.size * 9) / 10,
        s"single-key sort should be blind to the other key: $sHit/${sBoxes.size}")
      assert(zHit * 2 <= zBoxes.size,
        s"z-order should skip at least half the files: $zHit/${zBoxes.size}")

      // box on BOTH keys: z-order still prunes sharply
      val zBoth = intersecting(zBoxes, pMax / 4, pMax / 4 + pMax / 10, bLo, bHi)
      assert(zBoth * 4 <= zBoxes.size,
        s"2-D box should hit <= 25% of z-ordered files: $zBoth/${zBoxes.size}")
    } finally {
      Seq(zPath, sPath).foreach { d =>
        java.nio.file.Files.walk(java.nio.file.Paths.get(d))
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      }
    }
  }

  test("q104 answer is layout-independent") {
    val got = ZOrderQueries.zorderBoxQuery(spark, sf).collect().toSeq
    val exp = graft.Tables(spark, sf, "lineitem")
      .filter(col("l_partkey").between(50, 150) &&
        col("l_suppkey").between(2, 8))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        graft.operators.Exact.sumMoney(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag").collect().toSeq
    assert(got === exp)
  }
}
