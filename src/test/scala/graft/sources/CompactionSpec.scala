package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Layout pins for small-file compaction (q205): the file count
  * actually shrinks to the metadata-derived bin count, output files
  * are near target size, and the row multiset is preserved exactly. */
class CompactionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir)).filter(_.getPath.getName.endsWith(".parquet"))
  }

  test("compaction shrinks the layout to the metadata-derived bin count") {
    val l = CompactionQueries.layout(spark, sf)
    assert(l.nSmallFiles === 48)
    val out = parquetFiles(l.compactDir)
    assert(out.length === l.nBins, "one output file per bin")
    assert(out.length < l.nSmallFiles,
      s"compaction must reduce file count: ${out.length} vs ${l.nSmallFiles}")
  }

  test("round-robin binning yields near-even output files") {
    val l = CompactionQueries.layout(spark, sf)
    val sizes = parquetFiles(l.compactDir).map(_.getLen)
    if (sizes.length > 1) {
      // round-robin evens rows across bins; byte sizes track within a
      // loose factor (encoding variance), never the 48× skew of the
      // fragmented input
      assert(sizes.max <= 2 * sizes.min,
        s"output files should be near-even, got ${sizes.mkString(", ")}")
    }
  }

  test("compacted rows are exactly the original rows (multiset identity)") {
    val l = CompactionQueries.layout(spark, sf)
    val small = spark.read.parquet(l.smallDir)
    val compact = spark.read.parquet(l.compactDir)
    assert(compact.count() === small.count())
    assert(compact.exceptAll(small).isEmpty && small.exceptAll(compact).isEmpty,
      "compaction must preserve the exact row multiset")
  }
}
