package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The task-side parquet IO under the lake catalog: files written by
  * LakeParquet must round-trip through its own pruned reader AND be
  * plain parquet any engine reads (spark.read.parquet here; DuckDB in
  * the oracle gate, which scans lake data files in LakePersistenceSpec
  * fixtures). */
class LakeParquetSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("v", IntegerType, nullable = true),
    StructField("d", DoubleType, nullable = true)))

  private def writeFixture(): String = {
    val dir = graft.util.TempDirs.create("graft_lakeparquet_").toString
    val f = s"$dir/t.parquet"
    val w = LakeParquet.writer(f, schema)
    try {
      (0 until 1000).foreach { i =>
        val r = new GenericInternalRow(4)
        r.update(0, i.toLong)
        if (i % 7 == 0) r.update(1, null) else r.update(1, UTF8String.fromString(s"row#$i"))
        r.update(2, i * 2)
        r.update(3, i / 3.0)
        w.write(r)
      }
    } finally w.close()
    f
  }

  test("write then read back every column, values and nulls intact") {
    val f = writeFixture()
    val it = LakeParquet.reader(f, Seq("k", "name", "v", "d"))
    try {
      var n = 0
      while (it.next()) {
        val r = it.get()
        val i = r.getLong(0).toInt
        assert(i === n)
        if (i % 7 == 0) assert(r.isNullAt(1))
        else assert(r.getUTF8String(1).toString === s"row#$i")
        assert(r.getInt(2) === i * 2)
        assert(r.getDouble(3) === i / 3.0)
        n += 1
      }
      assert(n === 1000)
    } finally it.close()
  }

  test("pruned read decodes only the requested columns, in requested order") {
    val f = writeFixture()
    val it = LakeParquet.reader(f, Seq("v", "k"))
    try {
      var n = 0
      while (it.next()) {
        val r = it.get()
        assert(r.numFields === 2)
        assert(r.getInt(0) === r.getLong(1).toInt * 2)
        n += 1
      }
      assert(n === 1000)
    } finally it.close()
  }

  test("the file is plain parquet: spark.read.parquet sees identical rows") {
    val f = writeFixture()
    val got = spark.read.parquet(f).orderBy("k").collect()
    assert(got.length === 1000)
    assert(got(0) === Row(0L, null, 0, 0.0))
    assert(got(13) === Row(13L, "row#13", 26, 13 / 3.0))
  }
}
