package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.MessageType

/** Package-local bridge into Spark's vectorized parquet reader:
  * [[SpecificParquetRecordReaderBase.ParquetRowGroupReader]] — the hook
  * that lets a caller feed the reader an explicit row-group sequence —
  * is package-private, so the one call site that needs it (delete-vector
  * row-group skipping in graft's lake catalog, LakeParquet.readerForValue)
  * goes through this object. No Spark behavior is altered; this is pure
  * visibility plumbing, the same device as graft's ASOF SQL injection.
  */
object GraftParquetBridge {

  /** A vectorized reader over exactly `groups` (row-group indexes) of
    * an already-open [[ParquetFileReader]] whose requested schema has
    * been set to `requested`'s columns. Closing the returned reader
    * closes `pf`. `rows` must be the total row count of `groups`. */
  def selectiveReader(pf: ParquetFileReader, fileSchema: MessageType,
      requested: MessageType, groups: Seq[Int],
      rows: Long): VectorizedParquetRecordReader = {
    // the vectorized reader takes an Int row total: past Int.MaxValue it
    // would stop early and silently drop rows — fail loudly instead
    // (mirrors LakeDv.loadPositions' bitmap-range guard)
    require(rows <= Int.MaxValue,
      s"selective reader row total $rows exceeds Int range; split the file")
    val groupIdx = groups.iterator
    val rg = new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
      override def readNextRowGroup(): PageReadStore =
        if (groupIdx.hasNext) pf.readRowGroup(groupIdx.next()) else null
      override def close(): Unit = pf.close()
    }
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    r.initialize(fileSchema, requested, rg, rows.toInt)
    r
  }
}
