package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.io.OutputFile
import org.apache.parquet.schema.MessageType

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.{GraftParquetBridge, ParquetWriteSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.types.StructType

/** Task-side parquet IO for the lake catalog — every data file a
  * [[GraftLakeCatalog]] table holds is written BY THE WRITE TASK that
  * produced its rows and read by the scan task assigned its split, so
  * no row ever funnels through the driver (commit messages carry file
  * paths and row counts only). Built on Spark's own parquet machinery:
  *
  *  - writes go through [[ParquetWriteSupport]], the exact
  *    InternalRow→parquet encoder Spark's file writer uses, so a lake
  *    file is indistinguishable from one `df.write.parquet` produces
  *    (DuckDB reads the same files in specs);
  *  - reads go through [[VectorizedParquetRecordReader]], Spark's
  *    codegen-facing vectorized reader, with explicit CORRECTED
  *    datetime rebase on both sides (the modern, non-Julian encoding —
  *    deterministic regardless of any session conf).
  *
  * Column pruning is native: the reader is initialized with exactly the
  * requested column names, so unprojected columns are never decoded
  * (and, at real-storage scale, never read).
  */
object LakeParquet {

  /** Conf a writer needs; ParquetWriteSupport.init asserts these. */
  private def writeConf(schema: StructType): Configuration = {
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    // raw local fs, uncached: Hadoop's default checksummed LocalFileSystem
    // would drop a hidden .crc sidecar next to every data file (polluting
    // manifest-driven GC and file counts); the uncached lookup keeps this
    // choice out of Hadoop's global FileSystem cache, which Spark's own
    // writers share
    conf.setClass("fs.file.impl",
      classOf[org.apache.hadoop.fs.RawLocalFileSystem],
      classOf[org.apache.hadoop.fs.FileSystem])
    conf.setBoolean("fs.file.impl.disable.cache", true)
    conf
  }

  private class Builder(out: OutputFile)
      extends ParquetWriter.Builder[InternalRow, Builder](out) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Open a parquet writer for `schema` at `file` (local/hadoop path).
    * `rowGroupBytes` > 0 overrides the default 128 MB row-group target —
    * delete-vector parquets use a small target so that a file sorted by
    * `file_id` lands each id in few row groups and readers can skip the
    * foreign ones by footer min/max. */
  def writer(file: String, schema: StructType,
      rowGroupBytes: Long = 0L): ParquetWriter[InternalRow] = {
    val conf = writeConf(schema)
    val b = new Builder(HadoopOutputFile.fromPath(new Path(file), conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
    if (rowGroupBytes > 0) b.withRowGroupSize(rowGroupBytes)
    b.build()
  }

  /** Open a vectorized reader over `file` returning only `columns`
    * (which must all exist in the file), as InternalRows. Caller must
    * close. Rows are views over the current batch — valid until the
    * next call to `next()`; buffering consumers must copy (the standard
    * PartitionReader contract). */
  def reader(file: String, columns: Seq[String]): RowIter = {
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
    var ok = false
    try {
      r.initialize(file, java.util.Arrays.asList(columns: _*))
      ok = true
    } finally if (!ok) r.close()
    new RowIter(r)
  }

  final class RowIter(r: VectorizedParquetRecordReader) extends AutoCloseable {
    def next(): Boolean = r.nextKeyValue()
    def get(): InternalRow = r.getCurrentValue.asInstanceOf[InternalRow]
    override def close(): Unit = r.close()
  }

  /** Total row count of `file` from its parquet footer — pure metadata,
    * no data page read. The write task already counted these rows; the
    * footer is where it recorded them. */
  def footerRows(file: String): Long = {
    val pf = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try pf.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally pf.close()
  }

  /** A group without usable stats is admitted — skipping must be
    * conservative. */
  private def admit(blocks: java.util.List[
      org.apache.parquet.hadoop.metadata.BlockMetaData],
      statsCol: String, value: Long): Seq[Int] =
    (0 until blocks.size).filter { i =>
      blocks.get(i).getColumns.asScala
        .find(_.getPath.toDotString == statsCol) match {
        case Some(chunk) =>
          val st = chunk.getStatistics
          if (st == null || st.isEmpty || !st.hasNonNullValue) true
          else {
            def bound(v: Any): Long = v.asInstanceOf[Number].longValue
            bound(st.genericGetMin) <= value && value <= bound(st.genericGetMax)
          }
        case None => true
      }
    }

  /** Row-group indexes of `file` whose `statsCol` footer [min, max]
    * bounds ADMIT `value`, plus the file's total group count. Pure
    * footer work — no data page is read. */
  def admittedRowGroups(file: String, statsCol: String,
      value: Long): (Seq[Int], Int) = {
    val pf = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try {
      val blocks = pf.getFooter.getBlocks
      (admit(blocks, statsCol, value), blocks.size)
    } finally pf.close()
  }

  /** Open a vectorized reader over `file` that reads ONLY the row
    * groups whose `statsCol` min/max admits `value` — the seek path for
    * delete-vector parquets, which are written sorted by `file_id` so
    * one data file's positions land in a contiguous handful of groups
    * and every foreign group is skipped by footer metadata alone. The
    * caller still filters rows (stats skipping is conservative). */
  def readerForValue(file: String, columns: Seq[String], statsCol: String,
      value: Long): RowIter = {
    val pf = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    var ok = false
    try {
      val fileSchema = pf.getFooter.getFileMetaData.getSchema
      val blocks = pf.getFooter.getBlocks
      val admitted = admit(blocks, statsCol, value)
      val requested = new MessageType(fileSchema.getName,
        columns.map(c => fileSchema.getType(fileSchema.getFieldIndex(c))).asJava)
      pf.setRequestedSchema(requested.getColumns)
      val rows = admitted.map(i => blocks.get(i).getRowCount).sum
      val r = GraftParquetBridge.selectiveReader(
        pf, fileSchema, requested, admitted, rows)
      ok = true
      new RowIter(r)
    } finally if (!ok) pf.close()
  }
}
