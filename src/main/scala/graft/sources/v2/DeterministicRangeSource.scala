package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 batch source: a deterministic generated
  * table (like Spark's own `range`, but with derived columns) that
  * implements the two pushdown contracts a real connector needs —
  *   - SupportsPushDownFilters: range/equality predicates on `id`
  *     NARROW THE GENERATION ITSELF (the source never materializes
  *     filtered-out rows — the DSv2 analog of partition pruning /
  *     scan-range elision in a parquet or key-value connector), and
  *   - SupportsPushDownRequiredColumns: the reader emits exactly the
  *     pruned schema, in the requested order (column pruning reaches
  *     the generator, not a projection above it).
  * Rows for `id ∈ [start, end)`:
  *   id BIGINT, m7 = id % 7, label = ('a','b','c')[id % 3],
  *   val = (id·37 % 10000) / 100.0  (exact 2-decimal double).
  * All columns are integer-derived, so any engine reproduces them
  * bit-for-bit — the DuckDB oracle regenerates the table with
  * generate_series. The narrowed range splits into `slices` contiguous
  * input partitions: on a cluster each partition is an independent
  * task; nothing is driver-resident. Reference analog: the reference's
  * only sources are JDBC/CSV/Mongo scans (data_processor.py:272-355);
  * this is the Spark-native way to ADD a source the engine lacks.
  */
class DeterministicRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DeterministicRangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val start = properties.getOrDefault("start", "0").toLong
    val end = properties.getOrDefault("end", "0").toLong
    // non-negative domain: keeps the derived columns well-defined
    // ((id % 3) must index labels) and bounds every later subtraction
    // away from Long overflow
    require(start >= 0 && end >= start,
      s"graft_range requires 0 <= start <= end, got [$start, $end)")
    new RangeTable(start, end,
      properties.getOrDefault("slices", "8").toInt)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object DeterministicRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("m7", LongType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("val", DoubleType, nullable = false)))

  private val labels = Array("a", "b", "c").map(UTF8String.fromString)

  /** Column generators, keyed by name — the reader composes exactly the
    * pruned schema from these. */
  private[v2] def gen(name: String): Long => Any = name match {
    case "id" => id => id
    case "m7" => id => id % 7
    case "label" => id => labels((id % 3).toInt)
    case "val" => id => (id * 37 % 10000) / 100.0
  }
}

private[v2] class RangeTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range($start, $end)"
  override def schema(): StructType = DeterministicRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices)
}

private[v2] class RangeScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required = DeterministicRangeSource.schema

  /** Accept id-range predicates by shrinking [lo, hi) — the generator
    * then never produces a filtered-out row, so the handled filters
    * need NO re-evaluation above the scan (returned residual excludes
    * them). Everything else is left to Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // saturating successor: v+1 on v = Long.MaxValue must clamp, not
    // wrap to MinValue — a wrapped bound would silently WIDEN the range
    // while the filter is reported fully handled (no residual to catch
    // the extra rows)
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long) => lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, succ(v)); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case IsNotNull("id") => true // nothing is null here
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new RangeScan(lo, hi, slices, required)
}

private[v2] class RangeScan(lo: Long, hi: Long, slices: Int,
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required

  // surfaced so plan tests (and humans reading .explain) can see that
  // pushdown actually narrowed the generated range
  override def description(): String =
    s"graft_range lo=$lo hi=$hi cols=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // pushFilters can cross the bounds (lo > hi) on a contradictory
    // predicate — that's an empty scan, not an error
    val span = math.max(0L, hi - lo) // both >= 0 per RangeTable's domain
    val n = math.max(1, math.min(slices.toLong, math.max(span, 1L))).toInt
    // contiguous slices, remainder spread over the first partitions;
    // chunk arithmetic stays within [0, span] — no i*span products that
    // could overflow on wide ranges
    val (chunk, rem) = (span / n, span % n)
    Array.tabulate(n) { i =>
      val a = lo + chunk * i + math.min(i.toLong, rem)
      val b = a + chunk + (if (i < rem) 1L else 0L)
      RangeInputPartition(a, b)
    }.filter(p => p.lo < p.hi).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)
}

private[v2] case class RangeInputPartition(lo: Long, hi: Long) extends InputPartition

private[v2] class RangeReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeInputPartition]
    new PartitionReader[InternalRow] {
      private val gens = cols.map(DeterministicRangeSource.gen)
      private var id = p.lo - 1
      override def next(): Boolean = { id += 1; id < p.hi }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(id)).toArray[Any])
      override def close(): Unit = ()
    }
  }
}
