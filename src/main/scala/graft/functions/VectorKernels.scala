package graft.functions

/** JVM kernels for embedding-vector expressions (static forwarders for
  * codegen, like TextHashes). All accumulation is double, left-to-right
  * in index order — bit-identical to the DuckDB oracle's
  * list_transform/list_sum fold over CAST(x AS DOUBLE).
  */
object VectorKernels {

  def dotFF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** cosine(a, b) with double accumulation. */
  def cosineFF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim)
    * in [-0.5, 0.5) — recomputable on any executor, no stored model. */
  @inline private def planeComponent(plane: Int, dim: Int): Double =
    (Math.floorMod(
      TextHashes.mix64(plane.toLong * 0x9E3779B97F4A7C15L + dim), 1000000L)
      / 1000000.0) - 0.5

  /** B-bit random-hyperplane LSH bucket for table `table`: bit p is the
    * sign of the projection onto pseudo-random plane (table·bits + p). */
  def lshBucketF(v: Array[Float], bits: Int, table: Int): Long = {
    var out = 0L
    var p = 0
    while (p < bits) {
      val plane = table * bits + p
      var proj = 0.0
      var i = 0
      while (i < v.length) { proj += v(i).toDouble * planeComponent(plane, i); i += 1 }
      if (proj > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  // ----- ArrayData-aware wrappers (null-element propagation) -----
  // ArrayData.toFloatArray/toLongArray silently read NULL elements as 0,
  // which would make these kernels return plausible-but-wrong numbers.
  // SQL semantics for a null-containing argument is a null RESULT, so
  // the expressions call these wrappers, which scan the null bitmap
  // first (O(n), same order as the kernel itself) and return a boxed
  // null. Boxed returns only materialize on this path; the primitive
  // kernels above stay allocation-free for null-free data.

  private def hasNullElement(a: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  def cosineAD(l: org.apache.spark.sql.catalyst.util.ArrayData,
      r: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double =
    if (hasNullElement(l) || hasNullElement(r)) null
    else java.lang.Double.valueOf(cosineFF(l.toFloatArray(), r.toFloatArray()))

  def lshBucketAD(v: org.apache.spark.sql.catalyst.util.ArrayData,
      bits: Int, table: Int): java.lang.Long =
    if (hasNullElement(v)) null
    else java.lang.Long.valueOf(lshBucketF(v.toFloatArray(), bits, table))

  def sortedIntersectAD(l: org.apache.spark.sql.catalyst.util.ArrayData,
      r: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Integer =
    if (hasNullElement(l) || hasNullElement(r)) null
    else java.lang.Integer.valueOf(
      TextHashes.sortedIntersectSize(l.toLongArray(), r.toLongArray()))
}
