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

  // ----- int8 cosine sketch (the cheap pre-verify bound) -----
  // A 16+d byte blob per vector: [0,8) ‖q‖/127 (na), [8,16) the
  // quantization-residual norm ‖â − q/127‖ (rn), [16,16+d) the
  // normalized vector quantized to int8 (q_i = rint(127·â_i)). The
  // bound below is a RIGOROUS upper bound on the exact cosine, so
  // filtering candidates on bound ≥ threshold − ε before the exact
  // verify is lossless — it changes plans, never results:
  //   cos(a,b) = â·b̂ = (q_a/127 + r_a)·b̂
  //            = q_a·q_b/127² + (q_a/127)·r_b + r_a·b̂
  //            ≤ q_a·q_b/127² + na_a·rn_b + rn_a        (Cauchy–Schwarz
  //              twice: |x·y| ≤ ‖x‖‖y‖, and ‖b̂‖ = 1).
  // Typical rn at d=32 is ~0.013, so the bound sits ~0.02–0.03 above
  // the true cosine — tight enough to prune the sub-threshold bulk of
  // IVF-cell candidates. A zero vector sketches to all-zero (bound 0);
  // its exact cosine is NaN, which fails ≥-threshold too — consistent.
  // Assumes equal dims on both sides (the bound's ‖b̂‖=1 step reads
  // the full vector; cosineFF's min-length truncation re-normalizes).

  def i8Sketch(v: Array[Float]): Array[Byte] = {
    val d = v.length
    var nrm = 0.0
    var i = 0
    while (i < d) { val x = v(i).toDouble; nrm += x * x; i += 1 }
    nrm = math.sqrt(nrm)
    val out = new Array[Byte](16 + d)
    var qq = 0.0
    var rr = 0.0
    i = 0
    while (i < d) {
      val xhat = if (nrm == 0.0) 0.0 else v(i).toDouble / nrm
      var q = math.rint(127.0 * xhat)
      if (q > 127.0) q = 127.0
      if (q < -127.0) q = -127.0
      val r = xhat - q / 127.0
      qq += q * q
      rr += r * r
      out(16 + i) = q.toByte
      i += 1
    }
    val bb = java.nio.ByteBuffer.wrap(out)
    bb.putDouble(0, math.sqrt(qq) / 127.0)
    bb.putDouble(8, math.sqrt(rr))
    out
  }

  def i8CosBound(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length) - 16
    var dot = 0L
    var i = 0
    while (i < n) { dot += a(16 + i).toLong * b(16 + i).toLong; i += 1 }
    val ba = java.nio.ByteBuffer.wrap(a)
    val bbuf = java.nio.ByteBuffer.wrap(b)
    dot.toDouble / 16129.0 + ba.getDouble(0) * bbuf.getDouble(8) + ba.getDouble(8)
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

  def i8SketchAD(v: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] =
    if (hasNullElement(v)) null
    else i8Sketch(v.toFloatArray())

  def sortedIntersectAD(l: org.apache.spark.sql.catalyst.util.ArrayData,
      r: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Integer =
    if (hasNullElement(l) || hasNullElement(r)) null
    else java.lang.Integer.valueOf(
      TextHashes.sortedIntersectSize(l.toLongArray(), r.toLongArray()))
}
