package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a custom typed
  * Aggregator — the INTERSECTABLE member of the sketch lattice. q193's
  * HLL sketches union perfectly but cannot intersect ("distinct users
  * in segment A∩B" — the everyday 100 TB ask); a KMV sketch is a
  * uniform bottom-k SAMPLE of the hashed key space, so any set algebra
  * that works on samples works on sketches:
  *
  *   - estimate:  D̂ = (k−1)/u_k   (u_k = k-th smallest hash mapped to
  *     [0,1); exact |S| when the set has fewer than k members — the
  *     sketch simply IS the set then)
  *   - union:     keep the k smallest of the merged hash sets — which
  *     is precisely what [[merge]] does, so Spark's partial aggregation
  *     is the union operation (a commutative, idempotent monoid;
  *     merge order cannot change the k smallest values)
  *   - intersect: θ = min(θ_a, θ_b); both sketches observe the hash
  *     space below θ completely-at-random, so the common hashes below
  *     θ are a uniform sample of the true intersection and
  *     D̂∩ = |common below θ| / θ  (the theta-sketch estimator)
  *
  * (Bar-Yossef et al. 2002 / Beyer et al. SIGMOD 2007 for KMV; the
  * Apache DataSketches theta sketch generalizes the same idea.)
  * Relative standard error ≈ 1/√(k−2) for estimate/union; intersection
  * error scales with √(|A∪B|/|A∩B|)/√k — tight when the overlap is a
  * sizable fraction of the union, looser for needle-overlap pairs.
  *
  * The input is an already-hashed Long (callers feed xxhash64(key) —
  * hashing stays in codegen'd column space; the Aggregator only
  * maintains the bottom-k order statistics). Hash values use SIGNED
  * ordering with u(h) = h/2^64 + 1/2, which maps signed order
  * monotonically onto [0,1). The buffer is a sorted, deduplicated
  * Array[Long] of ≤ k entries under Spark's NATIVE array encoder (no
  * kryo — kryo round-trips sorted-set types as plain hash sets): once
  * the sketch saturates, the common case is a single h ≥ max compare
  * and a reject, and a stream of n distinct hashes triggers only
  * ~k·ln(n/k) insertions in expectation.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 16, "k must be at least 16 for the estimator to be meaningful")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    if (b.length >= k && h >= b(b.length - 1)) return b // saturated fast path
    val i = java.util.Arrays.binarySearch(b, h)
    if (i >= 0) return b // already present
    val at = -i - 1
    val grown = new Array[Long](math.min(b.length + 1, k))
    System.arraycopy(b, 0, grown, 0, at)
    grown(at) = h
    System.arraycopy(b, at, grown, at + 1, grown.length - at - 1)
    grown
  }

  /** Sorted-merge + dedupe + cap — the sketch UNION (see scaladoc). */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Ascending bottom-k hash values; position k (1-based) is the θ
    * order statistic the estimators read. */
  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  /** u(h): the signed-monotone map of a 64-bit hash onto [0,1). Double
    * rounding costs ~2^-53 relative — irrelevant against the sketch's
    * 1/√k statistical error. */
  def u(h: Long): Double = h.toDouble / 1.8446744073709552e19 + 0.5

  /** θ of a finished sketch: 1.0 while the sketch is still exact
    * (fewer than k members seen), else u(k-th smallest). */
  def theta(sk: Array[Long], k: Int): Double =
    if (sk.length < k) 1.0 else u(sk(k - 1))

  /** Distinct-count estimate of one sketch (exact below k). */
  def estimate(sk: Array[Long], k: Int): Double =
    if (sk.length < k) sk.length.toDouble else (k - 1).toDouble / u(sk(k - 1))

  /** Union estimate: bottom-k of the merged hash sets, then [[estimate]]. */
  def unionEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val m = (a ++ b).distinct.sorted.take(k)
    estimate(m, k)
  }

  /** Theta-style intersection estimate — see class scaladoc. */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val bs = b.toSet
    val common = a.count(h => bs.contains(h) && u(h) < th)
    common / th
  }

  /** Theta-style A-NOT-B (set difference) estimate — the third leg of
    * the sketch lattice (union = merge, intersect, difference). Below
    * θ = min(θ_a, θ_b) BOTH sketches observe the hash space
    * completely, so a hash in A's sketch below θ that is absent from
    * B's sketch is genuinely absent from B — the below-θ members of
    * A\B are a uniform sample and D̂(A∖B) = |{h ∈ A, h < θ, h ∉ B}|/θ.
    * (Restricting to below-θ is what makes this sound: above θ_b, B's
    * sketch is silent and absence means nothing.) */
  def differenceEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val bs = b.toSet
    val only = a.count(h => u(h) < th && !bs.contains(h))
    only / th
  }
}
