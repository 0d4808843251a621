package graft.functions

/** JVM kernels behind the custom Catalyst expressions (called from
  * generated code — top-level object ⇒ static forwarders, so codegen
  * references `graft.functions.TextHashes.minhashSig(...)` directly).
  */
object TextHashes {

  /** 64-bit avalanche finalizer (splitmix64/murmur3-style fmix). */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val Base = 0x100000001B3L // FNV-ish odd base for the rolling poly

  /** Deterministic per-slot permutation constants (odd multipliers). */
  private def slotConsts(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = mix64(0x9E3779B97F4A7C15L * (i + 1)) | 1L
      b(i) = mix64(0xC2B2AE3D27D4EB4FL * (i + 1))
      i += 1
    }
    (a, b)
  }

  /** MinHash signature in ONE pass over the UTF-8 bytes: a rolling
    * polynomial hash of each `shingleLen`-byte window (O(1) per
    * position), avalanched with mix64, then k universal multiply-add
    * permutations whose per-slot minima (signed-long order) form the
    * signature. Cost: n positions × (1 roll + 1 mix + k mul-adds) —
    * no intermediate shingle strings, no per-element lambda dispatch.
    * Documents shorter than `shingleLen` get the empty-document
    * signature (Long.MaxValue in every slot). */
  def minhashSig(bytes: Array[Byte], k: Int, shingleLen: Int): Array[Long] = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = bytes.length
    if (n < shingleLen) return out
    val (as, bs) = cachedConsts(k)
    // precompute Base^(shingleLen-1) for the rolling subtraction
    var basePow = 1L
    var i = 0
    while (i < shingleLen - 1) { basePow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < shingleLen) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    var pos = shingleLen
    while (true) {
      val m = mix64(h)
      var j = 0
      while (j < k) {
        val v = m * as(j) + bs(j)
        if (v < out(j)) out(j) = v
        j += 1
      }
      if (pos >= n) return out
      h = (h - (bytes(pos - shingleLen) & 0xFF) * basePow) * Base + (bytes(pos) & 0xFF)
      pos += 1
    }
    out
  }

  // slot constants are tiny and k is almost always one of a few values
  private val constCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def cachedConsts(k: Int): (Array[Long], Array[Long]) =
    constCache.computeIfAbsent(k, slotConsts)

  /** Exact n-gram set for n ≤ 8: each n-byte window packed VERBATIM
    * into a long (no hashing ⇒ no collisions), sorted and deduplicated.
    * The compact sorted-long form makes set intersection a linear merge
    * scan (sortedIntersectSize) instead of string-array hashing. */
  def gramSet(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    if (len < n) return Array.emptyLongArray
    val raw = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var v = 0L
      var j = 0
      while (j < n) { v = (v << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      raw(i) = v
      i += 1
    }
    java.util.Arrays.sort(raw)
    // in-place dedup
    var w = 0
    i = 0
    while (i < raw.length) {
      if (w == 0 || raw(i) != raw(w - 1)) { raw(w) = raw(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(raw, w)
  }

  /** Size of the intersection of two sorted long arrays (merge scan). */
  def sortedIntersectSize(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** 64-bit SimHash in one pass: whitespace-delimited tokens hashed
    * with the same rolling poly + mix, each voting ±1 per bit. */
  def simhash64(bytes: Array[Byte]): Long = {
    val votes = new Array[Int](64)
    val n = bytes.length
    var i = 0
    while (i < n) {
      while (i < n && (bytes(i) == ' ' || bytes(i) == '\t' || bytes(i) == '\n')) i += 1
      if (i < n) {
        var h = 0L
        while (i < n && !(bytes(i) == ' ' || bytes(i) == '\t' || bytes(i) == '\n')) {
          h = h * Base + (bytes(i) & 0xFF)
          i += 1
        }
        val m = mix64(h)
        var b = 0
        while (b < 64) {
          if (((m >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
