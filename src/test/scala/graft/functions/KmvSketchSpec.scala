package graft.functions

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Estimator math and mergeability law for the KMV/theta sketch —
  * the properties q199's envelope pin relies on. Pure JVM (no Spark):
  * the Aggregator's reduce/merge are deterministic set algebra. */
class KmvSketchSpec extends AnyFunSuite {

  private val k = 256
  private val agg = new KmvSketch(k)

  private def sketchOf(hs: Iterable[Long]): Array[Long] =
    agg.finish(hs.foldLeft(agg.zero)(agg.reduce))

  /** Deterministic stand-in for a 64-bit hash stream. */
  private def hashes(seed: Int, n: Int): Seq[Long] = {
    val r = new Random(seed)
    Seq.fill(n)(r.nextLong())
  }

  test("below k the sketch IS the set: estimate exact, theta = 1") {
    val hs = hashes(1, 100).distinct
    val sk = sketchOf(hs)
    assert(sk.length === hs.length)
    assert(KmvSketch.theta(sk, k) === 1.0)
    assert(KmvSketch.estimate(sk, k) === hs.length.toDouble)
  }

  test("merge is the sketch union: merge(sk(A), sk(B)) == sk(A ++ B), any order") {
    val a = hashes(2, 5000)
    val b = hashes(3, 5000)
    def m(x: Seq[Long], y: Seq[Long]) = agg.finish(agg.merge(
      x.foldLeft(agg.zero)(agg.reduce), y.foldLeft(agg.zero)(agg.reduce)))
    val whole = sketchOf(a ++ b)
    assert(m(a, b).toSeq === whole.toSeq)
    assert(m(b, a).toSeq === whole.toSeq) // commutative
    // idempotent: re-merging the same stream changes nothing
    assert(m(a ++ b, a).toSeq === whole.toSeq)
  }

  test("estimate within the published envelope at 50k distinct") {
    val n = 50000
    val hs = hashes(4, n).distinct
    val est = KmvSketch.estimate(sketchOf(hs), k)
    // RSE ~ 1/sqrt(k-2) ~ 6.3% at k=256; 3-sigma bound
    assert(math.abs(est - hs.size) < hs.size * 0.19,
      s"estimate $est vs exact ${hs.size}")
  }

  test("intersection estimate tracks a known overlap") {
    val shared = hashes(5, 20000).distinct
    val onlyA = hashes(6, 20000).distinct
    val onlyB = hashes(7, 20000).distinct
    val skA = sketchOf(shared ++ onlyA)
    val skB = sketchOf(shared ++ onlyB)
    val est = KmvSketch.intersectEstimate(skA, skB, k)
    val exact = shared.size.toDouble
    // union/intersect ~ 3 -> RSE ~ sqrt(3)/sqrt(k) ~ 11%; 3-sigma
    assert(math.abs(est - exact) < exact * 0.33, s"est $est vs exact $exact")
    // and a disjoint pair estimates (near) zero
    val estDisjoint = KmvSketch.intersectEstimate(sketchOf(onlyA), sketchOf(onlyB), k)
    assert(estDisjoint === 0.0)
  }

  test("difference estimate tracks a known A-not-B; identical sets estimate zero") {
    val shared = hashes(10, 20000).distinct
    val onlyA = hashes(11, 10000).distinct
    val skA = sketchOf(shared ++ onlyA)
    val skB = sketchOf(shared)
    val est = KmvSketch.differenceEstimate(skA, skB, k)
    val exact = onlyA.size.toDouble
    // |A∪B|/|A\B| ~ 3 -> RSE ~ sqrt(3)/sqrt(k) ~ 11%; 3-sigma
    assert(math.abs(est - exact) < exact * 0.33, s"est $est vs exact $exact")
    // A\A must be EXACTLY zero (identical sketches, identical theta)
    assert(KmvSketch.differenceEstimate(skA, skA, k) === 0.0)
    // and the lattice closes: |A| ~ |A∩B| + |A\B| within error
    val viaParts = KmvSketch.intersectEstimate(skA, skB, k) + est
    val whole = KmvSketch.estimate(skA, k)
    assert(math.abs(viaParts - whole) < whole * 0.25, s"$viaParts vs $whole")
  }

  test("union estimate == estimate of the concatenated stream's sketch") {
    val a = hashes(8, 30000)
    val b = hashes(9, 30000)
    val viaMerge = KmvSketch.unionEstimate(sketchOf(a), sketchOf(b), k)
    val viaWhole = KmvSketch.estimate(sketchOf(a ++ b), k)
    assert(viaMerge === viaWhole)
  }

  test("u is monotone over signed longs and lands in [0,1)") {
    val pts = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    val us = pts.map(KmvSketch.u)
    assert(us === us.sorted)
    assert(us.forall(x => x >= 0.0 && x <= 1.0))
    assert(KmvSketch.u(Long.MinValue) === 0.0)
  }
}
