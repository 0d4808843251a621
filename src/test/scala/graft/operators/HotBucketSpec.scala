package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The LSH hot-bucket guard (DedupOps.pairsFromSig): a skewed band
  * digest — thousands of near-identical boilerplate docs landing in ONE
  * bucket — must not explode into a quadratic single-task pair bomb.
  * Past `spark.graft.lsh.maxBucket` the bucket emits all-pairs only
  * among its first `cap` members plus one star link per overflow
  * member: bounded output, full connectivity. */
class HotBucketSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withCap[T](cap: Option[Int])(body: => T): T = {
    cap.foreach(c => spark.conf.set(DedupOps.MaxBucketConf, c.toString))
    try body
    finally spark.conf.unset(DedupOps.MaxBucketConf)
  }

  /** 10k docs with IDENTICAL signatures: every band puts all 10k in one
    * bucket — the worst case the guard exists for. Unguarded output
    * would be C(10000,2) ≈ 50M pairs in one task. */
  test("a 10k-member identical-signature bucket emits bounded pairs, all connected") {
    val k = 64; val bands = 16; val cap = 64
    val n = 10000L
    val sig = spark.range(n).select(
      col("id").as("doc_id"),
      array((1 to k).map(i => lit(i.toLong)): _*).as("sig"))
    val pairs = withCap(Some(cap)) {
      DedupOps.pairsFromSig(sig, k, bands).collect()
    }
    // head all-pairs + one star link per member past the cap (all 16
    // bands produce the SAME bucket, so distinct() collapses them)
    val expected = cap.toLong * (cap - 1) / 2 + (n - cap)
    assert(pairs.length.toLong === expected,
      s"expected $expected bounded pairs, got ${pairs.length}")
    // connectivity: every doc appears in at least one pair, so
    // connected-components clustering still unifies the whole family
    val docs = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(docs.size.toLong === n, s"all $n docs must stay connected, got ${docs.size}")
    // star links anchor at the bucket's first member (deterministic)
    val starTargets = pairs.filter(_.getLong(1) >= cap).map(_.getLong(0)).toSet
    assert(starTargets === Set(0L), s"overflow members must link to ids[0], got $starTargets")
  }

  test("guard is inert on the real corpus: pairs identical with and without a cap") {
    val unguarded = withCap(Some(Int.MaxValue)) {
      DedupOps.minhashPairs(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val guarded = withCap(None) { // default cap (1024)
      DedupOps.minhashPairs(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(guarded === unguarded,
      "default cap must not change candidate pairs at gate scale (recall unchanged)")
    assert(guarded.nonEmpty)
  }
}
