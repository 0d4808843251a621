package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Declared results must be invariant to the physical execution layout:
  * a real cluster does not run this library at `local[32]` with 32
  * shuffle partitions, so any query whose OUTPUT depends on partition
  * count, partitioning function, or AQE coalescing is wrong at scale
  * even if it passes the oracle here.
  *
  * Each sampled query runs once under the suite's default conf and once
  * under a deliberately hostile layout — a prime shuffle-partition
  * count (7) that divides nothing, with AQE disabled so no runtime
  * re-coalescing can mask a dependence — and the full collected row
  * sequences must be identical (every declared query carries a total
  * order, so sequence equality is the right comparison).
  *
  * The sample is chosen for layout-sensitive machinery: the salted
  * top-k (q12), the global-rank equi-depth device (q168 — range
  * repartition + per-partition rank + offsets MUST re-derive offsets
  * under any partition count), hash-bucket sampling (q39/q75 — md5
  * buckets, never partition ids), LSH bucket→pair expansion (q56),
  * IVF cell blocking + hot-bucket guard (q66), connected components
  * (q83 — iteration order must not leak), basket self-join (q109),
  * containment prefix filter (q172), and the per-source sketch merge
  * (q187 — partial-aggregation tree shape must not matter).
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val sample = Seq(
    "q01_pricing_summary",
    "q12_window_rank",
    "q39_hash_split",
    "q56_minhash_pairs",
    "q66_neardup_ivf_blocked",
    "q75_stratified_sample",
    "q83_neardup_clusters",
    "q109_basket_pairs",
    "q168_equidepth_histogram",
    "q172_containment_join",
    "q187_source_minhash_jaccard",
    // round-5 continuation machinery: Q21's subset-key shuffle reuse,
    // chunk first-occurrence via min(struct) partial aggregation, and
    // HLL sketch union (commutative/associative → estimates must be
    // bit-identical under any partitioning)
    "q191_tpch_q21",
    "q192_chunk_dedup",
    "q193_hll_distinct",
    // round-6 machinery: the synthesized-partsupp family's UNION-dedup
    // generator + window argmin (Q2) and nested-IN flattening (Q20),
    // and the KMV sketches — bottom-k is a commutative, idempotent
    // monoid, so estimates (and their envelope booleans) must be
    // bit-identical under any partitioning or merge order
    "q194_tpch_q2",
    "q198_tpch_q20",
    "q199_kmv_intersect",
    "q202_kmv_difference")

  test("sampled declared queries are invariant to shuffle partitioning and AQE") {
    val conf = spark.conf
    val origParts = conf.get("spark.sql.shuffle.partitions")
    val origAqe = conf.get("spark.sql.adaptive.enabled", "true")
    sample.foreach { name =>
      val expect = SparkEntry.queries(name)(spark, sf).collect().toSeq
      try {
        conf.set("spark.sql.shuffle.partitions", "7")
        conf.set("spark.sql.adaptive.enabled", "false")
        val got = SparkEntry.queries(name)(spark, sf).collect().toSeq
        assert(got == expect,
          s"$name output depends on the physical layout (7 partitions, AQE off)")
      } finally {
        conf.set("spark.sql.shuffle.partitions", origParts)
        conf.set("spark.sql.adaptive.enabled", origAqe)
      }
    }
  }
}
