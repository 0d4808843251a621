package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection at corpus scale: MinHash+LSH and SimHash.
  * Spark-native formulation (no UDFs, no driver state):
  *
  *   shingle (explode) → K minhashes (one groupBy with K min() aggs)
  *   → band digests → candidate pairs via an equi-join on (band, digest).
  *
  * The band join is the scale move: instead of all-pairs O(n²) similarity,
  * only documents sharing a band digest are compared — on a cluster this
  * is one shuffle keyed by digest, and AQE handles hot buckets. These
  * queries are not ANSI-SQL-expressible with engine-identical hashes
  * (xxhash64), so the driver records rows-only checks; exactness is
  * pinned by ScalaTest against TextQueries.ngramJaccard.
  */
object DedupOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private def norm(c: Column): Column = lower(regexp_replace(c, "\\s+", " "))

  /** Character-5-gram shingles, distinct per document. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"), norm(col("text")).as("t"))
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), length(col("t")) - 4), i => col("t").substr(i, lit(5))))).as("shingle"))

  /** MinHash signatures: K independent hash slots via seeded xxhash64. */
  def minhashSignatures(s: SparkSession, dir: String, k: Int = 32): DataFrame = {
    val aggs = (0 until k).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    shingles(s, dir).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures split into `bands` bands of
    * `k/bands` rows; docs sharing any band digest become a candidate.
    * Returns (a, b) doc_id pairs, a < b, deduplicated. */
  def minhashPairs(s: SparkSession, dir: String, k: Int = 32, bands: Int = 8): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatures(s, dir, k)
    val digests = (0 until bands).map { b =>
      xxhash64((lit(b) +: (b * rows until (b + 1) * rows).map(i => col(s"h$i"))): _*)
    }
    // melt to (doc_id, band, digest) then self-join — one shuffle, not
    // one join per band.
    val melted = sig.select(col("doc_id"),
      posexplode(array(digests: _*)).as(Seq("band", "digest")))
    val l = melted.select(col("band"), col("digest"), col("doc_id").as("a"))
    val r = melted.select(col("band"), col("digest"), col("doc_id").as("b"))
    l.join(r, Seq("band", "digest"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .orderBy("a", "b")
  }

  /** MinHash near-dup summary: candidate pair count per band plus total
    * distinct pairs — a stable, small output for the rows-only check. */
  def minhashStats(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(s, dir)
    sig.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("h0")).as("distinct_h0"),
      min(col("h0")).as("min_h0"),
      max(col("h0")).as("max_h0"))
  }

  /** 64-bit SimHash per document: token hashes vote ±1 per bit position;
    * the sign vector packs back into one long. One explode + one groupBy
    * with 64 conditional sums — fully codegen'd, no state. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(norm(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val packed = (0 until 64)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
      .orderBy("doc_id")
  }

  /** Word-level n-gram Jaccard near-dup pairs among MinHash candidates:
    * generate candidates with LSH, then verify each pair's true character
    * 3-gram Jaccard — the standard candidate→verify dedup pipeline. */
  def neardupVerified(s: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    def grams(c: Column): Column =
      array_distinct(transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3))))
    val docs = t(s, dir, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), grams(norm(col("text"))).as("g"))
    val pairs = minhashPairs(s, dir)
    pairs
      .join(docs.select(col("doc_id").as("a"), col("g").as("ga")), "a")
      .join(docs.select(col("doc_id").as("b"), col("g").as("gb")), "b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (size(col("ga")) + size(col("gb")) - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
      .orderBy("a", "b")
  }

  /** Rows-only queries (hashes are engine-specific → no ANSI oracle). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_minhash_pairs" -> ((s: SparkSession, d: String) => minhashPairs(s, d)),
    "q57_simhash" -> ((s: SparkSession, d: String) => simhash(s, d)),
    "q58_neardup_verified" -> ((s: SparkSession, d: String) => neardupVerified(s, d, 0.5)),
  )

  val oracle: Map[String, String] = Map.empty
}
