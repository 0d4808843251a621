package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality pins for the non-oracle (rows-only) dedup/similarity
  * operators, against exact brute-force computations at sf0.001.
  */
class DedupSimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def norm(c: org.apache.spark.sql.Column) =
    lower(regexp_replace(c, "\\s+", " "))

  /** Exact char-3-gram Jaccard for every doc pair (brute force). */
  private lazy val truePairs = {
    def grams(c: org.apache.spark.sql.Column) =
      array_distinct(transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3))))
    val docs = graft.Tables(spark, sf, "documents")
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"), grams(norm(col("text"))).as("g"))
    val l = docs.select(col("doc_id").as("a"), col("g").as("ga"))
    val r = docs.select(col("doc_id").as("b"), col("g").as("gb"))
    l.crossJoin(r).filter(col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jac", col("inter").cast("double")
        / (size(col("ga")) + size(col("gb")) - col("inter")))
      .select("a", "b", "jac")
      .cache()
  }

  test("minhash LSH recall: finds >=90% of true near-dup pairs (jaccard >= 0.8)") {
    val strong = truePairs.filter(col("jac") >= 0.8)
    val nStrong = strong.count()
    assert(nStrong > 0, "fixture should contain near-duplicates")
    val candidates = DedupOps.minhashPairs(spark, sf)
    val found = strong.join(candidates, Seq("a", "b"), "left_semi").count()
    assert(found.toDouble / nStrong >= 0.9,
      s"LSH recall ${found.toDouble / nStrong} over $nStrong strong pairs")
  }

  test("neardupVerified equals the exact brute-force 5-gram truth set") {
    val verified = DedupOps.neardupVerified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    assert(verified.nonEmpty, "fixture should contain verified near-dups")
    // exact truth over ALL pairs, computed independently on the driver
    // with the same normalization (lowercase, collapsed whitespace) and
    // byte 5-grams — this pins RECALL (no pair the LSH candidates
    // missed) as well as precision and the emitted values.
    val texts = graft.Tables(spark, sf, "documents")
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"), lower(regexp_replace(col("text"), "\\s+", " ")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def gramsOf(t: String): Set[Seq[Byte]] =
      t.getBytes("UTF-8").sliding(5).map(_.toSeq).toSet
    val truth = (for {
      (a, ta) <- texts; (b, tb) <- texts if a < b
      ga = gramsOf(ta); gb = gramsOf(tb)
      i = ga.intersect(gb).size; u = ga.size + gb.size - i
      if i * 10 >= u * 7
    } yield (a, b) -> (i, u, i.toDouble / u)).toMap
    assert(verified.keySet === truth.keySet,
      s"missed=${truth.keySet -- verified.keySet} extra=${verified.keySet -- truth.keySet}")
    truth.foreach { case (k, v) => assert(verified(k) === v, s"pair $k") }
  }

  test("simhash: near-dup pairs have small hamming distance") {
    val sh = DedupOps.simhash(spark, sf)
    val pairs = truePairs.filter(col("jac") >= 0.9)
      .join(sh.select(col("doc_id").as("a"), col("simhash").as("ha")), "a")
      .join(sh.select(col("doc_id").as("b"), col("simhash").as("hb")), "b")
      .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .collect().map(_.getInt(0))
    assert(pairs.nonEmpty)
    assert(pairs.forall(_ <= 16),
      s"jaccard>=0.9 pairs should be within 16/64 bits, got ${pairs.mkString(",")}")
  }

  test("portable simhash: near-dup pairs have small hamming distance too") {
    val sh = TextQueries.simhashPortable(spark, sf)
      .select(col("doc_id"), conv(col("simhash_hex"), 16, 10).cast("decimal(22,0)"))
      .collect().map(r => r.getLong(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
    val close = truePairs.filter(col("jac") >= 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(close.nonEmpty)
    close.foreach { case (a, b) =>
      val hamming = (sh(a) ^ sh(b)).bitCount
      assert(hamming <= 16, s"pair ($a,$b) hamming $hamming")
    }
  }

  test("ANN LSH recall vs brute-force top-50") {
    val exact = SimilarityOps.cosineTopK(spark, sf, k = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = SimilarityOps.annLsh(spark, sf, k = 50, bits = 4, tables = 8)
      .select("vec_id", "cos_sim").collect()
    assert(ann.nonEmpty, "ANN should return candidates")
    val recall = ann.count(r => exact.contains(r.getLong(0))).toDouble / 50.0
    // weakly-clustered synthetic embeddings: multi-table LSH should
    // still recover a solid fraction of the true top-50 while scanning
    // a fraction of the corpus
    assert(recall >= 0.3, s"ANN recall $recall")
  }

  test("IVF ANN recall vs brute-force top-50") {
    val exact = SimilarityOps.cosineTopK(spark, sf, k = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = SimilarityOps.annIvf(spark, sf, k = 50, nlist = 16, nprobe = 4)
      .select("vec_id").collect().map(_.getLong(0))
    assert(ivf.nonEmpty)
    val recall = ivf.count(exact.contains).toDouble / 50.0
    assert(recall >= 0.3, s"IVF recall $recall")
    // the trained coarse quantizer (declared q67) must not be worse
    // than arbitrary sampled centroids — Lloyd iterations move cells
    // toward the data
    val trained = SimilarityOps.annIvf(spark, sf, k = 50, nlist = 16,
      nprobe = 4, trainIters = 2).select("vec_id").collect().map(_.getLong(0))
    val recallT = trained.count(exact.contains).toDouble / 50.0
    info(s"IVF recall: sampled $recall, trained $recallT")
    assert(recallT >= recall,
      s"trained IVF recall $recallT below sampled-centroid recall $recall")
  }

  test("IVF-cell blocked near-dup: perfect precision, pinned recall vs all-pairs truth") {
    val e = graft.Tables(spark, sf, "embeddings")
    val a = e.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val truth = a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(SimilarityOps.cosine(col("va"), col("vb")), 6).as("cs"))
      .filter(col("cs") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dup embedding pairs")
    val blocked = SimilarityOps.neardupIvfBlocked(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact by construction: every emitted pair carries its
    // true cosine and passed the threshold
    assert(blocked.subsetOf(truth), s"false positives: ${blocked -- truth}")
    val recall = blocked.size.toDouble / truth.size
    info(s"IVF-blocked recall $recall (${blocked.size}/${truth.size})")
    // multi-probe (3 cells/vector) blocking: 0.80 measured on this
    // fixture; single-probe was 0.22
    assert(recall >= 0.7, s"IVF-cell blocking recall $recall")
  }

  test("embedding near-dup report is bounded, thresholded, and label-consistent") {
    val nd = SimilarityOps.embeddingNeardup(spark, sf, 0.3).cache()
    assert(nd.filter(col("cos_sim") < 0.3).count() === 0)
    assert(nd.filter(col("a") === col("b")).count() === 0)
    // the declared output is bounded: at most k rows per doc, ranks 1..k
    val overK = nd.groupBy("a").count().filter(col("count") > 3).count()
    assert(overK === 0, "more than k neighbors emitted for some doc")
    assert(nd.filter(col("rank") < 1 || col("rank") > 3).count() === 0)
    // every emitted neighbor shares the doc's label (the block constraint)
    val e = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").as("blabel"))
    assert(nd.join(e, nd("b") === e("vec_id"))
      .filter(col("label") =!= col("blabel")).count() === 0)
    nd.unpersist()
  }

  test("embedding near-dup recall vs the exact same-label top-k truth") {
    // exact truth: per doc, the top-3 same-label neighbors above the
    // threshold, from the all-pairs cosine — the unbounded form the
    // bounded query approximates via IVF-cell candidate generation
    val e = graft.Tables(spark, sf, "embeddings")
    val a = e.select(col("label"), col("vec_id").as("a"), col("embedding").as("va"))
    val b = e.select(col("label"), col("vec_id").as("b"), col("embedding").as("vb"))
    val scored = a.join(b, Seq("label")).filter(col("a") =!= col("b"))
      .select(col("a"), col("b"),
        round(SimilarityOps.cosine(col("va"), col("vb")), 6).as("cs"))
      .filter(col("cs") >= 0.35)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a")).orderBy(col("cs").desc, col("b"))
    val truth = scored
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain same-label near-dup pairs")
    val got = SimilarityOps.embeddingNeardup(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"bounded near-dup recall $recall (${got.intersect(truth).size}/${truth.size})")
    assert(recall >= 0.7, s"label∩cell blocking recall $recall")
  }

  test("q187 per-source sketch == slot-wise merge of per-doc sketches (mergeability)") {
    val k = 16
    def wsNorm(c: org.apache.spark.sql.Column) =
      lower(regexp_replace(c, graft.operators.TextQueries.wsClass, " "))
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("source"), col("doc_id"), wsNorm(col("text")).as("t"))
      .filter(length(col("t")) >= 5)
    val grams = docs.select(col("source"), col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), length(col("t")) - 4),
          i => col("t").substr(i, lit(5))))).as("g"))
      .select(col("source"), col("doc_id"), md5(col("g")).as("h"))
      .select(col("source"), col("doc_id"),
        conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("ha"),
        conv(substring(col("h"), 9, 8), 16, 10).cast("long").as("hb"))
    val slotMins = (0 until k).map(i =>
      min((col("ha") + lit(i.toLong) * col("hb")) % lit(4294967296L)).as(s"s$i"))
    // two-level route: per-DOC sketches first, then slot-wise min across
    // the source's docs — the explicit merge the one-pass groupBy elides
    val perDoc = grams.groupBy(col("source"), col("doc_id"))
      .agg(slotMins.head, slotMins.tail: _*)
    val merged = perDoc.groupBy(col("source"))
      .agg(min(col("s0")).as("s0"),
        (1 until k).map(i => min(col(s"s$i")).as(s"s$i")): _*)
    val left = merged.select(col("source").as("source_a") +:
      (0 until k).map(i => col(s"s$i").as(s"a$i")): _*)
    val right = merged.select(col("source").as("source_b") +:
      (0 until k).map(i => col(s"s$i").as(s"b$i")): _*)
    val nMatch = (0 until k).map(i =>
      (col(s"a$i") === col(s"b$i")).cast("int")).reduce(_ + _)
    val expect = left.join(right, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), nMatch.as("n_match"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val got = DedupOps.sourceMinhashJaccard(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty, "fixture should contain at least two sources")
    assert(got.map(_._1).toSet == expect.keySet, "pair coverage differs")
    got.foreach { case (pair, n, j) =>
      assert(expect(pair) == n, s"merge mismatch at $pair")
      assert(j == n.toDouble / k, s"estimator not n_match/k at $pair")
    }
  }
}
