package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSignalsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("charEntropy matches a direct per-document computation") {
    val out = TextQueries.charEntropy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val texts = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.map(_._1).toSet === texts.filter(_._2.nonEmpty).keySet)
    out.foreach { case (id, nChars, bits) =>
      val text = texts(id)
      assert(nChars === text.length.toLong)
      val n = text.length.toDouble
      val expected = -text.groupBy(identity).values.map { g =>
        val p = g.length / n
        p * (math.log(p) / math.log(2))
      }.sum
      assert(math.abs(bits - expected) < 1e-6, s"doc $id: $bits vs $expected")
      // bounds: 0 (degenerate) .. log2(alphabet size)
      assert(bits >= 0.0 &&
        bits <= math.log(text.distinct.length.toDouble) / math.log(2) + 1e-9)
    }
  }

  test("vocabCoverage: counts are consistent and the vocab cut is exact") {
    val rows = TextQueries.vocabCoverage(spark, sf).collect()
    rows.foreach { r =>
      val (n, oov, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(oov >= 0 && oov <= n)
      assert(ratio === oov.toDouble / n)
    }
    // every document with at least one token appears
    val nDocs = graft.Tables(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0).count()
    assert(rows.length === nDocs)
    // independent recompute of total OOV mass via except-based membership
    val toks = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(100).select("w")
    val totalOov = toks.join(vocab, Seq("w"), "left_anti").count()
    assert(rows.map(_.getLong(2)).sum === totalOov)
  }
}
