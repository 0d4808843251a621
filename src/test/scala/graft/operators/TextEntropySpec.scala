package graft.operators

import graft.SparkSpec

class TextEntropySpec extends SparkSpec {

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
}
