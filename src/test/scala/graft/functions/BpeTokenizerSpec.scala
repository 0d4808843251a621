package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins the BPE tokenizer's full contract: deterministic training,
  * well-formed merge table, and the codegen'd column fold agreeing
  * with an independent plain-Scala application of the same spec. */
class BpeTokenizerSpec extends SparkSpec {

  /** Reference implementation straight off the spec: sanitize, apply
    * merges via String.replace in rank order, count non-space chars. */
  private def reference(text: String): Int = {
    val sanitized = text.replaceAll("[^A-Za-z0-9 ]+", " ")
      .toLowerCase.replaceAll(" +", " ").trim
    val applied = BpeTokenizer.merges.foldLeft(sanitized) {
      case (acc, (pair, unit)) => acc.replace(pair, unit.toString) }
    applied.count(_ != ' ')
  }

  test("training is deterministic and the merge table is well-formed") {
    assert(BpeTokenizer.merges.size === 48)
    // re-training reproduces the exact table (pure function of the corpus)
    assert(BpeTokenizer.train(BpeTokenizer.corpus, 48) === BpeTokenizer.merges)
    // units are sequential PUA chars; pairs never span a space and are
    // two chars drawn from the evolving alphabet
    BpeTokenizer.merges.zipWithIndex.foreach { case ((pair, unit), i) =>
      assert(unit === ('' + i).toChar)
      assert(pair.length === 2 && !pair.contains(' '))
    }
    // hierarchy: at least one later merge builds on an earlier unit
    assert(BpeTokenizer.merges.exists { case (p, _) => p.exists(_ >= '') },
      "48 merges over this corpus must produce at least one stacked merge")
  }

  test("the codegen'd column fold matches the reference on edge cases and fixture text") {
    import spark.implicits._
    val samples = Seq(
      "The data pipeline, with training-tokens!",
      "  multiple   spaces\tand\nnewlines  ",
      "ALLCAPS AND numbers 12345 mixed09",
      "unicode stripped: café 中文 Über",
      "", " ", "a", "the the the the",
      "punctuation-only: !!! ??? ...")
    val df = samples.toDF("text")
      .select(col("text"), BpeTokenizer.tokenCount(col("text")).as("tok"))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    samples.foreach { s =>
      assert(got(s) === reference(s), s"mismatch on '$s'")
    }
    // merging genuinely compresses: common words cost < their char count
    val full = "the training data pipeline tokenizes documents"
    assert(got.getOrElse(full, -1) === -1) // not in samples; compute now
    val tok = Seq(full).toDF("text")
      .select(BpeTokenizer.tokenCount(col("text"))).head().getInt(0)
    assert(tok === reference(full))
    assert(tok < full.count(_ != ' '),
      "BPE must compress below the per-char count on in-domain text")

    // fixture text end-to-end (the q235 input path)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(20).collect()
    val fixture = docs.map(_.getString(1)).toSeq
    val counted = fixture.toDF("text")
      .select(col("text"), BpeTokenizer.tokenCount(col("text")).as("tok"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    fixture.foreach { s => assert(counted(s) === reference(s)) }
  }
}
