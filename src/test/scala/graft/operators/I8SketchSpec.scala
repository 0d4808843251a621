package graft.operators

import graft.SparkSpec
import graft.Props
import graft.functions.VectorKernels
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The i8 cosine sketch (VectorKernels.i8Sketch / i8CosBound): the
  * bound must NEVER undercut the exact cosine — that is the whole
  * losslessness contract the q59/q66/q87 pre-verify prune rests on —
  * and the pruned pipelines must emit bit-identical declared results.
  * (Lives in graft.operators for neardupIvfBlockedRaw access.)
  */
class I8SketchSpec extends SparkSpec {
  import Props.samples

  private val pairGen: Gen[(Array[Float], Array[Float])] = for {
    d <- Gen.choose(1, 64)
    a <- Gen.listOfN(d, Gen.choose(-100.0f, 100.0f))
    b <- Gen.listOfN(d, Gen.choose(-100.0f, 100.0f))
  } yield (a.toArray, b.toArray)

  test("i8CosBound is a rigorous upper bound on the exact cosine") {
    for ((a, b) <- samples(pairGen, 500)) {
      val exact = VectorKernels.cosineFF(a, b)
      val bound = VectorKernels.i8CosBound(
        VectorKernels.i8Sketch(a), VectorKernels.i8Sketch(b))
      // 1e-9 covers the bound's own FP evaluation error; the pipelines
      // use 1e-6 (which additionally absorbs the round(·, 6) in the
      // declared filters)
      if (!exact.isNaN)
        assert(bound + 1e-9 >= exact, s"bound $bound < cosine $exact")
      // correlated pair too (uniform-random pairs cluster near 0)
      val c = a.map(x => x * 0.9f + 1.0f)
      val exactC = VectorKernels.cosineFF(a, c)
      val boundC = VectorKernels.i8CosBound(
        VectorKernels.i8Sketch(a), VectorKernels.i8Sketch(c))
      if (!exactC.isNaN)
        assert(boundC + 1e-9 >= exactC, s"bound $boundC < cosine $exactC")
    }
  }

  test("bound is tight enough to prune: typical slack is small at d=32") {
    val rnd = new scala.util.Random(7)
    val slacks = (0 until 200).map { _ =>
      val a = Array.fill(32)(rnd.nextGaussian().toFloat)
      val b = Array.fill(32)(rnd.nextGaussian().toFloat)
      VectorKernels.i8CosBound(
        VectorKernels.i8Sketch(a), VectorKernels.i8Sketch(b)) -
        VectorKernels.cosineFF(a, b)
    }
    val mean = slacks.sum / slacks.size
    assert(slacks.forall(_ >= 0.0), "negative slack: bound violated")
    assert(mean < 0.05, s"mean slack $mean too loose to ever prune")
  }

  test("zero and null vectors: sketch of zeros bounds at 0; null elements null out") {
    assert(VectorKernels.i8CosBound(
      VectorKernels.i8Sketch(Array.fill(8)(0.0f)),
      VectorKernels.i8Sketch(Array.fill(8)(1.0f))) === 0.0)
    val df = spark.sql(
      "SELECT i8_sketch(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT))) AS s")
    assert(df.collect()(0).isNullAt(0))
  }

  test("q66 declared results are identical with the prune in place") {
    // truth = the same candidate pipeline with the prune's threshold
    // lowered to -1 (bound >= exact >= -1 for every real pair, and a
    // zero-vector pair bounds at 0 — nothing is pruned), then the
    // declared 0.35 filter applied outside
    val sf = "/root/testdata/sf0.001"
    val pruned = SimilarityOps.neardupIvfBlocked(spark, sf, threshold = 0.35)
    val open = SimilarityOps.neardupIvfBlockedRaw(spark, sf, threshold = -1.0)
      .filter(col("cos_sim") >= 0.35).orderBy("a", "b")
    assert(pruned.collect().toSeq === open.collect().toSeq)
  }
}
