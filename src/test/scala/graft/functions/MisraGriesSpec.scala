package graft.functions

import scala.collection.mutable
import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Misra–Gries survival guarantee — the property q73's
  * candidate→verify construction depends on: every item with true
  * frequency > n/(k+1) appears in the summary, under any partitioning
  * and merge order.
  */
class MisraGriesSpec extends SparkSpec {

  /** Zipf-ish synthetic stream: key i drawn with weight 1/(i+1). */
  private def zipfStream(n: Int, keys: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val weights = (0 until keys).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val totalW = cum.last
    (0 until n).map { _ =>
      val x = rnd.nextDouble() * totalW
      s"k${cum.indexWhere(x <= _)}"
    }
  }

  test("survival guarantee holds across partitionings (driver-side oracle)") {
    import spark.implicits._
    val k = 16
    val data = zipfStream(20000, 500, seed = 42)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustSurvive = truth.filter(_._2 > data.size.toDouble / (k + 1)).keySet
    assert(mustSurvive.nonEmpty, "fixture should contain heavy hitters")
    val mg = udaf(new MisraGries(k))
    for (parts <- Seq(1, 3, 8)) {
      val cands = data.toDF("w").repartition(parts)
        .agg(mg(col("w"))).head().getSeq[String](0).toSet
      assert(cands.size <= k, s"summary exceeded $k counters: ${cands.size}")
      assert(mustSurvive.subsetOf(cands),
        s"parts=$parts missed ${mustSurvive -- cands}")
    }
  }

  test("reduce-side decrements behave like the classic MG stream algorithm") {
    val mg = new MisraGries(2)
    // stream a a b c: 'c' arrives into a full {a:2, b:1} summary →
    // decrement-all drops b, leaves {a:1}
    val m = Seq("a", "a", "b", "c").foldLeft(mg.zero)(mg.reduce)
    assert(m === mutable.Map("a" -> 1L))
  }

  test("merge combines counts then subtracts the (k+1)-th largest") {
    val mg = new MisraGries(3)
    val a = mutable.Map("x" -> 10L, "y" -> 5L, "z" -> 1L)
    val b = mutable.Map("x" -> 7L, "w" -> 4L, "v" -> 2L)
    // combined: x17 y5 w4 v2 z1 → 4th-largest is 2 → subtract 2, drop ≤0
    assert(mg.merge(a, b) === mutable.Map("x" -> 15L, "y" -> 3L, "w" -> 2L))
  }

  test("q73 equals the exact full-vocabulary computation") {
    import graft.operators.TextQueries
    val sf = "/root/testdata/sf0.001"
    val got = TextQueries.heavyHitterTokens(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val words = graft.Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val total = words.count()
    val expected = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(total) / 256.0)
      .orderBy(col("cnt").desc, col("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got.nonEmpty, "corpus should have heavy-hitter tokens")
    assert(got === expected)
  }
}
