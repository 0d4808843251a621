package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextHashes

/** Property tests using seeded ScalaCheck generators sampled in plain
  * loops (deterministic; scalatestplus bridge is not on the offline
  * classpath). */
object Props {
  private val params = Gen.Parameters.default
  def samples[T](g: Gen[T], n: Int, seed0: Long = 42L): Seq[T] =
    (0 until n).map(i => g.pureApply(params, Seed(seed0 + i)))
}

/** Pure-JVM property tests for the expression kernels. */
class KernelPropertySpec extends AnyFunSuite {
  import Props.samples

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' ')))
        .map(_.mkString))

  test("gramSet equals the naive n-gram set, sorted and distinct") {
    for {
      s <- samples(asciiText, 100)
      n <- 1 to 8
    } {
      val got = TextHashes.gramSet(s.getBytes("UTF-8"), n)
      val naive = s.getBytes("UTF-8").sliding(n).filter(_.length == n)
        .map(_.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xFFL))).toSet
      assert(got.toSet === naive, s"text='$s' n=$n")
      assert(got.toSeq === got.toSeq.sorted)
      assert(got.distinct.length === got.length)
    }
  }

  test("sortedIntersectSize equals set-intersection size") {
    val gl = Gen.listOf(Gen.choose(-50L, 50L))
    for ((a, b) <- samples(gl, 100).zip(samples(gl, 100, seed0 = 777L))) {
      val sa = a.distinct.sorted.toArray
      val sb = b.distinct.sorted.toArray
      assert(TextHashes.sortedIntersectSize(sa, sb) === (sa.toSet & sb.toSet).size)
    }
  }

  test("minhashSig: deterministic, k-long; slot-match rate tracks true jaccard") {
    for (s <- samples(asciiText, 50); k <- Seq(4, 32)) {
      val sig1 = TextHashes.minhashSig(s.getBytes("UTF-8"), k, 5)
      val sig2 = TextHashes.minhashSig(s.getBytes("UTF-8"), k, 5)
      assert(sig1.toSeq === sig2.toSeq)
      assert(sig1.length === k)
    }
    val a = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val b = "the quick brown fox jumps over the lazy cat and keeps running far away"
    val k = 256
    val sa = TextHashes.minhashSig(a.getBytes, k, 5)
    val sb = TextHashes.minhashSig(b.getBytes, k, 5)
    val est = sa.indices.count(i => sa(i) == sb(i)).toDouble / k
    def grams(s: String) = s.getBytes.sliding(5).map(_.toSeq).toSet
    val (ga, gb) = (grams(a), grams(b))
    val jac = (ga & gb).size.toDouble / (ga | gb).size
    assert(math.abs(est - jac) < 0.15, s"estimate $est vs true $jac")
  }

  test("simhash64: deterministic; disjoint vocab -> distant hashes") {
    for (s <- samples(asciiText, 100))
      assert(TextHashes.simhash64(s.getBytes) === TextHashes.simhash64(s.getBytes))
    val h1 = TextHashes.simhash64("alpha beta gamma delta epsilon".getBytes)
    val h2 = TextHashes.simhash64("zebra yak xylophone walrus vulture".getBytes)
    assert(java.lang.Long.bitCount(h1 ^ h2) > 8)
  }
}

/** Spark-level property: the distributed inventory replay agrees with a
  * naive sequential reference loop on randomized item streams
  * (SURVEY.md §5 property-test plan).
  */
class ReplayPropertySpec extends SparkSpec {
  import Props.samples

  private case class Item(product: Int, day: String, seq: Long, pos: Int, qty: Int, stock: Int)

  private def naiveReplay(items: Seq[Item], reloadDaily: Boolean): Seq[(Item, Boolean)] = {
    val remaining = scala.collection.mutable.Map[Int, Int]()
    val seenDay = scala.collection.mutable.Map[Int, String]()
    items.sortBy(i => (i.day, i.seq, i.pos)).map { it =>
      if (!remaining.contains(it.product) ||
          (reloadDaily && seenDay(it.product) != it.day)) {
        remaining(it.product) = it.stock
        seenDay(it.product) = it.day
      }
      if (remaining(it.product) >= it.qty) {
        remaining(it.product) -= it.qty
        (it, true)
      } else (it, false)
    }
  }

  test("distributed replay == naive sequential replay on random streams") {
    import graft.candy.{InventoryReplay, ItemEvent}
    import spark.implicits._
    val genItems: Gen[List[Item]] = for {
      n <- Gen.choose(1, 60)
      items <- Gen.listOfN(n, for {
        p <- Gen.choose(1, 5)
        d <- Gen.oneOf("20240101", "20240102", "20240103")
        q <- Gen.choose(1, 6)
      } yield (p, d, q))
    } yield items.zipWithIndex.map { case ((p, d, q), i) =>
      Item(p, d, i.toLong, 0, q, stock = 8 + p) // small stocks force cancels
    }

    for ((items, i) <- samples(genItems, 8).zipWithIndex) {
      val reload = i % 2 == 0
      val events = items.map(it => ItemEvent(
        order_id = it.seq, customer_id = 1, order_datetime = "t",
        day = it.day, seq = it.seq, pos = it.pos, product_id = it.product,
        product_name = "p", qty = it.qty, unit_price = 1.0,
        cost_to_make = 0.5, stock = it.stock))
      val got = InventoryReplay.replay(spark.createDataset(events), reload)
        .collect().map(l => (l.product_id, l.seq) -> l.fulfilled).toMap
      val expected = naiveReplay(items, reload)
        .map { case (it, f) => (it.product, it.seq) -> f }.toMap
      assert(got === expected, s"sample $i reload=$reload")
    }
  }
}
