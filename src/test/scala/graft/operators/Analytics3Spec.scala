package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the q167–q172 surface — properties the
  * DuckDB oracle can't see: equivalence to independently-computed
  * driver-side truths, conservation laws, and the losslessness of the
  * q172 prefix filter (its whole correctness argument).
  */
class Analytics3Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q167: triangle participation equals a driver-side brute-force enumeration") {
    val got = Analytics3Queries.triangleCount(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent truth: replay the definition imperatively
    val items = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for {
      (_, ps) <- items.groupBy(_._1)
      sorted = ps.map(_._2).distinct.sorted
      i <- sorted.indices; j <- (i + 1) until sorted.length
    } pairCounts((sorted(i), sorted(j))) =
      pairCounts.getOrElse((sorted(i), sorted(j)), 0) + 1
    // NB: .iterator first — collect on a Map with pair-typed results
    // rebuilds a Map and silently collapses duplicate first components
    val edges = pairCounts.iterator.collect { case (e, n) if n >= 2 => e }.toSet
    val adj = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    for {
      (a, bs) <- adj; b <- bs
      cs <- adj.get(b).toSeq; c <- cs if edges((a, c))
      v <- Seq(a, b, c)
    } triCount(v) = triCount.getOrElse(v, 0L) + 1
    val want = triCount.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.nonEmpty, "triangle surface must be non-empty at sf0.001")
    assert(got.toSeq == want, s"got ${got.toSeq.take(5)}…\nwant ${want.take(5)}…")
  }

  test("q168: deciles partition the table into near-equal, range-ordered bins") {
    val rows = Analytics3Queries.equidepthHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = Tables(spark, sf, "lineitem").count()
    assert(rows.map(_._1).toSeq == (1L to 10L))
    assert(rows.map(_._2).sum == total)
    // equi-depth: sizes differ by at most 1 (ntile's contract)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // bins are ordered and non-overlapping on the value axis
    rows.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    rows.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) case _ => }
  }

  test("q168: ntileBucket arithmetic equals Spark's ntile for non-divisible N") {
    import org.apache.spark.sql.expressions.Window
    // 137 rows into 10 buckets: r = 7 buckets of 14, then 3 of 13 —
    // exercises the branch the evenly-divisible fixtures never hit
    val n = 137
    val df = spark.range(1, n + 1).toDF("rn")
    val got = df.select(col("rn"),
      Analytics3Queries.ntileBucket(col("rn"), n.toLong, 10).as("b"))
    val want = df.select(col("rn"),
      ntile(10).over(Window.orderBy(col("rn"))).cast("long").as("b"))
    assert(got.orderBy("rn").collect().map(_.getLong(1)).toSeq ==
      want.orderBy("rn").collect().map(_.getLong(1)).toSeq)
  }

  test("q169: profile accounts for every row and knows the key is unique") {
    val rows = Analytics3Queries.columnProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Tables(spark, sf, "documents").count()
    assert(rows.map(_._1).toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text_len"))
    rows.foreach { case (_, nRows, _, _) => assert(nRows == n) }
    val byCol = rows.map(r => r._1 -> r).toMap
    assert(byCol("doc_id")._3 == 0L) // no null keys
    assert(byCol("doc_id")._4 == n) // key is unique
    assert(byCol("lang")._4 <= 10L) // low-cardinality dimension
  }

  test("q170: Welch t matches a driver-side recomputation from raw orders") {
    val row = Analytics3Queries.abWelchT(spark, sf).collect() match {
      case Array(r) => r
      case other => fail(s"expected one row, got ${other.length}")
    }
    val cents = Tables(spark, sf, "orders")
      .select(col("o_custkey"), Exact.cents(col("o_totalprice")).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def arm(ck: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$ck:ab170".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val groups = cents.groupBy { case (ck, _) => arm(ck) }
    def stats(a: Long): (Long, Double, Double) = {
      val vs = groups(a).map(_._2.toDouble / 100.0)
      val n = vs.length
      val m = vs.sum / n
      val v = vs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n.toLong, m, v)
    }
    val (n0, m0, v0) = stats(0)
    val (n1, m1, v1) = stats(1)
    assert(row.getLong(0) == n0 && row.getLong(1) == n1)
    assert(math.abs(row.getDouble(2) - m0) < 1e-6)
    assert(math.abs(row.getDouble(3) - m1) < 1e-6)
    val t = (m1 - m0) / math.sqrt(v1 / n1 + v0 / n0)
    assert(math.abs(row.getDouble(4) - t) < 1e-5, s"t ${row.getDouble(4)} vs $t")
  }

  test("q171: fused ranks are consistent and the RRF ordering is correct") {
    val rows = Analytics3Queries.rrfFusion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 25)
    rows.foreach { case (_, rUnits, rRev, rrf) =>
      val expect = 1.0 / (60.0 + rUnits) + 1.0 / (60.0 + rRev)
      assert(math.abs(rrf - expect) < 1e-6)
    }
    // the output is the global top-25 by the fused score: every
    // returned score must be >= any score reconstructible from the
    // full ranking (spot check: ordering within the page is correct)
    rows.sliding(2).foreach { case Array(a, b) => assert(a._4 >= b._4) case _ => }
  }

  test("q173: BFS distances equal a driver-side breadth-first search") {
    val got = Analytics3Queries.bfsDistances(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // rebuild the same support-thresholded edge set imperatively
    val items = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for {
      (_, ps) <- items.groupBy(_._1)
      sorted = ps.map(_._2).distinct.sorted
      i <- sorted.indices; j <- (i + 1) until sorted.length
    } pairCounts((sorted(i), sorted(j))) =
      pairCounts.getOrElse((sorted(i), sorted(j)), 0) + 1
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    pairCounts.foreach { case ((a, b), n) =>
      if (n >= 2) {
        adj(a) = b :: adj.getOrElse(a, Nil)
        adj(b) = a :: adj.getOrElse(b, Nil)
      }
    }
    val src = adj.keys.min
    val distMap = scala.collection.mutable.Map(src -> 0L)
    var frontier = List(src)
    var depth = 0L
    while (frontier.nonEmpty && depth < 12) {
      depth += 1
      frontier = for {
        u <- frontier; v <- adj.getOrElse(u, Nil)
        if !distMap.contains(v)
      } yield { distMap(v) = depth; v }
    }
    val want = distMap.toSeq.sortBy(_._1)
    assert(got.length > 1, "BFS must reach beyond the source at sf0.001")
    assert(got.toSeq == want, s"got ${got.length} nodes, want ${want.length}")
  }

  test("q174-q177: TPC-H shapes equal driver-side recomputations") {
    // q174: disjunctive filter replayed imperatively
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val parts = Tables(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val hits = li.filter { case (pk, q, _, _) =>
      parts.get(pk).exists { case (brand, size) =>
        (brand == "Brand#12" && size >= 1 && size <= 15 && q >= 1 && q <= 11) ||
        (brand == "Brand#23" && size >= 1 && size <= 25 && q >= 10 && q <= 20) ||
        (brand == "Brand#34" && size >= 1 && size <= 35 && q >= 20 && q <= 30)
      }
    }
    val revCp = hits.map { case (_, _, ep, d) =>
      math.round(ep * 100) * (100L - math.round(d * 100)) }.sum
    val r174 = Analytics3Queries.tpchQ19(spark, sf).collect().head
    assert(r174.getLong(0) == hits.length.toLong)
    assert(math.abs(r174.getDouble(1) - revCp / 10000.0) < 1e-9)

    // q176: every reported order's quantity rollup really exceeds 270,
    // and the rows are the global top-100 by that rollup
    val r176 = Analytics3Queries.tpchQ18(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(4)))
    assert(r176.nonEmpty && r176.forall(_._2 > 270))
    assert(r176.map(_._2).toSeq == r176.map(_._2).sortBy(-_).toSeq)

    // q175: the reported suppliers carry exactly the max quarterly
    // revenue among all suppliers (recomputed from raw lines)
    val ship = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val bySupp = ship.groupBy(_._1).map { case (k, rows) =>
      k -> rows.map { case (_, ep, d) =>
        math.round(ep * 100) * (100L - math.round(d * 100)) }.sum }
    val maxCp = bySupp.values.max
    val r175 = Analytics3Queries.tpchQ15(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(r175.map(_._1).toSet == bySupp.filter(_._2 == maxCp).keySet)
    r175.foreach { case (_, rev) =>
      assert(math.abs(rev - maxCp / 10000.0) < 1e-9) }

    // q177: reported nations' customer counts match an anti-join
    // recomputation with the exact integer average comparison
    val custs = Tables(spark, sf, "customer")
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
      .select(col("c_custkey"), col("c_nationkey"),
        Exact.cents(col("c_acctbal")).as("bal")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val posBal = custs.map(_._3).filter(_ > 0)
    val (sSum, n) = (posBal.sum, posBal.length.toLong)
    val active = Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("2000-07-01").cast("timestamp"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val want = custs
      .filter { case (ck, _, bal) => bal * n > sSum && !active(ck) }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val r177 = Analytics3Queries.tpchQ22(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(r177 == want, s"got $r177 want $want")
  }

  test("q172: prefix-filtered containment equals brute-force truth (losslessness)") {
    val got = DedupOps.containmentJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force over ALL pairs with the same word-3-shingle kernel
    val wsClass = "[ \\t\\n\\u000B\\f\\r]+"
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).replaceAll(wsClass, " ").toLowerCase
          .trim.split(" ", -1)
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
    val want = for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (a, ga) = docs(i); (b, gb) = docs(j)
      isz = ga.count(gb.contains).toLong
      minSz = math.min(ga.size, gb.size).toLong
      if isz * 10 >= minSz * 8
    } yield (a, b, isz, minSz)
    assert(got.toSeq == want.toSeq,
      s"got ${got.length} pairs, want ${want.length}")
    assert(want.nonEmpty, "containment surface must be non-empty at sf0.001")
  }
}
