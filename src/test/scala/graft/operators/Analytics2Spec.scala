package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantic invariants for the q136–q147 surface — properties the
  * DuckDB oracle can't see: equivalence to independently-computed
  * local truths, conservation laws (row/mass accounting), and
  * determinism of the sampled surfaces.
  */
class Analytics2Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q136: lone-returner set equals a driver-side brute-force recomputation") {
    val got = Analytics2Queries.loneReturnerSuppliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // independent truth: collect the tiny fixture and replay the
    // definition imperatively
    val lines = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val fOrders = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val sName = Tables(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byOrder = lines.groupBy(_._1)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for {
      (ok, ls) <- byOrder if fOrders(ok)
      (_, supp, flag) <- ls if flag == "R"
      others = ls.filter(_._2 != supp)
      if others.nonEmpty && !others.exists(_._3 == "R")
    } counts(sName(supp)) = counts.getOrElse(sName(supp), 0L) + 1
    val want = counts.toSeq.sortBy { case (n, c) => (-c, n) }.take(20)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("q137: distribution masses account for every customer and every counted order") {
    val rows = Analytics2Queries.orderCountDistribution(spark, sf).collect()
    val nCust = Tables(spark, sf, "customer").count()
    val nOrders = Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum == nOrders)
  }

  test("q138: qualifying suppliers match the independently-aggregated volume rule") {
    val got = Analytics2Queries.bigVolumeSuppliers(spark, sf).collect().map(_.getString(0))
    val bigParts = Tables(spark, sf, "part")
      .filter(col("p_size") >= 40).select(col("p_partkey"))
    val vol = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .join(bigParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("q"))
      .filter(col("q") > 2300).select(col("l_suppkey"))
    val want = Tables(spark, sf, "supplier")
      .join(vol, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_name")).collect().map(_.getString(0)).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("q139: median/MAD equal an exact driver-side computation per type") {
    val got = Analytics2Queries.madOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val vals = Tables(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * 0.5
      val lo = s(h.toInt)
      val hi = s(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    vals.groupBy(_._1).foreach { case (tpe, xs) =>
      val cs = xs.map(_._2.toDouble)
      val med = medianOf(cs)
      val mad = medianOf(cs.map(c => math.abs(c - med)))
      val row = got(tpe)
      assert(row.getLong(1) == cs.length.toLong)
      assert(row.getDouble(2) == math.rint(med / 100.0 * 1000) / 1000.0 ||
        math.abs(row.getDouble(2) - med / 100.0) < 5e-4, s"$tpe median")
      assert(math.abs(row.getDouble(3) - mad / 100.0) < 5e-4, s"$tpe mad")
      val thr = 3.5 / 0.6745 * mad
      val nOut = cs.count(c => math.abs(c - med) > thr).toLong
      assert(row.getLong(4) == nOut, s"$tpe outliers")
    }
  }

  test("q140: contingency cells conserve the event count and expected mass") {
    val rows = Analytics2Queries.chisqWeekday(spark, sf).collect()
    val n = Tables(spark, sf, "events").count()
    assert(rows.map(_.getLong(2)).sum == n)
    // expected counts sum back to ~N (each cell rounded to 1e-6)
    val expSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(expSum - n.toDouble) < 1e-3, s"expected mass $expSum vs $n")
    // chi2 contributions are non-negative and finite
    rows.foreach(r => assert(r.getDouble(4) >= 0 && !r.getDouble(4).isNaN))
  }

  test("q141: per-nation slope equals a local least-squares fit") {
    val got = Analytics2Queries.groupOlsTrend(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val daily = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(r => (r.getInt(0), r.getInt(1).toLong, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (nk, pts) =>
      val n = pts.length.toDouble
      val sx = pts.map(_._2.toDouble).sum
      val sy = pts.map(_._3.toDouble).sum
      val sxy = pts.map(p => p._2.toDouble * p._3).sum
      val sxx = pts.map(p => p._2.toDouble * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0
      val (gn, gs) = got(nk)
      assert(gn == pts.length.toLong)
      assert(math.abs(gs - slope) < 1e-4, s"nation $nk slope $gs vs $slope")
    }
  }

  test("q142: transition counts conserve successors; rows normalize per source") {
    val rows = Analytics2Queries.markovTransitions(spark, sf).collect()
    val ev = Tables(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    // every event except each user's last has exactly one successor
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"src $src probs sum to $p")
    }
  }

  test("q143: gap count conserves (events - users); max >= avg > 0") {
    val rows = Analytics2Queries.interEventGaps(spark, sf).collect()
    val ev = Tables(spark, sf, "events")
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nEvents - nUsers)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) >= r.getDouble(2),
        s"${r.getString(0)} avg/max")
    }
  }

  test("q144: attribution conserves purchase count and revenue") {
    val rows = Analytics2Queries.lastTouchAttribution(spark, sf).collect()
    val purchases = Tables(spark, sf, "events").filter(col("event_type") === "purchase")
    assert(rows.map(_.getLong(1)).sum == purchases.count())
    val cents = purchases.select(sum(round(col("value") * 100).cast("long")))
      .head.getLong(0)
    val got = rows.map(_.getDouble(2)).sum
    assert(math.abs(got - cents / 100.0) < 1e-6 * math.max(1.0, math.abs(got)))
    // attribution days can never precede the fixture's first click
    val firstClick = Tables(spark, sf, "events")
      .filter(col("event_type") === "click")
      .select(min(col("ts").cast("date"))).head.getDate(0)
    rows.filter(!_.isNullAt(0)).foreach(r =>
      assert(!r.getDate(0).before(firstClick)))
  }

  test("q145: sample is exactly 3 per type and identical across runs") {
    val a = Analytics2Queries.deterministicSample(spark, sf).collect()
    val b = Analytics2Queries.deterministicSample(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    a.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L), s"type $tpe ranks")
    }
  }

  test("q146: audit reports zero orphans on the clean fixture with true child counts") {
    val rows = Analytics2Queries.fkOrphanAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 5)
    rows.values.foreach { case (_, orphans) => assert(orphans == 0L) }
    assert(rows("lineitem->orders")._1 == Tables(spark, sf, "lineitem").count())
    assert(rows("orders->customer")._1 == Tables(spark, sf, "orders").count())
    assert(rows("customer->nation")._1 == Tables(spark, sf, "customer").count())
  }

  test("q148: rollup levels each conserve the grand total") {
    val rows = Analytics2Queries.timeRollup(spark, sf).collect()
    val nOrders = Tables(spark, sf, "orders").count()
    val cents = Tables(spark, sf, "orders")
      .select(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    // four hierarchy levels: month (gid 0), quarter subtotal (4),
    // year subtotal (6), grand total (7) — each a full partition of
    // the order set
    for (gid <- Seq(0L, 4L, 6L, 7L)) {
      val level = rows.filter(_.getLong(0) == gid)
      assert(level.map(_.getLong(4)).sum == nOrders, s"gid $gid order count")
      val rev = level.map(_.getDouble(5)).sum
      assert(math.abs(rev - cents / 100.0) < 1e-6 * rev, s"gid $gid revenue")
    }
    assert(rows.count(_.getLong(0) == 7L) == 1)
  }

  test("q149: rho is within [-1,1], rows conserve the join, self-correlation sanity") {
    val rows = Analytics2Queries.spearmanCorr(spark, sf).collect()
    val n = Tables(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      val rho = r.getDouble(2)
      assert(rho >= -1.0 && rho <= 1.0, s"${r.getString(0)} rho $rho")
    }
    // independent truth for one brand: average-rank Spearman computed
    // driver-side from first principles
    val pts = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === "Brand#1")
      .select(col("l_quantity"), col("l_extendedprice")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    def avgRanks(vs: Array[Double]): Array[Double] = {
      val sorted = vs.sorted
      vs.map { v =>
        val first = sorted.indexWhere(_ == v) + 1
        val ties = sorted.count(_ == v)
        first + (ties - 1) / 2.0
      }
    }
    val rx = avgRanks(pts.map(_._1))
    val ry = avgRanks(pts.map(_._2))
    val nn = rx.length.toDouble
    val (sx, sy) = (rx.sum, ry.sum)
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val sxx = rx.map(v => v * v).sum
    val syy = ry.map(v => v * v).sum
    val want = (nn * sxy - sx * sy) / math.sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy))
    val got = rows.find(_.getString(0) == "Brand#1").get.getDouble(2)
    assert(math.abs(got - want) < 1e-5, s"Brand#1 rho $got vs $want")
  }

  test("q150: audit accounts every lineitem row under each key column") {
    val rows = Analytics2Queries.skewAudit(spark, sf).collect()
    val n = Tables(spark, sf, "lineitem").count()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) == n, s"${r.getString(0)} n_rows")
      assert(r.getLong(3) >= 1L && r.getDouble(4) <= r.getLong(3).toDouble,
        s"${r.getString(0)} max/p50 ordering")
      assert(r.getDouble(6) >= 1.0, s"${r.getString(0)} skew ratio < 1")
    }
  }

  test("q151: histogram conserves the event count with contiguous decade bins") {
    val rows = Analytics2Queries.valueHistogram(spark, sf).collect()
    val n = Tables(spark, sf, "events").count()
    assert(rows.map(_.getLong(3)).sum == n)
    rows.foreach { r =>
      val bin = r.getLong(0)
      assert(r.getDouble(1) == bin * 10.0)
      if (bin == 19L) assert(r.isNullAt(2)) else assert(r.getDouble(2) == bin * 10.0 + 10.0)
    }
    // independent recount of one bin
    val bin3 = Tables(spark, sf, "events")
      .filter(col("value") >= 30.0 && col("value") < 40.0).count()
    assert(rows.find(_.getLong(0) == 3L).map(_.getLong(3)).contains(bin3))
  }

  test("q152: HOF kernels agree with a driver-side fold over the raw vectors") {
    val rows = Analytics2Queries.arrayHof(spark, sf).collect()
    assert(rows.length == 100)
    val raw = Tables(spark, sf, "embeddings").orderBy("vec_id").limit(3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.take(3).foreach { r =>
      val v = raw(r.getLong(0)).map(_.toDouble)
      val l2 = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      assert(math.abs(r.getDouble(1) - l2) < 1e-6)
      assert(r.getLong(2) == v.count(_ > 0).toLong)
      assert(math.abs(r.getDouble(3) - v.map(math.abs).max) < 1e-6)
      assert(math.abs(r.getDouble(4) - v.sum / v.length) < 1e-6)
    }
  }

  test("q153: mined tokens are exactly the s-words of the fixture vocabulary") {
    val rows = Analytics2Queries.regexTokenMine(spark, sf).collect()
    val toks = rows.map(_.getString(0)).toSet
    // every token starts with s and is a real word of the corpus
    assert(toks.nonEmpty && toks.forall(_.startsWith("s")))
    // global count >= per-doc count for each token
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2)))
    // independent recount for one token via plain string ops
    val want = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === rows.head.getString(0)).count()
    assert(rows.head.getLong(1) == want)
  }

  test("q154: throttle conserves events; kept = distinct (user,type,window) count") {
    val rows = Analytics2Queries.windowedDedup(spark, sf).collect()
    val n = Tables(spark, sf, "events").count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
    val kept = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 600000000").as("win"))
      .distinct().groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == kept(r.getString(0)),
      s"${r.getString(0)} kept"))
  }

  test("q155: conversion accounts every click; converted set matches a direct join") {
    val rows = Analytics2Queries.conversionWindow(spark, sf).collect()
    val clicks = Tables(spark, sf, "events").filter(col("event_type") === "click")
    assert(rows.map(_.getLong(1)).sum == clicks.count())
    // independent truth: semi join with the same range condition
    val purchases = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val nConv = clicks.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") > col("ts") &&
          unix_micros(col("p_ts")) - unix_micros(col("ts")) <= 1800000000L,
        "left_semi").count()
    assert(rows.map(_.getLong(2)).sum == nConv)
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0 &&
        math.abs(rate - r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
  }

  test("q156/q157/q158: TPC-H shapes match independent recomputations") {
    // Q3: revenue of the top row re-derived directly
    val top = Analytics2Queries.tpchQ3(spark, sf).collect()
    assert(top.length == 10)
    assert(top.map(_.getDouble(3)).toSeq == top.map(_.getDouble(3)).sortBy(-_).toSeq)
    val topKey = top.head.getLong(0)
    val want = Tables(spark, sf, "lineitem")
      .filter(col("l_orderkey") === topKey &&
        col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .select(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long"))).head.getLong(0)
    assert(math.abs(top.head.getDouble(3) - want / 100.0) < 1e-9)
    // Q6: count equals the direct filter count
    val q6 = Analytics2Queries.tpchQ6(spark, sf).head
    val n6 = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24).count()
    assert(q6.getLong(1) == n6)
    // Q14: percentage bounded and consistent with the unconditional sums
    val pct = Analytics2Queries.tpchQ14(spark, sf).head.getDouble(0)
    assert(pct > 0.0 && pct < 100.0)
  }

  test("q159: trigram mass equals sequences of length >= 3 per user (top-20 bounded)") {
    val rows = Analytics2Queries.eventTrigrams(spark, sf).collect()
    assert(rows.length <= 20)
    assert(rows.map(_.getLong(3)).toSeq == rows.map(_.getLong(3)).sortBy(-_).toSeq)
    // total trigram count (unlimited) = sum over users of max(0, n_events - 2)
    val perUser = Tables(spark, sf, "events")
      .groupBy(col("user_id")).count().collect().map(_.getLong(1))
    val wantTotal = perUser.map(n => math.max(0L, n - 2)).sum
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gotTotal = Tables(spark, sf, "events")
      .select(lead(col("event_type"), 1).over(byUser).as("b"),
        lead(col("event_type"), 2).over(byUser).as("c"))
      .filter(col("b").isNotNull && col("c").isNotNull).count()
    assert(gotTotal == wantTotal)
  }

  test("q160: sketch quantiles bracket the exact percentile within one bin width") {
    val rows = Analytics2Queries.sketchQuantiles(spark, sf).collect()
    assert(rows.length == 15) // 5 types x 3 quantiles
    val cents = Tables(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = cents.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    rows.foreach { r =>
      val (tpe, p, est) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val vs = byType(tpe)
      val n = vs.length.toDouble
      // rank correctness: the crossing bin's mass straddles p*n — fewer
      // than p*n values sit below the bin's lower edge, at least p*n at
      // or below its upper edge (the estimate lives inside that bin)
      val bin = math.floor(est * 100 / 500).toLong
      assert(vs.count(_ < bin * 500).toDouble < p * n + 1e-9,
        s"$tpe p$p too many below bin")
      assert(vs.count(_ < (bin + 1) * 500).toDouble >= p * n - 1e-9,
        s"$tpe p$p bin mass short")
    }
    // monotone in p per type
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val vs = rs.sortBy(_.getDouble(1)).map(_.getDouble(2))
      assert(vs.toSeq == vs.sorted.toSeq, s"$tpe not monotone")
    }
  }

  test("q161: burstiness moments equal a driver-side recomputation") {
    val got = Analytics2Queries.gapBurstiness(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    import org.apache.spark.sql.expressions.{Window => W}
    val byUser = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables(spark, sf, "events")
      .select(col("event_type"),
        ((lead(unix_micros(col("ts")), 1).over(byUser) - unix_micros(col("ts")))
          .cast("long") / lit(1000000L)).cast("long").as("gap"))
      .filter(col("gap").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    gaps.groupBy(_._1).foreach { case (tpe, xs) =>
      val n = xs.length.toDouble
      val s1 = xs.map(_._2.toDouble).sum
      val s2 = xs.map(x => x._2.toDouble * x._2).sum
      val mean = s1 / n
      val sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
      val r = got(tpe)
      assert(r.getLong(1) == xs.length.toLong)
      assert(math.abs(r.getDouble(2) - mean) < 1e-3, s"$tpe mean")
      assert(math.abs(r.getDouble(3) - sd) < 1e-3, s"$tpe sd")
      assert(math.abs(r.getDouble(4) - sd / mean) < 1e-6, s"$tpe cv")
    }
  }

  test("q162: overlap matrix is complete and one pair matches a raw-gram recomputation") {
    val rows = Analytics2Queries.sourceOverlap(spark, sf).collect()
    val sources = Tables(spark, sf, "documents")
      .select(col("source")).distinct().count().toInt
    assert(rows.length == sources * (sources - 1) / 2)
    rows.foreach { r =>
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
    // independent truth for the first pair, with RAW grams (md5 is a
    // bijection for jaccard purposes absent collisions)
    val (sa, sb) = (rows.head.getString(0), rows.head.getString(1))
    def gramsOf(src: String): Set[String] = Tables(spark, sf, "documents")
      .filter(col("source") === src && length(col("text")) >= 5)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(t => t.sliding(5)).toSet
    val (ga, gb) = (gramsOf(sa), gramsOf(sb))
    val inter = ga.intersect(gb).size
    val want = inter.toDouble / (ga.size + gb.size - inter)
    assert(rows.head.getLong(3) == ga.size.toLong)
    assert(rows.head.getLong(4) == gb.size.toLong)
    assert(math.abs(rows.head.getDouble(5) - want) < 1e-6)
  }

  test("q163: systematic sample matches the local stride walk and draws ~100 hits") {
    val rows = Analytics2Queries.weightedSample(spark, sf).collect()
    val wts = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = wts.map(_._2).sum
    val step = total.toDouble / 100
    var cum = 0L
    val want = wts.flatMap { case (id, wt) =>
      cum += wt
      val hits = math.floor(cum / step).toLong - math.floor((cum - wt) / step).toLong
      if (hits >= 1) Some((id, wt, hits)) else None
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == want.toSeq)
    val totalHits = rows.map(_.getLong(2)).sum
    assert(totalHits >= 99 && totalHits <= 101, s"total hits $totalHits")
    // heavier docs are sampled no less often per unit weight: every
    // doc with wt >= step must be selected
    val must = wts.filter(_._2 >= step).map(_._1).toSet
    assert(must.subsetOf(rows.map(_.getLong(0)).toSet))
  }

  test("q164: shares normalize within quarter and year; revenue conserves") {
    val rows = Analytics2Queries.shareOfParent(spark, sf).collect()
    val cents = Tables(spark, sf, "orders")
      .select(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    val revSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(revSum - cents / 100.0) < 1e-6 * revSum)
    rows.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (k, rs) =>
      val s = rs.map(_.getDouble(4)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"quarter $k shares sum $s")
    }
    rows.groupBy(_.getLong(0)).foreach { case (y, rs) =>
      val s = rs.map(_.getDouble(5)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"year $y shares sum $s")
    }
  }

  test("q165: WAU >= DAU per day and equals a direct trailing-window recount") {
    val rows = Analytics2Queries.rollingWau(spark, sf).collect()
    val act = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = act.map(_._2).distinct
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getLong(2) >= r.getLong(1), s"$d wau < dau")
      val want = act.filter { case (_, ad) =>
        !ad.isAfter(d) && !ad.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
      assert(r.getLong(2) == want, s"$d wau")
      assert(math.abs(r.getDouble(3) - r.getLong(1).toDouble / r.getLong(2)) < 1e-6)
    }
    assert(rows.length == days.length)
  }

  test("q166: active = new + returning; new-user mass equals the user count") {
    val rows = Analytics2Queries.newVsReturning(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3)))
    val nUsers = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    // every user is new exactly once
    assert(rows.map(_.getLong(2)).sum == nUsers)
    // day one: everyone active is new
    assert(rows.head.getLong(2) == rows.head.getLong(1) && rows.head.getLong(3) == 0L)
  }

  test("q147: monthly revenue conserves the order total; deltas telescope") {
    val rows = Analytics2Queries.momGrowth(spark, sf).collect()
    val cents = Tables(spark, sf, "orders")
      .select(sum(round(col("o_totalprice") * 100).cast("long"))).head.getLong(0)
    val revSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(revSum - cents / 100.0) < 1e-6 * revSum)
    // telescoping: sum of deltas = last month - first month
    val deltas = rows.drop(1).map(_.getDouble(3)).sum
    val diff = rows.last.getDouble(2) - rows.head.getDouble(2)
    assert(math.abs(deltas - diff) < 1e-6 * math.max(1.0, math.abs(diff)))
    assert(rows.head.isNullAt(3) && rows.head.isNullAt(4))
  }
}
