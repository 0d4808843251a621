package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 analytics extensions (q122–
  * q128) — properties the DuckDB oracle can't see (internal
  * consistency, equivalence to independently-computed truths).
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q122: recursive depth/root equal the direct digit computation") {
    val rows = AnalyticsQueries.recursiveHierarchy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (key, depth, root) = (r.getLong(0), r.getInt(1), r.getLong(2))
      // parent = key DIV 10 until single digit: depth = #digits - 1,
      // root = leading digit
      val digits = key.toString.length
      assert(depth == digits - 1, s"key $key depth $depth")
      assert(root == key.toString.head.asDigit.toLong, s"key $key root $root")
    }
    // every customer walked
    val n = Tables(spark, sf, "customer").count()
    assert(rows.length.toLong == n)
  }

  test("q123: bloom-pruned join result equals the plain join (no false negatives)") {
    val bloom = AnalyticsQueries.bloomPrunedJoin(spark, sf).collect()
    val urgent = Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
    val plain = Tables(spark, sf, "lineitem")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(Exact.cents(col("l_extendedprice"))) / lit(100.0)).as("urgent_revenue"))
      .orderBy("day").collect()
    assert(bloom.toSeq == plain.toSeq)
  }

  test("q124: SCD2 intervals are contiguous, compressed, and single-current per user") {
    val rows = AnalyticsQueries.scd2Build(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (user, hist) =>
      // already sorted by valid_from within the global sort
      hist.sliding(2).foreach {
        case Array(a, b) =>
          // contiguous: next interval starts where the previous ends
          assert(a.getTimestamp(3) == b.getTimestamp(2), s"gap in user $user history")
          // compressed: consecutive segments carry DIFFERENT attribute values
          assert(a.getString(1) != b.getString(1), s"uncompressed run in user $user")
        case _ => ()
      }
      assert(hist.count(_.getBoolean(4)) == 1, s"user $user current-row count")
      assert(hist.last.isNullAt(3), s"user $user open interval not last")
    }
    // row count == number of change points (first event + each type switch)
    assert(rows.length > byUser.size) // at least one change somewhere
  }

  test("q125: every event lands in exactly two sliding windows") {
    val agg = AnalyticsQueries.slidingWindow(spark, sf).collect()
    val events = Tables(spark, sf, "events")
    val n = events.count()
    assert(agg.map(_.getLong(1)).sum == 2 * n)
    val cents = events.select(sum(Exact.cents(col("value")))).head.getLong(0)
    val total = agg.map(_.getDouble(2)).sum
    assert(math.abs(total - 2.0 * cents / 100.0) < 1e-6 * math.abs(total))
  }

  test("q126: profile matches per-column direct aggregates") {
    val prof = AnalyticsQueries.columnProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val o = Tables(spark, sf, "orders")
    val ck = prof("o_custkey")
    assert(ck.getLong(1) == o.filter(col("o_custkey").isNotNull).count())
    assert(ck.getLong(2) == o.select(col("o_custkey")).distinct().count())
    assert(ck.getDouble(3) == o.select(min(col("o_custkey"))).head.getLong(0).toDouble)
    val st = prof("o_orderstatus")
    assert(st.isNullAt(3) && st.isNullAt(4)) // numeric stats null for strings
    assert(st.getString(5) == o.select(min(col("o_orderstatus"))).head.getString(0))
  }

  test("q127: lateral top-2 equals the window-rank formulation") {
    val lateral = AnalyticsQueries.lateralTopPerGroup(spark, sf)
      .select(col("n_name"), col("c_custkey")).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val direct = Tables(spark, sf, "customer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_custkey"))
      .select(col("n_name"), col("c_custkey")).collect().toSeq
    assert(lateral == direct)
  }

  test("q129: pagerank matches an independent local power iteration") {
    val declared = AnalyticsQueries.pagerankNations(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // reference: rebuild the graph relationally, then iterate in plain Scala
    val li = Tables(spark, sf, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables(spark, sf, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables(spark, sf, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables(spark, sf, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey"), col("s_nationkey")).count()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2).toDouble))
    val nodes = Tables(spark, sf, "nation").select(col("n_nationkey"))
      .collect().map(_.getInt(0)).toSeq
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / 25).toMap
    for (_ <- 1 to 10) {
      val inc = edges.groupBy(_._2).view.mapValues(
        _.map { case (s0, _, w) => r(s0) * w / outw(s0) }.sum).toMap
      r = nodes.map(n => n ->
        BigDecimal(0.15 / 25 + 0.85 * inc.getOrElse(n, 0.0))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    }
    assert(declared.keySet == nodes.toSet)
    declared.foreach { case (n, v) =>
      assert(math.abs(v - r(n)) < 2e-9, s"nation $n: $v vs ${r(n)}")
    }
    // a rank vector: positive, sums below 1 (dangling mass leaks by design)
    assert(declared.values.forall(_ > 0))
    assert(declared.values.sum <= 1.0 + 1e-6)
  }

  test("q130: curriculum bins are equal-frequency and ordered") {
    val bins = AnalyticsQueries.curriculumBins(spark, sf).collect()
    assert(bins.map(_.getInt(0)).toSeq == (1 to 10))
    val total = Tables(spark, sf, "documents").count()
    assert(bins.map(_.getLong(1)).sum == total)
    assert(bins.map(_.getLong(1)).max - bins.map(_.getLong(1)).min <= 1)
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) >= a.getLong(3), "bin boundaries out of order")
      case _ => ()
    }
  }

  test("q132: BM25 scores match an independent local computation") {
    val declared = AnalyticsQueries.bm25Search(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(declared.nonEmpty && declared.length <= 50)
    // local truth: tokenize every doc on the driver and fold the
    // Robertson formula directly (500 docs at sf0.001)
    val terms = Set("hash", "join", "stream")
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val dl = docs.map { case (id, ts) => id -> ts.length }.toMap
    val n = docs.length.toDouble
    val avgdl = dl.values.sum.toDouble / n
    val tf = docs.map { case (id, ts) =>
      id -> ts.filter(terms).groupBy(identity).view.mapValues(_.length).toMap
    }.toMap
    val df = terms.map(t => t -> tf.count(_._2.contains(t)).toDouble).toMap
    val scores = tf.collect { case (id, m) if m.nonEmpty =>
      val s = m.map { case (t, f) =>
        math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
      }.sum
      id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq
    val expect = scores.sortBy { case (id, sc) => (-sc, id) }.take(50)
    assert(declared.toSeq == expect)
  }

  test("q133: streaks match a per-user local recomputation") {
    val declared = AnalyticsQueries.activityStreaks(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byUser = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.toEpochDay)).toMap
    assert(declared.keySet == byUser.keySet)
    byUser.foreach { case (u, days) =>
      // split the sorted distinct days into consecutive runs
      val runs = days.foldLeft(List.empty[List[Long]]) { (acc, d) =>
        val e = d.toEpochDay
        acc match {
          case (h :: t) :: rest if h == e - 1 => (e :: h :: t) :: rest
          case _ => List(e) :: acc
        }
      }
      val (longest, n) = (runs.map(_.length.toLong).max, runs.length.toLong)
      assert(declared(u) == ((longest, n)), s"user $u")
    }
  }

  test("q135: PIT join preserves row count and change points map to themselves") {
    val out = AnalyticsQueries.pitJoin(spark, sf).cache()
    try {
      val ev = Tables(spark, sf, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      // intervals partition each user's timeline — exactly one regime per event
      assert(out.count() == ev.count())
      assert(out.select(col("event_id")).distinct().count() == ev.count())
      // an event that uniquely owns its (user, ts) and starts a regime
      // (valid_from == its ts) must be that regime's change point, so it
      // maps to itself (events tied on (user, ts) can legitimately land
      // in the regime their tie-mate opened — excluded via anti-join)
      val ties = ev.groupBy(col("user_id"), col("ts"))
        .agg(count(lit(1)).as("k")).filter(col("k") > 1)
        .select(col("user_id"), col("ts"))
      val untied = out.join(ties, Seq("user_id", "ts"), "left_anti")
      assert(untied.filter(col("valid_from") === col("ts"))
        .filter(col("regime") =!= col("event_type")).count() == 0)
      // regimes genuinely persist: some events inherit an older regime
      assert(out.filter(col("valid_from") < col("ts")).count() > 0)
    } finally out.unpersist()
  }

  test("q134: winsorized stats are internally consistent") {
    val rows = AnalyticsQueries.winsorize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, p05, p95) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      val (below, above, wmean) = (r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(p05 <= p95)
      // clamping pulls the mean inside the clamp bounds
      assert(wmean >= p05 - 1e-9 && wmean <= p95 + 1e-9)
      // ~5% tails by construction of the exact percentiles
      assert(below <= n * 6 / 100 + 1, s"below=$below n=$n")
      assert(above <= n * 6 / 100 + 1, s"above=$above n=$n")
      assert(below + above < n)
    }
  }

  test("q128: z-scores agree with the built-in avg/stddev_samp formulation") {
    val declared = AnalyticsQueries.zscoreOutliers(spark, sf).collect()
    val cents = Exact.cents(col("value"))
    val stats = Tables(spark, sf, "events").groupBy(col("event_type"))
      .agg(avg(cents).as("m"), stddev_samp(cents).as("sd"))
    val direct = Tables(spark, sf, "events")
      .join(stats, Seq("event_type"))
      .withColumn("z", (cents - col("m")) / col("sd"))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("z")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(declared.map(_.getLong(0)).toSet == direct.keySet)
    declared.foreach { r =>
      assert(math.abs(r.getDouble(3) - direct(r.getLong(0))) < 1e-4)
    }
  }
}
