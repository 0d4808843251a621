package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small reusable relational operators (library surface behind several
  * declared queries). */
object Ops {

  /** Exact top-k rows per group, two-phase salted (see windowRank
    * scaladoc: a single window over a low-cardinality partition key
    * serializes into one task per group; phase 1 ranks within
    * (group, salt) at full parallelism and prunes to ≤ groups·salts·k
    * rows, phase 2 ranks the survivors exactly). `ordering` must be a
    * total order (add tie-break columns) for deterministic output. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], ordering: Seq[Column],
      k: Int, salts: Int = 64): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val w1 = Window.partitionBy(groupCols :+ col("__salt"): _*).orderBy(ordering: _*)
    val w2 = Window.partitionBy(groupCols: _*).orderBy(ordering: _*)
    salted
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= k)
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .drop("__salt", "__rn1")
  }

  /** Exact deduplication: keep one row per key, the first under
    * `ordering` (deterministic, unlike dropDuplicates). One shuffle on
    * the key columns. */
  def dedupKeepFirst(df: DataFrame, keyCols: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Reproducible train/val/test split assignment by content hash: the
    * first 16 bits of md5(key ++ seed) pick a bucket in [0, 65536),
    * cumulative weight boundaries pick the split. Deterministic across
    * engines, runs, and partitionings (md5 is standardized — unlike
    * rand()-based sample(), rows never migrate between splits when the
    * data is re-partitioned or appended to), which is what a training
    * pipeline needs from its holdout split. */
  def hashSplit(keyCol: Column, splits: Seq[(String, Double)],
      seed: String = "graft"): Column = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val v = conv(substring(md5(concat(keyCol.cast("string"), lit(":" + seed))), 1, 4),
      16, 10).cast("int")
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(w => (w * 65536).round)
    splits.zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), acc) => when(v < bound, name).otherwise(acc)
    }
  }

  /** Connected components of an undirected edge list (columns `a`, `b`)
    * by iterative min-label propagation as DataFrame joins: each round,
    * every node takes the smallest label among itself and its
    * neighbors; converges in ≤ diameter rounds (checked per round, hard
    * cap as a safety net). Round 1 is fused into the seed aggregation —
    * edges already carry neighbor ids, so min(self, neighbors) needs no
    * join, and for the near-clique components dedup graphs produce
    * that alone is usually the fixpoint. Components of similarity
    * graphs are tiny by construction, so the diameter — and the number
    * of shuffle rounds — stays small at any corpus size. For graphs
    * that may carry a HIGH-DIAMETER or giant component (event graphs,
    * follower graphs), [[connectedComponentsStar]] gives the same
    * answer in O(log n) rounds instead of O(diameter) — select it
    * per-deployment with `spark.graft.cc.impl=star` (routes every
    * caller, including the declared cluster queries q83/q87, without a
    * code change). Returns (id, label = min id of the component) for
    * every node appearing in at least one edge. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    if (pairs.sparkSession.conf.getOption("spark.graft.cc.impl").contains("star"))
      return connectedComponentsStar(pairs, math.max(maxIters, 50))
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      // edge generation must not re-run per iteration (reliable
      // checkpoint when spark.graft.checkpointDir is set — see
      // graft.util.Checkpoints)
      .transform(graft.util.Checkpoints.truncate)
    var labels = edges
      .groupBy(col("a"))
      .agg(min(least(col("a"), col("b"))).as("label"))
      .select(col("a").as("id"), col("label"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("label"))
      val next = labels.union(viaNeighbor)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .transform(graft.util.Checkpoints.truncate) // cut the growing iteration lineage
      converged = next.join(labels,
        next("id") === labels("id") && next("label") === labels("label"),
        "left_anti").isEmpty
      labels = next
      i += 1
    }
    labels
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * rewrites (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the giant-component-safe variant. Min-label
    * propagation pays one shuffle round per unit of component DIAMETER,
    * so a 10⁵-node chain needs 10⁵ rounds; the star rewrites contract
    * every component onto its minimum node in O(log n) rounds
    * regardless of shape, and each step is expressed as groupBy(min) +
    * join — per-node output is bounded by the node's degree, never a
    * collected neighbor list, so fan-out stays balanced even when one
    * component holds most of the graph.
    *
    *   large-star: every node u links each STRICTLY LARGER neighbor to
    *     min(u, neighbors of u) — long chains fold toward small ids
    *     without ever increasing edge count by more than the input's.
    *   small-star: every node u links its smaller-or-equal neighbors
    *     (and itself) to their minimum — consolidating the partial
    *     stars into flatter ones.
    *
    * Both preserve connectivity exactly; the fixpoint is every
    * component a star rooted at its min id. Per-round lineage is cut
    * via Checkpoints.truncate (reliable under
    * spark.graft.checkpointDir — same contract as everything
    * iterative here). Returns (id, label) for every node appearing in
    * at least one edge, identical to [[connectedComponents]] (pinned
    * by OpsSpec on random graphs). */
  def connectedComponentsStar(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val input = pairs.select(col("a"), col("b"))
    // canonical directed form: src > dst, self-loops dropped (isolated
    // self-loop nodes are re-attached at the label step)
    var edges = input.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct()
      .transform(graft.util.Checkpoints.truncate)
    var converged = edges.isEmpty
    var i = 0
    while (!converged && i < maxIters) {
      // large-star over BOTH orientations: m(u) = min(u, Γ(u)); emit
      // (v, m(u)) for v ∈ Γ(u), v > u. Output keeps src > dst.
      val nbrs = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val lsMins = nbrs.groupBy(col("src"))
        .agg(min(least(col("dst"), col("src"))).as("m"))
      val ls = nbrs.filter(col("dst") > col("src"))
        .join(lsMins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
      // small-star on the downward edges: m(u) = min(Γ<(u)); emit
      // (v, m(u)) for the smaller neighbors v ≠ m, plus (u, m(u)).
      val ssMins = ls.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val withM = ls.join(ssMins, "src")
      val next = withM.filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(ssMins.select(col("src"), col("m").as("dst")))
        .distinct()
        .transform(graft.util.Checkpoints.truncate)
      converged = next.count() == edges.count() &&
        next.join(edges, Seq("src", "dst"), "left_anti").isEmpty
      edges = next
      i += 1
    }
    // fixpoint edges are (node → component min); roots and isolated
    // self-loop nodes label themselves
    val nodes = input.select(col("a").as("id"))
      .union(input.select(col("b").as("id"))).distinct()
    nodes.join(edges.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("dst"), col("id")).as("label"))
  }

  /** As-of join (an operator Spark lacks natively): for every left row,
    * attach the LATEST right row with rightTime <= leftTime within the
    * same key. Union-then-window formulation — tag both sides, sort
    * each key's merged timeline once, carry the last right payload
    * forward with last(ignoreNulls) — one shuffle on the key, no
    * per-key loops, no range cross-product. Right rows at exactly
    * leftTime match (ties sort right-before-left). `rightCols` must be
    * unique per (key, time) for determinism — pre-dedup with
    * dedupKeepFirst if not.
    *
    * The payload is carried as ONE struct(rightCols), so the matched
    * right row is taken or skipped atomically: a right row with a NULL
    * in one payload column can never leak an older row's value into
    * just that column (per-column last(ignoreNulls) would).
    *
    * Returns the left frame + `rightCols` (all null when nothing
    * precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String]): DataFrame =
    asofJoinImpl(left, right, key, leftTime, rightTime, rightCols, forward = false)

  /** FORWARD as-of join: for every left row, attach the EARLIEST right
    * row with rightTime >= leftTime within the same key (nulls when
    * nothing follows) — the "next event at or after" direction
    * (next maintenance after a failure, next order after a page view).
    * Same union-then-window formulation as [[asofJoin]] with the
    * merged timeline scanned DESCENDING, so the carried payload is the
    * smallest rightTime at-or-after each left row; a
    * [currentRow, unboundedFollowing] frame would express the same
    * thing directly but re-aggregates per row (O(n²) per partition in
    * Spark) — the descending running window is one pass. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String]): DataFrame =
    asofJoinImpl(left, right, key, leftTime, rightTime, rightCols, forward = true)

  private def asofJoinImpl(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      leftCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__payload"): _*)
    // right rows with a null key or time can never be "the latest/
    // earliest row at t" for any left row (SQL join semantics: null
    // keys match nothing) — and MUST be dropped here: a null __t right
    // row would sort nulls-first into the scan ahead of every real
    // row, and last(ignoreNulls) would carry its (non-null) payload
    // into left rows that should have no match. Same contract as the
    // physical AsofJoinExec's advanceRight skip.
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
      (Seq(col(key)) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightTime).as("__t") :+ lit(0).as("__side")) :+
        payload.as("__payload"): _*)
    // ties (rightTime == leftTime) match in both directions: the right
    // row sorts before the left row at equal __t, in scan order.
    // NULL times must scan BEFORE any right row (so they carry null =
    // no match): that's nulls-first in ascending order (Spark's asc
    // default) but needs desc_nulls_first in the descending forward
    // scan — plain desc puts nulls last, where a null-time left row
    // would wrongly pick up the partition's earliest right row.
    val w = Window.partitionBy(col(key))
      .orderBy(
        if (forward) col("__t").desc_nulls_first else col("__t").asc_nulls_first,
        col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((leftCols.map(col) :+ col("__side")) :+
        last(col("__payload"), ignoreNulls = true).over(w).as("__carried"): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__carried").getField(c).as(c)): _*)
  }
}
