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
    * of shuffle rounds — stays small at any corpus size; a pathological
    * giant component would call for the large-star/small-star rewrite,
    * the same dataflow primitives with balanced fan-out. Returns
    * (id, label = min id of the component) for every node appearing in
    * at least one edge. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
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
      leftTime: String, rightTime: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      leftCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__payload"): _*)
    val r = right.select(
      (Seq(col(key)) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rightTime).as("__t") :+ lit(0).as("__side")) :+
        payload.as("__payload"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((leftCols.map(col) :+ col("__side")) :+
        last(col("__payload"), ignoreNulls = true).over(w).as("__carried"): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__carried").getField(c).as(c)): _*)
  }
}
