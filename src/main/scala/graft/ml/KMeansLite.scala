package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.{functions => gfn}

/** Spherical k-means for embedding coarse quantization (the trained
  * IVF cell layout), as iterative DataFrame aggregation:
  *
  *   assign: one broadcast of k centroids + a per-row argmax over the
  *     native cosine kernel (no shuffle);
  *   update: element-wise centroid means via posexplode + groupBy
  *     (cell, dim) — one shuffle of |vectors|·d value rows, the
  *     standard distributed-mean shape;
  *   driver holds only the k×d centroid matrix between iterations.
  *
  * Cosine is scale-invariant, so using the un-normalized mean as the
  * next centroid equals the normalized-mean (spherical) update; the
  * objective Σ cos(x, centroid(x)) is non-decreasing per Lloyd step,
  * which the test pins.
  */
object KMeansLite {

  final case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
  }

  /** @param vectors  (idCol, vecCol: array<float>) frame
    * @param k        number of cells
    * @param iters    Lloyd iterations (0 = just the deterministic seed) */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): Model = {
    val spark = vectors.sparkSession
    import spark.implicits._

    // deterministic seed: the k lowest-id vectors
    var centroids: Array[Array[Float]] = vectors
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)

    for (_ <- 1 to iters) {
      val cdf = broadcast(
        centroids.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("cid", "cv"))
      val cells = vectors
        .crossJoin(cdf)
        .select(col(idCol), col(vecCol),
          col("cid"), gfn.cosine_sim(col(vecCol), col("cv")).as("sim"))
        .groupBy(col(idCol))
        .agg(
          max(struct(col("sim"), col("cid"))).getField("cid").as("cell"),
          first(col(vecCol)).as("v"))
      // exact order-independent mean: components quantized to 1e-6 and
      // summed as integers, so the update is bit-identical across
      // partitionings, runs, AND engines (a plain double avg's fold
      // order varies with shuffle arrival) — which is what lets the
      // trained quantizer be DuckDB-oracle-checked. The 1e-6 grid is
      // far below float32 input precision, so quality is unaffected.
      val dimMeans = cells
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg((sum(round(col("x") * 1e6).cast("long")).cast("double")
          / count(lit(1)) / 1e6).as("m"))
        .collect()
      val byCell = dimMeans.groupBy(_.getInt(0))
      centroids = centroids.indices.map { cid =>
        byCell.get(cid) match {
          case Some(rows) =>
            val arr = new Array[Float](rows.length)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2).toFloat)
            arr
          case None => centroids(cid) // empty cell keeps its centroid
        }
      }.toArray
    }
    Model(centroids)
  }

  /** Assign each vector to its nearest (max-cosine) centroid. */
  def assign(vectors: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val cdf = broadcast(
      model.centroids.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("cid", "cv"))
    vectors.crossJoin(cdf)
      .select(col(idCol), col("cid"),
        gfn.cosine_sim(col(vecCol), col("cv")).as("sim"))
      .groupBy(col(idCol))
      .agg(max(struct(col("sim"), col("cid"))).getField("cid").as("cell"),
        max(col("sim")).as("best_sim"))
  }

  /** Mean best-cosine over the corpus (the spherical k-means objective). */
  def objective(vectors: DataFrame, idCol: String, vecCol: String, model: Model): Double =
    assign(vectors, idCol, vecCol, model)
      .agg(avg(col("best_sim"))).head().getDouble(0)
}
