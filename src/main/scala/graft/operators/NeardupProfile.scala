package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{functions => gfn}

/** Dev-only stage profiler for the embedding near-dup family (not part
  * of the declared surface). Usage: NeardupProfile <sfDir>
  */
object NeardupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables(spark, dir, "embeddings")
    emb.count() // warm

    def time(label: String)(body: => Long): Unit = {
      val ds = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label: min ${ds.map(_._1).min}%.2f s  all ${ds.map(d => f"${d._1}%.2f").mkString("/")} (${ds.head._2} rows)")
    }

    def melted: DataFrame =
      SimilarityOps.ivfCellAssign(spark, dir, 16, 3).select(
        col("vec_id").as("doc_id"), lit(0).as("band"), col("cell").as("digest"))

    def prune(cand: DataFrame): DataFrame = {
      val sk = broadcast(emb.select(col("vec_id"), gfn.i8_sketch(col("embedding")).as("sk")))
      cand
        .join(sk.select(col("vec_id").as("a"), col("sk").as("ska")), Seq("a"))
        .join(sk.select(col("vec_id").as("b"), col("sk").as("skb")), Seq("b"))
        .filter(gfn.i8_cos_bound(col("ska"), col("skb")) >= lit(0.35 - 1e-6))
        .select(col("a"), col("b"))
    }

    time("assign")(SimilarityOps.ivfCellAssign(spark, dir, 16, 3).count())
    time("pairsDup")(DedupOps.pairsFromDigestsDup(melted).count())
    time("pairsDup+prune")(prune(DedupOps.pairsFromDigestsDup(melted)).count())
    time("pairsDup+prune+distinct")(prune(DedupOps.pairsFromDigestsDup(melted)).distinct().count())
    time("pairs(distinct)")(DedupOps.pairsFromDigests(melted).count())
    time("full q66")(SimilarityOps.neardupIvfBlocked(spark, dir).count())
    spark.stop()
  }
}
