package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

// scratch profiling main — not part of the library surface
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // warm tables
    Tables.all.foreach(n => try Tables(spark, dir, n).count() catch { case _: Throwable => })
    time("warm sig")(DedupOps.minhashSignatures(spark, dir).count())
    time("signatures")(DedupOps.minhashSignatures(spark, dir).count())
    time("pairs")(DedupOps.minhashPairs(spark, dir).count())
    time("pairs2")(DedupOps.minhashPairs(spark, dir).count())
    time("verified")(DedupOps.neardupVerified(spark, dir).count())
    time("verified2")(DedupOps.neardupVerified(spark, dir).count())
    time("clusters")(DedupOps.neardupClusters(spark, dir).count())
    time("ivf_pairs")(graft.operators.SimilarityOps.neardupIvfBlocked(spark, dir).count())
    time("ivf_pairs2")(graft.operators.SimilarityOps.neardupIvfBlocked(spark, dir).count())
    time("semdedup")(graft.operators.SimilarityOps.semdedupCorpus(spark, dir, 0.5).count())
    time("semdedup2")(graft.operators.SimilarityOps.semdedupCorpus(spark, dir, 0.5).count())
    spark.stop()
  }
}
