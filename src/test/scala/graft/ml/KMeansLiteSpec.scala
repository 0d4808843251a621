package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansLiteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding")).cache()

  test("Lloyd iterations never decrease the spherical objective") {
    val objs = (0 to 3).map { it =>
      KMeansLite.objective(emb, "vec_id", "embedding",
        KMeansLite.fit(emb, "vec_id", "embedding", k = 8, iters = it))
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"objective regressed: $objs")
    }
    assert(objs.last > objs.head, s"training should improve the seed: $objs")
  }

  test("assignment covers every vector exactly once with valid cells") {
    val m = KMeansLite.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val a = KMeansLite.assign(emb, "vec_id", "embedding", m)
    assert(a.count() === emb.count())
    val cells = a.select("cell").distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 8))
  }
}
