package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("topKPerGroup equals the single-window formulation") {
    val li = graft.Tables(spark, sf, "lineitem")
    val ord = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val got = Ops.topKPerGroup(li, Seq(col("l_returnflag")), ord, k = 7)
      .select("l_returnflag", "rank", "l_orderkey", "l_linenumber")
      .orderBy("l_returnflag", "rank").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(ord: _*)
    val exp = li.withColumn("rank", row_number().over(w)).filter(col("rank") <= 7)
      .select("l_returnflag", "rank", "l_orderkey", "l_linenumber")
      .orderBy("l_returnflag", "rank").collect().toSeq
    assert(got === exp)
  }

  test("hashSplit: weights honored approximately, assignment repartition-stable") {
    val docs = graft.Tables(spark, sf, "documents").select("doc_id")
    val split = Ops.hashSplit(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = docs.select(split.as("s")).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.08, counts.toString)
    assert(counts.values.sum === n.toLong)
    // identical assignment regardless of physical layout
    val a = docs.select(col("doc_id"), split.as("s")).collect().toSet
    val b = docs.repartition(13).select(col("doc_id"), split.as("s")).collect().toSet
    assert(a === b)
  }

  test("dedupKeepFirst keeps exactly the lowest-ordered row per key") {
    val docs = graft.Tables(spark, sf, "documents")
      .withColumn("h", md5(col("text")))
    val got = Ops.dedupKeepFirst(docs, Seq(col("h")), Seq(col("doc_id")))
    // one row per hash, and it is the min doc_id
    val perKey = got.groupBy("h").count().filter(col("count") > 1).count()
    assert(perKey === 0)
    val expFirst = docs.groupBy("h").agg(min("doc_id").as("doc_id"))
    assert(got.select("h", "doc_id").except(expFirst).count() === 0)
    assert(got.count() === expFirst.count())
  }

  test("connectedComponents labels a chain, a clique, and a lone pair correctly") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3 exercises >1 propagation round),
    // clique {10,11,12}, lone pair {20,21}; node 30 absent from edges
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("a", "b")
    val got = Ops.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got === exp)
  }

  test("connectedComponentsStar matches min-label on random graphs and edge shapes") {
    import spark.implicits._
    // deterministic pseudo-random graph: 200 nodes, 150 edges via a
    // fixed LCG — several components of mixed shape
    var seed = 12345L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) % 200 }
    val rand = (1 to 150).map(_ => (next(), next()))
    for (edges <- Seq(
        rand.toDF("a", "b"),
        Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
          (10L, 12L), (21L, 20L), (7L, 7L)).toDF("a", "b"))) {
      val star = Ops.connectedComponentsStar(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val minLabel = Ops.connectedComponents(edges, maxIters = 300)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star === minLabel)
    }
  }

  test("spark.graft.cc.impl=star routes connectedComponents, labels unchanged") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L)).toDF("a", "b")
    val baseline = Ops.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.cc.impl", "star")
    try {
      val routed = Ops.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(routed === baseline)
    } finally spark.conf.unset("spark.graft.cc.impl")
  }

  test("connectedComponentsStar converges on a 100k-node chain in O(log n) rounds") {
    import spark.implicits._
    // the giant-component worst case: ONE component of diameter 1e5.
    // Min-label would need 1e5 shuffle rounds; the star rewrites must
    // collapse it inside the 50-round cap (actual: ~log2(n) doubled
    // rounds), labeling every node 0
    val n = 100000L
    val edges = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1).as("b"))
    val labels = Ops.connectedComponentsStar(edges)
    assert(labels.filter(col("label") =!= 0L).isEmpty,
      "every chain node must collapse to component min 0")
    assert(labels.count() === n)
  }

  test("connectedComponentsStar on a 100k-node star converges immediately") {
    import spark.implicits._
    val n = 100000L
    val edges = spark.range(1, n).select(lit(0L).as("a"), col("id").as("b"))
    val labels = Ops.connectedComponentsStar(edges)
    assert(labels.filter(col("label") =!= 0L).isEmpty)
    assert(labels.count() === n)
  }
}
