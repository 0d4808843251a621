package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing contract: binary-column schema, deterministic
  * stub decode, partitioning, frame sampling, resize metadata.
  */
class MultimodalOpsSpec extends SparkSpec {

  private lazy val media = MultimodalOps.synthesize(spark, 90).cache()

  test("synthesized media matches the declared schema") {
    val df = media.toDF()
    assert(df.schema === MultimodalOps.mediaSchema)
    assert(df.count() === 90)
    assert(df.select("kind").distinct().count() === 3)
  }

  test("extractFeatures: fixed-dim deterministic features in [0,1)") {
    val f1 = MultimodalOps.extractFeatures(media, dim = 16).collect()
    val f2 = MultimodalOps.extractFeatures(media, dim = 16).collect()
    assert(f1.length === 90)
    assert(f1.forall(_.features.length === 16))
    assert(f1.forall(_.features.forall(v => v >= 0f && v < 1f)))
    // deterministic across runs
    val m1 = f1.map(f => f.media_id -> f.features.toSeq).toMap
    val m2 = f2.map(f => f.media_id -> f.features.toSeq).toMap
    assert(m1 === m2)
    // payload-sensitive: not all-equal feature vectors
    assert(m1.values.toSet.size > 1)
  }

  test("repartitionForDecode: preserves rows, sets partition count") {
    val rp = MultimodalOps.repartitionForDecode(media.toDF(), 6)
    assert(rp.rdd.getNumPartitions === 6)
    assert(rp.count() === 90)
    assert(rp.columns.toSeq === media.toDF().columns.toSeq)
  }

  test("sampleFrames: every-Nth frame indices for videos only") {
    val frames = MultimodalOps.sampleFrames(media.toDF(), everyN = 10)
    val perVideo = frames.groupBy("media_id").count()
    val videos = media.filter(col("kind") === "video").collect()
    assert(perVideo.count() === videos.count(_.n_frames > 0))
    // spot-check one video's expected indices
    val v = videos.maxBy(_.n_frames)
    val got = frames.filter(col("media_id") === v.media_id)
      .orderBy("frame_idx").collect().map(_.getInt(1)).toSeq
    assert(got === (0 until v.n_frames by 10))
  }

  test("resizeStub: exact target payload size + updated dims") {
    val out = MultimodalOps.resizeStub(media, 32, 24).collect()
    assert(out.forall(_.data.length === 32 * 24 / 8))
    assert(out.forall(m => m.width === 32 && m.height === 24))
  }

  test("readBinaryDir ingests raw files with content and glob filtering") {
    val dir = java.nio.file.Files.createTempDirectory("media_in")
    java.nio.file.Files.write(dir.resolve("a.jpg"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(dir.resolve("b.jpg"), Array[Byte](5, 6))
    java.nio.file.Files.write(dir.resolve("skip.txt"), Array[Byte](9))
    val df = MultimodalOps.readBinaryDir(spark, dir.toString, "*.jpg")
    val rows = df.orderBy("path").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("n_bytes")).toSeq === Seq(4L, 2L))
    assert(rows.head.getAs[Array[Byte]]("data").toSeq === Seq[Byte](1, 2, 3, 4))
  }

  test("featureBuckets: covers all media exactly once") {
    val f = MultimodalOps.extractFeatures(media)
    val b = MultimodalOps.featureBuckets(f)
    assert(b.agg(sum("n")).collect().head.getLong(0) === 90)
  }

  test("q64 mediaStats: byte stats agree with the documents table") {
    val sf = "/root/testdata/sf0.001"
    val stats = MultimodalOps.mediaStats(spark, sf).collect()
    assert(stats.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    val expected = graft.Tables(spark, sf, "documents")
      .groupBy(pmod(col("doc_id"), lit(3)).as("k"))
      .agg(count(lit(1)).as("n"), sum(length(col("text").cast("binary"))).as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val kindOf = Map("image" -> 0L, "audio" -> 1L, "video" -> 2L)
    stats.foreach { r =>
      val (n, b) = expected(kindOf(r.getString(0)))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === b)
      assert(r.getDouble(5) === b.toDouble / n)
    }
    // the decode path really ran: features are non-trivial for every row
    val f = MultimodalOps.extractFeatures(MultimodalOps.mediaFromDocuments(spark, sf))
    assert(f.filter(size(col("features")) =!= 16).count() === 0)
  }
}
