package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** One media blob with typed metadata. `data` is an opaque byte
  * payload (image/audio/video container bytes); everything the engine
  * plans with lives in typed columns, never inside the blob. */
case class MediaRow(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    data: Array[Byte],
    width: Int, // image/video pixels (0 for audio)
    height: Int,
    sample_rate: Int, // audio Hz (0 otherwise)
    n_frames: Int) // video frames / audio samples (1 for image)

/** Decoded per-item features (fixed-width vector + provenance). */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    features: Array[Float])

/** Multimodal-column operators for a training-data pipeline: media as
  * opaque BINARY columns with typed metadata, processed batch-wise on
  * executors via mapPartitions (the JVM analog of a vectorized pandas
  * UDF: one JVM-side function invocation per partition, streaming over
  * rows, never collecting to the driver).
  *
  * The codec step is STUBBED — this container ships no image/audio
  * libraries — with a deterministic byte-level feature extractor
  * (rolling polynomial hash per stripe), so the Spark-side contract is
  * fully real and testable: schema, binary column handling, batch
  * shape, skew-aware partitioning, frame-row explosion. Swapping
  * `stubDecode` for a real codec (e.g. via JNI or an added library)
  * changes no plan shape.
  */
object MultimodalOps {

  /** Declared media schema (string/binary nullable — matching the
    * case-class Encoder's view, where only primitives are non-null). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("data", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  // ---- stubbed codec ---------------------------------------------------

  /** Deterministic fake decode: splits the payload into `dim` stripes
    * and reduces each with a rolling polynomial hash scaled to [0,1).
    * Stand-in for "decode + embed" (a real system would decode pixels
    * / PCM samples here). Deterministic in the bytes — the tests and
    * any dedup built on it are reproducible. */
  private[multimodal] def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes.isEmpty) return out
    val stripe = math.max(1, bytes.length / dim)
    var d = 0
    while (d < dim) {
      var h = 1125899906842597L
      var i = d * stripe
      val end = math.min(bytes.length, if (d == dim - 1) bytes.length else (d + 1) * stripe)
      while (i < end) { h = 31 * h + bytes(i); i += 1 }
      out(d) = math.abs(h % 1000000L).toFloat / 1000000.0f
      d += 1
    }
    out
  }

  // ---- operators -------------------------------------------------------

  /** Decode + feature-extract each blob, batch-wise per partition. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.data.length, stubDecode(m.data, dim))
      }
    }
  }

  /** Balance decode work: byte-size is the cost driver, so range-
    * repartition on (kind, payload size) — large videos spread across
    * tasks instead of hashing wherever media_id lands. At cluster scale
    * this is the difference between one straggler decoding all the 4K
    * video and an even decode wave. */
  def repartitionForDecode(media: DataFrame, partitions: Int): DataFrame =
    media.withColumn("n_bytes", length(col("data")))
      .repartitionByRange(partitions, col("kind"), col("n_bytes"))
      .drop("n_bytes")

  /** Sample every Nth frame of video rows into (media_id, frame_idx)
    * rows — pure metadata explosion (the decode of each sampled frame
    * happens downstream in extractFeatures-style batches). */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))

  /** Resize stub: emits a new payload of exactly the target byte size
    * (deterministic slice/pad) with updated metadata — the plumbing of
    * a thumbnailing pass without a codec. */
  def resizeStub(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val target = math.max(1, targetW * targetH / 8)
        val out = java.util.Arrays.copyOf(m.data, target)
        m.copy(data = out, width = targetW, height = targetH)
      }
    }
  }

  /** Near-dup media detection: stub features → cosine-style bucketed
    * grouping on a quantized leading coefficient. Demonstrates dedup
    * over multimodal payloads without byte-equality. */
  def featureBuckets(features: Dataset[MediaFeatures], buckets: Int = 64): DataFrame = {
    import features.sparkSession.implicits._
    features.map(f => (f.media_id, f.kind, (f.features.headOption.getOrElse(0f) * buckets).toInt))
      .toDF("media_id", "kind", "bucket")
      .groupBy("kind", "bucket")
      .agg(count(lit(1)).as("n"), collect_list("media_id").as("members"))
  }

  /** Ingest raw media files as opaque binary rows via Spark's binaryFile
    * source (path/length/modificationTime/content) — the on-ramp from a
    * filesystem/object-store media dump into the typed media table.
    * `pathGlobFilter` prunes at listing time (no content reads for
    * filtered-out files). */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("path"),
        col("length").as("n_bytes"),
        col("content").as("data"))

  /** Media view over the driver's `documents` table: each document's
    * UTF-8 bytes become the opaque payload, with kind/metadata derived
    * deterministically from doc_id. This is how the declared query
    * (q64) exercises the multimodal path on REAL sfDir input — the
    * payload bytes are still fully opaque to every operator. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    val k = pmod(col("doc_id"), lit(3))
    Tables(s, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(k === 0, "image").when(k === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("data"),
        when(k === 0, 64).when(k === 1, 0).otherwise(320).as("width"),
        when(k === 0, 48).when(k === 1, 0).otherwise(240).as("height"),
        when(k === 1, 16000).otherwise(0).as("sample_rate"),
        when(k === 0, lit(1))
          .when(k === 1, length(col("text").cast("binary")))
          .otherwise((lit(1) + pmod(col("doc_id"), lit(100))).cast("int")).as("n_frames"))
      .as[MediaRow]
  }

  /** q64: per-kind stats of the decoded feature rows — the whole
    * multimodal pipeline (size-aware repartition → batch decode via
    * mapPartitions → typed aggregation) with an output DuckDB can
    * recompute from byte lengths alone, so the declared query gets a
    * full oracle even though the decode itself is engine-side. */
  def mediaStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = repartitionForDecode(
      mediaFromDocuments(s, dir).toDF(),
      s.sparkContext.defaultParallelism).as[MediaRow]
    extractFeatures(media).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        (sum(col("n_bytes")).cast("double") / count(lit(1))).as("avg_bytes"))
      .orderBy("kind")
  }

  /** q91: frame sampling as a declared query — every 7th frame index of
    * each video row, a pure metadata explosion (map-only; the sampled
    * frames' decode happens downstream in batches). The frame grid is
    * deterministic arithmetic over n_frames, so DuckDB reproduces it
    * exactly. */
  def frameSample(s: SparkSession, dir: String, everyN: Int = 7): DataFrame =
    sampleFrames(mediaFromDocuments(s, dir).toDF(), everyN)
      .orderBy("media_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_media_stats" -> ((s: SparkSession, d: String) => mediaStats(s, d)),
    "q91_frame_sample" -> ((s: SparkSession, d: String) => frameSample(s, d)),
  )

  /** The payload is the document text's UTF-8 bytes, so DuckDB's byte
    * length (strlen) reproduces n_bytes exactly; kind = doc_id mod 3. */
  val oracle: Map[String, String] = Map(
    "q64_media_stats" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        | count(*) AS n_media,
        | CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        | CAST(min(strlen(text)) AS INT) AS min_bytes,
        | CAST(max(strlen(text)) AS INT) AS max_bytes,
        | CAST(sum(strlen(text)) AS DOUBLE) / count(*) AS avg_bytes
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,
    // video rows are doc_id % 3 = 2 with n_frames = 1 + doc_id % 100;
    // Spark's sequence(0, n-1, 7) and DuckDB's range(0, n, 7) generate
    // the same grid (inclusive vs exclusive upper bound)
    "q91_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx
        |FROM documents, LATERAL unnest(range(0, 1 + doc_id % 100, 7)) AS t(i)
        |WHERE doc_id % 3 = 2
        |ORDER BY media_id, frame_idx""".stripMargin,
  )

  /** Deterministic synthetic media table (no external fixtures in the
    * container): payload bytes derived from media_id. */
  def synthesize(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id0 =>
      val id = id0
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + ((id * 2654435761L + seed) % 768).toInt.abs
      val bytes = Array.tabulate(len)(i => ((id * 31 + i * 7 + seed) % 256).toByte)
      kind match {
        case "image" => MediaRow(id, kind, bytes, 64, 48, 0, 1)
        case "audio" => MediaRow(id, kind, bytes, 0, 0, 16000, len)
        case _ => MediaRow(id, kind, bytes, 320, 240, 0, 1 + (id % 100).toInt)
      }
    }
  }
}
