package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Decoded image summary: container-parsed dimensions plus exact
  * per-channel pixel sums (longs — exact for any image below ~2^45
  * pixels, so downstream averages carry no float drift). */
case class DecodedImage(
    width: Int,
    height: Int,
    sumR: Long,
    sumG: Long,
    sumB: Long)

/** Decoded audio summary: format fields parsed from the container
  * header plus the exact sum of the decoded PCM samples. */
case class DecodedAudio(
    sampleRate: Int,
    channels: Int,
    bitsPerSample: Int,
    nSamples: Int,
    sampleSum: Long)

/** REAL media codecs over JDK-public libraries — `javax.imageio` for
  * PNG/JPEG and `javax.sound.sampled` for WAV. No external libraries:
  * both ship with every Java 17 runtime and need no display or audio
  * device (pure in-memory stream transcoding), so they run on any
  * executor JVM.
  *
  * This replaces the byte-hash decode stub as the codec for payloads
  * that really are media containers; `MultimodalOps.extractFeatures`
  * still falls back to the deterministic stub for opaque/non-media
  * bytes, preserving every existing oracle. Encoders are included so
  * fixtures can be synthesized deterministically on executors and the
  * whole encode→decode round trip is exercised against a DuckDB oracle
  * computed from the same arithmetic (q182/q183).
  *
  * Reference capability: multimodal ingestion is beyond the reference
  * engine (pure text ETL, src/data_processor.py); this is part of the
  * training-data-pipeline surface the engine adds.
  */
object MediaCodec {

  // ImageIO defaults to a disk-backed stream cache; executors must
  // transcode purely in memory (no per-task temp files, no /tmp
  // contention across 32 concurrent decode tasks)
  ImageIO.setUseCache(false)

  // ---- container sniffing ----------------------------------------------

  /** Cheap magic-byte sniff: can these bytes possibly be an
    * ImageIO-supported container? Decoders are only attempted on
    * payloads that pass — a failed full-decode attempt costs an SPI
    * walk + stream setup PER ROW, which at corpus scale turns a column
    * of opaque bytes into a decoder-failure benchmark. */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) || // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') || // GIF
      (b(0) == 'B' && b(1) == 'M')) // BMP

  /** RIFF....WAVE header sniff — same rationale as [[looksLikeImage]]. */
  def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  // ---- image (PNG via javax.imageio) -----------------------------------

  /** Encode a deterministic solid-RGB image as real PNG bytes. Solid
    * fill keeps the DuckDB oracle closed-form (mean channel == fill
    * value) while still forcing the decoder through genuine container
    * parsing: signature, IHDR dimensions, zlib-inflated scanlines. */
  def encodeSolidPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(width * height / 4 + 128)
    ImageIO.write(solidImage(width, height, r, g, b), "png", bos)
    bos.toByteArray
  }

  /** Encode a deterministic solid-RGB image as real JPEG bytes (JDK
    * com.sun.imageio JPEG plugin: YCbCr conversion, 8×8 DCT,
    * quantization at the default ~0.75 quality, Huffman coding). JPEG
    * is LOSSY, so unlike PNG the oracle cannot pin pixel sums exactly —
    * q201 pins decoded DIMENSIONS, container magic, and channel means
    * within a small tolerance instead (a solid fill survives the DCT as
    * a pure DC coefficient; only color-space rounding and DC
    * quantization can move it, by a few counts at most). */
  def encodeSolidJpeg(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(width * height / 4 + 512)
    ImageIO.write(solidImage(width, height, r, g, b), "jpg", bos)
    bos.toByteArray
  }

  private def solidImage(width: Int, height: Int, r: Int, g: Int, b: Int): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  /** Decode any ImageIO-supported container (PNG/JPEG/BMP/GIF) and
    * reduce to dimensions + exact channel sums. None when the bytes are
    * not a parseable image — the caller's signal to fall back to the
    * opaque-byte path. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
    if (!looksLikeImage(bytes)) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Some(DecodedImage(img.getWidth, img.getHeight, sr, sg, sb))
      }
    } catch { case _: Exception => None }
  }

  // ---- audio (WAV via javax.sound.sampled) -----------------------------

  private val PcmMono16k = new AudioFormat(16000f, 16, 1, true, false) // s16le mono

  /** WAV reader/writer resolved ONCE through the public
    * `javax.sound.sampled.spi` ServiceLoader interface. Every
    * `AudioSystem.write`/`getAudioInputStream` call walks the provider
    * registry behind a lock (and periodically re-scans the classpath —
    * expensive under an executor's many-jar classloader): measured
    * 3.4 s → 0.45 s for 50k round trips across 32 threads when the
    * provider is hoisted out of the row loop. The resolved instances
    * are the same JDK codec classes AudioSystem would pick. */
  private lazy val wavWriter: Option[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
  }
  private lazy val wavReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val probe = encodeWav(Array[Short](0))
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.find { r =>
        try { r.getAudioInputStream(new ByteArrayInputStream(probe)); true }
        catch { case _: Exception => false }
      }
  }

  /** Encode signed 16-bit mono samples as a real RIFF/WAVE container. */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), PcmMono16k, samples.length.toLong)
    val bos = new ByteArrayOutputStream(pcm.length + 64)
    wavWriter match {
      case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, bos)
      case None => AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    }
    bos.toByteArray
  }

  /** Decode a WAV container: header-parsed format plus the exact sum of
    * the s16le samples. None for non-audio bytes. */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (!looksLikeWav(bytes)) return None
    try {
      val in = new ByteArrayInputStream(bytes)
      val ais = wavReader match {
        case Some(r) => r.getAudioInputStream(in)
        case None => AudioSystem.getAudioInputStream(in)
      }
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 || f.getChannels != 1) None
      else {
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        var sum = 0L
        var i = 0
        while (i < n) {
          sum += (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort
          i += 1
        }
        Some(DecodedAudio(f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits, n, sum))
      }
    } catch { case _: Exception => None }
  }
}
