package graft.multimodal

import graft.SparkSpec

/** Real-codec contract (javax.imageio PNG, javax.sound.sampled WAV):
  * lossless round trips, graceful None on non-media bytes, and the
  * extractFeatures dispatch between real decode and the byte-stripe
  * fallback.
  */
class MediaCodecSpec extends SparkSpec {

  test("PNG round trip: dimensions and exact channel sums recovered") {
    val png = MediaCodec.encodeSolidPng(13, 9, 200, 17, 255)
    assert(png.length > 8)
    // real container: PNG signature bytes
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
      png(2) === 'N'.toByte && png(3) === 'G'.toByte)
    val d = MediaCodec.decodeImage(png).get
    assert(d.width === 13 && d.height === 9)
    assert(d.sumR === 13L * 9 * 200)
    assert(d.sumG === 13L * 9 * 17)
    assert(d.sumB === 13L * 9 * 255)
  }

  test("JPEG round trip: SOI magic, exact dimensions, channel means within tolerance") {
    val jpg = MediaCodec.encodeSolidJpeg(21, 17, 180, 40, 220)
    // real container: SOI marker, and the sniffer admits it
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8)
    assert(MediaCodec.looksLikeImage(jpg))
    val d = MediaCodec.decodeImage(jpg).get
    // dimensions survive the lossy codec exactly
    assert(d.width === 21 && d.height === 17)
    // a solid fill survives the DCT as a pure DC coefficient; only
    // YCbCr rounding + DC quantization move the mean (measured worst
    // 3.0 over the full q201 color grid on this JDK)
    val n = 21.0 * 17
    assert(math.abs(d.sumR / n - 180) <= 4.0)
    assert(math.abs(d.sumG / n - 40) <= 4.0)
    assert(math.abs(d.sumB / n - 220) <= 4.0)
    // and lossy means NOT pixel-exact in general — the reason q201's
    // oracle pins tolerance, not sums: encode is still deterministic
    val again = MediaCodec.encodeSolidJpeg(21, 17, 180, 40, 220)
    assert(jpg.toSeq === again.toSeq)
  }

  test("PNG encode is deterministic; decode rejects non-image bytes") {
    val a = MediaCodec.encodeSolidPng(8, 8, 1, 2, 3)
    val b = MediaCodec.encodeSolidPng(8, 8, 1, 2, 3)
    assert(a.toSeq === b.toSeq)
    assert(MediaCodec.decodeImage(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(MediaCodec.decodeImage(Array.empty[Byte]).isEmpty)
    // WAV bytes are not an image
    val wav = MediaCodec.encodeWav(Array[Short](1, 2, 3))
    assert(MediaCodec.decodeImage(wav).isEmpty)
  }

  test("WAV round trip: header fields and exact samples recovered") {
    val samples = Array.tabulate(100)(i => ((i * 173) % 2003 - 1001).toShort)
    val wav = MediaCodec.encodeWav(samples)
    // real container: RIFF....WAVE
    assert(new String(wav.slice(0, 4), "ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "ASCII") === "WAVE")
    val d = MediaCodec.decodeWav(wav).get
    assert(d.sampleRate === 16000 && d.channels === 1 && d.bitsPerSample === 16)
    assert(d.nSamples === 100)
    assert(d.sampleSum === samples.map(_.toLong).sum)
    // extreme values survive the s16le byte split
    val ext = Array[Short](Short.MinValue, Short.MaxValue, -1, 0, 1)
    val d2 = MediaCodec.decodeWav(MediaCodec.encodeWav(ext)).get
    assert(d2.nSamples === 5 && d2.sampleSum === ext.map(_.toLong).sum)
  }

  test("WAV decode rejects non-audio bytes") {
    assert(MediaCodec.decodeWav(Array[Byte](9, 9, 9)).isEmpty)
    assert(MediaCodec.decodeWav(MediaCodec.encodeSolidPng(4, 4, 0, 0, 0)).isEmpty)
  }

  test("extractFeatures dispatches: real image decode vs stub fallback") {
    import spark.implicits._
    val png = MediaCodec.encodeSolidPng(10, 6, 255, 0, 128)
    val wav = MediaCodec.encodeWav(Array.tabulate(50)(i => (i * 11).toShort))
    val garbage = Array.tabulate(64)(i => (i * 7).toByte)
    val rows = Seq(
      MediaRow(1L, "image", png, 10, 6, 0, 1),
      MediaRow(2L, "audio", wav, 0, 0, 16000, 50),
      MediaRow(3L, "image", garbage, 0, 0, 0, 1), // opaque bytes labeled image
      MediaRow(4L, "video", garbage, 320, 240, 0, 10))
    val f = MultimodalOps.extractFeatures(spark.createDataset(rows), dim = 8)
      .collect().map(x => x.media_id -> x).toMap
    // real image: [w, h, meanR, meanG, meanB, 0...]
    assert(f(1L).features(0) === 10f && f(1L).features(1) === 6f)
    assert(f(1L).features(2) === 1f) // 255/255
    assert(f(1L).features(3) === 0f)
    assert(math.abs(f(1L).features(4) - 128f / 255f) < 1e-6)
    // real audio: [rate, nSamples, meanAmp/32768]
    assert(f(2L).features(0) === 16000f && f(2L).features(1) === 50f)
    // undecodable payloads fall back to the stub, byte-identical to stubDecode
    assert(f(3L).features.toSeq === MultimodalOps.stubDecode(garbage, 8).toSeq)
    assert(f(4L).features.toSeq === MultimodalOps.stubDecode(garbage, 8).toSeq)
  }

  test("q182/q183 round-trip queries run and match hand-computed groups") {
    val dir = "/root/testdata/sf0.001"
    val img = MultimodalOps.imageRoundtrip(spark, dir).collect()
    assert(img.length === 40) // all (8+id%8, 8+id%5) cells populated via CRT
    // spot-check one cell against the generating arithmetic
    val cell = img.find(r => r.getInt(0) === 8 && r.getInt(1) === 8).get
    val ids = (0L until 500L).filter(id => id % 8 == 0 && id % 5 == 0)
    assert(cell.getLong(2) === ids.length.toLong)
    assert(cell.getLong(3) === ids.map(id => 64L * (id % 256)).sum)
    val aud = MultimodalOps.audioRoundtrip(spark, dir).collect()
    assert(aud.length === 32) // n_samples in [32, 64)
    assert(aud.forall(r => r.getInt(0) === 16000 && r.getInt(1) === 1 && r.getInt(2) === 16))
  }
}
