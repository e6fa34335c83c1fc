package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaRecord, MultimodalOps}

/** Multimodal binary plumbing: typed schema, deterministic stub decode,
  * partitioning invariance, bounded frame fan-out.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media = MultimodalOps.toMedia(
    Seq(
      (1L, "hello world"),
      (2L, "a longer payload with more bytes to window over"),
      (3L, "x")).toDF("id", "payload").withColumn("payload", col("payload").cast("binary")),
    "id", "payload", "application/octet-stream")

  test("extractFeatures: typed batch shape, fixed dim, deterministic") {
    val feats = MultimodalOps.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    assert(feats.map(_.id).toSeq == Seq(1L, 2L, 3L))
    assert(feats.forall(_.feature.length == 8))
    assert(feats.map(_.nBytes).toSeq == Seq(11, 47, 1))
    val again = MultimodalOps.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    assert(feats.map(_.fingerprint).toSeq == again.map(_.fingerprint).toSeq)
    assert(feats.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("results are partitioning-invariant (row-local decode, no payload shuffle)") {
    val one = MultimodalOps.extractFeatures(media.repartition(1), dim = 4)
      .collect().sortBy(_.id).map(f => (f.id, f.fingerprint, f.feature.toSeq)).toSeq
    val many = MultimodalOps.extractFeatures(media.repartition(7), dim = 4)
      .collect().sortBy(_.id).map(f => (f.id, f.fingerprint, f.feature.toSeq)).toSeq
    assert(one == many)
  }

  test("sampleFrames: windows payload, honors stride and maxFrames bound") {
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 10).collect()
      .groupBy(_.id).view.mapValues(_.sortBy(_.frameIdx)).toMap
    assert(frames(1L).map(_.nBytes).toSeq == Seq(10, 1)) // 11 bytes -> 10+1
    assert(frames(2L).length == 5) // 47 bytes -> 5 windows
    assert(frames(3L).map(_.nBytes).toSeq == Seq(1))
    val strided = MultimodalOps.sampleFrames(media, frameBytes = 10, stride = 2, maxFrames = 2)
      .collect().filter(_.id == 2L).map(_.frameIdx).sorted.toSeq
    assert(strided == Seq(0, 2)) // every 2nd window, capped at 2 frames
  }

  test("resizeFeatures average-pools to the target dim, invariant under partitioning") {
    val feats = MultimodalOps.extractFeatures(media, dim = 8)
    val small = MultimodalOps.resizeFeatures(feats, targetDim = 4).collect().sortBy(_.id)
    assert(small.forall(_.feature.length == 4))
    // pooling is mean-preserving per bucket: resize of a constant vector
    // is the same constant
    val const = MultimodalOps.extractFeatures(media, dim = 8).map(
      f => f.copy(feature = Array.fill(8)(2.5f)))(
      org.apache.spark.sql.Encoders.product[graft.operators.MediaFeature])
    val pooled = MultimodalOps.resizeFeatures(const, targetDim = 4).collect()
    assert(pooled.forall(_.feature.forall(v => math.abs(v - 2.5f) < 1e-6)))
    val repart = MultimodalOps.resizeFeatures(feats.repartition(7), targetDim = 4)
      .collect().sortBy(_.id).map(_.feature.toSeq).toSeq
    assert(repart == small.map(_.feature.toSeq).toSeq)
  }

  test("resizeFeatures leaves an empty feature vector empty (pure pooling, no shape change)") {
    val withEmpty = MultimodalOps.extractFeatures(media, dim = 8).map(
      f => if (f.id == 1L) f.copy(feature = Array.empty[Float]) else f)(
      org.apache.spark.sql.Encoders.product[graft.operators.MediaFeature])
    val out = MultimodalOps.resizeFeatures(withEmpty, targetDim = 4).collect().sortBy(_.id)
    assert(out.head.feature.isEmpty, "empty in, empty out")
    assert(out.tail.forall(_.feature.length == 4))
  }

  test("round-trips through parquet with payload intact") {
    val out = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(out)
    val back = MultimodalOps.toMedia(
      spark.read.parquet(out), "id", "content", "application/octet-stream")
    val a = MultimodalOps.extractFeatures(media, 4).collect().sortBy(_.id).map(_.fingerprint).toSeq
    val b = MultimodalOps.extractFeatures(back, 4).collect().sortBy(_.id).map(_.fingerprint).toSeq
    assert(a == b)
  }

  // ---- real javax.imageio decode path (r7 verdict ask #7) ----------------

  /** Deterministic PNG fixture: w×h image, pixel (x, y) colored by f. */
  private def pngBytes(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("extractImageFeatures decodes GENUINE png bytes: dims + luminance grid") {
    // left half black, right half white, 8x4 -> 2x2 grid means [0, 1, 0, 1]
    val png = pngBytes(8, 4)((x, _) => if (x < 4) 0x000000 else 0xffffff)
    val gray = pngBytes(3, 3)((_, _) => 0x808080) // uniform 128-gray
    val junk = "not an image at all".getBytes("UTF-8")
    val media = MultimodalOps.toMedia(
      Seq((1L, png), (2L, gray), (3L, junk)).toDF("id", "payload"),
      "id", "payload", "image/png")
    val feats = MultimodalOps.extractImageFeatures(media, grid = 2)
      .collect().sortBy(_.id)
    val Array(half, uniform, bad) = feats
    assert(half.decoded && half.width == 8 && half.height == 4)
    assert(half.feature.length == 4)
    assert(half.feature(0) == 0f && half.feature(2) == 0f, "black cells")
    assert(half.feature(1) == 1f && half.feature(3) == 1f, "white cells")
    assert(uniform.decoded && uniform.width == 3 && uniform.height == 3)
    // uniform 128-gray: every cell is exactly 128*1000/1000/255
    assert(uniform.feature.forall(v => math.abs(v - 128f / 255f) < 1e-6))
    // garbage bytes: stub fallback, never a task failure
    assert(!bad.decoded && bad.width == -1 && bad.height == -1)
    assert(bad.feature.sameElements(MultimodalOps.fakeDecode(junk, 4)._2))
  }

  test("dHash: gradient-sign bits, brightness-invariant, scale-invariant pooling") {
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // horizontal ramp: every gradient bit set; vertical ramp: none
    val ramp = MultimodalOps.decodeImage(pngBytes(9, 8)((x, _) => gray(x * 20))).get
    val vert = MultimodalOps.decodeImage(pngBytes(9, 8)((_, y) => gray(y * 20))).get
    assert(MultimodalOps.dHash(ramp) == -1L, "all 64 bits set")
    assert(MultimodalOps.dHash(vert) == 0L, "no horizontal gradient")
    // NEAR-dup key: a global brightness shift keeps every gradient sign
    val brighter = MultimodalOps.decodeImage(pngBytes(9, 8)((x, _) => gray(x * 20 + 50))).get
    assert(MultimodalOps.dHash(brighter) == MultimodalOps.dHash(ramp))
    // pooling: 2x-upscaled image (each cell a uniform 2x2 block) hashes equal
    val up = MultimodalOps.decodeImage(pngBytes(18, 16)((x, y) => gray((x / 2) * 20))).get
    assert(MultimodalOps.dHash(up) == MultimodalOps.dHash(ramp))
    // undecodable payloads fall back deterministically, decoded = false
    val junk = Array[Byte](9, 9, 9)
    val media = MultimodalOps.toMedia(
      Seq((1L, junk)).toDF("id", "payload"), "id", "payload", "image/png")
    val fh = MultimodalOps.imageDHash(media).collect().head
    assert(!fh.decoded && fh.hash == MultimodalOps.fakeDecode(junk, 1)._1)
  }

  test("thumbnail really rescales: re-decoded dims shrink to maxSide, aspect kept") {
    val png = pngBytes(16, 8)((x, y) => if ((x + y) % 2 == 0) 0xff0000 else 0x00ff00)
    val small = pngBytes(3, 2)((_, _) => 0x123456)
    val junk = Array[Byte](1, 2, 3)
    val media = MultimodalOps.toMedia(
      Seq((1L, png), (2L, small), (3L, junk)).toDF("id", "payload"),
      "id", "payload", "image/png")
    val out = MultimodalOps.thumbnail(media, maxSide = 4).collect().sortBy(_.id)
    val big = MultimodalOps.decodeImage(out(0).content).get
    assert(big.getWidth == 4 && big.getHeight == 2, "16x8 -> 4x2 at maxSide 4")
    // already-small image and undecodable payload pass through byte-identical
    assert(out(1).content.sameElements(small) && out(2).content.sameElements(junk))
  }

  test("PCM16: encode/decode roundtrip is exact; sign, endianness, odd tail") {
    // Known samples covering both signs, extremes, and zero.
    val samples = Array[Short](0, 1, -1, 1000, -1000, Short.MaxValue, Short.MinValue, 0)
    val bytes = MultimodalOps.pcm16Bytes(samples)
    assert(bytes.length == 16)
    // little-endian spot check: 1000 = 0x03E8 -> low byte 0xE8 first
    assert((bytes(6) & 0xff) == 0xe8 && bytes(7) == 0x03)
    val f = MultimodalOps.pcmFeatures(7L, bytes)
    assert(f.id == 7L && f.nSamples == 8 && f.nZero == 2)
    assert(f.peakAbs == 32768L, "|Short.MinValue| must not overflow to negative")
    val expectSq = samples.map(s => s.toLong * s).sum
    assert(f.sumSq == expectSq, s"sumSq ${f.sumSq} != $expectSq")
    // a trailing odd byte is ignored, not crashed on
    val odd = MultimodalOps.pcmFeatures(1L, bytes :+ 0x7f.toByte)
    assert(odd.nSamples == 8 && odd.sumSq == expectSq)
    // empty payload: all-zero features, no crash
    val empty = MultimodalOps.pcmFeatures(2L, Array.emptyByteArray)
    assert(empty.nSamples == 0 && empty.peakAbs == 0 && empty.sumSq == 0)
  }

  test("extractPcmFeatures is row-local: repartitioning never changes results") {
    val media = MultimodalOps.toMedia(
      (1L to 40L).map(i => (i, MultimodalOps.pcm16Bytes(
        Array.tabulate[Short](32)(j => ((i * 7 + j * 13) % 2000 - 1000).toShort))))
        .toDF("id", "payload"),
      "id", "payload", "audio/pcm")
    val one = MultimodalOps.extractPcmFeatures(media.repartition(1))
      .collect().sortBy(_.id).toSeq
    val many = MultimodalOps.extractPcmFeatures(media.repartition(13))
      .collect().sortBy(_.id).toSeq
    assert(one == many, "PCM features must be partitioning-invariant")
    assert(one.forall(f => f.nSamples == 32))
  }

  test("WAV: wavBytes -> parseWav round-trips header fields and payload exactly") {
    val samples = Array.tabulate(48)(i => ((i * 257 - 6000) % 32000).toShort)
    val wav = MultimodalOps.wavBytes(samples, sampleRate = 8100, channels = 1)
    val w = MultimodalOps.parseWav(wav).getOrElse(fail("canonical WAV must parse"))
    assert(w.audioFormat == 1 && w.bitsPerSample == 16)
    assert(w.sampleRate == 8100 && w.channels == 1)
    assert(w.data.toSeq == MultimodalOps.pcm16Bytes(samples).toSeq,
      "data chunk must be the exact PCM payload")
  }

  test("WAV: parser skips unknown chunks (LIST before data) with even-byte padding") {
    val samples = Array.tabulate(10)(i => (i * 100).toShort)
    val canonical = MultimodalOps.wavBytes(samples, 8000)
    // Splice an odd-sized LIST chunk (size 3, padded to 4) between fmt and
    // data; a walker that forgets the RIFF pad rule desyncs and fails.
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = canonical.take(36) ++ list ++ canonical.drop(36)
    // fix the RIFF size field (bytes 4..7, le32)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte; spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte; spliced(7) = ((total >> 24) & 0xff).toByte
    val w = MultimodalOps.parseWav(spliced).getOrElse(fail("LIST-bearing WAV must parse"))
    assert(w.sampleRate == 8000 &&
      w.data.toSeq == MultimodalOps.pcm16Bytes(samples).toSeq)
  }

  test("WAV: malformed containers quarantine (None), never throw") {
    val good = MultimodalOps.wavBytes(Array.tabulate(16)(_.toShort), 8000)
    // bad magic
    val badMagic = good.clone(); badMagic(3) = 'X'.toByte
    assert(MultimodalOps.parseWav(badMagic).isEmpty, "RIFX magic must quarantine")
    // not WAVE
    val notWave = good.clone(); notWave(8) = 'N'.toByte
    assert(MultimodalOps.parseWav(notWave).isEmpty)
    // truncated data chunk (declared size overruns payload)
    assert(MultimodalOps.parseWav(good.dropRight(5)).isEmpty, "truncated chunk must quarantine")
    // short payload entirely
    assert(MultimodalOps.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    // non-PCM format code (3 = IEEE float) must quarantine
    val floatFmt = good.clone(); floatFmt(20) = 3
    assert(MultimodalOps.parseWav(floatFmt).isEmpty, "non-PCM16 must quarantine")
  }

  test("WAV: crafted chunk size near Int.MaxValue quarantines — no Int-overflow wraparound (r10 fix)") {
    // Regression for the r10 hardening: `off + 8 + sz` wraps NEGATIVE when
    // a chunk declares sz ≈ Int.MaxValue, so a naive `<= bytes.length`
    // truncation check passes and copyOfRange later throws (or worse,
    // mis-slices). The parser must compare by subtraction and quarantine.
    val samples = Array.tabulate(16)(_.toShort)
    val good = MultimodalOps.wavBytes(samples, 8000)
    for (sz <- Seq(Int.MaxValue, Int.MaxValue - 4, 0x7ffffff0)) {
      val crafted = good.clone()
      // data chunk header sits right after the 36-byte canonical prefix:
      // overwrite its le32 size field (bytes 40..43) with the huge value.
      crafted(40) = (sz & 0xff).toByte
      crafted(41) = ((sz >> 8) & 0xff).toByte
      crafted(42) = ((sz >> 16) & 0xff).toByte
      crafted(43) = ((sz >> 24) & 0xff).toByte
      val out = try MultimodalOps.parseWav(crafted)
      catch { case e: Throwable => fail(s"sz=$sz must quarantine, not throw: $e") }
      assert(out.isEmpty, s"sz=$sz: crafted oversize chunk must return None")
    }
  }

  test("extractWavFeatures: good rows decode with header metadata, corrupted rows flag") {
    val media = spark.createDataset(Seq(0L, 1L, 2L, 3L).map { id =>
      val wav = MultimodalOps.wavBytes(Array.tabulate(24)(i => (i * 50).toShort),
        8000 + id.toInt * 100)
      if (id == 2L) wav(3) = 'X'.toByte
      MediaRecord(id, "audio/wav", wav)
    })
    val out = MultimodalOps.extractWavFeatures(media).collect().sortBy(_.id)
    assert(out.count(_.decoded) == 3)
    assert(!out(2).decoded && out(2).sampleRate == 0L, "corrupt row must flag, not drop")
    assert(out(0).sampleRate == 8000L && out(3).sampleRate == 8300L,
      "sample rate must come from the parsed header")
    assert(out(0).nSamples == 24 && out(0).nZero == 1, "features ride the data chunk")
  }
}
