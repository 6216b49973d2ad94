package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.ingestFromDocuments(Tables(spark, sfDir).documents).cache()

  test("binary ingestion: schema, byte counts, deterministic hash") {
    assert(media.schema.fieldNames.toSet ===
      Set("media_id", "kind", "payload", "n_bytes", "mime_type", "content_hash"))
    val r = media.filter(col("media_id") === 0).head()
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[String]("content_hash").length === 32)
    assert(r.getAs[String]("mime_type") === "application/octet-stream") // text bytes
    val again = Multimodal.ingestFromDocuments(Tables(spark, sfDir).documents)
      .filter(col("media_id") === 0).head()
    assert(again.getAs[String]("content_hash") === r.getAs[String]("content_hash"))
  }

  test("batched feature extraction: conservation, dim, determinism") {
    val feats = Multimodal.extractFeatures(media).collect().toMap
    assert(feats.size === media.count())
    assert(feats.values.forall(_.length === Multimodal.FeatureDim))
    val feats2 = Multimodal.extractFeatures(media).collect().toMap
    assert(feats(0L).toSeq === feats2(0L).toSeq)
  }

  test("real PNG decodes end-to-end through the batched pipeline") {
    import spark.implicits._
    // 2x1 image: one pure-red pixel, one pure-blue — every feature is
    // hand-computable from the decode contract
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    img.setRGB(1, 0, 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(Multimodal.looksDecodableImage(png))

    val textBytes = "plain text".getBytes("UTF-8")
    val mixed = Seq((1L, png), (2L, textBytes)).toDF("media_id", "payload")
    val feats = Multimodal.extractFeatures(mixed).collect().toMap
    val f = feats(1L)
    assert(f.length === Multimodal.FeatureDim)
    assert(f(0) === 2.0f && f(1) === 1.0f)            // width, height
    assert(math.abs(f(2) - 0.5f) < 1e-4)              // mean R: (255+0)/2/255
    assert(math.abs(f(3) - 0.0f) < 1e-4)              // mean G
    assert(math.abs(f(4) - 0.5f) < 1e-4)              // mean B
    assert(math.abs(f(5) - 0.20650f) < 1e-4)          // mean luma: (.299+.114)/2
    assert(math.abs(f(6) - 0.09250f) < 1e-4)          // luma std: |.299-.114|/2
    assert(f(7) === 2.0f)                             // aspect
    // the real decode is not the stub; non-image payloads still stub
    assert(f.toSeq !== Multimodal.decodeStub(png).toSeq)
    assert(feats(2L).toSeq === Multimodal.decodeStub(textBytes).toSeq)
    // bytes with an image magic number but a corrupt body fall back to the
    // stub instead of failing the task
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    assert(Multimodal.decode(fake).toSeq === Multimodal.decodeStub(fake).toSeq)
  }

  test("real WAV decodes end-to-end through the batched pipeline") {
    import spark.implicits._
    import javax.sound.sampled._
    // 1 s of 8 kHz mono 16-bit PCM: a square wave with 8-sample half-period
    // at amplitude 8192 (= 0.25 full-scale) — every feature is
    // hand-computable from the decode contract
    val nFrames = 8000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val amp: Short = if ((i / 8) % 2 == 0) 8192 else -8192
      pcm(2 * i) = (amp & 0xFF).toByte
      pcm(2 * i + 1) = ((amp >> 8) & 0xFF).toByte
    }
    def container(tpe: AudioFileFormat.Type, bigEndian: Boolean): Array[Byte] = {
      val data = if (!bigEndian) pcm else pcm.grouped(2).flatMap(_.reverse).toArray
      val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong), tpe, bos)
      bos.toByteArray
    }
    val wav = container(AudioFileFormat.Type.WAVE, bigEndian = false)
    assert(Multimodal.looksDecodableAudio(wav))
    assert(!Multimodal.looksDecodableImage(wav))

    val textBytes = "plain text".getBytes("UTF-8")
    val mixed = Seq((1L, wav), (2L, textBytes)).toDF("media_id", "payload")
    val feats = Multimodal.extractFeatures(mixed).collect().toMap
    val f = feats(1L)
    assert(f.length === Multimodal.FeatureDim)
    assert(f(0) === 8000.0f && f(1) === 1.0f)         // sample rate, channels
    assert(f(2) === 1.0f)                             // duration: 8000/8000
    assert(f(3) === 0.25f)                            // RMS: all samples ±0.25
    assert(f(4) === 0.25f)                            // peak
    // 999 block boundaries flip sign across 7999 consecutive pairs
    assert(math.abs(f(5) - 999.0f / 7999.0f) < 1e-6)
    assert(f(6) === 0.0f)                             // DC: 500 blocks each sign
    assert(f(7) === 16.0f)                            // bits per sample
    // big-endian AIFF of the SAME waveform decodes to the same features
    val aiff = container(AudioFileFormat.Type.AIFF, bigEndian = true)
    assert(Multimodal.looksDecodableAudio(aiff))
    assert(Multimodal.decodeAudio(aiff).get.toSeq === f.toSeq)
    // the real decode is not the stub; non-audio payloads still stub
    assert(f.toSeq !== Multimodal.decodeStub(wav).toSeq)
    assert(feats(2L).toSeq === Multimodal.decodeStub(textBytes).toSeq)
    // bytes with a RIFF magic but a corrupt body fall back to the stub
    val fake = "RIFFxxxxWAVEgarbage".getBytes("UTF-8")
    assert(Multimodal.looksDecodableAudio(fake))
    assert(Multimodal.decode(fake).toSeq === Multimodal.decodeStub(fake).toSeq)
  }

  test("feature table joins metadata back without payload") {
    val ft = Multimodal.featureTable(media)
    assert(ft.count() === media.count())
    assert(!ft.schema.fieldNames.contains("payload"))
    assert(ft.schema.fieldNames.contains("feature"))
  }

  test("frame sampling covers the payload in bounded windows") {
    val frames = Multimodal.frameSample(media, frameBytes = 100, maxFrames = 4)
    frames.collect().foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      val fs = r.getSeq[org.apache.spark.sql.Row](2)
      assert(fs.nonEmpty && fs.size <= 4)
      assert(fs.forall(_.getAs[Long]("length") <= 100))
      assert(fs.head.getAs[Long]("offset") === 0L)
      val covered = fs.map(_.getAs[Long]("length")).sum
      assert(covered <= n)
      if (n <= 400) assert(covered === n) // small payloads fully covered
    }
  }

  test("frame sampling of an empty/null payload yields zero frames") {
    import spark.implicits._
    val degenerate = Seq(
      (900L, Some(Array.emptyByteArray)), // n_bytes = 0
      (901L, None: Option[Array[Byte]]),  // null payload
      (902L, Some("x".getBytes("UTF-8"))) // 1 byte — exactly one frame
    ).toDF("media_id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
    val out = Multimodal.frameSample(degenerate, frameBytes = 100, maxFrames = 4)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("n_frames")).toMap
    assert(out(900L) === 0, "empty payload must not emit bogus frames")
    assert(out(901L) === 0, "null payload falls through to the empty-frames branch")
    assert(out(902L) === 1)
  }

  test("media metrics accumulate in the consuming action's single pass") {
    val media = graft.operators.Multimodal.ingestFromDocuments(
      graft.sources.Tables(spark, sfDir).documents)
    val (collected, (nMedia, nNull, totalBytes)) =
      graft.operators.Multimodal.runWithMediaMetrics(media)(_.collect())
    assert(nMedia === collected.length.toLong)
    assert(nNull === 0L)
    val expectBytes = media.agg(org.apache.spark.sql.functions.sum("n_bytes"))
      .head().getLong(0)
    assert(totalBytes === expectBytes)
  }

  test("q70-q72 record per-stage media metrics on the query's own pass") {
    import graft.sources.ObservedMetrics
    val nDocs = Tables(spark, sfDir).documents.count()
    val expectBytes = media.agg(sum("n_bytes")).head().getLong(0)
    for (name <- Seq("q70_media_metadata", "q71_media_features", "q72_frame_sampling")) {
      val (rows, metrics) = ObservedMetrics.capture(spark, Multimodal.MediaMetricsName) {
        SparkEntry.queries(name)(spark, sfDir).collect()
      }
      assert(rows.nonEmpty, s"$name returned no rows")
      assert(metrics.getAs[Long]("n_media") === nDocs,
        s"$name n_media=${metrics.getAs[Long]("n_media")} != $nDocs")
      assert(metrics.getAs[Long]("n_null_payloads") === 0L)
      assert(metrics.getAs[Long]("total_bytes") === expectBytes,
        s"$name metrics rode a different pass: $metrics")
    }
  }

  private def grayPng(f: (Int, Int) => Int, w: Int = 9, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dhash64: hand-computed on 9x8 gradients, real decode, stub parity") {
    // 9x8 image = one pixel per grid cell; gray (v,v,v) has luma exactly v
    // ((299+587+114)v/1000). Ascending row gradient -> every right>left
    // bit set -> all-ones hash; descending -> no bit set.
    assert(Multimodal.dhash64(grayPng((x, _) => x * 10)) === -1L)
    assert(Multimodal.dhash64(grayPng((x, _) => 80 - x * 10)) === 0L)
    // single flipped comparison: make column 4->5 descend in row 0 only
    val oneOff = Multimodal.dhash64(grayPng((x, y) =>
      if (y == 0 && x == 5) 30 else x * 10))
    // exactly bit (0,4) flips vs all-ones (40 -> 30 descends; 30 -> 60
    // still ascends): hamming 1 from -1L
    assert(java.lang.Long.bitCount(oneOff ^ -1L) === 1)
    // stub path: byte grid wraps modulo length — reimplemented here
    val textBytes = "wrap me around the grid".getBytes("UTF-8")
    def stubRef(p: Array[Byte]): Long = {
      var hh = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val l = p((y * 9 + x) % p.length) & 0xFF
        val r = p((y * 9 + x + 1) % p.length) & 0xFF
        if (r > l) hh |= 1L << (y * 8 + x)
      }
      hh
    }
    assert(Multimodal.dhash64(textBytes) === stubRef(textBytes))
    assert(Multimodal.dhash64(Array.emptyByteArray) === 0L)
    assert(Multimodal.dhash64(null) === 0L)
  }

  test("phash16: reference parity on stub path, real decode, EXACT " +
    "brightness invariance, DC-only flatness") {
    // independent reference: same integer math, written from the recipe
    def ref(grid: Array[Int]): Int = {
      val cq = graft.operators.Multimodal.CosQ
      val f = Array.tabulate(16) { i =>
        val (u, v) = (i % 4, i / 4)
        (for (y <- 0 until 8; x <- 0 until 8)
          yield grid(y * 8 + x).toLong * cq(u)(x) * cq(v)(y)).sum
      }
      val med = f.drop(1).sorted.apply(7)
      (1 until 16).filter(b => f(b) > med).map(1 << _).sum
    }
    val textBytes = "a deterministic stub payload for the dct".getBytes("UTF-8")
    val stubG = Array.tabulate(64)(i => textBytes(i % textBytes.length) & 0xFF)
    assert(Multimodal.phash16(textBytes) === ref(stubG))
    assert(Multimodal.phash16(Array.emptyByteArray) === 0)
    assert(Multimodal.phash16(null) === 0)

    // real 8x8 PNG: one pixel per grid cell, gray (v,v,v) has luma v.
    // A CURVED pattern — a pure linear gradient is degenerate for a
    // median-thresholded DCT (all AC mass on the axis frequencies, the
    // median lands on the zero plateau and no bit sets)
    def px(f: (Int, Int) => Int) = grayPng(f, w = 8, h = 8)
    def curved(x: Int, y: Int): Int = (3 * x * x + 5 * y + x * y) % 180
    val h0 = Multimodal.phash16(px(curved))
    assert(h0 === ref(Array.tabulate(64)(i => curved(i % 8, i / 8))))
    assert(h0 !== 0, "curved pattern must produce a non-trivial hash")
    // EXACT brightness invariance: every AC row of CosQ sums to 0, so a
    // uniform +40 shift moves only the DC coefficient — hash unchanged
    assert(Multimodal.phash16(px((x, y) => curved(x, y) + 40)) === h0)
    // a flat image has every AC coefficient 0 = median -> no bits
    assert(Multimodal.phash16(px((_, _) => 77)) === 0)
    // the zero-sum property itself, pinned
    for (u <- 1 until 4)
      assert(graft.operators.Multimodal.CosQ(u).sum === 0L,
        s"AC row $u of the quantized cosine table must sum to 0")
    // global-shape sensitivity: transposing the pattern flips the hash
    assert(Multimodal.phash16(px((x, y) => curved(y, x))) !== h0)
  }

  test("dhash near-dup pairs: identical images collide, banding recall is exhaustive under 4 bits") {
    import spark.implicits._
    val a = grayPng((x, _) => x * 10)
    val b = grayPng((x, _) => x * 10) // identical content -> same hash
    val c = grayPng((x, _) => 80 - x * 10) // hamming 64 from a
    val media = Seq((1L, "img", a), (2L, "img", b), (3L, "img", c))
      .toDF("media_id", "kind", "payload")
    val pairs = Multimodal.dhashNearDupPairs(Multimodal.dhashTable(media))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
    // pigeonhole recall: <4 flipped bits always share a clean 16-bit band
    val base = 0x123456789ABCDEFL
    val flips = Seq(base, base ^ 1L, base ^ (1L << 17) ^ (1L << 18),
      base ^ (1L << 1) ^ (1L << 30) ^ (1L << 63))
    val hashes = flips.zipWithIndex
      .map { case (hh, i) => (i.toLong, "k", hh) }
      .toDF("media_id", "kind", "dhash")
    val found = Multimodal.dhashNearDupPairs(hashes)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // every variant is within hamming 3 of base (id 0)
    assert(Seq((0L, 1L), (0L, 2L), (0L, 3L)).forall(found.contains))
  }

  test("ahash64: real PCM octave envelope — hand-pinned patterns") {
    import javax.sound.sampled._
    // 6500 frames of 8 kHz mono 16-bit PCM → exactly 100 frames per
    // fingerprint segment; per-segment DC amplitude chosen per pattern
    def wavOf(ampOfSegment: Int => Short,
        tpe: AudioFileFormat.Type = AudioFileFormat.Type.WAVE,
        bigEndian: Boolean = false): Array[Byte] = {
      val nFrames = 6500
      val pcm = new Array[Byte](nFrames * 2)
      for (i <- 0 until nFrames) {
        val amp = ampOfSegment(i / 100)
        val (b0, b1) = ((amp & 0xFF).toByte, ((amp >> 8) & 0xFF).toByte)
        if (bigEndian) { pcm(2 * i) = b1; pcm(2 * i + 1) = b0 }
        else { pcm(2 * i) = b0; pcm(2 * i + 1) = b1 }
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 6500L), tpe, bos)
      bos.toByteArray
    }
    // constant tone: every segment energy equal -> no gradient anywhere
    assert(Multimodal.ahash64(wavOf(_ => 8192)) === 0L)
    // quiet/loud alternation (energy ratio 16 = 4 octaves): bit b set iff
    // segment b is the quiet one -> 0x5555555555555555
    def alt(q: Short, l: Short): Int => Short =
      s => if (s % 2 == 0) q else l
    assert(Multimodal.ahash64(wavOf(alt(3277, 13107))) === 0x5555555555555555L)
    // volume doubling shifts every octave bucket equally: same fingerprint
    assert(Multimodal.ahash64(wavOf(alt(6554, 26214))) === 0x5555555555555555L)
    // big-endian AIFF of the same waveform: same fingerprint
    assert(Multimodal.ahash64(
      wavOf(alt(3277, 13107), AudioFileFormat.Type.AIFF, bigEndian = true))
      === 0x5555555555555555L)
  }

  test("ahash64 stub path: brute-force byte-energy recompute matches") {
    val payload = ("the quick brown fox " * 40).getBytes("UTF-8")
    val e = new Array[Long](65)
    for (i <- payload.indices) {
      val v = (payload(i) & 0xFF).toLong
      e(((i.toLong * 65) / payload.length).toInt) += v * v
    }
    def bucket(x: Long): Int = if (x <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x)
    var want = 0L
    for (b <- 0 until 64)
      if (bucket(e(b + 1)) > bucket(e(b))) want |= 1L << b
    assert(Multimodal.ahash64(payload) === want)
    // empty payload is defined as 0
    assert(Multimodal.ahash64(Array.emptyByteArray) === 0L)
  }
}
