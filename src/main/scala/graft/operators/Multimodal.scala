package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.migration.MigrationFunctions.mimeSniff

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batched per-partition functions (the
  * Scala analog of pandas-UDF `mapInPandas`: one iterator per partition,
  * work chunked in fixed-size batches).
  *
  * The decode step is REAL for the formats the in-JDK codecs read:
  * PNG/JPEG/GIF/BMP via javax.imageio ([[decodeImage]], pixel statistics)
  * and WAV/AIFF PCM via javax.sound.sampled ([[decodeAudio]], waveform
  * statistics), each gated on the payload's magic numbers. Everything else
  * (video, compressed audio, exotic image formats — the container ships no
  * external codecs) falls back to [[decodeStub]], a deterministic fake
  * derived from the payload bytes. The rest of the pipeline is real and tested either
  * way: the schema, the binary ingestion, the batch shape, the
  * partition-parallel execution, and the metadata pipeline (size, MIME
  * sniff, content hash).
  *
  * At 100 TB: blobs arrive via the `binaryFile` source as (path, content)
  * pairs partitioned by file; metadata extraction is a map-only stage (no
  * shuffle); features join back to the catalog on media_id.
  */
object Multimodal {

  val FeatureDim = 8
  val BatchSize = 64

  /** Media row: opaque payload + typed metadata (SURVEY §1.3 BinaryType —
    * the reference's attachment blob, TicketProcessor.php:295-299,
    * generalized). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = true),
    StructField("mime_type", StringType, nullable = true),
    StructField("content_hash", StringType, nullable = true)))

  /** Ingest a text corpus as stand-in media blobs (payload = UTF-8 bytes):
    * deterministic, and exercises the full binary metadata path. */
  def ingestFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("media/"), col("lang")).as("kind"),
      col("text").cast("binary").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("mime_type", mimeSniff(col("payload")))
      .withColumn("content_hash", md5(col("payload")))

  /** STUB decode for payloads the real codec can't read: a deterministic
    * pseudo-feature vector from payload bytes (per-lane byte means). Lane
    * sums are exact integers normalized once in double — order-independent
    * and restatable in plain SQL, which is what lets q71 carry a full
    * cross-engine oracle. A real deployment replaces ONLY this function
    * with a codec call; signature and batch shape stay. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(FeatureDim)(0f)
    val sums = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      sums(i % FeatureDim) += payload(i) & 0xFF
      i += 1
    }
    val out = new Array[Float](FeatureDim)
    var d = 0
    while (d < FeatureDim) {
      out(d) = (sums(d).toDouble / 255.0 / payload.length * FeatureDim).toFloat
      d += 1
    }
    out
  }

  /** JVM-side magic-number gate for the formats javax.imageio decodes —
    * the executor-side twin of the column function
    * `MigrationFunctions.mimeSniff` (X13). Sniffing first keeps the codec
    * attempt (and its failure path) off non-image payloads. */
  private[graft] def looksDecodableImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M'))

  /** REAL image decode (javax.imageio — in the JDK, no external codec):
    * pixel statistics as the feature vector, dim = [[FeatureDim]]:
    * (width, height, mean R, mean G, mean B, mean luma, luma stddev,
    * aspect ratio), channel means normalized to [0,1]. None when the
    * payload isn't a decodable image — corrupt bytes or a format the JDK
    * codec doesn't read — so callers can fall back rather than fail the
    * task on one bad blob. */
  def decodeImage(payload: Array[Byte]): Option[Array[Float]] = {
    if (!looksDecodableImage(payload)) return None
    val raw: Option[Seq[Float]] = try {
      // explicit memory-cache stream: the InputStream overload defaults to
      // a disk-backed FileCacheImageInputStream (temp file create/delete
      // per blob) even though the bytes are already in memory
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // ImageIO.read(ImageInputStream) closes the stream itself on success;
      // the best-effort close covers the null/throw paths without letting a
      // double-close IOException erase a successful decode
      val img = try javax.imageio.ImageIO.read(iis)
        finally scala.util.Try(iis.close())
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      var sr, sg, sb, sl, sl2 = 0.0
      // one bulk raster read per row, not one getRGB call per pixel — the
      // per-call colour-model conversion dominates decode otherwise
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val r = (rgb >> 16) & 0xFF
          val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      val meanL = sl / n
      val varL = math.max(0.0, sl2 / n - meanL * meanL)
      Some(Seq(
        w.toFloat, h.toFloat,
        (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
        (sb / n / 255.0).toFloat, (meanL / 255.0).toFloat,
        (math.sqrt(varL) / 255.0).toFloat, (w.toDouble / h).toFloat))
    } catch { case scala.util.control.NonFatal(_) => None }
    // the dimension check runs OUTSIDE the bad-bytes catch — a FeatureDim
    // drift must fail fast, not be swallowed into a silent stub fallback
    raw.map(fs => checkedFeatures(fs: _*))
  }

  /** Every real-decode path builds its vector through this, so a
    * [[FeatureDim]] change fails fast at the build site instead of
    * silently diverging from [[decodeStub]] and the declared schema. */
  private def checkedFeatures(fs: Float*): Array[Float] = {
    require(fs.length == FeatureDim,
      s"decoder produced ${fs.length} features, schema declares $FeatureDim")
    fs.toArray
  }

  /** JVM-side magic-number gate for the containers javax.sound.sampled
    * reads in-JDK: RIFF/WAVE and FORM/AIFF(-C). */
  private[graft] def looksDecodableAudio(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
        p(8) == 'A' && p(9) == 'I' && p(10) == 'F' &&
        (p(11) == 'F' || p(11) == 'C')))

  /** REAL audio decode (javax.sound.sampled — in the JDK, no external
    * codec): waveform statistics as the feature vector, dim =
    * [[FeatureDim]]: (sample rate Hz, channels, duration sec, RMS, peak,
    * zero-crossing rate, DC offset, bits per sample); amplitudes
    * normalized to [-1,1] on the channel-averaged mono mix. Covers 8/16-bit
    * integer PCM, both endiannesses (WAV is little-, AIFF big-endian).
    * None on anything else — corrupt bytes, compressed payloads, exotic
    * sample widths — so callers fall back to the stub rather than fail the
    * task on one bad blob. */
  def decodeAudio(payload: Array[Byte]): Option[Array[Float]] = {
    if (!looksDecodableAudio(payload)) return None
    val raw: Option[Seq[Float]] = try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        if (ch <= 0 || (bits != 8 && bits != 16) ||
          (enc != PCM_SIGNED && enc != PCM_UNSIGNED)) return None
        // blobs are in-memory pipeline payloads (bounded by the source), so
        // draining the decoded stream once is the batch-friendly shape
        val pcm = in.readAllBytes()
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * ch
        val nFrames = pcm.length / frameBytes
        if (nFrames == 0) return None
        val big = fmt.isBigEndian
        var sum, sum2, peak = 0.0
        var crossings = 0L
        var prevSign = 0
        var f = 0
        while (f < nFrames) {
          var mix = 0.0
          var c = 0
          while (c < ch) {
            val o = f * frameBytes + c * bytesPerSample
            val v =
              if (bits == 16) {
                val s =
                  if (big) ((pcm(o) << 8) | (pcm(o + 1) & 0xFF)).toShort
                  else ((pcm(o + 1) << 8) | (pcm(o) & 0xFF)).toShort
                (if (enc == PCM_UNSIGNED) (s & 0xFFFF) - 32768 else s.toInt) / 32768.0
              } else {
                (if (enc == PCM_UNSIGNED) (pcm(o) & 0xFF) - 128 else pcm(o).toInt) / 128.0
              }
            mix += v
            c += 1
          }
          mix /= ch
          sum += mix; sum2 += mix * mix
          val a = math.abs(mix)
          if (a > peak) peak = a
          val sign = java.lang.Double.compare(mix, 0.0).sign
          if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
          if (sign != 0) prevSign = sign
          f += 1
        }
        val n = nFrames.toDouble
        Some(Seq(
          fmt.getSampleRate, ch.toFloat,
          (n / fmt.getFrameRate).toFloat,
          math.sqrt(sum2 / n).toFloat, peak.toFloat,
          (crossings.toDouble / math.max(1L, nFrames - 1)).toFloat,
          (sum / n).toFloat, bits.toFloat))
      } finally scala.util.Try(in.close())
    } catch { case scala.util.control.NonFatal(_) => None }
    // dimension check OUTSIDE the bad-bytes catch (see decodeImage)
    raw.map(fs => checkedFeatures(fs: _*))
  }

  /** The pipeline's decode: real pixel/waveform features when an in-JDK
    * codec reads the payload, [[decodeStub]] otherwise. Total — never
    * throws on bad bytes. */
  def decode(payload: Array[Byte]): Array[Float] =
    decodeImage(payload)
      .orElse(decodeAudio(payload))
      .getOrElse(decodeStub(payload))

  /** Batched per-partition feature extraction (mapInPandas analog): the
    * typed partition iterator streams through in BatchSize chunks — the
    * chunk boundary is where a real implementation amortizes codec/model
    * setup per batch. Map-only: no shuffle. */
  def extractFeatures(media: DataFrame): Dataset[(Long, Array[Float])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // per-batch setup would go here (codec init, model session, ...)
          batch.iterator.map { case (id, payload) => (id, decode(payload)) }
        }
      }
  }

  /** Feature extraction joined back to metadata — the catalog-side view. */
  def featureTable(media: DataFrame): DataFrame =
    extractFeatures(media).toDF("media_id", "feature")
      .join(media.drop("payload"), Seq("media_id"))

  /** 64-bit difference hash (dHash) — the perceptual fingerprint image-
    * dedup pipelines run at ingest (LAION-style near-dup removal): an
    * 8-row × 9-col luma grid, bit (y,x) = grid(y,x+1) > grid(y,x),
    * packed at index y*8+x. REAL for JDK-decodable images, via
    * deterministic integer area-averaging of luma blocks — never a
    * Graphics2D resample, whose interpolation is implementation-defined;
    * STUB for any other payload (bytes laid row-major onto the grid,
    * wrapped modulo length) — deterministic AND restatable in plain SQL,
    * which is what gives q116 a full oracle on the text-byte fixture.
    * Null/empty payloads and undecodable image-magic payloads hash
    * through the stub (empty → 0L): ingest-side dedup must hash every
    * blob, not throw on the corrupt ones. */
  def dhash64(payload: Array[Byte]): Long = {
    if (payload == null || payload.length == 0) return 0L
    val grid =
      if (looksDecodableImage(payload)) imageGrid(payload).getOrElse(stubGrid(payload))
      else stubGrid(payload)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(y * 9 + x + 1) > grid(y * 9 + x)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** 64-bit audio fingerprint — the dHash idea on the time axis: the
    * mono mix splits into 65 equal time segments, bit b is the sign of
    * the OCTAVE-bucketed energy gradient, bucket(e) = floor(log2 e)+1
    * (0 for silence). Energy = SUM of squared samples per segment
    * (segment sizes differ by at most one sample, so sum-vs-mean only
    * renames the constant — SUM keeps the stub path in exact integer
    * arithmetic). The octave coarsening is what makes it a NEAR-dup
    * fingerprint: raw energy sums are so discriminative that even
    * 95%-similar payloads disagree on most gradient signs (measured 0
    * near-dup pairs on the fixture), while loudness doubles capture the
    * envelope SHAPE — near-identical payloads land in the same buckets
    * and collide (measured ~1.1k pairs). Doubling the volume shifts
    * every bucket by one, preserving every gradient exactly — the
    * brightness-invariance analogue.
    *
    * Real path for JDK-decodable WAV/AIFF PCM (same coverage as
    * [[decodeAudio]]); anything else takes the byte-energy STUB
    * (payload byte values as "samples" — integer arithmetic, designed
    * SQL-restatable like [[dhash64]]'s stub grid: integer energies make
    * bucket(e) exactly bitLength(e), which SQL floor(log2) reproduces
    * exactly below 2⁴⁵ — far above any fixture energy). */
  def ahash64(payload: Array[Byte]): Long = {
    if (payload == null || payload.length == 0) return 0L
    val e: Array[Double] =
      if (looksDecodableAudio(payload))
        audioSegmentEnergies(payload).getOrElse(stubSegmentEnergies(payload))
      else stubSegmentEnergies(payload)
    var h = 0L
    var b = 0
    while (b < 64) {
      if (octaveBucket(e(b + 1)) > octaveBucket(e(b))) h |= 1L << b
      b += 1
    }
    h
  }

  /** floor(log2 e) + 1 for e > 0, else 0 — exact bit arithmetic for the
    * exact-integer stub energies (getExponent of an integral double IS
    * bitLength − 1), IEEE-floor-log2 for real PCM energies. */
  private def octaveBucket(e: Double): Int =
    if (e <= 0) 0 else Math.getExponent(e) + 1

  /** Byte-energy stub segments: Σ byte² per segment, seg(i) = i·65/L —
    * exact integers in doubles, so the q149 oracle re-derives every
    * comparison with HUGEINT sums. */
  private def stubSegmentEnergies(p: Array[Byte]): Array[Double] = {
    val e = new Array[Double](65)
    val L = p.length
    var i = 0
    while (i < L) {
      val v = (p(i) & 0xFF).toDouble
      e(((i.toLong * 65) / L).toInt) += v * v
      i += 1
    }
    e
  }

  /** Real-PCM segment energies — the [[decodeAudio]] walk (same format
    * coverage, same mono mix), accumulating Σ mix² into 65 segments
    * seg(f) = f·65/nFrames instead of global stats. */
  private def audioSegmentEnergies(payload: Array[Byte]): Option[Array[Double]] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        if (ch <= 0 || (bits != 8 && bits != 16) ||
          (enc != PCM_SIGNED && enc != PCM_UNSIGNED)) return None
        val pcm = in.readAllBytes()
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * ch
        val nFrames = pcm.length / frameBytes
        if (nFrames == 0) return None
        val big = fmt.isBigEndian
        val e = new Array[Double](65)
        var f = 0
        while (f < nFrames) {
          var mix = 0.0
          var c = 0
          while (c < ch) {
            val o = f * frameBytes + c * bytesPerSample
            val v =
              if (bits == 16) {
                val s =
                  if (big) ((pcm(o) << 8) | (pcm(o + 1) & 0xFF)).toShort
                  else ((pcm(o + 1) << 8) | (pcm(o) & 0xFF)).toShort
                (if (enc == PCM_UNSIGNED) (s & 0xFFFF) - 32768 else s.toInt) / 32768.0
              } else {
                (if (enc == PCM_UNSIGNED) (pcm(o) & 0xFF) - 128 else pcm(o).toInt) / 128.0
              }
            mix += v
            c += 1
          }
          mix /= ch
          e(((f.toLong * 65) / nFrames).toInt) += mix * mix
          f += 1
        }
        Some(e)
      } finally scala.util.Try(in.close())
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-media audio-fingerprint table — map-only, batched like
    * [[dhashTable]]. */
  def ahashTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) => (id, ahash64(payload)) }
        }
      }
      .toDF("media_id", "ahash")
      .join(media.drop("payload"), Seq("media_id"))
  }

  /** Near-dup pairs over [[ahashTable]] rows — the identical banded
    * Hamming machinery as [[dhashNearDupPairs]] (the fingerprint is the
    * only thing that changed). */
  def ahashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    dhashNearDupPairs(hashes.withColumnRenamed("ahash", "dhash"), maxHamming)

  private def stubGrid(p: Array[Byte]): Array[Int] = {
    val g = new Array[Int](72)
    var i = 0
    while (i < 72) { g(i) = p(i % p.length) & 0xFF; i += 1 }
    g
  }

  /** Quantized DCT-II basis for [[phash16]]: rint(1024·cos(π(2x+1)u/16))
    * for u ∈ 0..3 — INTEGER literals (shared verbatim with the q216
    * oracle) so the whole transform is exact integer arithmetic, no
    * cross-engine libm. The table is negation-symmetric, so every AC
    * row sums to EXACTLY 0 — a uniform brightness shift moves only the
    * (0,0) coefficient and the hash is brightness-invariant by exact
    * arithmetic, not approximation (pinned in MultimodalSpec). */
  private[graft] val CosQ: Array[Array[Long]] = Array(
    Array(1024L, 1024L, 1024L, 1024L, 1024L, 1024L, 1024L, 1024L),
    Array(1004L, 851L, 569L, 200L, -200L, -569L, -851L, -1004L),
    Array(946L, 392L, -392L, -946L, -946L, -392L, 392L, 946L),
    Array(851L, -200L, -1004L, -569L, 569L, 1004L, 200L, -851L))

  /** 15-bit DCT perceptual hash — the classic pHash recipe (block-mean
    * grid → 2-D DCT → low-frequency block thresholded on its median)
    * with every step INTEGER: 8×8 luma grid (real path block-average,
    * stub path byte wrap — the [[dhash64]] convention), exact integer
    * DCT via [[CosQ]] (|F| ≤ 64·255·1024² ≈ 1.7e13, long-safe), the
    * 15 AC coefficients of the low 4×4 block compared strictly against
    * their exact median (8th-smallest of 15 — odd count, no averaging).
    * Bit v·4+u set when F(u,v) > median; bit 0 (DC) unused. Where
    * [[dhash64]] reads local gradients, the DCT bits read the GLOBAL
    * shape of the image at the 4 lowest frequencies — the pair is the
    * standard perceptual-dedup ensemble. */
  def phash16(payload: Array[Byte]): Int = {
    if (payload == null || payload.length == 0) return 0
    val g: Array[Int] =
      if (looksDecodableImage(payload)) imageGrid8(payload).getOrElse(stubGrid8(payload))
      else stubGrid8(payload)
    val f = new Array[Long](16)
    var v = 0
    while (v < 4) {
      var u = 0
      while (u < 4) {
        var s = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += g(y * 8 + x).toLong * CosQ(u)(x) * CosQ(v)(y)
            x += 1
          }
          y += 1
        }
        f(v * 4 + u) = s
        u += 1
      }
      v += 1
    }
    val ac = new Array[Long](15)
    System.arraycopy(f, 1, ac, 0, 15)
    java.util.Arrays.sort(ac)
    val med = ac(7)
    var h = 0
    var b = 1
    while (b < 16) {
      if (f(b) > med) h |= 1 << b
      b += 1
    }
    h
  }

  private def stubGrid8(p: Array[Byte]): Array[Int] = {
    val g = new Array[Int](64)
    var i = 0
    while (i < 64) { g(i) = p(i % p.length) & 0xFF; i += 1 }
    g
  }

  /** [[imageGrid]]'s 8×8 twin (pHash wants a square block for the
    * square DCT basis): integer block-average luma, every step exact. */
  private def imageGrid8(payload: Array[Byte]): Option[Array[Int]] = try {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img = try javax.imageio.ImageIO.read(iis)
      finally scala.util.Try(iis.close())
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val (wd, ht) = (img.getWidth, img.getHeight)
      val g = new Array[Int](64)
      var y = 0
      while (y < 8) {
        val y0 = y * ht / 8
        val y1 = math.min(ht, math.max((y + 1) * ht / 8, y0 + 1))
        var x = 0
        while (x < 8) {
          val x0 = x * wd / 8
          val x1 = math.min(wd, math.max((x + 1) * wd / 8, x0 + 1))
          var sum = 0L
          var n = 0L
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              val rgb = img.getRGB(xx, yy)
              sum += (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
                114 * (rgb & 0xFF)) / 1000
              n += 1
              xx += 1
            }
            yy += 1
          }
          g(y * 8 + x) = (sum / n).toInt
          x += 1
        }
        y += 1
      }
      Some(g)
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-media pHash table — map-only, batched like [[dhashTable]]. */
  def phashTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) => (id, phash16(payload)) }
        }
      }
      .toDF("media_id", "phash")
      .join(media.drop("payload"), Seq("media_id"))
  }

  /** Integer block-average luma grid: cell (y,x) averages the pixel
    * block [x·W/9,(x+1)·W/9) × [y·H/8,(y+1)·H/8) (floor bounds, ≥1 px),
    * luma = (299R+587G+114B)/1000 per pixel, block mean by integer
    * division — every step exact, so a hand-computed spec can pin it. */
  private def imageGrid(payload: Array[Byte]): Option[Array[Int]] = try {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img = try javax.imageio.ImageIO.read(iis)
      finally scala.util.Try(iis.close())
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val (wd, ht) = (img.getWidth, img.getHeight)
      val g = new Array[Int](72)
      var y = 0
      while (y < 8) {
        val y0 = y * ht / 8
        val y1 = math.min(ht, math.max((y + 1) * ht / 8, y0 + 1))
        var x = 0
        while (x < 9) {
          val x0 = x * wd / 9
          val x1 = math.min(wd, math.max((x + 1) * wd / 9, x0 + 1))
          var sum = 0L
          var n = 0L
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              val rgb = img.getRGB(xx, yy)
              sum += (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
                114 * (rgb & 0xFF)) / 1000
              n += 1
              xx += 1
            }
            yy += 1
          }
          g(y * 9 + x) = (sum / n).toInt
          x += 1
        }
        y += 1
      }
      Some(g)
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-media dHash table — map-only, batched like [[extractFeatures]]. */
  def dhashTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) => (id, dhash64(payload)) }
        }
      }
      .toDF("media_id", "dhash")
      .join(media.drop("payload"), Seq("media_id"))
  }

  /** Perceptual near-dup pairs over [[dhashTable]] rows: 16-bit banding
    * (4 bands) buckets candidates per kind, exact Hamming verifies.
    * With maxHamming < 4 the banding is EXHAUSTIVE by pigeonhole — ≤ 3
    * differing bits cannot touch all 4 bands, so some band matches
    * exactly and recall is 1.0 (what lets q117's oracle ignore the
    * banding and re-derive pairs from hashes alone). The self-join keys
    * on (kind, band, 16-bit bucket) — only colliding blobs ever meet. */
  def dhashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      "banding recall is only exhaustive for maxHamming < bands (4)")
    // re-widened + lazily checkpointed (r18): both self-join sides
    // otherwise re-derive the upstream hash table — for a blob-backed
    // `hashes` that is the whole decode+hash pass twice (the
    // minhashNearDupPairs rationale)
    val banded = Dedup.rewiden(hashes, col("media_id"))
      .select(col("media_id"), col("kind"), col("dhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "bh")))
      .localCheckpoint(eager = false)
    val a = banded.select(col("kind"), col("band"), col("bh"),
      col("media_id").as("id_a"), col("dhash").as("dh_a"))
    val b = banded.select(col("kind"), col("band"), col("bh"),
      col("media_id").as("id_b"), col("dhash").as("dh_b"))
    a.join(b, Seq("kind", "band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("kind"), col("id_a"), col("id_b"), col("dh_a"), col("dh_b"))
      .distinct() // dedup multi-band collisions BEFORE computing hamming
      .select(col("kind"), col("id_a"), col("id_b"),
        graft.functions.TextFunctions.hamming64(col("dh_a"), col("dh_b"))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** STUB frame-sampler for video-ish payloads: returns (offset, length)
    * windows — deterministic byte windows standing in for frames. */
  def frameSample(media: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame =
    media.select(col("media_id"), col("n_bytes"),
      // empty/null payloads get an empty frame list — without the guard,
      // ceil(0/frameBytes)-1 = -1 makes sequence(0,-1) count DOWN and emit
      // two bogus frames (same hazard as TextFunctions.shingles)
      when(col("n_bytes") > 0,
        transform(
          sequence(lit(0),
            least(ceil(col("n_bytes") / frameBytes).cast("int") - 1, lit(maxFrames - 1))),
          i => struct((i * frameBytes).cast("long").as("offset"),
            least(lit(frameBytes).cast("long"),
              col("n_bytes") - i * frameBytes).as("length"))))
        .otherwise(array().cast("array<struct<offset:bigint,length:bigint>>"))
        .as("frames"))
      .withColumn("n_frames", size(col("frames")))

  val MediaMetricsName = "graft_media_metrics"

  private def mediaMetricCols: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_media"),
    count(when(col("payload").isNull, 1)).as("n_null_payloads"),
    coalesce(sum(col("n_bytes")), lit(0L)).as("total_bytes"))

  /** Zero-pass media-pipeline metrics (observe(), see ObservedMetrics):
    * run `action` on the media frame and return
    * (n_media, n_null_payloads, total_bytes) from that same pass. */
  def runWithMediaMetrics[A](media: DataFrame)(
      action: DataFrame => A): (A, (Long, Long, Long)) = {
    val (result, row) = graft.sources.ObservedMetrics.run(
      media, MediaMetricsName, mediaMetricCols)(action)
    (result, (row.getLong(0), row.getLong(1), row.getLong(2)))
  }

  /** Media frame with the pipeline metrics baked in under the FIXED name
    * [[MediaMetricsName]] — for declarative query paths (q70-q72) where the
    * consuming action is the caller's: whatever runs the query also records
    * (n_media, n_null_payloads, total_bytes) on the same pass, readable via
    * `ObservedMetrics.capture` or any QueryExecutionListener. Attach ONCE
    * per plan — a frame observed here then used in two branches of a
    * self-join would double-count. */
  def observedMedia(media: DataFrame): DataFrame =
    media.observe(MediaMetricsName, mediaMetricCols.head, mediaMetricCols.tail: _*)
}
