package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal payload plumbing for training-data pipelines: image/audio/
  * video ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction / frame-sampling are projections or batched
  * mapPartitions over the bytes.
  *
  * IMAGE and AUDIO decode are REAL since round 12: the JDK ships a
  * headless-safe PNG codec (javax.imageio) and a WAV/PCM codec
  * (javax.sound.sampled), so [[pngEncode]]/[[imageFeatures]] and
  * [[wavEncode]]/[[audioFeatures]] run actual encode→decode round trips
  * on executors (oracle-exact because both codecs are lossless — see the
  * codec sections below). Only LOSSY codecs (jpeg-with-loss, mp3, video)
  * remain STUBBED — no such library exists in this container, the JDK
  * included — with a deterministic md5-derived feature map, so that
  * pipeline's schema, partitioning, batch shape, and oracle are still
  * real and testable; swap [[Multimodal.stubDecode]] for a real lossy
  * decoder and nothing else changes.
  *
  * Scale notes: payloads stay in the scan projection (no shuffle); feature
  * extraction is per-row bounded work; the batched path mirrors
  * `mapInPandas`' record-batch shape so a vectorized decoder drops in.
  */
object Multimodal {

  val FeatureDim = 8
  private val Denom = 1152921504606846976.0 // 2^60

  /** Binary payload column + typed metadata. Stand-in payload: the UTF-8
    * bytes of `documents.text` (a real pipeline reads image bytes from
    * parquet into exactly this shape: binary + meta struct). */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      lit("text").as("modality"),
      col("text").cast("binary").as("bytes"),
      struct(length(col("text").cast("binary")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** STUB decode as a Column expression: k features in [0,1) derived from
    * hash60(i ':' md5(bytes)) — deterministic, portable, zero-shuffle.
    * Replace with a real decoder via [[decodeBatched]]. */
  def featureStub(bytes: Column, k: Int = FeatureDim): Column = {
    val h = md5(bytes)
    transform(sequence(lit(0), lit(k - 1)), i =>
      (conv(substring(md5(concat(i.cast("string"), lit(":"), h)), 1, 15), 16, 10)
        .cast("long").cast("double") / Denom))
  }

  /** The same stub as a JVM function — the slot where a REAL image/audio
    * decoder (`???` in spirit) plugs in. Must stay deterministic per byte
    * array for replay parity. */
  def stubDecode(bytes: Array[Byte], k: Int = FeatureDim): Array[Double] = {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val h = md5hex(bytes)
    (0 until k).map { i =>
      java.lang.Long.parseLong(md5hex(s"$i:$h".getBytes("UTF-8")).substring(0, 15), 16)
        .toDouble / Denom
    }.toArray
  }

  /** Batched decode over (id, bytes) — the `mapInPandas` batch shape in
    * Scala: each partition's rows are processed in fixed-size record
    * batches (a vectorized decoder would decode a whole batch at once).
    * Returns (id, features). */
  def decodeBatched(ds: Dataset[(Long, Array[Byte])], batchSize: Int = 64,
      decode: Array[Byte] => Array[Double] = stubDecode(_, FeatureDim)): Dataset[(Long, Array[Double])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, b) => (id, decode(b)) }
      }
    }
  }

  // ── REAL image codec path (round 12) ─────────────────────────────────
  // The container has no external image libraries, but the JDK itself
  // ships a PNG encoder/decoder (javax.imageio, headless-safe) — so the
  // image decode slot is no longer a stub: payloads are REAL PNG bytes
  // and features come from a REAL ImageIO decode. The oracle story stays
  // exact because PNG is LOSSLESS: the pixels are planted by a
  // closed-form formula of (doc_id, x, y), encode→decode round-trips
  // them bit-for-bit (spec-gated), and DuckDB computes the expected
  // channel means from the same formula WITHOUT decoding. Audio/video
  // codecs (lossy, no JDK decoder) keep the documented stub slot.

  val ImgW = 16
  val ImgH = 12

  // ImageIO defaults to a DISK-backed stream cache: every write/read
  // wraps its stream in a temp-FILE-cached ImageOutputStream/
  // ImageInputStream, so each of the 5k-per-query codec calls pays
  // filesystem I/O and the query's wall time couples to box disk
  // state. The payloads here are small in-memory byte arrays — switch
  // the JVM to the memory cache once, at class init (executors load
  // this object before first use; process-global, idempotent).
  // DELIBERATE GLOBAL EFFECT: any other ImageIO user in this JVM also
  // switches from disk-backed to in-memory stream caching. For graft's
  // deployment shape (executors decode small in-memory payloads) that
  // is strictly better; embedders co-hosting code that streams very
  // large images through ImageIO should scope caching per-call with
  // explicit MemoryCacheImageInput/OutputStream instances instead.
  private val _imageIoMemCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Planted pixel channels — the closed form BOTH engines evaluate.
    * floorMod, not %: Scala % follows the dividend's sign, so a negative
    * doc_id would plant negative channel values that corrupt the
    * (r<<16)|(g<<8)|b packing in [[pngEncode]] and desync from the
    * oracle's positive-mod form. */
  private def plant(id: Long, x: Int, y: Int): (Int, Int, Int) =
    (Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt,
      Math.floorMod(id * 17 + x * 11 + y * 5, 256L).toInt,
      Math.floorMod(id * 29 + x * 3 + y * 19, 256L).toInt)

  /** Ids big enough that id*73 (the largest plant multiplier) could wrap
    * Long are out of contract on BOTH codec paths: Scala would wrap
    * silently while DuckDB's BIGINT multiply errors — fail loudly here
    * instead of desyncing the engines. */
  private def checkIdRange(id: Long): Unit =
    require(math.abs(id) < (1L << 55),
      s"plant: |doc_id| $id >= 2^55 would overflow the planted closed form")

  /** A real PNG payload: BufferedImage with the planted pixels, encoded
    * by the JDK's PNG writer. Deterministic per id (PNG encoding of
    * identical pixels is identical bytes for a fixed JDK encoder). */
  def pngEncode(id: Long, w: Int = ImgW, h: Int = ImgH): Array[Byte] = {
    checkIdRange(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = plant(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode: ImageIO reads the PNG and the features are measured
    * from the DECODED pixels — (width, height, meanR, meanG, meanB).
    * Channel sums are exact integers, so the means divide exactly the
    * same on both engines. Fits [[decodeBatched]]'s decoder slot. */
  def imageFeatures(bytes: Array[Byte]): Array[Double] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "imageFeatures: undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    Array(w.toDouble, h.toDouble, sr / n, sg / n, sb / n)
  }

  // ── REAL audio codec path (round 12) ─────────────────────────────────
  // Same JDK trick as PNG: javax.sound.sampled reads/writes WAV (RIFF +
  // 16-bit PCM) with no external libraries, and PCM is lossless — so the
  // audio decode slot is also real: payloads are genuine WAV files,
  // features are measured from AudioSystem-decoded samples, and the
  // oracle computes the expected stats from the planted-sample closed
  // form. Only LOSSY codecs (jpeg-with-loss, mp3, video) remain stubbed.

  val WavN = 480
  val WavRate = 8000

  /** Planted 16-bit sample i — the closed form BOTH engines evaluate
    * (floorMod for the same negative-id safety as [[plant]]). */
  private def plantSample(id: Long, i: Int): Short =
    (Math.floorMod(id * 73 + i * 37, 4096L) - 2048).toShort

  /** A real WAV payload: planted PCM through the JDK's WAVE writer. */
  def wavEncode(id: Long, n: Int = WavN, rate: Int = WavRate): Array[Byte] = {
    checkIdRange(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = plantSample(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL decode: AudioSystem parses the WAV and the features are
    * measured from the DECODED samples — (rate, nSamples, meanAbs,
    * maxAbs). Sums are exact integers. Fits [[decodeBatched]]. */
  def audioFeatures(bytes: Array[Byte]): Array[Double] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"audioFeatures: expected 16-bit mono little-endian PCM, got $fmt")
    val pcm = ais.readAllBytes()
    val n = pcm.length / 2
    var sumAbs = 0L; var maxAbs = 0L
    var i = 0
    while (i < n) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toLong
      val a = math.abs(s)
      sumAbs += a; if (a > maxAbs) maxAbs = a
      i += 1
    }
    Array(fmt.getSampleRate.toDouble, n.toDouble,
      if (n == 0) 0.0 else sumAbs.toDouble / n, maxAbs.toDouble)
  }

  /** Deterministic frame sampling plumbing (video/audio analog): n frames
    * of `frameBytes` at evenly spaced offsets, materialized as hex strings
    * (byte-faithful in both oracle engines). */
  def frameSample(p: DataFrame, n: Int = 4, frameBytes: Int = 16): DataFrame =
    p.withColumn("hx", hex(col("bytes")))
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
      .where(col("n_bytes") >= frameBytes)
      .withColumn("step", greatest(expr(s"(n_bytes - $frameBytes) DIV ${n - 1}"), lit(1L)))
      .selectExpr("doc_id",
        s"posexplode(transform(sequence(0, ${n - 1}), " +
          s"j -> substring(hx, CAST(j * step * 2 + 1 AS INT), ${2 * frameBytes}))) AS (frame, frame_hex)")
      .select(col("doc_id"), col("frame").cast("long").as("frame"), col("frame_hex"))
}
