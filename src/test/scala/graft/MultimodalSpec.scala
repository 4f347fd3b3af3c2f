package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Plumbing gates for the multimodal module: payload schema, stub
  * determinism across both implementations (Column expression vs the
  * batched JVM slot where a real decoder plugs in), batch-shape
  * preservation, frame arithmetic. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("payload schema: binary bytes + typed metadata") {
    val p = Multimodal.payloads(docs)
    val f = p.schema("bytes")
    assert(f.dataType.typeName == "binary")
    assert(p.schema("meta").dataType.typeName == "struct")
    val r = p.select(col("meta.n_bytes"), length(col("bytes"))).head
    assert(r.getInt(0) == r.getInt(1))
  }

  test("column-expression stub == batched JVM stub (the decoder contract)") {
    val p = Multimodal.payloads(docs).limit(50)
    val viaExpr = p.select(col("doc_id"), Multimodal.featureStub(col("bytes")).as("fv"))
      .as[(Long, Seq[Double])].collect().toMap
    val viaBatch = Multimodal.decodeBatched(
      p.select(col("doc_id"), col("bytes")).as[(Long, Array[Byte])], batchSize = 7)
      .collect().toMap
    assert(viaExpr.keySet == viaBatch.keySet)
    viaExpr.foreach { case (id, fv) =>
      fv.zip(viaBatch(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-15, s"doc $id: expression and JVM stub must agree")
      }
    }
  }

  test("batched decode preserves rows and order within partitions") {
    val ds = (1L to 100L).map(i => (i, s"payload-$i".getBytes("UTF-8"))).toDS().repartition(4)
    val out = Multimodal.decodeBatched(ds, batchSize = 9).collect()
    assert(out.length == 100)
    assert(out.map(_._1).toSet == (1L to 100L).toSet)
    assert(out.forall(_._2.length == Multimodal.FeatureDim))
    assert(out.forall(_._2.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("frame sampling: n frames, even offsets, byte-faithful hex") {
    val one = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789", "s"))
      .toDF("doc_id", "text", "source")
    val frames = Multimodal.frameSample(Multimodal.payloads(one), n = 4, frameBytes = 16)
      .orderBy("frame").as[(Long, Long, String)].collect()
    assert(frames.length == 4)
    // 36 bytes, step = (36-16)/3 = 6 -> offsets 0,6,12,18
    val txt = "abcdefghijklmnopqrstuvwxyz0123456789"
    frames.zipWithIndex.foreach { case ((_, fi, hx), i) =>
      val exp = txt.slice(i * 6, i * 6 + 16).getBytes("UTF-8").map("%02X".format(_)).mkString
      assert(fi == i && hx == exp, s"frame $i slice mismatch")
    }
    // too-short payloads are excluded, not crashed
    val short = Seq((2L, "tiny", "s")).toDF("doc_id", "text", "source")
    assert(Multimodal.frameSample(Multimodal.payloads(short)).count() == 0)
  }

  test("PNG codec round-trip is lossless pixel-for-pixel (the real-decode oracle rests on it)") {
    // mm_png_decode's oracle computes expected features from the planted
    // pixel formula WITHOUT decoding — valid only if encode→decode
    // round-trips every pixel exactly. Check all pixels of several ids,
    // plus the payload being a genuine PNG (magic bytes), plus encode
    // determinism (same id ⇒ same bytes).
    // -5L: a negative doc_id must plant VALID channels (floorMod — Scala %
    // would plant negatives that corrupt the RGB packing, ADVICE r12)
    for (id <- Seq(0L, 7L, -5L, 123456789L)) {
      val bytes = Multimodal.pngEncode(id)
      assert(bytes.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt),
        "payload must be a real PNG")
      assert(bytes.sameElements(Multimodal.pngEncode(id)), "encode must be deterministic")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW) {
        val p = img.getRGB(x, y)
        val er = Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
        val eg = Math.floorMod(id * 17 + x * 11 + y * 5, 256L).toInt
        val eb = Math.floorMod(id * 29 + x * 3 + y * 19, 256L).toInt
        assert(((p >> 16) & 0xff) == er && ((p >> 8) & 0xff) == eg && (p & 0xff) == eb,
          s"pixel ($x,$y) of id $id did not round-trip")
      }
      val f = Multimodal.imageFeatures(bytes)
      assert(f.length == 5 && f(0) == Multimodal.ImgW && f(1) == Multimodal.ImgH)
    }
    // ids big enough to overflow the planted product fail loudly on both
    // codec paths instead of silently desyncing from the oracle
    intercept[IllegalArgumentException](Multimodal.pngEncode(1L << 60))
    intercept[IllegalArgumentException](Multimodal.wavEncode(-(1L << 60)))
  }

  test("WAV codec round-trip is lossless sample-for-sample") {
    // mm_wav_decode's oracle computes expected stats from the planted
    // PCM closed form — valid only if the JDK WAVE write→read
    // round-trips every 16-bit sample exactly
    for (id <- Seq(0L, 7L, -5L, 987654321L)) {
      val bytes = Multimodal.wavEncode(id)
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
        new String(bytes.slice(8, 12), "US-ASCII") == "WAVE",
        "payload must be a real RIFF/WAVE file")
      assert(bytes.sameElements(Multimodal.wavEncode(id)), "encode must be deterministic")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcm = ais.readAllBytes()
      assert(pcm.length == Multimodal.WavN * 2, "every sample survives")
      for (i <- 0 until Multimodal.WavN) {
        val got = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort
        val exp = (Math.floorMod(id * 73 + i * 37, 4096L) - 2048).toShort
        assert(got == exp, s"sample $i of id $id did not round-trip: $got != $exp")
      }
      val f = Multimodal.audioFeatures(bytes)
      assert(f.length == 4 && f(0) == Multimodal.WavRate && f(1) == Multimodal.WavN)
    }
  }
}
