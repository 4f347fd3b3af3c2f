package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal payload plumbing for training-data pipelines: image/audio/
  * video ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction / frame-sampling are projections or batched
  * mapPartitions over the bytes.
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * libraries — with a deterministic md5-derived feature map, so the whole
  * pipeline (schema, partitioning, batch shape, oracle) is real and
  * testable; swap [[Multimodal.stubDecode]] for a real decoder and nothing
  * else changes. The stub is engine-portable (md5), so even the fake
  * features are DuckDB-oracle-gated.
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
