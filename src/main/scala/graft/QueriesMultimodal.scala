package graft

import graft.Queries.Q
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-plumbing queries under the CORRECTNESS gate: even with the
  * decode stubbed (no media libs in-container), the payload schema, the
  * feature projection, and the frame-sampling arithmetic are real and
  * oracle-verified byte-for-byte. */
object QueriesMultimodal {

  private def r4(c: org.apache.spark.sql.Column) = round(c + lit(1e-9), 4)

  val entries: Seq[(String, Q)] = Seq(

    "mm_features" -> Q(
      (s, d) => {
        val p = Multimodal.payloads(Tables.documents(s, d))
        p.withColumn("fv", Multimodal.featureStub(col("bytes")))
          .select(col("doc_id"),
            col("meta.n_bytes").cast("long").as("n_bytes"),
            r4(element_at(col("fv"), 1)).as("f0"),
            r4(aggregate(col("fv"), lit(0.0), (a, x) => a + x) / Multimodal.FeatureDim).as("f_mean"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id, md5(text) AS h,
             |    octet_length(encode(text)) AS n_bytes FROM documents),
             |f AS (SELECT doc_id, n_bytes,
             |    list_transform(range(8), i ->
             |      ('0x' || substr(md5(i::VARCHAR || ':' || h),1,15))::BIGINT
             |        / 1152921504606846976.0) AS fv
             |  FROM p)
             |SELECT doc_id, n_bytes, round(1e-9 + fv[1],4) AS f0,
             |  round(1e-9 + list_sum(fv)/8.0,4) AS f_mean
             |FROM f ORDER BY 1""".stripMargin)),

    "mm_frame_sample" -> Q(
      (s, d) => Multimodal.frameSample(
        Multimodal.payloads(Tables.documents(s, d)), n = 4, frameBytes = 16)
        .orderBy("doc_id", "frame"),
      Some("""WITH p AS (SELECT doc_id, hex(encode(text)) AS hx,
             |    octet_length(encode(text)) AS n_bytes FROM documents),
             |f AS (SELECT doc_id, greatest((n_bytes - 16) // 3, 1) AS step, hx
             |  FROM p WHERE n_bytes >= 16),
             |x AS (SELECT doc_id, j AS frame,
             |    substring(hx, (j*step*2+1)::INT, 32) AS frame_hex
             |  FROM f, (SELECT unnest(range(4)) AS j))
             |SELECT doc_id, frame, frame_hex FROM x ORDER BY 1,2""".stripMargin))
  )
}
