package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.Dataset

/** One arriving document to score. */
final case class DocArrival(doc_id: Long, text: String)

/** One emitted importance score — the batch `doc_dsir` row shape. */
final case class DsirScore(doc_id: Long, n_feats: Long, logw: Double)

/** Streaming twin of the registry's `doc_dsir` importance scorer (the
  * third decision family with a live leg, after SemDeDup and
  * kNN-classify): the hashed-n-gram λ model is FROZEN from the batch fit
  * (QueriesPipeline.dsirFit — ≤1024 bucket→λ entries + the add-0.5
  * all-smoothing default for buckets no training gram hit), documents
  * arrive on a stream, and every micro-batch scores its arrivals with the
  * batch op's exact arithmetic: mean per-feature λ over the doc's hashed
  * unigrams+bigrams, rounded to the shared 4dp grid (Spark `round`
  * HALF_UP semantics, replicated via BigDecimal).
  *
  * Scale shape: map-ONLY — the model rides each task's closure (≤16 KB),
  * the per-arrival cost is O(#grams), and no exchange exists at all (the
  * batch op's groupBy collapses to a per-doc loop because an arrival's
  * features never leave its row). That is the natural production form:
  * score today's crawl as it lands, at scan parallelism, no state. The
  * gram→hash chain is [[TextFunctions.ngramHashesJvm]] — the same JVM
  * loop the batch Column path is spec-pinned to, so tokenizer drift
  * between the legs is impossible. */
object DsirStream {

  /** arrivals → one [[DsirScore]] per doc with ≥1 feature (the batch op
    * drops zero-token docs the same way: explode emits no rows). */
  def scores(arrivals: Dataset[DocArrival],
      lam: Map[Long, Double], lamDefault: Double): Dataset[DsirScore] = {
    val spark = arrivals.sparkSession
    import spark.implicits._
    val b = graft.QueriesPipeline.DsirBuckets
    arrivals.flatMap { a =>
      val hs = TextFunctions.ngramHashesJvm(a.text, 1) ++
        TextFunctions.ngramHashesJvm(a.text, 2)
      if (hs.isEmpty) Iterator.empty
      else {
        var s = 0.0
        var i = 0
        while (i < hs.length) {
          s += lam.getOrElse(java.lang.Math.floorMod(hs(i), b), lamDefault)
          i += 1
        }
        val v = java.math.BigDecimal.valueOf(s / hs.length + 1e-9)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        Iterator.single(DsirScore(a.doc_id, hs.length.toLong, v))
      }
    }
  }
}
