package graft.streaming

import graft.functions.{Bpe, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the `doc_bpe_encode` batch op: arriving documents
  * are tokenized and BPE-encoded per micro-batch under a FROZEN
  * [[Bpe.BpeModel]] — the production shape once a tokenizer ships
  * (training is a periodic batch job over the word-count table; the
  * live path only ENCODES, exactly like DsirStream's frozen-λ scoring
  * and DecontamStream's frozen eval probes).
  *
  * The leg is STATELESS: the model alone decides, so the whole twin is
  * one projection — no streaming aggregation, no watermark, no state
  * store. Where the batch op encodes the distinct-word table once and
  * broadcast-joins back (right for a corpus-sized reprocess), the
  * per-arrival form encodes each token via the closure model; the two
  * agree row-for-row because greedy min-rank encoding is a pure
  * function of (word, merges) — ParitySpec pins it across micro-batch
  * boundaries. Tokenization uses [[TextFunctions.tokensJvm]], the
  * spec-pinned JVM twin of the batch Column chain. */
object BpeStream {

  /** (doc_id, n_tok, n_bpe) per arrival; 0-token arrivals surface as
    * (0, 0) rather than vanishing (a live pipeline wants to SEE empty
    * docs — the batch op's join simply has no token rows for them). */
  def encodeCounts(docs: DataFrame, model: Bpe.BpeModel): DataFrame = {
    val f = udf { (text: String) =>
      // the tokenizer rides the model's mode: word models see the \W+
      // token chain, byte models the lossless pretokenizer — feeding a
      // byte model word tokens would silently strip the case/space
      // information the mode exists to keep
      val toks = if (model.byteLevel) Bpe.pretokensJvm(text)
                 else TextFunctions.tokensJvm(text)
      var nBpe = 0L
      toks.foreach(t => nBpe += model.encodeWord(t).length)
      (toks.length.toLong, nBpe)
    }
    docs.select(col("doc_id"), f(col("text")).as("c"))
      .select(col("doc_id"), col("c._1").as("n_tok"), col("c._2").as("n_bpe"))
  }
}
