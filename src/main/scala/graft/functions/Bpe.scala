package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer: distributed word-count training corpus,
  * driver-side merge loop (the model), distributed encode over the
  * DISTINCT-WORD table.
  *
  * Recipe: Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of
  * Rare Words with Subword Units") — the standard subword trainer every
  * LLM data pipeline runs downstream of dedup/quality filtering. The
  * reference engine has no tokenizer-training surface (its text ops stop
  * at token streams, cf. `crates/wingfoil/src/ops.rs`); this op is part of
  * the training-data-pipeline extension the build mandates.
  *
  * Scale shape (100 TB): BPE training state is a WORD-FREQUENCY table, not
  * the corpus — `wordCounts` is one codegen'd hash aggregate whose exchange
  * carries (word, count) pairs after map-side combine (Heaps' law: the
  * distinct-word table grows ~n^0.5 of the corpus). The trainer collects
  * only the top-`maxWords` rows by frequency (TakeOrderedAndProject — each
  * partition ships at most `maxWords` rows, never a global sort), bounded
  * by [[BpeMaxTrainWords]] exactly like the ANN side's
  * [[Similarity.QuantizerModelMaxDoubles]]: the capped table IS the model
  * input, and truncating the low-frequency tail is the published practice
  * (rare words fall back to character merges). The merge LOOP is inherently
  * global-sequential (each round's argmax depends on the last round's
  * merge), so it runs on the driver over the capped table with incremental
  * pair bookkeeping — O(affected-word length) per round, not O(table) —
  * and the resulting [[BpeModel]] is a few thousand string pairs that
  * broadcast to executors inside the encode closure. Encoding never maps
  * the corpus row-by-row: [[encodeWordTable]] encodes each DISTINCT word
  * once and the caller broadcast-joins the result back to token counts,
  * so the corpus-side cost is the same hash aggregate the trainer ran.
  */
object Bpe {

  /** End-of-word marker appended as a standalone symbol (Sennrich §3.2's
    * `</w>`): '<', '/', '>' are non-`\w`, so the marker can never collide
    * with corpus characters produced by the `\W+` tokenizer. */
  val EndMark = "</w>"

  /** Byte-level pretokenization regex (GPT-2 lineage, simplified): each
    * match is either a non-space run with its single leading space
    * attached (" word" — the boundary rides INSIDE the token) or a
    * leftover whitespace run. Leftmost-greedy in both Java regex and
    * RE2, so Spark's regexp_extract_all and DuckDB's agree, and
    * concatenating the pretokens reconstructs the text EXACTLY — no
    * pretokenization loss (case, punctuation, unicode, every space all
    * preserved), unlike the `\W+` word mode. */
  val BytePretokenRegex = """ ?\S+|\s+"""

  /** Driver-side cap on the trainable word table (rows). 1M words ×
    * ~10 chars ≈ tens of MB on the driver — the same loud-require
    * discipline as the quantizer model caps. */
  val BpeMaxTrainWords: Int = 1 << 20

  final case class Merge(rank: Int, lhs: String, rhs: String, freq: Long)

  /** Byte-level bootstrap: the pretoken's UTF-8 bytes as lowercase
    * hex-pair symbols ("he" → ["68","65"]). No [[EndMark]] — the word
    * boundary is already in the token (the leading space byte "20").
    * Hex pairs are `\w`-only and space-free, so the oracle's
    * space-delimited list_reduce replay carries over unchanged. */
  /** JVM twin of the [[BytePretokenRegex]] Column chain — the byte-mode
    * analog of TextFunctions.tokensJvm, for per-arrival streaming
    * encode (BpeStream) where no Column pipeline runs. */
  def pretokensJvm(text: String): Array[String] =
    if (text == null) Array.empty
    else BytePretokenRegex.r.findAllIn(text).toArray

  def byteSyms(w: String): Array[String] = {
    val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bs.length)
    var i = 0
    while (i < bs.length) { out(i) = f"${bs(i) & 0xff}%02x"; i += 1 }
    out
  }

  private def isHexPair(s: String): Boolean =
    s.length == 2 && s.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))

  /** Ordered merge table. Encoding applies merges lowest-rank-first,
    * leftmost-nonoverlapping — identical to replaying the training
    * rounds in order ([[replayWord]]) UNDER TWO MODEL-ONLY
    * PRECONDITIONS, machine-checked by [[replayExact]]:
    *
    *  1. **derivable operands**: each merge's lhs/rhs is a single char,
    *     [[EndMark]], or the output of an earlier-rank merge (trained
    *     models satisfy this by construction — a pair can only be
    *     counted between symbols that exist); and
    *  2. **injective outputs**: no two merges concatenate to the same
    *     string. Symbols are STRINGS, so two distinct merges can
    *     produce the same text — (a,ab) and (aa,b) both yield "aab" —
    *     and then a later-rank merge re-creates a symbol that
    *     participates in an earlier-rank pair, which greedy encode
    *     applies but the ordered replay (and the DuckDB e-chain
    *     oracle) would not.
    *
    * Under (1), any new adjacency created by merge k involves merge
    * k's own output symbol; under (2), that output string cannot equal
    * any operand of an earlier-rank pair (that operand would be a
    * char, EndMark, or a DIFFERENT merge's identical output) — so no
    * earlier-rank pair ever reappears after its round, and the greedy
    * min-rank encode consumes merges in exactly replay order.
    * BpeSpec's adversarial golden exhibits the divergence when (1) is
    * violated; queries whose oracle replays the merge chain
    * (doc_bpe_encode/doc_bpe_oov) `require(replayExact)` so a model
    * that escapes the preconditions fails loudly, never silently
    * desyncing the engines. */
  final case class BpeModel(merges: IndexedSeq[Merge], byteLevel: Boolean = false) {
    @transient private lazy val rank: Map[(String, String), Int] =
      merges.iterator.map(m => (m.lhs, m.rhs) -> m.rank).toMap

    private def bootstrap(w: String): Array[String] =
      if (byteLevel) byteSyms(w) else charSyms(w)

    /** Greedy min-rank BPE segmentation of one word ([[charSyms]] +
      * [[EndMark]] bootstrap, or [[byteSyms]] when `byteLevel`). */
    def encodeWord(w: String): Array[String] = {
      var s: Array[String] = bootstrap(w)
      var done = s.length < 2
      while (!done) {
        var bi = Int.MaxValue
        var bl: String = null; var br: String = null
        var j = 0
        while (j < s.length - 1) {
          rank.get((s(j), s(j + 1))).foreach { i =>
            if (i < bi) { bi = i; bl = s(j); br = s(j + 1) }
          }
          j += 1
        }
        if (bl == null) done = true
        else { s = mergePair(s, bl, br); done = s.length < 2 }
      }
      s
    }

    /** Single-pass rank-order replay — the DuckDB e-chain's semantics:
      * each merge applied once, lowest rank first, leftmost-
      * nonoverlapping. Equals [[encodeWord]] iff [[replayExact]]. */
    def replayWord(w: String): Array[String] = {
      var s: Array[String] = bootstrap(w)
      merges.foreach { m => if (s.length >= 2) s = mergePair(s, m.lhs, m.rhs) }
      s
    }

    /** Machine check of the two preconditions under which greedy
      * min-rank encode == rank-order replay (see the class scaladoc):
      * every operand is a char / [[EndMark]] / an earlier merge's
      * output, and no two merges produce the same output string.
      * Model-only — O(|merges|), no corpus access. */
    def replayExact: Boolean = {
      val outs = new mutable.HashSet[String]
      var ok = true
      merges.foreach { m =>
        // base symbols: single chars + the marker (word mode) or hex
        // pairs (byte mode); outputs concatenate >= 2 base symbols so
        // they can never masquerade as a base symbol themselves
        def derivable(sym: String): Boolean =
          (if (byteLevel) isHexPair(sym)
           else sym.length == 1 || sym == EndMark) || outs.contains(sym)
        ok &&= derivable(m.lhs) && derivable(m.rhs)
        ok &&= (m.lhs + m.rhs) != EndMark // an output aliasing the marker
        ok &&= outs.add(m.lhs + m.rhs) // false = duplicate output string
      }
      ok
    }
  }

  private def charSyms(w: String): Array[String] = {
    val out = new Array[String](w.length + 1)
    var i = 0
    while (i < w.length) { out(i) = w.substring(i, i + 1); i += 1 }
    out(w.length) = EndMark
    out
  }

  /** One merge pass: leftmost-nonoverlapping replacement of the adjacent
    * pair (l, r) with the concatenated symbol — [a,a,a] under (a,a)
    * becomes [aa, a], matching the oracle's list_reduce replay. */
  private[graft] def mergePair(s: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == l && s(j + 1) == r) { out += l + r; j += 2 }
      else { out += s(j); j += 1 }
    }
    out.toArray
  }

  /** (word, cnt) table for a (…, text) frame: the one corpus-sized
    * aggregate in the family (map-side combined; the exchange carries
    * distinct words per partition, never token instances). */
  def wordCounts(doc: DataFrame): Column => DataFrame = { textCol =>
    doc.select(explode(TextFunctions.tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
  }

  /** Byte-mode twin of [[wordCounts]]: (pretoken, cnt) under the
    * lossless [[BytePretokenRegex]] — same one-corpus-scan map-side-
    * combined hash aggregate, but case/whitespace/punctuation survive
    * into the vocabulary (the property byte-level BPE exists for). */
  def pretokenCounts(doc: DataFrame): Column => DataFrame = { textCol =>
    doc.select(explode(regexp_extract_all(textCol,
        lit(BytePretokenRegex), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
  }

  /** Driver merge loop over a capped (word, cnt) array. Pair counts follow
    * Sennrich's get_stats: every adjacent POSITION counts (overlapping
    * runs included), weighted by word frequency; ties break on
    * (freq desc, lhs asc, rhs asc) — the deterministic order the oracle
    * replays as `ORDER BY f DESC, pair ASC` (space sorts below `\w`).
    * Incremental bookkeeping: each round touches only the words that
    * contain the chosen pair. */
  def train(wc: Array[(String, Long)], nMerges: Int,
      bootstrap: String => Array[String] = charSyms): IndexedSeq[Merge] = {
    require(wc.forall(_._2 > 0L), "bpe.train: word counts must be positive")
    val words: Array[Array[String]] = wc.map(t => bootstrap(t._1))
    val counts: Array[Long] = wc.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    // inverted index pair -> word indices. A plain append list, NOT a
    // BitSet: BitSets are dense in the INDEX space (one high-index word
    // costs maxIdx/8 bytes per pair), while total list entries are
    // bounded by total pair positions ~ vocab x avg word length.
    // Entries can repeat (a pair occurring twice in one word) and go
    // stale as words mutate; the apply loop re-verifies before use and
    // mergePair removes ALL occurrences, so re-visits are no-ops.
    val pairWords = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]

    def addPairs(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val nc = pairCount.getOrElse(p, 0L) + sign * counts(i)
        if (nc == 0L) pairCount.remove(p) else pairCount(p) = nc
        if (sign > 0) {
          val b = pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty[Int])
          if (b.isEmpty || b.last != i) b += i
        }
        j += 1
      }
    }
    words.indices.foreach(addPairs(_, 1L))

    val merges = mutable.ArrayBuffer.empty[Merge]
    var r = 0
    while (r < nMerges && pairCount.nonEmpty) {
      var bl: String = null; var br: String = null; var bf = -1L
      pairCount.foreach { case ((l, rr), f) =>
        if (f > bf || (f == bf && (l < bl || (l == bl && rr < br)))) {
          bl = l; br = rr; bf = f
        }
      }
      merges += Merge(r + 1, bl, br, bf)
      // stale/duplicate indices are re-verified before use (see above)
      val affected = pairWords.remove((bl, br))
        .getOrElse(mutable.ArrayBuffer.empty[Int])
      affected.foreach { i =>
        val s = words(i)
        var has = false
        var j = 0
        while (!has && j < s.length - 1) { has = s(j) == bl && s(j + 1) == br; j += 1 }
        if (has) {
          addPairs(i, -1L)
          words(i) = mergePair(s, bl, br)
          addPairs(i, 1L)
        }
      }
      r += 1
    }
    merges.toIndexedSeq
  }

  /** End-to-end trainer: word-count aggregate → top-`maxWords` by
    * (cnt desc, word asc) via TakeOrderedAndProject → driver merge loop. */
  def trainFromCorpus(doc: DataFrame, textCol: Column, nMerges: Int,
      maxWords: Int = BpeMaxTrainWords): BpeModel =
    trainFromCorpusWithVocab(doc, textCol, nMerges, maxWords)._1

  /** [[trainFromCorpus]] plus the capped (word, cnt) table the merges
    * were trained on — the full tokenizer artifact (merges AND vocab,
    * the pair every published tokenizer format ships), so vocabulary-
    * membership checks (OOV rates, coverage reports) never re-scan the
    * corpus: the vocab is driver-resident model output by construction. */
  def trainFromCorpusWithVocab(doc: DataFrame, textCol: Column, nMerges: Int,
      maxWords: Int = BpeMaxTrainWords): (BpeModel, Array[(String, Long)]) = {
    val top = cappedTop(wordCounts(doc)(textCol), maxWords)
    (BpeModel(train(top, nMerges)), top)
  }

  /** Byte-level end-to-end trainer: pretoken-count aggregate →
    * top-`maxWords` TakeOrderedAndProject → driver merge loop over
    * hex-pair byte symbols. Identical scale shape to the word trainer —
    * only the bootstrap and the (lossless) pretokenizer differ. */
  def trainFromCorpusBytes(doc: DataFrame, textCol: Column, nMerges: Int,
      maxWords: Int = BpeMaxTrainWords): BpeModel = {
    val top = cappedTop(pretokenCounts(doc)(textCol), maxWords)
    BpeModel(train(top, nMerges, byteSyms), byteLevel = true)
  }

  private def cappedTop(wc: DataFrame, maxWords: Int): Array[(String, Long)] = {
    require(maxWords > 0 && maxWords <= BpeMaxTrainWords,
      s"bpe: maxWords=$maxWords outside (0, $BpeMaxTrainWords] — the trainable " +
        "word table is driver-resident model input; raise the cap consciously " +
        "or pre-aggregate a coarser vocabulary")
    wc.orderBy(desc("cnt"), asc("word")).limit(maxWords)
      .collect().map(row => (row.getString(0), row.getLong(1)))
  }

  /** Encode a (word) frame: adds `syms` (the BPE segmentation) and
    * `n_syms`. The model rides the closure (bounded by construction);
    * callers join this DISTINCT-word frame back to per-doc token counts —
    * broadcast-sized whenever the vocabulary is, which is the regime the
    * trainer cap enforces. */
  def encodeWordTable(words: DataFrame, model: BpeModel): DataFrame = {
    val enc = udf((w: String) => model.encodeWord(w))
    words.withColumn("syms", enc(col("word")))
      .withColumn("n_syms", size(col("syms")))
  }
}
