package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / dedup primitives for large-scale training-data pipelines.
  * All pure Column expressions (whole-stage codegen; no UDFs): at 100 TB
  * these run inside the scan projection, shuffle only at the
  * group/join steps, and every hash is engine-portable (md5-based), so the
  * same computation is expressible in the DuckDB oracle. */
object TextFunctions {

  /** Lowercased word tokens, empty strings filtered. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => t =!= "")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A 60-bit portable hash: first 15 hex digits of md5. Same value in
    * DuckDB via ('0x' || substr(md5(x),1,15))::BIGINT. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Canonical document fingerprint: md5 of the sorted distinct token set
    * (Broder-style canonical form; robust to word order/duplication). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(distinctTokens(text))))

  /** Word n-gram shingles ("a b c" strings). Empty when fewer than n tokens. */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Jaccard similarity of two arrays (as sets). The repeated intersect is
    * eliminated by whole-stage-codegen subexpression elimination
    * (ArrayIntersect is codegen'd — never lands in the interpreted path). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a); val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val uni = (size(da) + size(db)).cast("double") - size(array_intersect(da, db))
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  // ── quality metrics ──────────────────────────────────────────────────────

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
      .otherwise(lit(0.0))
  }

  val stopwordsEn = Seq("the", "and", "of", "to", "in", "a", "is", "it", "on", "for")

  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0, stopwordCount(t, stopwordsEn).cast("double") / size(t))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punct/digit noise and a natural stopword rate (heuristic weights). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punct = punctRatio(text)
    val digit = digitRatio(text)
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    greatest(least(
      lenScore * 0.4 + stop * 0.3 + (lit(1.0) - punct) * 0.2 + (lit(1.0) - digit) * 0.1,
      lit(1.0)), lit(0.0))
  }

  // ── language ID (n-gram/stopword heuristic) ─────────────────────────────

  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men"))

  /** Best-scoring language by stopword hits; ties resolve in the fixed
    * order above; no hits at all → "und" (undetermined). */
  def langGuess(text: Column): Column = {
    val t = tokens(text)
    val scores = langStopwords.map { case (l, ws) => l -> stopwordCount(t, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), rest) =>
      when(s === best && best > 0, lit(l)).otherwise(rest)
    }
  }
}
