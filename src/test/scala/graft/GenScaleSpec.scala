package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The scale-test generator's structural contract (COVERAGE round-7 scale
  * check): replication must preserve within-replica near-dup/neighbor
  * structure EXACTLY and create NO cross-replica similarity — otherwise a
  * 10× run measures replication artifacts, not the algorithms. */
class GenScaleSpec extends SparkSuite {
  import spark.implicits._

  test("document replicas are a vocabulary isomorphism: within-Jaccard preserved, cross-Jaccard 0") {
    val docs = Seq(
      (0L, "the quick brown fox jumps", "en", "s0"),
      (1L, "the quick brown cat jumps", "en", "s0"), // near-dup of 0
      (2L, "completely different words here", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val scaled = GenScale.scaleDocuments(docs, 2)
    assert(scaled.count() == 6 && scaled.select("doc_id").distinct().count() == 6)
    val toks = scaled.select(col("doc_id"),
        TextFunctions.distinctTokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    def jac(a: Seq[String], b: Seq[String]): Double = {
      val (sa, sb) = (a.toSet, b.toSet)
      if ((sa ++ sb).isEmpty) 0.0 else (sa & sb).size.toDouble / (sa ++ sb).size
    }
    // token bijection ⇒ within-replica Jaccard is exactly the source's
    assert(jac(toks(3L), toks(4L)) == jac(toks(0L), toks(1L)),
      "replica 1 must preserve the near-dup relation of its source pair")
    // disjoint vocabularies ⇒ every cross-replica Jaccard is 0
    for (a <- 0L to 2L; b <- 3L to 5L)
      assert(jac(toks(a), toks(b)) == 0.0, s"cross-replica $a-$b must share no tokens")
  }

  test("fixedSources holds the eval split at replica-0 size while the corpus replicates") {
    // the production-shaped contamination decade (round 16): an eval
    // suite is constant while the crawl grows, so the generator must
    // keep fixed sources un-replicated AND un-suffixed (replica-0 rows
    // pass through verbatim - their shingles still hit the corpus's
    // replica-0 rows, nothing else)
    val docs = Seq(
      (0L, "corpus words one", "en", "s0"),
      (1L, "corpus words two", "en", "s1"),
      (2L, "eval item text", "en", "src19"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val scaled = GenScale.scaleDocuments(docs, 3, fixedSources = Set("src19"))
    val bySrc = scaled.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("s0") == 3 && bySrc("s1") == 3 && bySrc("src19") == 1,
      s"corpus sources replicate 3x, the fixed source stays 1x: $bySrc")
    val evalText = scaled.where(col("source") === "src19")
      .select("text").as[String].collect()
    assert(evalText.toSeq == Seq("eval item text"),
      "the fixed source's replica-0 row passes through verbatim (no suffix)")
    assert(scaled.select("doc_id").distinct().count() == scaled.count(),
      "ids stay disjoint under partial replication")
  }

  test("fixedSources/fixedLabels typos fail loudly instead of silently replicating the eval split") {
    // r16 advisor: a typo'd name ("src_19") no-ops — the run replicates
    // the eval split anyway while LABELED production-shaped, exactly the
    // super-linear artifact the flag removes. Both generators validate.
    val docs = Seq((0L, "corpus words", "en", "s0"),
      (1L, "eval item", "en", "src19"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val e1 = intercept[IllegalArgumentException] {
      GenScale.scaleDocuments(docs, 2, fixedSources = Set("src_19"))
    }
    assert(e1.getMessage.contains("src_19") && e1.getMessage.contains("src19"),
      s"message must name the typo and the present sources: ${e1.getMessage}")
    val embs = Seq((0L, Seq(1.0f, 0.0f), 1), (1L, Seq(0.0f, 1.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val e2 = intercept[IllegalArgumentException] {
      GenScale.scaleEmbeddings(embs, 2, fixedLabels = Set(7))
    }
    assert(e2.getMessage.contains("7") && e2.getMessage.contains("9"),
      s"message must name the typo'd label and the present ones: ${e2.getMessage}")
  }

  test("fixedLabels holds the emb eval split at replica-0 size while the corpus replicates") {
    // embedding twin of the fixedSources contract (r16 verdict item 6):
    // the emb_decontam family's eval split is label=9 — production-shaped
    // decades grow the corpus only, eval rows pass through verbatim
    val embs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 2),
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val scaled = GenScale.scaleEmbeddings(embs, 3, fixedLabels = Set(9))
    val byLabel = scaled.groupBy("label").count().as[(Int, Long)].collect().toMap
    assert(byLabel(1) == 3 && byLabel(2) == 3 && byLabel(9) == 1,
      s"corpus labels replicate 3x, the fixed label stays 1x: $byLabel")
    val evalVec = scaled.where(col("label") === 9)
      .select("embedding").as[Seq[Float]].collect()
    assert(evalVec.toSeq == Seq(Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      "the fixed label's replica-0 row passes through verbatim (identity isometry)")
    assert(scaled.select("vec_id").distinct().count() == scaled.count(),
      "ids stay disjoint under partial replication")
  }

  test("heapsVocab: vocabulary grows ~sqrt(factor) while rows grow factor-x; groups disjoint, within-group identical") {
    // round 20 (r19 verdict #6): the default mode's linear vocab growth
    // is the lm-ppl model trade's ADVERSARIAL case; Heaps' law (vocab ~
    // n^0.5) is the regime the 100 TB argument targets. Contract:
    //  - rows still grow factor×,
    //  - distinct tokens grow as 1 + m groups, m = round(√(factor-1)),
    //  - suffix groups stay pairwise token-disjoint (the `_` proof),
    //  - same-group replicas are token-identical (the documented,
    //    deliberate duplicate-cluster caveat — lm families only).
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "s0"),
      (1L, "delta epsilon", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val factor = 10 // m = round(sqrt(9)) = 3 suffix groups + identity
    val scaled = GenScale.scaleDocuments(docs, factor, heapsVocab = true)
    assert(scaled.count() == 2L * factor, "rows grow factor-x")
    val srcVocab = 5L
    val vocab = scaled.select(explode(TextFunctions.distinctTokens(col("text"))))
      .distinct().count()
    assert(vocab == srcVocab * (1 + 3),
      s"vocab = source x (identity + 3 groups): $vocab")
    // default mode at the same factor: every replica a fresh vocabulary
    val vocabLin = GenScale.scaleDocuments(docs, factor)
      .select(explode(TextFunctions.distinctTokens(col("text"))))
      .distinct().count()
    assert(vocabLin == srcVocab * factor, s"default mode stays linear: $vocabLin")
    // same-group replicas are token-identical text: 10 replicas over 4
    // distinct text-images of doc 0
    val texts = scaled.where(col("doc_id") % 2 === 0)
      .select("text").distinct().count()
    assert(texts == 4, s"doc-0 images: identity + 3 suffix groups: $texts")
    // cross-GROUP disjointness still holds: doc 0's four distinct
    // text-images (identity, q0, q1, q2) are pairwise token-disjoint
    val images = scaled.where(col("doc_id") % 2 === 0)
      .select(TextFunctions.distinctTokens(col("text")))
      .distinct().as[Seq[String]].collect().map(_.toSet)
    for (a <- images; b <- images if a != b)
      assert(a.intersect(b).isEmpty,
        s"distinct text-images of the same doc share no tokens: $a vs $b")
  }

  test("suffix delimiter defeats vocabulary aliasing: a source token ending in 'q1' stays disjoint") {
    // the round-7 scheme suffixed bare "q1": source token "xq1" == replica-1
    // image of "x", so cross-replica Jaccard > 0. The delimiter ("_",
    // asserted absent from the corpus) makes the token map injective
    // ACROSS replicas unconditionally.
    val docs = Seq(
      (0L, "x xq1 shared", "en", "s0"),
      (1L, "y xq1 shared", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val toks = GenScale.scaleDocuments(docs, 2)
      .select(col("doc_id"), TextFunctions.distinctTokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    for (a <- 0L to 1L; b <- 2L to 3L)
      assert(toks(a).toSet.intersect(toks(b).toSet).isEmpty,
        s"cross-replica $a-$b must share no tokens even when the source vocabulary ends in q1")
    // and a corpus already containing the delimiter is rejected, not silently aliased
    val dirty = Seq((0L, s"tok${GenScale.TokenDelim}q1", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    assertThrows[IllegalArgumentException](GenScale.scaleDocuments(dirty, 2))
  }

  test("embedding replicas are an isometry: within-cosine preserved, ids disjoint") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.5f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.5f), 0),
      (2L, Array(0.0f, 1.0f, 0.3f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val scaled = GenScale.scaleEmbeddings(e, 2)
    assert(scaled.count() == 6 && scaled.select("vec_id").distinct().count() == 6)
    val vs = scaled.select(col("vec_id"),
        graft.functions.Similarity.toDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(vs.values.forall(_.length == 4), "rotation preserves dimension")
    assert(math.abs(cos(vs(3L), vs(4L)) - cos(vs(0L), vs(1L))) < 1e-12,
      "a circular rotation is an isometry: within-replica cosines unchanged")
  }

  test("factor beyond the rotation period: sign flips keep transforms distinct, still isometric") {
    // dim=4, gcd(7,4)=1 ⇒ rotation period 4: under the round-7
    // pure-rotation scheme replica 4 would repeat replica 0's identity
    // (shift 28 mod 4 = 0), making every replica-0/4 pair an artifact
    // ANN neighbor. The sign-flip composition keeps replica 4 distinct.
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.5f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val scaled = GenScale.scaleEmbeddings(e, 6)
    assert(scaled.count() == 12 && scaled.select("vec_id").distinct().count() == 12)
    val vs = scaled.select(col("vec_id"),
        graft.functions.Similarity.toDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // every replica (including the 5 beyond the period) preserves the
    // source pair's cosine exactly — sign flips are isometries too
    for (r <- 0 to 5)
      assert(math.abs(cos(vs(2L * r), vs(2L * r + 1)) - cos(vs(0L), vs(1L))) < 1e-12,
        s"replica $r must preserve the within-pair cosine")
    // replica 4 (shift wraps to 0) must NOT alias replica 0
    assert(vs(8L) != vs(0L),
      "replica at factor > period must differ from the identity (rotation-only aliasing)")
  }

  test("event replicas shift ids disjointly and carry identical per-user series") {
    // aug_* scale rows divide wall by the k² pair count; that quotient
    // measures the matrix mechanism only if every replica user's series
    // is EXACTLY its source user's (same values, same (ts, seq) order)
    // and no two replicas share a user_id or event_id
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), 10L, "a", 1.5, "{}"),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 00:00:02"), 10L, "a", 2.5, "{}"),
      (3L, java.sql.Timestamp.valueOf("2026-01-01 00:00:01"), 20L, "b", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val scaled = GenScale.scaleEvents(ev, 3)
    assert(scaled.count() == 9)
    assert(scaled.select("user_id").distinct().count() == 6, "3 replicas x 2 users, disjoint")
    assert(scaled.select("event_id").distinct().count() == 9, "event ids stay globally unique")
    val series = scaled.orderBy("ts", "event_id")
      .select(col("user_id"), col("value"))
      .as[(Long, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val src = series(10L)
    for (r <- 1 to 2) {
      val uid = 10L + r * 21L // max user_id (20) + 1 per replica
      assert(series(uid) == src, s"replica $r of user 10 must carry the identical series")
    }
  }
}
