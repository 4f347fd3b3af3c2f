package graft

import graft.functions.Bpe
import graft.functions.Bpe.{BpeModel, Merge}
import org.apache.spark.sql.functions._

/** BPE trainer/encoder goldens: the Sennrich-1 worked example by hand,
  * the overlap-counting and leftmost-nonoverlap merge contracts, the
  * encode≡training-replay equivalence on the real corpus, the frequency
  * cap, and OOV encoding. The registry entries (doc_bpe_train/_encode)
  * gate the distributed legs against the DuckDB replay. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def wc(pairs: (String, Long)*): Array[(String, Long)] = pairs.toArray

  test("trainer reproduces the hand-computed merge sequence with the (freq, pair) tie-break") {
    // corpus: low x2, lower x1, newest x3 (hand-verified):
    //   round 1: (w,e) f=4  — lower has 1, each newest has 1 (n-e-W-E-s-t)
    //   round 2: tie at 3 between (e,we),(l,o),(n,e),(s,t),(t,</w>),(we,s)
    //            -> lexicographically smallest pair (e,we)
    val m = Bpe.train(wc("low" -> 2L, "lower" -> 1L, "newest" -> 3L), 2)
    assert(m == IndexedSeq(Merge(1, "w", "e", 4L), Merge(2, "e", "we", 3L)))
  }

  test("pair counting is per-position (overlaps included); merging is leftmost-nonoverlapping") {
    // 'aaa' -> [a,a,a,</w>]: (a,a) counts 2 (positions 1 and 2), wins
    // round 1; the merge pass yields [aa,a,</w>] (leftmost first, no
    // overlap), so round 2 ties (a,</w>) vs (aa,a) at 1 -> 'a </w>' sorts
    // below 'aa a' (space < 'a') -> (a,</w>)
    val m = Bpe.train(wc("aaa" -> 1L), 2)
    assert(m == IndexedSeq(Merge(1, "a", "a", 2L), Merge(2, "a", Bpe.EndMark, 1L)))
  }

  test("encodeWord equals replaying the training merges in rank order (the equivalence the oracle rests on)") {
    val g = Tables.documents(spark, "/root/testdata/sf0.001").select("text")
    val model = Bpe.trainFromCorpus(g, col("text"), nMerges = 24)
    assert(model.merges.size == 24)
    def replay(w: String): Seq[String] = {
      var s: Array[String] = (w.map(_.toString) :+ Bpe.EndMark).toArray
      model.merges.foreach(m => s = Bpe.mergePair(s, m.lhs, m.rhs))
      s.toSeq
    }
    val words = Bpe.wordCounts(g)(col("text")).select("word")
      .as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(model.encodeWord(w).toSeq == replay(w),
        s"greedy min-rank encode diverged from the training replay on '$w'")
    }
  }

  test("maxWords cap trains on the top-V words by (cnt desc, word asc) only") {
    val g = Seq("zz zz zz yy yy xq").toDF("text")
    // cap=2 keeps zz(3), yy(2); round 1 over {zz x3, yy x2} ties (z,z)
    // and (z,</w>) at 3 -> r-asc tie-break: '<' sorts below 'z', so the
    // marker pair wins (and the oracle's ORDER BY pr agrees: space <
    // every \w char)
    val m = Bpe.trainFromCorpus(g, col("text"), nMerges = 1, maxWords = 2)
    assert(m.merges == IndexedSeq(Merge(1, "z", Bpe.EndMark, 3L)))
    val uncapped = Bpe.trainFromCorpus(g, col("text"), nMerges = 1)
    assert(uncapped.merges == IndexedSeq(Merge(1, "z", Bpe.EndMark, 3L)),
      "xq's singleton pairs must not change the capped winner either")
  }

  test("OOV words encode greedily under the learned merges") {
    val model = BpeModel(IndexedSeq(Merge(1, "a", "b", 9L), Merge(2, "ab", "c", 5L)))
    assert(model.encodeWord("abc").toSeq == Seq("abc", Bpe.EndMark))
    assert(model.encodeWord("abab").toSeq == Seq("ab", "ab", Bpe.EndMark))
    assert(model.encodeWord("xyz").toSeq ==
      Seq("x", "y", "z", Bpe.EndMark), "no applicable merge -> chars + marker")
  }

  test("encodeWordTable carries the segmentation and its length; cap require is loud") {
    val model = BpeModel(IndexedSeq(Merge(1, "a", "b", 2L)))
    val out = Bpe.encodeWordTable(Seq("ab", "ba").toDF("word"), model)
      .orderBy("word").as[(String, Seq[String], Int)].collect()
    assert(out.toSeq == Seq(
      ("ab", Seq("ab", Bpe.EndMark), 2),
      ("ba", Seq("b", "a", Bpe.EndMark), 3)))
    val e = intercept[IllegalArgumentException] {
      Bpe.trainFromCorpus(Seq("x").toDF("text"), col("text"), 1,
        maxWords = Bpe.BpeMaxTrainWords + 1)
    }
    assert(e.getMessage.contains("driver-resident"))
  }

  test("incremental trainer == naive recompute-from-scratch reference on adversarial corpora") {
    // the inverted-index bookkeeping (stale entries, duplicate indices,
    // per-round deltas) is the only nontrivial driver code in the
    // family; this pins it against a reference trainer that recounts
    // EVERY pair from the whole word table each round. The {a,b}
    // alphabet maximizes pair collisions and overlapping runs (aaaa...)
    // — exactly the cases incremental deltas get wrong.
    import scala.collection.mutable
    def naive(wc: Array[(String, Long)], nMerges: Int): IndexedSeq[Merge] = {
      var words = wc.map(t => (t._1.map(_.toString) :+ Bpe.EndMark).toArray)
      val counts = wc.map(_._2)
      val out = mutable.ArrayBuffer.empty[Merge]
      var r = 0
      var go = true
      while (r < nMerges && go) {
        val pc = mutable.HashMap.empty[(String, String), Long]
        for (i <- words.indices; j <- 0 until words(i).length - 1) {
          val p = (words(i)(j), words(i)(j + 1))
          pc(p) = pc.getOrElse(p, 0L) + counts(i)
        }
        if (pc.isEmpty) go = false
        else {
          val ((l, rr), f) = pc.toSeq.minBy { case ((l, rr), f) => (-f, l, rr) }
          out += Merge(r + 1, l, rr, f)
          words = words.map(w => Bpe.mergePair(w, l, rr))
          r += 1
        }
      }
      out.toIndexedSeq
    }
    val ab = (1 to 4).flatMap(n =>
      (0 until (1 << n)).map(m =>
        (0 until n).map(b => if (((m >> b) & 1) == 0) 'a' else 'b').mkString))
    val cases: Seq[Array[(String, Long)]] = Seq(
      ab.zipWithIndex.map { case (w, i) => (w, 1L + (i % 3)) }.toArray, // heavy ties
      ab.zipWithIndex.collect { case (w, i) if i % 2 == 0 => (w, 1L + (i % 5)) }.toArray,
      Array.tabulate(5)(i => ("a" * (i + 1), (i + 1).toLong)),          // pure runs
      ab.map(w => (w, 1L)).toArray)                                     // total tie storm
    cases.zipWithIndex.foreach { case (wc, ci) =>
      val got = Bpe.train(wc.map(identity), 12)
      val exp = naive(wc.map(identity), 12)
      assert(got == exp, s"case $ci: incremental=$got naive=$exp")
    }
    // encode equivalence over every length<=5 {a,b} word under case-0's
    // 12-merge model (OOV lengths included)
    val model = Bpe.BpeModel(Bpe.train(cases.head.map(identity), 12))
    val all5 = (1 to 5).flatMap(n => (0 until (1 << n)).map(m =>
      (0 until n).map(b => if (((m >> b) & 1) == 0) 'a' else 'b').mkString))
    all5.foreach { w =>
      var s: Array[String] = (w.map(_.toString) :+ Bpe.EndMark).toArray
      model.merges.foreach(mg => s = Bpe.mergePair(s, mg.lhs, mg.rhs))
      assert(model.encodeWord(w).toSeq == s.toSeq, s"encode!=replay on '$w'")
    }
  }

  test("trainer stops early when no pairs remain") {
    // single 1-char word: [q, </w>] has one pair; after merging it the
    // table is all single symbols — requesting 5 merges yields 2
    val m = Bpe.train(wc("q" -> 1L), 5)
    assert(m == IndexedSeq(Merge(1, "q", Bpe.EndMark, 1L)))
  }

  test("byte-level mode: lossless pretokens, multi-byte symbols, replay equivalence") {
    // Lossless pretokenization: concatenation reconstructs the text
    // exactly — case, punctuation, tabs, newlines, multi-space, unicode
    val texts = Seq("Hello,  World!\n\tmulti  space", "héllo 🚀 café",
      "a", " leading", "trailing ", "")
    texts.foreach { t =>
      val pre = Bpe.BytePretokenRegex.r.findAllIn(t).toSeq
      assert(pre.mkString == t, s"pretokens must reconstruct '$t' exactly")
    }
    // byteSyms: UTF-8 bytes as lowercase hex pairs; multi-byte chars
    // split into their real bytes ('é' = c3 a9, '🚀' = f0 9f 9a 80)
    assert(Bpe.byteSyms(" Hé").toSeq == Seq("20", "48", "c3", "a9"))
    assert(Bpe.byteSyms("🚀").toSeq == Seq("f0", "9f", "9a", "80"))
    // trained byte model: byteLevel rides the model, replayExact's base
    // symbols are hex pairs, and greedy == replay on every pretoken —
    // including OOV-at-train-time unicode (bytes cover everything)
    val g = Seq("Na Na Na Batman", "Na Na hey hey", "héllo héllo 🚀").toDF("text")
    val m = Bpe.trainFromCorpusBytes(g, col("text"), nMerges = 8)
    assert(m.byteLevel && m.merges.nonEmpty)
    assert(m.replayExact, "trained byte model must pass the machine check")
    val pres = Bpe.pretokenCounts(g)(col("text")).select("word").as[String].collect()
    (pres :+ " zürich⚡never-seen").foreach { w =>
      assert(m.encodeWord(w).toSeq == m.replayWord(w).toSeq,
        s"byte-mode greedy and replay must agree on '$w'")
      // decode the CONCATENATED hex (a merge may join bytes mid-char)
      val hex = m.encodeWord(w).mkString
      assert(new String(hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray,
          java.nio.charset.StandardCharsets.UTF_8) == w,
        s"byte-mode segmentation must round-trip the pretoken '$w'")
    }
    // hex-pair base check: a char-mode-shaped operand is NOT derivable
    // in byte mode (single char 'a' is not a hex pair)
    val bad = BpeModel(IndexedSeq(Merge(1, "a", "b", 1L)), byteLevel = true)
    assert(!bad.replayExact)
  }

  test("adversarial golden: the replay-equivalence proof hole is real and machine-checked") {
    // Symbols are strings, so a merge table can name an operand that
    // only a LATER-rank merge creates: with r1=(aa,b), r2=(a,a) the
    // greedy encode of 'aab' applies r2 then revisits r1 ([aab </w>]),
    // while the rank-order replay (the DuckDB e-chain) finds no 'aa'
    // symbol at round 1 and stops at [aa b </w>] — divergence.
    val hole = BpeModel(IndexedSeq(Merge(1, "aa", "b", 9L), Merge(2, "a", "a", 5L)))
    assert(!hole.replayExact, "the derivability check must flag the hole")
    assert(hole.encodeWord("aab").toSeq == Seq("aab", Bpe.EndMark))
    assert(hole.replayWord("aab").toSeq == Seq("aa", "b", Bpe.EndMark))
    // Same-string-different-path: (a,ab) and (aa,b) both output 'aab';
    // duplicate output strings void the uniqueness the proof leans on,
    // so the check rejects them even when each operand is derivable.
    val dup = BpeModel(IndexedSeq(
      Merge(1, "a", "b", 9L), Merge(2, "a", "ab", 7L),
      Merge(3, "a", "a", 5L), Merge(4, "aa", "b", 3L)))
    assert(!dup.replayExact, "duplicate output strings must be flagged")
    // And the real thing: trained models satisfy derivability by
    // construction; the registry corpus also trains injective outputs,
    // so the queries' require(replayExact) holds — and replayWord
    // agrees with greedy encode on every trained word.
    val g = Tables.documents(spark, "/root/testdata/sf0.001").select("text")
    val model = Bpe.trainFromCorpus(g, col("text"), nMerges = 24)
    assert(model.replayExact, "the trained registry model must pass the check")
    val words = Bpe.wordCounts(g)(col("text")).select("word").as[String].collect()
    words.foreach { w =>
      assert(model.encodeWord(w).toSeq == model.replayWord(w).toSeq,
        s"greedy and replay must agree under replayExact on '$w'")
    }
  }
}
