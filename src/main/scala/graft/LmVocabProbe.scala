package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade A/B for the lm-ppl plan trade under BOTH GenScale vocabulary
  * regimes (round 20, r19 verdict #6).
  *
  * The round-19 `lmPplScores` rewrite trades one full corpus pass (the
  * r18 form's separate c1 and c2 corpus aggregations, plus an eager
  * build-time vocab action) for a shared (h1, h2) count table whose two
  * marginal re-aggregations shuffle DISTINCT-BIGRAM rows. Its honest
  * cost — "the model side shuffles ~2× the bytes" — was measured only
  * in GenScale's default replica mode, where every replica carries a
  * FRESH vocabulary, so distinct bigrams grow LINEARLY with the corpus:
  * the trade's own adversarial case. Real corpora follow Heaps' law
  * (vocab ≈ K·n^β, β ≈ 0.5), which is the regime the 100 TB argument
  * targets: corpus scans dominate, distinct-gram exchanges do not.
  * This main measures the trade in both regimes:
  *
  *   {replica, heaps} × {old plan, new plan} → 4 walls + shuffle bytes
  *   + the mechanism numbers (distinct bigrams, vocab) that explain them.
  *
  * The OLD plan below is a measurement-only re-statement of the r18
  * shape (`git show ef6bc5d~1` — c1/c2 each re-aggregate the corpus
  * bigram pipeline; vocab is an EAGER `countDistinct().head` driver
  * action at plan-build time). It exists ONLY so the A/B can run both
  * sides in one JVM; the registry ships [[QueriesPipeline.lmPplScores]].
  *
  * Usage: `runMain graft.LmVocabProbe [srcSfDir] [factor] [outBase]`
  * (defaults /root/testdata/sf0.01, 8, /tmp/lmvocab). One
  * COVERAGE-ready line per (mode, plan): cold + warm wall and the
  * run's shuffle-write bytes (warm execution, own job group). */
object LmVocabProbe {

  /** r18 `lmPplScores`, verbatim shape (measurement-only — see above). */
  private def lmPplOld(g: DataFrame): DataFrame = {
    val t = g.select(col("doc_id"), TF.tokens(col("text")).as("toks"))
    val bi = t.where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(TF.ngrams(col("toks"), 2)).as("bg"))
      .select(col("doc_id"),
        TF.hash60(substring_index(col("bg"), " ", 1)).as("h1"),
        TF.hash60(col("bg")).as("h2"))
    val c2 = bi.groupBy("h2").agg(count(lit(1)).cast("double").as("c2"))
    val c1 = bi.groupBy("h1").agg(count(lit(1)).cast("double").as("c1"))
    val vocab = t.select(explode(col("toks")).as("w"))
      .agg(countDistinct("w")).head.getLong(0).toDouble // eager, at build
    bi.join(c2, "h2").join(c1, "h1")
      .withColumn("t", -log((col("c2") + lit(0.5)) / (col("c1") + lit(0.5) * lit(vocab))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bi"), (sum("t") / count(lit(1))).as("a"))
      .select(col("doc_id"), col("n_bi"),
        round(col("a") + lit(1e-9), 4).as("nll"))
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.01")
    val factor = if (args.length > 1) args(1).toInt else 8
    val outBase = if (args.length > 2) args(2) else "/tmp/lmvocab"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val tally = new Bench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    for (mode <- Seq("replica", "heaps")) {
      val dir = s"$outBase/${mode}_x$factor"
      GenScale.scaleDocuments(srcDocs, factor, heapsVocab = mode == "heaps")
        .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // mechanism numbers: the model-table and vocab sizes the two
      // regimes differ by (pure functions of the data, no wall noise)
      val toks = docs.select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      val grams = toks.where(size(col("toks")) >= 2)
        .select(explode(TF.ngrams(col("toks"), 2)).as("bg"))
        .select(TF.hash60(col("bg")).as("h2"))
        .distinct().count()
      val vocab = toks.select(explode(col("toks")).as("w")).distinct().count()
      println(s"[lmvocab] mode=$mode factor=$factor docs=${docs.count()} " +
        s"distinct_bigrams=$grams vocab=$vocab")
      for ((plan, fn) <- Seq[(String, DataFrame => DataFrame)](
          "old" -> lmPplOld, "new" -> QueriesPipeline.lmPplScores)) {
        def run(tag: String): Double = {
          spark.sparkContext.setJobGroup(s"lmvocab:$mode:$plan:$tag", "", false)
          val t0 = System.nanoTime()
          fn(docs).write.format("noop").mode("overwrite").save()
          val w = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.clearJobGroup()
          w
        }
        val cold = run("cold")
        val warm = run("warm")
        tally.drain()
        val bytes = tally.bytes(s"lmvocab:$mode:$plan:warm")
        println(f"[lmvocab] mode=$mode plan=$plan cold=$cold%.2f s " +
          f"warm=$warm%.2f s warm_shuffle=${bytes / 1048576.0}%.1f MiB")
      }
    }
    spark.sparkContext.removeSparkListener(tally)
    spark.stop()
  }
}
