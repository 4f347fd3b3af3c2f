package graft.ops

import graft.core.Timeline
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series analytics ops — the Spark re-derivation of the reference's
  * augurs adapter family (`adapters/augurs.rs`). Each maintains a sliding
  * window and re-evaluates per tick, like the reference; the detectors are
  * the deterministic statistical cores (MAD outlier, mean-shift
  * changepoint, autocorrelation seasonality), expressed as window
  * functions + array expressions so both engines of the oracle gate agree
  * bit-for-bit after 4dp rounding.
  *
  * Scale: every op is keyed (state and sorts distribute per key); per-row
  * work is O(window) — bounded, shuffle-free beyond the one per-key sort.
  */
object Augurs {

  /** Median of a pre-sorted double array (even count averages the two
    * middle values — the reference convention, `stats.rs:53-55`). */
  private def sortedMedian(arr: Column): Column = {
    val n = size(arr)
    val mid = floor((n + lit(1)) / 2).cast("int")
    val lo = floor(n / 2).cast("int")
    when(n % 2 === 1, element_at(arr, mid))
      .otherwise((element_at(arr, lo) + element_at(arr, lo + 1)) / 2.0)
  }

  /** MAD outlier detector (reference `augurs_outlier`, `augurs.rs:636`,
    * MAD flavor): over the last `n` samples per key, med = median, mad =
    * median of absolute deviations from med; a sample is outlying when
    * |x - med| > k * 1.4826 * mad (1.4826 = consistency constant for
    * normal data). Appends `med`, `mad`, `score` (=|x-med|). */
  def outlierMad(t: Timeline, n: Int): Timeline = {
    val frame = t.wRows(-(n - 1).toLong, 0)
    val d = t.df
      .withColumn("__arr", sort_array(collect_list(col(t.valueCol)).over(frame)))
      .withColumn("med", sortedMedian(col("__arr")))
      .withColumn("__devs", sort_array(transform(col("__arr"), x => abs(x - col("med")))))
      .withColumn("mad", sortedMedian(col("__devs")))
      .withColumn("score", abs(col(t.valueCol) - col("med")))
      .drop("__arr", "__devs")
    t.copy(df = d)
  }

  /** Mean-shift changepoint score (reference `augurs_changepoint`,
    * `augurs.rs:768`; the deterministic two-window test replacing BOCPD):
    * z = |mean(post) - mean(pre)| / sqrt(var(pre)/w + var(post)/w + eps)
    * where pre = rows [-2w+1, -w], post = rows [-w+1, 0]. Rows without a
    * full pre-window are dropped (no decision without history). */
  def changepointMeanShift(t: Timeline, w: Int): Timeline = {
    val pre = t.wRows(-(2 * w - 1).toLong, -w.toLong)
    val post = t.wRows(-(w - 1).toLong, 0)
    val v = col(t.valueCol)
    val d = t.df
      .withColumn("__npre", count(v).over(pre))
      .withColumn("__mp", avg(v).over(pre))
      .withColumn("__mq", avg(v).over(post))
      .withColumn("__vp", coalesce(var_samp(v).over(pre), lit(0.0)))
      .withColumn("__vq", coalesce(var_samp(v).over(post), lit(0.0)))
      .where(col("__npre") === w)
      .withColumn("z", abs(col("__mq") - col("__mp")) /
        sqrt(col("__vp") / w + col("__vq") / w + lit(1e-9)))
      .drop("__npre", "__mp", "__mq", "__vp", "__vq")
    t.copy(df = d)
  }

  /** Season (dominant period) detection by autocorrelation (reference
    * `augurs_seasons`, `augurs.rs:893`; periodogram replaced by the ACF —
    * same deterministic argmax shape): for row-lags 2..maxLag, Pearson
    * correlation of the series with itself shifted by the lag; one row per
    * key with the best lag (ties → smallest lag, on 4dp-rounded corr so
    * both oracle engines rank identically). Requires ≥ minPairs pairs. */
  def seasonsAutocorr(t: Timeline, maxLag: Int, minPairs: Int = 10): DataFrame = {
    val spark = t.df.sparkSession
    val e = t.df
      .withColumn("rn", row_number().over(t.w))
      .select((t.keys.map(col) :+ col("rn") :+ col(t.valueCol).as("v")): _*)
    val lags = broadcast(spark.range(2, maxLag + 1).select(col("id").cast("int").as("lag")))
    val a = e.crossJoin(lags)
    val joinCond = (t.keys.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col("b.rn") === col("a.rn") - col("a.lag"))).reduce(_ && _)
    val pairs = a.as("a").join(e.as("b"), joinCond)
      .select((t.keys.map(k => col(s"a.$k")) :+ col("a.lag") :+
        col("a.v").as("x") :+ col("b.v").as("y")): _*)
    val c = pairs.groupBy((t.keys.map(col) :+ col("lag")): _*)
      .agg(corr(col("x"), col("y")).as("c"), count(lit(1)).as("n"))
      .where(col("n") >= minPairs && col("c").isNotNull)
      .withColumn("cr", round(col("c") + lit(1e-9), 4))
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy(t.keys.map(col): _*).orderBy(col("cr").desc, col("lag"))
    c.withColumn("__rk", row_number().over(wBest)).where(col("__rk") === 1)
      .select((t.keys.map(col) :+ col("lag").cast("long").as("best_lag") :+
        col("cr").as("best_corr")): _*)
  }
}
