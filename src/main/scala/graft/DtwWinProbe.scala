package graft

import graft.functions.VecOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Win-regime measurement for the [[graft.functions.DtwBandLe]]
  * early-abandoning threshold kernel (round 19, r18 verdict #7).
  *
  * The kernel landed in round 18 with an honest wall-neutral result at
  * the registry's window=16: at tiny windows the per-pair DP is ~16·33
  * cells and array copies/driver overheads dominate, so abandoning rows
  * buys nothing measurable. Its CLAIMED win regime — large windows,
  * where DP cells dominate copies and ~90% of a DBSCAN eps-graph's
  * pairs are far — was asserted, not measured. This main measures it:
  *
  *  1. kernel-level µs/pair, full `dtw <= eps` vs `dtwLe`, over all
  *     upper-triangle pairs of k deterministic random-walk series at
  *     the probed window/band, eps pinned at the p10 distance (the
  *     DBSCAN regime: 90% of pairs are far and should abandon early);
  *  2. the Spark eps-graph wall: the same pair frame filtered by the
  *     native `DtwBand <= eps` expression vs the native `DtwBandLe`
  *     expression, both under one noop-sink execution — the shape
  *     `clusterDtwDistributed` actually runs (`ops/Augurs.scala:731`).
  *
  * Decisions are cross-checked pair-for-pair (the kernel is EXACT by DP
  * monotonicity — AugursSpec sweeps the boundary; this probe re-proves
  * it at the probed scale before timing). Output: one COVERAGE-ready
  * line per leg. Usage:
  * `sbt "runMain graft.DtwWinProbe [window=128] [band=16] [k=96] [sparkK=800]"`. */
object DtwWinProbe {

  private def minTime(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val window = args.headOption.map(_.toInt).getOrElse(128)
    val band = if (args.length > 1) args(1).toInt else 16
    val k = if (args.length > 2) args(2).toInt else 96
    val sparkK = if (args.length > 3) args(3).toInt else 800

    // deterministic random-walk series: near pairs exist (walks cross)
    // but most are far — the eps-graph's real shape
    def walks(count: Int): Array[Array[Double]] = {
      val rng = new scala.util.Random(7)
      Array.fill(count) {
        var v = 0.0
        Array.fill(window) { v += rng.nextGaussian(); v }
      }
    }

    // ---- leg 1: kernel µs/pair ----
    val s = walks(k)
    val pairs = (for (i <- 0 until k; j <- i + 1 until k) yield (i, j)).toArray
    val dists = pairs.map { case (i, j) => VecOps.dtw(s(i), s(j), band) }
    val eps = dists.sorted.apply((dists.length * 0.10).toInt)
    // exactness at this scale before timing anything
    pairs.zip(dists).foreach { case ((i, j), d) =>
      require(VecOps.dtwLe(s(i), s(j), band, eps) == (d <= eps),
        s"dtwLe diverged from dtw<=eps at pair ($i,$j)")
    }
    var sink = 0
    val tFull = minTime(5) {
      pairs.foreach { case (i, j) =>
        if (VecOps.dtw(s(i), s(j), band) <= eps) sink += 1 }
    }
    val tLe = minTime(5) {
      pairs.foreach { case (i, j) =>
        if (VecOps.dtwLe(s(i), s(j), band, eps)) sink += 1 }
    }
    if (sink == -1) print("")
    val nearFrac = dists.count(_ <= eps).toDouble / dists.length
    println(f"[dtwwin] kernel window=$window band=$band k=$k pairs=${pairs.length} " +
      f"nearFrac=$nearFrac%.3f : full ${tFull * 1e6 / pairs.length}%.2f us/pair, " +
      f"dtwLe ${tLe * 1e6 / pairs.length}%.2f us/pair, speedup ${tFull / tLe}%.2fx")

    // ---- leg 2: Spark eps-graph wall ----
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val big = walks(sparkK)
    val bigPairs = (for (i <- 0 until sparkK; j <- i + 1 until sparkK) yield (i, j))
    // a meaningful p10 needs a real sample: below ~64 series the 20k-pair
    // cap is nowhere near binding and the percentile index degenerates
    require(sparkK >= 64, s"sparkK >= 64 for a meaningful eps sample: $sparkK")
    val bigDists = {
      // eps from a deterministic sample (full k² at sparkK is the thing
      // being timed, not the calibration); index by the SAMPLE's length —
      // the round-19 form indexed by the 20k cap, which threw past the
      // end under small sparkK and silently picked a non-p10 percentile
      // between ~64 and ~200 (round-19 advisor)
      val samp = bigPairs.take(20000)
        .map { case (i, j) => VecOps.dtw(big(i), big(j), band) }.sorted
      samp((samp.length * 0.10).toInt)
    }
    val df = spark.createDataset(big.toSeq.zipWithIndex
      .map { case (arr, i) => (i, arr.toSeq) }).toDF("sid", "series")
      .repartition(32).cache()
    df.count()
    val joined = df.as("a").join(df.as("b"), $"a.sid" < $"b.sid")
    def wall(edges: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      edges.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    import org.apache.spark.sql.GraftColumns
    val wFull = wall(joined.where(
      GraftColumns.dtwBand($"a.series", $"b.series", band) <= bigDists)
      .select($"a.sid", $"b.sid"))
    val wLe = wall(joined.where(
      GraftColumns.dtwBandLe($"a.series", $"b.series", band, bigDists))
      .select($"a.sid", $"b.sid"))
    println(f"[dtwwin] eps-graph window=$window band=$band k=$sparkK " +
      f"pairs=${bigPairs.size} : DtwBand<=eps ${wFull}%.2f s, " +
      f"DtwBandLe ${wLe}%.2f s, wall delta ${wFull / wLe}%.2fx")
    spark.stop()
  }
}
