package graft

import graft.core.Timeline
import graft.ops.Augurs
import org.apache.spark.sql.functions._

/** Behavioral goldens for the augurs-family detectors (reference
  * `adapters/augurs.rs:636,768,893`): known signals must trip, quiet
  * signals must not. */
class AugursSpec extends SparkSuite {
  import spark.implicits._

  private def series(vs: Seq[Double]): Timeline =
    Timeline.fromRows(spark, vs.zipWithIndex.map { case (v, i) => (i * 10L, v) })

  test("outlierMad flags a spike in a flat series, nothing else") {
    val vs = Seq.fill(10)(5.0) ++ Seq(100.0) ++ Seq.fill(9)(5.0)
    val out = Augurs.outlierMad(series(vs), 20).df
      .select(col("ts"), (col("score") > col("mad") * (3.0 * 1.4826)).as("flag"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(100L), "the 100.0 spike at ts=100 must flag (mad 0, score 95)")
    assert(out.count(_._2) == 1, "the flat samples must not flag")
  }

  test("changepointMeanShift peaks at a level shift, quiet on stationary data") {
    val vs = Seq.fill(20)(1.0) ++ Seq.fill(15)(10.0)
    val z = Augurs.changepointMeanShift(series(vs), 10).df
      .select("ts", "z").as[(Long, Double)].collect().toMap
    // full post-window of the new level vs full pre-window of the old:
    // ts=290 is the 30th sample (post = 10 tens, pre = 10 ones)
    assert(z(290L) > 100.0, s"shift must score huge, got ${z(290L)}")
    assert(z(240L) > 1.0, "mid-transition already elevated")
    val cps = Augurs.changepointMeanShift(series(Seq.fill(35)(4.2)), 10).df
      .where(col("z") > 3.0).count()
    assert(cps == 0, "constant series never trips")
  }

  test("seasonsAutocorr finds the dominant period") {
    val cycle = Seq(1.0, 5.0, 9.0, 2.0, 7.0)
    val vs = Seq.fill(10)(cycle).flatten // period 5, 50 samples
    val best = Augurs.seasonsAutocorr(series(vs), 12)
      .select("best_lag", "best_corr").as[(Long, Double)].head()
    assert(best._1 == 5L, s"expected period 5, got ${best._1}")
    assert(best._2 > 0.99, "perfect periodicity → corr ~1")
  }
}
