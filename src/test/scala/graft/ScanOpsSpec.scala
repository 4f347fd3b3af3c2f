package graft

import graft.core.Timeline
import graft.ops.ScanOps

/** Goldens for the stateful scan ops, matching the reference conventions
  * (stats.rs docs + ops.rs implementations). The irregular-ts f64 fixture
  * is FIXTURES.md §A.4: values 1,2,4,7,11 at ts 10,15,40,41,100. */
class ScanOpsSpec extends SparkSuite {
  import spark.implicits._

  private val regular = Seq(10L -> 1.0, 20L -> 2.0, 30L -> 4.0, 40L -> 7.0, 50L -> 11.0)
  private val irregular = Seq(10L -> 1.0, 15L -> 2.0, 40L -> 4.0, 41L -> 7.0, 100L -> 11.0)

  private def t(rows: Seq[(Long, Double)]) = Timeline.fromRows(spark, rows)

  private def outCol(tl: Timeline, c: String): Seq[Double] =
    tl.df.select("ts", c).orderBy("ts").collect().map(_.getDouble(1)).toSeq

  private def assertSeq(got: Seq[Double], exp: Seq[Double], tol: Double = 1e-9): Unit =
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) <= tol, s"row $i: got $g expected $e")
    }

  test("ewma per-tick: seeded with first sample (ops.rs:852-896)") {
    val got = outCol(ScanOps.ewma(t(regular), ScanOps.PerTick(0.5)), "ewma")
    assertSeq(got, Seq(1.0, 1.5, 2.75, 4.875, 7.9375), 0.0)
  }

  test("ewma half-life: alpha = 1 - 2^(-dt/hl) off engine time (ops.rs:875-889)") {
    val got = outCol(ScanOps.ewma(t(irregular), ScanOps.HalfLife(10.0)), "ewma")
    assertSeq(got, Seq(1.0, 1.2928932188134525, 3.5214466094067265,
      3.7543949237542535, 10.878661761863462))
  }

  test("cumulative time-weighted moments: left-continuous weights, population var (stats.rs:116-127)") {
    val r = ScanOps.cumulativeTimeWeighted(t(irregular))
    assertSeq(outCol(r, "tw_mean"), Seq(1.0, 1.0, 1.8333333333333335, 1.903225806451613, 5.2444444444444445))
    assertSeq(outCol(r, "tw_var"), Seq(0.0, 0.0, 0.13888888888888876, 0.28095733610822043, 5.962469135802469))
    assertSeq(outCol(r, "tw_std"), Seq(0.0, 0.0, 0.3726779962499648, 0.5300540879082251, 2.441816769498168))
  }

  test("rolling(3) time-weighted moments: committed weight reverts on eviction (ops.rs:2223+)") {
    val r = ScanOps.rollingTimeWeighted(t(irregular), 3)
    assertSeq(outCol(r, "tw_mean"), Seq(1.0, 1.0, 1.8333333333333335, 2.076923076923077, 6.95))
    assertSeq(outCol(r, "tw_var"), Seq(0.0, 0.0, 0.13888888888888876, 0.14792899408283994, 0.1474999999999985))
  }

  test("cumulative time-weighted median: cumulative weight crossing half (ops.rs:2507-2548)") {
    val got = outCol(ScanOps.medianTimeWeighted(t(irregular), "cumulative"), "tw_median")
    assertSeq(got, Seq(1.0, 1.0, 2.0, 2.0, 7.0), 0.0)
  }

  test("time-windowed(30) time-weighted median: all-zero weights fall back to latest") {
    val got = outCol(ScanOps.medianTimeWeighted(t(irregular), "time", windowNs = 30), "tw_median")
    assertSeq(got, Seq(1.0, 1.0, 2.0, 2.0, 11.0), 0.0)
  }

  test("throttleExact: one emission per interval from last EMITTED tick (ops.rs:381)") {
    val src = Timeline.fromRows(spark, (1 to 9).map(i => (i * 10L, i.toDouble)))
    val got = ScanOps.throttleExact(src, 25).df.select("ts").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 40L, 70L), "running gate, not a bucket (bucket would give 10,30,50,80)")
  }

  test("throttle bucket vs exact: divergence on a boundary-straddling burst (ops.rs:381)") {
    // the scaladoc contract (r15 verdict item 7): ticks at 0.9·I and
    // 1.1·I straddle a bucket boundary — the bucket form emits both
    // (different buckets), the running gate suppresses the second
    // (gap 0.2·I < I since the last emission). Sparse tail agrees.
    val src = Timeline.fromRows(spark,
      Seq(90L -> 1.0, 110L -> 2.0, 250L -> 3.0)) // I = 100
    val bucket = src.throttleBucket(100L).df.select("ts").as[Long].collect().sorted.toSeq
    val exact = graft.ops.ScanOps.throttleExact(src, 100L)
      .df.select("ts").as[Long].collect().sorted.toSeq
    assert(bucket == Seq(90L, 110L, 250L),
      "bucket form: 90 ∈ [0,100), 110 ∈ [100,200), 250 ∈ [200,300) — all first-in-bucket")
    assert(exact == Seq(90L, 250L),
      "exact form: 110 - 90 = 20 < 100 suppressed; 250 - 90 = 160 >= 100 passes")
  }

  test("dropSmallChange: reference is last EMITTED value (ops.rs:227-262)") {
    val got = ScanOps.dropSmallChange(t(regular), 1.5).df
      .select("ts", "value").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((10L, 1.0), (30L, 4.0), (40L, 7.0), (50L, 11.0)),
      "2.0 suppressed (|2-1|<=1.5); drift still ticks via 4.0")
  }

  test("delayWithReset: reset snaps to current value and drops pending (ops.rs:3486)") {
    val src = Timeline.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0, 30L -> 3.0))
    val resets = Timeline.fromRows(spark, Seq(25L -> 0.0, 100L -> 0.0))
    val got = ScanOps.delayWithReset(src, 15, resets).df
      .select("ts", "value").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((25L, 2.0), (45L, 3.0), (100L, 3.0)))
  }

  test("cumulativeMedian two-heap scan == expanding-window median (stats.rs:53-55)") {
    val rows = Seq(5.0, 1.0, 3.0, 3.0, 9.0, 2.0, 7.0, 4.0).zipWithIndex
      .map { case (v, i) => ((i + 1) * 10L, v) }
    val t = Timeline.fromRows(spark, rows)
    val scan = ScanOps.cumulativeMedian(t, "m").df
      .select("ts", "m").orderBy("ts").as[(Long, Double)].collect().toSeq
    val win = t.cumulative("median" -> "m").df
      .select("ts", "m").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(scan == win, "O(log n) heap scan matches the window-frame median exactly")
    assert(scan.map(_._2) == Seq(5.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.5))
  }

  test("delayWithReset: silent slot-seeds on the reset stream never trigger (ADVICE r2)") {
    val src = Timeline.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0, 30L -> 3.0))
    // resets arrive through delay: its __silent seed row (ts=25, pre-delay)
    // must not act as a reset; only the real landing at 125 does
    val resets = Timeline.fromRows(spark, Seq(25L -> 0.0)).delay(100L)
    val got = ScanOps.delayWithReset(src, 15, resets).df
      .select("ts", "value").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((25L, 1.0), (35L, 2.0), (45L, 3.0), (125L, 3.0)),
      "all three values deliver (nothing killed at 25); one sampled emission at the real reset")
    intercept[IllegalArgumentException](ScanOps.delayWithReset(src, 0L, resets))
  }

  test("composite keys that concatenate identically stay distinct (encodeKey)") {
    import org.apache.spark.sql.functions._
    // ("a b", "c") vs ("a", "b c"): a naive join-with-separator collides
    val df = Seq(
      ("a b", "c", 10L, 0L, 1.0), ("a", "b c", 10L, 1L, 100.0),
      ("a b", "c", 20L, 2L, 2.0), ("a", "b c", 20L, 3L, 200.0))
      .toDF("k1", "k2", "ts", "seq", "value")
    val got = ScanOps.ewma(Timeline(df, Seq("k1", "k2")), ScanOps.PerTick(0.5)).df
      .select("k1", "ts", "ewma").orderBy("k1", "ts").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 10L, 100.0), ("a", 20L, 150.0), ("a b", 10L, 1.0), ("a b", 20L, 1.5)))
    // null key vs the literal string "null" are distinct groups
    assert(graft.core.KeyedScan.encodeKey(Seq(null)) != graft.core.KeyedScan.encodeKey(Seq("null")))
  }

  test("scanDouble skips null value rows without touching state") {
    import org.apache.spark.sql.functions._
    val df = Seq((10L, 0L, Some(1.0)), (20L, 1L, None), (30L, 2L, Some(3.0)))
      .toDF("ts", "seq", "value")
    val got = ScanOps.ewma(Timeline(df), ScanOps.PerTick(0.5)).df
      .select("ts", "ewma").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((10L, 1.0), (30L, 2.0)), "null row dropped, ewma folds 1.0 then 3.0")
  }

  test("keyed scans stay per-key (two keys share no state)") {
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 10L, 0L, 1.0), ("b", 10L, 1L, 100.0), ("a", 20L, 2L, 2.0), ("b", 20L, 3L, 200.0))
      .toDF("k", "ts", "seq", "value")
    val got = ScanOps.ewma(Timeline(df, Seq("k")), ScanOps.PerTick(0.5)).df
      .select("k", "ts", "ewma").orderBy("k", "ts").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 10L, 1.0), ("a", 20L, 1.5), ("b", 10L, 100.0), ("b", 20L, 150.0)))
  }
}
