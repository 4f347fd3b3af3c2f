package graft

import graft.core.Timeline
import org.apache.spark.sql.functions._

/** Exact (ts, value) goldens under deterministic historical replay — the
  * reference's test discipline (`docs/wingfoil-architecture.md:174-177`,
  * `tests/catalog.rs`, `tests/merge_tiebreak.rs`) transplanted. */
class TimelineSpec extends SparkSuite {
  import spark.implicits._

  private def rows(t: Timeline, cols: String*): Seq[Seq[Any]] =
    t.df.select(cols.map(col): _*).orderBy(col(cols.head), col(cols(1)))
      .collect().toSeq.map(_.toSeq)

  test("flagship hello-graph: ticker → count → even → filter (README.md:60-75)") {
    val g = Timeline.ticker(spark, 10, 9)
      .runningCount("n")
      .filterValue(_ => col("n") % 2 === 0)
    val got = g.df.select("ts", "n").orderBy("ts").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 2L), (30L, 4L), (50L, 6L), (70L, 8L)))
  }

  test("ticker starts at run start (catalog_flow delay-zero golden)") {
    val got = Timeline.ticker(spark, 10, 3).df.select("ts").as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 10L, 20L))
  }

  test("distinct suppresses consecutive duplicates only (ops.rs:187)") {
    val t = Timeline.fromRows(spark, (1 to 9).map(i => (i * 10L, ((i - 1) / 3).toDouble)))
    val got = t.distinctConsecutive().df.select("ts", "value").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((10L, 0.0), (40L, 1.0), (70L, 2.0)))
  }

  test("difference: successive delta, quiet first (ops.rs:263)") {
    val t = Timeline.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0, 30L -> 4.0, 40L -> 7.0, 50L -> 11.0))
    val got = t.difference("diff").df.select("ts", "diff").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((20L, 1.0), (30L, 2.0), (40L, 3.0), (50L, 4.0)))
  }

  test("limit: first n ticks then quiet (ops.rs:357)") {
    val t = Timeline.ticker(spark, 10, 9).runningCount("n")
    assert(t.limitTicks(3).df.select("ts").as[Long].collect().sorted.toSeq == Seq(0L, 10L, 20L))
  }

  test("merge tie-break: earliest-supplied input wins (tests/merge_tiebreak.rs)") {
    val a = Timeline.ticker(spark, 10, 4).runningCount("c").mapValue(_ => col("c").cast("double"))
    val b = Timeline.ticker(spark, 10, 4).runningCount("c").mapValue(_ => col("c").cast("double") + 100)
    val aWins = a.merge(b).df.select("value").as[Double].collect().sorted.toSeq
    assert(aWins == Seq(1.0, 2.0, 3.0, 4.0), "first input wins every tie")
    val bWins = b.merge(a).df.select("value").as[Double].collect().sorted.toSeq
    assert(bWins == Seq(101.0, 102.0, 103.0, 104.0))
  }

  test("merge keeps non-tying ticks from both sides") {
    val a = Timeline.fromRows(spark, Seq(0L -> 1.0, 20L -> 2.0))
    val b = Timeline.fromRows(spark, Seq(10L -> 9.0, 20L -> 8.0))
    val got = a.merge(b).df.select("ts", "value").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((0L, 1.0), (10L, 9.0), (20L, 2.0)))
  }

  test("sample: constant held value emitted per trigger (engine_semantics.rs:32-38)") {
    val c = Timeline.constant(spark, 7.0)
    val trig = Timeline.ticker(spark, 10, 3)
    val got = c.sample(trig).df.select("ts", "value").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((0L, 7.0), (10L, 7.0), (20L, 7.0)))
  }

  test("joinLatest: zip-latest, one emission per instant (ops.rs:2983)") {
    val fast = Timeline.fromRows(spark, Seq(0L -> 10.0, 100L -> 20.0, 200L -> 30.0, 300L -> 40.0))
    val slow = Timeline.fromRows(spark, Seq(0L -> 100.0, 200L -> 200.0, 400L -> 300.0))
    val got = fast.joinLatest(slow, "a", "b").df
      .select("ts", "a", "b").orderBy("ts").as[(Long, Double, Double)].collect().toSeq
    assert(got == Seq((0L, 10.0, 100.0), (100L, 20.0, 100.0), (200L, 30.0, 200.0),
      (300L, 40.0, 200.0), (400L, 40.0, 300.0)))
  }

  test("joinPassive: self triggers, other sampled incl. same-instant (ops.rs:3033)") {
    val fast = Timeline.fromRows(spark, Seq(0L -> 10.0, 100L -> 20.0, 200L -> 30.0, 300L -> 40.0))
    val slow = Timeline.fromRows(spark, Seq(0L -> 100.0, 200L -> 200.0, 400L -> 300.0))
    val got = fast.joinPassive(slow, "a", "b").df
      .select("ts", "a", "b").orderBy("ts").as[(Long, Double, Double)].collect().toSeq
    assert(got == Seq((0L, 10.0, 100.0), (100L, 20.0, 100.0), (200L, 30.0, 200.0), (300L, 40.0, 200.0)))
  }

  test("filterGate: latch gating + resample on condition ticks (fluent.rs:898-907)") {
    val src = Timeline.fromRows(spark, Seq(0L -> 1.0, 10L -> 2.0, 20L -> 3.0, 30L -> 4.0))
    val cond = Timeline(
      Seq((5L, 0L, true), (15L, 1L, false), (25L, 2L, true)).toDF("ts", "seq", "value"))
    val got = src.filterGate(cond).df.select("ts", "value").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((5L, 1.0), (10L, 2.0), (25L, 3.0), (30L, 4.0)))
  }

  test("throttleBucket: first tick per interval bucket") {
    val t = Timeline.fromRows(spark, (1 to 9).map(i => (i * 10L, i.toDouble)))
    val got = t.throttleBucket(25).df.select("ts").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 30L, 50L, 80L))
  }

  test("countBuffer flushes every capacity values + final partial flush (ops.rs:659)") {
    val t = Timeline.fromRows(spark, (1 to 7).map(i => (i * 10L, i.toDouble)))
    val got = t.countBuffer(3, Seq(count(lit(1)).as("n"), sum("value").as("s")))
      .select("bucket", "n", "s").orderBy("bucket").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 3L, 6.0), (1L, 3L, 15.0), (2L, 1L, 7.0)))
  }

  test("tumbling window: boundary flush semantics (ops.rs:583)") {
    val t = Timeline.fromRows(spark, Seq(5L -> 1.0, 15L -> 2.0, 25L -> 3.0, 45L -> 4.0))
    val got = t.tumbling(20, Seq(sum("value").as("s")))
      .select("ts", "s").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((20L, 3.0), (40L, 3.0), (60L, 4.0)))
  }

  test("sessionize: gap starts new session") {
    val t = Timeline.fromRows(spark, Seq(0L -> 1.0, 10L -> 2.0, 100L -> 3.0, 105L -> 4.0))
    val got = t.sessionize(50, "sid").df.select("ts", "sid").orderBy("ts").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (10L, 1L), (100L, 2L), (105L, 2L)))
  }

  test("rolling stats match reference conventions (ddof=1, 0.0 until 2 samples, even-median averages)") {
    val t = Timeline.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0, 30L -> 4.0, 40L -> 7.0))
    val got = t.rolling(2, "std" -> "s", "median" -> "m").df
      .select("ts", "s", "m").orderBy("ts").as[(Long, Double, Double)].collect().toSeq
    assert(got.map(_._2).head == 0.0, "std 0.0 until two samples")
    assert(math.abs(got(1)._2 - math.sqrt(0.5)) < 1e-12, "sample std ddof=1")
    assert(got.map(_._3) == Seq(1.0, 1.5, 3.0, 5.5), "even window averages middle two")
  }

  test("timeWindowed: entry exactly `window` old is retained (stats.rs:87-89)") {
    val t = Timeline.fromRows(spark, Seq(0L -> 1.0, 50L -> 2.0, 100L -> 4.0))
    val got = t.timeWindowed(100, "sum" -> "s").df
      .select("ts", "s").orderBy("ts").as[(Long, Double)].collect().toSeq
    assert(got == Seq((0L, 1.0), (50L, 3.0), (100L, 7.0)), "ts=0 entry still in [ts-100, ts]")
  }

  test("delay shifts the clock (ops.rs:3090)") {
    val t = Timeline.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0))
    assert(t.delay(5).ticks.select("ts").as[Long].collect().sorted.toSeq == Seq(15L, 25L))
  }

  test("delay seeds the FIRST value silently: passive readers see it pre-landing (op.rs:72-90)") {
    // values at 10,50 delayed by 100; triggers at 20 (pre-landing), 120, 160
    val delayed = Timeline.fromRows(spark, Seq(10L -> 1.0, 50L -> 2.0)).delay(100L)
    val trigger = Timeline.fromRows(spark, Seq(20L -> 0.0, 120L -> 0.0, 160L -> 0.0))
    val got = delayed.sample(trigger).df.select("ts", "value")
      .as[(Long, Double)].collect().toSeq.sorted
    assert(got == Seq((20L, 1.0), (120L, 1.0), (160L, 2.0)),
      "at ts=20 the seeded first value is visible; 2.0 only after landing at 150")
    // the seed never ticks: delay's own emissions are the landed rows only
    assert(delayed.ticks.select("ts").as[Long].collect().sorted.toSeq == Seq(110L, 150L))
    // and a zip-latest join does NOT fire at the silent seed instant
    val other = Timeline.fromRows(spark, Seq(30L -> 5.0))
    val j = other.joinLatest(delayed, "a", "b").df.select("ts", "a", "b")
      .as[(Long, Double, Double)].collect().toSeq.sorted
    assert(j == Seq((30L, 5.0, 1.0), (110L, 5.0, 1.0), (150L, 5.0, 2.0)),
      "fires at 30 (other ticks, seeded slot visible), 110 and 150 (landings); never at 10")
  }

  test("combine groups same-instant ticks into one burst (ops.rs:3333)") {
    val a = Timeline.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0))
    val b = Timeline.fromRows(spark, Seq(10L -> 9.0))
    val got = a.combine(b).select("ts", "burst").orderBy("ts")
      .as[(Long, Seq[(Int, Long, Double)])].collect().toSeq
    assert(got.map(_._1) == Seq(10L, 20L))
    assert(got.head._2.map(_._3) == Seq(1.0, 9.0), "burst ordered by source priority")
  }

  test("spreadN hint: first keyed-window op spends it (REPARTITION_BY_NUM), " +
      "exactly once per chain, values unchanged (round 21)") {
    val src = Timeline.fromRows(spark,
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)), keys = Seq(("k", "a")))
    val hinted = src.copy(spreadN = Some(4))
    val one = hinted.rolling(3, "sum" -> "s")
    // the hint is CONSUMED by the op that spent it...
    assert(one.spreadN.isEmpty, "keyed-window op must clear the consumed hint")
    val two = one.runningCount("n")
    val plan = two.df.queryExecution.executedPlan.toString
    // ...whose explicit exchange REPLACED the implicit one: a 2-op chain
    // has exactly ONE key exchange, and it is the AQE-coalescing-exempt
    // explicit form (an added second exchange = the hint double-spent)
    assert(plan.linesIterator.count(_.contains("REPARTITION_BY_NUM")) == 1,
      s"exactly one explicit spread exchange in the chain:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"the spread must REPLACE the window exchange, not add one:\n$plan")
    // stateless ops preserve the pending hint; delay (union output, no
    // stable partitioning) keeps it live for the next keyed consumer
    assert(hinted.mapValue(_ * 2).spreadN.contains(4))
    assert(hinted.delay(5L).spreadN.contains(4))
    // and values are byte-identical with and without the hint
    val want = src.rolling(3, "sum" -> "s").runningCount("n")
      .df.select("ts", "s", "n").orderBy("ts").collect().toSeq
    val got = two.df.select("ts", "s", "n").orderBy("ts").collect().toSeq
    assert(got == want, "the spread changes partitioning only, never values")
  }
}
