package graft

import graft.core.Timeline
import graft.ops.{Latency, Sinks}
import org.apache.spark.sql.functions._

/** Goldens for the sink/lifecycle surface (reference `fluent.rs:1073-1099`)
  * and the small-op sweep (`collapse`, `split`, `map_filter`, `never`,
  * `ticked_at_elapsed`, `collapse_accumulate`) + latency stamps (§2.10). */
class SinksSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(10L -> 1.0, 20L -> 2.0, 30L -> 3.0)
  private def tl = Timeline.fromRows(spark, rows)

  test("forEach visits every row; an exception aborts the run (ops.rs:2930)") {
    val acc = spark.sparkContext.longAccumulator("fe")
    Sinks.forEach(tl.df)(_ => acc.add(1))
    assert(acc.value == 3)
    intercept[Exception] {
      Sinks.forEach(tl.df)(r => if (r.getDouble(2) > 2.0) sys.error("sink refused"))
    }
  }

  test("forEachMut: open once per partition, close at end (fluent.rs:1081)") {
    val opens = spark.sparkContext.longAccumulator("opens")
    val writes = spark.sparkContext.longAccumulator("writes")
    val closes = spark.sparkContext.longAccumulator("closes")
    Sinks.forEachMut(tl.df.coalesce(1))(() => { opens.add(1); "conn" })(
      (_, _) => writes.add(1))(_ => closes.add(1))
    assert(opens.value == 1 && writes.value == 3 && closes.value == 1)
  }

  test("inspect taps without changing the stream (ops.rs:415)") {
    val acc = spark.sparkContext.longAccumulator("tap")
    val tapped = Sinks.inspect(tl.df)(_ => acc.add(1))
    val got = tapped.select("ts", "value").as[(Long, Double)].collect().toSeq.sorted
    assert(got == rows.sorted && acc.value == 3)
  }

  test("counted: the observe-style metric tap") {
    val (d, acc) = Sinks.counted(tl.df, "n_rows")
    d.collect()
    assert(acc.value == 3)
  }

  test("timed returns the action result and a plausible duration (ops.rs:503)") {
    val (n, sec) = Sinks.timed(tl.df.count())
    assert(n == 3L && sec >= 0.0 && sec < 60.0)
  }

  test("finallyDo runs at teardown even after an abort (ops.rs:2955)") {
    var ran = false
    assert(Sinks.finallyDo(42) { () => ran = true } == 42 && ran)
    ran = false
    intercept[Exception] { Sinks.finallyDo(sys.error("boom")) { () => ran = true } }
    assert(ran, "finally must run after the abort")
  }

  test("collapse: last element of an array value, quiet when empty (ops.rs:328)") {
    val df = Seq((10L, 0L, Seq(1.0, 2.0)), (20L, 1L, Seq.empty[Double]), (30L, 2L, Seq(7.0)))
      .toDF("ts", "seq", "value")
    val got = Timeline(df).collapse().df.select("ts", "value")
      .as[(Long, Double)].collect().toSeq.sorted
    assert(got == Seq((10L, 2.0), (30L, 7.0)))
  }

  test("split: struct stream into field streams (fluent.rs:1393)") {
    val df = Seq((10L, 0L, (1.0, 9.0)), (20L, 1L, (2.0, 8.0))).toDF("ts", "seq", "value")
    val (a, b) = Timeline(df).split()
    assert(a.df.select("value").as[Double].collect().sorted.toSeq == Seq(1.0, 2.0))
    assert(b.df.select("value").as[Double].collect().sorted.toSeq == Seq(8.0, 9.0))
  }

  test("mapFilter maps and drops in one op (ops.rs:159)") {
    val got = tl.mapFilter(_ * 10, _ =!= 2.0).df.select("value")
      .as[Double].collect().toSeq.sorted
    assert(got == Seq(10.0, 30.0))
  }

  test("never: a stream that never ticks (ops.rs:3465)") {
    assert(Timeline.never(spark).df.count() == 0)
    // and it unions/merges harmlessly
    assert(tl.merge(Timeline.never(spark)).df.count() == 3)
  }

  test("tickedAtElapsed: times relative to run start (ops.rs:799)") {
    val got = tl.tickedAtElapsed(startNs = 10L).select("elapsed")
      .as[Long].collect().toSeq.sorted
    assert(got == Seq(0L, 10L, 20L))
  }

  test("collapseAccumulate flattens bursts into the running list (fluent.rs:1378)") {
    val df = Seq((10L, 0L, Seq(1.0, 2.0)), (20L, 1L, Seq(3.0))).toDF("ts", "seq", "value")
    val got = Timeline(df).collapseAccumulate("acc").df
      .orderBy("ts", "seq").select("acc").as[Seq[Double]].collect().toSeq
    assert(got == Seq(Seq(1.0), Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))
  }

  test("collapseAccumulate: element order is total across partitions (ADVICE r2)") {
    // one 64-element burst spread over many shuffle partitions: plain
    // explode leaves tied (ts, seq) and the running-prefix order becomes
    // partition-dependent; posexplode's folded seq keeps array order exact
    val burst = (1 to 64).map(_.toDouble)
    val df = Seq((10L, 0L, burst), (20L, 1L, Seq(99.0))).toDF("ts", "seq", "value")
      .repartition(8)
    val got = Timeline(df).collapseAccumulate("acc").df
      .orderBy("ts", "seq").select("acc").as[Seq[Double]].collect().toSeq
    assert(got.last == burst :+ 99.0)
    assert(got.init == (1 to 64).map(i => burst.take(i)))
  }

  test("latency stamps ride the value; report aggregates stage deltas (latency.rs)") {
    val stamped = Latency.stamp(Latency.stamp(tl.df, "in"), "out")
    val rep = Latency.report(stamped, "in", "out").collect()(0)
    assert(rep.getAs[Long]("n") == 3L)
    assert(rep.getAs[Double]("min_ns") >= 0.0, "out stamped after in")
    assert(rep.getAs[Double]("p99_ns") >= rep.getAs[Double]("p50_ns"))
  }

  test("stamp_if: conditional stamps; unstamped rows fall out of the report (latency.rs _if)") {
    import org.apache.spark.sql.functions.col
    val stamped = Latency.stampIf(Latency.stamp(tl.df, "in"), "out", col("value") > 1.5)
    val nulls = stamped.where(col("stamp_out").isNull).count()
    assert(nulls == 1, "only the value<=1.5 row goes unstamped")
    val rep = Latency.report(stamped, "in", "out").collect()(0)
    assert(rep.getAs[Long]("n") == 2L, "report counts measured deltas, not input rows")
    assert(rep.getAs[Double]("min_ns") >= 0.0)
  }
}
