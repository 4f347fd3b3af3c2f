package graft

import graft.core.Timeline
import graft.streaming.{DynamicGroup, Ev, RunMode, StateProcs}
import org.apache.spark.sql.functions._

/** dynamic_group lifecycle (§2.11), demux routing, fan/map_n topology
  * sugar, and the Signal facade. */
class TopologySpec extends SparkSuite {
  import spark.implicits._

  test("dynamicGroup: add creates, data folds, del emits final and drops state (interp.rs:3901)") {
    import DynamicGroup.{Add, Data, Del}
    val evs = Seq(
      Ev("k1", 5L, 1L, Data, 99.0),  // before add: ignored (no sub-graph)
      Ev("k1", 10L, 2L, Add, 0.0),
      Ev("k1", 20L, 3L, Data, 1.0),
      Ev("k1", 30L, 4L, Data, 2.0),
      Ev("k1", 40L, 5L, Del, 0.0),   // emits final sum 3.0, drops state
      Ev("k1", 50L, 6L, Data, 7.0),  // after del: ignored
      Ev("k1", 60L, 7L, Add, 0.0),   // re-add starts FRESH
      Ev("k1", 70L, 8L, Data, 5.0),
      Ev("k2", 20L, 9L, Add, 0.0),   // second key: independent lifecycle
      Ev("k2", 30L, 10L, Data, 10.0))
    // per-key sub-graph: running sum; on remove emit the final sum
    val proc = DynamicGroup.proc[Double](() => 0.0,
      (s, v) => { val s2 = s + v; (s2, s2) }, s => Some(s))
    val got = RunMode.batch(spark.createDataset(evs), proc)
      .collect().map(o => (o.key, o.ts, o.v1, o.v2)).toSeq.sorted
    assert(got == Seq(
      ("k1", 20L, 1.0, 0.0), ("k1", 30L, 3.0, 0.0), ("k1", 40L, 3.0, 1.0),
      ("k1", 70L, 5.0, 0.0), // fresh state after re-add: 5.0 not 8.0
      ("k2", 30L, 10.0, 0.0)))
  }

  test("dynamicGroup runs identically in streaming mode (lifecycle across micro-batches)") {
    import DynamicGroup.{Add, Data, Del}
    val evs = Seq(
      Ev("a", 10L, 1L, Add, 0.0), Ev("a", 20L, 2L, Data, 1.0),
      Ev("a", 30L, 3L, Data, 2.0), Ev("a", 40L, 4L, Del, 0.0),
      Ev("a", 50L, 5L, Add, 0.0), Ev("a", 60L, 6L, Data, 4.0))
    val proc = DynamicGroup.proc[Double](() => 0.0,
      (s, v) => { val s2 = s + v; (s2, s2) }, s => Some(s))
    val batch = RunMode.batch(spark.createDataset(evs), proc)
      .collect().map(o => (o.key, o.ts, o.v1, o.v2)).toSeq.sorted

    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = RunMode.streaming(mem.toDS(), proc).writeStream
      .format("memory").queryName("dyn_par").outputMode("append").start()
    mem.addData(evs.take(3)); q.processAllAvailable()
    mem.addData(evs.drop(3)); q.processAllAvailable() // del+re-add cross the boundary
    q.stop()
    val stream = spark.table("dyn_par").as[graft.streaming.Out]
      .collect().map(o => (o.key, o.ts, o.v1, o.v2)).toSeq.sorted
    assert(batch == stream)
  }

  test("demux partitions rows by route; out-of-range goes to overflow (interp.rs:4064)") {
    val t = Timeline.fromRows(spark, Seq(10L -> 0.0, 20L -> 1.0, 30L -> 2.0, 40L -> 5.0))
    val (branches, overflow) = t.demux(3, v => v.cast("int"))
    assert(branches.map(_.df.count()).toSeq == Seq(1, 1, 1))
    assert(overflow.df.select("value").as[Double].collect().toSeq == Seq(5.0))
    assert(branches.map(_.df.count()).sum + overflow.df.count() == t.df.count(),
      "demux is a partition: no row lost or duplicated")
  }

  test("fan: n branches merged back with the merge tie-break (fluent.rs:963)") {
    val t = Timeline.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0))
    // branch i shifts by i*5 ns: branch 0 unshifted, 1 shifted...
    val fanned = t.fan(3)((b, i) => b.delay(i * 5L))
    // ts=20: branch 0's 2.0 ties with branch 2's 1.0 (10+10) → branch 0 wins
    val got = fanned.df.select("ts", "value").as[(Long, Double)].collect().toSeq.sorted
    assert(got == Seq((10L, 1.0), (15L, 1.0), (20L, 2.0), (25L, 2.0), (30L, 2.0)))
  }

  test("mapN chains the transform n times (fluent.rs:954)") {
    val t = Timeline.fromRows(spark, Seq(10L -> 1.0))
    val got = t.mapN(4)((b, _) => b.mapValue(_ * 2)).df
      .select("value").as[Double].head()
    assert(got == 16.0)
  }

  test("poll: evaluated per cycle, ticks on Some; deterministic replay (ops.rs:2899)") {
    val got = Timeline.poll(spark, periodNs = 10L, cycles = 6) { i =>
      if (i % 2 == 0) Some(i * 1.0) else None
    }.df.select("ts", "value").as[(Long, Double)].collect().toSeq.sorted
    assert(got == Seq((0L, 0.0), (20L, 2.0), (40L, 4.0)))
  }

  test("spawnMap: worker sub-graph is sub-plan composition (fluent.rs:1107)") {
    val t = Timeline.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0))
    val got = t.spawnMap(_.mapValue(_ * 10).runningAgg("c" -> (sum(_))))
      .df.select("ts", "c").as[(Long, Double)].collect().toSeq.sorted
    assert(got == Seq((10L, 10.0), (20L, 30.0)),
      "rows keep (ts, seq) through the spawned sub-graph")
  }

  test("Signal facade: ticker().count().run() + peekValue (signal.rs:14-27)") {
    val ticks = Signal.ticker(spark, periodNs = 10L, n = 5).count()
    assert(ticks.peekValue().contains(5L))
    val run = ticks.run()
    assert(run.map(_._1) == Seq(0L, 10L, 20L, 30L, 40L))
    val evens = Signal.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0, 30L -> 3.0, 40L -> 4.0))
      .filterValue(_ % 2 === 0).map(_ * 10).run()
    assert(evens == Seq((20L, 20.0), (40L, 40.0)))
  }

  test("Signal.run reads the emission view: delay's silent seed is not a tick (ADVICE r2)") {
    val got = Signal.fromRows(spark, Seq(10L -> 1.0, 20L -> 2.0)).delay(5L).run()
    assert(got == Seq((15L, 1.0), (25L, 2.0)),
      "no duplicate first value at its pre-delay ts")
    assert(Signal.fromRows(spark, Seq(10L -> 1.0)).delay(5L).peekValue().contains(1.0))
  }

  test("run_dynamic restart-with-new-plan: keyed state survives the swap (interp.rs:3228)") {
    // the documented Spark form of the reference's mid-run graph surgery:
    // stop the query, swap the plan AROUND the stateful operator (here a
    // new downstream ×10 projection), restart on the SAME checkpoint —
    // offsets resume and the per-key state carries over, so the running
    // sum continues at 6, not restarts at 3
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("dyn_swap").toString
    val mem = MemoryStream[Ev]
    // foreachBatch: the memory sink refuses checkpoint recovery; a
    // fault-tolerant sink is part of the restart contract anyway
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Double)]())
    def sink(df: org.apache.spark.sql.Dataset[graft.streaming.Out], id: Long): Unit =
      df.collect().foreach(o => got.add((o.ts, o.v1)))
    val q1 = RunMode.streaming(mem.toDS(), StateProcs.cumSum)
      .writeStream.foreachBatch(sink _).outputMode("append")
      .option("checkpointLocation", ckpt).start()
    mem.addData(Seq(Ev("a", 10L, 0L, 0, 1.0), Ev("a", 20L, 1L, 0, 2.0)))
    q1.processAllAvailable(); q1.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sorted == Seq((10L, 1.0), (20L, 3.0)))
    got.clear()
    // new plan: same source, same stateful op, new stateless tail
    val q2 = RunMode.streaming(mem.toDS(), StateProcs.cumSum)
      .map(o => o.copy(v1 = o.v1 * 10))
      .writeStream.foreachBatch(sink _).outputMode("append")
      .option("checkpointLocation", ckpt).start()
    mem.addData(Seq(Ev("a", 30L, 2L, 0, 3.0)))
    q2.processAllAvailable(); q2.stop()
    val v2 = got.asScala.toSeq
    assert(v2 == Seq((30L, 60.0)),
      s"state must continue (1+2+3=6, ×10 by the new plan) across the swap, got $v2")
  }
}
