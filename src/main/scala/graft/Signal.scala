package graft

import graft.core.Timeline
import org.apache.spark.sql.{Column, SparkSession}

/** The builder-less script facade (reference `signal.rs:14-27,52-60`):
  * wrap a [[Timeline]] with chainable ops + `run`/`peekValue`
  * conveniences, so a one-liner reads like the reference's
  * `signal::ticker(period).count().run(mode, bound)`. Every op forwards to
  * the Timeline combinator of the same semantics — forwarding-only, so the
  * facade cannot drift (the reference generates its forwarders per-op for
  * the same reason, `signal.rs:30-38`). */
final case class Signal(t: Timeline) {

  def map(f: Column => Column): Signal = Signal(t.mapValue(f))
  def filterValue(p: Column => Column): Signal = Signal(t.filterValue(p))
  def count(): Signal = Signal(t.runningCount("n").copy(valueCol = "n"))
  def limit(n: Int): Signal = Signal(t.limitTicks(n))
  def distinct(): Signal = Signal(t.distinctConsecutive())
  def difference(): Signal = Signal(t.difference("d").copy(valueCol = "d"))
  def delay(ns: Long): Signal = Signal(t.delay(ns))
  def merge(other: Signal): Signal = Signal(t.merge(other.t))

  /** Historical run: collect the full (ts, value) tick sequence. Reads the
    * emission view (`ticks`, never `df`) — delay's `__silent` slot-seed row
    * must not surface as a tick (the Tick::Silent contract; `seq` resolves
    * for the orderBy via missing-reference resolution). */
  def run(): Seq[(Long, Any)] =
    t.ticks.select(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col(t.valueCol))
      .orderBy("ts", "seq").collect()
      .map(r => (r.getLong(0), r.get(1))).toSeq

  /** Final value slot after a run (reference `peek_value`). */
  def peekValue(): Option[Any] = run().lastOption.map(_._2)
}

object Signal {
  /** `signal::ticker` (reference `signal.rs:14`). */
  def ticker(spark: SparkSession, periodNs: Long, n: Long, startNs: Long = 0L): Signal =
    Signal(Timeline.ticker(spark, periodNs, n, startNs))

  def constant(spark: SparkSession, value: Double, atNs: Long = 0L): Signal =
    Signal(Timeline.constant(spark, value, atNs))

  def fromRows(spark: SparkSession, rows: Seq[(Long, Double)]): Signal =
    Signal(Timeline.fromRows(spark, rows))
}
