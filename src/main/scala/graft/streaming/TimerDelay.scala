package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming `delay` (reference `ops.rs:3090-3155`) on the
  * `transformWithState` API — the §2.13 custom-stateful-op surface on
  * Spark's current-generation state store (requires RocksDB provider).
  *
  * Batch delay is a pure ts shift ([[graft.core.Timeline.delay]]); live
  * streaming needs an actual clock to RE-EMIT the held value later — the
  * reference schedules the landing on its TimeQueue (`ops.rs:3126-3131`);
  * here each landing registers a per-key EVENT-TIME TIMER and the
  * watermark drives delivery. Spark timers are millisecond-precision;
  * the ns payload ts rides through untouched, so on ms-aligned clocks the
  * emitted rows equal the batch shift exactly (gated by ParitySpec).
  */
object TimerDelay {

  final class DelayProcessor(delayNs: Long) extends StatefulProcessor[String, Ev, Out] {
    @transient private var buf: ListState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[(Long, Double)](
        "delay_buf", Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Out] = {
      rows.foreach { ev =>
        val landNs = ev.ts + delayNs
        buf.appendValue((landNs, ev.value))
        getHandle.registerTimer(landNs / 1000000L)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Out] = {
      // deliver every landing within the expired millisecond (several ns
      // landings can share one ms timer); keep the rest pending
      val cutNs = (info.getExpiryTimeInMs + 1) * 1000000L
      val (due, pending) = buf.get().toSeq.partition(_._1 < cutNs)
      buf.clear()
      pending.foreach(buf.appendValue)
      due.sortBy(_._1).iterator.map { case (ts, v) => Out(key, ts, v, 0.0) }
    }
  }

  /** Streaming `delay_with_reset` (reference `ops.rs:3486-3607`) — the
    * live leg of [[graft.ops.ScanOps.delayWithReset]]'s batch derivation.
    * One merged input stream: `src` 0 = values, `src` 1 = resets (the
    * dual-input convention of [[RunMode]]; `seq` orders sides within an
    * instant, value before reset). Per cycle, trigger-first
    * (`ops.rs:3531-3536`): a reset at `rts` cancels every pending landing
    * in the CLOSED interval [rts, rts+delay] — i.e. keeps only landings
    * strictly before `rts`; a landing from an older value (landNs < rts)
    * whose timer has not fired yet survives, exactly the batch kill
    * predicate `rts ∈ [vts, vts+delay]` — and emits the value stream's
    * held value at the reset instant (quiet before the first value). */
  final class DelayResetProcessor(delayNs: Long) extends StatefulProcessor[String, Ev, Out] {
    @transient private var buf: ListState[(Long, Double)] = _
    @transient private var cur: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[(Long, Double)](
        "dr_buf", Encoders.product[(Long, Double)], TTLConfig.NONE)
      cur = getHandle.getValueState[Double](
        "dr_cur", Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Out] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Out]
      rows.toSeq.sortBy(e => (e.ts, e.seq)).foreach { ev =>
        if (ev.src == 0) {
          cur.update(ev.value)
          val landNs = ev.ts + delayNs
          buf.appendValue((landNs, ev.value))
          getHandle.registerTimer(landNs / 1000000L)
        } else {
          val keep = buf.get().toSeq.filter(_._1 < ev.ts)
          buf.clear()
          keep.foreach(buf.appendValue)
          if (cur.exists()) out += Out(key, ev.ts, cur.get(), 0.0)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Out] = {
      val cutNs = (info.getExpiryTimeInMs + 1) * 1000000L
      val (due, pending) = buf.get().toSeq.partition(_._1 < cutNs)
      buf.clear()
      pending.foreach(buf.appendValue)
      due.sortBy(_._1).iterator.map { case (ts, v) => Out(key, ts, v, 0.0) }
    }
  }

  /** Wire an Ev stream (ns clock) through the timer delay. The event-time
    * column + watermark 0 make replayed history deterministic (same
    * contract as [[RunMode.streaming]]: sources deliver in event-time
    * order, bursts unsplit). */
  def delayed(ds: Dataset[Ev], delayNs: Long): Dataset[Out] =
    wire(ds, new DelayProcessor(delayNs))

  /** Wire a merged value(src=0)/reset(src=1) Ev stream through
    * [[DelayResetProcessor]]. */
  def delayedWithReset(ds: Dataset[Ev], delayNs: Long): Dataset[Out] = {
    require(delayNs > 0, s"delayedWithReset: delayNs must be > 0 (got $delayNs)")
    wire(ds, new DelayResetProcessor(delayNs))
  }

  private def wire(ds: Dataset[Ev], proc: StatefulProcessor[String, Ev, Out]): Dataset[Out] = {
    import ds.sparkSession.implicits._
    ds.toDF()
      .withColumn("eventTime", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("eventTime", "0 seconds")
      .as[Ev]
      .groupByKey(_.key)
      .transformWithState(proc, TimeMode.EventTime(), OutputMode.Append())
  }
}
