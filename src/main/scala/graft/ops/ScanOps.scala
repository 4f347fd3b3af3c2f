package graft.ops

import graft.core.{KeyedScan, Timeline}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StructField, StructType, DoubleType, LongType}

import scala.collection.mutable

/** Stateful scan operators that need running state a window function can't
  * express — each a faithful re-derivation of the reference semantics, run
  * distributed via [[graft.core.KeyedScan]] (shuffle once on key, fold in
  * event-time order, O(state) memory per key).
  */
object ScanOps {

  /** EWMA decay policy (reference `ops.rs:819-828`). The reference enum has
    * exactly these two variants; its THREE fluent entry points (`ewma`,
    * `ewma_per_tick`, `ewma_half_life`, `ops.rs:852,904,928`) are call-site
    * sugar over them — all three reachable here via the decay argument. */
  sealed trait EwmaDecay
  /** Fixed smoothing factor alpha applied once per tick. */
  final case class PerTick(alpha: Double) extends EwmaDecay
  /** Weight halves every `halfLifeNs` of engine time:
    * alpha = 1 - 2^(-Δt/halfLife) (reference `ops.rs:875-889`). */
  final case class HalfLife(halfLifeNs: Double) extends EwmaDecay

  /** `ewma` (reference `ops.rs:852-896`): seeded with the first sample
    * (explicit initialised flag — a legit 0.0 must not re-seed), then
    * `e += alpha * (sample - e)`. */
  def ewma(t: Timeline, decay: EwmaDecay, out: String = "ewma"): Timeline = {
    val d = KeyedScan.scanDouble(t.ticks, t.keys, t.valueCol, Seq(out)) { () =>
      var value = Double.NaN
      var init = false
      var lastTime = 0L
      (ts: Long, sample: Double) => {
        if (!init) { value = sample; init = true; lastTime = ts }
        else {
          val alpha = decay match {
            case PerTick(a) => a
            case HalfLife(hl) =>
              val dt = (ts - lastTime).toDouble
              lastTime = ts
              if (hl <= 0.0) 1.0 else 1.0 - math.exp(-(dt / hl) * math.log(2.0))
          }
          value += alpha * (sample - value)
        }
        Some(Seq(value))
      }
    }
    t.copy(df = d)
  }

  /** `drop_small_change` (reference `ops.rs:227-262`): emit only when the
    * change vs the last EMITTED value exceeds `minDelta` (first tick always
    * emits). Running-threshold semantics — drift still ticks eventually. */
  def dropSmallChange(t: Timeline, minDelta: Double): Timeline = {
    val d = KeyedScan.scanDouble(t.ticks, t.keys, t.valueCol, Nil) { () =>
      var lastEmitted = Double.NaN
      var init = false
      (_: Long, sample: Double) => {
        if (!init || math.abs(sample - lastEmitted) > minDelta) {
          lastEmitted = sample; init = true; Some(Nil)
        } else None
      }
    }
    t.copy(df = d)
  }

  /** Exact `throttle` (reference `ops.rs:381-414`): at most one emission per
    * `intervalNs` of engine time, measured from the last EMITTED tick (a
    * running gate, not a bucket). This is the form that matches the
    * reference's running-state semantics bit-for-bit; see
    * [[graft.core.Timeline.throttleBucket]]'s scaladoc for the
    * bucket-vs-exact contract (when they agree, how they diverge on
    * boundary-straddling bursts, and which to prefer at scale). */
  def throttleExact(t: Timeline, intervalNs: Long): Timeline = {
    val d = KeyedScan.scanDouble(t.ticks, t.keys, t.valueCol, Nil) { () =>
      var lastEmit = Long.MinValue
      (ts: Long, _: Double) => {
        if (lastEmit == Long.MinValue || ts - lastEmit >= intervalNs) {
          lastEmit = ts; Some(Nil)
        } else None
      }
    }
    t.copy(df = d)
  }

  // ── time-weighted moments (reference `ops.rs:2115-2500`, stats.rs:116-127) ──
  //
  // Each sample weighted by the Δt until its successor (committed when the
  // successor arrives — the newest sample contributes nothing until the
  // clock advances); mean seeds to the current sample until weight exists;
  // variance is POPULATION m2/w_sum (no ddof); std clamps at 0 before sqrt.

  private final class WeightedMoments {
    var wSum = 0.0; var mean = 0.0; var m2 = 0.0
    def push(v: Double, w: Double): Unit = if (w > 0.0) {
      wSum += w
      val delta = v - mean
      mean += delta * (w / wSum)
      m2 += w * delta * (v - mean)
    }
    def remove(v: Double, w: Double): Unit = if (w > 0.0) {
      val newW = wSum - w
      if (newW <= 0.0) { wSum = 0.0; mean = 0.0; m2 = 0.0 }
      else {
        val delta = v - mean
        mean -= delta * (w / newW)
        m2 -= w * delta * (v - mean)
        wSum = newW
      }
    }
    def isEmpty: Boolean = wSum <= 0.0
    def variance: Double = if (isEmpty) 0.0 else m2 / wSum
  }

  /** cumulative_{mean,var,std}_time_weighted (reference `ops.rs:2115-2221`). */
  def cumulativeTimeWeighted(t: Timeline, meanOut: String = "tw_mean",
      varOut: String = "tw_var", stdOut: String = "tw_std"): Timeline = {
    val d = KeyedScan.scanDouble(t.ticks, t.keys, t.valueCol, Seq(meanOut, varOut, stdOut)) { () =>
      val m = new WeightedMoments
      var lastTime = -1L
      var prevValue = 0.0
      (ts: Long, sample: Double) => {
        if (lastTime >= 0) m.push(prevValue, (ts - lastTime).toDouble)
        prevValue = sample; lastTime = ts
        val mean = if (m.isEmpty) sample else m.mean
        val v = m.variance
        Some(Seq(mean, v, math.sqrt(math.max(v, 0.0))))
      }
    }
    t.copy(df = d)
  }

  /** rolling_{mean,var,std}_time_weighted over the most recent `window`
    * SAMPLES (count window; reference `ops.rs:2223-2380`). */
  def rollingTimeWeighted(t: Timeline, window: Int, meanOut: String = "tw_mean",
      varOut: String = "tw_var", stdOut: String = "tw_std"): Timeline = {
    require(window >= 1)
    val d = KeyedScan.scanDouble(t.ticks, t.keys, t.valueCol, Seq(meanOut, varOut, stdOut)) { () =>
      val m = new WeightedMoments
      val buf = mutable.ArrayDeque.empty[(Double, Long)] // (value, arrival ts)
      (ts: Long, sample: Double) => {
        // commit the interval the previous (newest-so-far) sample held
        buf.lastOption.foreach { case (pv, pt) => m.push(pv, (ts - pt).toDouble) }
        buf.append((sample, ts))
        while (buf.length > window) {
          val (ov, ot) = buf.removeHead()
          val nextT = buf.head._2
          m.remove(ov, (nextT - ot).toDouble)
        }
        val mean = if (m.isEmpty) sample else m.mean
        val v = m.variance
        Some(Seq(mean, v, math.sqrt(math.max(v, 0.0))))
      }
    }
    t.copy(df = d)
  }

  /** time_windowed_{mean,var,std}_time_weighted over the last `windowNs` of
    * engine time (reference `ops.rs:2382-2500`); an entry exactly window old
    * is retained (stats.rs:87-89). */
  def timeWindowedTimeWeighted(t: Timeline, windowNs: Long, meanOut: String = "tw_mean",
      varOut: String = "tw_var", stdOut: String = "tw_std"): Timeline = {
    val d = KeyedScan.scanDouble(t.ticks, t.keys, t.valueCol, Seq(meanOut, varOut, stdOut)) { () =>
      val m = new WeightedMoments
      val buf = mutable.ArrayDeque.empty[(Double, Long)]
      (ts: Long, sample: Double) => {
        buf.lastOption.foreach { case (pv, pt) => m.push(pv, (ts - pt).toDouble) }
        buf.append((sample, ts))
        while (buf.nonEmpty && buf.head._2 < ts - windowNs) {
          val (ov, ot) = buf.removeHead()
          val nextT = if (buf.nonEmpty) buf.head._2 else ts
          m.remove(ov, (nextT - ot).toDouble)
        }
        val mean = if (m.isEmpty) sample else m.mean
        val v = m.variance
        Some(Seq(mean, v, math.sqrt(math.max(v, 0.0))))
      }
    }
    t.copy(df = d)
  }

  /** `cumulative_median` (reference `ops.rs:1440-1470`) as a two-heap
    * running median: O(log n) per tick, O(n) state per key — the scale-safe
    * form of the expanding-frame median. The window-function form
    * ([[Timeline.cumulative]] "median") re-sorts the whole expanding prefix
    * per row (O(n²) memory bandwidth per key — the reference shares that
    * bound, `stats.rs:82-85`, but an unbounded prefix at 100× data does
    * not). Even count averages the two middle values (stats.rs:53-55). */
  def cumulativeMedian(t: Timeline, out: String = "c_median"): Timeline = {
    val d = KeyedScan.scanDouble(t.ticks, t.keys, t.valueCol, Seq(out)) { () =>
      val lo = mutable.PriorityQueue.empty[Double] // max-heap: lower half
      val hi = mutable.PriorityQueue.empty[Double](Ordering[Double].reverse) // min-heap
      (_: Long, sample: Double) => {
        if (lo.isEmpty || sample <= lo.head) lo.enqueue(sample) else hi.enqueue(sample)
        if (lo.size > hi.size + 1) hi.enqueue(lo.dequeue())
        else if (hi.size > lo.size) lo.enqueue(hi.dequeue())
        Some(Seq(if (lo.size == hi.size) (lo.head + hi.head) / 2.0 else lo.head))
      }
    }
    t.copy(df = d)
  }

  // ── time-weighted medians (reference `ops.rs:2502-2668`, stats.rs:164-172) ──

  /** Weighted median of (value, arrivalTs) samples at engine time `now`:
    * weight = gap to successor (newest gets zero → dropped), value where
    * cumulative weight crosses half total; exact boundary averages the two
    * straddling values; all-zero weights → latest value. Ported semantics of
    * the reference `weighted_median` (`ops.rs:2507-2548`). */
  private def weightedMedian(buf: collection.Seq[(Double, Long)], now: Long): Double = {
    val n = buf.length
    val pairs = mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < n) {
      val (v, t) = buf(i)
      val nextT = if (i + 1 < n) buf(i + 1)._2 else now
      val w = (nextT - t).toDouble
      if (w > 0.0) pairs += ((v, w))
      i += 1
    }
    if (pairs.isEmpty) return buf.last._1
    val sorted = pairs.sortBy(_._1)
    val half = sorted.iterator.map(_._2).sum / 2.0
    var cumulative = 0.0
    var j = 0
    while (j < sorted.length) {
      cumulative += sorted(j)._2
      if (cumulative > half) return sorted(j)._1
      if (cumulative == half)
        return if (j + 1 < sorted.length) (sorted(j)._1 + sorted(j + 1)._1) / 2.0 else sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  /** cumulative / rolling(count) / timeWindowed median_time_weighted.
    * windowKind: "cumulative" | "rolling" | "time". */
  def medianTimeWeighted(t: Timeline, windowKind: String, windowCount: Int = 0,
      windowNs: Long = 0L, out: String = "tw_median"): Timeline = {
    val d = KeyedScan.scanDouble(t.ticks, t.keys, t.valueCol, Seq(out)) { () =>
      val buf = mutable.ArrayDeque.empty[(Double, Long)]
      (ts: Long, sample: Double) => {
        buf.append((sample, ts))
        windowKind match {
          case "rolling" => while (buf.length > math.max(windowCount, 1)) buf.removeHead()
          case "time"    => while (buf.nonEmpty && buf.head._2 < ts - windowNs) buf.removeHead()
          case _         => ()
        }
        Some(Seq(weightedMedian(buf, ts)))
      }
    }
    t.copy(df = d)
  }

  /** `delay_with_reset` (reference `ops.rs:3486-3607`): values re-emit
    * `delayNs` later, but a reset tick snaps the output to the value
    * stream's current value and drops everything pending. Batch derivation:
    * a delayed emission at `ts+delay` survives iff no reset tick lands in
    * the closed interval [valueTs, valueTs+delay] (the reference checks the
    * trigger FIRST within a cycle, ops.rs:3531-3536, so a reset at either
    * boundary clears the queue before the pop/push); each reset emits the
    * value stream's held value at the reset instant.
    *
    * Scale shape: the reset join is bucketed on `ts DIV delayNs` — a reset
    * can only kill values in the two delay-width buckets it overlaps, so
    * each value row joins O(resets-in-2-buckets), never all resets (the
    * round-1 crossJoin is gone). */
  def delayWithReset(t: Timeline, delayNs: Long, resets: Timeline): Timeline = {
    import org.apache.spark.sql.functions._
    require(delayNs > 0, s"delayWithReset: delayNs must be > 0 (got $delayNs); " +
      "zero delay emits inline and needs no reset machinery")
    val vdf = t.ticks
      .select((t.keys.map(col) :+ col("ts") :+ col("seq") :+ col(t.valueCol).as("value")): _*)
      .withColumn("__vb", expr(s"ts DIV ${delayNs}L"))
    // a reset at rts kills values with ts in [rts-delay, rts]: exactly the
    // value buckets {rts DIV delay - 1, rts DIV delay}. Emission view: a
    // __silent slot-seed riding the resets stream is not a reset trigger.
    val rdf = resets.ticks
      .select((resets.keys.map(col) :+ col("ts").as("rts")): _*)
      .withColumn("__vb", explode(array(
        expr(s"rts DIV ${delayNs}L - 1"), expr(s"rts DIV ${delayNs}L"))))
    val joined = vdf.join(rdf, (t.keys :+ "__vb").toSeq, "left")
    val killed = joined
      .withColumn("__killed", col("rts").isNotNull && col("rts") >= col("ts") && col("rts") <= col("ts") + delayNs)
      .groupBy((t.keys.map(col) :+ col("ts") :+ col("seq") :+ col("value")): _*)
      .agg(max(col("__killed")).as("__dead"))
      .where(!col("__dead"))
      .select((t.keys.map(col) :+ (col("ts") + delayNs).as("ts") :+ col("seq") :+ col("value")): _*)
    // reset emissions: sample the value stream at each reset tick
    val sampled = t.sample(Timeline(
      resets.ticks.select((resets.keys.map(col) :+ col("ts") :+ col("seq")): _*)
        .withColumn(t.valueCol, lit(null).cast("double")),
      resets.keys, t.valueCol))
      .df.select((t.keys.map(col) :+ col("ts") :+ col("seq") :+ col(t.valueCol).as("value")): _*)
    t.copy(df = killed.unionByName(sampled), valueCol = "value")
  }
}
