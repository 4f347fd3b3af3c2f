package graft.streaming

import graft.ops.ScanOps

/** The stateful-operator library as [[BurstProc]]s — each the single
  * definition of that op's semantics, runnable in both RunModes. Where a
  * window-function Timeline implementation of the same op exists, ParitySpec
  * cross-checks the two (the analog of the reference's
  * interpreted-vs-compiled parity, `tests/compiled_parity.rs`). */
object StateProcs {

  /** Lift a per-event step into a burst processor (ops whose reference
    * semantics are per-tick, not per-cycle). */
  private def perEvent[S](initS: () => S)(f: (S, Ev) => (S, Option[Double])): BurstProc[S] =
    new BurstProc[S] {
      def init(): S = initS()
      def onBurst(s: S, key: String, ts: Long, evs: Seq[Ev]): (S, Seq[Out]) = {
        var st = s
        val out = Seq.newBuilder[Out]
        evs.foreach { ev =>
          val (s2, o) = f(st, ev)
          st = s2
          o.foreach(v => out += Out(key, ts, v, 0.0))
        }
        (st, out.result())
      }
    }

  final case class EwmaS(seeded: Boolean, value: Double, lastTs: Long)

  /** `ewma` (reference `ops.rs:852-896`), any decay policy. */
  def ewma(decay: ScanOps.EwmaDecay): BurstProc[EwmaS] =
    perEvent(() => EwmaS(seeded = false, 0.0, 0L)) { (s, ev) =>
      if (!s.seeded) (EwmaS(seeded = true, ev.value, ev.ts), Some(ev.value))
      else {
        val (alpha, t) = decay match {
          case ScanOps.PerTick(a)   => (a, s.lastTs)
          case ScanOps.HalfLife(hl) =>
            val dt = (ev.ts - s.lastTs).toDouble
            (if (hl <= 0.0) 1.0 else 1.0 - math.exp(-(dt / hl) * math.log(2.0)), ev.ts)
        }
        val v = s.value + alpha * (ev.value - s.value)
        (EwmaS(seeded = true, v, t), Some(v))
      }
    }

  final case class TsS(last: Long)

  /** Exact `throttle` (reference `ops.rs:381-414`). */
  def throttle(intervalNs: Long): BurstProc[TsS] =
    perEvent(() => TsS(Long.MinValue)) { (s, ev) =>
      if (s.last == Long.MinValue || ev.ts - s.last >= intervalNs) (TsS(ev.ts), Some(ev.value))
      else (s, None)
    }

  final case class HeldS(has: Boolean, v: Double)

  /** `drop_small_change` (reference `ops.rs:227-262`). */
  def dropSmallChange(minDelta: Double): BurstProc[HeldS] =
    perEvent(() => HeldS(has = false, 0.0)) { (s, ev) =>
      if (!s.has || math.abs(ev.value - s.v) > minDelta) (HeldS(has = true, ev.value), Some(ev.value))
      else (s, None)
    }

  final case class AccS(acc: Double)

  /** Running sum (`fold`, reference `ops.rs:2748`). */
  def cumSum: BurstProc[AccS] =
    perEvent(() => AccS(0.0)) { (s, ev) => val a = s.acc + ev.value; (AccS(a), Some(a)) }

  final case class CntS(n: Long)

  /** Running tick count (reference `ops.rs:2819`). */
  def count: BurstProc[CntS] =
    perEvent(() => CntS(0L)) { (s, _) => val n = s.n + 1; (CntS(n), Some(n.toDouble)) }

  /** `difference` (reference `ops.rs:263`): v - prev, quiet first. */
  def difference: BurstProc[HeldS] =
    perEvent(() => HeldS(has = false, 0.0)) { (s, ev) =>
      (HeldS(has = true, ev.value), if (s.has) Some(ev.value - s.v) else None)
    }

  final case class SessS(has: Boolean, lastTs: Long, sid: Long)

  /** Gap-based sessionization, streaming form of `Timeline.sessionize`:
    * a new session starts when the gap to the previous event exceeds
    * `gapNs` (first event = session 1); emits the session id per event.
    * O(1) per-key state. */
  def sessionize(gapNs: Long): BurstProc[SessS] =
    perEvent(() => SessS(has = false, 0L, 0L)) { (s, ev) =>
      val sid = if (!s.has || ev.ts - s.lastTs > gapNs) s.sid + 1 else s.sid
      (SessS(has = true, ev.ts, sid), Some(sid.toDouble))
    }

  final case class FunnelS(reached: Int, lastTs: Long)

  /** Ordered-step funnel, streaming form of [[graft.ops.Funnel.stages]]:
    * `ev.src` is the 0-based stage index; an event advances the funnel iff
    * it is the NEXT stage and lands strictly after the previous stage's
    * anchor within `stepNs`. Emits the 1-based stage reached at each
    * advancement. State is two fields per key, O(1) forever — the
    * streaming shape a conversion tracker runs for months. */
  def funnel(stepNs: Long): BurstProc[FunnelS] =
    perEvent(() => FunnelS(0, 0L)) { (s, ev) =>
      val i = ev.src
      val advance = i == s.reached &&
        (i == 0 || (ev.ts > s.lastTs && ev.ts <= s.lastTs + stepNs))
      if (advance) (FunnelS(i + 1, ev.ts), Some((i + 1).toDouble))
      else (s, None)
    }

  /** `distinct` (reference `ops.rs:187`): suppress consecutive duplicates. */
  def distinctConsecutive: BurstProc[HeldS] =
    perEvent(() => HeldS(has = false, 0.0)) { (s, ev) =>
      if (!s.has || ev.value != s.v) (HeldS(has = true, ev.value), Some(ev.value))
      else (s, None)
    }

  /** `limit` (reference `ops.rs:357`): first n ticks then quiet. */
  def limit(n: Long): BurstProc[CntS] =
    perEvent(() => CntS(0L)) { (s, ev) =>
      if (s.n < n) (CntS(s.n + 1), Some(ev.value)) else (s, None)
    }

  final case class NoS()

  /** `delay` (reference `ops.rs:3090`): stateless ts shift. */
  def delay(delayNs: Long): BurstProc[NoS] = new BurstProc[NoS] {
    def init(): NoS = NoS()
    def onBurst(s: NoS, key: String, ts: Long, evs: Seq[Ev]): (NoS, Seq[Out]) =
      (s, evs.map(ev => Out(key, ts + delayNs, ev.value, 0.0)))
  }

  /** `sample` (reference `ops.rs:2867`): src 0 = value (passive), src 1 =
    * trigger; each trigger tick emits the value held SO FAR in the cycle
    * (a same-instant value tick sorted earlier is visible — upstream fires
    * first within a cycle). */
  def sample: BurstProc[HeldS] = new BurstProc[HeldS] {
    def init(): HeldS = HeldS(has = false, 0.0)
    def onBurst(s: HeldS, key: String, ts: Long, evs: Seq[Ev]): (HeldS, Seq[Out]) = {
      var st = s
      val out = Seq.newBuilder[Out]
      evs.foreach { ev =>
        if (ev.src == 0) st = HeldS(has = true, ev.value)
        else if (st.has) out += Out(key, ts, st.v, 0.0)
      }
      (st, out.result())
    }
  }

  final case class PairS(hasA: Boolean, a: Double, hasB: Boolean, b: Double)

  /** `join` zip-latest (reference `ops.rs:2983`): ticks when either side
    * ticks, ONE emission per cycle carrying both latest values; quiet until
    * both sides have ticked. */
  def joinLatest: BurstProc[PairS] = new BurstProc[PairS] {
    def init(): PairS = PairS(hasA = false, 0.0, hasB = false, 0.0)
    def onBurst(s: PairS, key: String, ts: Long, evs: Seq[Ev]): (PairS, Seq[Out]) = {
      var st = s
      evs.foreach { ev =>
        if (ev.src == 0) st = st.copy(hasA = true, a = ev.value)
        else st = st.copy(hasB = true, b = ev.value)
      }
      (st, if (st.hasA && st.hasB) Seq(Out(key, ts, st.a, st.b)) else Nil)
    }
  }

  final case class GateS(hasV: Boolean, v: Double, hasC: Boolean, c: Boolean)

  /** `filter` on a condition stream (reference `ops.rs:2671`): a latch —
    * src 0 = value, src 1 = condition (pred applied to its value). One
    * emission per cycle when the held condition is true and a value has
    * ticked; condition ticks resample the held source (after its first
    * tick) — the [[graft.core.Timeline.filterGate]] semantics. */
  def filterGate(pred: Double => Boolean): BurstProc[GateS] = new BurstProc[GateS] {
    def init(): GateS = GateS(hasV = false, 0.0, hasC = false, c = false)
    def onBurst(s: GateS, key: String, ts: Long, evs: Seq[Ev]): (GateS, Seq[Out]) = {
      var st = s
      evs.foreach { ev =>
        if (ev.src == 0) st = st.copy(hasV = true, v = ev.value)
        else st = st.copy(hasC = true, c = pred(ev.value))
      }
      (st, if (st.hasV && st.hasC && st.c) Seq(Out(key, ts, st.v, 0.0)) else Nil)
    }
  }

  /** `merge` (reference `ops.rs:3156`): same-cycle tie → lowest src wins,
    * the winner's whole burst survives, other sources' rows drop. */
  def merge: BurstProc[NoS] = new BurstProc[NoS] {
    def init(): NoS = NoS()
    def onBurst(s: NoS, key: String, ts: Long, evs: Seq[Ev]): (NoS, Seq[Out]) = {
      val win = evs.map(_.src).min
      (s, evs.filter(_.src == win).map(ev => Out(key, ts, ev.value, 0.0)))
    }
  }

  final case class CpS(buf: Vector[Double])
  final case class MadS(buf: Vector[Double])

  /** MAD outlier scores (reference `augurs_outlier`, `augurs.rs:636`, MAD
    * flavor) as a live per-key state machine — the §2.8 family's second
    * streaming leg. Per event: hold the trailing `n` values (O(window)
    * state), emit v1 = score = |x − med|, v2 = mad, replaying
    * [[graft.ops.Augurs.outlierMad]]'s window form double-exactly:
    * sort ascending (same total order — doubles, no NaN contract), the
    * same odd/even median arithmetic as its sortedMedian Column, devs
    * |x − med| in array order then re-sorted, mad likewise. */
  def outlierMad(n: Int): BurstProc[MadS] = new BurstProc[MadS] {
    private def med(sorted: IndexedSeq[Double]): Double = {
      val sz = sorted.length
      if (sz % 2 == 1) sorted((sz + 1) / 2 - 1)
      else (sorted(sz / 2 - 1) + sorted(sz / 2)) / 2.0
    }
    def init(): MadS = MadS(Vector.empty)
    def onBurst(s: MadS, key: String, ts: Long, evs: Seq[Ev]): (MadS, Seq[Out]) = {
      var buf = s.buf
      val out = Seq.newBuilder[Out]
      evs.foreach { ev =>
        buf = { val b = buf :+ ev.value; if (b.size > n) b.drop(b.size - n) else b }
        val sorted = buf.sorted
        val m = med(sorted)
        val mad = med(sorted.map(x => math.abs(x - m)).sorted)
        out += Out(key, ts, math.abs(ev.value - m), mad)
      }
      (MadS(buf), out.result())
    }
  }

  final case class EtsS(buf: Vector[Double])

  /** Live 1-step ETS forecast (reference `augurs_forecast`'s ETS configs,
    * `augurs.rs:248-349`) — the §2.8 forecast family's streaming leg
    * (r15 verdict item 6). Per event: hold the trailing `window` values
    * (O(window) ring state, the batch trim discipline), and once two full
    * seasons have arrived emit (forecast₁, sigma) from the SAME
    * [[graft.ops.Augurs.etsCore]] recurrence the batch UDF and the
    * per-tick window form run — the parity triangle is double-exact by
    * sharing the one definition of the op's semantics (this object's
    * contract). */
  def forecastEts1(window: Int, season: Int, alpha: Double = 0.5,
      beta: Double = 0.25, gamma: Double = 0.125): BurstProc[EtsS] =
    new BurstProc[EtsS] {
      def init(): EtsS = EtsS(Vector.empty)
      def onBurst(s: EtsS, key: String, ts: Long, evs: Seq[Ev]): (EtsS, Seq[Out]) = {
        var buf = s.buf
        val out = Seq.newBuilder[Out]
        evs.foreach { ev =>
          buf = buf :+ ev.value
          if (buf.size > window) buf = buf.drop(buf.size - window)
          if (buf.size >= 2 * season) {
            val (fc, sigma) =
              graft.ops.Augurs.etsCore(buf, season, 1, alpha, beta, gamma)
            out += Out(key, ts, fc.head, sigma)
          }
        }
        (EtsS(buf), out.result())
      }
    }

  final case class SeasS(buf: Vector[Double])

  /** Live best-lag season detection (reference `augurs_seasons`,
    * `augurs.rs:893`) — the §2.8 family's fourth streaming leg (r16
    * verdict item 5). Per event: hold the trailing `window` values
    * (O(window) ring state, the batch trim discipline) and emit
    * (v1 = best_lag, v2 = best_corr) from the SAME
    * [[graft.ops.Augurs.acfBestLagCore]] the per-tick window form runs —
    * double-exact by sharing the one definition. O(window · maxLag) work
    * per event, quiet until some lag has ≥ minPairs pairs. */
  def seasons(window: Int, maxLag: Int, minPairs: Int = 10): BurstProc[SeasS] =
    new BurstProc[SeasS] {
      def init(): SeasS = SeasS(Vector.empty)
      def onBurst(s: SeasS, key: String, ts: Long, evs: Seq[Ev]): (SeasS, Seq[Out]) = {
        var buf = s.buf
        val out = Seq.newBuilder[Out]
        evs.foreach { ev =>
          buf = buf :+ ev.value
          if (buf.size > window) buf = buf.drop(buf.size - window)
          graft.ops.Augurs.acfBestLagCore(buf, maxLag, minPairs).foreach {
            case (lag, cr) => out += Out(key, ts, lag.toDouble, cr)
          }
        }
        (SeasS(buf), out.result())
      }
    }

  /** Mean-shift changepoint z-score (reference `augurs_changepoint`,
    * `augurs.rs:760`) as a live per-key state machine — the §2.8 analytics
    * family's streaming leg. Per event: hold the trailing `2w` values
    * (O(window) state, the same trim discipline as the batch op), and once
    * full emit z = |mean(post) − mean(pre)| / √(var(pre)/w + var(post)/w +
    * 1e-9) over pre = values [-2w+1, -w] and post = [-w+1, 0] — exactly
    * [[graft.ops.Augurs.changepointMeanShift]]'s frames. Double-exact vs
    * the batch window form: means are ordered-sum/n (Spark's Average),
    * variances replay Spark's CentralMomentAgg Welford recurrence in frame
    * order, and the z expression keeps the Column form's op order. */
  def changepoint(w: Int): BurstProc[CpS] = {
    def mean(xs: Seq[Double]): Double = {
      // both call sites pass exactly-w slices; divide by the actual length
      // so a future partial-window caller can't get a silently wrong mean
      var s = 0.0; xs.foreach(s += _); s / xs.length
    }
    def varSamp(xs: Seq[Double]): Double = {
      // Spark CentralMomentAgg update: delta = v - avg; deltaN = delta/n;
      // avg += deltaN; m2 += delta * (delta - deltaN)
      var n = 0.0; var avg = 0.0; var m2 = 0.0
      xs.foreach { v =>
        n += 1.0
        val delta = v - avg
        val deltaN = delta / n
        avg += deltaN
        m2 += delta * (delta - deltaN)
      }
      if (n < 2) 0.0 else m2 / (n - 1.0)
    }
    perEvent(() => CpS(Vector.empty)) { (s, ev) =>
      val buf = { val b = s.buf :+ ev.value; if (b.size > 2 * w) b.drop(b.size - 2 * w) else b }
      val out = if (buf.size == 2 * w) {
        val pre = buf.slice(0, w); val post = buf.slice(w, 2 * w)
        val mp = mean(pre); val mq = mean(post)
        val vp = varSamp(pre); val vq = varSamp(post)
        Some(math.abs(mq - mp) / math.sqrt(vp / w + vq / w + 1e-9))
      } else None
      (CpS(buf), out)
    }
  }
}
