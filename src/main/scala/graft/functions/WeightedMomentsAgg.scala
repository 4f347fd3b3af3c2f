package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One weighted sample. */
final case class WPoint(x: Double, w: Double)

/** Aggregation buffer: weighted Welford moments. */
final case class WMomBuf(wSum: Double, mean: Double, m2: Double)

/** Weighted mean + POPULATION variance as a typed `Aggregator` — the
  * §2.13 custom-op surface: the reference's user ops go through the same
  * `#[op]` path as built-ins (`wingfoil-derive/src/lib.rs:93-108`); here a
  * custom aggregation goes through the same `Aggregator`/`udaf` path as
  * Spark built-ins, usable in `agg`, SQL (via `spark.udf.register`), and
  * group-by pipelines.
  *
  * Same conventions as the time-weighted stats family (reference
  * `stats.rs:116-127`): population variance m2/wSum, no ddof. `merge` uses
  * the parallel-variance combination — ASSOCIATIVE, so partial aggregation
  * and shuffle-side combine are sound at any parallelism (non-associative
  * scans like EWMA stay on the ordered KeyedScan/BurstProc path instead —
  * an Aggregator's merge order is undefined by contract). */
final class WeightedMomentsAgg extends Aggregator[WPoint, WMomBuf, Seq[Double]] {

  def zero: WMomBuf = WMomBuf(0.0, 0.0, 0.0)

  def reduce(b: WMomBuf, p: WPoint): WMomBuf =
    if (p.w <= 0.0) b
    else {
      val wSum = b.wSum + p.w
      val delta = p.x - b.mean
      val mean = b.mean + delta * (p.w / wSum)
      WMomBuf(wSum, mean, b.m2 + p.w * delta * (p.x - mean))
    }

  def merge(a: WMomBuf, b: WMomBuf): WMomBuf =
    if (a.wSum <= 0.0) b
    else if (b.wSum <= 0.0) a
    else {
      val wSum = a.wSum + b.wSum
      val delta = b.mean - a.mean
      WMomBuf(wSum,
        a.mean + delta * (b.wSum / wSum),
        a.m2 + b.m2 + delta * delta * a.wSum * b.wSum / wSum)
    }

  /** (weighted mean, population variance); empty input → (0, 0) like the
    * reference's zero-weight convention. */
  def finish(r: WMomBuf): Seq[Double] =
    if (r.wSum <= 0.0) Seq(0.0, 0.0) else Seq(r.mean, r.m2 / r.wSum)

  def bufferEncoder: Encoder[WMomBuf] = Encoders.product[WMomBuf]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
