package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latency tracing (reference `latency.rs:1-100`): wall-clock stamps ride
  * the value as extra columns (`Traced<T, L>`), and a report aggregates
  * per-stage deltas. Stamps are executor wall time at projection of the
  * stamped stage — deliberately non-deterministic (wall clock, not engine
  * clock), exactly like the reference's `stamp_precise`. Off the hot path
  * by design: a UDF per stamped row is the cost of wanting wall time. */
object Latency {

  private val nowNs = udf(() => System.nanoTime()).asNondeterministic()

  /** `stamp::<Stage>()` — append `stamp_<stage>` wall-clock ns. */
  def stamp(df: DataFrame, stage: String): DataFrame =
    df.withColumn(s"stamp_$stage", nowNs())

  /** `stamp_if` (reference `latency.rs` `_if` variants): stamp only rows
    * satisfying `cond`; the rest carry NULL and fall out of [[report]]'s
    * aggregates — per-stage conditional tracing without forking the
    * stream. */
  def stampIf(df: DataFrame, stage: String, cond: Column): DataFrame =
    df.withColumn(s"stamp_$stage", when(cond, nowNs()))

  /** `latency_report` (reference `latency.rs`, sink `interp.rs:2105`):
    * count / mean / min / max / p50 / p99 of (stamp_to - stamp_from) ns.
    * Rows where either stamp is NULL (a [[stampIf]] miss) are excluded —
    * `n` counts the measured deltas, not the input rows. */
  def report(df: DataFrame, from: String, to: String): DataFrame = {
    val d = (col(s"stamp_$to") - col(s"stamp_$from")).cast("double")
    df.agg(
      count(d).as("n"),
      avg(d).as("mean_ns"),
      min(d).as("min_ns"),
      max(d).as("max_ns"),
      expr(s"percentile(stamp_$to - stamp_$from, 0.5)").as("p50_ns"),
      expr(s"percentile(stamp_$to - stamp_$from, 0.99)").as("p99_ns"))
  }
}
