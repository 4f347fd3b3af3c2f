package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation (SURVEY M5): the reference `window` op
  * (tumbling time window with a final flush at end of run,
  * `ops.rs:583-658`) in live mode — `groupBy(window(...))` + watermark on
  * event time.
  *
  * Watermark policy (SURVEY §5): replay parity uses 0 lateness — the
  * reference clock is monotonic per source, so an already-ordered history
  * makes every window final the moment the clock passes its end. The
  * reference's final-flush-on-last-cycle maps to the Spark-native reality:
  * in append mode a window emits when the watermark passes its end, so a
  * bounded replay's trailing window flushes once the source delivers its
  * last timestamp advance (`Trigger.AvailableNow` / end-of-input).
  *
  * Window identity matches [[graft.core.Timeline.tumbling]]: output `ts` =
  * the exclusive window end on the ns clock, keyed by `key`. */
object StreamWindows {

  /** Tumbling count+sum over a streaming (or batch — same code) Ev stream.
    * `intervalNs` must be whole microseconds (Spark event time is µs). */
  def tumblingCountSum(ds: DataFrame, intervalNs: Long,
      lateness: String = "0 seconds"): DataFrame = {
    require(intervalNs % 1000L == 0, "interval must be whole microseconds")
    val withEventTime = ds
      .withColumn("__et", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("__et", lateness)
    withEventTime
      .groupBy(col("key"), window(col("__et"), s"${intervalNs / 1000} microseconds"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("key"),
        (unix_micros(col("window.end")) * 1000L).as("ts"),
        col("n"), col("sum_v"))
  }
}
