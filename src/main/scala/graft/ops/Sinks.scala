package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Sink / side-effect / lifecycle surface (reference `fluent.rs:1073-1099`,
  * ops `ops.rs:2930-2982,415-582`). Side effects run ON THE EXECUTORS
  * (per-partition), like the reference's per-tick closures run on the
  * engine thread — a closure that throws aborts the run (the for_each
  * error contract). Driver-side conveniences (`print`, `timed`,
  * `finallyDo`) wrap actions. */
object Sinks {

  /** `for_each` (reference `ops.rs:2930`): run `f` per row; any exception
    * aborts the job. */
  def forEach(df: DataFrame)(f: Row => Unit): Unit = df.foreach(f)

  /** `for_each_mut` (reference `fluent.rs:1081`): per-partition writer —
    * `open` once per partition (the connection), `f` per row, `close` at
    * partition end. The ForeachWriter shape. */
  def forEachMut[W](df: DataFrame)(open: () => W)(f: (W, Row) => Unit)(close: W => Unit): Unit =
    df.foreachPartition { rows: Iterator[Row] =>
      val w = open()
      try rows.foreach(r => f(w, r))
      finally close(w)
    }

  /** `inspect` (reference `ops.rs:415`): pass-through tap — `f` sees every
    * row on the executor, the stream flows on unchanged. */
  def inspect(df: DataFrame)(f: Row => Unit): DataFrame = {
    implicit val enc = ExpressionEncoder(df.schema)
    df.as(enc).mapPartitions(rows => rows.map { r => f(r); r }).toDF()
  }

  /** `logged` (reference `ops.rs:477`): pass-through tap logging each row
    * under `label` via log4j. */
  def logged(df: DataFrame, label: String, level: String = "INFO"): DataFrame =
    inspect(df) { r =>
      val log = org.apache.log4j.Logger.getLogger("graft." + label)
      level.toUpperCase match {
        case "DEBUG" => log.debug(s"$label: $r")
        case "WARN"  => log.warn(s"$label: $r")
        case _       => log.info(s"$label: $r")
      }
    }

  /** Counting tap — `inspect` specialised to a metric, the `observe`
    * analog; returns the pass-through frame and the accumulator (read it
    * AFTER an action). */
  def counted(df: DataFrame, name: String): (DataFrame, LongAccumulator) = {
    val acc = df.sparkSession.sparkContext.longAccumulator(name)
    (inspect(df)(_ => acc.add(1L)), acc)
  }

  /** `print` (reference `ops.rs:448`): per-tick stdout. */
  def print(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  /** `timed` (reference `ops.rs:503`): wall-clock a run, return (result,
    * seconds). */
  def timed[A](action: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = action
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** `finally` (reference `ops.rs:2955`): `f` runs once at teardown, even
    * after an abort. */
  def finallyDo[A](action: => A)(f: () => Unit): A =
    try action finally f()

  /** Engine-side metrics via `observe` (reference `timed`/latency report
    * analog): attaches named count+sum metrics, readable from a
    * QueryExecutionListener or `observe` API. */
  def observed(df: DataFrame, name: String, valueCol: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"), sum(col(valueCol)).as("sum"))
}
