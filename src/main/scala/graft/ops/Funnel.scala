package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnels (sequence matching) over keyed event frames: for a
  * type chain t0 -> t1 -> ... the first t0, then the first t1 within
  * `stepNs` strictly AFTER that t0, and so on. One definition of the
  * semantics, two execution strategies: this window-chain form (batch,
  * one exchange, one scan) and [[graft.streaming.StateProcs.funnel]]
  * (streaming per-key scan state) — ParitySpec holds them equal.
  *
  * Why the window chain is safe: the first qualifying step-i event is the
  * MINIMUM qualifying timestamp, so it is always inside the running-prefix
  * window of any row it must gate (the earliest qualifier precedes every
  * later row in (ts, seq) order). Prefix minima therefore equal the global
  * first-qualifier values, and the whole chain rides ONE partition sort —
  * the three-self-join formulation this replaces reads the event table
  * once per step. */
object Funnel {

  /** Per-key first-qualifying timestamps `t0..t{n-1}` (null = stage not
    * reached) for the `types` chain over `df`, which must carry `ts`,
    * `seq`, the key columns, and `typeCol`. */
  def stages(df: DataFrame, keyCols: Seq[String], typeCol: String,
      types: Seq[String], stepNs: Long): DataFrame = {
    require(types.nonEmpty, "Funnel.stages: need at least one step type")
    require(stepNs > 0, s"Funnel.stages: stepNs must be positive, got $stepNs")
    require(!df.columns.exists(_.startsWith("__fn_")),
      "Funnel.stages: input must not contain __fn_-prefixed columns")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("ts"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var d = df
    types.zipWithIndex.foreach { case (t, i) =>
      val q =
        if (i == 0) when(col(typeCol) === lit(t), col("ts"))
        else when(col(typeCol) === lit(t) && col("ts") > col(s"__fn_m${i - 1}") &&
          col("ts") <= col(s"__fn_m${i - 1}") + lit(stepNs), col("ts"))
      d = d.withColumn(s"__fn_q$i", q)
      if (i < types.length - 1)
        d = d.withColumn(s"__fn_m$i", min(col(s"__fn_q$i")).over(w))
    }
    val aggs = types.indices.map(i => min(col(s"__fn_q$i")).as(s"t$i"))
    d.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
