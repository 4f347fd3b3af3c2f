package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One arriving doc for the live token budget: `score` is the 2dp
  * quality score and `ntok` the token count — both computed in the
  * stream's stateless map stage (the same Column expressions the batch
  * op uses), so the stateful step never touches text. */
final case class DocBudgetArrival(doc_id: Long, score: Double, ntok: Long)

/** One budget decision. `cum` is the running token sum INCLUDING this
  * doc — the stream twin of the batch oracle's windowed cumsum value. */
final case class BudgetDecision(doc_id: Long, keep: Boolean, cum: Long)

/** Tokens consumed so far (by every arrival, kept or not — see the
  * prefix-rule note on [[BudgetStream]]). */
final case class BudgetSpent(cum: Long)

/** Streaming twin of the `doc_token_budget` registry op
  * (ops/Sketch.budgetSelect) — the live form of budgeted selection:
  * docs arrive from a crawl and the corpus stops growing when the
  * token budget is spent. The SIXTH decision family with a live leg
  * (after SemDeDup, kNN-classify, DSIR, hybrid-RRF and the source
  * cap).
  *
  * Semantics are the batch op's PREFIX rule, applied in arrival order:
  * the running sum accumulates EVERY arrival's tokens (kept or not)
  * and a doc is kept iff its cumulative sum fits the budget — exactly
  * the oracle's `WHERE cum <= budget` over `sum(ntok) OVER (ORDER BY
  * ...)`, which also charges the overflowing row. So when arrivals
  * respect the batch order (score DESC, doc_id ASC — the ParitySpec
  * feed), the kept set and every `cum` equal the batch op's exactly;
  * out of order, a committed doc is never retracted when a
  * better-scored doc arrives after the budget is spent (a served
  * training shard can't be unserved) — the irrevocable-commitment
  * golden, the same contract as [[SourceCapStream]].
  *
  * Scale shape: a GLOBAL budget is a single counter, so the decision
  * is inherently sequential — the stateful stage runs on one constant
  * key, holds ONE Long of state, and does an add+compare per arrival;
  * everything per-doc (scoring, token counting) happens map-side
  * before it, so the serialized work is three narrow fields per doc.
  * Within a micro-batch arrivals are processed in (score DESC, doc_id)
  * order (group iteration order is undefined). At 100 TB the budget is
  * sharded before it is sequential: compose with the per-source cap /
  * mixture weights to allocate per-source sub-budgets, one
  * [[BudgetStream]] group per source — the keyed form is this same
  * code with the source as the group key. */
object BudgetStream {

  /** One micro-batch step — the single definition the streaming runner
    * and the spec's replay share. */
  private[graft] def step(spent: Long, arrivals: Seq[DocBudgetArrival],
      budget: Long): (Long, Seq[BudgetDecision]) = {
    var cum = spent
    val out = arrivals.sortBy(a => (-a.score, a.doc_id)).map { a =>
      cum += a.ntok
      BudgetDecision(a.doc_id, keep = cum <= budget, cum)
    }
    (cum, out)
  }

  def decisions(arrivals: Dataset[DocBudgetArrival], budget: Long)
      : Dataset[BudgetDecision] = {
    require(budget >= 0, s"BudgetStream: budget=$budget must be >= 0")
    val spark = arrivals.sparkSession
    import spark.implicits._
    arrivals.groupByKey(_ => 0)
      .flatMapGroupsWithState[BudgetSpent, BudgetDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[DocBudgetArrival], gs) =>
          val spent = if (gs.exists) gs.get.cum else 0L
          val (cum2, out) = step(spent, rows.toSeq, budget)
          gs.update(BudgetSpent(cum2))
          out.iterator
      }
  }
}
