package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One arriving token instance. `b` is the token's bucket —
  * pmod(hash60(tok), buckets), computed in the stream's stateless map
  * stage (the SAME hash the batch side would use), so the stateful step
  * never hashes and tokens partition deterministically: each token's
  * counts live in exactly one bucket's summary. */
final case class TokArrival(tok: String, b: Int)

/** One bucket's summary after a micro-batch: `n` = total arrivals ever
  * seen by this bucket, `decs` = Misra-Gries decrement rounds executed
  * (the bucket's machine-checked error budget: for EVERY token t of this
  * bucket, chat(t) <= c(t) <= chat(t) + decs, absent tokens included),
  * `toks`/`cnts` = the <= cap surviving candidate entries. */
final case class BucketSummary(b: Int, n: Long, decs: Long,
    toks: Seq[String], cnts: Seq[Long])

/** Streaming twin of the `doc_heavy_tokens` registry op
  * (ops/Sketch.heavyHittersMg) — the seventh decision family with a
  * live leg, and the most natural one: Misra-Gries (Misra & Gries 1982)
  * IS a streaming sketch, and its summaries are mergeable (Agarwal et
  * al. 2012). Each bucket keeps one cap-bounded summary in stream
  * state; every micro-batch folds its arrivals in and emits the
  * bucket's updated summary.
  *
  * The dual-mode contract (the reference's Historical/RealTime split,
  * `runtime/run.rs:16-20`): REPLAYED over history, the recount-and-
  * certify pass is the batch op itself — exact counts, certificate
  * against N/(cap+1). LIVE, a one-pass stream provably cannot produce
  * exact counts below vocabulary-sized state (any exact one-pass top-k
  * needs Ω(distinct) space), so [[certifiedTopK]] certifies what IS
  * exactly knowable: when no bucket ever decremented (decs == 0
  * everywhere — caps sized to the expected skew), the summaries are the
  * exact wordcount and the top-k equals the batch op's rows INCLUDING
  * counts and tie-breaks (the ParitySpec leg); under pressure it
  * certifies the top-k SET through the tracked per-bucket error bounds
  * (k-th lower bound strictly above every outsider's upper bound), or
  * honestly reports the certificate failed.
  *
  * Scale shape: one hash exchange on the bucket id; state is <= cap
  * entries per bucket (the eviction loop is the bound — the same
  * boxed-on-purpose absent-key discipline as heavyHittersMg); emission
  * is summary-sized, never corpus-sized. */
object HeavyHittersStream {

  /** Mutable per-bucket MG state between micro-batches. */
  final case class MgState(n: Long, decs: Long, toks: Seq[String], cnts: Seq[Long])

  /** One bucket's micro-batch fold — the single definition the
    * streaming runner and the spec's replay share. Standard MG: absent
    * key + free slot inserts at 1; absent key + full summary decrements
    * every entry (dropping zeros) and counts one `decs` round. */
  private[graft] def step(st: MgState, arrivals: Seq[String], cap: Int): MgState = {
    val counts = new java.util.LinkedHashMap[String, Long]()
    st.toks.zip(st.cnts).foreach { case (t, c) => counts.put(t, c) }
    var n = st.n
    var decs = st.decs
    arrivals.foreach { tok =>
      n += 1
      // containsKey BEFORE get: a bare get on the absent key unboxes
      // null to 0L (the heavyHittersMg trap) and would masquerade as a
      // real zero count
      if (counts.containsKey(tok)) counts.put(tok, counts.get(tok) + 1)
      else if (counts.size < cap) counts.put(tok, 1L)
      else {
        decs += 1
        val itr = counts.entrySet().iterator()
        while (itr.hasNext) {
          val e = itr.next()
          if (e.getValue == 1L) itr.remove()
          else e.setValue(e.getValue - 1)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    val es = counts.entrySet().asScala.toSeq
    MgState(n, decs, es.map(_.getKey), es.map(_.getValue))
  }

  /** The live stream: per-bucket MG summaries, one emitted per bucket
    * per micro-batch (latest per bucket = the row with max n). */
  def summaries(arrivals: Dataset[TokArrival], cap: Int): Dataset[BucketSummary] = {
    require(cap >= 1, s"HeavyHittersStream: cap=$cap must be >= 1")
    val spark = arrivals.sparkSession
    import spark.implicits._
    arrivals.groupByKey(_.b)
      .flatMapGroupsWithState[MgState, BucketSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (b: Int, rows: Iterator[TokArrival], gs) =>
          val st0 = if (gs.exists) gs.get else MgState(0L, 0L, Nil, Nil)
          val st = step(st0, rows.map(_.tok).toSeq, cap)
          gs.update(st)
          Iterator.single(BucketSummary(b, st.n, st.decs, st.toks, st.cnts))
      }
  }

  /** Merge the latest per-bucket summaries into a certified top-k.
    * Returns (rows, certified): rows are (tok, lo, hi) with
    * lo <= c(tok) <= hi machine-guaranteed by the MG invariant.
    *
    * Exact mode — every bucket has decs == 0: the summaries are the
    * exact wordcount (nothing was ever evicted), so lo == hi == c(tok),
    * the ordering is the batch op's (cnt DESC, tok ASC) including tie
    * breaks, and certified = true whenever k rows exist.
    *
    * Bound mode — some bucket decremented: rows sort by (lo DESC, tok),
    * and the certificate demands the k-th lower bound strictly exceed
    * every non-selected token's upper bound (surviving candidates:
    * chat + its bucket's decs; evicted/absent tokens: the bucket's decs
    * itself). Ties at the boundary fail the certificate — honestly, the
    * set is not provable. */
  def certifiedTopK(sums: Seq[BucketSummary], k: Int)
      : (Seq[(String, Long, Long)], Boolean) = {
    require(k >= 1, s"certifiedTopK: k=$k must be >= 1")
    require(sums.map(_.b).distinct.size == sums.size,
      "certifiedTopK: pass the LATEST summary per bucket (duplicate bucket ids)")
    val cands = sums.flatMap(s => s.toks.zip(s.cnts).map { case (t, c) =>
      (t, c, c + s.decs) })
    if (sums.forall(_.decs == 0L)) {
      val top = cands.sortBy { case (t, lo, _) => (-lo, t) }.take(k)
      (top, top.size == k)
    } else {
      val sorted = cands.sortBy { case (t, lo, _) => (-lo, t) }
      val top = sorted.take(k)
      val restHi = sorted.drop(k).map(_._3) ++ sums.map(_.decs)
      val certified = top.size == k && restHi.forall(_ < top.map(_._2).min)
      (top, certified)
    }
  }
}
