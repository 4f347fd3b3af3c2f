package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One arriving doc for the per-source cap: `h` is the salted selection
  * hash (TextFunctions.hash60 of "cap:"+doc_id — the SAME Column
  * expression the batch op uses), computed in the stream's stateless
  * map stage so the stateful step never hashes. */
final case class DocCapArrival(source: String, doc_id: Long, h: Long)

/** One cap decision. `rn` is the 1-based commitment rank among this
  * source's KEPT docs (0 for drops) — equal to the batch op's
  * row_number rank whenever arrivals respect (h, doc_id) order. */
final case class CapDecision(source: String, doc_id: Long, keep: Boolean, rn: Long)

/** Per-source state: how many docs this source has committed. */
final case class SourceSeen(n: Long)

/** Streaming twin of the `doc_source_cap` registry op (functions/
  * CapKAgg) — the live form of the domain cap: docs arrive from a
  * crawl, and each source may commit at most K. This is FIRST-K BY
  * ARRIVAL: a committed doc is never retracted when a smaller-hash doc
  * arrives later (a crawl can't un-fetch a page) — the same
  * irrevocable-commitment semantics as [[SemDeDupStream]]. Within a
  * micro-batch, arrivals are processed in (h, doc_id) order (group
  * iteration order is undefined), so feeding micro-batches that
  * respect the global (h, doc_id) order per source reproduces the
  * batch op's kept set and ranks exactly — the ParitySpec leg; the
  * out-of-order golden pins the no-retraction behavior instead.
  *
  * Scale shape: one hash exchange on source; state is ONE Long per
  * source (no growth with arrivals — the tripwire SemDeDup needs has
  * nothing to guard here); per-arrival work is O(log b) for the
  * micro-batch sort. */
object SourceCapStream {

  /** One source's micro-batch step — the single definition the
    * streaming runner and the spec's replay share. */
  private[graft] def step(seen: Long, arrivals: Seq[DocCapArrival], k: Int)
      : (Long, Seq[CapDecision]) = {
    var n = seen
    val out = arrivals.sortBy(a => (a.h, a.doc_id)).map { a =>
      if (n < k) { n += 1; CapDecision(a.source, a.doc_id, keep = true, n) }
      else CapDecision(a.source, a.doc_id, keep = false, 0L)
    }
    (n, out)
  }

  def decisions(arrivals: Dataset[DocCapArrival], k: Int): Dataset[CapDecision] = {
    require(k >= 1, s"SourceCapStream: k=$k must be >= 1")
    val spark = arrivals.sparkSession
    import spark.implicits._
    arrivals.groupByKey(_.source)
      .flatMapGroupsWithState[SourceSeen, CapDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[DocCapArrival], gs) =>
          val seen = if (gs.exists) gs.get.n else 0L
          val (n2, out) = step(seen, rows.toSeq, k)
          gs.update(SourceSeen(n2))
          out.iterator
      }
  }
}
