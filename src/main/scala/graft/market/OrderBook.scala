package graft.market

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable

/** One book update row: a snapshot (full `bids`/`asks` image) or a delta
  * (`changes`). One row per update; same-instant updates are distinct rows
  * sharing `ts` ordered by `seq` — a burst is applied in full, in order
  * (reference `market.rs:79-83`). Prices/qtys are BigDecimal, never double:
  * a book keys levels BY PRICE (reference `market.rs:33-40`). */
case class BookUpdateIn(
    ts: Long, seq: Long, instrument: String, kind: String, // "snapshot" | "delta"
    bids: Seq[(BigDecimal, BigDecimal)], asks: Seq[(BigDecimal, BigDecimal)],
    changes: Seq[(String, BigDecimal, BigDecimal)], // (side, price, qty)
    seq_first: Option[Long], seq_last: Option[Long])

/** Top-of-book emission, one per applied update. `best_*` are None while
  * not Live (reference `market.rs:50-62`). With `order_book(depth)`
  * (reference `market.rs:1227`, ops `market.rs:1123,1162`) `bid_levels`/
  * `ask_levels` carry the top-K (price, qty) image per side, best first —
  * shorter than K when the book is; empty while not Live or at depth 0. */
case class BookTop(
    ts: Long, seq: Long, instrument: String, status: String, applied: String,
    best_bid: Option[BigDecimal], best_bid_qty: Option[BigDecimal],
    best_ask: Option[BigDecimal], best_ask_qty: Option[BigDecimal],
    bid_depth: Int, ask_depth: Int, last_seq: Option[Long], gap_cause: Option[String],
    bid_levels: Seq[(BigDecimal, BigDecimal)] = Nil,
    ask_levels: Seq[(BigDecimal, BigDecimal)] = Nil)

/** Serializable book image for streaming GroupState. */
case class BookStateSnap(
    bids: Seq[(BigDecimal, BigDecimal)], asks: Seq[(BigDecimal, BigDecimal)],
    status: String, lastSeq: Option[Long], gapCause: Option[String],
    pending: Seq[((Seq[(String, BigDecimal, BigDecimal)]), Option[Long], Option[Long])])

/** Order-book state machine — a brand-new Scala derivation of the reference
  * contract (`market.rs:810-1120`, module docs `market.rs:33-83`):
  *   - pre-snapshot deltas buffer (bounded; overflow = gap);
  *   - sequence discontinuity clears the book → Gapped, refuses deltas;
  *   - snapshots only move the book FORWARD (stale ones ignored), except a
  *     gapped book accepts any recovery snapshot;
  *   - a span delta straddling the snapshot id is contiguous;
  *   - zero qty removes a level; best bid/ask None while not live.
  */
final class OrderBookMachine {
  import OrderBookMachine._

  val bids = mutable.TreeMap.empty[BigDecimal, BigDecimal](Ordering[BigDecimal].reverse)
  val asks = mutable.TreeMap.empty[BigDecimal, BigDecimal]
  var status: String = AwaitingSnapshot
  var lastSeq: Option[Long] = None
  var gapCause: Option[String] = None
  val pending = mutable.ArrayBuffer.empty[(Seq[(String, BigDecimal, BigDecimal)], Option[Long], Option[Long])]

  private def gapOut(cause: String): Unit = {
    bids.clear(); asks.clear(); pending.clear()
    lastSeq = None
    status = Gapped
    gapCause = Some(cause)
  }

  private def applyChanges(changes: Seq[(String, BigDecimal, BigDecimal)]): Unit =
    changes.foreach { case (side, px, qty) =>
      val book = if (side == "bid") bids else asks
      if (qty.signum == 0) book.remove(px) else book.update(px, qty)
    }

  def applySnapshot(u: BookUpdateIn): String = {
    // a snapshot the live book already passed would roll it backwards
    if (status == Live && lastSeq.isDefined && u.seq_last.isDefined &&
        u.seq_last.get <= lastSeq.get) return "stale"
    bids.clear(); asks.clear()
    u.bids.foreach { case (p, q) => if (q.signum != 0) bids.update(p, q) }
    u.asks.foreach { case (p, q) => if (q.signum != 0) asks.update(p, q) }
    lastSeq = u.seq_last
    status = Live
    gapCause = None
    // replay what arrived while awaiting; take the buffer first so a gap
    // mid-replay leaves nothing stale for the next snapshot
    val buffered = pending.toSeq
    pending.clear()
    var i = 0
    var result = "applied"
    while (i < buffered.length && !result.startsWith("gap")) {
      val (cs, f, l) = buffered(i)
      val r = applyDelta(cs, f, l)
      if (r.startsWith("gap")) result = r // gap mid-replay aborts the rest
      i += 1
    }
    result
  }

  def applyDelta(changes: Seq[(String, BigDecimal, BigDecimal)],
      first: Option[Long], last: Option[Long]): String = status match {
    case AwaitingSnapshot =>
      if (pending.length >= MaxBufferedDeltas) {
        gapOut(s"buffer_overflow:${pending.length}"); "gap:buffer_overflow"
      } else { pending.append((changes, first, last)); "buffered" }
    case Gapped => "refused" // never build on an image known to be wrong
    case _ =>
      lastSeq match {
        case Some(applied) =>
          (first, last) match {
            case (None, None) => applyChanges(changes); "applied" // unsequenced venue
            case _ =>
              val f = first.orElse(last).get
              val l = last.orElse(first).get
              if (l <= applied) "stale" // wholly covered by current image
              else if (f > applied + 1) {
                gapOut(s"sequence:expected=${applied + 1},got=$f"); "gap:sequence"
              } else { applyChanges(changes); lastSeq = Some(l); "applied" }
          }
        case None => // live but unsequenced snapshot: adopt the delta's ids
          applyChanges(changes); lastSeq = last; "applied"
      }
  }

  def apply(u: BookUpdateIn): String =
    if (u.kind == "snapshot") applySnapshot(u)
    else applyDelta(u.changes, u.seq_first, u.seq_last)

  def top(u: BookUpdateIn, result: String, depth: Int = 0): BookTop = {
    val live = status == Live
    BookTop(u.ts, u.seq, u.instrument, status, result,
      if (live) bids.headOption.map(_._1) else None,
      if (live) bids.headOption.map(_._2) else None,
      if (live) asks.headOption.map(_._1) else None,
      if (live) asks.headOption.map(_._2) else None,
      bids.size, asks.size, lastSeq, gapCause,
      // TreeMap iteration order IS the side's priority order (bids keyed
      // descending, asks ascending), so take(depth) is the top-K image
      if (live && depth > 0) bids.take(depth).toSeq else Nil,
      if (live && depth > 0) asks.take(depth).toSeq else Nil)
  }

  def snapshotState: BookStateSnap =
    BookStateSnap(bids.toSeq, asks.toSeq, status, lastSeq, gapCause, pending.toSeq)
}

object OrderBookMachine {
  val AwaitingSnapshot = "awaiting_snapshot"
  val Live = "live"
  val Gapped = "gapped"
  val MaxBufferedDeltas = 1000

  def restore(s: BookStateSnap): OrderBookMachine = {
    val m = new OrderBookMachine
    s.bids.foreach { case (p, q) => m.bids.update(p, q) }
    s.asks.foreach { case (p, q) => m.asks.update(p, q) }
    m.status = s.status; m.lastSeq = s.lastSeq; m.gapCause = s.gapCause
    m.pending.appendAll(s.pending)
    m
  }
}

/** The order-book operator in both execution modes — the same state machine
  * keyed by instrument, exactly the dual-run contract of the reference
  * (`RunMode`, `runtime/run.rs:16-20`): batch = deterministic replay oracle,
  * streaming = live path with state persisted across micro-batches. */
object OrderBookOp {

  /** Batch: shuffle once on instrument, fold each key in (ts, seq) order.
    * `depth` > 0 emits the top-K level image per side (`order_book(depth)`,
    * reference `market.rs:1227`). */
  def batch(updates: Dataset[BookUpdateIn], depth: Int = 0): Dataset[BookTop] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.instrument)
      .flatMapSortedGroups(col("ts"), col("seq")) { (_, rows) =>
        val m = new OrderBookMachine
        rows.map(u => m.top(u, m.apply(u), depth))
      }
  }

  /** Structured Streaming: same fold via flatMapGroupsWithState; the book
    * image persists in GroupState between micro-batches. Rows are sorted
    * within each batch; cross-batch order is the source's append order —
    * with `Trigger.AvailableNow` over recorded history this reproduces the
    * batch result exactly (SURVEY §5 parity contract). */
  def streaming(updates: Dataset[BookUpdateIn], depth: Int = 0): Dataset[BookTop] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.instrument)
      .flatMapGroupsWithState[BookStateSnap, BookTop](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[BookUpdateIn], state: GroupState[BookStateSnap]) =>
          val m = if (state.exists) OrderBookMachine.restore(state.get) else new OrderBookMachine
          val out = rows.toSeq.sortBy(u => (u.ts, u.seq)).map(u => m.top(u, m.apply(u), depth))
          state.update(m.snapshotState)
          out.iterator
      }
  }
}
