package graft.market

import org.apache.spark.sql.Dataset

/** One market event row — the variant-typed `MarketEvent`
  * (reference `market.rs:692`): `kind` ∈ trade | snapshot | delta.
  * Dual clocks (reference `market.rs:41-48`): `ts` is engine receive time
  * (what replay keys on); `venue_time` is the venue's own clock when sent.
  * Prices/qtys are exact decimals, never doubles (`market.rs:33-40`). */
case class MarketEventRow(
    ts: Long, seq: Long, instrument: String, kind: String,
    venue_time: Option[Long],
    // trade payload (kind = trade; market.rs:579)
    side: Option[String], price: Option[BigDecimal], qty: Option[BigDecimal],
    trade_id: Option[String],
    // book payload (kind = snapshot | delta; market.rs:603,620)
    bids: Seq[(BigDecimal, BigDecimal)], asks: Seq[(BigDecimal, BigDecimal)],
    changes: Seq[(String, BigDecimal, BigDecimal)],
    seq_first: Option[Long], seq_last: Option[Long])

/** A public trade print (reference `Trade`, `market.rs:579`): qty always
  * positive, direction in `side` (the aggressor) when the venue reveals it. */
case class TradeRow(
    ts: Long, seq: Long, instrument: String, side: Option[String],
    price: BigDecimal, qty: BigDecimal, trade_id: Option[String],
    venue_time: Option[Long])

/** The `MarketEventOps` demux (reference `market.rs:1262-1351,1391`):
  * select each variant out of a mixed stream as its typed stream. A pure
  * filter+projection — ticks only on matching variants (Quiet otherwise),
  * so both demuxed streams ride the same scan with no shuffle. */
object MarketEvents {

  /** `trades()` — the trade prints, typed. */
  def trades(ds: Dataset[MarketEventRow]): Dataset[TradeRow] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "trade").map { e =>
      TradeRow(e.ts, e.seq, e.instrument, e.side,
        e.price.getOrElse(BigDecimal(0)), e.qty.getOrElse(BigDecimal(0)),
        e.trade_id, e.venue_time)
    }
  }

  /** `book_updates()` — the snapshots + deltas, as order-book input. */
  def bookUpdates(ds: Dataset[MarketEventRow]): Dataset[BookUpdateIn] = {
    import ds.sparkSession.implicits._
    ds.filter(e => e.kind == "snapshot" || e.kind == "delta").map { e =>
      BookUpdateIn(e.ts, e.seq, e.instrument, e.kind, e.bids, e.asks,
        e.changes, e.seq_first, e.seq_last)
    }
  }
}
