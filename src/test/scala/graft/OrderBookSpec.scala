package graft

import graft.market._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Golden suite for the order-book state machine — each case re-derives a
  * reference contract clause (module docs `market.rs:33-83`, state machine
  * `market.rs:810-1120`), plus batch↔streaming parity (SURVEY §5a: the
  * transplanted analog of interpreted-vs-compiled parity). */
class OrderBookSpec extends SparkSuite {

  private def bd(x: Int): BigDecimal = BigDecimal(x)

  private def snap(ts: Long, seq: Long, bids: Seq[(Int, Int)], asks: Seq[(Int, Int)],
      seqLast: Option[Long] = None, instr: String = "A"): BookUpdateIn =
    BookUpdateIn(ts, seq, instr, "snapshot",
      bids.map { case (p, q) => (bd(p), bd(q)) }, asks.map { case (p, q) => (bd(p), bd(q)) },
      Nil, seqLast, seqLast)

  private def delta(ts: Long, seq: Long, changes: Seq[(String, Int, Int)],
      first: Option[Long] = None, last: Option[Long] = None, instr: String = "A"): BookUpdateIn =
    BookUpdateIn(ts, seq, instr, "delta", Nil, Nil,
      changes.map { case (s, p, q) => (s, bd(p), bd(q)) }, first, last)

  private def run(us: Seq[BookUpdateIn]): Seq[BookTop] = {
    val m = new OrderBookMachine
    us.map(u => m.top(u, m.apply(u)))
  }

  test("pre-snapshot deltas buffer, then replay on the snapshot (market.rs:66-77)") {
    val out = run(Seq(
      delta(10, 1, Seq(("bid", 100, 5))),         // buffered — awaiting
      delta(20, 2, Seq(("ask", 101, 3))),         // buffered
      snap(30, 3, Seq((99, 1)), Seq((102, 1)))))  // image + replayed buffer
    assert(out(0).applied == "buffered" && out(0).status == "awaiting_snapshot")
    assert(out(0).best_bid.isEmpty, "no best while not live")
    assert(out(2).applied == "applied" && out(2).status == "live")
    assert(out(2).best_bid.contains(bd(100)) && out(2).best_ask.contains(bd(101)),
      "buffered deltas applied ON TOP of the snapshot image")
    assert(out(2).bid_depth == 2 && out(2).ask_depth == 2)
  }

  test("a snapshot the live book already passed is stale (forward-only, market.rs:flagship)") {
    val out = run(Seq(
      snap(10, 1, Seq((100, 5)), Seq((101, 5)), seqLast = Some(10)),
      delta(20, 2, Seq(("bid", 99, 1)), Some(11), Some(11)),
      snap(30, 3, Seq((50, 1)), Seq((51, 1)), seqLast = Some(8)))) // behind lastSeq=11
    assert(out(2).applied == "stale")
    assert(out(2).best_bid.contains(bd(100)), "stale snapshot must not roll the book back")
    assert(out(2).last_seq.contains(11L))
  }

  test("sequence gap clears the book, Gapped refuses deltas (market.rs:50-62)") {
    val out = run(Seq(
      snap(10, 1, Seq((100, 5)), Seq((101, 5)), seqLast = Some(10)),
      delta(20, 2, Seq(("bid", 99, 1)), Some(13), Some(13)), // expected 11 → gap
      delta(30, 3, Seq(("bid", 98, 1)), Some(14), Some(14)))) // refused while gapped
    assert(out(1).applied == "gap:sequence" && out(1).status == "gapped")
    assert(out(1).best_bid.isEmpty && out(1).bid_depth == 0, "gap clears the image")
    assert(out(1).gap_cause.exists(_.startsWith("sequence:")))
    assert(out(2).applied == "refused", "never build on an image known to be wrong")
  }

  test("any recovery snapshot revives a gapped book (market.rs:810+)") {
    val out = run(Seq(
      snap(10, 1, Seq((100, 5)), Nil, seqLast = Some(10)),
      delta(20, 2, Seq(("bid", 99, 1)), Some(13), Some(13)), // gap
      snap(30, 3, Seq((90, 2)), Seq((91, 2)), seqLast = Some(5)))) // even "older" seq is accepted
    assert(out(2).applied == "applied" && out(2).status == "live")
    assert(out(2).best_bid.contains(bd(90)))
  }

  test("span delta straddling the snapshot id is contiguous (market.rs:79-83)") {
    val out = run(Seq(
      snap(10, 1, Seq((100, 5)), Nil, seqLast = Some(10)),
      delta(20, 2, Seq(("bid", 102, 1)), Some(9), Some(12)))) // 9 ≤ 11 ≤ 12 → contiguous
    assert(out(1).applied == "applied")
    assert(out(1).best_bid.contains(bd(102)) && out(1).last_seq.contains(12L))
  }

  test("delta wholly covered by the image is stale; zero qty removes a level") {
    val out = run(Seq(
      snap(10, 1, Seq((100, 5), (99, 2)), Nil, seqLast = Some(10)),
      delta(20, 2, Seq(("bid", 98, 7)), Some(8), Some(9)),   // last ≤ 10 → stale
      delta(30, 3, Seq(("bid", 100, 0)), Some(11), Some(11)))) // removal
    assert(out(1).applied == "stale" && out(1).bid_depth == 2)
    assert(out(2).best_bid.contains(bd(99)) && out(2).bid_depth == 1)
  }

  test("same-instant burst applies atomically in seq order (market.rs:79-83)") {
    val out = run(Seq(
      snap(10, 1, Nil, Nil),
      delta(20, 2, Seq(("bid", 100, 5))),
      delta(20, 3, Seq(("bid", 101, 2))),
      delta(20, 4, Seq(("bid", 101, 0))))) // same ts: add then remove
    assert(out.map(_.best_bid) ==
      Seq(None, Some(bd(100)), Some(bd(101)), Some(bd(100))),
      "every burst row emits, in order — never coalesced, never latest-wins")
  }

  test("pre-snapshot buffer overflow gaps out (market.rs:66-77 bounded buffer)") {
    val m = new OrderBookMachine
    (1 to OrderBookMachine.MaxBufferedDeltas).foreach { i =>
      assert(m.applyDelta(Seq(("bid", bd(1), bd(1))), Some(i.toLong), Some(i.toLong)) == "buffered")
    }
    val r = m.applyDelta(Seq(("bid", bd(2), bd(1))), None, None)
    assert(r == "gap:buffer_overflow" && m.status == "gapped")
    assert(m.gapCause.exists(_.startsWith("buffer_overflow")))
  }

  test("gap during buffered replay aborts the rest of the buffer") {
    val m = new OrderBookMachine
    m.applyDelta(Seq(("bid", bd(99), bd(1))), Some(11), Some(11)) // contiguous later
    m.applyDelta(Seq(("bid", bd(98), bd(1))), Some(15), Some(15)) // will gap on replay
    m.applyDelta(Seq(("bid", bd(97), bd(1))), Some(16), Some(16)) // must NOT apply
    val r = m.applySnapshot(snap(10, 1, Seq((100, 5)), Nil, seqLast = Some(10)))
    assert(r == "gap:sequence" && m.status == "gapped")
    assert(m.bids.isEmpty, "gap mid-replay clears; nothing stale for the next snapshot")
  }

  test("order_book(depth): top-K level image per side, shorter when the book is (market.rs:1227)") {
    val m = new OrderBookMachine
    val u1 = snap(10, 1, Seq((99, 2), (100, 5)), Seq((101, 1)), seqLast = Some(10))
    val t1 = m.top(u1, m.apply(u1), depth = 3)
    assert(t1.bid_levels == Seq((bd(100), bd(5)), (bd(99), bd(2))),
      "partial book: 2 of 3 bid levels, best first")
    assert(t1.ask_levels == Seq((bd(101), bd(1))), "1 of 3 ask levels")
    val u2 = delta(20, 2, Seq(("bid", 98, 7), ("bid", 97, 1)), Some(11), Some(11))
    val t2 = m.top(u2, m.apply(u2), depth = 3)
    assert(t2.bid_levels == Seq((bd(100), bd(5)), (bd(99), bd(2)), (bd(98), bd(7))),
      "image capped at K even with 4 levels in the book")
    assert(t2.bid_depth == 4, "depth counts the whole book, not the K-image")
    // not live (awaiting snapshot) -> empty level image, like best_*
    val g = new OrderBookMachine
    val u3 = delta(5, 1, Seq(("bid", 1, 1)))
    val t3 = g.top(u3, g.apply(u3), depth = 3)
    assert(t3.bid_levels.isEmpty && t3.ask_levels.isEmpty)
    // depth 0 (the default): no image materialized
    val t4 = m.top(u2, "applied")
    assert(t4.bid_levels.isEmpty && t4.ask_levels.isEmpty)
  }

  test("MarketEvent demux: trades() and book_updates() split a mixed stream (market.rs:1262)") {
    import spark.implicits._
    def trade(ts: Long, seq: Long, px: Int, q: Int): MarketEventRow =
      MarketEventRow(ts, seq, "A", "trade", Some(ts - 1), Some("buy"),
        Some(bd(px)), Some(bd(q)), Some(s"T$seq"), Nil, Nil, Nil, None, None)
    def bookEv(u: BookUpdateIn): MarketEventRow =
      MarketEventRow(u.ts, u.seq, u.instrument, u.kind, None, None, None, None, None,
        u.bids, u.asks, u.changes, u.seq_first, u.seq_last)
    val mixed = spark.createDataset(Seq(
      bookEv(snap(10, 1, Seq((100, 5)), Seq((101, 5)), seqLast = Some(10))),
      trade(15, 2, 100, 3),
      bookEv(delta(20, 3, Seq(("bid", 99, 1)), Some(11), Some(11))),
      trade(25, 4, 101, 2)))

    val t = MarketEvents.trades(mixed).collect().sortBy(_.seq)
    assert(t.map(_.trade_id) === Seq(Some("T2"), Some("T4")))
    assert(t.head.price == bd(100) && t.head.venue_time.contains(14L))

    // the book half feeds the order book unchanged
    val tops = OrderBookOp.batch(MarketEvents.bookUpdates(mixed)).collect().sortBy(_.seq)
    assert(tops.length == 2 && tops.last.best_bid.contains(bd(100)))
    assert(tops.last.bid_depth == 2, "the demuxed delta applied on the snapshot image")
  }

  test("batch and streaming runs produce identical rows (RunMode duality, run.rs:16-20)") {
    import spark.implicits._
    val updates = Seq(
      delta(5, 1, Seq(("bid", 100, 1))),                       // pre-snapshot buffer
      snap(10, 2, Seq((99, 5)), Seq((103, 5)), seqLast = Some(10)),
      delta(20, 3, Seq(("bid", 101, 2)), Some(11), Some(11)),
      delta(20, 4, Seq(("ask", 102, 2)), Some(12), Some(12)),  // burst
      delta(30, 5, Seq(("bid", 101, 0)), Some(13), Some(13)),  // removal
      delta(40, 6, Seq(("bid", 97, 9)), Some(20), Some(20)),   // gap
      snap(50, 7, Seq((95, 1)), Seq((96, 1)), seqLast = Some(21)), // recovery
      delta(60, 8, Seq(("ask", 96, 0)), Some(22), Some(22)),
      // second instrument interleaved: state must stay per-key
      snap(10, 1, Nil, Nil, instr = "B"),
      delta(20, 2, Seq(("bid", 7, 7)), instr = "B"))

    // depth = 2: the K-level image rides every emission, so parity also
    // proves the level arrays survive the GroupState boundary intact
    val batchOut = OrderBookOp.batch(spark.createDataset(updates), depth = 2)
      .collect().sortBy(t => (t.instrument, t.ts, t.seq)).toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BookUpdateIn]
    val q = OrderBookOp.streaming(mem.toDS(), depth = 2)
      .writeStream.format("memory").queryName("book_parity")
      .outputMode("append").start()
    // two micro-batches: state must survive the batch boundary
    mem.addData(updates.take(5)); q.processAllAvailable()
    mem.addData(updates.drop(5)); q.processAllAvailable()
    q.stop()
    val streamOut = spark.table("book_parity").as[BookTop]
      .collect().sortBy(t => (t.instrument, t.ts, t.seq)).toSeq

    assert(streamOut == batchOut, "exact row equality including ts and status")
  }
}
