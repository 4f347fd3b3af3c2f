package graft

import graft.ops.Packing

/** Greedy sequence packing: exact (seq_id, off) assignments on known
  * token streams. */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private def pack(budget: Long, rows: (String, Long, Long)*): Seq[(Long, Long, Long)] =
    Packing.packGreedy(
      rows.toDF("k", "id", "toks"), Seq("k"), "toks", "id", budget)
      .orderBy("k", "id")
      .select("id", "seq_id", "off")
      .as[(Long, Long, Long)].collect().toSeq

  test("rows pack until the budget would be exceeded, then a new sequence opens") {
    // 40+40 fits 100, +40 would be 120 -> new seq; 40+30 fits, +40 = 110 -> new
    val got = pack(100L,
      ("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L), ("a", 4L, 30L), ("a", 5L, 40L))
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 40L), (3L, 1L, 0L), (4L, 1L, 40L), (5L, 2L, 0L)))
  }

  test("an exact fit stays in the sequence (gate is strictly > budget)") {
    val got = pack(100L, ("a", 1L, 60L), ("a", 2L, 40L), ("a", 3L, 1L))
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 60L), (3L, 1L, 0L)))
  }

  test("an oversized row gets a sequence of its own, unsplit") {
    val got = pack(100L, ("a", 1L, 10L), ("a", 2L, 250L), ("a", 3L, 10L))
    assert(got == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L)))
  }

  test("keys pack independently") {
    val got = Packing.packGreedy(
      Seq(("a", 1L, 80L), ("b", 2L, 80L), ("a", 3L, 80L), ("b", 4L, 10L))
        .toDF("k", "id", "toks"), Seq("k"), "toks", "id", 100L)
      .select("k", "id", "seq_id", "off")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 0L, 0L), ("a", 3L, 1L, 0L),
      ("b", 2L, 0L, 0L), ("b", 4L, 0L, 80L)))
  }

  test("zero-token rows never open a new sequence") {
    val got = pack(100L, ("a", 1L, 100L), ("a", 2L, 0L), ("a", 3L, 1L))
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 100L), (3L, 1L, 0L)))
  }

  test("pre-existing ts/seq columns ride through untouched") {
    // the internal sort clock must not clobber caller data named ts/seq
    val in = Seq(("a", 1L, 40L, 111L, 7L), ("a", 2L, 80L, 222L, 8L))
      .toDF("k", "id", "toks", "ts", "seq")
    val out = Packing.packGreedy(in, Seq("k"), "toks", "id", 100L)
      .orderBy("id").select("id", "ts", "seq", "seq_id", "off")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 111L, 7L, 0L, 0L), (2L, 222L, 8L, 1L, 0L)))
  }

  test("a null/uncastable order clock aborts loudly") {
    val in = Seq(("a", "1", 40L), ("a", "oops", 40L)).toDF("k", "id", "toks")
    val e = intercept[Exception] {
      Packing.packGreedy(in, Seq("k"), "toks", "id", 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packGreedy")), s"got: $e")
  }

  test("duplicate order-clock values pack deterministically across runs") {
    // three rows share id=1: the row-hash tiebreaker must give the same
    // (seq_id, off) every run
    val in = Seq(("a", 1L, 60L, "x"), ("a", 1L, 50L, "y"), ("a", 1L, 40L, "z"))
      .toDF("k", "id", "toks", "tag")
    def run() = Packing.packGreedy(in, Seq("k"), "toks", "id", 100L)
      .select("tag", "seq_id", "off").as[(String, Long, Long)].collect().toSet
    val first = run()
    assert((1 to 3).forall(_ => run() == first))
  }
}
