package graft

import graft.ops.Funnel
import org.apache.spark.sql.functions._

/** Randomized gate for the funnel's window-chain formulation: the prefix-
  * minimum trick must equal a brute-force per-key scan on event streams
  * it was never hand-tuned for (bursts, ties, missing stages, step-window
  * misses). Deterministic LCG fixture — the GraphSpec union-find
  * discipline. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  test("window-chain stages equal a brute per-key scan on 2k random events") {
    var st = 987654321L
    def nxt(n: Long): Long = {
      st = st * 6364136223846793005L + 1442695040888963407L; (st >>> 33) % n
    }
    val types = Seq("a", "b", "c", "d")
    val step = 50L
    // 2k events over 40 keys; ts in [0, 400) forces dense ties and
    // step-window hits AND misses; seq is unique (the total order)
    val evs = (0 until 2000).map { i =>
      (s"k${nxt(40)}", nxt(400), i.toLong, types(nxt(4).toInt))
    }
    // brute reference: per key, in (ts, seq) order, advance stage s ->
    // s+1 on the first type(s) event strictly after the anchor within
    // step (stage 0 anchors unconditionally)
    val want: Map[String, Seq[Option[Long]]] = evs.groupBy(_._1).map { case (k, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val reached = Array.fill[Option[Long]](types.length)(None)
      var stage = 0
      var anchor = 0L
      ordered.foreach { case (_, ts, _, t) =>
        if (stage < types.length && t == types(stage) &&
          (stage == 0 || (ts > anchor && ts <= anchor + step))) {
          reached(stage) = Some(ts); anchor = ts; stage += 1
        }
      }
      k -> reached.toSeq
    }
    val df = evs.toDF("key", "ts", "seq", "etype")
    val got = Funnel.stages(df, Seq("key"), "etype", types, step)
      .collect().map { r =>
        r.getString(0) -> types.indices.map(i =>
          Option(r.getAs[java.lang.Long](s"t$i")).map(_.toLong))
      }.toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keys)
      assert(got(k) == want(k), s"key $k: got ${got(k)}, want ${want(k)}")
  }
}
