package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (hash, id) candidate for the per-key cap. */
final case class CapIn(h: Long, id: Long)

/** Deterministic per-key cap-K selection as a typed `Aggregator`:
  * keeps the K smallest (h, id) pairs — "at most K docs per domain,
  * chosen by salted hash" (the RefinedWeb-style URL/domain cap,
  * re-keyed to this corpus's `source` column).
  *
  * Why an Aggregator and not `row_number() OVER (PARTITION BY key
  * ORDER BY h, id) <= K`: the window plan shuffles EVERY row to its
  * key's partition and sorts each key's whole group — at 100 TB the
  * exchange is corpus-sized and a hot domain is one giant sorted
  * group. This Aggregator's buffer is a ≤ K-pair sorted array with
  * associative merge, so partial aggregation applies: each map task
  * emits at most K pairs per key it saw, the exchange carries
  * ≤ K·keys·partitions pairs (pruned again at every combine), and no
  * per-key sort ever materializes. The buffer is an interleaved
  * [h0,id0,h1,id1,…] Long array (primitive, no boxing on the hot
  * path); `finish` returns the kept ids in (h, id) order, so
  * `posexplode` downstream yields the same rank row_number would. */
final class CapKAgg(k: Int) extends Aggregator[CapIn, Array[Long], Seq[Long]] {
  require(k >= 1, s"CapKAgg: k=$k must be >= 1")

  def zero: Array[Long] = Array.emptyLongArray

  @inline private def less(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
    h1 < h2 || (h1 == h2 && i1 < i2)

  def reduce(b: Array[Long], in: CapIn): Array[Long] = {
    val n = b.length / 2
    if (n == k && !less(in.h, in.id, b(2 * n - 2), b(2 * n - 1))) return b
    // binary search for the insertion slot among the sorted pairs
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (less(b(2 * mid), b(2 * mid + 1), in.h, in.id)) lo = mid + 1 else hi = mid
    }
    val outN = math.min(n + 1, k)
    val out = new Array[Long](2 * outN)
    System.arraycopy(b, 0, out, 0, 2 * lo)
    out(2 * lo) = in.h; out(2 * lo + 1) = in.id
    System.arraycopy(b, 2 * lo, out, 2 * lo + 2, 2 * outN - 2 * lo - 2)
    out
  }

  def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
    // merge two sorted pair arrays, keep the K smallest
    val na = a.length / 2; val nc = c.length / 2
    val outN = math.min(na + nc, k)
    val out = new Array[Long](2 * outN)
    var i = 0; var j = 0; var o = 0
    while (o < outN) {
      val takeA = j >= nc ||
        (i < na && less(a(2 * i), a(2 * i + 1), c(2 * j), c(2 * j + 1)))
      if (takeA) { out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1 }
      else { out(2 * o) = c(2 * j); out(2 * o + 1) = c(2 * j + 1); j += 1 }
      o += 1
    }
    out
  }

  def finish(b: Array[Long]): Seq[Long] =
    (0 until b.length / 2).map(i => b(2 * i + 1))

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
