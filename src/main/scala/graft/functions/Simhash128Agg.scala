package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Four 32-bit hash words — the per-token input AND the per-doc output of
  * the 128-bit SimHash (word w = bits [32w, 32w+32) of the fingerprint). */
final case class Sig128(w0: Long, w1: Long, w2: Long, w3: Long)

/** 128-bit SimHash as a typed `Aggregator`: buffer = 128 ones-counts + n,
  * update/merge are JIT'd primitive loops, finish takes the per-bit
  * majority (bit set iff 2·ones > n — ties clear, matching the ±1-sum
  * convention of the DuckDB oracle).
  *
  * Why typed and not a Column aggregate: the equivalent lane-packed
  * Column formulation (32 packed sums + a 128-term recombine projection)
  * is a ~4,000-node expression tree — measured ~7 s of ONE-TIME Catalyst
  * analysis + codegen per query instance, ~8× the steady-state runtime.
  * The Aggregator is a single ScalaAggregator node (milliseconds to plan),
  * its merge is associative, so partial aggregation / map-side combine
  * still applies — the shuffle carries one 129-int buffer per doc — and
  * Int counters make the per-doc token bound 2^31, so the lane-overflow
  * guard the packed form needs vanishes. */
final class Simhash128Agg extends Aggregator[Sig128, Array[Int], Sig128] {

  def zero: Array[Int] = new Array[Int](129)

  def reduce(b: Array[Int], in: Sig128): Array[Int] = {
    var w = 0
    while (w < 4) {
      val h = w match { case 0 => in.w0; case 1 => in.w1; case 2 => in.w2; case _ => in.w3 }
      var bit = 0
      while (bit < 32) { b(32 * w + bit) += ((h >>> bit) & 1L).toInt; bit += 1 }
      w += 1
    }
    b(128) += 1
    b
  }

  def merge(a: Array[Int], c: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 129) { a(i) += c(i); i += 1 }
    a
  }

  def finish(b: Array[Int]): Sig128 = {
    val n = b(128)
    def word(w: Int): Long = {
      var r = 0L; var bit = 0
      while (bit < 32) { if (2 * b(32 * w + bit) > n) r |= (1L << bit); bit += 1 }
      r
    }
    Sig128(word(0), word(1), word(2), word(3))
  }

  def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  def outputEncoder: Encoder[Sig128] = Encoders.product[Sig128]
}
