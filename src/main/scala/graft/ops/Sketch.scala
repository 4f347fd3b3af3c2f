package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Mergeable-summary sketches whose ANSWERS stay exact — the
  * doc_dedup_bloom discipline (the sketch changes the plan, never the
  * rows) applied to frequency estimation.
  *
  * [[heavyHittersMg]]: corpus-wide top-k keys by count. The canonical
  * wordcount (groupBy + TakeOrderedAndProject) is exact but its
  * exchange carries every DISTINCT key — at 100 TB of web text most
  * n-grams are singletons, so "distinct keys" ≈ "all instances" and
  * the shuffle is corpus-sized. Here a per-partition Misra-Gries
  * summary (Misra & Gries 1982, "Finding repeated elements"; union
  * bound per Agarwal et al. 2012, "Mergeable summaries") reduces each
  * partition to ≤ cap candidate keys with ZERO exchange (the collected
  * summaries are ≤ (cap+1)·partitions rows — a KB..MB driver artifact,
  * the capped-model discipline shared with the Bloom filter and the
  * quantizer codebooks); a second pass recounts ONLY the candidate
  * union (broadcast semi-join prunes at the scan, so the aggregate's
  * exchange carries ≤ cap·partitions distinct keys). Exactness is then
  * MACHINE-CHECKED, not assumed: any key with true count > N/(cap+1)
  * must survive some partition's summary (if every local count were ≤
  * N_i/(cap+1), the global count would be ≤ N/(cap+1)), so when the
  * k-th recounted candidate exceeds that threshold, no non-candidate
  * can reach the top-k — ties included, since every key tied at the
  * k-th count also clears the threshold and is therefore a candidate.
  * When the certificate fails (near-uniform data — the sketch's
  * adversarial case), the op falls back to the canonical exact plan:
  * the answer is byte-identical either way, which is why the registry
  * entry shares doc_topng's oracle discipline. */
object Sketch {

  /** The top-k frame (keyCol, cnt), plus how it was produced:
    * `certified` true = the Misra-Gries certificate proved the sketch
    * path exact; false = fell back to the full groupBy. `nTotal` is
    * the instance count the threshold was checked against,
    * `nCandidates` the size of the recounted union. */
  final case class HeavyHitters(top: DataFrame, certified: Boolean,
      nTotal: Long, nCandidates: Int)

  /** Exact top-k keys of `rows(keyCol)` by occurrence count, ties
    * broken by key ascending. Keys are compared AS STRINGS — the frame
    * is cast up front, so both the certified and the fallback path
    * return a StringType keyCol (for a non-string column the cast is
    * one value → one string, so the counts are the column's own).
    * `rows` must not contain null keys (a null never beats a real
    * heavy hitter; filter upstream). `cap` is the per-partition
    * summary capacity — the certificate passes iff the k-th heaviest
    * count exceeds N/(cap+1), so size cap ≈ a few × N/f_k for the
    * expected skew (Zipf text: small; uniform keys: the fallback is
    * the right plan and the sketch pass just proved it). */
  def heavyHittersMg(rows: DataFrame, keyCol: String, k: Int, cap: Int): HeavyHitters = {
    val spark = rows.sparkSession
    import spark.implicits._
    require(k >= 1, s"heavyHittersMg: k=$k must be >= 1")
    require(cap >= k, s"heavyHittersMg: cap=$cap must be >= k=$k")
    val strRows = rows.select(col(keyCol).cast("string").as(keyCol))
    val keyed = strRows.select(col(keyCol).as("k")).as[String]
    // pass 1: per-partition Misra-Gries. One (None, N_i) row per
    // partition carries the instance count; candidate rows carry keys.
    val summaries = keyed.mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long](cap * 2)
      var nLoc = 0L
      it.foreach { key =>
        nLoc += 1
        val cur = counts.get(key)
        if (cur != null) counts.put(key, cur + 1)
        else if (counts.size < cap) counts.put(key, 1L)
        else {
          val itr = counts.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1)
          }
        }
      }
      import scala.jdk.CollectionConverters._
      Iterator.single((Option.empty[String], nLoc)) ++
        counts.keySet().iterator().asScala.map(kk => (Option(kk), 0L))
    }.collect()
    val nTotal = summaries.collect { case (None, c) => c }.sum
    val cands = summaries.collect { case (Some(s), _) => s }.distinct.toSeq
    def exactPlan: DataFrame = strRows
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol)).limit(k)
    if (cands.isEmpty) return HeavyHitters(exactPlan, certified = false, nTotal, 0)
    // pass 2: exact recount of the candidate union only — the semi-join
    // prunes non-candidates AT the scan side of the aggregate
    val top = strRows.join(broadcast(cands.toDF(keyCol)), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol)).limit(k)
      .collect()
    val certified = top.length == k &&
      top.last.getLong(1).toDouble > nTotal.toDouble / (cap + 1)
    if (certified) {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyCol,
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false)))
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        top.map(r => Row(r.getString(0), r.getLong(1))).toSeq.asJava, schema)
      HeavyHitters(df, certified = true, nTotal, cands.size)
    } else HeavyHitters(exactPlan, certified = false, nTotal, cands.size)
  }
}
