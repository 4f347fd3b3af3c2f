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
  * entry shares doc_topng's oracle discipline.
  *
  * [[exactQuantiles]]: exact global order statistics by iterative
  * histogram descent (the classical distributed-selection recipe, as
  * deployed by every warehouse engine's exact-median path). The
  * canonical exact plan is a GLOBAL sort — at 100 TB the one plan
  * shape this library bans everywhere else. Here each round is one
  * aggregate whose exchange carries ≤ |ps|·buckets partial rows
  * (map-side combine), narrowing every quantile's candidate range by
  * ~buckets× per round; when a range's population is ≤ cap the
  * values are collected (the capped-model discipline) and the order
  * statistic is read off exactly. Massive ties collapse via the
  * bucket min==max shortcut (a single-valued bucket IS the answer),
  * so Zipf-heavy columns resolve in one round. Exactness never
  * depends on floating-point bucket boundaries: the bucket index is
  * a deterministic monotone function of the value, ranges re-narrow
  * to ACTUAL data values (bucket min/max), and equal values always
  * share a bucket — so the k-th smallest of the narrowed range is
  * the k-th smallest of the corpus by construction. */
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
      // Boxed values on purpose: with a primitive-Long value type,
      // get() on an absent key unboxes null to 0L and the absent-key
      // branch is unreachable — the cap would silently never bind.
      val counts = new java.util.HashMap[String, java.lang.Long](cap * 2)
      var nLoc = 0L
      it.foreach { key =>
        nLoc += 1
        val cur = counts.get(key)
        if (cur ne null) counts.put(key, java.lang.Long.valueOf(cur.longValue + 1))
        else if (counts.size < cap) counts.put(key, java.lang.Long.valueOf(1L))
        else {
          val itr = counts.entrySet().iterator()
          while (itr.hasNext) {
            val e = itr.next()
            if (e.getValue.longValue == 1L) itr.remove()
            else e.setValue(java.lang.Long.valueOf(e.getValue.longValue - 1))
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

  /** The quantile frame (p, value) ordered by p, plus how it resolved:
    * `certified` true = every quantile resolved through the bounded
    * histogram-descent path (≤ cap values ever collected per
    * quantile); false = at least one fell back to a distributed sort
    * of its narrowed range (still exact — the flag records plan
    * boundedness, not answer quality). `rounds` = histogram passes. */
  final case class Quantiles(result: DataFrame, certified: Boolean, rounds: Int)

  /** Exact p-quantiles of `rows(valCol)` as order statistics: for each
    * p, the k-th smallest value with k = floor((n-1)·p) + 1 — the
    * element DuckDB's `row_number ... rn = floor((c-1)*p)+1` picks, so
    * the oracle is plain exact SQL and the returned value is an input
    * value (bit-identical across engines, no rounding contract
    * needed). Nulls are dropped; NaNs must be filtered upstream (both
    * engines order NaN differently). All requested quantiles share
    * each round's single histogram aggregate (one corpus scan per
    * round regardless of |ps|). */
  def exactQuantiles(rows0: DataFrame, valCol: String, ps: Seq[Double],
      buckets: Int = 8192, cap: Int = 100000, maxRounds: Int = 4): Quantiles = {
    val spark = rows0.sparkSession
    require(ps.nonEmpty, "exactQuantiles: ps must be non-empty")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"exactQuantiles: every p must be in [0,1], got $ps")
    require(buckets >= 2 && cap >= 1 && maxRounds >= 0,
      s"exactQuantiles: buckets=$buckets cap=$cap maxRounds=$maxRounds")
    val rows = rows0.select(col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val head0 = rows.agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi")).head()
    val n = head0.getLong(0)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    import scala.jdk.CollectionConverters._
    if (n == 0L)
      return Quantiles(spark.createDataFrame(Seq.empty[Row].asJava, outSchema),
        certified = true, 0)
    // Search state per quantile: the k-th smallest value among rows with
    // v in [lo, hi] (inclusive; pop such rows) is the answer.
    final case class St(p: Double, lo: Double, hi: Double, k: Long, pop: Long,
        done: Option[Double])
    var states: Seq[St] = ps.map { p =>
      val k = math.floor((n - 1).toDouble * p).toLong + 1
      St(p, head0.getDouble(1), head0.getDouble(2), k, n, None)
    }
    // A single-point range IS the answer (every value in it equals lo).
    def closePoints(ss: Seq[St]): Seq[St] = ss.map { s =>
      if (s.done.isEmpty && s.lo == s.hi) s.copy(done = Some(s.lo)) else s
    }
    states = closePoints(states)
    var round = 0
    while (round < maxRounds && states.exists(s => s.done.isEmpty && s.pop > cap)) {
      round += 1
      val actIdx = states.zipWithIndex.collect {
        case (s, i) if s.done.isEmpty && s.pop > cap => i }
      val rangeArr = array(actIdx.map { i =>
        val s = states(i)
        struct(lit(i).as("qi"), lit(s.lo).as("lo"), lit(s.hi).as("hi")) }: _*)
      // Bucket index: clamp(floor(((v-lo)/(hi-lo))·buckets)). The ratio is
      // ≤ 1+ulp for v ≤ hi (fp subtraction/division are monotone), so the
      // least/greatest clamps keep it in [0, buckets-1] with no overflow;
      // equal values always land in the same bucket, distinct values in
      // non-decreasing buckets — the partition is monotone by value.
      val hist = rows.select(col("v"), explode(rangeArr).as("r"))
        .filter(col("v") >= col("r.lo") && col("v") <= col("r.hi"))
        .select(col("r.qi").as("qi"), col("v"),
          least(lit(buckets - 1), greatest(lit(0),
            floor((col("v") - col("r.lo")) / (col("r.hi") - col("r.lo"))
              * buckets).cast("int"))).as("b"))
        .groupBy("qi", "b")
        .agg(count(lit(1)).as("cnt"), min("v").as("bmin"), max("v").as("bmax"))
        .collect()
        .groupBy(_.getInt(0))
      val next = states.toArray
      actIdx.foreach { i =>
        val s = states(i)
        val bs = hist.getOrElse(i, Array.empty[Row]).sortBy(_.getInt(1))
        var cum = 0L
        var j = 0
        var placed = false
        while (j < bs.length && !placed) {
          val cnt = bs(j).getLong(2)
          if (cum + cnt >= s.k) {
            val bmin = bs(j).getDouble(3); val bmax = bs(j).getDouble(4)
            next(i) =
              if (bmin == bmax) s.copy(done = Some(bmin))
              else s.copy(lo = bmin, hi = bmax, k = s.k - cum, pop = cnt)
            placed = true
          } else { cum += cnt; j += 1 }
        }
        require(placed, s"exactQuantiles: rank ${s.k} exceeded range " +
          s"population (histogram saw $cum of ${s.pop}) — data changed between passes?")
      }
      states = next.toSeq
    }
    // Bounded resolution: collect each remaining range (≤ cap values) in
    // one shared scan and read off the k-th smallest locally.
    val small = states.zipWithIndex.collect {
      case (s, i) if s.done.isEmpty && s.pop <= cap => i }
    if (small.nonEmpty) {
      val rangeArr = array(small.map { i =>
        val s = states(i)
        struct(lit(i).as("qi"), lit(s.lo).as("lo"), lit(s.hi).as("hi")) }: _*)
      val vals = rows.select(col("v"), explode(rangeArr).as("r"))
        .filter(col("v") >= col("r.lo") && col("v") <= col("r.hi"))
        .select(col("r.qi").as("qi"), col("v"))
        .collect()
        .groupBy(_.getInt(0))
      val next = states.toArray
      small.foreach { i =>
        val s = states(i)
        val sorted = vals.getOrElse(i, Array.empty[Row]).map(_.getDouble(1)).sorted
        require(s.k >= 1 && s.k <= sorted.length,
          s"exactQuantiles: rank ${s.k} outside collected range of ${sorted.length}")
        next(i) = s.copy(done = Some(sorted(s.k.toInt - 1)))
      }
      states = next.toSeq
    }
    // Fallback (maxRounds exhausted with pop still > cap): exact
    // distributed sort of the NARROWED range — offset+limit, never a
    // full-corpus sort unless round 0 never ran. offset() takes an Int:
    // a narrowed range still holding > 2^31 rows (maxRounds=0, or
    // adversarial ties at the 100 TB scale) would wrap the rank into a
    // negative offset — fail loudly instead (the caller's fix is more
    // rounds or a bigger cap, both of which keep the plan bounded).
    val certified = states.forall(_.done.isDefined)
    val resolved = states.map { s =>
      s.done.getOrElse {
        require(s.k - 1 <= Int.MaxValue,
          s"exactQuantiles: fallback rank ${s.k} exceeds Int offset range — " +
            "raise maxRounds/buckets so the descent narrows below 2^31 rows")
        val r = rows.filter(col("v") >= s.lo && col("v") <= s.hi)
          .orderBy(col("v")).offset((s.k - 1).toInt).limit(1).head()
        r.getDouble(0)
      }
    }
    val out = spark.createDataFrame(
      ps.zip(resolved).sortBy(_._1).map { case (p, v) => Row(p, v) }.asJava, outSchema)
    Quantiles(out, certified, round)
  }

  /** Where a weighted budget runs out when rows are consumed best-first.
    * The keep set is exactly `predicate(score, id)`: every row strictly
    * better than the cut, plus the cut-score rows up to (exclusive) the
    * first id that no longer fits. `certified` true = both descent
    * phases resolved through bounded collects; false = the narrowed
    * range needed the windowed-cumsum fallback (same rows either way). */
  final case class BudgetSelection(scoreCut: Double, idCutExcl: Long,
      keepAll: Boolean, certified: Boolean, rounds: Int) {
    import org.apache.spark.sql.Column
    def predicate(score: Column, id: Column): Column =
      if (keepAll) lit(true)
      else score > scoreCut || (score === scoreCut && id < idCutExcl)
  }

  /** Greedy prefix selection under a weight budget — "take documents in
    * quality order until the token budget is spent", the Llama-style
    * data-curation step. Semantically identical to the windowed cumsum
    * `keep rows where sum(w) OVER (ORDER BY score DESC, id ASC) <=
    * budget` — but THAT plan is a single-partition global sort. Here
    * the same histogram-descent machinery as [[exactQuantiles]] finds
    * the budget boundary: each round one aggregate (≤ buckets partial
    * rows, exact Long weight sums) narrows the score range holding the
    * boundary; a boundary landing inside a tied score group descends
    * again over the group's ids; a final ≤ cap-row collect walks off
    * the exact cut. The result is a two-scalar broadcast predicate —
    * the corpus is then FILTERED at scan speed, never sorted.
    * Weights must be non-negative longs; `idCol` must be unique
    * per row (the tie-break). */
  def budgetSelect(rows0: DataFrame, scoreCol: String, wCol: String,
      idCol: String, budget: Long, buckets: Int = 8192, cap: Int = 100000,
      maxRounds: Int = 6): BudgetSelection = {
    require(budget >= 0, s"budgetSelect: budget=$budget must be >= 0")
    require(buckets >= 2 && cap >= 1 && maxRounds >= 0,
      s"budgetSelect: buckets=$buckets cap=$cap maxRounds=$maxRounds")
    val rows = rows0.select(col(scoreCol).cast("double").as("s"),
      col(wCol).cast("long").as("w"), col(idCol).cast("long").as("id"))
      .filter(col("s").isNotNull && col("w").isNotNull)
    val h0 = rows.agg(count(lit(1)).as("n"), sum("w").as("tw"),
      min("s").as("lo"), max("s").as("hi"), min("w").as("wmin")).head()
    val n = h0.getLong(0)
    if (n == 0L)
      return BudgetSelection(Double.NaN, 0L, keepAll = true, certified = true, 0)
    // A negative weight would silently corrupt every bucket sum and the
    // boundary walk (wrong keep set, no error) — validate in the same h0
    // aggregate that sizes the problem, at zero extra passes.
    require(h0.getLong(4) >= 0L,
      s"budgetSelect: negative weight ${h0.getLong(4)} in $wCol — weights " +
        "must be non-negative (the greedy prefix sum is otherwise undefined)")
    if (budget >= h0.getLong(1))
      return BudgetSelection(Double.NaN, 0L, keepAll = true, certified = true, 0)
    var bRem = budget          // budget left entering the current range
    var lo = h0.getDouble(2); var hi = h0.getDouble(3)
    var pop = n
    var rounds = 0
    // All-equal scores (lo == hi from the start) skip phase 1 entirely —
    // seed the tie group so the phase-2 id descent engages instead of
    // falling through to the windowed-cumsum fallback over the FULL
    // corpus (the exact single-partition shape this op exists to avoid).
    var tieScore: Option[Double] = if (lo == hi) Some(lo) else None
    // ── phase 1: descend on score (consumption order: score DESC) ──
    def hist(frame: DataFrame, v: String, flo: Double, fhi: Double): Array[Row] =
      frame.filter(col(v) >= flo && col(v) <= fhi)
        .select(col(v), col("w"),
          least(lit(buckets - 1), greatest(lit(0),
            floor((col(v) - lit(flo)) / (lit(fhi) - lit(flo)) * buckets)
              .cast("int"))).as("b"))
        .groupBy("b").agg(count(lit(1)).as("cnt"), sum("w").as("sw"),
          min(v).as("bmin"), max(v).as("bmax"))
        .collect().sortBy(_.getInt(0))
    var progress = true
    while (tieScore.isEmpty && pop > cap && rounds < maxRounds && progress && lo < hi) {
      rounds += 1
      val bs = hist(rows, "s", lo, hi)
      var j = bs.length - 1       // walk buckets DESCENDING by score
      var placed = false
      while (j >= 0 && !placed) {
        val sw = bs(j).getLong(2)
        if (bRem >= sw) { bRem -= sw; j -= 1 }
        else {
          val bmin = bs(j).getDouble(3); val bmax = bs(j).getDouble(4)
          if (bmin == bmax) tieScore = Some(bmin)
          else {
            progress = bs(j).getLong(1) < pop || bmin > lo || bmax < hi
            lo = bmin; hi = bmax; pop = bs(j).getLong(1)
          }
          placed = true
        }
      }
      require(placed, "budgetSelect: boundary escaped the tracked range — " +
        "data changed between passes?")
    }
    if (tieScore.isEmpty && pop <= cap) {
      // bounded resolution: the boundary is among ≤ cap rows
      val loc = rows.filter(col("s") >= lo && col("s") <= hi)
        .select("s", "w", "id").collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
        .sortBy { case (s, _, id) => (-s, id) }
      var i = 0
      while (i < loc.length && bRem >= loc(i)._2) { bRem -= loc(i)._2; i += 1 }
      require(i < loc.length, "budgetSelect: collected range fully fit the " +
        "budget — weight accounting drifted")
      return BudgetSelection(loc(i)._1, loc(i)._3, keepAll = false,
        certified = true, rounds)
    }
    if (tieScore.isDefined) {
      // ── phase 2: the boundary is inside one tied score group —
      // descend on id (consumption order: id ASC) within the group.
      // Bucketing is LONG arithmetic throughout (fixed-width buckets via
      // integral `div`): a double-cast id loses exactness past 2^53 and
      // two distinct ids could collapse into one boundary value. ──
      val s0 = tieScore.get
      val grp = rows.filter(col("s") === s0)
      val g0 = grp.agg(count(lit(1)).as("n"), min("id").as("ilo"),
        max("id").as("ihi")).head()
      var ipop = g0.getLong(0)
      var ilo = g0.getLong(1); var ihi = g0.getLong(2)
      var prog2 = true
      while (ipop > cap && rounds < maxRounds && prog2 && ilo < ihi) {
        rounds += 1
        val span = ihi - ilo
        require(span >= 0L, s"budgetSelect: id span [$ilo, $ihi] exceeds " +
          "Long.MaxValue — re-range ids before tie-group descent")
        // width ≥ 1 and > span/buckets, so b = (id-ilo) div width lies in
        // [0, buckets-1]; monotone and exact on the full Long domain.
        val width = span / buckets + 1L
        val bs = grp.filter(col("id") >= ilo && col("id") <= ihi)
          .selectExpr("w", "id", s"CAST((id - ${ilo}L) DIV ${width}L AS INT) AS b")
          .groupBy("b").agg(count(lit(1)).as("cnt"), sum("w").as("sw"),
            min("id").as("bmin"), max("id").as("bmax"))
          .collect().sortBy(_.getInt(0))
        var j = 0                 // walk buckets ASCENDING by id
        var placed = false
        while (j < bs.length && !placed) {
          val sw = bs(j).getLong(2)
          if (bRem >= sw) { bRem -= sw; j += 1 }
          else {
            prog2 = bs(j).getLong(1) < ipop ||
              bs(j).getLong(3) > ilo || bs(j).getLong(4) < ihi
            ilo = bs(j).getLong(3); ihi = bs(j).getLong(4)
            ipop = bs(j).getLong(1)
            placed = true
          }
        }
        require(placed, "budgetSelect: tie-group boundary escaped the range")
      }
      if (ipop <= cap) {
        val loc = grp.filter(col("id") >= ilo && col("id") <= ihi)
          .select("w", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
        var i = 0
        while (i < loc.length && bRem >= loc(i)._1) { bRem -= loc(i)._1; i += 1 }
        require(i < loc.length, "budgetSelect: tie group fully fit — " +
          "weight accounting drifted")
        return BudgetSelection(s0, loc(i)._2, keepAll = false,
          certified = true, rounds)
      }
    }
    // ── fallback: windowed cumsum over the NARROWED range only (exact;
    // single-partition window, but over pop rows, not the corpus) ──
    val range = tieScore match {
      case Some(s0) => rows.filter(col("s") === s0)
      case None     => rows.filter(col("s") >= lo && col("s") <= hi)
    }
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("s").desc, col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cut = range.withColumn("cum", sum("w").over(win))
      .filter(col("cum") > bRem)
      .orderBy(col("s").desc, col("id").asc).limit(1)
      .select("s", "id").head()
    BudgetSelection(cut.getDouble(0), cut.getLong(1), keepAll = false,
      certified = false, rounds)
  }
}
