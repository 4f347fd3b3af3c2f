package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity primitives. Vectors are `array<float>` columns
  * (cast to double at the boundary). The LSH path is the 100 TB strategy:
  * bucket on deterministic random-hyperplane signs, join within buckets
  * only. Vector math note: Spark has no codegen'd array dot product —
  * `zip_with`/`aggregate` lambdas run in the interpreted evaluator — so
  * the hot pair-scoring path uses a primitive-loop UDF (measured faster
  * than the HOF tree-walk by ~an order of magnitude) and the bucket-sign
  * path uses an exploded broadcast-join aggregate that IS codegen'd. */
object Similarity {

  /** Max rows in [[pqTopK]]'s broadcast ADC query-distance table
    * (#queries × m × ksub, ~40 B/row → ~400 MB at the cap — inside
    * Spark's 8 GB broadcast limit with headroom for the driver to hold
    * build + serialized copies). Exceeding it means the query batch is
    * corpus-sized and the broadcast ADC formulation is the wrong plan. */
  val PqAdcBroadcastRowCap: Long = 10L * 1000 * 1000

  /** [[cosineDedupIvf]]'s target vectors-per-cell: the default cell count
    * is ⌈n / occupancy⌉, so candidate pairs per vector (occupancy ×
    * nProbe) are CONSTANT and total dedup work is O(n). 64 balances the
    * two linear terms: smaller cells mean more centroids to score per
    * vector (assignment, n × nCent × dim) and a bigger plan-time model;
    * bigger cells mean more pairs through the verify filter (n × occ ×
    * nProbe). */
  val DedupCellOccupancy: Int = 64

  /** Cap on the coarse-quantizer model held on the driver (centroids ×
    * dim doubles — 64 MB as doubles at the cap). [[cosineDedupIvf]]'s
    * n/occupancy flat model stays far under it at tested scales, but it
    * grows linearly: at dim 64 the cap trips near 8M vectors, which
    * should fail loudly and route the caller to a coarser or hierarchical
    * trained model (same frame contract, higher occupancy + more probes),
    * not silently balloon the driver and every task closure. */
  val QuantizerModelMaxDoubles: Long = 8L * 1024 * 1024

  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Probe the vector dimension from the frame's first row, NULL-safely.
    * An empty frame probes 0 (callers short-circuit to an empty result);
    * a NULL or empty first `embedding` aborts with a readable message —
    * `size(NULL)` is null, and reading it unguarded throws a bare
    * NullPointerException while every downstream `checked` path already
    * renders NULL sizes readably. */
  private[graft] def probeDim(df: DataFrame): Int =
    df.select(coalesce(size(col("embedding")), lit(-1))).take(1).headOption
      .map(_.getInt(0)) match {
      case None => 0
      case Some(d) if d > 0 => d
      case Some(_) => throw new IllegalArgumentException(
        "probeDim: first row's embedding is NULL or empty — clean the input or pass dimHint")
    }

  /** Top-`nTop` centroids of `v` by (4dp-rounded cosine DESC, cid ASC) —
    * the exact ranking every IVF assignment/probe in this file uses (the
    * rounding makes the DuckDB oracle's replay bit-stable) — computed
    * WITHOUT paying the exact decimal rounding per centroid. The naive
    * form (round all k, sort tuples) allocates a BigDecimal + boxed
    * tuples per (row × centroid): at the 100× scale check that was 625M
    * BigDecimals per assignment pass and measured 50–145 s/pass where
    * the raw dot products are ~40 Gflops (~seconds). Here the scoring
    * loop is allocation-free primitive math, and the exact rounding +
    * ranking runs only over the centroids that can still reach the
    * rounded top-nTop: rounded values live on the 1e-4 grid, so any
    * centroid in the final top-nTop — or tied with one — has a rounded
    * value ≥ round(t), t the nTop-th RAW score, hence a raw score
    * ≥ round(t) − 5e-5 ≥ t − 1e-4. The 1.1e-4 margin adds ulp slack.
    * Output is bit-identical to the naive form — proven by the oracle
    * hash gate, which replays these probe sets exactly. */
  private def topByRounded(cents: Array[(Long, Array[Double], Double)],
      v: Array[Double], nv: Double, nTop: Int): Seq[(Long, Double)] = {
    val kk = cents.length
    val raw = new Array[Double](kk)
    var i = 0
    while (i < kk) {
      val c = cents(i)
      val w = c._2; val nw = c._3
      var d = 0.0; var j = 0
      while (j < w.length) { d += v(j) * w(j); j += 1 }
      raw(i) = if (nv == 0 || nw == 0) 0.0 else d / (nv * nw)
      i += 1
    }
    // nTop-th largest raw score via a small insertion buffer
    val top = Array.fill(math.min(nTop, kk))(Double.NegativeInfinity)
    i = 0
    while (i < kk) {
      val x = raw(i)
      if (x > top(top.length - 1)) {
        var j = top.length - 1
        while (j > 0 && top(j - 1) < x) { top(j) = top(j - 1); j -= 1 }
        top(j) = x
      }
      i += 1
    }
    val thresh = top(top.length - 1) - 1.1e-4
    val cand = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    i = 0
    while (i < kk) {
      if (raw(i) >= thresh)
        cand += ((cents(i)._1, BigDecimal(raw(i) + 1e-9)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      i += 1
    }
    cand.sortBy { case (cid, cs) => (-cs, cid) }.take(nTop).toSeq
  }

  /** The three shared plan-time-model assignment UDFs — ONE definition of
    * the norm + [[topByRounded]] loop (one boxed→primitive copy per row,
    * allocation-free scoring) shared by every flat/hier/deep/kmeans/
    * incremental assignment and probe path, so the rounding/tie-break
    * discipline can never desynchronize between them (round-12 review:
    * five hand-maintained copies had accreted). */
  private def bestCellAffUdf(cents: Array[(Long, Array[Double], Double)]) =
    udf { (v: Seq[Double]) =>
      val va = v.toArray
      var n2 = 0.0; var i = 0
      while (i < va.length) { n2 += va(i) * va(i); i += 1 }
      val best = topByRounded(cents, va, math.sqrt(n2), 1).head
      (best._1, best._2)
    }

  private def bestCellUdf(cents: Array[(Long, Array[Double], Double)]) =
    udf { (v: Seq[Double]) =>
      val va = v.toArray
      var n2 = 0.0; var i = 0
      while (i < va.length) { n2 += va(i) * va(i); i += 1 }
      topByRounded(cents, va, math.sqrt(n2), 1).head._1
    }

  private def topCellsUdf(cents: Array[(Long, Array[Double], Double)], nTop: Int) =
    udf { (v: Seq[Double]) =>
      val va = v.toArray
      var n2 = 0.0; var i = 0
      while (i < va.length) { n2 += va(i) * va(i); i += 1 }
      topByRounded(cents, va, math.sqrt(n2), nTop).map(_._1).toSeq
    }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine as a primitive-loop UDF. Spark's higher-order-function lambdas
    * are interpreted (an expression-tree walk per ELEMENT); for a 64-dim
    * pair that is ~200 tree walks vs one JIT'd loop here. Used on the hot
    * pair-scoring paths; [[cosine]] stays for Column-API composition. */
  private[graft] val cosLoop = udf { (a: Seq[Double], b: Seq[Double]) =>
    var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    while (i < n) { val x = a(i); val y = b(i); d += x * y; na += x * x; nb += y * y; i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Driver-side md5-prefix hash, identical to [[TextFunctions.hash60]]. */
  private def hash60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic pseudo-random hyperplane for (plane, dim): components
    * hash60("plane:i") mapped to [-1e6, 1e6], materialized as PLAN-TIME
    * literals — zero hashing at runtime (round 1 recomputed one md5 per
    * component × plane × row). No stored model; any executor rebuilds the
    * same planes. */
  def planeVec(plane: Int, dim: Int): Seq[Double] =
    (0 until dim).map(i => ((hash60Local(s"$plane:$i") % 2000001L) - 1000000L).toDouble)

  /** Sign bit of vec · hyperplane(plane). */
  def hyperplaneSign(vec: Column, plane: Int, dim: Int): Column = {
    val p = array(planeVec(plane, dim).map(lit(_)): _*)
    val d = aggregate(zip_with(vec, p, (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
    when(d >= 0, lit(1)).otherwise(lit(0))
  }

  /** Random-hyperplane LSH bucket key over `nPlanes` planes: concatenated
    * sign bits. Cosine-similar vectors collide with high probability. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    concat((0 until nPlanes).map(p => hyperplaneSign(vec, p, dim).cast("string")): _*)

  /** Brute-force cosine top-k: every query row against every candidate row.
    * Correctness baseline; O(|Q|·|C|) — at scale use [[annTopK]]. */
  def bruteTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
    val c = candidates.select(col("vec_id").as("nid"), toDouble(col("embedding")).as("nv"))
    val sims = q.join(c, col("qid") =!= col("nid"))
      .withColumn("sim", cosLoop(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(round(col("sim") + lit(1e-9), 4).desc, col("nid"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim") + lit(1e-9), 4).as("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** (id, table, bucket) rows for `nTables` independent LSH tables (table t
    * uses planes [t*nPlanes, (t+1)*nPlanes)). Bucket = integer of the sign
    * bits — bijective to the concatenated sign string, so the grouping is
    * identical to the reference formulation.
    *
    * Shape: posexplode the vector once, broadcast-join the (plane, dim,
    * weight) literals, hash-aggregate the per-plane dots, fold the sign
    * bits — every stage whole-stage-codegen'd with map-side combine. The
    * per-row HOF fold ([[hyperplaneSign]]) runs in Spark's interpreted
    * lambda evaluator: planes×dim evals per row measured ~4x slower at
    * bench scale. */
  private def tableBucketRows(df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int, nTables: Int, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val planeRows = for {
      p <- 0 until nPlanes * nTables
      (w, i) <- planeVec(p, dim).zipWithIndex
    } yield (p, i, w)
    import spark.implicits._
    val planes = planeRows.toDF("p", "i", "w")
    // vecCol is already array<double> (checked/toDouble at the caller)
    df.select(col(idCol), posexplode(col(vecCol))).toDF(idCol, "i", "x")
      .join(broadcast(planes), "i")
      .groupBy(col(idCol), col("p"))
      .agg(sum(col("x") * col("w")).as("d"))
      .groupBy(col(idCol), (col("p") / nPlanes).cast("int").as("table"))
      .agg(sum(expr(s"shiftleft(CAST(CASE WHEN d >= 0 THEN 1 ELSE 0 END AS BIGINT), " +
        s"CAST(p % $nPlanes AS INT))")).as("bucket"))
  }

  /** Embedding-cosine near-dup pairs (the fifth dedup flavor next to
    * exact / MinHash / SimHash / n-gram Jaccard): all pairs with rounded
    * cosine ≥ tau among candidates that share an LSH bucket in ANY of the
    * `nTables` tables. Unlike the SimHash banding there is no pigeonhole
    * completeness — hyperplane LSH is probabilistic (recall
    * 1-(1-p^nPlanes)^nTables, gated by the frozen recall spec); the
    * oracle replicates the plan-time-literal planes, so the reported
    * pairs are still EXACTLY checkable.
    *
    * Scale shape — verify BEFORE dedup (the simhash-dedup lesson): a
    * near-dup tau deep in the random-cosine tail keeps buckets selective,
    * but a LOOSE tau (like the testdata's 0.4, ~3σ of random 64-dim
    * cosines) makes the candidate set DENSE — at sf0.1 the bucket join
    * emits ~6M pairs for 920 survivors. So the bucket rows carry their
    * vectors PRE-NORMALIZED AND BYTE-PACKED (#vecs × nTables rows — tiny
    * next to the pair volume), the cosine cut runs INSIDE the join stage
    * as a primitive dot loop over two byte arrays, and only survivors
    * reach the dedup exchange. Candidates that fail tau never shuffle
    * anywhere. Why byte-packed: a Seq[Double] UDF boxes every element
    * per candidate (~5 s of the measured 6.6 s at sf0.1) and a dim-term
    * element_at Column expression lands in the join-condition
    * interpreter (measured 24 s); BinaryType crosses the UDF boundary as
    * a raw byte array — the loop reads unboxed doubles straight out of
    * it (measured ~2 s). The tau cut applies to the 4dp-ROUNDED cosine
    * so both engines agree at the boundary. */
  def cosineDedupLsh(vecs: DataFrame, tau: Double, nPlanes: Int,
      nTables: Int = 8, dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint
      else probeDim(vecs)
    if (dim == 0)
      return vecs.sparkSession.emptyDataFrame
        .select(lit(0L).as("a"), lit(0L).as("b"), lit(0.0).as("cos"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"cosineDedupLsh: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    // unit-normalize + pack once per bucket row: cosine then = plain dot
    val cvn = cv.withColumn("vp", packUnit(col("v"))).select("id", "vp")
    val bk = tableBucketRows(cv, "id", "v", nPlanes, nTables, dim).join(cvn, "id")
    val ba = bk.select(col("table"), col("bucket"), col("id").as("a"), col("vp").as("pa"))
    val bb = bk.select(col("table"), col("bucket"), col("id").as("b"), col("vp").as("pb"))
    ba.join(bb, Seq("table", "bucket")).where(col("a") < col("b"))
      .withColumn("cos", round(
        org.apache.spark.sql.GraftColumns.dotPacked(col("pa"), col("pb")) + lit(1e-9), 4))
      .where(col("cos") >= tau)
      .select("a", "b", "cos")
      .dropDuplicates("a", "b")
  }

  /** IVF cell-bucketed cosine near-dup pairs — the SCALE flavor of
    * [[cosineDedupLsh]] (which is asymptotically n²/2^nPlanes: fixed
    * planes mean fixed buckets, so occupancy — and with it candidate
    * pairs per bucket — grows quadratically with the corpus; raising
    * planes to compensate collapses recall at low tau because a plane's
    * collision probability for cos 0.4 is only ~0.63. Measured at the
    * 10× scale check: 17× wall on 10× rows).
    *
    * Here the bucket count GROWS with the corpus so OCCUPANCY stays
    * CONSTANT: nCent = ⌈n / [[DedupCellOccupancy]]⌉ sample centroids (the
    * nCent lowest hash60(vec_id)s — same pure-function-of-input quantizer as
    * [[ivfTopK]], so the DuckDB oracle replays assignment exactly; a
    * trained [[kmeansModel]] drops in unchanged). Every vector lives in
    * its nearest cell (rounded cosine, ties to the lowest cid) and probes
    * its `nProbe` nearest; a pair is a candidate when either side's HOME
    * cell is probed by the other. Verified pairs = rounded packed-dot
    * cosine ≥ tau, exactly like the LSH flavor.
    *
    * Scale shape — both halves LINEAR in n (the round-7 √n-centroid
    * formulation was O(n^1.5) and the round-8 100× check measured it
    * 54× per decade with an OOM'd verify stage; both lessons are encoded
    * here):
    *  - candidates ~ n × occupancy × nProbe with occupancy a CONSTANT —
    *    the SemDeDup-style bound with k ∝ n rather than k = √n;
    *  - the verify never ships a vector per PAIR and never materializes
    *    the candidate-id set: home rows and probe rows each carry their
    *    packed vector ONCE through the cell-keyed shuffle (n and
    *    n×nProbe rows — linear), the per-cell pair expansion happens
    *    INSIDE the join's streamed output straight into the codegen'd
    *    dot + tau filter, and distinct() runs only over pairs that
    *    already passed tau (the true near-dups). The round-7 shape
    *    instead distinct'd ~n×occ×nProbe candidate ids (535M rows at the
    *    100× check) and re-attached a 8·dim-byte payload per pair
    *    (~280 GB through the verify join — the measured OOM).
    * A skewed cell (one giant near-dup cluster) concentrates one task;
    * AQE skew-join splitting handles it on a real cluster, and the
    * trained quantizer keeps cells balanced by construction. Cost: the
    * flat plan-time model is nCent×dim doubles = n/occupancy×dim — under
    * [[QuantizerModelMaxDoubles]] to ~8M vectors at dim 64; beyond, pass
    * a coarser trained model (higher occupancy + more probes) or a
    * hierarchical quantizer with the same frame contract — the loud
    * `require` routes there. Recall is a cluster-coherence bet rather
    * than a random-hyperplane bet — gated against brute force like every
    * ANN entry. */
  def cosineDedupIvf(vecs: DataFrame, tau: Double, nProbe: Int = 2,
      nCent: Int = -1, dimHint: Int = -1,
      model: Seq[(Long, Array[Double])] = Nil, nHint: Long = -1L): DataFrame = {
    val dim = if (dimHint > 0) dimHint
      else probeDim(vecs)
    if (dim == 0)
      return vecs.sparkSession.emptyDataFrame
        .select(lit(0L).as("a"), lit(0L).as("b"), lit(0.0).as("cos"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"cosineDedupIvf: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    // assignment via a plan-time model + ONE JIT'd loop per row — NOT the
    // [[cellAffinity]] exploded join: n/occ centroids put n×nCent×dim
    // ROWS through that join (182M at the 10× check, measured 127 s vs
    // ~13 s for this loop doing the same flops). The model is nCent×dim
    // doubles (25 KB at 20k vectors) serialized into the closure — the
    // same broadcast-model discipline as [[pqEncoders]]/[[kmeansModel]];
    // norms precomputed once. Rounded 4dp (shared +1e-9 HALF_UP) BEFORE
    // the (cs desc, cid) ranking so the oracle replays probe sets
    // exactly.
    def withNorm(cid: Long, w: Array[Double]): (Long, Array[Double], Double) = {
      var nw = 0.0; var i = 0
      while (i < w.length) { nw += w(i) * w(i); i += 1 }
      (cid, w, math.sqrt(nw))
    }
    // a trained kmeansModel drops in for the sample quantizer unchanged.
    // The sample is SALTED — ordered by hash60(id), not by id — so an id
    // order that correlates with cluster structure (append-time ordering,
    // label-sorted exports) cannot skew the centroids toward one region;
    // the hash tie-breaks to id, keeping the sample a pure, oracle-
    // replayable function of the input.
    // the cell count (and hence the sizing count() when no nCent/nHint is
    // given) is needed ONLY on the sample path: with a caller-supplied
    // model this query runs zero extra corpus scans before useful work —
    // at 100 TB the old unconditional vecs.count() was a full pass spent
    // computing a number the model branch never read
    val cents: Array[(Long, Array[Double], Double)] =
      if (model.nonEmpty) model.map { case (cid, w) => withNorm(cid, w) }.toArray
      else {
        val k = if (nCent > 0) nCent else {
          val n = if (nHint > 0) nHint else vecs.count()
          math.max(1, math.ceil(n.toDouble / DedupCellOccupancy).toInt)
        }
        cv.orderBy(TextFunctions.hash60(col("id").cast("string")), col("id")).limit(k)
          .collect().map(r => withNorm(r.getLong(0), r.getSeq[Double](1).toArray))
      }
    require(cents.length.toLong * dim <= QuantizerModelMaxDoubles,
      s"cosineDedupIvf: quantizer model ${cents.length} centroids x $dim dims exceeds " +
        s"the $QuantizerModelMaxDoubles-double driver/closure cap — train a smaller " +
        "kmeansModel, or switch to hierQuantizer + cosineDedupIvfHier (the " +
        "driver then holds only the top level; leaves stay distributed)")
    // verify via the cell-keyed self-join, exactly [[cosineDedupLsh]]'s
    // (table, bucket) shape: each row crosses the shuffle WITH its packed
    // vector — once on the home side (n rows) and once per probe
    // (n×nProbe rows), both linear — and the per-cell home×probe pair
    // expansion only ever exists inside the join's streamed output,
    // flowing straight into the codegen'd packed-dot + tau filter. The
    // dedup (same pair via both directions or several shared cells) runs
    // AFTER the filter, over true near-dup pairs only. dotPacked is
    // symmetric bit-for-bit (same products, same summation order), so
    // duplicates agree on cos and dropDuplicates keeps result semantics
    // exact. Round 7 instead distinct'd the (a,b) candidate-id set
    // (n×occ×nProbe rows — 535M at the 100× check) and re-attached the
    // packed payload per PAIR through a second join (~280 GB of shuffle
    // at 100× — the measured OOM + 54×-per-decade wall).
    val packed = ivfProbeFrame(cv, cents, nProbe)
    val homes = packed.select(element_at(col("pcs"), 1).as("cell"),
      col("id").as("m"), col("vp").as("pm"))
    val probers = packed.select(explode(col("pcs")).as("cell"),
      col("id").as("p"), col("vp").as("pp"))
    homes.join(probers, "cell").where(col("m") =!= col("p"))
      .withColumn("cos", round(
        org.apache.spark.sql.GraftColumns.dotPacked(col("pm"), col("pp")) + lit(1e-9), 4))
      .where(col("cos") >= tau)
      .select(least(col("m"), col("p")).as("a"),
        greatest(col("m"), col("p")).as("b"), col("cos"))
      .dropDuplicates("a", "b")
  }

  /** The (id, pcs, vp) probe frame behind [[cosineDedupIvf]]: per row,
    * the [[topByRounded]] nProbe-cell probe list plus the packed unit
    * vector. Package-visible so scale probes can time this pass in
    * isolation. */
  private[graft] def ivfProbeFrame(cv: DataFrame,
      cents: Array[(Long, Array[Double], Double)], nProbe: Int): DataFrame = {
    val nP = nProbe
    val probeU = topCellsUdf(cents, nP)
    cv.withColumn("pcs", probeU(col("v")))
      .withColumn("vp", packUnit(col("v")))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): cluster the embeddings with a trained coarse
    * quantizer, compare pairs ONLY within a cluster, and among semantic
    * duplicates (rounded cosine ≥ tau) KEEP the example with the LOWEST
    * cosine to its cluster centroid — the paper's diversity-preserving
    * keep rule (the member farthest from the cluster core survives; its
    * redundant near-copies drop). The rule here is the pairwise form — a
    * row drops iff SOME same-cell duplicate outranks it on
    * (aff ASC, id ASC) — which needs no transitive closure, so the whole
    * decision is one self-join plus an aggregation.
    *
    * Distinct from [[cosineDedupIvf]]: that op ENUMERATES near-dup pairs
    * across probed neighbor cells (recall-oriented); this one makes
    * per-row KEEP/DROP decisions within home cells only (the paper's
    * formulation — cross-cluster duplicates are the quantizer's job to
    * co-locate), returning a decision row per input vector.
    *
    * Scale shape: the model is plan-time (nCent×dim doubles, capped by
    * [[QuantizerModelMaxDoubles]] — past ~8M vectors train a coarser
    * model, i.e. raise the occupancy, exactly as the require says);
    * assignment is
    * one JIT'd loop per row; the pairwise stage is the constant-occupancy
    * cell-keyed self-join (O(n·occupancy) pairs, vectors packed into the
    * join rows — no per-pair payload re-attach), and the drop set rides
    * the same cell exchange. Everything ranks on 4dp-rounded values with
    * id tie-breaks, so the DuckDB oracle replays training, assignment,
    * and every keep/drop decision exactly.
    *
    * Returns (vec_id, cell, aff, keep) — one row per input vector.
    * Reference semantics: the reference engine has no embedding ops; this
    * extends the dedup family per the builder brief (SemDeDup is the
    * published cluster-then-prune recipe used on LAION/C4-scale corpora). */
  def semDedup(vecs: DataFrame, tau: Double,
      model: Seq[(Long, Array[Double])], dimHint: Int = -1): DataFrame = {
    require(model.nonEmpty, "semDedup: pass a trained quantizer model (kmeansModel)")
    val dim = if (dimHint > 0) dimHint else probeDim(vecs)
    if (dim == 0)
      return vecs.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"),
          lit(0.0).as("aff"), lit(true).as("keep"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"semDedup: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    val cents = model.map { case (cid, w) => withNorm3(cid, w) }.toArray
    require(cents.length.toLong * dim <= QuantizerModelMaxDoubles,
      s"semDedup: quantizer model ${cents.length} centroids x $dim dims exceeds the " +
        s"$QuantizerModelMaxDoubles-double driver/closure cap — train a smaller model " +
        "or assign cells via hierQuantizer descent")
    // home cell + centroid affinity in ONE JIT'd loop per row (the
    // kmeansLoop/cosineDedupIvf assignment discipline), packed unit
    // vector alongside so the pairwise join needs no second payload join
    val assignU = bestCellAffUdf(cents)
    val asg = cv.withColumn("bc", assignU(col("v")))
      .select(col("id"), col("bc._1").as("cell"), col("bc._2").as("aff"),
        packUnit(col("v")).as("vp"))
    semDedupPrune(asg, asg.select("id", "cell", "aff"), tau)
  }

  /** The SemDeDup within-cell pairwise prune + keep rule, shared verbatim
    * by [[semDedup]] and [[semDedupHier]] so the decision semantics
    * cannot drift between the flat and hier paths (the nTop=1
    * flat≡hier spec pins only one config; the shared code pins all).
    *
    * `asg` is (id, cell, aff, vp): both sides hash-partition on cell
    * (constant occupancy ⇒ O(n·occ) streamed pairs), cosine scored by the
    * codegen'd DotPacked inside the join output, the outranking filter
    * ((aff ASC, id ASC) — any outranking dup ⇒ drop) fused before
    * anything materializes. `decisions` is the (id, cell, aff) frame the
    * keep flag lands on — passed separately so the hier caller can hand
    * its pre-vp-join assignment and keep the final leg free of the
    * payload join. Returns (vec_id, cell, aff, keep). */
  private def semDedupPrune(asg: DataFrame, decisions: DataFrame,
      tau: Double): DataFrame =
    attachKeep(decisions, semDedupDrops(asg, tau))

  /** The drop set of the within-cell pairwise prune: distinct ids with an
    * outranking same-cell duplicate. */
  private def semDedupDrops(asg: DataFrame, tau: Double): DataFrame = {
    val mine = asg.select(col("cell"), col("id"), col("aff"), col("vp"))
    val others = asg.select(col("cell"), col("id").as("oid"),
      col("aff").as("oaff"), col("vp").as("ovp"))
    mine.join(others, "cell").where(col("id") =!= col("oid"))
      .withColumn("cos", round(
        org.apache.spark.sql.GraftColumns.dotPacked(col("vp"), col("ovp")) + lit(1e-9), 4))
      .where(col("cos") >= tau)
      .where(col("oaff") < col("aff") ||
        (col("oaff") === col("aff") && col("oid") < col("id")))
      .select(col("id")).distinct()
  }

  /** keep = id ∉ drops, attached to the (id, cell, aff) decision frame. */
  private def attachKeep(decisions: DataFrame, drops: DataFrame): DataFrame =
    decisions.join(drops.withColumn("dropped", lit(true)), Seq("id"), "left")
      .select(col("id").as("vec_id"), col("cell"), col("aff"),
        coalesce(!col("dropped"), lit(true)).as("keep"))

  /** [[semDedup]] through a [[HierQuantizer]] — the >8M-vector SemDeDup
    * path. The flat variant's model is nCent×dim driver-held doubles with
    * O(n·nCent·dim) assignment flops — at constant occupancy that is
    * O(n²·dim/occ), the same two walls [[cosineDedupIvf]] hits near 8M
    * vectors. Here home-cell assignment is the shared greedy descent
    * ([[hierDescent]] with nProbeTop=1, nPerBranch=1): one JIT'd loop
    * over the driver-held top model picks the home branch, a linear
    * equi-join on `branch` scores ONLY that branch's leaves, and the best
    * leaf is the home cell with its 4dp-rounded cosine as the affinity —
    * ~2√k scored centroids per vector instead of k, leaves never in a
    * closure. The within-cell prune and the keep rule are IDENTICAL to
    * [[semDedup]] (same rounding, same (aff ASC, id ASC) outranking), so
    * with nTop=1 the two paths agree bit-for-bit (spec-pinned) and the
    * DuckDB oracle replays every decision.
    *
    * Returns (vec_id, cell, aff, keep) — one row per input vector. */
  def semDedupHier(vecs: DataFrame, tau: Double, hq: HierQuantizer,
      dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(vecs)
    if (dim == 0 || hq.top.isEmpty)
      return vecs.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"),
          lit(0.0).as("aff"), lit(true).as("keep"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"semDedupHier: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    // home assignment: best leaf of the home branch (slot 0 with
    // nProbeTop=1), exactly the home rule of [[cosineDedupIvfHier]]
    val asgFlat = hierDescent(cv, hq, nProbeTop = 1, nPerBranch = 1)
      .select(col("id"), col("cell"), col("cs").as("aff"))
    val asg = asgFlat.join(cv.select(col("id"), packUnit(col("v")).as("vp")), "id")
    semDedupPrune(asg, asgFlat, tau)
  }

  /** Incremental (daily-batch) [[semDedup]] — the form a production
    * pipeline actually runs: the corpus was deduplicated once, its
    * decisions and cell assignments are STORED, and each day only the new
    * batch is judged against the frozen quantizer and the kept corpus.
    * Nothing about the existing corpus is recomputed: `existing` is the
    * stored kept frame `(vec_id, cell, embedding)` (cells from the prior
    * run), touched exactly once as a cell-keyed projection feeding the
    * batch-cell equi-join — no re-assignment pass, no corpus-wide window,
    * no old×old pairs.
    *
    * Keep rule (documented extension of Abbas et al. 2023 to the
    * incremental setting): a batch vector is dropped iff (a) ANY kept
    * corpus vector in its home cell has cosine ≥ tau — committed corpus
    * rows always outrank arrivals, or (b) an outranking batch vector in
    * its home cell has cosine ≥ tau, under exactly [[semDedup]]'s
    * (aff ASC, id ASC) rule — so with an EMPTY corpus the op reduces
    * bit-for-bit to [[semDedup]] on the batch (spec-pinned). Everything
    * rides 4dp-rounded cosines, so the DuckDB oracle replays the frozen
    * model, both drop legs, and every decision.
    *
    * Scale shape: batch assignment is one plan-time-model JIT loop per
    * NEW row (zero corpus flops); both drop legs hash-partition on cell —
    * the corpus side ships only (cell, packed-unit) at constant
    * occupancy, so the day's cost is O(|batch|·occ), independent of
    * corpus size except for the one stored-frame scan.
    *
    * Returns (vec_id, cell, aff, keep) — one row per BATCH vector. */
  def semDedupIncremental(existing: DataFrame, batch: DataFrame, tau: Double,
      model: Seq[(Long, Array[Double])], dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(batch)
    // empty frozen model (prior corpus was empty) degrades to the
    // family's empty decision frame, like the hq.top.isEmpty siblings
    if (dim == 0 || model.isEmpty)
      return batch.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"),
          lit(0.0).as("aff"), lit(true).as("keep"))
        .where(lit(false))
    def checked(op: String)(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"$op: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = batch.select(col("vec_id").as("id"),
      checked("semDedupIncremental")(col("embedding")).as("v"))
    val cents = model.map { case (cid, w) => withNorm3(cid, w) }.toArray
    require(cents.length.toLong * dim <= QuantizerModelMaxDoubles,
      s"semDedupIncremental: quantizer model ${cents.length} centroids x $dim dims " +
        s"exceeds the $QuantizerModelMaxDoubles-double driver/closure cap — train a " +
        "smaller model or assign cells via hierQuantizer descent")
    val asg = incrementalAssign(cv, cents)
    // leg (a): the ONE touch of the corpus — (cell, packed-unit)
    // projection equi-joined to the batch's cells
    val ex = incrementalCorpus(existing,
      checked("semDedupIncremental.existing"))
    val corpusDrops = asg.select(col("cell"), col("id"), col("vp"))
      .join(ex, "cell")
      .withColumn("cos", round(
        org.apache.spark.sql.GraftColumns.dotPacked(col("vp"), col("ovp")) + lit(1e-9), 4))
      .where(col("cos") >= tau)
      .select(col("id")).distinct()
    // leg (b): the standard within-cell prune over the batch alone
    val drops = semDedupDrops(asg, tau).union(corpusDrops).distinct()
    attachKeep(asg.select("id", "cell", "aff"), drops)
  }

  /** [[semDedupIncremental]] through a [[HierQuantizer]] — the >8M-vector
    * incremental path: the flat form trains an n/64-centroid model whose
    * assignment is the measured O(n²·dim/occ) wall (278 s at 300× for the
    * registry config); here the batch's home cells come from the shared
    * greedy descent (~2√k scored centroids per arrival, leaves never
    * collected) and BOTH drop legs are identical to the flat op — the
    * corpus leg reads the same stored (cell, packed-unit) projection, the
    * within-batch leg is the shared [[semDedupDrops]] prune. The stored
    * corpus cells must come from the SAME frozen hq (the prior
    * [[semDedupHier]] run), exactly as the flat twin's come from its
    * frozen flat model. Returns (vec_id, cell, aff, keep) per BATCH row. */
  def semDedupIncrementalHier(existing: DataFrame, batch: DataFrame,
      tau: Double, hq: HierQuantizer, dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(batch)
    if (dim == 0 || hq.top.isEmpty)
      return batch.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"),
          lit(0.0).as("aff"), lit(true).as("keep"))
        .where(lit(false))
    def checked(op: String)(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"$op: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = batch.select(col("vec_id").as("id"),
      checked("semDedupIncrementalHier")(col("embedding")).as("v"))
    // home = best leaf of the home branch (nProbeTop=1, nPerBranch=1 ⇒
    // exactly one row per id, the semDedupHier home rule)
    val asgFlat = hierDescent(cv, hq, nProbeTop = 1, nPerBranch = 1)
      .select(col("id"), col("cell"), col("cs").as("aff"))
    val asg = asgFlat.join(cv.select(col("id"), packUnit(col("v")).as("vp")), "id")
    val ex = incrementalCorpus(existing,
      checked("semDedupIncrementalHier.existing"))
    val corpusDrops = asg.select(col("cell"), col("id"), col("vp"))
      .join(ex, "cell")
      .withColumn("cos", round(
        org.apache.spark.sql.GraftColumns.dotPacked(col("vp"), col("ovp")) + lit(1e-9), 4))
      .where(col("cos") >= tau)
      .select(col("id")).distinct()
    val drops = semDedupDrops(asg, tau).union(corpusDrops).distinct()
    attachKeep(asgFlat, drops)
  }

  /** [[semanticDecontaminate]] through a [[HierQuantizer]] — the
    * >8M-vector decontamination path (the flat form's trained model is
    * the measured 235 s-at-300× assignment wall). Corpus vectors home via
    * the width-1 descent; the small eval side descends with
    * (nProbeTop, nProbe) fan and takes its global top-nProbe cells; the
    * cross check is the same packed-unit cell equi-join. Returns
    * (vec_id, cell, aff, keep) over the CORPUS. */
  def semanticDecontaminateHier(corpus: DataFrame, evalSet: DataFrame,
      tau: Double, hq: HierQuantizer, nProbe: Int = 4, nProbeTop: Int = 2,
      dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(corpus)
    if (dim == 0 || hq.top.isEmpty)
      return corpus.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"),
          lit(0.0).as("aff"), lit(true).as("keep"))
        .where(lit(false))
    def checked(op: String)(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"$op: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cvC = corpus.select(col("vec_id").as("id"),
      checked("semanticDecontaminateHier")(col("embedding")).as("v"))
    val homes = hierDescent(cvC, hq, nProbeTop = 1, nPerBranch = 1)
      .select(col("id"), col("cell"), col("cs").as("aff"))
    val asg = homes.join(cvC.select(col("id"), packUnit(col("v")).as("vp")), "id")
    val probes = evalProbeFrameHier(evalSet, hq, nProbe, nProbeTop, dim)
    attachKeep(homes, decontamHits(asg, probes, tau))
  }

  /** The frozen eval-probe projection — (cell, evp): each eval vector's
    * `nProbe` probed cells with its packed unit vector. In the
    * incremental/streaming setting this frame is computed ONCE from the
    * frozen quantizer + frozen eval suite and STORED; every daily batch
    * equi-joins against it without touching the eval set again (the
    * eval-side twin of [[incrementalCorpus]]'s one-touch projection). */
  def evalProbeFrame(evalSet: DataFrame, model: Seq[(Long, Array[Double])],
      nProbe: Int = 4, dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(evalSet)
    if (dim == 0 || model.isEmpty)
      return evalSet.sparkSession.emptyDataFrame
        .select(lit(0L).as("cell"), lit(Array.empty[Byte]).as("evp"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"evalProbeFrame: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cents = model.map { case (cid, w) => withNorm3(cid, w) }.toArray
    require(cents.length.toLong * dim <= QuantizerModelMaxDoubles,
      s"evalProbeFrame: quantizer model ${cents.length} centroids x $dim dims " +
        s"exceeds the $QuantizerModelMaxDoubles-double driver/closure cap")
    ivfProbeFrame(
      evalSet.select(col("vec_id").as("id"), checked(col("embedding")).as("v")),
      cents, nProbe)
      .select(explode(col("pcs")).as("cell"), col("vp").as("evp"))
  }

  /** [[evalProbeFrame]] through a [[HierQuantizer]]: the eval side
    * descends with (nProbeTop, nProbe) fan and keeps its global
    * top-`nProbe` cells. Same (cell, evp) contract. */
  def evalProbeFrameHier(evalSet: DataFrame, hq: HierQuantizer,
      nProbe: Int = 4, nProbeTop: Int = 2, dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(evalSet)
    if (dim == 0 || hq.top.isEmpty)
      return evalSet.sparkSession.emptyDataFrame
        .select(lit(0L).as("cell"), lit(Array.empty[Byte]).as("evp"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"evalProbeFrameHier: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cvE = evalSet.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cs").desc, col("cell"))
    hierDescent(cvE, hq, nProbeTop, nProbe)
      .withColumn("rn", row_number().over(wCell)).where(col("rn") <= nProbe)
      .select(col("id").as("eid"), col("cell"))
      .join(cvE.select(col("id").as("eid"), packUnit(col("v")).as("evp")), "eid")
      .select(col("cell"), col("evp"))
  }

  /** The decontamination hit set: corpus/batch rows reached by an eval
    * probe in their home cell at rounded cosine ≥ tau — ONE definition
    * shared by the bootstrap, hier, and incremental ops so the decision
    * semantics cannot drift (the [[semDedupPrune]] discipline). `asg` is
    * (id, cell, vp); `evalProbes` is [[evalProbeFrame]]'s (cell, evp). */
  private def decontamHits(asg: DataFrame, evalProbes: DataFrame,
      tau: Double): DataFrame =
    asg.select(col("cell"), col("id"), col("vp")).join(evalProbes, "cell")
      .withColumn("cos", round(
        org.apache.spark.sql.GraftColumns.dotPacked(col("vp"), col("evp")) + lit(1e-9), 4))
      .where(col("cos") >= tau)
      .select(col("id")).distinct()

  /** Incremental (daily-batch) [[semanticDecontaminate]] — the form a
    * production pipeline actually runs: the quantizer and the eval suite
    * are FROZEN, the eval probes were computed once ([[evalProbeFrame]])
    * and stored, and each day only the NEW batch is screened. Batch rows
    * home via the frozen-model JIT loop (zero eval-side work); the only
    * join is the batch-cell equi-join against the stored probe frame —
    * the day's cost is O(|batch|·occ + |hits|), independent of both the
    * historical corpus and the eval set's size beyond the one stored-
    * frame scan. Arrivals never affect each other (the eval set alone
    * decides), so the op is embarrassingly incremental — the streaming
    * twin ([[graft.streaming.DecontamStream]]) is STATELESS, unlike the
    * dedup family's. With batch = the full corpus this reduces
    * bit-for-bit to [[semanticDecontaminate]] (spec-pinned).
    *
    * Returns (vec_id, cell, aff, keep) per BATCH row — keep = false
    * means contaminated. */
  def semanticDecontaminateIncremental(batch: DataFrame, evalProbes: DataFrame,
      tau: Double, model: Seq[(Long, Array[Double])],
      dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(batch)
    if (dim == 0 || model.isEmpty)
      return batch.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"),
          lit(0.0).as("aff"), lit(true).as("keep"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(
          lit(s"semanticDecontaminateIncremental: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cents = model.map { case (cid, w) => withNorm3(cid, w) }.toArray
    require(cents.length.toLong * dim <= QuantizerModelMaxDoubles,
      s"semanticDecontaminateIncremental: quantizer model ${cents.length} centroids x " +
        s"$dim dims exceeds the $QuantizerModelMaxDoubles-double driver/closure cap")
    val asg = incrementalAssign(
      batch.select(col("vec_id").as("id"), checked(col("embedding")).as("v")), cents)
    attachKeep(asg.select("id", "cell", "aff"), decontamHits(asg, evalProbes, tau))
  }

  /** [[semanticDecontaminateIncremental]] through a [[HierQuantizer]] —
    * the >8M-vector incremental path: arrivals home via the shared
    * width-1 greedy descent (~2√k scored centroids, leaves never
    * collected) against the FROZEN hq; the stored probe frame comes from
    * [[evalProbeFrameHier]] over the same hq. Returns (vec_id, cell,
    * aff, keep) per BATCH row. */
  def semanticDecontaminateIncrementalHier(batch: DataFrame,
      evalProbes: DataFrame, tau: Double, hq: HierQuantizer,
      dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(batch)
    if (dim == 0 || hq.top.isEmpty)
      return batch.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"),
          lit(0.0).as("aff"), lit(true).as("keep"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(
          lit(s"semanticDecontaminateIncrementalHier: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = batch.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    val homes = hierDescent(cv, hq, nProbeTop = 1, nPerBranch = 1)
      .select(col("id"), col("cell"), col("cs").as("aff"))
    val asg = homes.join(cv.select(col("id"), packUnit(col("v")).as("vp")), "id")
    attachKeep(homes, decontamHits(asg, evalProbes, tau))
  }

  /** Embedding-space decontamination — the SEMANTIC twin of the n-gram
    * `doc_decontaminate`: an eval-suite member's paraphrase shares no
    * 4-gram but sits next to it in embedding space, so a corpus vector is
    * dropped when a PROBING eval vector reaches it at rounded cosine ≥
    * tau. Same machinery as the dedup family: corpus vectors home into
    * their trained-quantizer cell (one plan-time-model loop per row),
    * eval vectors probe their `nProbe` nearest cells (the eval side is
    * small by construction — a benchmark suite — so the extra probe fan
    * costs eval×nProbe rows, not corpus work), and the cross check is one
    * cell equi-join scoring packed units with the codegen'd DotPacked.
    * Everything rides 4dp-rounded cosines, so the DuckDB oracle replays
    * the model, both assignments, and every decision.
    *
    * Returns (vec_id, cell, aff, keep) over the CORPUS — keep = false
    * means contaminated. */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame, tau: Double,
      model: Seq[(Long, Array[Double])], nProbe: Int = 4,
      dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(corpus)
    // empty model (kmeansModel of an empty corpus returns Nil) degrades
    // to the family's empty decision frame, like hq.top.isEmpty siblings
    if (dim == 0 || model.isEmpty)
      return corpus.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"),
          lit(0.0).as("aff"), lit(true).as("keep"))
        .where(lit(false))
    def checked(op: String)(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"$op: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cents = model.map { case (cid, w) => withNorm3(cid, w) }.toArray
    require(cents.length.toLong * dim <= QuantizerModelMaxDoubles,
      s"semanticDecontaminate: quantizer model ${cents.length} centroids x $dim dims " +
        s"exceeds the $QuantizerModelMaxDoubles-double driver/closure cap")
    val asg = incrementalAssign(
      corpus.select(col("vec_id").as("id"),
        checked("semanticDecontaminate")(col("embedding")).as("v")), cents)
    val evalProbes = evalProbeFrame(evalSet, model, nProbe, dim)
    attachKeep(asg.select("id", "cell", "aff"), decontamHits(asg, evalProbes, tau))
  }

  /** [[semDedupIncremental]]'s batch-assignment frame — (id, cell, aff,
    * vp) via the frozen-model JIT loop + packed unit vector. Shared with
    * the streaming twin ([[graft.streaming.SemDeDupStream]]) so both
    * execution modes assign identically. */
  private[graft] def incrementalAssign(cv: DataFrame,
      cents: Array[(Long, Array[Double], Double)]): DataFrame = {
    val assignU = bestCellAffUdf(cents)
    cv.withColumn("bc", assignU(col("v")))
      .select(col("id"), col("bc._1").as("cell"), col("bc._2").as("aff"),
        packUnit(col("v")).as("vp"))
  }

  /** The stored corpus as its (cell, packed-unit) projection — the one
    * touch [[semDedupIncremental]] makes, also the streaming twin's
    * initial per-cell state. */
  private[graft] def incrementalCorpus(existing: DataFrame,
      check: Column => Column): DataFrame =
    existing.select(col("cell"), check(col("embedding")).as("ov"))
      .select(col("cell"), packUnit(col("ov")).as("ovp"))

  /** Public helpers for the streaming twin's spec/driver glue: build the
    * frozen-model closure array and the assignment frame from raw
    * (vec_id, embedding) rows. */
  private[graft] def incrementalAssignFrame(batch: DataFrame,
      model: Seq[(Long, Array[Double])], dim: Int): DataFrame = {
    require(model.nonEmpty,
      "incrementalAssignFrame: pass the frozen quantizer model (kmeansModel)")
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"incrementalAssignFrame: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = batch.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    incrementalAssign(cv, model.map { case (cid, w) => withNorm3(cid, w) }.toArray)
  }

  /** [[ivfProbeFrame]] from a raw embeddings frame + trained model (the
    * scale-probe entry point). */
  private[graft] def probeFrameForTest(vecs: DataFrame,
      model: Seq[(Long, Array[Double])], nProbe: Int, dimHint: Int): DataFrame = {
    val cv = vecs.select(col("vec_id").as("id"),
      toDouble(col("embedding")).as("v"))
    val cents = model.map { case (cid, w) =>
      var nw = 0.0; var i = 0
      while (i < w.length) { nw += w(i) * w(i); i += 1 }
      (cid, w, math.sqrt(nw))
    }.toArray
    ivfProbeFrame(cv, cents, nProbe)
  }

  /** Two-level coarse quantizer: the scale path past the flat model's
    * [[QuantizerModelMaxDoubles]] driver cap. `top` is the TRAINED
    * top-level model — nTop×dim doubles on the driver/in closures, the
    * only part that ever leaves the cluster — and `leaves` is a
    * DISTRIBUTED frame `(branch, cid, cw)` of per-branch leaf centroids
    * that is only ever equi-joined on `branch`, never collected. The flat
    * model walls twice near 8M vectors at dim 64 (driver model n/64×dim
    * doubles trips the cap; assignment is O(n·k·dim) = O(n²·dim/occ)
    * flops); here the driver holds √k-ish centroids and a vector scores
    * nTop + Σ|leaves(probed branches)| centroids — √-growth per decade
    * instead of linear (recursing the same construction over `leaves`
    * gives log-depth constant work; not needed below ~10^10 vectors). */
  case class HierQuantizer(top: Seq[(Long, Array[Double])], leaves: DataFrame) {
    @transient @volatile private var released0 = false
    /** True once [[unpersist]] ran — the quantizer must no longer be used. */
    def released: Boolean = released0
    /** Release the distributed half of the model: unpersist the leaf
      * frame's storage blocks (no-op when nothing is cached) and mark the
      * quantizer dead — any later descent fails loudly instead of
      * silently recomputing (or worse, quietly serving) a released model.
      * Long-lived apps training several quantizers call this when done;
      * Bench/Verify's per-query clearCache() covers the harness paths. */
    def unpersist(): Unit = { released0 = true; leaves.unpersist() }
    private[functions] def requireLive(op: String): Unit =
      require(!released0,
        s"$op: HierQuantizer used after unpersist() — retrain the model")
  }

  private def withNorm3(cid: Long, w: Array[Double]): (Long, Array[Double], Double) = {
    var nw = 0.0; var i = 0
    while (i < w.length) { nw += w(i) * w(i); i += 1 }
    (cid, w, math.sqrt(nw))
  }

  /** Train a [[HierQuantizer]]: top level = the seeded Lloyd trainer
    * ([[kmeansModel]], JIT'd loop assignment — init is the nTop lowest
    * hash60(vec_id)s, so the DuckDB oracle replays every pass); leaf level = a
    * per-branch SALTED sample, `⌈branchSize / occupancy⌉` leaves per
    * branch picked by the lowest hash60(vec_id) (id tie-break) WITHIN the
    * branch — the same id-order-bias defense as the flat sample, and a
    * pure function of the input.
    *
    * Scale shape: the only collect is the top model (nTop×dim doubles).
    * Branch assignment is one JIT'd loop per row against that model; the
    * leaf sample is a per-branch window row_number + count — one hash
    * exchange on `branch`, reused by [[cosineDedupIvfHier]]'s leaf join.
    * Nothing downstream depends on n through the driver. */
  def hierQuantizer(vecs: DataFrame, nTop: Int, occupancy: Int, iters: Int,
      dimHint: Int = -1): HierQuantizer = {
    require(nTop > 0 && occupancy > 0 && iters > 0,
      s"hierQuantizer: nTop=$nTop occupancy=$occupancy iters=$iters must be positive")
    val top = kmeansModel(vecs, nTop, iters, dimHint, loopAssign = true)
    val dim = if (dimHint > 0) dimHint else probeDim(vecs)
    if (dim == 0)
      return HierQuantizer(Nil, vecs.sparkSession.emptyDataFrame
        .select(lit(0L).as("branch"), lit(0L).as("cid"),
          array().cast("array<double>").as("cw")).where(lit(false)))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"hierQuantizer: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    val topArr = top.map { case (cid, w) => withNorm3(cid, w) }.toArray
    val branchU = bestCellUdf(topArr)
    val asg = cv.withColumn("branch", branchU(col("v")))
    val wIn = org.apache.spark.sql.expressions.Window.partitionBy("branch")
    val wSalt = wIn.orderBy(TextFunctions.hash60(col("id").cast("string")), col("id"))
    val leaves = asg
      .withColumn("rn", row_number().over(wSalt))
      .withColumn("n", count(lit(1)).over(wIn))
      .where(col("rn") <= ceil(col("n") / lit(occupancy.toDouble)))
      .select(col("branch"), col("id").as("cid"), col("v").as("cw"))
    // EMPTY branches are dropped from the top model (a Lloyd centroid can
    // end with zero assigned members — e.g. duplicate-heavy data where
    // ties send everything to the lowest cid): a branch with no members
    // has no leaves, and [[hierDescent]]'s leaf join would silently DROP
    // any out-of-training row (an incremental arrival, an external query)
    // whose argmax lands there — row loss, not just recall loss. Dropping
    // the branch instead makes every descent target leaf-bearing. For
    // IN-training rows nothing changes: a training vector's argmax branch
    // contains at least itself, so its winner is never an empty branch
    // (which is why the in-training oracles replay identically).
    val nonEmpty = leaves.select("branch").distinct()
      .collect().map(_.getLong(0)).toSet
    HierQuantizer(top.filter { case (cid, _) => nonEmpty(cid) }, leaves)
  }

  /** [[cosineDedupIvf]] through a [[HierQuantizer]] — the >8M-vector
    * dedup path. Per row: ONE JIT'd loop over the driver-held top model
    * picks the `nProbeTop` best branches (rounded 4dp cosine desc, cid
    * ties — the greedy IVF tree descent); the row then scores ONLY those
    * branches' leaves, fetched by a linear equi-join on `branch` against
    * the distributed leaf frame (grouped once per branch; the leaf model
    * never enters a closure). Home cell = best leaf of the FIRST (home)
    * branch; probe cells = global top `nProbe` leaves across the probed
    * branches (per-branch top-nProbe truncation is lossless for that
    * ranking). Verify = the same streamed cell-keyed self-join as
    * [[cosineDedupIvf]]: payloads cross once per row, pairs exist only
    * inside the join's streamed output, dedup runs after the tau filter.
    *
    * All ranking is on 4dp-rounded cosines with lowest-cid ties, and the
    * leaf sample/trained top are pure functions of the input, so the
    * DuckDB oracle replays branch descent, leaf probing, and verify
    * EXACTLY. */
  def cosineDedupIvfHier(vecs: DataFrame, tau: Double, hq: HierQuantizer,
      nProbe: Int = 4, nProbeTop: Int = 2, dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(vecs)
    if (dim == 0 || hq.top.isEmpty)
      return vecs.sparkSession.emptyDataFrame
        .select(lit(0L).as("a"), lit(0L).as("b"), lit(0.0).as("cos"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"cosineDedupIvfHier: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    val flat = hierDescent(cv, hq, nProbeTop, nProbe)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cs").desc, col("cell"))
    val wRun = wAll.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    // ONE shared id-partitioned window pass ranks the probe cells AND
    // flags the home row (the first slot-0 row in the same (cs desc,
    // cell) order — identical to ranking the slot-0 subset alone): both
    // consumers then read the SAME exchange, so the descent (branch join
    // + leaf scoring, the dominant phase) computes ONCE (ReusedExchange),
    // not once per consumer — filtering slot=0 below a second window
    // would have re-run it. The running count keeps the window free of
    // a group-limit, so a home cell outside the global top-nProbe is
    // still found.
    val ranked = flat
      .withColumn("rn", row_number().over(wAll))
      .withColumn("h0", sum(when(col("slot") === 0, 1).otherwise(0)).over(wRun))
    // each consumer's filter references BOTH window columns (one side via
    // an always-true guard): column pruning would otherwise drop the
    // unused column from that branch's Window node, de-canonicalizing the
    // two subtrees so NO planner could ever share them. With the guards
    // the static planner's ReuseExchangeAndSubquery computes the descent
    // ONCE (AQE's runtime stage cache currently misses across
    // cached-relation-rooted stages — reuse-eligibility is still the
    // right shape to pin, and PlanAuditSpec gates both properties)
    val probes = ranked.where(col("rn") <= nProbe && col("h0") >= 0)
      .select(col("id").as("p"), col("cell"))
    val homes = ranked.where(col("slot") === 0 && col("h0") === 1 && col("rn") >= 1)
      .select(col("id").as("m"), col("cell"))
    val packed = cv.select(col("id"), packUnit(col("v")).as("vp"))
    val hp = homes.join(packed, col("m") === col("id"))
      .select(col("cell"), col("m"), col("vp").as("pm"))
    val pp = probes.join(packed, col("p") === col("id"))
      .select(col("cell"), col("p"), col("vp").as("pp"))
    hp.join(pp, "cell").where(col("m") =!= col("p"))
      .withColumn("cos", round(
        org.apache.spark.sql.GraftColumns.dotPacked(col("pm"), col("pp")) + lit(1e-9), 4))
      .where(col("cos") >= tau)
      .select(least(col("m"), col("p")).as("a"),
        greatest(col("m"), col("p")).as("b"), col("cos"))
      .dropDuplicates("a", "b")
  }

  /** The greedy two-level descent shared by [[cosineDedupIvfHier]] and
    * [[ivfTopKHier]]: for each `(id, v)` row, ONE JIT'd loop over the
    * driver-held top model picks the `nProbeTop` best branches (slot 0 =
    * the home branch); the row then scores ONLY those branches' leaves —
    * fetched by a linear equi-join on `branch` against the distributed
    * leaf frame, grouped once per branch with precomputed norms — and
    * keeps the per-branch top `nPerBranch`. Output: (id, slot, cell, cs)
    * leaf-score rows, every cs 4dp-rounded, ready for the home/probe
    * window ranks. The leaf model never enters a closure. */
  private def hierDescent(cv: DataFrame, hq: HierQuantizer, nProbeTop: Int,
      nPerBranch: Int): DataFrame = {
    hq.requireLive("hierDescent")
    val topArr = hq.top.map { case (cid, w) => withNorm3(cid, w) }.toArray
    val nPT = nProbeTop
    val branchesU = topCellsUdf(topArr, nPT)
    val ex = cv.withColumn("pbs", branchesU(col("v")))
      .select(col("id"), col("v"), posexplode(col("pbs")))
      .toDF("id", "v", "slot", "branch")
    // leaves grouped in PACKED form (round 21, guide §4): the per-leaf
    // binary blob makes the per-(row, branch) UDF input conversion one
    // array copy per leaf instead of dim boxed Doubles — see
    // [[packedScoreUdf]], which also documents why the scoring stays
    // bit-identical. collect_list's arrival order is nondeterministic
    // but irrelevant: topByRounded ranks on (rounded cos desc, cid) — a
    // total order (cids unique) — so the result is a pure function of
    // the SET, which is what the oracle replay proves at every SF.
    // Per-branch top-nPerBranch truncation is lossless for the global
    // (cs desc, cid) rank.
    val leafArr = hq.leaves
      .withColumn("nw", norm(col("cw")))
      .groupBy("branch")
      .agg(collect_list(struct(col("cid"), packRaw(col("cw")).as("pw"), col("nw"))).as("lc"))
    val scoreU = packedScoreUdf(nPerBranch)
    ex.join(leafArr, "branch")
      .select(col("id"), col("slot"), explode(scoreU(col("v"), col("lc"))).as("cc"))
      .select(col("id"), col("slot"), col("cc._1").as("cell"), col("cc._2").as("cs"))
  }

  /** IVF-Flat ANN top-k through a [[HierQuantizer]] — [[ivfTopK]] for the
    * >8M-vector regime, same contract (exact rounded-cosine rank within
    * the probed cells, ties to the lowest nid): candidates land in their
    * greedy-descent home cell, queries probe the global top `nProbe`
    * leaves across their `nProbeTop` best branches, candidate pairs flow
    * as BARE ids through the cell equi-join, and vectors re-attach to
    * survivors only. Driver/closure cost is nTop×dim doubles — the leaf
    * model stays a distributed frame. */
  def ivfTopKHier(queries: DataFrame, candidates: DataFrame, k: Int,
      hq: HierQuantizer, nProbe: Int = 4, nProbeTop: Int = 2,
      dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(candidates)
    if (dim == 0 || hq.top.isEmpty)
      return candidates.sparkSession.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0.0).as("sim"), lit(0L).as("rank"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"ivfTopKHier: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val qv = queries.select(col("vec_id").as("qid"), checked(col("embedding")).as("qv"))
    val cv = candidates.select(col("vec_id").as("nid"), checked(col("embedding")).as("nv"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cs").desc, col("cell"))
    // candidates descend to their single home cell (slot 0 branch, best
    // leaf); nPerBranch=1 suffices for a rank-1 pick
    val cells = hierDescent(cv.select(col("nid").as("id"), col("nv").as("v")),
        hq, 1, 1)
      .withColumn("rn", row_number().over(wCell)).where(col("rn") === 1)
      .select(col("id").as("nid"), col("cell"))
    val probes = hierDescent(qv.select(col("qid").as("id"), col("qv").as("v")),
        hq, nProbeTop, nProbe)
      .withColumn("rn", row_number().over(wCell)).where(col("rn") <= nProbe)
      .select(col("id").as("qid"), col("cell"))
    // vectors attach per ROW (packed unit form, one id-join each side),
    // then pairs are scored by the codegen'd DotPacked inside the cell
    // join's streamed output — never a per-PAIR payload re-attach (the
    // round-7 dedup lesson: with a query set that grows with the corpus,
    // bare-id pairs joined back to the vector tables are candidates ×
    // dim×8 bytes of join I/O)
    val sims = probes
      .join(qv.select(col("qid"), packUnit(col("qv")).as("pq")), "qid")
      .join(cells.join(cv.select(col("nid"), packUnit(col("nv")).as("pn")), "nid"), "cell")
      .where(col("qid") =!= col("nid"))
      .withColumn("sim",
        org.apache.spark.sql.GraftColumns.dotPacked(col("pq"), col("pn")))
    rankTopK(sims, k)
  }

  /** Per-row leaf-centroid scoring count of [[cosineDedupIvfHier]]'s
    * descent (the scale-probe entry point): a row additionally scores
    * `hq.top.size` top-level centroids in-closure; this frame counts the
    * leaf side — (id, scored) with scored = Σ |leaves(probed branches)|.
    * ScaleProbeSpec measures this across a GenScale decade to pin the
    * √-growth claim the hierarchical path rests on. */
  private[graft] def hierScoredLeaves(vecs: DataFrame, hq: HierQuantizer,
      nProbeTop: Int, dimHint: Int): DataFrame = {
    hq.requireLive("hierScoredLeaves")
    val cv = vecs.select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))
    val topArr = hq.top.map { case (cid, w) => withNorm3(cid, w) }.toArray
    val nPT = nProbeTop
    val branchesU = topCellsUdf(topArr, nPT)
    val ex = cv.withColumn("pbs", branchesU(col("v")))
      .select(col("id"), explode(col("pbs")).as("branch"))
    val bc = hq.leaves.groupBy("branch").agg(count(lit(1)).as("nl"))
    ex.join(bc, "branch").groupBy("id").agg(sum("nl").as("scored"))
  }

  /** Recursive (L-level) coarse quantizer — [[HierQuantizer]] generalized
    * past two levels (the log-depth construction its scaladoc describes):
    * `top` is the TRAINED Lloyd model (the only driver/closure-held
    * part), and `levels(i)` is a DISTRIBUTED frame `(parent, cid, cw)` of
    * per-parent salted-sample centroids — level 0's parents are top cids,
    * level i's parents are level i-1's cids, and the LAST level's cids
    * are the cells. Each level is only ever equi-joined on `parent`,
    * never collected.
    *
    * Why recurse: the two-level descent scores ~2√k centroids/vector —
    * measured √n per decade across three decades (ScaleProbeSpec) — so
    * total descent work still grows n^1.5 per decade; at L balanced
    * levels a vector scores ~L·k^(1/L), turning the per-vector term into
    * k^(1/3) at three levels (and log k as L grows — constant work per
    * decade at log-depth). Below ~10^10 vectors two levels suffice
    * (HierQuantizer stays the shipped default); this is the documented
    * scale path past that. */
  case class DeepQuantizer(top: Seq[(Long, Array[Double])], levels: Seq[DataFrame]) {
    @transient @volatile private var released0 = false
    /** True once [[unpersist]] ran — the quantizer must no longer be used. */
    def released: Boolean = released0
    /** Release the model's distributed half: unpersist every level
      * frame's storage blocks ([[deepQuantizer]] persists them eagerly —
      * they ARE the model) and mark the quantizer dead, so any later
      * descent fails loudly instead of silently re-running the whole
      * Lloyd + sample + re-home lineage per consumer. A long-lived
      * session training several quantizers otherwise accumulates
      * storage-memory blocks per model; Bench/Verify's per-query
      * clearCache() covers the harness paths. */
    def unpersist(): Unit = { released0 = true; levels.foreach(_.unpersist()) }
    private[functions] def requireLive(op: String): Unit =
      require(!released0,
        s"$op: DeepQuantizer used after unpersist() — retrain the model")
  }

  /** Train a [[DeepQuantizer]]: top = the seeded Lloyd trainer (salted
    * init, JIT'd loop assignment — the oracle replays every pass); then
    * per entry `occupancies(i)`, a per-parent SALTED sample of
    * `⌈parentSize / occupancies(i)⌉` children (lowest hash60(vec_id), id
    * tie-break, WITHIN the parent — the same id-order-bias defense as
    * every sample model), after which every vector re-homes to its best
    * sampled child (one per-parent scoring join; rounded-cosine argmax,
    * lowest-cid ties) to parent the NEXT level's sample. With
    * `occupancies = Seq(occ)` this is BIT-FOR-BIT [[hierQuantizer]]
    * (spec-pinned): same top, same window sample, no re-home needed.
    *
    * Scale shape: the only collect is the top model; each level adds one
    * `parent` hash exchange (window sample) and, between levels, one
    * scoring join that reuses it. Nothing downstream depends on n
    * through the driver. */
  def deepQuantizer(vecs: DataFrame, nTop: Int, occupancies: Seq[Int],
      iters: Int, dimHint: Int = -1): DeepQuantizer = {
    require(nTop > 0 && iters > 0 && occupancies.nonEmpty && occupancies.forall(_ > 0),
      s"deepQuantizer: nTop=$nTop iters=$iters occupancies=$occupancies must be positive")
    val top = kmeansModel(vecs, nTop, iters, dimHint, loopAssign = true)
    val dim = if (dimHint > 0) dimHint else probeDim(vecs)
    def emptyLvl = vecs.sparkSession.emptyDataFrame
      .select(lit(0L).as("parent"), lit(0L).as("cid"),
        array().cast("array<double>").as("cw")).where(lit(false))
    if (dim == 0) return DeepQuantizer(Nil, occupancies.map(_ => emptyLvl))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"deepQuantizer: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    val topArr = top.map { case (cid, w) => withNorm3(cid, w) }.toArray
    val branchU = bestCellUdf(topArr)
    var asg = cv.withColumn("parent", branchU(col("v")))
    val wIn = org.apache.spark.sql.expressions.Window.partitionBy("parent")
    val wSalt = wIn.orderBy(TextFunctions.hash60(col("id").cast("string")), col("id"))
    val built = occupancies.zipWithIndex.map { case (occ, li) =>
      // each level frame is PERSISTED and eagerly materialized: it is the
      // distributed half of the MODEL (1/occ-th of its parent population
      // — k^(i/L)-ish rows, not the corpus), and its consumers — the next
      // level's re-home plus both of [[ivfTopKDeep]]'s descents — would
      // otherwise each recompute the whole Lloyd + sample + re-home
      // lineage (the unpersisted form measured ~5 recomputes and 50
      // window nodes in one emb_ann_deep plan). Bench/Verify clear the
      // cache per query; long-lived apps release via
      // [[DeepQuantizer.unpersist]] when done with the quantizer.
      val lvl = asg
        .withColumn("rn", row_number().over(wSalt))
        .withColumn("n", count(lit(1)).over(wIn))
        .where(col("rn") <= ceil(col("n") / lit(occ.toDouble)))
        .select(col("parent"), col("id").as("cid"), col("v").as("cw"))
        .persist()
      lvl.count()
      if (li < occupancies.length - 1)
        // re-home: each vector has exactly ONE parent here, so the
        // per-parent top-1 IS the per-id argmax — no window needed
        asg = scoreChildren(asg, lvl, 1)
          .select(col("id"), col("v"), col("cell").as("parent"))
      lvl
    }
    // same empty-branch discipline as [[hierQuantizer]]: a memberless top
    // centroid has no level-0 children, and [[deepDescent]]'s child join
    // would silently drop out-of-training rows landing there. (Only the
    // TOP can be empty: every sampled child at level i has at least its
    // own sample vector as a member, so levels below are always
    // child-bearing.)
    val nonEmpty = built.head.select("parent").distinct()
      .collect().map(_.getLong(0)).toSet
    DeepQuantizer(top.filter { case (cid, _) => nonEmpty(cid) }, built)
  }

  /** Score each `(id, v, parent)` row against its parent's children
    * (grouped once per parent with precomputed norms — the
    * [[hierDescent]] leaf-join discipline; children never enter a
    * closure), keeping the per-parent top `keep` by (4dp-rounded cosine
    * DESC, cid). Output `(id, v, cell, cs)`. */
  private def scoreChildren(rows: DataFrame, children: DataFrame,
      keep: Int): DataFrame = {
    // packed-leaf form, same rationale and bit-identity argument as
    // [[hierDescent]]'s leafArr (see [[packedScoreUdf]]); set-not-order
    // function of lc: topByRounded ranks on a total order (rounded cos
    // desc, cid unique) — collect_list nondeterminism is irrelevant,
    // which is what the oracle replay proves
    val grouped = children.withColumn("nw", norm(col("cw")))
      .groupBy("parent")
      .agg(collect_list(struct(col("cid"), packRaw(col("cw")).as("pw"), col("nw"))).as("lc"))
    val scoreU = packedScoreUdf(keep)
    rows.join(grouped, "parent")
      .select(col("id"), col("v"), explode(scoreU(col("v"), col("lc"))).as("cc"))
      .select(col("id"), col("v"), col("cc._1").as("cell"), col("cc._2").as("cs"))
  }

  /** Generic greedy descent over a [[DeepQuantizer]]: `widths(0)` best
    * branches from one JIT'd loop over the top model, then per level the
    * global top `widths(i+1)` children per id (per-parent truncation to
    * `widths(i+1)` first — lossless for that rank, same argument as
    * [[hierDescent]]'s nPerBranch). Middle-level ranks drop the vector
    * before their id-window (narrow (id, cell, cs) rows cross the
    * exchange) and re-attach it by id join for the next level's scoring.
    * Output: the FINAL level's scored `(id, cell, cs)` rows; callers
    * rank. With one distributed level this is [[hierDescent]] minus the
    * slot column. */
  private def deepDescent(cv: DataFrame, dq: DeepQuantizer,
      widths: Seq[Int]): DataFrame = {
    dq.requireLive("deepDescent")
    require(widths.length == dq.levels.length + 1 && widths.forall(_ > 0),
      s"deepDescent: need ${dq.levels.length + 1} positive widths, got $widths")
    val topArr = dq.top.map { case (cid, w) => withNorm3(cid, w) }.toArray
    val w0 = widths.head
    val branchesU = topCellsUdf(topArr, w0)
    val init = cv.withColumn("pbs", branchesU(col("v")))
      .select(col("id"), col("v"), explode(col("pbs")).as("parent"))
    val last = dq.levels.length - 1
    val wId = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cs").desc, col("cell"))
    dq.levels.zip(widths.tail).zipWithIndex.foldLeft(init) {
      case (cur, ((lvl, wNext), li)) =>
        val scored = scoreChildren(cur, lvl, wNext)
        if (li == last) scored.select("id", "cell", "cs")
        else scored.select("id", "cell", "cs")
          .withColumn("rn", row_number().over(wId)).where(col("rn") <= wNext)
          .select(col("id"), col("cell").as("parent"))
          .join(cv, "id")
          .select(col("id"), col("v"), col("parent"))
    }
  }

  /** Per-vector scored-centroid count of the [[DeepQuantizer]] width-1
    * home chain (the scale-probe entry point, [[hierScoredLeaves]]'
    * L-level analogue): (id, scored) with scored = nTop + Σ per level
    * |children(home parent)| — a pure frame count, zero wall-clock
    * noise. ScaleProbes prints it next to the flat k and the 2-level
    * number so COVERAGE can pin the √n → k^(1/3) descent-cost claim. */
  private[graft] def deepScoredHome(vecs: DataFrame, dq: DeepQuantizer,
      dimHint: Int): DataFrame = {
    dq.requireLive("deepScoredHome")
    def checked(vec: Column): Column =
      when(size(vec) === dimHint, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"deepScoredHome: expected dim $dimHint, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    val topArr = dq.top.map { case (cid, w) => withNorm3(cid, w) }.toArray
    val branchU = bestCellUdf(topArr)
    var cur = cv.withColumn("parent", branchU(col("v")))
    var acc = cur.select(col("id"), lit(dq.top.size.toLong).as("scored"))
    dq.levels.zipWithIndex.foreach { case (lvl, li) =>
      val cnt = lvl.groupBy("parent").agg(count(lit(1)).as("nc"))
      acc = acc.join(cur.select("id", "parent"), "id").join(cnt, "parent")
        .select(col("id"), (col("scored") + col("nc")).as("scored"))
      if (li < dq.levels.length - 1)
        cur = scoreChildren(cur, lvl, 1)
          .select(col("id"), col("v"), col("cell").as("parent"))
    }
    acc
  }

  /** IVF-Flat ANN top-k through a [[DeepQuantizer]] — [[ivfTopKHier]]
    * generalized to L levels, same contract (exact rounded-cosine rank
    * within the probed cells, ties to the lowest nid): candidates descend
    * the width-1 home chain to their single home cell, queries descend
    * with `widths` (per-level probe fan), candidate pairs flow as BARE
    * ids through the cell equi-join with packed-unit payloads attached
    * per ROW, and [[rankTopK]] finishes. Driver/closure cost is nTop×dim
    * doubles; every level stays a distributed frame. */
  def ivfTopKDeep(queries: DataFrame, candidates: DataFrame, k: Int,
      dq: DeepQuantizer, widths: Seq[Int], dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint else probeDim(candidates)
    if (dim == 0 || dq.top.isEmpty)
      return candidates.sparkSession.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0.0).as("sim"), lit(0L).as("rank"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"ivfTopKDeep: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val qv = queries.select(col("vec_id").as("qid"), checked(col("embedding")).as("qv"))
    val cv = candidates.select(col("vec_id").as("nid"), checked(col("embedding")).as("nv"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cs").desc, col("cell"))
    val cells = deepDescent(cv.select(col("nid").as("id"), col("nv").as("v")),
        dq, Seq.fill(dq.levels.length + 1)(1))
      .withColumn("rn", row_number().over(wCell)).where(col("rn") === 1)
      .select(col("id").as("nid"), col("cell"))
    val probes = deepDescent(qv.select(col("qid").as("id"), col("qv").as("v")),
        dq, widths)
      .withColumn("rn", row_number().over(wCell)).where(col("rn") <= widths.last)
      .select(col("id").as("qid"), col("cell"))
    val sims = probes
      .join(qv.select(col("qid"), packUnit(col("qv")).as("pq")), "qid")
      .join(cells.join(cv.select(col("nid"), packUnit(col("nv")).as("pn")), "nid"), "cell")
      .where(col("qid") =!= col("nid"))
      .withColumn("sim",
        org.apache.spark.sql.GraftColumns.dotPacked(col("pq"), col("pn")))
    rankTopK(sims, k)
  }

  /** Unit-normalize a double vector and pack it little-endian into bytes
    * (zero vector → zero vector, matching [[cosLoop]]'s 0-cosine
    * convention). Runs once per bucket row — off the hot path; the hot
    * per-candidate loop is the native [[DotPacked]] expression. */
  private val packUnit = udf { (v: Seq[Double]) =>
    var i = 0; var n2 = 0.0
    while (i < v.length) { n2 += v(i) * v(i); i += 1 }
    val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
    val bb = java.nio.ByteBuffer.allocate(v.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    i = 0
    while (i < v.length) { bb.putDouble(v(i) * inv); i += 1 }
    bb.array()
  }

  /** Pack a double vector little-endian into bytes AS-IS — the raw-bits
    * twin of [[packUnit]] (no normalization, `putDouble` round-trips the
    * exact IEEE bits), for payloads whose consumer needs the original
    * values: the packed-leaf centroid frames ([[packedScoreUdf]]), whose
    * scoring arithmetic must stay bit-identical to the unpacked form. */
  private[graft] val packRaw = udf { (v: Seq[Double]) =>
    val bb = java.nio.ByteBuffer.allocate(v.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < v.length) { bb.putDouble(v(i)); i += 1 }
    bb.array()
  }

  /** Unpack a [[packRaw]] blob: one bulk primitive copy, no per-element
    * boxing. */
  private[graft] def unpackRaw(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length >> 3)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asDoubleBuffer.get(out)
    out
  }

  /** The packed-leaf scorer shared by [[hierDescent]] and
    * [[scoreChildren]] (round 21, guide §4 — the DotPacked discipline
    * applied to the leaf frame): the branch-grouped centroid list arrives
    * as `(cid, pw: binary, nw)` structs, so ScalaUDF's input conversion
    * copies ONE byte array per centroid instead of boxing every component
    * into java.lang.Double — the old `(cid, cw: array<double>, nw)` form
    * paid |leaves(branch)| × dim boxed conversions per (row, branch)
    * BEFORE the scoring loop even ran, the dominant per-task cost of the
    * emb _hier/_deep family. [[unpackRaw]] restores the exact IEEE bits,
    * so [[topByRounded]] sees byte-identical inputs and the output is
    * bit-identical to the unpacked form (oracle-replay-proven). */
  private def packedScoreUdf(keep: Int) =
    udf { (v: Seq[Double], lc: Seq[org.apache.spark.sql.Row]) =>
      val va = v.toArray
      var n2 = 0.0; var i = 0
      while (i < va.length) { n2 += va(i) * va(i); i += 1 }
      val cents = new Array[(Long, Array[Double], Double)](lc.length)
      i = 0
      while (i < lc.length) {
        val r = lc(i)
        cents(i) = (r.getLong(0), unpackRaw(r.getAs[Array[Byte]](1)), r.getDouble(2))
        i += 1
      }
      topByRounded(cents, va, math.sqrt(n2), keep)
    }

  /** Cell affinity for the IVF coarse quantizer: cosine of every row in
    * `df` to every centroid, as (idCol, cid, cs) with cs 4dp-rounded
    * (both engines rank on the ROUNDED value, ties to the lowest cid).
    *
    * Shape: posexplode the vector, broadcast-equi-join the exploded
    * centroid components on the dimension index, one hash-aggregate per
    * (row, centroid) — BroadcastHashJoin + codegen'd agg, never a
    * nested-loop join (the registry-wide cartesian gate stays clean).
    * Cost O(rows × dim × nCent) — the inherent IVF assignment cost. */
  private def cellAffinity(df: DataFrame, idCol: String, vecCol: String,
      centExploded: DataFrame): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol))).toDF(idCol, "i", "x")
      .join(broadcast(centExploded), "i")
      .groupBy(col(idCol), col("cid"))
      .agg(sum(col("x") * col("w")).as("d"),
        sum(col("x") * col("x")).as("nx"),
        sum(col("w") * col("w")).as("nc"))
      .withColumn("cs", round(when(col("nx") === 0.0 || col("nc") === 0.0, 0.0)
        .otherwise(col("d") / (sqrt(col("nx")) * sqrt(col("nc")))) + lit(1e-9), 4))
      .select(col(idCol), col("cid"), col("cs"))

  /** IVF-Flat approximate top-k — the coarse-quantizer counterpart to the
    * hyperplane-LSH [[annTopK]]: `nCent` centroids partition the corpus
    * into cells (every candidate lives in exactly ONE cell — its nearest
    * centroid by rounded cosine, ties to the lowest centroid id); a query
    * probes its `nProbe` nearest cells and ranks exactly within them.
    *
    * Centroids are a deterministic SALTED data sample (the `nCent`
    * lowest hash60(vec_id), id tie-break) — a k-means-style trained
    * quantizer would drop in here unchanged (swap the centroid frame),
    * but the sample keeps the whole index a pure function of the input,
    * so the DuckDB oracle replays assignment, probing, and ranking
    * EXACTLY.
    *
    * Scale shape: assignment is one broadcast equi-join + aggregate (the
    * centroid table is the broadcast model, nCent×dim doubles); the
    * probe→cell join runs on BARE ids co-partitioned by cell — a
    * candidate pair costs two longs in the shuffle, and because each
    * candidate has exactly one cell there are no duplicate pairs and no
    * dedup exchange (vs. the LSH path's nTables-way dedup). Vectors
    * re-attach to survivors only. Per query the exact work is
    * ~nProbe/nCent of the corpus — the IVF-Flat contract. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int, nCent: Int,
      nProbe: Int, dimHint: Int = -1,
      model: Seq[(Long, Array[Double])] = Nil,
      loopAssign: Boolean = false): DataFrame = {
    val dim = if (dimHint > 0) dimHint
      else probeDim(candidates)
    if (dim == 0)
      return candidates.sparkSession.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0.0).as("sim"), lit(0L).as("rank"))
        .where(lit(false))
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"ivfTopK: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val qv = queries.select(col("vec_id").as("qid"), checked(col("embedding")).as("qv"))
    val cv = candidates.select(col("vec_id").as("nid"), checked(col("embedding")).as("nv"))
    // coarse quantizer: a trained [[kmeansModel]] when provided (nCent is
    // then the model's size), else a SALTED data sample — the nCent
    // lowest hash60(vec_id), id tie-break, not the nCent lowest ids: an
    // id order that correlates with cluster structure (append-time
    // ordering, label-sorted exports) would otherwise concentrate every
    // centroid in one region (the same bias [[cosineDedupIvf]]'s sample
    // path was salted against in round 8). Still a pure function of the
    // input, so the oracle replays it; both forms are small, so the
    // exploded frame broadcasts.
    //
    // loopAssign = true swaps the exploded cellAffinity join for the
    // plan-time-model JIT loop ([[cosineDedupIvf]]'s discipline —
    // identical rounded values, same lowest-cid ties): REQUIRED once
    // nCent grows with the corpus (constant-occupancy cell counts), where
    // the exploded join is n×nCent×dim ROWS — 40G at 200k vectors/3125
    // cells, measured 615 s vs ~20 s for the loop doing the same flops.
    // The default exploded join stays for the small-fixed-nCent entries
    // whose model the driver should not hold.
    //
    // The two assignment strategies are separate complete pipelines each
    // ending in [[rankTopK]] — a plain if/else dispatch, not a shared
    // (cells, probes) binding (the loop branch scores pairs packed inside
    // the cell join and never produces bare cell frames).
    def loopAssignedTopK(): DataFrame = {
      val cents: Array[(Long, Array[Double], Double)] =
        if (model.nonEmpty) model.map { case (cid, w) => withNorm3(cid, w) }.toArray
        else cv.orderBy(TextFunctions.hash60(col("nid").cast("string")), col("nid"))
          .limit(nCent)
          .collect().map(r => withNorm3(r.getLong(0), r.getSeq[Double](1).toArray))
      require(cents.length.toLong * dim <= QuantizerModelMaxDoubles,
        s"ivfTopK: quantizer model ${cents.length} centroids x $dim dims exceeds the " +
          s"$QuantizerModelMaxDoubles-double driver/closure cap — use ivfTopKHier")
      // rows cross the cell shuffle WITH their packed unit vector (the
      // cosineDedupIvf verify shape): pairs are scored by the codegen'd
      // DotPacked inside the join's streamed output. The legacy branch's
      // per-PAIR payload re-attach (bare-id candidates joined back to
      // both vector tables) is fine for its fixed tiny query batches but
      // is candidates × dim×8 bytes of join I/O once the query set grows
      // with the corpus — the round-7 dedup lesson, measured again here
      // (157 s → 45 s at the 100× check).
      val cellsF = ivfProbeFrame(cv.toDF("id", "v"), cents, 1)
        .select(element_at(col("pcs"), 1).as("cell"), col("id").as("nid"),
          col("vp").as("pn"))
      val probesF = ivfProbeFrame(qv.toDF("id", "v"), cents, nProbe)
        .select(explode(col("pcs")).as("cell"), col("id").as("qid"),
          col("vp").as("pq"))
      val sims = probesF.join(cellsF, "cell").where(col("qid") =!= col("nid"))
        .withColumn("sim",
          org.apache.spark.sql.GraftColumns.dotPacked(col("pq"), col("pn")))
      rankTopK(sims, k)
    }
    def explodedTopK(): DataFrame = {
      val centEx = if (model.nonEmpty) {
        val spark = candidates.sparkSession
        import spark.implicits._
        model.flatMap { case (cid, ws) =>
          ws.iterator.zipWithIndex.map { case (x, i) => (cid, i, x) } }
          .toDF("cid", "i", "w")
      } else candidates
        .orderBy(TextFunctions.hash60(col("vec_id").cast("string")), col("vec_id"))
        .limit(nCent)
        .select(col("vec_id").as("cid"), posexplode(toDouble(col("embedding"))))
        .toDF("cid", "i", "w")
      val wNear = org.apache.spark.sql.expressions.Window
        .partitionBy("nid").orderBy(col("cs").desc, col("cid"))
      val cellsF = cellAffinity(cv, "nid", "nv", centEx)
        .withColumn("rn", row_number().over(wNear)).where(col("rn") === 1)
        .select(col("nid"), col("cid").as("cell"))
      val wProbe = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cs").desc, col("cid"))
      val probesF = cellAffinity(qv, "qid", "qv", centEx)
        .withColumn("rn", row_number().over(wProbe)).where(col("rn") <= nProbe)
        .select(col("qid"), col("cid").as("cell"))
      val cand = probesF.join(cellsF, "cell").where(col("qid") =!= col("nid"))
        .select("qid", "nid")
        .join(qv, "qid").join(cv, "nid")
      rankTopK(cand.withColumn("sim", cosLoop(col("qv"), col("nv"))), k)
    }
    if (loopAssign) loopAssignedTopK() else explodedTopK()
  }

  /** Shared (qid, nid, sim) → rounded top-k tail of [[ivfTopK]]'s two
    * assignment branches: rank on (4dp-rounded sim DESC, nid). */
  private def rankTopK(sims: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(round(col("sim") + lit(1e-9), 4).desc, col("nid"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim") + lit(1e-9), 4).as("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Multi-table LSH approximate top-k (the classic recall lever: L
    * independent tables, union of in-bucket candidates, exact cosine +
    * top-k on the union). The scale shape: candidate generation is an
    * equi-join co-partitioned on (table, bucket) — per query ~
    * L·|C|/2^nPlanes candidates, never |C|; recall 1-(1-p)^L vs p for one
    * table. Gated by the recall@k spec against [[bruteTopK]]. */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int, nPlanes: Int,
      nTables: Int = 8, dimHint: Int = -1): DataFrame = {
    // dim from the caller when known; otherwise inferred from the first
    // candidate (empty input → empty result, not NoSuchElementException)
    val dim = if (dimHint > 0) dimHint
      else probeDim(candidates)
    if (dim == 0)
      return candidates.sparkSession.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0.0).as("sim"), lit(0L).as("rank"))
        .where(lit(false))
    // mixed-dimension input would silently hash against a wrong-length
    // plane — fail loudly instead
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"annTopK: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val qv = queries.select(col("vec_id").as("qid"), checked(col("embedding")).as("qv"))
    val cv = candidates.select(col("vec_id").as("nid"), checked(col("embedding")).as("nv"))
    // candidate generation runs on BARE ids: the (table, bucket) equi-join
    // and the dedup shuffle carry two longs per pair, never the vectors;
    // vectors re-attach only to the post-dedup survivors (at 100 TB the
    // in-bucket pair volume is the dominant shuffle — keeping it id-width
    // cuts it by ~dim× vs joining vectors first)
    val q = tableBucketRows(qv, "qid", "qv", nPlanes, nTables, dim)
    val c = tableBucketRows(cv, "nid", "nv", nPlanes, nTables, dim)
    val cand = q.join(c, Seq("table", "bucket")).where(col("qid") =!= col("nid"))
      .select("qid", "nid").dropDuplicates("qid", "nid")
      .join(qv, "qid").join(cv, "nid")
    val sims = cand.withColumn("sim", cosLoop(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(round(col("sim") + lit(1e-9), 4).desc, col("nid"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim") + lit(1e-9), 4).as("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Lloyd k-means over the embedding column: `iters` assignment passes
    * with a centroid update between each — the TRAINED coarse quantizer
    * (vs [[ivfTopK]]'s data-sample one; its scaladoc's "a trained
    * quantizer would drop in here unchanged" slot is this). Returns the
    * final assignment (vec_id, cell, aff) with `aff` the 4dp-rounded
    * cosine to the winning centroid.
    *
    * Fully deterministic, so the DuckDB oracle replays every pass
    * exactly: init = the embeddings of the `nCent` lowest vec_ids;
    * assignment = argmax of ROUNDED cosine, ties to the lowest centroid
    * id; update = per-dimension mean over members (cells that lose all
    * members keep their previous centroid, k never shrinks).
    *
    * Scale shape (the MLlib KMeans discipline): the MODEL lives on the
    * driver — nCent×dim doubles, collected once per pass — and ships
    * back as a broadcast of exploded (cid, i, w) rows; the DATA never
    * moves. Assignment is [[cellAffinity]]'s broadcast-join aggregate;
    * the update's posexplode+avg hash-aggregates with map-side partials,
    * so its shuffle carries #partitions × nCent × dim partial sums, not
    * N×dim member rows. Driver loop = `iters` rounds, same bounded-
    * iteration contract as Graph.connectedComponents. */
  def kmeansAssign(vecs: DataFrame, nCent: Int, iters: Int,
      dimHint: Int = -1): DataFrame = {
    require(nCent > 0 && iters > 0, s"kmeansAssign: nCent=$nCent iters=$iters must be positive")
    val dim = if (dimHint > 0) dimHint
      else probeDim(vecs)
    if (dim == 0)
      return vecs.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0L).as("cell"), lit(0.0).as("aff"))
        .where(lit(false))
    kmeansLoop(vecs, nCent, iters, dim)._1
      .select(col("id").as("vec_id"), col("cell"), col("aff"))
  }

  /** The trained centroid model alone — (cid, weights) on the driver,
    * ready to drop into [[ivfTopK]]'s / [[cosineDedupIvf]]'s `model` slot
    * as the coarse quantizer. Runs `iters` Lloyd passes like
    * [[kmeansAssign]] (the final assignment is discarded; only the update
    * after pass `iters - 1` matters, so training cost is identical).
    *
    * `loopAssign = true` swaps [[cellAffinity]]'s exploded broadcast-join
    * assignment for the same plan-time-model JIT'd loop
    * [[cosineDedupIvf]] probes with: identical rounded values (shared
    * +1e-9 HALF_UP 4dp, ties to the lowest cid), but the per-pass cost is
    * one loop per row instead of n×nCent×dim JOIN ROWS — at √n-scale
    * centroid counts the exploded join is the formulation the 10× check
    * measured at 127 s vs ~13 s for the loop. Oracles replay either
    * path unchanged. */
  def kmeansModel(vecs: DataFrame, nCent: Int, iters: Int,
      dimHint: Int = -1, loopAssign: Boolean = false): Seq[(Long, Array[Double])] = {
    require(nCent > 0 && iters > 0, s"kmeansModel: nCent=$nCent iters=$iters must be positive")
    val dim = if (dimHint > 0) dimHint
      else probeDim(vecs)
    if (dim == 0) Nil else kmeansLoop(vecs, nCent, iters, dim, loopAssign)._2
  }

  private def kmeansLoop(vecs: DataFrame, nCent: Int, iters: Int,
      dim: Int, loopAssign: Boolean = false): (DataFrame, Seq[(Long, Array[Double])]) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"kmeans: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val cv = vecs.select(col("vec_id").as("id"), checked(col("embedding")).as("v"))
    // Lloyd INIT is SALTED — the nCent lowest hash60(id) vectors, id
    // tie-break — matching every sample model in the family: id order
    // correlated with cluster structure (append-time ordering,
    // label-sorted exports) would seed every centroid in one region, and
    // two Lloyd passes attenuate but don't erase that skew. Still a pure,
    // oracle-replayable function of the input.
    var model: Seq[(Long, Array[Double])] =
      cv.orderBy(TextFunctions.hash60(col("id").cast("string")), col("id")).limit(nCent)
        .as[(Long, Array[Double])].collect().toSeq
    def centFrame: DataFrame = model
      .flatMap { case (cid, ws) => ws.iterator.zipWithIndex.map { case (x, i) => (cid, i, x) } }
      .toDF("cid", "i", "w")
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cs").desc, col("cid"))
    // loopAssign: argmax over the current model inside ONE JIT'd loop per
    // row — numerically identical to cellAffinity+window (same rounding,
    // same lowest-cid tie-break), minus the n×nCent×dim exploded join
    def loopAssigned: DataFrame = {
      val cents = model.map { case (cid, ws) =>
        var nw = 0.0; var i = 0
        while (i < ws.length) { nw += ws(i) * ws(i); i += 1 }
        (cid, ws, math.sqrt(nw))
      }.toArray
      // argmax via [[topByRounded]]'s primitive scoring loop + exact
      // rounded ranking over the provably-sufficient candidate set —
      // identical (cell, aff) to rounding every centroid, minus the
      // per-(row × centroid) BigDecimal the 100× check measured dominant
      val bestU = bestCellAffUdf(cents)
      cv.withColumn("bc", bestU(col("v")))
        .select(col("id"), col("bc._1").as("cell"), col("bc._2").as("aff"))
    }
    var asg: DataFrame = null
    for (pass <- 1 to iters) {
      asg = if (loopAssign) loopAssigned
      else cellAffinity(cv, "id", "v", centFrame)
        .withColumn("rn", row_number().over(wA)).where(col("rn") === 1)
        .select(col("id"), col("cid").as("cell"), col("cs").as("aff"))
      if (pass < iters) {
        val means = asg.join(cv, "id")
          .select(col("cell"), posexplode(col("v")))
          .groupBy("cell", "pos").agg(avg("col").as("m"))
          .collect()
          .groupBy(_.getLong(0))
          .map { case (cell, rows) =>
            val ws = new Array[Double](dim)
            rows.foreach(r => ws(r.getInt(1)) = r.getDouble(2))
            cell -> ws
          }
        model = model.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
      }
    }
    (asg, model)
  }

  /** Product-quantization approximate top-k (PQ-Flat, asymmetric distance):
    * the MEMORY-bounded ANN path — each candidate vector compresses to `m`
    * small codes (one per subspace), so at 100 TB the index the scoring
    * join shuffles is m bytes/vector, not dim×8 (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011).
    *
    * Per-subspace codebooks are a deterministic SALTED data sample (the
    * `ksub` lowest hash60(vec_id)' subvectors — the same
    * pure-function-of-input trick as [[ivfTopK]], so the DuckDB oracle
    * replays encode + scoring exactly; a trained per-subspace k-means
    * would drop in unchanged). Encoding:
    * argmin of the ROUNDED squared L2 per (vector, subspace), ties to the
    * lowest code. Scoring: ADC — the query precomputes its distance to
    * every (subspace, codeword) once (m×ksub table, broadcast), and a
    * candidate's approximate distance is the sum of m lookups on its
    * codes; rank ascending, ties to the lowest nid.
    *
    * Scale shape: the codebook is collected ONCE at plan time (ksub×dim
    * doubles — the broadcast model, same discipline as [[kmeansModel]])
    * and encoding runs as one JIT'd loop per row (O(dim·ksub) flops, the
    * inherent encode cost, with zero join/aggregate row machinery — the
    * exploded-join formulation of the same math measured 8.6 s vs ~1 s
    * at sf0.1). Scoring joins the m-row-per-candidate CODE frame against
    * the broadcast query distance table on (subspace, code) — the
    * shuffle carries (nid, j, c) longs, never vectors. Compose with
    * [[ivfTopK]] cells to cut the scan to nProbe/nCent of the corpus
    * (IVF-PQ).
    *
    * Oracle exactness: per-subspace distances are rounded to 4dp
    * (HALF_UP after the shared +1e-9 shift) BEFORE the argmin and before
    * the ADC sum, so both engines compare identical values; at dsub ≤ 2
    * fp addition is commutative, so summation order cannot diverge
    * either.
    *
    * BOUNDED-QUERY CONTRACT: the broadcast ADC table is
    * #queries × m × ksub rows (~40 B each) — linear in the QUERY batch,
    * never the corpus. That is broadcast-sane only for bounded query
    * batches (the ANN serving shape: thousands of queries, not millions);
    * [[PqAdcBroadcastRowCap]] enforces it with a plan-time `require`. For
    * query sets at corpus scale, feed bounded slices (or drop the
    * `broadcast` hint and let the (j, c) join shuffle both sides). */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int, m: Int,
      ksub: Int, dimHint: Int = -1): DataFrame = {
    val nQueries = queries.count()
    val adcRows = nQueries * m * ksub
    require(adcRows <= PqAdcBroadcastRowCap,
      s"pqTopK: ADC broadcast table would be $adcRows rows " +
      s"(#queries=$nQueries x m=$m x ksub=$ksub) > cap $PqAdcBroadcastRowCap " +
      "(~40 B/row). Feed a bounded query batch, or shuffle-join instead of broadcasting.")
    val dim = if (dimHint > 0) dimHint
      else probeDim(candidates)
    if (dim == 0)
      return candidates.sparkSession.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0.0).as("adist"), lit(0L).as("rank"))
        .where(lit(false))
    require(dim % m == 0, s"pqTopK: dim $dim must divide into $m subspaces")
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"pqTopK: expected dim $dim, got "),
          // coalesce: a NULL embedding would otherwise null out the whole
          // concat and raise_error would throw with a null message
          coalesce(size(vec).cast("string"), lit("NULL")))))
    val (codesU, qdU) = pqEncoders(candidates, m, ksub, dim)
    val codes = candidates
      .select(col("vec_id").as("nid"), posexplode(codesU(checked(col("embedding")))))
      .toDF("nid", "j", "c")
    val qTable = queries
      .select(col("vec_id").as("qid"), explode(qdU(checked(col("embedding")))).as("e"))
      .select(col("qid"), col("e._1").as("j"), col("e._2").as("c"), col("e._3").as("d2"))
    val adc = codes.join(broadcast(qTable), Seq("j", "c"))
      .where(col("qid") =!= col("nid"))
      .groupBy("qid", "nid")
      .agg(round(sum(col("d2")) + lit(1e-9), 4).as("adist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adist").asc, col("nid").asc)
    adc.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("adist"), col("rank").cast("long").as("rank"))
  }

  /** The PQ encode closures: (codesU, qdU). The codebook — the `ksub`
    * lowest vec_ids' vectors — is collected once at plan time (ksub×dim
    * doubles, the broadcast-model discipline shared with [[kmeansModel]]
    * and [[planeVec]]) and serialized into both UDFs; `codesU` maps a
    * vector to its m nearest-codeword indices (rounded per-subspace L2
    * argmin, ties to the lowest code), `qdU` to the full (j, c, d2)
    * distance table a query precomputes for ADC. */
  private def pqEncoders(candidates: DataFrame, m: Int, ksub: Int, dim: Int)
      : (org.apache.spark.sql.expressions.UserDefinedFunction,
         org.apache.spark.sql.expressions.UserDefinedFunction) = {
    val dsub = dim / m
    // SALTED sample codebook (ksub lowest hash60(vec_id), id tie-break):
    // code index c = position in the salted order. First-N-by-id would
    // let an id order correlated with cluster structure pick all
    // codewords from one region — the round-8 dedup-sample lesson
    // applied to the PQ codebook.
    val cb: Array[Array[Double]] = candidates
      .orderBy(TextFunctions.hash60(col("vec_id").cast("string")), col("vec_id"))
      .limit(ksub)
      .select(toDouble(col("embedding"))).collect()
      .map(_.getSeq[Double](0).toArray)
    require(cb.nonEmpty, "pqEncoders: candidates must be non-empty to build a codebook")
    require(cb.forall(_.length == dim),
      s"pqEncoders: codebook vectors must all have dim $dim")
    val kEff = cb.length // < ksub only when the corpus is smaller than ksub
    // rounded per-subspace squared L2 — the cross-engine argmin/sum value
    def r4d(x: Double): Double =
      BigDecimal(x + 1e-9).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // one boxed→primitive copy per ROW (the encode loop otherwise reads
    // the boxed Seq m×kEff×dsub = dim×kEff times per row — the same
    // boxing tax the 100× scale check measured dominant in the IVF
    // dedup's assignment pass)
    def subD(v: Array[Double], j: Int, c: Int): Double = {
      var ss = 0.0; var i = 0
      while (i < dsub) {
        val dd = v(j * dsub + i) - cb(c)(j * dsub + i); ss += dd * dd; i += 1
      }
      r4d(ss)
    }
    val codesU = udf { v: Seq[Double] =>
      val va = v.toArray
      Array.tabulate(m) { j =>
        var best = 0; var bd = subD(va, j, 0); var c = 1
        while (c < kEff) {
          val dd = subD(va, j, c); if (dd < bd) { bd = dd; best = c }; c += 1
        }
        best
      }
    }
    val qdU = udf { v: Seq[Double] =>
      val va = v.toArray
      (for { j <- 0 until m; c <- 0 until kEff } yield (j, c, subD(va, j, c))).toArray
    }
    (codesU, qdU)
  }

  /** IVF-PQ: the composed 100 TB ANN architecture — [[ivfTopK]]'s coarse
    * quantizer cuts the scan to the probed cells' members (~nProbe/nCent
    * of the corpus) and [[pqTopK]]'s asymmetric distance scores those
    * candidates from m-byte codes instead of full vectors. Same
    * deterministic sample models as its two parents, so the DuckDB oracle
    * replays cell assignment, probing, encode, and ADC scoring exactly.
    *
    * Scale shape: candidate generation is the IVF bare-id cell join;
    * scoring attaches codes (m longs) and the broadcast query distance
    * table — vectors appear in NO shuffle after the two assignment
    * passes. */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nCent: Int, nProbe: Int, m: Int, ksub: Int, dimHint: Int = -1): DataFrame = {
    val dim = if (dimHint > 0) dimHint
      else probeDim(candidates)
    if (dim == 0)
      return candidates.sparkSession.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0.0).as("adist"), lit(0L).as("rank"))
        .where(lit(false))
    require(dim % m == 0, s"ivfPqTopK: dim $dim must divide into $m subspaces")
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"ivfPqTopK: expected dim $dim, got "),
          coalesce(size(vec).cast("string"), lit("NULL")))))
    // cell assignment via a plan-time centroid model + one JIT'd loop per
    // row (same discipline as the PQ encode; the exploded-join
    // cellAffinity shape that ivfTopK keeps measured ~1.5 s more here) —
    // identical math: rounded cosine argmax, ties to the lowest cid.
    // Centroids are the SALTED sample (hash60(vec_id) order, id
    // tie-break), matching [[ivfTopK]]/[[pqEncoders]].
    val cents: Array[(Long, Array[Double])] = candidates
      .orderBy(TextFunctions.hash60(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCent)
      .select(col("vec_id"), toDouble(col("embedding"))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(cents.nonEmpty, "ivfPqTopK: candidates must be non-empty to build centroids")
    // assignment/probing via [[topByRounded]]: primitive scoring loop with
    // precomputed centroid norms and one boxed→array copy per row, exact
    // rounded ranking only over the reachable candidate set — identical
    // (rounded argmax, lowest-cid ties) to rounding every cell, minus the
    // per-(row × centroid) BigDecimal + norm recompute (the boxing tax
    // the 100× scale check measured dominant in the dedup's twin loop).
    // topByRounded ranks ties by cid VALUE (not array position), so the
    // salted — non-cid-ascending — centroid order is tie-safe.
    val centsN: Array[(Long, Array[Double], Double)] = cents.map { case (cid, w) =>
      var nw = 0.0; var i = 0
      while (i < w.length) { nw += w(i) * w(i); i += 1 }
      (cid, w, math.sqrt(nw))
    }
    val bestCellU = bestCellUdf(centsN)
    val probeCellsU = topCellsUdf(centsN, nProbe)
    val cells = candidates
      .select(col("vec_id").as("nid"), bestCellU(checked(col("embedding"))).as("cell"))
    val probes = queries
      .select(col("vec_id").as("qid"), explode(probeCellsU(checked(col("embedding")))).as("cell"))
    val pairs = probes.join(cells, "cell").where(col("qid") =!= col("nid"))
      .select("qid", "nid")
    val (codesU, qdU) = pqEncoders(candidates, m, ksub, dim)
    val codes = candidates
      .select(col("vec_id").as("nid"), posexplode(codesU(checked(col("embedding")))))
      .toDF("nid", "j", "c")
    val qTable = queries
      .select(col("vec_id").as("qid"), explode(qdU(checked(col("embedding")))).as("e"))
      .select(col("qid"), col("e._1").as("j"), col("e._2").as("c"), col("e._3").as("d2"))
    val adc = pairs.join(codes, "nid")
      .join(broadcast(qTable), Seq("qid", "j", "c"))
      .groupBy("qid", "nid")
      .agg(round(sum(col("d2")) + lit(1e-9), 4).as("adist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adist").asc, col("nid").asc)
    adc.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("adist"), col("rank").cast("long").as("rank"))
  }
}
