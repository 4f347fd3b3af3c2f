package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline. Near-dup detection
  * (MinHash/SimHash/cosine LSH) emits PAIRS; a training-data pipeline needs
  * CLUSTERS — a~b and b~c must collapse to one survivor even though (a, c)
  * was never emitted as a pair. Connected components is that collapse. */
object Graph {

  /** Connected components by iterative min-label propagation: every vertex
    * starts labeled with its own id; each round every vertex takes the min
    * of its own label and its neighbors' labels; at fixpoint the label is
    * the component's minimum vertex id (which doubles as the dedup
    * survivor under the keep-lowest-id convention used across the dedup
    * family).
    *
    * Returns (id, component) for every vertex that appears in `edges`
    * (isolated vertices are their own trivial component — union them in at
    * the call site if needed).
    *
    * Scale shape: each round is one equi-join of the label frame with the
    * (persisted) undirected edge list, one hash-aggregate, and one label-
    * on-label pointer jump (label(id) := label(label(id))) — all shuffle
    * on vertex id, and AQE coalesces/splits as needed. The jump halves
    * remaining chain depth per round, so rounds = O(log diameter) (the
    * same contraction large-star/small-star gets, Kiveris et al.,
    * "Connected Components in MapReduce", without the re-rooting
    * bookkeeping); init is seeded at min(id, neighbors), folding the
    * first propagation into frame construction. Convergence is detected
    * with one cheap aggregate per round: labels only ever DECREASE
    * (propagation and jump both take minima), so an unchanged label sum
    * (exact DECIMAL(38,0) — no Long overflow at any id range) means the
    * round function hit its fixpoint, which is a fixpoint of plain
    * propagation too (the jump never raises a label).
    *
    * Each round's frame is `localCheckpoint`ed, NOT merely persisted:
    * the round recurrence references `labels` twice (join + union), so
    * without lineage truncation the logical plan DOUBLES per round —
    * 2^rounds analysis cost that OOMs the driver near round ~8 even on a
    * 9-node chain (persist caches data but Catalyst still re-analyzes the
    * full tree). Checkpointing replaces the plan with a LogicalRDD each
    * round, keeping analysis O(1) per round — the same discipline
    * GraphFrames applies to its iterative algorithms. localCheckpoint
    * (executor-local blocks) over checkpoint (HDFS) because rounds are
    * single-digit and re-running the whole job on executor loss is
    * cheaper than per-round HDFS writes; flip to `checkpoint` on an
    * unreliable cluster. The driver-side loop is inherent to iterative
    * graph algorithms on Spark (same contract as Feedback.iterateEpochs).
    *
    * Storage hygiene: each round's blocks are freed as soon as the next
    * round materializes (localCheckpoint caches OUTSIDE the CacheManager,
    * so `clearCache()` never reclaims them — a long-lived session calling
    * this repeatedly would otherwise accumulate executor storage). Only
    * the RETURNED label frame stays cached; callers that are done with it
    * can free it with [[freeCheckpoint]]. */
  /** `symmetric = true` promises `edges` already contains both directions
    * of every edge (the aug_cluster path builds them that way): the
    * union+distinct symmetrization pass is skipped — one less shuffle over
    * the (potentially huge) edge frame. Correctness is unaffected either
    * way; duplicates are harmless to min-propagation (the seeded init and
    * every round take minima), so only the balance/cost changes. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
      symmetric: Boolean = false): DataFrame = {
    val dbg = sys.env.contains("GRAFT_CC_ROUNDS")
    var t0 = System.nanoTime()
    def lap(what: String): Unit = if (dbg) {
      System.err.println(f"[cc] $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val Seq(srcCol, dstCol) = edges.columns.take(2).toSeq
    // the distinct doubles as the partition-balancer, and the repartition
    // on `s` pins the checkpoint's partitioning to the per-round JOIN KEY:
    // localCheckpoint preserves outputPartitioning, and the label frame is
    // checkpointed off its own groupBy("id") hash exchange, so every
    // round's labels⋈edges join is zero-exchange on the edge side — the
    // (potentially huge) edge list shuffles ONCE here, not once per round
    val sym =
      if (symmetric) edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
      else edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
        .union(edges.select(col(dstCol).as("s"), col(srcCol).as("t")))
        .distinct()
    // LAZY localCheckpoints (round 21, guide §1.2 — driver/job fixed
    // costs): eager=false still truncates the plan to a LogicalRDD at
    // build time but defers block materialization to the FIRST action,
    // so the labelSum convergence aggregate below materializes `und` and
    // the label frame in the SAME job — one job per cycle instead of two
    // (checkpoint-count + sum), halving CC's per-round fixed cost. The
    // lazy-checkpoint contract (first action must compute EVERY
    // partition or uncomputed ones are lost with the truncated lineage)
    // holds by construction: every first action here is a full
    // aggregate. At bench scale the job fixed cost dominated aug_cluster
    // (79 jobs); at data scale this also removes one full cached-block
    // read per cycle.
    val und = sym.repartition(col("s")).localCheckpoint(false)
    // seeded init: label = min(id, neighbors) — the first propagation
    // round folded into the frame construction (one agg, no join)
    var labels = und.groupBy(col("s").as("id"))
      .agg(least(col("id"), min(col("t"))).as("component")).localCheckpoint(false)
    lap("labels init (lazy)")
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("component").cast("decimal(38,0)"))).head.get(0)
      if (v == null) java.math.BigDecimal.ZERO
      else v.asInstanceOf[java.math.BigDecimal]
    }
    var prevSum = labelSum(labels)
    var it = 0
    var done = false // empty/converged inputs settle in one cheap round
    // neighbor-min propagation + pointer jump in ONE join: the current
    // labels ride along as extra directed edges component -> id, so the
    // same equi-join that floods neighbor minima also delivers
    // label(label(id)) to id (component values are always vertex ids,
    // so the lookup always lands). The jump halves remaining chain
    // depth per round — O(log diameter) rounds — at the cost of one
    // union with an already-materialized LogicalRDD, not a second join.
    def round(ls: DataFrame): DataFrame = {
      val labelEdges = ls.select(col("component").as("s"), col("id").as("t"))
      val prop = ls.join(und.unionByName(labelEdges), col("id") === col("s"))
        .select(col("t").as("id"), col("component"))
      ls.select("id", "component").unionByName(prop)
        .groupBy("id").agg(min("component").as("component"))
    }
    while (!done && it < maxIter) {
      // TWO rounds per materialization cycle: the checkpoint + convergence
      // aggregate are the per-cycle fixed cost (a full Spark job each),
      // and round() is a pure frame transform off a LogicalRDD leaf, so
      // composing it keeps the plan O(1)-sized while halving the job
      // count. Convergence is still exact — a converged label frame is a
      // fixpoint of round(), so the extra composed round is a no-op, and
      // labels only ever decrease, so equal sums mean equal frames.
      val next = round(round(labels)).localCheckpoint(false)
      val nextSum = labelSum(next) // materializes next's blocks too (full agg)
      freeCheckpoint(labels) // next is materialized; last round's blocks are dead
      labels = next
      done = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      it += 2
      lap(s"rounds ${it - 1}-$it")
    }
    freeCheckpoint(und)
    if (sys.env.contains("GRAFT_CC_ROUNDS"))
      System.err.println(s"[cc] converged in $it rounds")
    require(done || it < maxIter,
      s"connectedComponents: no fixpoint after $maxIter rounds (diameter > $maxIter?)")
    labels
  }

  /** Drop the executor blocks behind a `localCheckpoint`ed frame.
    * localCheckpoint caches at the RDD layer (NOT the CacheManager), so
    * neither `df.unpersist()` nor `catalog.clearCache()` reclaims it —
    * the block handle lives on the LogicalRDD the checkpoint left behind.
    * No-op on frames that aren't checkpoint leaves. */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
