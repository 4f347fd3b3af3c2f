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
    * Scale shape: each round is ONE self-equi-join of the label frame with
    * the (persisted) undirected edge list plus ONE hash-aggregate — both
    * shuffle on vertex id, and AQE coalesces/splits as needed. Rounds =
    * component diameter. Near-dup clusters are band-join cliques stitched
    * at the fringes — diameter is single-digit in practice, so plain
    * propagation beats the O(log n)-round alternating large-star/small-star
    * scheme (Kiveris et al., "Connected Components in MapReduce") that a
    * web-graph-diameter input would need; swap it in if components with
    * long chains ever appear. Convergence is detected with one cheap
    * aggregate per round: labels only ever DECREASE, so an unchanged
    * label sum (exact DECIMAL(38,0) — no Long overflow at any id range)
    * means fixpoint.
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
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val Seq(srcCol, dstCol) = edges.columns.take(2).toSeq
    val und = edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
      .union(edges.select(col(dstCol).as("s"), col(srcCol).as("t")))
      .distinct().localCheckpoint()
    var labels = und.select(col("s").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("component").cast("decimal(38,0)"))).head.get(0)
      if (v == null) java.math.BigDecimal.ZERO
      else v.asInstanceOf[java.math.BigDecimal]
    }
    var prevSum = labelSum(labels)
    var it = 0
    var done = false // empty/converged inputs settle in one cheap round
    while (!done && it < maxIter) {
      val prop = labels.join(und, col("id") === col("s"))
        .select(col("t").as("id"), col("component"))
      val next = labels.select("id", "component").unionByName(prop)
        .groupBy("id").agg(min("component").as("component")).localCheckpoint()
      val nextSum = labelSum(next)
      freeCheckpoint(labels) // next is materialized; last round's blocks are dead
      labels = next
      done = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      it += 1
    }
    freeCheckpoint(und)
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
