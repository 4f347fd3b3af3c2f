package graft

import graft.core.Timeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables (TESTDATA.md). */
object Tables {

  /** Generations of the driver testdata have stored `events.ts` either as
    * TIMESTAMP(NANOS) parquet — which Spark rejects by default, so
    * `nanosAsLong` reads it as LongType ns — or as plain µs TIMESTAMP.
    * Both normalize to BIGINT epoch ns in [[events]]: exactly our
    * engine's authoritative clock (reference `NanoTime`, `time.rs:54`).
    * DuckDB oracle side matches via `epoch_ns(ts)`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // µs-timestamp parquet (isAdjustedToUTC=false) loads as TIMESTAMP_NTZ,
    // and the NTZ→TIMESTAMP cast in [[events]] reads the SESSION timezone —
    // pinning UTC here (not only in each main's builder) makes the epoch-ns
    // clock host-timezone-independent for every entrypoint that reads a
    // table, matching DuckDB's TZ-less epoch_ns(ts).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events as a keyed Timeline: key=user_id, clock=ts (ns), seq=event_id
    * (driver data has globally unique event ids → total intra-instant
    * order), value=value. */
  def events(spark: SparkSession, dir: String): Timeline = {
    val raw = load(spark, dir, "events")
    val tsNs = raw.schema("ts").dataType match {
      // ns-as-long generation: truncate to µs resolution (kept in ns
      // units) — DuckDB reads TIMESTAMP(NANOS) parquet at µs precision,
      // so the oracle clock is µs and both engines must see it.
      case org.apache.spark.sql.types.LongType => expr("(ts DIV 1000) * 1000")
      // µs-timestamp generation: epoch µs × 1000 IS the µs-truncated ns
      // clock. NTZ→TIMESTAMP cast is instant-preserving because [[load]]
      // pins spark.sql.session.timeZone=UTC, matching DuckDB's TZ-less
      // epoch_ns(ts).
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast("timestamp")) * lit(1000L)
      // any third schema generation must fail loudly, not cast to NULLs
      case other => throw new IllegalArgumentException(
        s"events.ts: expected LongType (nanosAsLong) or Timestamp[NTZ]Type, got $other")
    }
    // NOT spread here at the source (round 20, measured decision): a
    // user_id repartition on the raw stream would be a strictly
    // ADDITIONAL full-stream exchange for every consumer that re-keys it
    // (KeyedScan's string key in aug_ets_roll/aug_seasons_roll, the
    // instrument key in mkt_vwap/mkt_ohlc) — PlanAuditSpec's "ONE
    // exchange" contracts caught exactly this. Round 21 instead passes
    // the small-input parallelism hint LAZILY ([[Timeline.spreadN]]):
    // only an op that needs ClusteredDistribution(user_id) anyway spends
    // it, replacing its own implicit exchange one-for-one with a
    // REPARTITION_BY_NUM that AQE cannot re-coalesce to a single
    // partition — the same guarded trick as [[spread]], and like it the
    // hint is never set at scale (scan partitions >= parallelism).
    val hint = {
      val p = raw.rdd.getNumPartitions
      if (p < spark.sparkContext.defaultParallelism) Some(spreadTarget(spark))
      else None
    }
    Timeline(
      raw.withColumn("ts", tsNs).withColumn("seq", col("event_id")),
      keys = Seq("user_id"), spreadN = hint)
  }

  def eventsOf(spark: SparkSession, dir: String, eventType: String): Timeline = {
    val t = events(spark, dir)
    t.copy(df = t.df.where(col("event_type") === eventType))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** Small-file parallelism correction: a table landing in fewer scan
    * partitions than the session's parallelism serializes every downstream
    * projection onto that many tasks — fatal for the doc/emb pipelines whose
    * text/vector expressions (interpreted HOF lambdas, md5) dominate. A
    * row-group can't be split, so `maxPartitionBytes` can't help; spread by
    * key instead (one tiny shuffle of the raw rows). At scale the file count
    * provides the parallelism and this branch never triggers. The key-hash
    * partitioning is reused by downstream per-key groupBy/window stages.
    *
    * The partition count is EXPLICIT (round 20, guide §2.5): a bare
    * `repartition(col)` plans as REPARTITION_BY_COL, which AQE is free to
    * re-coalesce — and does, because the frame is kilobytes against a
    * 64 MB advisory target, collapsing the "spread" back to ONE partition
    * and silently serializing every md5/tokenize/DP projection downstream
    * (measured round 20: doc_lm_ppl ran 15 consecutive single-task stages,
    * wall ≈ sum of task times). Bytes are the wrong currency for these
    * stages — rows are compute-dense — so the count is pinned to
    * defaultParallelism, which AQE honors (REPARTITION_BY_NUM). At scale
    * the branch still never triggers (file count ≥ cores), so this is a
    * small-input correction, not a tuned constant. */
  private def spread(spark: SparkSession, df: DataFrame, key: String): DataFrame =
    if (df.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
      df.repartition(spreadTarget(spark), col(key))
    else df

  /** The explicit partition count every small-input spread pins (round-20
    * advisor): `defaultParallelism` alone can UNDERSHOOT the parallelism
    * the replaced implicit exchange would have had on a real cluster,
    * where `spark.sql.shuffle.partitions` is typically set well above
    * total cores — REPARTITION_BY_NUM opts out of AQE advice, so the
    * pinned count must be at least what the planner would have started
    * from. Locally both values are the session's core count, so bench
    * plans are unchanged. */
  private[graft] def spreadTarget(spark: SparkSession): Int =
    math.max(spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)

  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "documents"), "doc_id")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(spark, load(spark, dir, "embeddings"), "vec_id")
}
