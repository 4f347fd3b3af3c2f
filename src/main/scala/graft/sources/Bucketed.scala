package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table I/O: the shuffle-elimination path for joins that repeat
  * across a pipeline's runs. Writing both sides of a hot join bucketed on
  * the join key (same bucket count) stores the hash partitioning IN the
  * table layout, so every later join between them plans with zero
  * exchanges — at 100 TB the shuffle you skip on each daily run is the
  * dominant cost of the join.
  *
  * The reference keeps its replay inputs pre-partitioned on disk for the
  * same reason (`adapters/lines.rs` replays are per-key files); on Spark
  * the catalog-tracked bucketed table is the idiomatic equivalent — scan
  * tasks come up already holding `HashPartitioning(key, n)`, which
  * satisfies the join's `ClusteredDistribution` without an Exchange, and
  * `sortBy` metadata lets the sort-merge join skip its per-bucket sort
  * when each bucket holds one file.
  *
  * Trade-offs that matter at scale: pick `buckets` so one bucket of the
  * LARGER table fits an executor's memory (buckets are the unit of join
  * parallelism — AQE cannot split them); both sides must agree on the
  * bucket count or Spark shuffles the mismatched side anyway. */
object Bucketed {

  /** Write `df` as a catalog-tracked parquet table bucketed (and
    * bucket-sorted) on `key`. Overwrites any existing table of the same
    * name. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(buckets > 0, s"Bucketed.write: buckets must be positive, got $buckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Read a bucketed table back; the scan reports the stored hash
    * partitioning to the planner. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
