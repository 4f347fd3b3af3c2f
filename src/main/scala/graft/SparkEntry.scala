package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[Queries]]; each is one SURVEY §2 operator expressed
  * through the graft library with a DuckDB oracle where SQL-expressible. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.registry.head._2.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.registry.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }.toMap

  /** Oracle-gated queries excluded from the bench JSON line only (Verify,
    * the CORRECTNESS gate, and the bench's BENCH_LOCAL.json full record
    * still run and time them): the driver records exactly the last 2000
    * chars of the bench's stdout, and the line at 93 queries measured
    * ~1967 chars — one more entry truncates the head of the line (the
    * total) away. Round 10 added the `ctl` noise-probe entries (~24
    * chars) to the line and moved the two longest-named stable queries
    * here to pay for them; their timings live in BENCH_LOCAL.json (every
    * run) and COVERAGE.md's round notes. New registry queries go here by
    * default — the full per-query record is the file, the line is the
    * driver-budgeted summary. Every name here must exist in [[queries]]
    * and carry an oracle (BenchSpec asserts both). */
  val nonBenchQueries: Set[String] =
    Set("aug_mstl", "q_top3_parts_per_brand", "doc_sample_stratified",
      "emb_dedup_hier", "emb_ann_hier", "emb_semdedup", "doc_split",
      "doc_shard", "emb_semdedup_hier", "emb_knn_classify", "doc_dup_spans",
      "doc_bm25", "emb_knn_hier")

  /** The bench line's query set: the registry minus [[nonBenchQueries]]. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries -- nonBenchQueries
}
