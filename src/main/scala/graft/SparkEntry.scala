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

  /** Oracle-gated queries excluded from the bench JSON line only (Verify
    * and the CORRECTNESS gate still run them): the driver records exactly
    * the last 2000 chars of the bench's stdout, and the line at 93 queries
    * already projects to ~1978 of the 1985-char budget (BenchSpec's gate)
    * — one more entry truncates the head of the line (the total) away.
    * Excluded queries get their sf0.1 timing recorded in COVERAGE.md's
    * round notes instead. Every name here must exist in [[queries]]
    * (BenchSpec asserts it). */
  val nonBenchQueries: Set[String] = Set("aug_mstl")

  /** The bench line's query set: the registry minus [[nonBenchQueries]]. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries -- nonBenchQueries
}
