package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** `passes` timed passes over `queries` (noop-sink, cache-isolated),
    * reporting each query's MINIMUM — the standard steady-state metric:
    * the min is robust to external noise bursts (this container's shared
    * host intermittently inflates individual queries 10-100x — a fixed
    * single-core probe swings 1.3 s to 3.4 s — and a single-pass bench
    * laundered those bursts into per-query numbers) and to first-pass JIT
    * warmth. The pass count is recorded in COVERAGE.md so cross-round
    * comparisons know the methodology. A query that throws is
    * RECORDED (err entry), never silently timed as ~0 s: a regression
    * must fail the bench loudly, not masquerade as a speedup. Factored
    * out of main so a spec can drive it with a deliberately-broken
    * query. */
  def run(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      passes: Int = 2): (String, Map[String, String]) = {
    var errors = Map.empty[String, String]
    val all = (1 to passes).map { _ =>
      queries.map { case (name, fn) =>
        // per-query isolation: a persisted frame from one query must not
        // serve an identical subplan in another (Spark's cache matches on
        // canonicalized plans), or the second query's number is fiction
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).takeWhile(_ != '\n').take(200)}"
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = queries.keys.map(name => name -> all.map(_(name)).min).toMap
    // The whole line must fit the driver's 2000-char stdout tail at ~90
    // queries (an overflowing line truncates away its head — the total):
    // per-query values are 1-decimal with trailing zeros stripped
    // ("0.70" -> "0.7", "2.00" -> "2"; 0.1 s resolution still ranks the
    // expensive queries), the total keeps 2 decimals, the sf dir is
    // reported by basename, the pass count lives in COVERAGE.md (min
    // over 2 passes), and the empty errors map is omitted. BenchSpec
    // projects the line length for the full registry.
    def rd(v: Double, scale: Int): String = BigDecimal(v)
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString
    // >=10 s prints as an integer so a noise-inflated run cannot grow the
    // line past the window (worst case per value: 4 chars, "999.9" never)
    def qv(v: Double): String = if (v >= 10) rd(v, 0) else rd(v, 1)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + qv(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errJson = if (errors.isEmpty) "" else "\"errors\":" + errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "},")
    val sfName = sfDir.split("/").filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    (s"""{"metric":"total","value":${rd(total, 2)},"unit":"sec","queries":$qs,$errJson"sf":"$sfName"}""",
      errors)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // hot LSH band buckets (template-heavy corpora) split at runtime
      // under standard AQE skew handling. forceOptimizeSkewedJoin stays
      // OFF: the round-4 "cost-free" A/B conclusion was falsified by the
      // driver's own bench — doc_ngram_jaccard went 2.65 s -> 4.41 s on
      // BYTE-IDENTICAL query code when force=on landed, and interleaved
      // re-A/B in round 5 reproduced force=off as consistently faster.
      // Mechanism: forcing inserts extra shuffles to split partitions
      // even when the plan must then re-exchange, which also defeats
      // ReusedExchange across the two sides of the banded SELF-joins.
      // Un-forced AQE still splits skew wherever no extra shuffle is
      // needed — the case hot band keys actually hit.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: first job pays JIT + codegen-compiler + Hadoop-path
    // init (~6s) regardless of which query runs first; absorb it here so
    // per-query numbers reflect steady state
    spark.range(0, 1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.format("noop").mode("overwrite").save()
    // noop-format write: executes the FULL plan (projections, sorts) —
    // .count() would let Catalyst prune projections and eliminate sorts.
    // SPARK_GRAFT_ONLY=a,b,c restricts to named queries (local dev loop
    // only — the driver never sets it, so its bench always runs all).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      // loud-fail: a typo'd name would otherwise silently bench 0 queries
      // and print a plausible-looking empty JSON line
      System.err.println(
        s"[bench] SPARK_GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    // the driver's full run benches the headline set (registry minus the
    // documented nonBenchQueries line-budget exclusions); SPARK_GRAFT_ONLY
    // may name ANY registry query, including an excluded one, for local
    // timing
    val qs = if (only.isEmpty) SparkEntry.benchQueries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val (line, errors) = run(spark, sfDir, qs)
    println(line)
    errors.foreach { case (q, e) => System.err.println(s"[bench] FAILED $q: $e") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
