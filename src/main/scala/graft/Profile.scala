package graft

import org.apache.spark.sql.SparkSession

/** Per-query timing harness (noop-sink, bench-identical execution):
  * `runMain graft.Profile <sfDir> <query...>` — the local feedback loop for
  * plan iteration between full Bench runs. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Queries.registry.map(_._1)
    // SPARK_GRAFT_FORCE_SKEW=true A/Bs the skew-join forcing without a
    // rebuild (default off, matching Bench — see its builder comment)
    val forceSkew = sys.env.getOrElse("SPARK_GRAFT_FORCE_SKEW", "false")
    val coalesce = sys.env.getOrElse("SPARK_GRAFT_AQE_COALESCE", "true")
    // the scale-probe knob: at the GenScale decades (>=1000x the bench SF)
    // 32 partitions no longer fit the shingle aggregates in memory — a
    // real deployment sizes partitions with the data (the Bench builder
    // stays pinned at 32 for record comparability)
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", forceSkew)
      .config("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reg = Queries.registry.toMap
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    names.foreach { q =>
      // same per-query cache isolation as Bench: a persisted frame from a
      // previous query must not serve an identical subplan here
      spark.catalog.clearCache()
      val g0 = gcMs
      val t0 = System.nanoTime()
      val df = reg(q).fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.format("noop").mode("overwrite").save()
      println(f"$q%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  gc=${gcMs - g0}%5d ms  build=$tBuild%.2f s")
    }
    spark.stop()
  }
}
