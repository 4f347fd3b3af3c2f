package graft

import org.apache.spark.sql.SparkSession

/** Per-query timing harness (noop-sink, bench-identical execution):
  * `runMain graft.Profile <sfDir> <query...>` — the local feedback loop for
  * plan iteration between full Bench runs.
  *
  * Shuffle-partition policy (the deployment default, round 12): when
  * `SPARK_GRAFT_SHUFFLE_PARTITIONS` is unset, the partition count SCALES
  * WITH THE INPUT — ⌈input bytes / 32 MiB⌉ clamped to [32, 1024] — not a
  * fixed 32. Rationale, measured at the 1000× GenScale decade (6.7M-doc
  * minhash pipeline, 128 GiB container): 32 partitions put ~40M shingle
  * rows in each sort/aggregate partition and the run spent 37.5 s in GC
  * (608 s wall); 256 partitions cut GC to 31.1 s and wall to 569 s —
  * partitions must grow with the data so each sort fits the executor
  * memory pool, exactly what `spark.sql.shuffle.partitions` ≈
  * input/32 MiB gives a 1000-executor cluster at 100 TB. At the bench
  * SFs (≤ ~1 GiB input) the formula floors at 32, so local records are
  * unchanged; [[Bench]] itself stays PINNED at 32 for cross-round
  * comparability (set the env var to A/B other values without a
  * rebuild). */
object Profile {
  /** ⌈bytes/32 MiB⌉ in [32, 1024] over the sfDir's parquet payload.
    * Files.walk does not follow directory symlinks (no cycle risk), and
    * ANY walk failure (missing dir, permission-denied subtree) falls back
    * to the 32 floor rather than crashing before the session exists. */
  private[graft] def scaledShufflePartitions(sfDir: String): Int = {
    val bytes =
      try {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      } catch { case _: Exception => 0L }
    math.min(1024L, math.max(32L, (bytes + (32L << 20) - 1) / (32L << 20))).toInt
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Queries.registry.map(_._1)
    // SPARK_GRAFT_FORCE_SKEW=true A/Bs the skew-join forcing without a
    // rebuild (default off, matching Bench — see its builder comment)
    val forceSkew = sys.env.getOrElse("SPARK_GRAFT_FORCE_SKEW", "false")
    val coalesce = sys.env.getOrElse("SPARK_GRAFT_AQE_COALESCE", "true")
    // scaling-with-data default (see the object scaladoc); env overrides
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
      scaledShufflePartitions(sfDir).toString)
    // EXPLODE-VOLUME knob (round 13, the round-12 verdict's top item):
    // the bytes-scaled shuffle-partition default sizes off SCAN bytes,
    // and an explode-heavy pipeline (bigram LM, shingle minhash)
    // shuffles ~10× what it scans, so round 12 proposed seeding AQE's
    // initialPartitionNum at 8× the bytes-derived count (AQE can only
    // MERGE partitions, so the initial number is the only split-side
    // knob). The round-13 interleaved A/B REJECTED that as the default:
    // 8× initial measured +6% at the 3rd decade (71.7→76.0 s), a wash
    // at the 4th (236.0→234.6), and +6% at the 5th (571.8→607.3 —
    // coalesce planning + more, smaller sort runs cost more than the
    // finer grain buys), while the bytes-scaled default was already
    // SUBLINEAR across those decades (3.29× wall on 3.33× data, then
    // 2.42× on 2.5×) — round 12's superlinear 278-vs-223 reading did
    // not reproduce under back-to-back runs. Default 0 = off; set
    // SPARK_GRAFT_AQE_INITIAL for genuinely explode-dominated jobs
    // (it wires initialPartitionNum without a rebuild).
    val aqeInitial = sys.env.getOrElse("SPARK_GRAFT_AQE_INITIAL", "0")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", forceSkew)
      .config("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
    val spark = (if (aqeInitial.toInt > 0)
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", aqeInitial)
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reg = Queries.registry.toMap
    // per-query SHUFFLE WRITE bytes (round 18): the aug_dtw payload-sort
    // fix is a shuffle-VOLUME claim, and wall-clock alone cannot verify
    // it on a noisy box — the listener makes the exchanged bytes a
    // first-class per-query reading. Listener delivery is async; the
    // short post-write sleep bounds the undercount (stage-completion
    // events for a finished job land well inside it).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    names.foreach { q =>
      // same per-query isolation as Bench: cached frames AND leaked
      // localCheckpoint blocks from a previous query must not stay
      // resident (round-17 drift root-cause — see Bench.isolate)
      Bench.isolate(spark)
      val g0 = gcMs
      val s0 = shuffleBytes.get
      val t0 = System.nanoTime()
      val df = reg(q).fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain async stage-completion events
      println(f"$q%-30s $wall%8.2f s  gc=${gcMs - g0}%5d ms  " +
        f"shuffle=${(shuffleBytes.get - s0) / 1048576.0}%9.1f MiB  build=$tBuild%.2f s")
    }
    spark.stop()
  }
}
