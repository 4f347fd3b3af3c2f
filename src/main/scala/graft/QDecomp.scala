package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-20 measurement probe (guide §1: measure first): decompose a
  * query's wall into DRIVER work (DataFrame construction, physical
  * planning) vs CLUSTER work (sum of executor task time, job/stage
  * counts) so optimization effort lands on the axis that actually
  * dominates at bench scale. Bench-identical session shape (local[N],
  * N shuffle partitions, AQE skew on, noop sink, 2 passes, min).
  *
  * `runMain graft.QDecomp <sfDir> <query...>` — prints one line per
  * query: build s, plan s, exec1 s (cold), exec2 s (warm), jobs,
  * stages, tasks, task-time sum s (warm pass).
  *
  * Measurement tool only — never part of a query path. */
object QDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("doc_lm_ppl")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNs = 0L
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) taskNs += m.executorRunTime * 1000000L
      }
    }
    spark.sparkContext.addSparkListener(l)

    // warmup (JIT + codegen + hadoop init), same as Bench.main
    spark.range(0, 1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val reg = Queries.registry.toMap
    // /proc/stat steal+idle fractions and JVM GC ms around each query —
    // the attribution columns that separate code from tenancy from heap
    def cpuStat(): (Long, Long, Long) = {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().split("\\s+").drop(1).take(8).map(_.toLong)
        (f.sum, f(7), f(3))
      } finally src.close()
    }
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    println(f"${"query"}%-24s ${"build"}%7s ${"plan"}%7s ${"exec1"}%7s ${"exec2"}%7s ${"jobs"}%5s ${"stage"}%5s ${"tasks"}%6s ${"taskS"}%8s ${"gcS"}%6s ${"steal%"}%7s ${"idle%"}%6s")
    names.foreach { n =>
      def snap(): (Int, Int, Int, Long) = (jobs, stages, tasks, taskNs)
      val (c0, s0, i0) = cpuStat()
      val g0 = gcMs()
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val df = reg(n).fn(spark, sfDir)
      val t1 = System.nanoTime()
      val _ = df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      // pass 2: fresh build (bench re-invokes fn each pass)
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(300) // drain pass-1's late listener events BEFORE the
      // warm baseline (round-20 advisor: without this, in-flight pass-1
      // task/stage events could inflate the warm pass's j-columns)
      val j0 = snap()
      val t4 = System.nanoTime()
      reg(n).fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t5 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain
      val j1 = snap()
      val (c1, s1, i1) = cpuStat()
      val g1 = gcMs()
      println(f"$n%-24s ${(t1 - t0) / 1e9}%7.2f ${(t2 - t1) / 1e9}%7.2f " +
        f"${(t3 - t2) / 1e9}%7.2f ${(t5 - t4) / 1e9}%7.2f " +
        f"${j1._1 - j0._1}%5d ${j1._2 - j0._2}%5d ${j1._3 - j0._3}%6d " +
        f"${(j1._4 - j0._4) / 1e9}%8.2f ${(g1 - g0) / 1e3}%6.1f " +
        f"${(s1 - s0) * 100.0 / math.max(1L, c1 - c0)}%7.1f " +
        f"${(i1 - i0) * 100.0 / math.max(1L, c1 - c0)}%6.1f")
    }
    spark.stop()
  }
}
