package graft

import graft.core.Timeline
import graft.sources.Adapters.{Csv, Jdbc, Kafka, Lines}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** I/O adapter contracts: csv round-trip + ordered-ts enforcement
  * (csv.rs:116-163,176-299), lines replay (lines.rs:102,140), kafka/jdbc
  * configuration builders (no services in-container). */
class AdaptersSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val schema = StructType(Seq(
    StructField("t", LongType), StructField("k", StringType), StructField("v", DoubleType)))

  test("csv round-trip: write with leading time column, read back typed (csv.rs)") {
    val dir = tmp("csv_rt") + "/out"
    val t = Timeline(
      Seq((10L, 0L, "a", 1.5), (20L, 1L, "a", 2.5)).toDF("ts", "seq", "k", "value"),
      keys = Seq("k"))
    Csv.write(t, dir)
    val hdr = spark.read.option("header", "false").csv(dir).first().getString(0)
    assert(hdr == "time", "reference csv_write puts the time column first")
    val back = spark.read.option("header", "true").csv(dir)
      .select(col("time").cast("long"), col("value").cast("double"))
      .as[(Long, Double)].collect().toSeq.sorted
    assert(back == Seq((10L, 1.5), (20L, 2.5)))
  }

  test("csv_read enforces the ordered-ts contract lazily (out-of-order aborts)") {
    val dir = tmp("csv_ord")
    Files.writeString(java.nio.file.Path.of(dir, "ok.csv"), "t,k,v\n10,a,1.0\n20,a,2.0\n")
    val ok = Csv.read(spark, s"$dir/ok.csv", schema, "t", keys = Seq("k"))
    assert(ok.df.select("ts").as[Long].collect().sorted.toSeq == Seq(10L, 20L))

    Files.writeString(java.nio.file.Path.of(dir, "bad.csv"), "t,k,v\n20,a,1.0\n10,a,2.0\n")
    val bad = Csv.read(spark, s"$dir/bad.csv", schema, "t", keys = Seq("k"))
    val ex = intercept[Exception] { bad.df.collect() }
    assert(ex.getMessage.contains("out-of-order"), s"got: ${ex.getMessage}")
    // and the contract is opt-out for pre-sorted-by-engine use
    assert(Csv.read(spark, s"$dir/bad.csv", schema, "t", Seq("k"), enforceOrdered = false)
      .df.count() == 2)
  }

  test("replay_lines: time from the line; scheduled: fixed period (lines.rs:102,140)") {
    val dir = tmp("lines")
    Files.writeString(java.nio.file.Path.of(dir, "in.txt"), "100 alpha\n200 beta\n300 gamma\n")
    val byPrefix = Lines.replay(spark, s"$dir/in.txt",
      line => split(line, " ").getItem(0).cast("long"))
    assert(byPrefix.df.select("ts").as[Long].collect().sorted.toSeq == Seq(100L, 200L, 300L))

    val sched = Lines.replayScheduled(spark, s"$dir/in.txt", periodNs = 10L, startNs = 5L)
    assert(sched.df.select("ts").as[Long].collect().sorted.toSeq == Seq(5L, 15L, 25L))

    Lines.sink(sched, s"$dir/out")
    val back = spark.read.text(s"$dir/out").as[String].collect().toSet
    assert(back == Set("100 alpha", "200 beta", "300 gamma"))
  }

  test("kafka/jdbc builders carry the full config (services ship in deployment)") {
    assert(Kafka.pubOptions("h:9092", "ticks") ==
      Map("kafka.bootstrap.servers" -> "h:9092", "topic" -> "ticks"))
    assert(Kafka.subReader(spark, "h:9092", "ticks") != null)

    val slices = Jdbc.timeSlices("ts", 0L, 100L, 4)
    assert(slices.length == 4)
    assert(slices.head == "ts >= 0 AND ts < 25" && slices.last == "ts >= 75 AND ts < 100")
    // half-open, covering, non-overlapping: boundary values hit exactly once
    assert(Jdbc.timeSlices("ts", 0L, 10L, 3).mkString("|") ==
      "ts >= 0 AND ts < 3|ts >= 3 AND ts < 6|ts >= 6 AND ts < 10")
  }
}
