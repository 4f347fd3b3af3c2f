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
    assert(Kafka.subOptions("h:9092", topic = "ticks") ==
      Map("kafka.bootstrap.servers" -> "h:9092", "startingOffsets" -> "earliest",
        "subscribe" -> "ticks"))

    // option-schema gate: the SAME configs Spark's kafka source rejects at
    // load() die in the builder (no broker/connector in this container —
    // documented in Adapters.Kafka — so the schema check IS the live gate)
    val noStrategy = intercept[IllegalArgumentException](Kafka.subOptions("h:9092"))
    assert(noStrategy.getMessage.contains("exactly one"))
    val twoStrategies = intercept[IllegalArgumentException](
      Kafka.subOptions("h:9092", topic = "t", pattern = "t.*"))
    assert(twoStrategies.getMessage.contains("exactly one"))
    val noServers = intercept[IllegalArgumentException](Kafka.subOptions(" ", topic = "t"))
    assert(noServers.getMessage.contains("bootstrap.servers"))
    val badOffsets = intercept[IllegalArgumentException](
      Kafka.subOptions("h:9092", topic = "t", startingOffsets = "beginning"))
    assert(badOffsets.getMessage.contains("startingOffsets"))
    assert(Kafka.subOptions("h:9092", topic = "t",
      startingOffsets = """{"t":{"0":23}}""").nonEmpty, "offset-json accepted")
    val noTopic = intercept[IllegalArgumentException](Kafka.pubOptions("h:9092", null))
    assert(noTopic.getMessage.contains("topic"))
    assert(Kafka.pubOptions("h:9092", null, topicColumnOverride = true) ==
      Map("kafka.bootstrap.servers" -> "h:9092"), "per-row topic column mode")

    val slices = Jdbc.timeSlices("ts", 0L, 100L, 4)
    assert(slices.length == 4)
    assert(slices.head == "ts >= 0 AND ts < 25" && slices.last == "ts >= 75 AND ts < 100")
    // half-open, covering, non-overlapping: boundary values hit exactly once
    assert(Jdbc.timeSlices("ts", 0L, 10L, 3).mkString("|") ==
      "ts >= 0 AND ts < 3|ts >= 3 AND ts < 6|ts >= 6 AND ts < 10")
  }

  test("postgres_source dispatches historical vs live off one switch (postgres.rs:778-800)") {
    // in-process stand-in: embedded Derby (ships in /opt/spark/jars) — the
    // builder's contract is SQL + an append-only monotone-ts table, not
    // the Postgres wire protocol, so the dispatch + ordered-ts contract
    // are provable without a server
    val url = s"jdbc:derby:${tmp("pg_derby")}/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    def exec(sql: String): Unit = { val s = conn.createStatement(); s.execute(sql); s.close() }
    def insert(ts: Long, v: String): Unit =
      exec(s"INSERT INTO evts VALUES ($ts, '$v')")
    exec("CREATE TABLE evts (ts BIGINT, v VARCHAR(64))")
    (1 to 9).foreach(i => insert(i * 100L, s"h$i"))

    // historical: batch frame, one JDBC partition per time slice
    val hist = Jdbc.postgresSource(spark, url, "evts", "ts", "v",
      Jdbc.Historical(0L, 1000L, slices = 4))
    assert(!hist.isStreaming, "Historical mode must dispatch to a batch read")
    assert(hist.rdd.getNumPartitions == 4, "one partition per time slice")
    val h = hist.orderBy("ts", "seq").select("ts", "value").as[(Long, String)].collect().toSeq
    assert(h == (1 to 9).map(i => (i * 100L, s"h$i")), s"sliced replay must cover [t0,t1): $h")

    // live: streaming frame; rows inserted mid-query arrive ordered with
    // contiguous arrival seq
    val live = Jdbc.postgresSource(spark, url, "evts", "ts", "v", Jdbc.Live(pollMs = 10))
    assert(live.isStreaming, "Live mode must dispatch to a streaming tail")
    val q = live.writeStream.format("memory").queryName("pg_mem").outputMode("append").start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("pg_mem").count() < n && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(50)
      }
      assert(spark.table("pg_mem").count() >= n, s"expected $n tailed rows")
    }
    try {
      awaitRows(9) // the backlog drains through the first poll
      insert(1000L, "x10"); insert(1100L, "x11")
      awaitRows(11)
      insert(150L, "late") // below the high-water mark: skipped, never out of order
      insert(1200L, "x12")
      awaitRows(12)
      val got = spark.table("pg_mem").orderBy("seq")
        .select("ts", "seq", "value").as[(Long, Long, String)].collect().toSeq
      assert(got.map(_._1) == got.map(_._1).sorted, s"tail must deliver ts-ordered: $got")
      assert(got.map(_._2) == (0L until 12L).toSeq, s"arrival seq must be contiguous: $got")
      assert(got.takeRight(3).map(_._3) == Seq("x10", "x11", "x12"),
        s"mid-query inserts arrive in insert order; the sub-hwm late write is skipped: $got")
      assert(!got.exists(_._3 == "late"), "a write below the high-water mark is never delivered")
    } finally { q.stop(); conn.close() }
  }

  test("pollTail holds ONE JDBC session across micro-batches and honors pollMs above 1s") {
    val url = s"jdbc:derby:${tmp("pg_pool")}/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    def exec(sql: String): Unit = { val s = conn.createStatement(); s.execute(sql); s.close() }
    exec("CREATE TABLE evts (ts BIGINT, v VARCHAR(64))")
    (1 to 3).foreach(i => exec(s"INSERT INTO evts VALUES (${i * 100L}, 'p$i')"))
    val opens0 = Jdbc.TailPool.opens.get()
    val fetches0 = Jdbc.TailPool.fetches.get()

    // leg 1: a fast poll runs many fetches — all through one connection
    // (round-7 opened a fresh connection per micro-batch; the reference
    // holds one session for the LISTEN/NOTIFY lifetime, postgres.rs:778)
    val q1 = Jdbc.postgresSource(spark, url, "evts", "ts", "v", Jdbc.Live(pollMs = 10))
      .writeStream.format("memory").queryName("pg_pool_mem").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (Jdbc.TailPool.fetches.get() - fetches0 < 3 &&
        System.currentTimeMillis() < deadline) {
        q1.processAllAvailable(); Thread.sleep(50)
      }
      assert(Jdbc.TailPool.fetches.get() - fetches0 >= 3, "expected >= 3 polls to run")
    } finally q1.stop()
    assert(Jdbc.TailPool.opens.get() - opens0 == 1,
      "consecutive micro-batches must share one pooled connection, not open per batch")

    // leg 2: pollMs far above the rate source's 1-batch/s floor — batches
    // keep arriving but the elapsed-time gate must keep the database
    // untouched after the first fetch (round-7 derived the period from
    // rowsPerSecond, which floors at 1 row/s: a 60 s poll fetched every
    // second)
    val fetchesGate = Jdbc.TailPool.fetches.get()
    val q2 = Jdbc.postgresSource(spark, url, "evts", "ts", "v", Jdbc.Live(pollMs = 60000))
      .writeStream.format("memory").queryName("pg_gate_mem").outputMode("append").start()
    try {
      val until = System.currentTimeMillis() + 2500
      while (System.currentTimeMillis() < until) {
        q2.processAllAvailable(); Thread.sleep(100)
      }
      assert(Jdbc.TailPool.fetches.get() - fetchesGate <= 1,
        "a 60 s poll must fetch at most once in 2.5 s of 1 Hz micro-batches")
    } finally { q2.stop(); conn.close() }
    assert(Jdbc.TailPool.opens.get() - opens0 == 1,
      "the gated tail reuses the same pooled connection (same url)")
  }

  test("kafka round-trip through the MemoryStream double: the builder path " +
    "the connector would use carries (ts, seq, value) exactly") {
    val transport = new Kafka.MemoryTransport(spark)
    val ticks = Seq(
      ("a", 100L, 1L, 1.5), ("b", 100L, 2L, -2.0),
      ("a", 200L, 3L, 0.25), ("b", 300L, 4L, 7.0))

    // pub leg: a channel-fed streaming Timeline frame through publish()
    // (validated options -> encode -> transport) — the double's foreachBatch
    // enforces the real sink's frame contract and appends to the broker log
    val ch = new graft.streaming.Channel(spark)
    val pubQ = Kafka.publish(ch.toDS.toDF(), transport, "mem:9092", "ticks",
      queryName = "kafka_pub_double", keyCol = Some("key"))
    try {
      ticks.foreach { case (k, ts, _, v) => ch.sendAt(k, ts, v) }
      ch.flush(); pubQ.processAllAvailable()
    } finally pubQ.stop()
    assert(transport.log.size() == 4, "every tick reached the broker log")
    import scala.jdk.CollectionConverters._
    assert(transport.log.asScala.map(_.topic).toSet == Set("ticks"),
      "the validated default topic rode the option map into each record")
    assert(transport.log.asScala.map(r => new String(r.key)).toSet == Set("a", "b"),
      "the timeline key is the kafka partitioner key")

    // sub leg: subscribe() (validated options -> wire -> decode) back to
    // the Timeline shape; the envelope, not broker metadata, carries
    // identity — so the round-trip is exact
    val q = Kafka.subscribe(spark, transport, "mem:9092", "ticks")
      .writeStream.format("memory").queryName("kafka_sub_double")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.table("kafka_sub_double")
      .select(col("key"), col("ts"), col("seq"), col("value").cast("double"))
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._3)
    // seq was assigned by the channel in send order (1..4): compare verbatim
    assert(back == ticks.map { case (k, ts, _, v) => (k, ts, 0L, v) }
      .zipWithIndex.map { case ((k, ts, _, v), i) => (k, ts, i + 1L, v) },
      s"round-trip must reproduce the exact ticks, got $back")

    // the double enforces the SAME option gates the connector's load()
    // would, even when the builders are bypassed
    val badSub = intercept[IllegalArgumentException](
      transport.sub(spark, Map("kafka.bootstrap.servers" -> "mem:9092")))
    assert(badSub.getMessage.contains("exactly one"))
    val badPub = intercept[IllegalArgumentException](
      transport.pub(ch.toDS.toDF(), Map.empty, "bad"))
    assert(badPub.getMessage.contains("bootstrap.servers"))
  }
}
