package graft.sources

import graft.core.Timeline
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StructType

/** I/O adapters (SURVEY §2.12) — each the Spark-native form of a reference
  * adapter, sharing its semantics contract rather than its transport code. */
object Adapters {

  /** csv adapter (reference `adapters/csv.rs`). */
  object Csv {

    /** `csv_read` (reference `csv.rs:116-163`): typed, schema-first csv →
      * Timeline. The reference enforces the ordered-ts contract lazily
      * during replay (an out-of-order row aborts); here the same contract
      * is a lazy `raise_error` guard over the read order — materializing
      * any out-of-order row aborts the job. `seq` is the file read order.
      * Scale: file splits parallelize the scan; the guard's window rides
      * the sort the Timeline contract needs anyway. */
    def read(spark: SparkSession, path: String, schema: StructType,
        tsCol: String, keys: Seq[String] = Nil, header: Boolean = true,
        enforceOrdered: Boolean = true): Timeline = {
      var df = spark.read.option("header", header.toString).schema(schema).csv(path)
        .withColumn("seq", monotonically_increasing_id())
        .withColumn("ts", col(tsCol).cast("long"))
      if (enforceOrdered) {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col("seq"))
        val prev = lag(col("ts"), 1).over(w)
        df = df.withColumn("ts",
          when(prev.isNotNull && prev > col("ts"),
            raise_error(concat(lit(s"csv_read: out-of-order ts in $path at seq="), col("seq"))))
            .otherwise(col("ts")))
      }
      Timeline(df, keys)
    }

    /** `csv_write` (reference `csv.rs:176-299`): leading `time` column,
      * header row, one logical stream per directory. */
    def write(t: Timeline, path: String): Unit = {
      val rest = t.df.columns.filterNot(_ == "ts").map(col).toSeq
      t.df.select((col("ts").as("time") +: rest): _*)
        .write.option("header", "true").mode("overwrite").csv(path)
    }
  }

  /** lines adapter (reference `adapters/lines.rs`). */
  object Lines {

    /** `replay_lines` (reference `lines.rs:102`): each line a tick, time
      * derived from the line itself via `getTime`. */
    def replay(spark: SparkSession, path: String, getTime: Column => Column): Timeline = {
      val df = spark.read.text(path)
        .withColumn("seq", monotonically_increasing_id())
        .withColumn("ts", getTime(col("value")).cast("long"))
      Timeline(df)
    }

    /** `replay_lines_scheduled` (reference `lines.rs:140`): lines replayed
      * at a fixed period off the engine clock (line order = tick order). */
    def replayScheduled(spark: SparkSession, path: String, periodNs: Long,
        startNs: Long = 0L): Timeline = {
      val df = spark.read.text(path)
        .withColumn("seq", monotonically_increasing_id())
        .withColumn("ts", lit(startNs) + col("seq") * periodNs)
      Timeline(df)
    }

    /** `LinesSinkOps` (reference `lines.rs:251`): value column as text. */
    def sink(t: Timeline, path: String): Unit =
      t.df.select(col(t.valueCol).cast("string").as("value"))
        .write.mode("overwrite").text(path)

    /** `tail_lines` (reference `lines.rs:196`): LIVE tail of a line
      * stream — the realtime half of the lines adapter (replay/
      * replayScheduled are the historical half). Transport: Spark's file
      * stream source over a DIRECTORY — each file that appears is one
      * chunk of appended lines (the reference tails one growing file; a
      * directory of arriving chunk files is the same contract on a
      * transport Spark can actually watch — the file source never
      * re-reads a mutated file). Emits (value, ts, seq): ts via `getTime`
      * from the line, seq the arrival order.
      *
      * Ordered-ts contract, enforced LIVE exactly like the reference's
      * replay abort: a single-key stateful guard keeps the running max ts
      * across micro-batches and throws on a regression. The single key
      * serializes the stream through one task — inherent to the op, not a
      * compromise: the reference's tail is a single-threaded reader, and
      * a total arrival order is the thing the contract is ABOUT. Within a
      * chunk, lines are ordered by their own ts (file-split order is not
      * total across partitions). */
    def tail(spark: SparkSession, dir: String, getTime: Column => Column): DataFrame = {
      import spark.implicits._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      spark.readStream.text(dir)
        .withColumn("ts", getTime(col("value")).cast("long"))
        .select(col("value").cast("string"), col("ts")).as[(String, Long)]
        .groupByKey(_ => 0)
        .flatMapGroupsWithState[(Long, Long), (String, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, rows, state) =>
          var (maxTs, seq) = if (state.exists) state.get else (Long.MinValue, 0L)
          val out = rows.toSeq.sortBy(_._2).map { case (v, ts) =>
            if (ts < maxTs) throw new IllegalStateException(
              s"tail_lines: out-of-order ts $ts after $maxTs — the ordered-ts " +
                "replay contract aborts (reference lines.rs live tail)")
            maxTs = ts; seq += 1
            (v, ts, seq - 1)
          }
          state.update((maxTs, seq))
          out.iterator
        }.toDF("value", "ts", "seq")
    }
  }

  /** kafka adapter (reference `adapters/kafka.rs:233,412`): configuration
    * builders for Spark's kafka connector — `kafka_sub` ≡ readStream
    * format("kafka"), `kafka_pub` ≡ writeStream format("kafka").
    *
    * LIVE-LEG STATUS (documented attempt): a sub/pub round-trip needs a
    * broker and the spark-sql-kafka connector jar; this container has
    * neither (no broker binary, no connector in /opt/spark/jars, zero
    * egress to fetch one), so the live leg cannot run here. What CAN be
    * gated without either is the option schema itself — Spark's kafka
    * source rejects configs at load() by these same rules (exactly one
    * subscription strategy; bootstrap servers required; startingOffsets
    * one of earliest/latest/offset-json), so [[validateSubOptions]] /
    * [[validatePubOptions]] fail the SAME configs a live load() would,
    * at build time. In deployment the builders plug straight into the
    * connector. */
  object Kafka {

    /** The subscription-strategy option names — Spark's kafka source
      * requires EXACTLY ONE (its `load()`-time check; mirrored here so a
      * bad config dies in the builder, broker or not). */
    private val strategies = Seq("subscribe", "subscribePattern", "assign")

    /** Build + validate the full option map for `kafka_sub`. */
    def subOptions(servers: String, topic: String = null,
        pattern: String = null, assign: String = null,
        startingOffsets: String = "earliest"): Map[String, String] = {
      val m = Map("kafka.bootstrap.servers" -> servers,
        "startingOffsets" -> startingOffsets) ++
        Option(topic).map("subscribe" -> _) ++
        Option(pattern).map("subscribePattern" -> _) ++
        Option(assign).map("assign" -> _)
      validateSubOptions(m); m
    }

    /** The option-schema gate, matching Spark's kafka source `load()`
      * rules (KafkaSourceProvider.validateGeneralOptions in the public
      * Spark source): non-empty bootstrap servers, exactly one
      * subscription strategy with a non-empty value, startingOffsets ∈
      * {earliest, latest, <offset json>}. */
    def validateSubOptions(opts: Map[String, String]): Unit = {
      require(opts.get("kafka.bootstrap.servers").exists(_.trim.nonEmpty),
        "kafka_sub: kafka.bootstrap.servers is required")
      val present = strategies.filter(s => opts.get(s).exists(_.trim.nonEmpty))
      require(present.size == 1,
        s"kafka_sub: exactly one of ${strategies.mkString("/")} required, got " +
          (if (present.isEmpty) "none" else present.mkString(", ")))
      val so = opts.getOrElse("startingOffsets", "earliest").trim
      require(so == "earliest" || so == "latest" || so.startsWith("{"),
        s"kafka_sub: startingOffsets must be earliest, latest, or an offset-json map, got '$so'")
    }

    def subReader(spark: SparkSession, servers: String, topic: String,
        startingOffsets: String = "earliest"): DataStreamReader =
      subOptions(servers, topic = topic, startingOffsets = startingOffsets)
        .foldLeft(spark.readStream.format("kafka")) {
          case (r, (k, v)) => r.option(k, v)
        }

    /** `kafka_pub` options, validated by the sink's `load()` rules: a
      * default topic is required (rows may override via a `topic`
      * column — then pass `topicColumnOverride = true`). */
    def pubOptions(servers: String, topic: String,
        topicColumnOverride: Boolean = false): Map[String, String] = {
      val m = Map("kafka.bootstrap.servers" -> servers) ++ Option(topic).map("topic" -> _)
      validatePubOptions(m, topicColumnOverride); m
    }

    def validatePubOptions(opts: Map[String, String], topicColumnOverride: Boolean = false): Unit = {
      require(opts.get("kafka.bootstrap.servers").exists(_.trim.nonEmpty),
        "kafka_pub: kafka.bootstrap.servers is required")
      require(topicColumnOverride || opts.get("topic").exists(_.trim.nonEmpty),
        "kafka_pub: a topic is required unless rows carry a topic column")
    }

    /** The transport seam: everything above the wire — option validation,
      * the sink's required projection, the source's wire schema, the
      * envelope encode/decode — is the builder path both implementations
      * share. [[ConnectorTransport]] is the deployment leg
      * (format("kafka"), needs a broker + the spark-sql-kafka jar, neither
      * in this container); [[MemoryTransport]] is the in-process double
      * serving/capturing the SAME schemas, so the round-trip spec
      * exercises the full builder path and only the wire itself is
      * swapped. */
    trait Transport {
      /** Subscribe: yields the kafka SOURCE wire schema (key/value binary,
        * topic, partition, offset, timestamp, timestampType). `opts` have
        * passed [[validateSubOptions]]. */
      def sub(spark: SparkSession, opts: Map[String, String]): DataFrame
      /** Publish: consumes the kafka SINK projection (`value` required,
        * `key`/`topic` optional). `opts` have passed
        * [[validatePubOptions]]. */
      def pub(df: DataFrame, opts: Map[String, String],
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery
    }

    /** The real connector, verbatim option pass-through. Unrunnable in
      * this container (documented LIVE-LEG STATUS above) but the builder
      * path it shares with [[MemoryTransport]] is spec-gated. */
    object ConnectorTransport extends Transport {
      def sub(spark: SparkSession, opts: Map[String, String]): DataFrame =
        opts.foldLeft(spark.readStream.format("kafka")) {
          case (r, (k, v)) => r.option(k, v)
        }.load()
      def pub(df: DataFrame, opts: Map[String, String],
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
        opts.foldLeft(df.writeStream.format("kafka")) {
          case (w, (k, v)) => w.option(k, v)
        }.queryName(queryName).start()
    }

    /** Timeline → sink projection. The payload ships the tick VERBATIM —
      * `ts seq value` text, the same envelope discipline as the external
      * line protocol — so identity and order live in the data, not in
      * broker metadata (the reference's kafka adapter ships its own
      * timestamped envelope the same way, `kafka.rs:233`): replaying the
      * topic from any offset reproduces the exact Timeline. `key` (the
      * kafka partitioner's input) is the timeline key when given — ticks
      * of one key land in one partition, preserving their relative order
      * under the broker's per-partition guarantee. */
    def encode(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
      val payload = concat(col("ts").cast("string"), lit(" "),
        col("seq").cast("string"), lit(" "), col("value").cast("string"))
      val key = keyCol.map(c => col(c).cast("string").cast("binary"))
        .getOrElse(lit(null).cast("binary"))
      df.select(key.as("key"), payload.cast("binary").as("value"))
    }

    /** Wire → Timeline shape `(key, ts, seq, value)`: parse the envelope
      * back out of the payload. Fail-fast on a malformed payload (a wiring
      * error, not data — same loud-abort contract as tail_lines /
      * csv_read). */
    def decode(wire: DataFrame): DataFrame = {
      val parts = split(col("value").cast("string"), " ")
      wire
        .withColumn("__p", when(size(parts) === 3, parts).otherwise(
          raise_error(concat(lit("kafka_sub: malformed envelope (want 'ts seq value'): "),
            col("value").cast("string")))))
        .select(col("key").cast("string").as("key"),
          element_at(col("__p"), 1).cast("long").as("ts"),
          element_at(col("__p"), 2).cast("long").as("seq"),
          element_at(col("__p"), 3).as("value"))
    }

    /** `kafka_sub`, the full builder path: validated options → transport
      * wire → decoded Timeline shape. */
    def subscribe(spark: SparkSession, transport: Transport, servers: String,
        topic: String, startingOffsets: String = "earliest"): DataFrame =
      decode(transport.sub(spark,
        subOptions(servers, topic = topic, startingOffsets = startingOffsets)))

    /** `kafka_pub`, the full builder path: validated options → sink
      * projection → transport. `extraOpts` carries deployment-only sink
      * options (checkpointLocation etc.) untouched. */
    def publish(df: DataFrame, transport: Transport, servers: String,
        topic: String, queryName: String, keyCol: Option[String] = None,
        extraOpts: Map[String, String] = Map.empty)
        : org.apache.spark.sql.streaming.StreamingQuery = {
      val opts = pubOptions(servers, topic)
      transport.pub(encode(df, keyCol), opts ++ extraOpts, queryName)
    }

    /** One record on the double's wire — the kafka source's columns with
      * the timestamp as epoch millis (rendered to TimestampType in sub). */
    final case class WireRecord(key: Array[Byte], value: Array[Byte],
      topic: String, partition: Int, offset: Long, timestampMs: Long)

    /** The MemoryStream-backed double: an in-process single-partition
      * "broker" whose pub side captures the sink projection through
      * foreachBatch (validating the same frame shape the real sink
      * requires) and appends to a log, and whose sub side serves the log
      * as the kafka source's wire schema. Offsets are the append order;
      * the record timestamp is deterministic (the offset, as millis) so
      * replays are bit-stable. Both sides RE-validate their option maps —
      * the double must reject exactly what the connector's own load()
      * would, even if a caller bypasses the [[subscribe]]/[[publish]]
      * builders. */
    final class MemoryTransport(spark: SparkSession) extends Transport {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      private val mem = MemoryStream[WireRecord](
        org.apache.spark.sql.catalyst.encoders.encoderFor[WireRecord], spark.sqlContext)
      private val offsets = new java.util.concurrent.atomic.AtomicLong(0)
      /** The broker log, observable by specs. */
      val log = new java.util.concurrent.ConcurrentLinkedQueue[WireRecord]

      def sub(spark: SparkSession, opts: Map[String, String]): DataFrame = {
        validateSubOptions(opts)
        mem.toDS().select(col("key"), col("value"), col("topic"),
          col("partition"), col("offset"),
          timestamp_millis(col("timestampMs")).as("timestamp"),
          lit(0).as("timestampType"))
      }

      def pub(df: DataFrame, opts: Map[String, String],
          queryName: String): org.apache.spark.sql.streaming.StreamingQuery = {
        validatePubOptions(opts,
          topicColumnOverride = df.columns.contains("topic"))
        val topic = opts.getOrElse("topic", "")
        df.writeStream.queryName(queryName).foreachBatch {
          (batch: DataFrame, _: Long) =>
            // the real sink's frame contract: value required; key/topic
            // optional; value/key castable to binary
            require(batch.columns.contains("value"),
              "kafka_pub: sink frame requires a 'value' column")
            val rows = batch.select(
              (if (batch.columns.contains("key")) col("key") else lit(null))
                .cast("binary").as("key"),
              col("value").cast("binary").as("value"),
              (if (batch.columns.contains("topic")) col("topic") else lit(topic))
                .cast("string").as("topic")).collect()
            rows.foreach { r =>
              val off = offsets.getAndIncrement()
              val rec = WireRecord(r.getAs[Array[Byte]]("key"),
                r.getAs[Array[Byte]]("value"), r.getAs[String]("topic"),
                0, off, off)
              log.add(rec)
              mem.addData(rec)
            }
        }.start()
      }
    }
  }

  /** JDBC adapter (reference `adapters/postgres.rs`). */
  object Jdbc {

    /** Time-slice predicates for `postgres_read`'s sliced historical read
      * (reference `postgres.rs:359`): [t0, t1) cut into `slices` half-open
      * ranges on `tsCol` — each becomes one JDBC partition, the
      * Spark-native form of the reference's bounded look-ahead streaming
      * of history. */
    def timeSlices(tsCol: String, t0: Long, t1: Long, slices: Int): Array[String] = {
      require(slices >= 1 && t1 > t0)
      val step = math.max((t1 - t0) / slices, 1L)
      (0 until slices).map { i =>
        val lo = t0 + i * step
        val hi = if (i == slices - 1) t1 else t0 + (i + 1) * step
        s"$tsCol >= $lo AND $tsCol < $hi"
      }.toArray
    }

    /** `postgres_read` (reference `postgres.rs:359,778-800`): partitioned
      * historical read over the time slices. The reference's
      * `postgres_source` mode dispatch (historical read vs LISTEN/NOTIFY
      * live tail) IS our RunMode duality: this is the historical half; the
      * live half is [[pollTail]]. Driver jar ships with deployments. */
    def readTimeSliced(spark: SparkSession, url: String, table: String,
        tsCol: String, t0: Long, t1: Long, slices: Int,
        props: java.util.Properties = new java.util.Properties): DataFrame =
      spark.read.jdbc(url, table, timeSlices(tsCol, t0, t1, slices), props)

    /** The two faces of `postgres_source` (reference `postgres.rs:778-800`:
      * one switch selects the time-sliced historical read or the
      * LISTEN/NOTIFY live tail). */
    sealed trait Mode extends Serializable
    /** Replay history over `[t0, t1)` in `slices` JDBC partitions. */
    final case class Historical(t0: Long, t1: Long, slices: Int) extends Mode
    /** Tail the append table live, polling roughly every `pollMs`. */
    final case class Live(pollMs: Long = 1000L) extends Mode

    /** `postgres_source` (reference `postgres.rs:778-800`): ONE builder,
      * mode-dispatched — the reference flips between a sliced historical
      * SELECT and a LISTEN/NOTIFY subscription behind the same source
      * node; here the same switch yields a batch DataFrame or a streaming
      * one, both with the Timeline shape `(ts, seq, value)` so the
      * downstream wiring is mode-agnostic (the RunMode duality,
      * `runtime/run.rs:16-20`).
      *
      * Works against any JDBC database (the contract is SQL + an
      * append-only table with a monotone ts column, not the Postgres wire
      * protocol); deployments point it at Postgres, the in-process spec
      * leg at embedded Derby. */
    def postgresSource(spark: SparkSession, url: String, table: String,
        tsCol: String, valCol: String, mode: Mode,
        props: java.util.Properties = new java.util.Properties): DataFrame = mode match {
      case Historical(t0, t1, slices) =>
        // seq: JDBC slice reads carry no per-row order, so read order is
        // partition-prefixed monotonic ids — slices are time-ranged, so
        // later slices sort later; ties WITHIN an instant keep read order,
        // exactly the csv_read contract. Downstream Timeline(df) sorts by
        // (ts, seq) anyway.
        readTimeSliced(spark, url, table, tsCol, t0, t1, slices, props)
          .select(col(tsCol).cast("long").as("ts"),
            monotonically_increasing_id().as("seq"),
            col(valCol).cast("string").as("value"))
      case Live(pollMs) => pollTail(spark, url, table, tsCol, valCol, pollMs, props)
    }

    /** Lazy per-JVM (i.e. per-executor) JDBC connection cache for
      * [[pollTail]], keyed on url: a 1 s poll against a real database
      * must not open a fresh connection per micro-batch — the reference
      * holds ONE session for the LISTEN/NOTIFY lifetime
      * (`postgres.rs:778-800`). Closed/invalid connections are dropped
      * and reopened; a JVM shutdown hook closes whatever is cached.
      * Fetches synchronize on the connection (two tails of the same url
      * share it; JDBC connections are not statement-concurrent). The
      * `opens`/`fetches` counters are operational observability and the
      * spec's evidence that consecutive micro-batches share a session. */
    private[graft] object TailPool {
      private val conns = new java.util.concurrent.ConcurrentHashMap[String, java.sql.Connection]
      val opens = new java.util.concurrent.atomic.AtomicLong(0)
      val fetches = new java.util.concurrent.atomic.AtomicLong(0)
      locally {
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          conns.values.forEach(c => try c.close() catch { case _: Throwable => () })
          conns.clear()
        }))
      }
      def get(url: String, propPairs: Seq[(String, String)]): java.sql.Connection =
        conns.compute(url, (_, cached) => {
          val alive = cached != null &&
            (try !cached.isClosed && cached.isValid(1) catch { case _: Throwable => false })
          if (alive) cached
          else {
            if (cached != null) { try cached.close() catch { case _: Throwable => () } }
            val p = new java.util.Properties
            propPairs.foreach { case (k, v) => p.setProperty(k, v) }
            opens.incrementAndGet()
            java.sql.DriverManager.getConnection(url, p)
          }
        })
    }

    /** The live half of [[postgresSource]]: poll-based tail of an
      * append-only table (the transport-portable stand-in for
      * LISTEN/NOTIFY — same rows, same order, latency bounded by the poll
      * period instead of the push). A single-key stateful op carries the
      * high-water ts, the arrival seq and the last-fetch wall clock
      * across micro-batches; a micro-batch runs at most ONE fetch of
      * `WHERE $tsCol > hwm ORDER BY $tsCol` inside the executor task —
      * and none at all until `pollMs` has elapsed since the previous
      * fetch, so the poll PERIOD is honored for any pollMs: the rate
      * source only sets the micro-batch cadence (it floors at one batch
      * per second — deriving the period from rowsPerSecond alone would
      * poll a pollMs=5000 tail 5× too often), the elapsed-time gate in
      * state decides whether a batch actually touches the database.
      *
      * Ordered-ts contract: monotone BY CONSTRUCTION across polls (the
      * `>` high-water predicate never re-delivers) and within a fetch
      * (ORDER BY) — plus a defensive abort mirroring the reference's
      * replay abort. Late writes BELOW the high-water mark are therefore
      * skipped, never delivered out of order: the append contract is the
      * table's side of the deal (reference postgres.rs's tail assumes the
      * same). Single-task by design — a tail is a total arrival order,
      * the same inherent serialization as tail_lines. */
    def pollTail(spark: SparkSession, url: String, table: String,
        tsCol: String, valCol: String, pollMs: Long = 1000L,
        props: java.util.Properties = new java.util.Properties): DataFrame = {
      import spark.implicits._
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val propPairs = { // Properties is not serializable-friendly; ship pairs
        val it = props.stringPropertyNames().iterator()
        val b = Seq.newBuilder[(String, String)]
        while (it.hasNext) { val k = it.next(); b += k -> props.getProperty(k) }
        b.result()
      }
      spark.readStream.format("rate")
        .option("rowsPerSecond", math.max(1L, 1000L / math.max(pollMs, 1L)))
        .load()
        .select(col("value")).as[Long]
        .groupByKey(_ => 0)
        .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, String)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, _, state) =>
          // at most one fetch per micro-batch, none before pollMs elapses
          var (hwm, seq, lastFetchMs) =
            if (state.exists) state.get else (Long.MinValue, 0L, 0L)
          val nowMs = System.currentTimeMillis()
          if (nowMs - lastFetchMs < pollMs) Iterator.empty
          else {
            val conn = TailPool.get(url, propPairs)
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
            conn.synchronized {
              TailPool.fetches.incrementAndGet()
              val st = conn.prepareStatement(
                s"SELECT $tsCol, $valCol FROM $table WHERE $tsCol > ? ORDER BY $tsCol")
              try {
                st.setLong(1, hwm)
                val rs = st.executeQuery()
                while (rs.next()) {
                  val ts = rs.getLong(1)
                  if (ts < hwm) throw new IllegalStateException(
                    s"postgres_source tail: out-of-order ts $ts after $hwm — the " +
                      "ordered-ts replay contract aborts (reference postgres.rs live tail)")
                  hwm = ts
                  out += ((ts, seq, rs.getString(2)))
                  seq += 1
                }
              } finally st.close()
            }
            state.update((hwm, seq, nowMs))
            out.iterator
          }
        }.toDF("ts", "seq", "value")
    }
  }
}
