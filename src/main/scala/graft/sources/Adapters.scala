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
    * format("kafka"), `kafka_pub` ≡ writeStream format("kafka"). The
    * connector jar ships with deployments, not this container, so these
    * return the fully-configured reader/options without connecting. */
  object Kafka {
    def subReader(spark: SparkSession, servers: String, topic: String,
        startingOffsets: String = "earliest"): DataStreamReader =
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)

    def pubOptions(servers: String, topic: String): Map[String, String] =
      Map("kafka.bootstrap.servers" -> servers, "topic" -> topic)
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
      * live half is a streaming source in deployment. Driver jar ships
      * with deployments. */
    def readTimeSliced(spark: SparkSession, url: String, table: String,
        tsCol: String, t0: Long, t1: Long, slices: Int,
        props: java.util.Properties = new java.util.Properties): DataFrame =
      spark.read.jdbc(url, table, timeSlices(tsCol, t0, t1, slices), props)
  }
}
