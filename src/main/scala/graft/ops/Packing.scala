package graft.ops

import graft.core.KeyedScan
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for training-data preparation: concatenating documents
  * into fixed-token-budget training sequences. The packer only ASSIGNS
  * (sequence id, token offset) — the actual concatenation happens wherever
  * the tokens live, so the shuffle carries counts, never text. */
object Packing {

  /** Greedy first-fit-in-order packing: within each key group, walk rows in
    * `orderCol` order keeping a running token total; when the next row would
    * push the total past `budget`, close the sequence and start the next.
    * A row larger than `budget` gets a sequence of its own (no splitting —
    * the packer never breaks a document across sequences; budget-exceeding
    * docs are the caller's filter decision). `acc + tk == budget` still
    * fits: the gate is strictly `> budget`.
    *
    * Appends `seq_id` (0-based sequence index within the key group) and
    * `off` (token offset of this row within its sequence), both LONG.
    * `tokCol` must be a non-null LONG column.
    *
    * Scale shape: one shuffle on the key columns, then a sorted-group fold
    * with O(1) state per group ([[KeyedScan]] — same contract as the
    * streaming `transformWithState` path). Greedy-in-order is the packing
    * discipline large-corpus pipelines actually run: globally-optimal bin
    * packing needs the whole corpus on one node, while in-order packing
    * streams per shard and wastes at most one doc's tokens per boundary.
    *
    * Determinism contract: a row whose `orderCol` is null or not castable
    * to long aborts the query (a silent null clock would shuffle (seq_id,
    * off) assignments run-to-run). Duplicate `orderCol` values within a
    * key are tie-broken by a 64-bit hash of the whole row, so the packing
    * is reproducible even on non-unique clocks (two fully-identical rows
    * are interchangeable either way). Pre-existing `ts`/`seq` columns are
    * renamed aside for the scan and restored on output — the internal
    * clock never clobbers caller data. */
  def packGreedy(df: DataFrame, keyCols: Seq[String], tokCol: String,
      orderCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"packGreedy: budget must be positive, got $budget")
    require(!df.columns.exists(_.startsWith("__pack_")),
      "packGreedy: input must not contain __pack_-prefixed columns")
    // orderCol rides KeyedScan's (ts, seq) sort clock; caller ts/seq move
    // aside so the clock can't clobber them
    val aside = Seq("ts", "seq").filter(df.columns.contains)
      .map(c => c -> s"__pack_$c").toMap
    def mapped(c: String) = aside.getOrElse(c, c)
    val renamed = aside.foldLeft(df) { case (d, (c, t)) => d.withColumnRenamed(c, t) }
    val ordTs = col(mapped(orderCol)).cast("long")
    val in = renamed
      .withColumn("ts", when(ordTs.isNull,
          raise_error(concat(lit(s"packGreedy: orderCol '$orderCol' must be non-null and castable to long, got "),
            coalesce(col(mapped(orderCol)).cast("string"), lit("null")))).cast("long"))
        .otherwise(ordTs))
      .withColumn("seq", xxhash64(renamed.columns.map(col).toSeq: _*))
    val outSchema = StructType(in.schema.fields ++ Seq(
      StructField("seq_id", LongType, nullable = false),
      StructField("off", LongType, nullable = false)))
    val tIdx = in.schema.fieldIndex(mapped(tokCol))
    val out = KeyedScan(in, keyCols.map(mapped), outSchema) { (_, rows) =>
      var bin = 0L; var acc = 0L; var first = true
      rows.map { r =>
        val tk = r.getLong(tIdx)
        if (!first && acc + tk > budget) { bin += 1; acc = 0L }
        first = false
        val off = acc
        acc += tk
        Row.fromSeq(r.toSeq ++ Seq(bin, off))
      }
    }.drop("ts", "seq")
    aside.foldLeft(out) { case (d, (c, t)) => d.withColumnRenamed(t, c) }
  }
}
