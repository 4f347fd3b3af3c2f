package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-test data generator: replicate an sf directory's documents +
  * embeddings `factor`× so the dedup/ANN family can be measured above
  * sf0.1 (the round-5/6 verdicts' open scale item). Replication is
  * structure-preserving WITHIN a replica and structure-breaking ACROSS
  * replicas — the point is that input size grows `factor`× while the
  * near-dup/neighbor density per document stays the one the sf generator
  * chose, so runtime scaling measures the ALGORITHM, not an artifact of
  * 10-way duplicate clusters the replication itself created:
  *
  *  - documents: replica r applies a vocabulary ISOMORPHISM — every token
  *    gets a replica-id suffix. Within a replica, every n-gram relation
  *    between two docs is exactly the original (the map is a bijection on
  *    tokens, hence on shingles), so each replica carries precisely the
  *    source near-dup pair population; across replicas the token sets are
  *    disjoint, so every cross-replica Jaccard is 0 and no artifact
  *    10-doc clusters appear. (A naive insert-a-marker-token scheme fails
  *    this: 2-gram shingles mostly survive the insertions, cross-replica
  *    Jaccard stays ~0.6, every doc gains 9 near-dup copies, and the
  *    verified-pair count grows quadratically — measuring the data
  *    artifact, not the algorithm.)
  *  - embeddings: replica r circularly rotates the 64 dims by r·7 (mod
  *    64). Rotation is an isometry — within-replica cosines are EXACTLY
  *    the originals — while a vector and its rotation are as correlated
  *    as two random vectors, so no cross-replica ANN neighbors appear.
  *
  * Usage: runMain graft.GenScale <srcSfDir> <outDir> <factor>
  * (also copies region.parquet so Bench's warmup read works). */
object GenScale {

  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val maxId = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until factor).map { r =>
      if (r == 0) docs
      else docs.select(
        (col("doc_id") + lit(r * maxId)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1q$r").as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }.reduce(_ unionByName _)
  }

  def scaleEmbeddings(embs: DataFrame, factor: Int): DataFrame = {
    val maxId = embs.agg(max("vec_id")).head.getLong(0) + 1
    val dim = embs.select(size(col("embedding"))).head.getInt(0)
    (0 until factor).map { r =>
      val shift = (r * 7) % dim
      if (shift == 0) embs.select((col("vec_id") + lit(r * maxId)).as("vec_id"),
        col("embedding"), col("label"))
      else embs.select(
        (col("vec_id") + lit(r * maxId)).as("vec_id"),
        concat(slice(col("embedding"), shift + 1, dim - shift),
          slice(col("embedding"), 1, shift)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleDocuments(spark.read.parquet(s"$src/documents.parquet"), factor)
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    scaleEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), factor)
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    spark.read.parquet(s"$src/region.parquet")
      .write.mode("overwrite").parquet(s"$out/region.parquet")
    println(s"[gen_scale] wrote ${factor}x documents+embeddings to $out")
    spark.stop()
  }
}
