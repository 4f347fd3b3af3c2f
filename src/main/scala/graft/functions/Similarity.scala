package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity primitives. Vectors are `array<float>` columns
  * (cast to double at the boundary); all math is Column-expression
  * (`zip_with`/`aggregate`) so it stays inside whole-stage codegen — no
  * UDF, no driver collect. The LSH path is the 100 TB strategy: bucket on
  * deterministic random-hyperplane signs, join within buckets only. */
object Similarity {

  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign bit of vec · hyperplane(plane), with hyperplane components derived
    * from the portable hash60(plane:dim) mapped to [-1, 1) — deterministic,
    * engine-portable pseudo-random planes (no stored model). */
  def hyperplaneSign(vec: Column, plane: Int): Column = {
    val d = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * ((TextFunctions.hash60(concat(lit(s"$plane:"), i)) % 2000001L) - 1000000L).cast("double")),
      lit(0.0), (acc, x) => acc + x)
    when(d >= 0, lit(1)).otherwise(lit(0))
  }

  /** Random-hyperplane LSH bucket key over `nPlanes` planes: concatenated
    * sign bits. Cosine-similar vectors collide with high probability. */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    concat((0 until nPlanes).map(p => hyperplaneSign(vec, p).cast("string")): _*)

  /** Brute-force cosine top-k: every query row against every candidate row.
    * Correctness baseline; O(|Q|·|C|) — at scale use [[annTopK]]. */
  def bruteTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
    val c = candidates.select(col("vec_id").as("nid"), toDouble(col("embedding")).as("nv"))
    val sims = q.join(c, col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(round(col("sim") + lit(1e-9), 4).desc, col("nid"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim") + lit(1e-9), 4).as("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * bucket. The scale path: the join is co-partitioned on the bucket key,
    * each bucket ~ |C| / 2^nPlanes rows. */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int, nPlanes: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), nPlanes))
    val c = candidates.select(col("vec_id").as("nid"), toDouble(col("embedding")).as("nv"))
      .withColumn("bucket", lshBucket(col("nv"), nPlanes))
    val sims = q.join(c, Seq("bucket")).where(col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(round(col("sim") + lit(1e-9), 4).desc, col("nid"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim") + lit(1e-9), 4).as("sim"),
        col("rank").cast("long").as("rank"))
  }
}
