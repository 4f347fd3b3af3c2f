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

  /** Driver-side md5-prefix hash, identical to [[TextFunctions.hash60]]. */
  private def hash60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic pseudo-random hyperplane for (plane, dim): components
    * hash60("plane:i") mapped to [-1e6, 1e6], materialized as PLAN-TIME
    * literals — zero hashing at runtime (round 1 recomputed one md5 per
    * component × plane × row). No stored model; any executor rebuilds the
    * same planes. */
  def planeVec(plane: Int, dim: Int): Seq[Double] =
    (0 until dim).map(i => ((hash60Local(s"$plane:$i") % 2000001L) - 1000000L).toDouble)

  /** Sign bit of vec · hyperplane(plane). */
  def hyperplaneSign(vec: Column, plane: Int, dim: Int): Column = {
    val p = array(planeVec(plane, dim).map(lit(_)): _*)
    val d = aggregate(zip_with(vec, p, (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
    when(d >= 0, lit(1)).otherwise(lit(0))
  }

  /** Random-hyperplane LSH bucket key over `nPlanes` planes: concatenated
    * sign bits. Cosine-similar vectors collide with high probability. */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    concat((0 until nPlanes).map(p => hyperplaneSign(vec, p, dim).cast("string")): _*)

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

  /** Bucket keys for `nTables` independent LSH tables (table t uses planes
    * [t*nPlanes, (t+1)*nPlanes)), as (table, bucket) rows via one explode. */
  private def tableBuckets(vec: Column, nPlanes: Int, nTables: Int, dim: Int): Column =
    array((0 until nTables).map { t =>
      struct(lit(t).as("table"),
        concat((t * nPlanes until (t + 1) * nPlanes)
          .map(p => hyperplaneSign(vec, p, dim).cast("string")): _*).as("bucket"))
    }: _*)

  /** Multi-table LSH approximate top-k (the classic recall lever: L
    * independent tables, union of in-bucket candidates, exact cosine +
    * top-k on the union). The scale shape: candidate generation is an
    * equi-join co-partitioned on (table, bucket) — per query ~
    * L·|C|/2^nPlanes candidates, never |C|; recall 1-(1-p)^L vs p for one
    * table. Gated by the recall@k spec against [[bruteTopK]]. */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int, nPlanes: Int,
      nTables: Int = 8, dimHint: Int = -1): DataFrame = {
    // dim from the caller when known; otherwise inferred from the first
    // candidate (empty input → empty result, not NoSuchElementException)
    val dim = if (dimHint > 0) dimHint
      else candidates.select(size(col("embedding"))).take(1).headOption
        .map(_.getInt(0)).getOrElse(0)
    if (dim == 0)
      return candidates.sparkSession.emptyDataFrame
        .select(lit(0L).as("qid"), lit(0L).as("nid"), lit(0.0).as("sim"), lit(0L).as("rank"))
        .where(lit(false))
    // mixed-dimension input would silently hash against a wrong-length
    // plane — fail loudly instead
    def checked(vec: Column): Column =
      when(size(vec) === dim, toDouble(vec))
        .otherwise(raise_error(concat(lit(s"annTopK: expected dim $dim, got "),
          size(vec).cast("string"))))
    val q = queries.select(col("vec_id").as("qid"), checked(col("embedding")).as("qv"))
      .select(col("qid"), col("qv"),
        explode(tableBuckets(col("qv"), nPlanes, nTables, dim)).as("tb"))
      .select(col("qid"), col("qv"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val c = candidates.select(col("vec_id").as("nid"), checked(col("embedding")).as("nv"))
      .select(col("nid"), col("nv"),
        explode(tableBuckets(col("nv"), nPlanes, nTables, dim)).as("tb"))
      .select(col("nid"), col("nv"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val cand = q.join(c, Seq("table", "bucket")).where(col("qid") =!= col("nid"))
      .select("qid", "qv", "nid", "nv").dropDuplicates("qid", "nid")
    val sims = cand.withColumn("sim", cosine(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(round(col("sim") + lit(1e-9), 4).desc, col("nid"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim") + lit(1e-9), 4).as("sim"),
        col("rank").cast("long").as("rank"))
  }
}
