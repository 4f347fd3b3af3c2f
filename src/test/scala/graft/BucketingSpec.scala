package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** Bucketed tables must deliver what they exist for: a join between two
  * tables bucketed on the join key plans with ZERO exchanges — the hash
  * partitioning lives in the table layout, not in a per-run shuffle. */
class BucketingSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("co-bucketed join plans with zero exchanges and matches the plain join") {
    val orders = Tables.orders(spark, d).select("o_orderkey", "o_orderdate")
    val lines = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
    Bucketed.write(orders, "bk_orders", "o_orderkey", 4)
    Bucketed.write(lines, "bk_lineitem", "l_orderkey", 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the test exercises the co-located SMJ path
      // (at sf0.001 everything would broadcast and prove nothing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.table(spark, "bk_orders")
        .join(Bucketed.table(spark, "bk_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle (join AND groupBy ride the bucket partitioning):\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "the equi-join survived")
      // correctness: identical to the un-bucketed join
      val plain = orders.join(lines, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      assert(joined.orderBy("o_orderkey").collect().toSeq ==
        plain.orderBy("o_orderkey").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bk_orders")
      spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    }
  }

  test("mismatched bucket counts fall back to a shuffle (the contract is symmetric)") {
    val orders = Tables.orders(spark, d).select("o_orderkey", "o_orderdate")
    val lines = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
    Bucketed.write(orders, "bk_orders8", "o_orderkey", 8)
    Bucketed.write(lines, "bk_lineitem4", "l_orderkey", 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = Bucketed.table(spark, "bk_orders8")
        .join(Bucketed.table(spark, "bk_lineitem4"),
          col("o_orderkey") === col("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("Exchange"),
        "mismatched bucket counts cannot co-locate; planner must shuffle a side")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bk_orders8")
      spark.sql("DROP TABLE IF EXISTS bk_lineitem4")
    }
  }
}
