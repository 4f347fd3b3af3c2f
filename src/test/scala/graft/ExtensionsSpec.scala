package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.GraftSql

/** The SQL front door to graft's native expressions: after registration,
  * `dot_packed` is callable from `spark.sql` and computes the same value
  * as the Scala column API (one expression, two entry points). */
class ExtensionsSpec extends SparkSuite {

  private def pack(v: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(v.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    v.foreach(bb.putDouble)
    bb.array()
  }

  test("dot_packed registers as a SQL function and matches the column API") {
    GraftSql.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, pack(Array(1.0, 2.0, 3.0)), pack(Array(4.0, 5.0, 6.0))),
      (2L, pack(Array(0.5, -1.0)), pack(Array(2.0, 2.0))))
      .toDF("id", "a", "b")
    rows.createOrReplaceTempView("vecs")
    try {
      val sql = spark.sql("SELECT id, dot_packed(a, b) AS d FROM vecs ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(sql.toSeq == Seq((1L, 32.0), (2L, -1.0)))
      val colApi = rows.select($"id",
          org.apache.spark.sql.GraftColumns.dotPacked($"a", $"b").as("d"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(colApi.toSeq == sql.toSeq, "SQL and column API must share the expression")
    } finally spark.catalog.dropTempView("vecs")
  }

  test("extensions injector carries the same registry as live registration") {
    // a session configured with spark.sql.extensions=graft.GraftExtensions
    // receives exactly GraftExtensions.functions; applying the injector to
    // a fresh SparkSessionExtensions must accept every triple (shape gate)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftExtensions.functions.map(_._1.funcName) ==
      Seq("dot_packed", "dtw_band"))
  }

  test("a session built withExtensions(GraftExtensions) resolves dot_packed with no manual registration") {
    // end-to-end injector route: force the builder's create path (same
    // SparkContext, fresh sessionState) so GraftExtensions.apply actually
    // runs — a no-op apply() fails this test at name resolution. (The
    // spark.sql.extensions CONFIG route reads the static conf of the
    // SparkContext, which a suite sharing one context cannot set;
    // withExtensions feeds the identical injector object the config route
    // instantiates, so the injected registry is the same.)
    import org.apache.spark.sql.SparkSession
    val original = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2.ne(original), "builder must have created a fresh session")
      def hex(v: Array[Double]): String =
        pack(v).map(b => f"${b & 0xff}%02x").mkString
      // [1,2,3]·[4,5,6] = 32 — never call s2.stop(): it would stop the
      // SparkContext shared with every other suite
      val d = s2.sql(
        s"SELECT dot_packed(X'${hex(Array(1.0, 2.0, 3.0))}', X'${hex(Array(4.0, 5.0, 6.0))}') AS d")
        .collect().head.getDouble(0)
      assert(d == 32.0)
    } finally {
      SparkSession.setDefaultSession(original)
      SparkSession.setActiveSession(original)
    }
  }

  test("dot_packed arity is enforced at plan time") {
    GraftSql.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT dot_packed(x'00')").collect()
    }
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("dot_packed"))
  }
}
