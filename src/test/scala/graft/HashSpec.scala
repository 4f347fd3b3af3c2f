package graft

import graft.functions.{HashOps, TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Round-20 optimization gate for the native [[graft.functions.Md5Prefix60]]
  * expression: the whole optimization is legal ONLY because the value is
  * bit-identical to the pre-round-20 Column chain
  * `conv(substring(md5(c),1,15),16,10)::long` — which is also the exact
  * shape every DuckDB oracle computes (`('0x'||substr(md5(x),1,15))::BIGINT`).
  * Pins expression ≡ old chain ≡ JVM kernel on adversarial inputs, plus
  * null flow and codegen/interpreted agreement. */
class HashSpec extends SparkSuite {

  private val inputs = Seq(
    "", "a", "the quick brown fox", "a b", "shard:123",
    "0", "-1", " ", "  double  spaces  ", "\n\t",
    "ünïcödé tökens ß", "汉字 漢字", "🎉 emoji",
    "x" * 10000, // long input: multi-block md5
    (0 until 64).map(i => s"w$i").mkString(" "))

  test("Md5Prefix60 expression == pre-r20 conv(substring(md5)) chain == JVM kernel") {
    import spark.implicits._
    val df = inputs.toDF("s")
    val rows = df.select(
        TF.hash60(col("s")).as("nu"),
        TF.hash60Chain(col("s")).as("old"))
      .collect()
    rows.zip(inputs).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch vs old chain on '$s'")
      assert(r.getLong(0) == HashOps.md5Prefix60(s.getBytes("UTF-8")),
        s"mismatch vs JVM kernel on '$s'")
      assert(r.getLong(0) >= 0L, "60-bit value is always non-negative")
    }
  }

  test("Md5Prefix60 null flow matches the old chain (null in, null out)") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
    val out = df.select(TF.hash60(col("s")).as("nu"), TF.hash60Chain(col("s")).as("old"))
      .collect()
    assert(out.count(_.isNullAt(0)) == 1)
    out.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1)))
  }

  test("interpreted eval agrees with codegen (noop-projected) path") {
    // a filter forces the expression into a codegen'd stage; the direct
    // eval through the JVM kernel is the interpreted twin
    import spark.implicits._
    val n = inputs.toDF("s").where(TF.hash60(col("s")) >= 0L).count()
    assert(n == inputs.size.toLong)
  }

  test("Expression.eval (interpreted path) pinned directly on literals") {
    // round-20 advisor: nullSafeEval is also what constant folding runs on
    // literal args — pin it without any codegen stage in between
    import org.apache.spark.sql.catalyst.expressions.Literal
    inputs.foreach { s =>
      val bytes = s.getBytes("UTF-8")
      val v = graft.functions.Md5Prefix60(Literal(bytes)).eval()
      assert(v == HashOps.md5Prefix60(bytes), s"interpreted eval diverges on '$s'")
    }
    assert(graft.functions.Md5Prefix60(
      Literal.create(null, org.apache.spark.sql.types.BinaryType)).eval() == null,
      "interpreted eval: null in, null out")
  }

  test("numeric input fails analysis (implicit-cast gate, round-20 advisor)") {
    // the old chain's md5() only implicitly accepted strings; the native
    // expression must not widen that to integral types (big-endian bytes
    // would silently diverge from the oracle's decimal-string md5)
    import spark.implicits._
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(TF.hash60(col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("md5_prefix60") ||
      err.getMessage.toLowerCase.contains("binary"), err.getMessage)
  }
}
