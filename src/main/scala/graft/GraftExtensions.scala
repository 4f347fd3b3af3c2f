package graft

import graft.functions.{DotPacked, DtwBand}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point — the (c) tier of the SURVEY §2.13
  * custom-op ladder: sessions started with
  *
  * {{{ .config("spark.sql.extensions", "graft.GraftExtensions") }}}
  *
  * get graft's native Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT dot_packed(a, b) ...")` plans the same
  * whole-stage-codegen expression the Scala `GraftColumns.dotPacked`
  * column API does (one registry, two front doors). For an already-running
  * session use [[org.apache.spark.sql.GraftSql.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** (identifier, info, builder) triples in the exact shape
    * `injectFunction` and `FunctionRegistry.registerFunction` share. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("dot_packed"),
      new ExpressionInfo(classOf[DotPacked].getName, "dot_packed"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"dot_packed expects exactly 2 arguments, got ${children.size}")
        DotPacked(children.head, children(1))
      }), (
      FunctionIdentifier("dtw_band"),
      new ExpressionInfo(classOf[DtwBand].getName, "dtw_band"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"dtw_band expects (series_a, series_b, band), got ${children.size} args")
        val band = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"dtw_band: band must be an integer literal, got $other")
        }
        DtwBand(children.head, children(1), band)
      }))
}
