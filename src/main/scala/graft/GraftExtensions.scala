package graft

import graft.functions.DotPacked
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
      }))
}
