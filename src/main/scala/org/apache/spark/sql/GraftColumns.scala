package org.apache.spark.sql

import graft.functions.DotPacked
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sql-package bridge graft needs: wrapping its native Catalyst
  * expressions into public `Column`s (Spark 4 moved the Expression→Column
  * constructor behind `private[sql]`; this is the supported pattern for
  * libraries shipping custom expressions without a session extension). */
object GraftColumns {

  /** [[graft.functions.DotPacked]] over two byte-packed vectors. */
  def dotPacked(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotPacked(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
