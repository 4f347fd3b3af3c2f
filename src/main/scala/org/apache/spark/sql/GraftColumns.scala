package org.apache.spark.sql

import graft.functions.{DotPacked, DtwBand, DtwBandLe}
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

  /** [[graft.functions.DtwBand]] over two array<double> series. */
  def dtwBand(a: Column, b: Column, band: Int): Column =
    ExpressionUtils.column(
      DtwBand(ExpressionUtils.expression(a), ExpressionUtils.expression(b), band))

  /** [[graft.functions.DtwBandLe]]: exact `dtw(a, b) <= eps` with
    * early-abandoning — the threshold consumers' fast path. */
  def dtwBandLe(a: Column, b: Column, band: Int, eps: Double): Column =
    ExpressionUtils.column(
      DtwBandLe(ExpressionUtils.expression(a), ExpressionUtils.expression(b), band, eps))
}

/** Live-session registration of graft's SQL functions — the companion to
  * the `spark.sql.extensions=graft.GraftExtensions` config route (that one
  * only applies at session construction; this one retrofits a running
  * session via its function registry — in the sql package because
  * `sessionState` is `private[sql]` in Spark 4). */
object GraftSql {
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
