package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column ⇄ Catalyst Expression
 * conversion (Spark 4.x split the public Column from its classic
 * Expression backing; extension libraries reach it via a package shim).
 */
object ColumnBridge {
  /** Fully-converted Catalyst expression (ExpressionUtils alone returns a
   * lazy childless ColumnNodeExpression wrapper — useless for traversal). */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
  /** The output name Spark would assign (alias, attribute name, or the
   * generated pretty name for anonymous expressions). */
  def outputName(c: Column): String = {
    val e = expression(c)
    ExpressionUtils.toNamed(e) match {
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAlias =>
        // .name on an UnresolvedAlias throws; derive the pretty name the
        // analyzer would generate
        try ExpressionUtils.generateAlias(ua.child)
        catch { case _: Throwable => ua.child.toString }
      case ne => ne.name
    }
  }
}
