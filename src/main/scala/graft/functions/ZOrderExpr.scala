package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native z-order (Morton) curve key: interleaves the low 16 bits of two
  * non-negative codes — x in the even bit positions, y in the odd — into one
  * 32-bit locality key. Sorting (or range-partitioning) a table by this key
  * clusters rows that are close in BOTH dimensions into the same files and
  * row groups, so min/max file statistics prune scans for predicates on
  * EITHER column — the standard multi-dimensional layout technique for
  * 100 TB tables where one `partitionBy` column can't serve every query.
  *
  * Codegen'd (one call per row, no allocation). Inputs are masked to 16 bits
  * — callers bucket raw values first ([[graft.ops.Relational.zOrderedParts]]
  * shows the shape). The bit-spread is the classic mask-shift sequence
  * (public domain "Interleave bits by Binary Magic Numbers",
  * graphics.stanford.edu/~seander/bithacks.html).
  */
case class ZOrderExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  // analysis-time contract: without it an IntegerType input passes analysis
  // but ClassCastExceptions in interpreted eval while codegen silently widens
  // — the two execution paths must agree, so misuse fails at analysis instead.
  // (ExpectsInputTypes.inputTypes would say the same thing, but its
  // AbstractDataType signature is private[sql] in Spark 4.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order expects (bigint, bigint), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderExpr.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderExpr.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_order"
}

object ZOrderExpr {

  /** Column-level entry: `zOrder(x, y)` → 32-bit Morton key (long). */
  def apply(x: Column, y: Column): Column =
    ColumnBridge.column(
      ZOrderExpr(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Spread the low 16 bits of v to the even positions of a 32-bit word. */
  private def spread(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Called from both interpreted eval and generated code. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
