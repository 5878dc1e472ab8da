package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the deterministic cosine between two
  * integer-scaled vectors: exact int64 dot product and norms, one double
  * division at the end — identical numerics to the HOF formulation
  * (`zip_with`/`aggregate`, kept as the executable spec in
  * [[graft.ops.Similarity]]) and to the DuckDB oracle, but one tight loop per
  * pair instead of ~130 interpreted lambda calls. Extension tier (b), applied
  * because candidate joins evaluate this over n·k pairs.
  *
  * Squared norms are recomputed inline (64 multiply-adds) rather than carried
  * as extra columns — at candidate-join volumes the lambda-call overhead this
  * removes dwarfs the recompute.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSimExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {

  /** Column-level entry over two scaled (array<long>) vectors. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Called from both interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      val y = b.getLong(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}
