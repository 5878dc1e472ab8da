package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the exact q-gram Jaccard of two (normalized)
  * texts: distinct character q-grams per side, |∩| and |∩|/|∪| in one pass.
  *
  * Semantically identical to the HOF formulation
  * (`shingles` + `array_intersect` + `size`, kept as
  * [[graft.ops.Dedup.ngramJaccardHof]] for the equivalence spec), but the
  * verify join now ships the normalized TEXT through the shuffle instead of a
  * materialized ~500-element gram array per side, and the per-pair set
  * intersection is a tight hash-set loop instead of interpreted per-element
  * lambdas. Like [[MinhashSigExpr]], this is extension tier (b): built-ins
  * express the semantics fine, they just interpret ~1000 lambda calls per pair.
  */
case class NgramJaccardExpr(left: Expression, right: Expression, q: Int)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_common", LongType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccardExpr.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NgramJaccardExpr.compute($a, $b, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramJaccardExpr =
    copy(left = newLeft, right = newRight)
}

object NgramJaccardExpr {

  /** Column-level entry over normalized texts → struct(n_common, jaccard). */
  def apply(a: Column, b: Column, q: Int): Column =
    ColumnBridge.column(NgramJaccardExpr(ColumnBridge.expression(a), ColumnBridge.expression(b), q))

  private def gramSet(s: String, q: Int): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    val nCp = s.codePointCount(0, s.length)
    if (nCp >= q) {
      val offsets = new Array[Int](nCp + 1)
      var o = 0
      var cp = 0
      while (cp < nCp) { offsets(cp) = o; o = s.offsetByCodePoints(o, 1); cp += 1 }
      offsets(nCp) = s.length
      var i = 0
      while (i <= nCp - q) { set.add(s.substring(offsets(i), offsets(i + q))); i += 1 }
    }
    set
  }

  /** Called from both interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String, q: Int): InternalRow = {
    val sa = gramSet(a.toString, q)
    val sb = gramSet(b.toString, q)
    val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0L
    val it = small.iterator()
    while (it.hasNext) if (large.contains(it.next())) inter += 1
    val uni = sa.size.toLong + sb.size.toLong - inter
    // 0/0 → NaN, matching the built-in double division on two empty gram sets
    InternalRow(inter, inter.toDouble / uni)
  }
}
