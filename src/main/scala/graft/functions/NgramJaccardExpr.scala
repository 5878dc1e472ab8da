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
/** Native distinct q-gram COUNT of one (normalized) text — the unary sibling
  * of [[NgramJaccardExpr]], sharing its packed-long gram machinery. Replaces
  * `size(array_distinct(transform(sequence(...), substr)))`, whose
  * interpreted per-position lambdas measured ~250 µs/doc at sf0.1 (the
  * ProfileQ230 split: 12.4 s of q230's 14 s was the two doc-side `ng`
  * projections) — this is one codepoint scan + one primitive sort per doc.
  */
case class NgramCountExpr(child: Expression, q: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    NgramJaccardExpr.countDistinct(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramJaccardExpr.countDistinct($c, $q)")

  override protected def withNewChildInternal(newChild: Expression): NgramCountExpr =
    copy(child = newChild)
}

object NgramCountExpr {
  def apply(c: Column, q: Int): Column =
    ColumnBridge.column(NgramCountExpr(ColumnBridge.expression(c), q))
}

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

  /** Distinct q-grams as a sorted array of PACKED longs — exact for q ≤ 3:
    * a Unicode codepoint is ≤ 0x10FFFF (21 bits), so three consecutive
    * codepoints pack bijectively into 63 bits. No hashing, no collisions, no
    * per-gram allocation: one codepoint scan, one primitive sort, an in-place
    * dedup. This is what took the q230 scoring stage from ~95 µs/pair
    * (two HashSet<String> builds per pair — substring allocation + string
    * hashing dominated, measured via the ProfileQ230 three-point split) to
    * the ~µs class: the stage was 12.4 s of the query's 15.6 s at sf0.1.
    */
  private def packedGrams(s: String, q: Int): Array[Long] = {
    val len = s.length
    val nCp = s.codePointCount(0, len)
    val n = nCp - q + 1
    if (n <= 0) return Array.emptyLongArray
    val cps = new Array[Int](nCp)
    var i = 0
    var o = 0
    while (i < nCp) {
      val cp = s.codePointAt(o)
      cps(i) = cp
      o += Character.charCount(cp)
      i += 1
    }
    val out = new Array[Long](n)
    var j = 0
    while (j < n) {
      var v = 0L
      var k = 0
      while (k < q) { v = (v << 21) | cps(j + k).toLong; k += 1 }
      out(j) = v
      j += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == n) out else java.util.Arrays.copyOf(out, w)
  }

  /** Distinct q-gram count (the unary [[NgramCountExpr]] entry). */
  def countDistinct(a: UTF8String, q: Int): Long =
    if (q <= 3) packedGrams(a.toString, q).length.toLong
    else gramSet(a.toString, q).size.toLong

  /** Called from both interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String, q: Int): InternalRow =
    if (q <= 3) {
      val ga = packedGrams(a.toString, q)
      val gb = packedGrams(b.toString, q)
      var i = 0
      var j = 0
      var inter = 0L
      while (i < ga.length && j < gb.length) {
        if (ga(i) < gb(j)) i += 1
        else if (ga(i) > gb(j)) j += 1
        else { inter += 1; i += 1; j += 1 }
      }
      val uni = ga.length.toLong + gb.length - inter
      // 0/0 → NaN, matching the built-in double division on two empty gram sets
      InternalRow(inter, inter.toDouble / uni)
    } else {
      // q > 3 may not pack into 63 bits; keep the exact string-set path
      val sa = gramSet(a.toString, q)
      val sb = gramSet(b.toString, q)
      val (small, large) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
      var inter = 0L
      val it = small.iterator()
      while (it.hasNext) if (large.contains(it.next())) inter += 1
      val uni = sa.size.toLong + sb.size.toLong - inter
      InternalRow(inter, inter.toDouble / uni)
    }
}
