package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the MinHash signature of a (normalized) text:
  * 4-gram character shingles → md5 per shingle → first 4 bytes as an unsigned
  * 32-bit value → 16 affine mixes (A(i)·v + B(i)) mod P, minimum per function.
  *
  * Semantically identical to the HOF formulation it replaces
  * (`sequence`/`transform`/`array_min` in [[graft.ops.Dedup]], kept there as
  * [[graft.ops.Dedup.minhashSignaturesHof]] for the equivalence spec) and to
  * the DuckDB oracle — but evaluated as ONE tight JVM loop per row instead of
  * thousands of interpreted per-element lambda calls: no gram array, no hash
  * array, no 16 array traversals. This is the (b) tier of the extension
  * ladder — a codegen-able scalar `Expression` — used because the per-element
  * interpretation overhead of the HOF tier dominated the profile (~16s of a
  * 17s query at sf0.1), not because the semantics are inexpressible.
  */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    MinhashSigExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSigExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {

  val Q = 4
  import graft.ops.Dedup.{hashA, hashB, HashP, MinhashFuncs}

  /** Column-level entry: `minhashSig(normalizedText)` → array<long>(16). */
  def apply(text: Column): Column = ColumnBridge.column(MinhashSigExpr(ColumnBridge.expression(text)))

  private val digests = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** Called from both interpreted eval and generated code (static forwarder). */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    // code-point offsets: grams are CHARACTER q-grams (Spark substr / DuckDB
    // substr both count code points, and zh documents are multi-byte)
    val nCp = s.codePointCount(0, s.length)
    val mins = Array.fill(MinhashFuncs)(Long.MaxValue)
    if (nCp >= Q) {
      val offsets = new Array[Int](nCp + 1)
      var o = 0
      var cp = 0
      while (cp < nCp) { offsets(cp) = o; o = s.offsetByCodePoints(o, 1); cp += 1 }
      offsets(nCp) = s.length
      val md = digests.get()
      var i = 0
      while (i <= nCp - Q) {
        // duplicates don't change a minimum, so no distinct set is needed
        val gram = s.substring(offsets(i), offsets(i + Q))
        md.reset()
        val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var k = 0
        while (k < MinhashFuncs) {
          val v = (hashA(k) * h + hashB(k)) % HashP
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
    }
    val out = new Array[Any](MinhashFuncs)
    var k = 0
    while (k < MinhashFuncs) {
      out(k) = if (mins(k) == Long.MaxValue) null else java.lang.Long.valueOf(mins(k))
      k += 1
    }
    new GenericArrayData(out)
  }
}
