package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the distinct md5'd word n-grams of a text —
  * the gram builder behind the decontamination operators: lowercase, tokenize
  * on `[a-z0-9]+` runs, md5 each n-token window joined with single spaces,
  * distinct preserving first occurrence.
  *
  * Semantically identical to the HOF formulation it replaces
  * (`regexp_extract_all` → `transform(sequence(...))` → `array_distinct` in
  * [[graft.ops.Curation]], kept there as the executable spec) and to the
  * DuckDB oracle — but evaluated as ONE JVM loop per row: no token array
  * materialization through the expression interpreter, no per-gram lambda
  * dispatch. Same (b)-tier rationale as [[MinhashSigExpr]]: the per-element
  * interpretation overhead of `ArrayTransform` dominated q75/q83's profile,
  * not the hashing itself.
  *
  * Null/edge contract matches the HOF guard exactly at the column level (see
  * [[WordGramsExpr.apply]]): null text and fewer-than-n tokens both yield an
  * EMPTY array, never null, never fabricated grams.
  */
case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordGramsExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGramsExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

object WordGramsExpr {

  /** Column-level entry, null-coalesced to the HOF guard's empty array so the
    * two formulations are drop-in interchangeable.
    */
  def apply(text: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.{array, coalesce, lit}
    coalesce(
      ColumnBridge.column(WordGramsExpr(ColumnBridge.expression(text), n)),
      array().cast("array<string>").as(s"word_grams_$n"))
  }

  private val digests =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Called from both interpreted eval and generated code (static forwarder).
    * Lowercasing goes through `UTF8String.toLowerCase` — the SAME
    * implementation `lower()` uses — so tokenization sees byte-identical
    * input to the HOF/oracle formulations.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    // tokenize: runs of [a-z0-9] over the lowercased string, as (start, end)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val st = i
        while (i < s.length && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        starts.add(st); ends.add(i)
      } else i += 1
    }
    val nToks = starts.size()
    if (nToks < n) return new GenericArrayData(Array.empty[Any])
    val md = digests.get()
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var g = 0
    while (g <= nToks - n) {
      sb.setLength(0)
      var t = g
      while (t < g + n) {
        if (t > g) sb.append(' ')
        sb.append(s, starts.get(t), ends.get(t))
        t += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = HexChars((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = HexChars(d(b) & 0xf)
        b += 1
      }
      seen.add(new String(hex))
      g += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
