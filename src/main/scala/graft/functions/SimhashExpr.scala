package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 48-bit SimHash fingerprint: lowercase,
  * tokenize on `[a-z0-9]+`, Horner-hash each token occurrence
  * (acc·131 + codepoint mod 2^48), ±1 vote per bit, bit set iff positive.
  *
  * Identical semantics to the HOF formulation (kept as
  * [[graft.ops.Dedup.simhashHof]] for the equivalence spec) and the DuckDB
  * oracle; lowercasing goes through `UTF8String.toLowerCase` — the same code
  * path as Spark's `lower()` — so no locale drift.
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimhashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {

  val Bits = 48
  val Mod48 = 281474976710656L // 2^48

  /** Column-level entry: `simhash(text)` → 48-bit long. */
  def apply(text: Column): Column = ColumnBridge.column(SimhashExpr(ColumnBridge.expression(text)))

  private val TokenRe = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val s = text.toLowerCase.toString // UTF8String.toLowerCase == Spark lower()
    val votes = new Array[Int](Bits)
    val m = TokenRe.matcher(s)
    while (m.find()) {
      var h = 0L
      var i = m.start()
      while (i < m.end()) { h = (h * 131L + s.charAt(i)) % Mod48; i += 1 }
      var b = 0
      while (b < Bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sim = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }
}
