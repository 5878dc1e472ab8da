package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the DISTINCT fingerprints of every
  * stride-1 `window`-codepoint substring of a text — the window pass of
  * exact-substring dedup (q252, the Lee et al. 2022 shape,
  * `/root/reference` has no dedup tier; public arXiv 2107.06499).
  *
  * The md5 spelling this replaces (explode positions → substr → md5, kept in
  * [[graft.ops.Dedup.substringWindowsMd5]] as the executable spec and still
  * the oracle's fingerprint) hashes a fresh `window`-char substring at every
  * position: Σ(len−w+1)·w byte-digest work per document — ~w× redundant
  * re-hashing of bytes already seen (each codepoint is digested w times over
  * its w covering windows). A POLYNOMIAL
  * ROLLING hash computes all windows in ONE codepoint pass: two independent
  * 31-bit channels h = Σ c_j·B^(w−1−j) mod P over the window's codepoints,
  * each advanced in O(1) per position (subtract the leaving codepoint's
  * B^(w−1) term, multiply by B, add the entering codepoint), packed into one
  * 62-bit value h1·P2 + h2.
  *
  * Determinism and the oracle contract: the fingerprint is ENGINE-INTERNAL.
  * The oracle gates on the pair/count OUTPUT, which is identical under ANY
  * injective-in-practice fingerprint — both the 64-bit md5 prefix and this
  * 62-bit double channel are collision-free at realistic window populations
  * (≈ n²/2⁶² birthday bound), and a collision would have to occur to CHANGE
  * a distinct-count. Overflow audit: all values < 2³¹, B < 2⁸, so every
  * intermediate product stays below 2³⁹ (rolling step) / 2⁵² (leaving-term
  * product) — exact in int64, no Math.multiplyHigh needed.
  *
  * Null text → null (callers coalesce or drop, as with [[MinhashSigExpr]]);
  * texts shorter than `window` codepoints → EMPTY array, matching the
  * oracle's empty generate_series.
  */
case class RollingWindowFpExpr(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RollingWindowFpExpr.compute(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingWindowFpExpr.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingWindowFpExpr =
    copy(child = newChild)
}

object RollingWindowFpExpr {

  /** Column-level entry: distinct rolling fingerprints of every
    * `window`-codepoint substring, as one array<long> per row.
    */
  def apply(text: Column, window: Int): Column =
    ColumnBridge.column(RollingWindowFpExpr(ColumnBridge.expression(text), window))

  // two independent (base, prime) channels; both primes ~2^31 so each
  // channel's state fits comfortably in int64 arithmetic
  private val B1 = 131L
  private val P1 = 2147483647L // 2^31 − 1
  private val B2 = 137L
  private val P2 = 2147483629L

  private def powMod(b: Long, e: Int, p: Long): Long = {
    var r = 1L
    var i = 0
    while (i < e) { r = (r * b) % p; i += 1 }
    r
  }

  /** Called from both interpreted eval and generated code (static forwarder). */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val s = text.toString
    val nCp = s.codePointCount(0, s.length)
    if (nCp < w) return new GenericArrayData(Array.empty[Long])
    // codepoint values in one pass (windows are CHARACTER windows — Spark
    // substr and DuckDB substr both count codepoints, and zh text is
    // multi-byte; the same layout note as MinhashSigExpr)
    val cps = new Array[Long](nCp)
    var o = 0
    var i = 0
    while (i < nCp) {
      val cp = s.codePointAt(o)
      cps(i) = cp.toLong
      o += Character.charCount(cp)
      i += 1
    }
    val pw1 = powMod(B1, w - 1, P1)
    val pw2 = powMod(B2, w - 1, P2)
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < w) {
      h1 = (h1 * B1 + cps(i)) % P1
      h2 = (h2 * B2 + cps(i)) % P2
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    seen.add(h1 * P2 + h2)
    i = w
    while (i < nCp) {
      // remove the leaving codepoint's top term, shift, add the entrant;
      // (+ cps·P) keeps the subtraction non-negative before the mod
      h1 = ((h1 + P1 - (cps(i - w) * pw1) % P1) * B1 + cps(i)) % P1
      h2 = ((h2 + P2 - (cps(i - w) * pw2) % P2) * B2 + cps(i)) % P2
      seen.add(h1 * P2 + h2)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
