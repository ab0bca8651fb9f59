package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass polynomial rolling hash over a string's code points —
  * the fused form of `aggregate(split(text, ''), 0L,
  * (acc, c) => (acc*B + ascii(c)) % M)` (Text t06), which allocates a
  * one-char-string array element per character. Same value for any
  * BMP text (ascii(c) = code point of the character), one traversal,
  * no allocation.
  */
object TextExprs {

  /** Shared by interpreted eval and generated code. */
  def polyHash(s: UTF8String, base: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  case class PolyHash(child: Expression, base: Long, mod: Long)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects a string input, got ${child.dataType.sql}")
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash"

    override protected def nullSafeEval(a: Any): Any =
      polyHash(a.asInstanceOf[UTF8String], base, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.polyHash(
          $a, ${base}L, ${mod}L);
      """)

    override protected def withNewChildInternal(c: Expression): PolyHash =
      copy(child = c)
  }

  def polyHash(c: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    GraftSqlBridge.column(PolyHash(GraftSqlBridge.expression(c), base, mod))

  /** Shared by interpreted eval and generated code: all k permuted
    * minima of the universal hash family h_j = (a_j·h + b_j) mod p in
    * ONE traversal of the hashed-shingle array. The declarative form —
    * k × `array_min(transform(hs, h => pmod(a*h+b, p)))` — walks the
    * array k times and allocates k intermediate arrays per row; this
    * is the fused loop (k·n multiply-accumulates, zero allocation
    * beyond the output signature).
    *
    * Overflow contract (ANSI-safe): h is masked to 32 bits and
    * a < 2^31, so a·h + b < 2^63 — no wraparound, and `%` on
    * non-negative operands equals `pmod`.
    */
  def minHashSig(hs: ArrayData, a: Array[Long], b: Array[Long],
      p: Long): ArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Fused MinHash signature over an `array<long>` of shingle hashes:
    * returns `array<long>` of `a.length` permuted minima (empty input
    * yields Long.MaxValue sentinels — t09 filters empty shingle sets
    * upstream). `a`/`b` are Seq (not Array) so the expression keeps
    * value equality for `semanticEquals`/canonicalization.
    */
  case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long],
      mod: Long) extends UnaryExpression {
    require(a.length == b.length,
      s"minhash_sig: |a|=${a.length} must equal |b|=${b.length}")

    private lazy val aArr = a.toArray
    private lazy val bArr = b.toArray

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case dt => TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint> input, got ${dt.sql}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override protected def nullSafeEval(x: Any): Any =
      minHashSig(x.asInstanceOf[ArrayData], aArr, bArr, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      nullSafeCodeGen(ctx, ev, x => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.minHashSig(
          $x, $aRef, $bRef, ${mod}L);
      """)
    }

    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
  }

  def minHashSig(c: Column, a: Seq[Long], b: Seq[Long], mod: Long): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(c), a, b, mod))
}
