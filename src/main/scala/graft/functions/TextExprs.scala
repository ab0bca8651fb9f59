package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
}
