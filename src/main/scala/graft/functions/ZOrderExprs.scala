package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (z-order) interleaving — the multi-dimensional clustering
  * key behind Delta's `OPTIMIZE ... ZORDER BY`. Sorting by the
  * interleaved bits of (a, b) lays rows out along a space-filling
  * curve, so a contiguous run of rows (= one file) covers a compact
  * TILE in (a, b) space instead of a full-width stripe. Per-file
  * min/max stats ([[graft.ingest.DataSkipping]]) then prune on BOTH
  * columns: a linear sort gives selective stats only on its leading
  * column; z-order gives ~sqrt-selective stats on each of the two.
  * (Classic reference: Morton 1966; the Delta/Iceberg docs describe
  * the same layout publicly.)
  */
object ZOrderCodec {

  /** Spread the low 32 bits of x so bit i lands at position 2i —
    * the standard mask-and-shift ladder (public-domain bit trick,
    * "Interleave bits by Binary Magic Numbers", Stanford bithacks). */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave two signed ints into one long whose PLAIN signed
    * order is the z-curve order. Two normalizations make `ORDER BY`
    * just work: the sign-bit XOR maps signed order onto unsigned
    * order (Int.MinValue → 0, so negatives sort before positives),
    * and `>>> 1` keeps 31 bits per coordinate so the interleaved
    * result stays below 2^62 — never negative, no unsigned-compare
    * caveat. Dropping each coordinate's lowest bit merges adjacent
    * value pairs onto one curve point, which is irrelevant at
    * file-granularity clustering. a takes even bits, b odd. */
  def morton(a: Int, b: Int): Long = {
    val ua = ((a ^ Int.MinValue).toLong & 0xffffffffL) >>> 1
    val ub = ((b ^ Int.MinValue).toLong & 0xffffffffL) >>> 1
    spread(ua) | (spread(ub) << 1)
  }
}

object ZOrderExprs {

  /** `zvalue(a, b)`: codegen'd Morton key of two int columns. Null if
    * either input is null (BinaryExpression default). */
  case class ZValue(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == IntegerType && right.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"zvalue expects (int, int), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    override def dataType: DataType = LongType
    override def prettyName: String = "zvalue"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      ZOrderCodec.morton(a.asInstanceOf[Int], b.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.ZOrderCodec.morton($a, $b);")

    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): ZValue = copy(left = l, right = r)
  }

  def zvalue(a: Column, b: Column): Column =
    GraftSqlBridge.column(ZValue(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
