package graft.functions

import java.math.{BigInteger, RoundingMode, BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, BinaryExpression, BitwiseXor, EqualTo, EvalMode, Expression, If, IsNull, LessThan, Literal, NumericEvalContext, ShiftRight, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Long-TICK decimal arithmetic for the `davg`/`dsum` numeric contract
  * (ops/package.scala): exact order-independent decimal accumulation
  * with ONE correctly-rounded double out, the discipline every oracle-
  * compared aggregate follows.
  *
  * The declarative form — `sum(col.cast(DecimalType(28,10)))` — is
  * exact but expensive per row: the double→decimal cast builds a
  * BigDecimal from the canonical `Double.toString` and every Sum step
  * is a BigDecimal add under an overflow check (the unscaled group
  * total exceeds the compact-long range almost immediately, so the
  * fast long-backed Decimal path never engages). `VecDavg`
  * ([[Aggregators]]) already replaced this with a primitive long TICK
  * buffer (1 tick = 10⁻¹⁰) for vector means — the k-means training
  * bottleneck fix. This is the same lesson at dimension 1, but
  * restructured so the aggregation itself needs NO custom aggregate at
  * all: a scalar codegen expression quantizes each double to its tick
  * count ([[DecimalTicks]] → LongType), the builtin codegen'd
  * `sum(long)` accumulates (declarative → whole-stage codegen, map-side
  * partials, plain HashAggregate — no ObjectHashAggregate sort-based
  * fallback a udaf would risk at many groups), and a second scalar
  * expression ([[TicksToDouble]]) performs the single correctly-rounded
  * ticks→double conversion per GROUP.
  *
  * Numeric contract (bit-identity with `sum(cast(x as decimal(28,10)))
  * .cast(double)`, pinned by ExprEquivSpec):
  *   - quantize: `BigDecimal.valueOf(x).setScale(10, HALF_UP)` is
  *     Spark's own double→decimal value path (canonical shortest-string
  *     significand, then HALF_UP at scale 10) — identical to the Cast,
  *     and identical to what VecDavg pins per element.
  *   - accumulate: integer tick addition ≡ decimal addition at a common
  *     scale. Order-independent, exact.
  *   - out: `new BigDecimal(BigInteger.valueOf(ticks), 10).doubleValue`
  *     is the one correctly-rounded conversion `cast(decimal as double)`
  *     performs.
  *
  * OVERFLOW BOUND (the price of the primitive accumulator): the group
  * tick total must satisfy |Σ ticks| < 2⁶³, i.e. Σ|x| < 9.2 × 10⁸ per
  * group. Callers use [[graft.ops.davgT]]/[[graft.ops.dsumT]] ONLY
  * where that bound holds by construction at any corpus size —
  * probabilities, ratios, [0,1] quality scores with per-group row
  * counts bounded by a document's length or a bounded key domain.
  * Unbounded-magnitude money/quantity sums (q01-style) keep the
  * decimal-sum form, whose 38-digit buffer cannot overflow in practice.
  */
object TickExprs {

  private val Scale = 10
  private val Pow10 = Array.tabulate(11)(i => math.pow(10, i).toLong)

  /** Shared by interpreted eval and generated code.
    *
    * Fast path: when `x` round-trips exactly through an integer count
    * of 10⁻ˢ for s ∈ {0, 2} (integer-valued doubles; 2-decimal money),
    * the tick count is that integer × 10^(10−s) with NO string or
    * BigDecimal work. Proof of agreement with the canonical path, for
    * |x| < 2⁵² × 10⁻²: `k·10⁻ˢ` is an exact decimal representation
    * that rounds to `x`; `Double.toString(x)` returns the shortest
    * decimal identifying `x`, and within the half-ulp window around
    * `x` (ulp < 10⁻² here) at most one multiple of 10⁻ˢ exists — so
    * the canonical string's value and `k·10⁻ˢ` coincide, and both are
    * already exact at scale 10 (no rounding). Values that fail the
    * round-trip fall back to the canonical BigDecimal quantization.
    */
  def ticks(x: Double): Long = {
    // integer-valued doubles: ticks = x * 10^10 directly
    val k0 = Math.rint(x)
    if (k0 == x && Math.abs(k0) < 9.2e8)
      return k0.toLong * Pow10(Scale)
    // 2-decimal values (money): ticks = (x*100) * 10^8
    val k2 = Math.rint(x * 100.0)
    if (Math.abs(k2) < 9.0e10 && k2 / 100.0 == x)
      return k2.toLong * Pow10(Scale - 2)
    JBigDecimal.valueOf(x)
      .setScale(Scale, RoundingMode.HALF_UP)
      .unscaledValue()
      .longValueExact()
  }

  def ticksToDouble(t: Long): Double =
    new JBigDecimal(BigInteger.valueOf(t), Scale).doubleValue

  /** `double → long` tick quantization at scale 10 (≡ the unscaled
    * value of `cast(x as decimal(28,10))`). Null-safe; NaN/±Inf raise
    * (callers aggregate finite ratios — a NaN reaching a davg sum is a
    * bug upstream, and the decimal cast would have nulled it silently).
    */
  case class DecimalTicks(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"decimal_ticks expects a double input, got ${child.dataType.sql}")
    override def dataType: DataType = LongType
    override def prettyName: String = "decimal_ticks"

    override protected def nullSafeEval(a: Any): Any =
      ticks(a.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TickExprs$$.MODULE$$.ticks($a);
      """)

    override protected def withNewChildInternal(c: Expression): DecimalTicks =
      copy(child = c)
  }

  /** The single correctly-rounded `decimal(·,10) → double` conversion,
    * applied to a group's summed tick count. */
  case class TicksToDouble(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"ticks_to_double expects a long input, got ${child.dataType.sql}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "ticks_to_double"

    override protected def nullSafeEval(a: Any): Any =
      ticksToDouble(a.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.TickExprs$$.MODULE$$.ticksToDouble($a);
      """)

    override protected def withNewChildInternal(c: Expression): TicksToDouble =
      copy(child = c)
  }

  def decimalTicks(c: Column): Column =
    GraftSqlBridge.column(DecimalTicks(GraftSqlBridge.expression(c)))

  def ticksToDouble(c: Column): Column =
    GraftSqlBridge.column(TicksToDouble(GraftSqlBridge.expression(c)))

  /** The one correctly-rounded conversion of a 128-bit tick total
    * `(hi:lo)` (two's-complement, lo unsigned) to double — the
    * [[Sum128Ticks]] finalizer, evaluated once per group. */
  def ticks128ToDouble(hi: Long, lo: Long): Double = {
    val bi = BigInteger.valueOf(hi).shiftLeft(64)
      .add(if (lo >= 0) BigInteger.valueOf(lo)
           else BigInteger.valueOf(lo).add(TwoPow64))
    new JBigDecimal(bi, Scale).doubleValue
  }
  private val TwoPow64 = BigInteger.ONE.shiftLeft(64)

  case class Ticks128ToDouble(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "ticks128_to_double expects (long, long)")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "ticks128_to_double"

    override protected def nullSafeEval(hi: Any, lo: Any): Any =
      ticks128ToDouble(hi.asInstanceOf[Long], lo.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (hi, lo) => s"""
        ${ev.value} = graft.functions.TickExprs$$.MODULE$$.ticks128ToDouble($hi, $lo);
      """)

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Ticks128ToDouble = copy(left = l, right = r)
  }

  /** Exact order-independent decimal SUM as a 128-bit TICK accumulator —
    * the unbounded-magnitude companion to the single-long tick path.
    *
    * Same numeric contract as `sum(cast(x as decimal(28,10)))
    * .cast(double)`: [[DecimalTicks]] quantizes each double exactly as
    * the decimal cast would, and integer tick addition at a common
    * scale IS decimal addition. The accumulator is two long buffer
    * slots forming a 128-bit two's-complement integer (`hi:lo`, lo
    * unsigned): per row one wrapping 64-bit add plus the unsigned-
    * overflow carry test `s <\u1d64 a` — all plain
    * integer catalyst nodes, so the aggregate stays DECLARATIVE:
    * whole-stage codegen, fixed-width UnsafeRow buffer, map-side
    * partials, no object-hash fallback. Capacity |Σ ticks| < 2¹²⁷ ⇒
    * Σ|x| < 1.7 × 10²⁸ per group — no realistic corpus reaches it
    * (a 100 TB money sum is ~10¹⁶), unlike the single-long path's
    * 9.2 × 10⁸ bound. The wrapping adds are built with
    * `EvalMode.LEGACY` explicitly: lo-word overflow is the carry
    * mechanism, not an error, regardless of the session's ANSI mode.
    *
    * Buffer slot 3 counts non-null inputs so an empty/all-null group
    * evaluates to null exactly like builtin Sum over decimals.
    */
  case class Sum128Ticks(child: Expression)
      extends DeclarativeAggregate with UnaryLike[Expression] {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"sum128_ticks expects a double input, got ${child.dataType.sql}")
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sum128_ticks"

    private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
    private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
    private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()
    override lazy val aggBufferAttributes: Seq[AttributeReference] =
      Seq(hi, lo, cnt)

    private val legacy = NumericEvalContext(EvalMode.LEGACY, true)
    private def wadd(a: Expression, b: Expression): Expression =
      Add(a, b, legacy)
    /** carry-out of the unsigned 64-bit add with result `s` and
      * operand `a`: carry ⟺ s <ᵤ a (the standard unsigned-overflow
      * test — referencing only ONE operand and the result keeps the
      * quantized-tick subtree's occurrence count minimal; codegen CSE
      * collapses the repeats, but the interpreted fallback evaluates
      * each occurrence, so fewer is structurally better). Unsigned
      * compare = signed compare with the sign bit flipped. */
    private def carry(a: Expression, s: Expression): Expression = {
      val minBit = Literal(Long.MinValue)
      If(LessThan(BitwiseXor(s, minBit), BitwiseXor(a, minBit)),
        Literal(1L), Literal(0L))
    }

    override lazy val initialValues: Seq[Expression] =
      Seq(Literal(0L), Literal(0L), Literal(0L))

    override lazy val updateExpressions: Seq[Expression] = {
      val t = DecimalTicks(child)
      val loNew = wadd(lo, t)
      val hiNew = wadd(wadd(hi, ShiftRight(t, Literal(63))),
        carry(lo, loNew))
      Seq(
        If(IsNull(child), hi, hiNew),
        If(IsNull(child), lo, loNew),
        If(IsNull(child), cnt, wadd(cnt, Literal(1L))))
    }

    override lazy val mergeExpressions: Seq[Expression] = {
      val loNew = wadd(lo.left, lo.right)
      Seq(
        wadd(wadd(hi.left, hi.right), carry(lo.left, loNew)),
        loNew,
        wadd(cnt.left, cnt.right))
    }

    override lazy val evaluateExpression: Expression =
      If(EqualTo(cnt, Literal(0L)),
        Literal(null, DoubleType),
        Ticks128ToDouble(hi, lo))

    override protected def withNewChildInternal(c: Expression): Sum128Ticks =
      copy(child = c)
  }

  /** `dsum` semantics on the 128-bit tick accumulator. */
  def sum128Ticks(c: Column): Column =
    GraftSqlBridge.column(
      Sum128Ticks(GraftSqlBridge.expression(c)).toAggregateExpression())
}
