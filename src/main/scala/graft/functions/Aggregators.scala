package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregations (SURVEY §2.9: the reference has no UDAF
  * surface; this is the engine's public extension point for
  * aggregation logic the built-ins lack — `Aggregator[IN, BUF, OUT]`
  * gets partial aggregation (map-side combine) for free via
  * reduce/merge, exactly like a built-in).
  */
object Aggregators {

  /** Exact sum of squares: accumulates in decimal(scale 10) — the same
    * quantization as the `dsum` helper — so the result is
    * order-independent and bitwise-reproducible against the DuckDB
    * decimal-sum oracle. */
  object DecimalSumSq extends Aggregator[Double, JBigDecimal, Double] {
    private val Scale = 10
    override def zero: JBigDecimal =
      JBigDecimal.ZERO.setScale(Scale)
    override def reduce(buf: JBigDecimal, x: Double): JBigDecimal =
      // BigDecimal.valueOf mirrors Spark's double→decimal cast (via the
      // canonical string), keeping parity with `CAST(x AS DECIMAL)`
      buf.add(JBigDecimal.valueOf(x * x).setScale(Scale, RoundingMode.HALF_UP))
    override def merge(a: JBigDecimal, b: JBigDecimal): JBigDecimal = a.add(b)
    override def finish(buf: JBigDecimal): Double = buf.doubleValue
    override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
