package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-probe expressions: the scale path where an exact broadcast
  * set no longer fits. A bloom filter of N keys at 1% fpp is ~1.2 B/key
  * regardless of key size — a 10-billion-shingle benchmark set probes
  * from ~12 GB of bits where the exact distinct-key set would be
  * hundreds of GB. The filter is built DISTRIBUTED (Spark's
  * `DataFrameStatFunctions.bloomFilter` merges per-partition sketches)
  * and rides to executors as a codegen reference object; the probe is
  * a per-row bit test, no join at all.
  */
object SketchExprs {

  /** might-contain probe of a pre-built [[BloomFilter]] on a long key.
    * One-sided error: false positives only (rate = the filter's fpp),
    * never false negatives — callers drop a guaranteed-clean superset
    * or route survivors to an exact verify. */
  case class BloomMightContain(child: Expression, bloom: BloomFilter)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a bigint key, got ${child.dataType.sql}")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override protected def nullSafeEval(a: Any): Any =
      bloom.mightContainLong(a.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $ref.mightContainLong($a);")
    }

    override protected def withNewChildInternal(c: Expression): BloomMightContain =
      copy(child = c)
  }

  def bloomMightContain(key: Column, bloom: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(key), bloom))
}
