package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for oracle-comparable operators.
  *
  * Numeric parity strategy (SURVEY §7.4, "non-determinism vs the DuckDB
  * oracle"): per-row double arithmetic (`*`, `-`, `+`) is IEEE-754
  * deterministic and bitwise identical across engines, but SUM over
  * doubles is order-dependent. Every oracle-compared aggregate therefore
  * casts the per-row double to an exact decimal BEFORE the sum, sums in
  * decimal (exact, order-independent), and casts the total back to
  * double — both engines then produce the identical double.
  */
package object ops {

  /** Order-independent sum: decimal-exact accumulate, double out. */
  def dsum(c: Column, precision: Int = 28, scale: Int = 10): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** Matching DuckDB SQL fragment for [[dsum]]. The VARCHAR hop matters:
    * DuckDB's decimal→double cast is two-step (int128→double, then
    * ÷10^scale — two roundings) while Spark's BigDecimal conversion is
    * correctly rounded once; parsing the exact decimal string gives
    * DuckDB the same single correctly-rounded conversion.
    */
  def dsumSql(expr: String, precision: Int = 28, scale: Int = 10): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL($precision,$scale))) AS VARCHAR) AS DOUBLE)"

  /** Order-independent average: exact decimal sum / count, in double. */
  def davg(c: Column, precision: Int = 28, scale: Int = 10): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double") / count(c)

  def davgSql(expr: String, precision: Int = 28, scale: Int = 10): String =
    s"(CAST(CAST(SUM(CAST($expr AS DECIMAL($precision,$scale))) AS VARCHAR) AS DOUBLE) / COUNT($expr))"

  /** [[dsum]] on the long-TICK path ([[graft.functions.TickExprs]]):
    * bit-identical result, but the per-row work is one quantization +
    * one primitive long add inside whole-stage codegen instead of a
    * BigDecimal construct + BigDecimal add. ONLY for columns whose
    * per-group Σ|x| < 9.2 × 10⁸ by construction (probabilities,
    * ratios, [0,1] scores over length-bounded groups) — the long
    * accumulator wraps past that; unbounded-magnitude sums stay on
    * [[dsum]]'s 38-digit decimal buffer. Oracle side is unchanged
    * ([[dsumSql]] / [[davgSql]] — the contract is the same number).
    */
  def dsumT(c: Column): Column = {
    import graft.functions.TickExprs
    // the cast-to-double is exact for the int/long columns davg/dsum
    // accepted (|x| < 2^53), and a no-op for doubles
    TickExprs.ticksToDouble(sum(TickExprs.decimalTicks(c.cast("double"))))
  }

  /** [[davg]] on the long-TICK path — see [[dsumT]] for the bound. */
  def davgT(c: Column): Column = {
    import graft.functions.TickExprs
    TickExprs.ticksToDouble(
      sum(TickExprs.decimalTicks(c.cast("double")))) / count(c)
  }

  /** [[dsum]] on the 128-bit tick accumulator
    * ([[graft.functions.TickExprs.Sum128Ticks]]): bit-identical result,
    * no GROUP-TOTAL bound in practice (Σ|x| < 1.7 × 10²⁸ per group) —
    * the drop-in for unbounded money/quantity sums where [[dsumT]]'s
    * single-long accumulator would wrap. Declarative two-long carry
    * buffer: whole-stage codegen, map-side partials.
    *
    * PER-ROW bound: each VALUE's tick count must itself fit a long —
    * |x| < 9.2 × 10⁸ per row (DecimalTicks throws past it, loudly).
    * Columns with larger single values (µs gaps over ~15 min, raw
    * epoch micros) stay on [[dsum]]'s decimal cast, which has no
    * per-row limit. */
  def dsum128(c: Column): Column = {
    import graft.functions.TickExprs
    // cast-to-double: exact for int/long inputs (|x| < 2^53), no-op
    // for doubles — same acceptance as the decimal-cast path
    TickExprs.sum128Ticks(c.cast("double"))
  }

  /** [[davg]] on the 128-bit tick accumulator — see [[dsum128]]. */
  def davg128(c: Column): Column = dsum128(c) / count(c)

  /** Timestamp literal resolved in the session time zone (pinned UTC). */
  def ts(s: String): Column = to_timestamp(lit(s))
}

/** One driver-checkable operator: a Spark query plus (optionally) the
  * equivalent ANSI SQL the driver's DuckDB oracle runs over the same
  * parquet tables. `oracle == None` downgrades to a rows-only check.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def run(spark: SparkSession, dir: String): DataFrame = fn(spark, dir)
}

/** Scope-tracked persists. Query builders persist relations that
  * multiple plan branches read (shingle sets, edge lists, …); without
  * a release point those blocks accumulate in the block-manager cache
  * for the life of the session — at 100 TB that is executor memory the
  * caller never asked for. Builders register through [[persist]]; the
  * harness (Bench / Verify / tests) calls [[release]] after it has
  * materialized each query's output. Releasing after materialization
  * is safe: unpersist only drops cached blocks, a re-execution would
  * just recompute.
  */
object Scoped {
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.rdd.RDD[_]]()

  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  /** The checkpointed RDDs under `df`'s plan. `Dataset.unpersist`
    * cannot reach these — `localCheckpoint` blocks live outside the
    * CacheManager — so block release must go through the RDD handle
    * inside the plan's [[org.apache.spark.sql.execution.LogicalRDD]]
    * leaves. */
  private def checkpointRdds(df: DataFrame)
      : Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Immediately drop the `localCheckpoint` blocks under `df`. Only
    * legal once nothing will read `df` again: a locally-checkpointed
    * RDD has no lineage to recompute from, so a later action on it
    * would fail — this is a free-the-dead-generation primitive, not a
    * cache hint. */
  def dropCheckpoint(df: DataFrame): Unit =
    checkpointRdds(df).foreach(_.unpersist(blocking = false))

  /** Register `df`'s checkpoint blocks for [[release]] at end of
    * query — the per-run analogue of [[persist]] for relations whose
    * lineage was truncated (`localCheckpoint`), which `unpersist` on
    * the Dataset cannot free. After release the frame is DEAD (no
    * lineage), so only track checkpoints that do not outlive their
    * query; session-memoized checkpoints must NOT go through here. */
  def trackCheckpoint(df: DataFrame): DataFrame = {
    checkpointRdds(df).foreach(trackedRdds.add)
    df
  }

  /** Drop every tracked cache (idempotent; non-blocking eviction). */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      rdd.unpersist(blocking = false)
      rdd = trackedRdds.poll()
    }
  }
}
