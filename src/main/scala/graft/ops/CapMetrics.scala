package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime observability for the LSH bucket ceilings
  * ([[Text]] `BandBucketCap`, [[Similarity]] `BucketCap`): when a cap
  * actually BINDS — a bucket held more members than the ceiling and
  * the exhaustive pair list thinned to member↔resident edges — that
  * fact is recorded instead of silently changing query output.
  *
  * Mechanism: a `CollectMetrics` observation on the ranked relation
  * (zero extra jobs, stays inside whole-stage codegen — the aggregate
  * rides the rows already flowing through the cap filter's input) plus
  * one per-session `QueryExecutionListener` that logs a WARN with the
  * bucket kind, the number of buckets at the ceiling, and the rows
  * dropped. Counts follow standard Spark metric semantics under task
  * retries (at-least-once), which is the right contract for an alarm.
  */
private[graft] object CapMetrics {

  private val MetricPrefix = "graft_cap_"
  private val nameCounter = new java.util.concurrent.atomic.AtomicInteger
  private val listenerMemo = new graft.SessionMemo[String, java.lang.Boolean]
  private val log = org.slf4j.LoggerFactory.getLogger("graft.ops.CapMetrics")

  /** Attach a drop-counting observation to a rank-capped relation.
    * `ranked` must still carry ALL bucket members (the cap filter is
    * applied by the CALLER, downstream of the returned frame — a
    * filter cannot push through the CollectMetrics barrier, which the
    * OpsSpec binding-cap test pins). */
  def observeCapDrops(ranked: DataFrame, rkCol: String, cap: Int,
      what: String): DataFrame = {
    ensureListener(ranked.sparkSession)
    // long arithmetic: cap = Int.MaxValue (the uncapped probe) must
    // not wrap to a matchable rank
    ranked.observe(s"$MetricPrefix${nameCounter.incrementAndGet()}",
      sum(when(col(rkCol).cast("long") === cap.toLong + 1L, 1L)
        .otherwise(0L)).as("capped_buckets"),
      sum(when(col(rkCol).cast("long") > cap.toLong, 1L).otherwise(0L))
        .as("dropped_rows"),
      max(lit(what)).as("kind"))
  }

  private def ensureListener(s: SparkSession): Unit = {
    listenerMemo.getOrCompute(s, "cap-listener") {
      s.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith(MetricPrefix) && !row.isNullAt(0) &&
                  row.getLong(0) > 0)
                log.warn(s"LSH bucket cap BOUND (${row.getString(2)}): " +
                  s"${row.getLong(0)} bucket(s) at the ceiling, " +
                  s"${row.getLong(1)} candidate row(s) thinned to " +
                  "member-resident edges")
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
      java.lang.Boolean.TRUE
    }
    ()
  }
}
