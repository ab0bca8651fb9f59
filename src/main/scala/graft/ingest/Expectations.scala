package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Row-level data expectations with dead-letter routing — the
  * validation gate in front of a bronze sink. The reference ingests
  * whatever the listing returns (`sharepoint_to_bronze_delta.py:163-176`
  * has no row validation at all); production pipelines name their
  * invariants, let CLEAN rows through, and QUARANTINE violators with
  * the reason attached — silently dropping them destroys audit
  * trails, and failing the whole batch on one bad row destroys
  * throughput.
  *
  * Mechanics: each expectation is a named boolean Column; a row's
  * `_violations` is the array of names whose predicate did NOT hold
  * (NULL counts as a violation — an unevaluable invariant is not a
  * passed invariant). Evaluation is one per-row projection; no
  * shuffle, no UDF.
  *
  * Scale: [[route]] returns two lazy DataFrames over the same tagged
  * plan — fine when the caller materializes once. [[writeRouted]] is
  * the 100 TB shape: ONE pass over the input writing
  * `partitionBy(_quarantined)`, so clean and dead-letter rows land in
  * separate directories of the same job — the input is never read
  * twice.
  */
object Expectations {

  /** `(clean, quarantined)` — quarantined rows carry `_violations`
    * (array of failed expectation names). */
  def route(df: DataFrame,
      checks: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val tagged = tag(df, checks)
    (tagged.filter(size(col("_violations")) === 0).drop("_violations"),
      tagged.filter(size(col("_violations")) > 0))
  }

  /** Single-pass routed write: clean rows under
    * `<dest>/_quarantined=false/`, violators (with `_violations`)
    * under `<dest>/_quarantined=true/`. Returns (nClean, nQuarantined)
    * from the written files' footers. */
  def writeRouted(df: DataFrame, checks: Seq[(String, Column)],
      dest: String): (Long, Long) = {
    tag(df, checks)
      .withColumn("_quarantined", size(col("_violations")) > 0)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("_quarantined")
      .parquet(dest)
    val spark = df.sparkSession
    // partition values read back as strings (no boolean inference)
    val q = spark.read.parquet(dest)
      .withColumn("_quarantined", col("_quarantined").cast("string"))
    (q.filter(col("_quarantined") === "false").count(),
      q.filter(col("_quarantined") === "true").count())
  }

  private def tag(df: DataFrame,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation required")
    val viol = array_compact(array(checks.map { case (name, pred) =>
      when(not(coalesce(pred, lit(false))), lit(name))
    }: _*))
    df.withColumn("_violations", viol)
  }
}
