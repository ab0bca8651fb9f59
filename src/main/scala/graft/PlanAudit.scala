package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: list every registered query whose PHYSICAL plan
  * contains an `Exchange SinglePartition` (global windows/sorts/
  * single-row aggregates all compile to one). Each hit must be over a
  * BOUNDED relation (day spines, bucket spines, model tables, 1-row
  * totals) — a hit on a corpus-sized relation is a scale bug. Run:
  * `sbt "runMain graft.PlanAudit /root/testdata/sf0.001"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-plan-audit")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      SparkEntry.allSpecs.foreach { q =>
        try {
          val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
          val hits = "Exchange SinglePartition".r.findAllIn(plan).size
          if (hits > 0) println(f"$hits%2d  ${q.name}")
        } catch {
          case e: Exception =>
            println(s" !  ${q.name}: plan failed (${e.getMessage.take(80)})")
        } finally graft.Scoped.release()
      }
    } finally spark.stop()
  }
}
