package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for bench outliers (round 3: q31/q35 —
  * verdict: machine contention; round 4 first half: q01 decimal-agg
  * decomposition — verdict: the decimal(28,10) partials ARE the cost
  * and buy oracle exactness, documented in SCALE.md; both harnesses
  * in git history).
  *
  * Current target: s05_ann_lsh, the round-4 regression (1.42 → 2.11 s
  * stable across rounds after candidate generation moved to the shared
  * `lshCandidatePairs`). Decomposition: signature computation → bucket
  * join without the global pair distinct → with the distinct → the
  * full query, plus a signature-persisted variant (the probe and build
  * sides each scan the corpus and evaluate the 96-dot fused kernel;
  * persisting the signature relation halves that).
  */
object Profile {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    materialize(df)
    val t1 = System.nanoTime()
    Scoped.release() // same cache scoping as Bench/Verify
    println(f"PROFILE $name%-28s ${(t1 - t0) / 1e9}%8.3f s")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    // warmup
    SparkEntry.entry(spark).count()

    // Decompose q53_nation_pagerank: edge build (data-sized) vs the
    // 10 iteration rounds (tiny aggregated graph, suspected pure
    // scheduling overhead at 32 shuffle partitions).
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("q53_asis") {
        SparkEntry.queries("q53_nation_pagerank")(s, d)
      }
      time("q53_edges_only") {
        val nat = Tables.nation(s, d)
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(nat.select(col("n_nationkey").as("cnk"), col("n_name").as("src")),
            col("c_nationkey") === col("cnk"))
          .join(nat.select(col("n_nationkey").as("snk"), col("n_name").as("dst")),
            col("s_nationkey") === col("snk"))
          .groupBy(col("src"), col("dst"))
          .agg(expr("count(1)").as("w"))
      }
      time("q52_asis") {
        SparkEntry.queries("q52_column_profile")(s, d)
      }
      time("s11_asis") {
        SparkEntry.queries("s11_ivfpq_knn")(s, d)
      }
      time("s10_asis") {
        SparkEntry.queries("s10_pq_adc_knn")(s, d)
      }
    }
    spark.stop()
  }
}
