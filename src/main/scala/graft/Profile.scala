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

    // Decompose t43_boiler_ngrams at sf1 (24 s for 10x data, 12x the
    // sf0.1 cost): is the window build re-evaluating split(text) per
    // window element inside the transform lambda?
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("t43_asis") {
        SparkEntry.queries("t43_boiler_ngrams")(s, d)
      }
      val toks = split(col("text"), " ")
      val nWin = (size(toks) - 4).cast("int")
      time("t43_wins_inline_toks") { // toks referenced inside the lambda
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(when(nWin > 0,
              array_distinct(transform(sequence(lit(0), nWin - 1),
                i => array_join(slice(toks, i + 1, lit(5)), " "))))
              .otherwise(array().cast("array<string>"))).as("win"))
          .select(col("doc_id"), xxhash64(col("win")).as("wh"))
      }
      time("t43_wins_presplit") { // toks materialized once as a column
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("tk"))
          .select(col("doc_id"),
            explode(when(size(col("tk")) > 4,
              array_distinct(transform(
                sequence(lit(0), size(col("tk")) - 5),
                i => array_join(slice(col("tk"), i + 1, lit(5)), " "))))
              .otherwise(array().cast("array<string>"))).as("win"))
          .select(col("doc_id"), xxhash64(col("win")).as("wh"))
      }
    }
    spark.stop()
  }
}
