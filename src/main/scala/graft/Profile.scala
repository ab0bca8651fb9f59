package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for bench outliers (round 3: q31/q35 —
  * verdict: machine contention; round 4 first half: q01 decimal-agg
  * decomposition — verdict: the decimal(28,10) partials ARE the cost
  * and buy oracle exactness, documented in SCALE.md; both harnesses
  * in git history).
  *
  * Current target: s15_semantic_dedup_lsh, the slowest BENCH_r04 line
  * (4.97 s vs its exact twin s12 at 3.11 s — the LSH scale path
  * should not lose to the N² baseline, even at sf0.1). Decomposition:
  * candidate generation (multi-probe bucket join) → exact-cosine edge
  * verification → connected components → full query, against s12's
  * crossJoin pair source + the same CC tail.
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

    import graft.functions.VectorExprs.{vecDot, vecNorm}
    def withVec = Tables.embeddings(s, d).select(col("vec_id"),
      col("embedding"), vecNorm(col("embedding")).as("nrm"))
    def cands = graft.ops.Similarity.lshCandidatePairs(s, d)
    def edges = cands
      .join(withVec.toDF("va", "ea", "na"), "va")
      .join(withVec.toDF("vb", "eb", "nb"), "vb")
      .filter((vecDot(col("ea"), col("eb")) /
        (col("na") * col("nb"))) >= 0.4)
      .select(col("va").as("da"), col("vb").as("db"))

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("s15_asis") {
        SparkEntry.queries("s15_semantic_dedup_lsh")(s, d)
      }
      time("s15_cands_only")(cands)
      time("s15_edges_verified")(edges)
      time("s15_cc_tail") {
        graft.ops.Text.connectedComponents(edges)
      }
      time("s12_asis") {
        SparkEntry.queries("s12_semantic_dedup")(s, d)
      }
      time("s12_pairs_only") {
        val a = Tables.embeddings(s, d).select(
          col("vec_id").as("da"), col("embedding").as("ea"),
          vecNorm(col("embedding")).as("na"))
        val b = Tables.embeddings(s, d).select(
          col("vec_id").as("db"), col("embedding").as("eb"),
          vecNorm(col("embedding")).as("nb"))
        a.crossJoin(b).filter(col("da") < col("db"))
          .filter((vecDot(col("ea"), col("eb")) /
            (col("na") * col("nb"))) >= 0.4)
          .select("da", "db")
      }
      // ---- s11 vs s16: where does the inline IVF×PQ spend its
      //      time? (encode-on-the-fly vs the at-rest coded table) ----
      time("s11_asis") {
        SparkEntry.queries("s11_ivfpq_knn")(s, d)
      }
      time("s11_encode_only") {
        graft.ops.Similarity.pqCodes(s, d)
      }
      time("s16_asis") {
        SparkEntry.queries("s16_ivfpq_stored")(s, d)
      }
    }
    spark.stop()
  }
}
