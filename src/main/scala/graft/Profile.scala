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

    // Decompose q52_column_profile: base stats pass vs the exact-NDV
    // explode-distinct pass, plus NDV variants (drop heavy columns /
    // pre-size the explode).
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("q52_asis") {
        SparkEntry.queries("q52_column_profile")(s, d)
      }
      val li = Tables.lineitem(s, d)
      val pcols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      time("q52_base_only") {
        li.agg(count(lit(1)).as("n"),
          pcols.map(c => count(col(c)).as(c + "_c")): _*)
      }
      time("q52_ndv_explode") {
        li.select(explode(array(pcols.map(c =>
            struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
            .as("p"))
          .select("p.*").filter(col("v").isNotNull)
          .distinct()
          .groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
      }
      time("q52_ndv_expand") {
        li.agg(countDistinct(col(pcols.head)).as("d0"),
          pcols.tail.map(c => countDistinct(col(c)).as("d_" + c)): _*)
      }
      time("q52_ndv_hash64") {
        li.select(explode(array(pcols.map(c =>
            struct(lit(c).as("col_name"), xxhash64(col(c)).as("v"))): _*))
            .as("p"))
          .select("p.*")
          .distinct()
          .groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
      }
    }
    spark.stop()
  }
}
