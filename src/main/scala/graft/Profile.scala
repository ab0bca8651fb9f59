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

    // Round rehearsal: min-of-3 for the named queries (default: the
    // latest round's additions) at the given SF dir — run once at
    // sf0.1 and once at the synthesized sf1 for the scaling exponent.
    val names = args.toSeq match {
      case Nil => Seq("e28_trending", "e29_growth_accounting",
        "s20_knn_classify", "s21_embedding_drift", "t45_vocab_coverage",
        "t46_split_leakage", "m12_audio_frames", "q59_cumulative_distinct")
      case xs => xs
    }
    if (names == Seq("t09parts")) {
      // decomposition of t09's steady-state residual (round 11): the
      // full pipeline vs its stages, each materialized in isolation
      import graft.ops.Text
      import org.apache.spark.sql.functions._
      for (round <- 1 to 3) {
        println(s"--- round $round ---")
        time("dup_mapping")(Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .withColumn("rep", min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("text")))))
        time("shingles_only")(Tables.documents(s, d)
          .select(col("doc_id"), Text.shingles.as("sh"))
          .filter(size(col("sh")) > 0))
        time("band_keys")(Text.lshBandKeys(
          Tables.documents(s, d).select(col("doc_id"), col("text"))))
        time("t09_full")(SparkEntry.queries("t09_minhash_lsh")(s, d))
      }
    } else if (names == Seq("t49parts")) {
      // decomposition of t49's sf10 warm residual
      import graft.ops.Text
      for (round <- 1 to 3) {
        println(s"--- round $round ---")
        time("labels")(Text.dupClusterLabels(s, d, 0.8))
        time("quality_scan")(Tables.documents(s, d)
          .select(org.apache.spark.sql.functions
            .round(Text.qualityExpr, 6).as("q"))
          .agg(graft.ops.dsum(col("q")).as("x")))
        time("qs_kernel_once")(Tables.documents(s, d)
          .select(graft.functions.TextExprs.qualityStats(col("text"))
            .getField("n_distinct").as("x"))
          .agg(sum(col("x"))))
        time("split_only")(Tables.documents(s, d)
          .select(size(split(col("text"), " ")).as("x"))
          .agg(sum(col("x"))))
        time("t49_full")(SparkEntry.queries(
          "t49_quality_survivorship")(s, d))
      }
    } else if (names == Seq("t65parts")) {
      // decomposition of t65's sf1 residual after the rep collapse
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      for (round <- 1 to 2) {
        println(s"--- round $round ---")
        val mappingDf = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .withColumn("rep",
            min(col("doc_id")).over(Window.partitionBy(col("text"))))
        time("mapping")(mappingDf)
        val repsDf = mappingDf.filter(col("doc_id") === col("rep"))
        time("sh8")(repsDf.select(col("doc_id"),
          explode(graft.functions.TextExprs
            .shingleHashes(col("text"), 8)).as("g")))
        val sh8 = repsDf.select(col("doc_id"),
          explode(graft.functions.TextExprs
            .shingleHashes(col("text"), 8)).as("g"))
        time("cand")(sh8.toDF("ra", "g")
          .join(sh8.toDF("rb", "g2"),
            col("g") === col("g2") && col("ra") < col("rb"))
          .select(col("ra"), col("rb")).distinct())
        val members = mappingDf.select(col("rep"), col("doc_id"))
        time("intra")(members.toDF("rep", "ma")
          .join(members.toDF("rep", "mb"), "rep")
          .filter(col("ma") < col("mb"))
          .join(sh8.select(col("doc_id").as("rep")).distinct(), "rep"))
        val candDf = sh8.toDF("ra", "g")
          .join(sh8.toDF("rb", "g2"),
            col("g") === col("g2") && col("ra") < col("rb"))
          .select(col("ra"), col("rb")).distinct()
        val ta = repsDf.select(col("doc_id").as("ra"),
          col("text").as("tta"), length(col("text")).cast("long").as("la"))
        val tb = repsDf.select(col("doc_id").as("rb"),
          col("text").as("ttb"), length(col("text")).cast("long").as("lb"))
        time("verify")(candDf.join(ta, "ra").join(tb, "rb")
          .filter(abs(col("la") - col("lb")) <= 64)
          .withColumn("dist",
            levenshtein(col("tta"), col("ttb"), 64).cast("long"))
          .filter(col("dist") >= 0))
        time("t65_full")(SparkEntry.queries("t65_editdist_pairs")(s, d))
      }
    } else if (names == Seq("s12parts")) {
      // decomposition of s12's sf0.1 residual (round 15): all-pairs
      // edge build vs the CC iteration vs the final expand
      import graft.ops.{Similarity, Text}
      for (round <- 1 to 3) {
        println(s"--- round $round ---")
        val edges = Similarity.neardupEdges(s, d, allPairs = true, 0.4)
          .select(col("va").as("da"), col("vb").as("db"))
        time("edges_allpairs")(edges)
        time("cc_only")(Text.connectedComponents(edges))
        time("s12_full")(SparkEntry.queries("s12_semantic_dedup")(s, d))
      }
    } else if (names == Seq("q52parts")) {
      // decomposition of q52: plain aggregate vs the 11-way exact-NDV
      // Expand aggregate
      import org.apache.spark.sql.functions._
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      for (round <- 1 to 3) {
        println(s"--- round $round ---")
        val li = Tables.lineitem(s, d)
        time("agg_minmax")(li.agg(count(lit(1)).as("n"),
          cols.flatMap(c => Seq(min(col(c)).as(s"${c}_mn"),
            max(col(c)).as(s"${c}_mx"))): _*))
        time("agg_ndv11")(li.agg(
          countDistinct(col(cols.head)).as("d0"),
          cols.tail.map(c => countDistinct(col(c)).as(s"d_$c")): _*))
        time("agg_ndv1_comment")(li.agg(
          countDistinct(col("l_orderkey")).as("d0")))
        time("q52_full")(SparkEntry.queries("q52_column_profile")(s, d))
      }
    } else if (names == Seq("q16parts")) {
      import org.apache.spark.sql.functions._
      for (round <- 1 to 3) {
        println(s"--- round $round ---")
        val l = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        time("join_count")(l.join(broadcast(p),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand")).agg(count(lit(1)).as("n")))
        time("join_1ndv")(l.join(broadcast(p),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(countDistinct(col("l_suppkey")).as("n_suppliers")))
        time("q16_full")(SparkEntry.queries("q16_distinct_parts")(s, d))
      }
    } else {
      for (round <- 1 to 3) {
        println(s"--- round $round ---")
        names.foreach(n => time(n)(SparkEntry.queries(n)(s, d)))
      }
    }
    spark.stop()
  }
}
