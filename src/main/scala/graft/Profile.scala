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

    import graft.functions.VectorExprs

    val NTables = 12
    val NBits = 8
    val rnd = new scala.util.Random(42)
    val planes: Seq[Seq[Double]] =
      Seq.fill(NTables * NBits)(Seq.fill(64)(rnd.nextGaussian()))
    def sigs = Tables.embeddings(s, d).select(col("vec_id"),
        posexplode(VectorExprs.hyperplaneSigs(
          col("embedding"), planes, NBits)))
      .toDF("vec_id", "tbl", "sig")
    val probeKeys = array((lit(0) +: (0 until NBits).map(b =>
      lit(1 << b))): _*)
    def pairsFrom(sg: DataFrame): DataFrame = {
      val a = sg
        .select(col("vec_id").as("va"), col("tbl"),
          explode(probeKeys).as("flip"), col("sig"))
        .select(col("va"), col("tbl"),
          col("sig").bitwiseXOR(col("flip")).as("sig"))
      val b = sg.toDF("vb", "tbl", "sig")
      graft.ops.Similarity.lshBucketJoin(a, b, cap = 4096)
        .filter(col("va") < col("vb"))
        .select(col("va"), col("vb"))
    }
    def top100(cands: DataFrame): DataFrame = {
      val withVec = Tables.embeddings(s, d).select(col("vec_id"),
        col("embedding"), VectorExprs.vecNorm(col("embedding")).as("nrm"))
      cands
        .join(withVec.toDF("va", "ea", "na"), "va")
        .join(withVec.toDF("vb", "eb", "nb"), "vb")
        .select(col("va"), col("vb"),
          (VectorExprs.vecDot(col("ea"), col("eb")) /
            (col("na") * col("nb"))).as("cos"))
        .orderBy(desc("cos"), col("va"), col("vb"))
        .limit(100)
    }

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      time("s05_asis") {
        SparkEntry.queries("s05_ann_lsh")(s, d)
      }
      time("s05_sigs_only")(sigs)
      time("s05_cands_nodistinct")(pairsFrom(sigs))
      time("s05_cands_distinct")(pairsFrom(sigs).distinct())
      time("s05_sig_persisted") {
        val sg = Scoped.persist(sigs)
        top100(pairsFrom(sg).distinct())
      }
      time("s05_nodistinct_top100") {
        top100(pairsFrom(sigs))
      }
    }
    spark.stop()
  }
}
