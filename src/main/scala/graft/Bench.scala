package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Materialize the FULL result — not `.count()`, under which Catalyst
    * deletes unreferenced projections/sorts and a per-row query bills a
    * bare scan. The built-in `noop` sink executes every operator and
    * serializes every output row, discarding them at the sink. */
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/catalog startup shouldn't bill the
    // first query; then two timed iterations in sorted order, report
    // the per-query min (steady-state, JIT/GC noise suppressed)
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    def timeAll(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case _: Throwable => () }
        finally Scoped.release() // a query's persists die with its run
        name -> (System.nanoTime() - t0) / 1e9
      }
    val (r1, r2) = (timeAll(), timeAll().toMap)
    val results = r1.map { case (n, t) => n -> math.min(t, r2(n)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // per-query detail: its own earlier line + a file; the driver-
    // parsed line is the compact one printed LAST (round 1's single
    // giant line was truncated by the driver's stdout tail)
    val detail =
      s"""{"metric":"queries","queries":$qs,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_detail.json"), detail)
    catch { case _: Throwable => () }
    println(detail)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
