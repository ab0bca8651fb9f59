package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway profiling harness for bench outliers (round 3: q31/q35 —
  * verdict: machine contention, see git history; round 4: q01, the
  * flagship decimal-sum aggregation at 2.11 s in BENCH_r03). */
object Profile {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    materialize(df)
    val t1 = System.nanoTime()
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

    import graft.ops.{dsum, davg, ts}
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      // ---- q01 decomposition: scan floor → double aggs → decimal
      //      aggs → the as-registered query ----
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      def q01Base = Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("2000-12-01 00:00:00"))
      time("q01_asis") {
        SparkEntry.queries("q01_pricing_summary")(s, d)
      }
      time("q01_sum_double") {
        q01Base.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast("double")).as("sum_qty"),
            sum(col("l_extendedprice").cast("double")).as("sum_base_price"),
            sum(rev).as("sum_disc_price"),
            sum(rev * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            avg(col("l_quantity")).as("avg_qty"),
            avg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }
      time("q01_dec18") {
        q01Base.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity"), 18).as("sum_qty"),
            dsum(col("l_extendedprice"), 18).as("sum_base_price"),
            dsum(rev, 18).as("sum_disc_price"),
            dsum(rev * (lit(1.0) + col("l_tax")), 18).as("sum_charge"),
            davg(col("l_quantity"), 18).as("avg_qty"),
            davg(col("l_discount"), 18).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }
      time("q01_two_aggs_dec28") {
        q01Base.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }
      time("q01_scan_only") {
        q01Base.select("l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
      }
      time("q31_asis") {
        SparkEntry.queries("q31_salted_agg")(s, d)
      }
      time("q31_sum_double") {
        Tables.lineitem(s, d)
          .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(col("l_quantity").cast("double")).as("part_qty"),
            count(lit(1)).as("part_n"))
          .groupBy(col("l_returnflag"))
          .agg(sum(col("part_qty")).as("total_qty"), sum(col("part_n")).as("n"))
          .orderBy("l_returnflag")
      }
      time("q31_nosalt_decimal") {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity").cast(DecimalType(28, 10))).cast("double").as("total_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      }
      time("q31_dec18") {
        Tables.lineitem(s, d)
          .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 10))).as("part_qty"),
            count(lit(1)).as("part_n"))
          .groupBy(col("l_returnflag"))
          .agg(sum(col("part_qty")).cast("double").as("total_qty"), sum(col("part_n")).as("n"))
          .orderBy("l_returnflag")
      }
      time("q31_scan_only") {
        Tables.lineitem(s, d).select("l_returnflag", "l_quantity", "l_orderkey")
      }
      time("q35_asis") {
        SparkEntry.queries("q35_sql_api")(s, d)
      }
      time("q35_no_distinct") {
        Tables.orders(s, d).createOrReplaceTempView("orders_p")
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_p")
        s.sql("""
          SELECT o_orderpriority,
            COUNT(1) AS n_rows,
            CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS total_qty
          FROM orders_p o JOIN lineitem_p l ON o.o_orderkey = l.l_orderkey
          WHERE o.o_totalprice > 100000.0
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      }
      time("q35_distinct_sum_double") {
        s.sql("""
          SELECT o_orderpriority,
            COUNT(DISTINCT o.o_orderkey) AS n_orders,
            SUM(CAST(l.l_quantity AS DOUBLE)) AS total_qty
          FROM orders_p o JOIN lineitem_p l ON o.o_orderkey = l.l_orderkey
          WHERE o.o_totalprice > 100000.0
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      }
      time("q35_join_only") {
        s.sql("""
          SELECT o.o_orderpriority, l.l_quantity, o.o_orderkey
          FROM orders_p o JOIN lineitem_p l ON o.o_orderkey = l.l_orderkey
          WHERE o.o_totalprice > 100000.0""")
      }
    }
    spark.stop()
  }
}
