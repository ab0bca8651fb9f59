package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md /
  * FIXTURES.md §A). Every `SparkEntry.queries` entry receives the
  * scale-factor directory and reads through these helpers so the scan
  * (with Catalyst column pruning + predicate pushdown) is the only
  * I/O the query performs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): file listing + parquet footer
  // schema reads happen once per session instead of once per query —
  // pure plan-construction reuse, no data is cached. Weakly keyed on
  // the session (the cached DataFrames reference it) so a dropped
  // session is collectable.
  private val memo = new SessionMemo[(String, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.getOrCompute(spark, (dir, name))(
      spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp ([PARQUET_TYPE_ILLEGAL]). The raw int64 nanos
    * are read via `spark.sql.legacy.parquet.nanosAsLong` — set where
    * the session is BUILT (Bench/Verify/Explain/TestSpark), never here:
    * a loader must not flip session-global flags mid-query — and
    * truncated to µs TimestampType, exactly what DuckDB does with the
    * same column, so oracles agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true " +
        "(events.ts is parquet TIMESTAMP(NANOS))")
    val raw = table(s, d, "events")
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
