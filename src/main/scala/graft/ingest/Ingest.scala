package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze-zone ingestion — the Spark-native re-expression of the
  * reference's download→upload path (S6/K1,
  * `sharepoint_to_bronze_delta.py:163-176`).
  *
  * The reference buffers each file whole in driver memory and copies
  * one at a time; here the `binaryFile` source distributes the read
  * across executors (one task per file split) and the write is a
  * normal distributed parquet/Delta-style commit. No payload ever
  * passes through the driver (`collect()` is banned on content).
  *
  * Scale notes (100 TB): listing is driver-side but O(files) metadata
  * only; payload I/O is executor-side. For a remote Graph source the
  * same shape becomes a DataSource V2 `TableProvider` whose
  * `PartitionReader` fetches ranges — the plumbing below is the local
  * stand-in the offline harness can exercise.
  */
object Ingest {

  /** Catalog of a local directory via the `binaryFile` source:
    * (path, modificationTime, length, content). Filters pushed to the
    * listing (e.g. `pathGlobFilter`). */
  def discoverBinary(spark: SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  /** Blob-parity ingest: every file in `srcDir` lands in the bronze
    * store as (file_name, length, modified, content) parquet rows.
    * Returns the ingest manifest (no content column — metadata only,
    * driver-safe). */
  def ingestBlobs(spark: SparkSession, srcDir: String,
      bronzePath: String): DataFrame = {
    val files = discoverBinary(spark, srcDir)
      .select(
        substring_index(col("path"), "/", -1).as("file_name"),
        col("length"), col("modificationTime").as("modified"),
        col("content"))
    files.write.mode(SaveMode.Overwrite).parquet(bronzePath)
    spark.read.parquet(bronzePath)
      .select(col("file_name"), col("length"),
        lit("ingested").as("status"))
  }

  /** Content-aware ingest: CSV files → typed rows appended to the
    * sink table (the `sink_table` the reference's config names but
    * its script never populates, `config.py:16`). */
  def ingestCsv(spark: SparkSession, srcGlob: String, sinkPath: String,
      header: Boolean = true): Long = {
    val df = spark.read
      .option("header", header.toString)
      .option("inferSchema", "true")
      .csv(srcGlob)
      .withColumn("_ingest_file", input_file_name())
    df.write.mode(SaveMode.Append).parquet(sinkPath)
    spark.read.parquet(sinkPath).count()
  }
}
