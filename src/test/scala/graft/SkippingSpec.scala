package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.ZOrderExprs.zvalue
import graft.functions.ZOrderCodec
import graft.ingest.{BronzeMerge, DataSkipping}

/** File-level data skipping (per-file min/max stats) and z-order
  * clustering — the read-path half of the bronze/Delta story: a
  * selective predicate should OPEN file-count proportional to the
  * matching files, and z-ordering should make that true for every
  * clustered column, not just the sort leader. */
class SkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("per-file stats prune a range read to the intersecting files") {
    val dir = tmp("skip-linear")
    // 8 files with disjoint id ranges (range partition + sort)
    spark.range(0, 8000).select(col("id").cast("int").as("id"),
        (col("id") % 97).cast("int").as("payload"))
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")
      .write.mode("overwrite").parquet(dir)

    val n = DataSkipping.writeStats(spark, dir, Seq("id"))
    assert(n == 8, s"expected 8 data files, stats saw $n")

    val (kept, total) = DataSkipping.prunedPaths(spark, dir, "id", 2500, 3499)
    assert(total == 8)
    assert(kept.size <= 2, s"1000-wide range should hit ≤2 of 8 files, hit ${kept.size}")

    val viaSkip = DataSkipping.readBetween(spark, dir, "id", 2500, 3499)
      .orderBy("id").collect()
    val brute = spark.read.parquet(dir)
      .filter(col("id").between(2500, 3499)).orderBy("id").collect()
    assert(viaSkip.sameElements(brute))
  }

  test("empty pruned set still returns the right (empty) answer") {
    val dir = tmp("skip-empty")
    spark.range(0, 100).select(col("id").cast("int").as("id"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    DataSkipping.writeStats(spark, dir, Seq("id"))
    val (kept, _) = DataSkipping.prunedPaths(spark, dir, "id", 500, 600)
    assert(kept.isEmpty)
    assert(DataSkipping.readBetween(spark, dir, "id", 500, 600).count() == 0)
  }

  test("all-null stats files are kept, conservatively") {
    val dir = tmp("skip-null")
    Seq[(Integer, Int)]((null, 1), (null, 2)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    DataSkipping.writeStats(spark, dir, Seq("id"))
    val (kept, total) = DataSkipping.prunedPaths(spark, dir, "id", 0, 10)
    assert(total == 1 && kept.size == 1)
  }

  test("morton codes order a grid along the z-curve") {
    // spread: bit i → bit 2i
    assert(ZOrderCodec.spread(0xffffffffL) == 0x5555555555555555L)
    assert(ZOrderCodec.spread(1L) == 1L)
    // sign normalization: Int.MinValue maps to curve origin
    assert(ZOrderCodec.morton(Int.MinValue, Int.MinValue) == 0L)
    // result never negative (31 bits per coordinate after >>> 1)
    assert(ZOrderCodec.morton(Int.MaxValue, Int.MaxValue) >= 0L)
    // locality: points in the same small tile are closer in code
    // space than points a stripe apart (even y-bits, odd x shifts)
    val base = ZOrderCodec.morton(8, 8)
    assert(math.abs(ZOrderCodec.morton(10, 10) - base) <
      math.abs(ZOrderCodec.morton(8, 1000) - base))
  }

  test("z-order clustering prunes on BOTH columns; linear sort only on the leader") {
    val grid = spark.range(0, 64 * 64).select(
      (col("id") % 64).cast("int").as("x"),
      (col("id") / 64).cast("int").as("y"))

    val linDir = tmp("skip-lin")
    grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(linDir)
    DataSkipping.writeStats(spark, linDir, Seq("x", "y"))

    val zDir = tmp("skip-z")
    grid.withColumn("_z", zvalue(col("x"), col("y")))
      .repartitionByRange(16, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(zDir)
    DataSkipping.writeStats(spark, zDir, Seq("x", "y"))

    // leader column: both layouts prune hard
    val (linX, linTot) = DataSkipping.prunedPaths(spark, linDir, "x", 8, 15)
    val (zX, zTot) = DataSkipping.prunedPaths(spark, zDir, "x", 8, 15)
    assert(linTot == 16 && zTot == 16)
    assert(linX.size <= 4, s"linear leader prune: ${linX.size}")
    assert(zX.size <= 8, s"z leader prune: ${zX.size}")

    // trailing column: linear layout is blind (every x-stripe spans
    // all y), z-order still prunes to the tiles the band crosses
    val (linY, _) = DataSkipping.prunedPaths(spark, linDir, "y", 8, 15)
    val (zY, _) = DataSkipping.prunedPaths(spark, zDir, "y", 8, 15)
    assert(linY.size == 16, s"x-stripes all span y: ${linY.size}")
    assert(zY.size <= 8, s"z trailing prune: ${zY.size}")
    assert(zY.size < linY.size)

    // pruned reads stay exact on both layouts
    val brute = grid.filter(col("y").between(8, 15))
      .orderBy("x", "y").collect()
    assert(DataSkipping.readBetween(spark, zDir, "y", 8, 15)
      .orderBy("x", "y").collect().sameElements(brute))
    assert(DataSkipping.readBetween(spark, linDir, "y", 8, 15)
      .orderBy("x", "y").collect().sameElements(brute))
  }

  test("bronze snapshotBetween skips whole batches outside the range") {
    val table = tmp("skip-bronze") + "/tbl"
    def batch(lo: Int, n: Int) =
      (lo until lo + n).map(i => (s"f_$i.bin", i.toLong,
        new java.sql.Timestamp(1700000000000L + i * 1000L),
        Array[Byte](i.toByte))).toDF(
        "file_name", "length", "modified", "content")
    BronzeMerge.mergeIngestDf(spark, batch(0, 50), table)
    BronzeMerge.mergeIngestDf(spark, batch(1000, 50), table)
    val stated = BronzeMerge.collectStats(spark, table, Seq("length"))
    assert(stated.size == 2)
    // second call is a no-op: batches are immutable
    assert(BronzeMerge.collectStats(spark, table, Seq("length")).isEmpty)

    val hit = BronzeMerge.snapshotBetween(spark, table, "length", 1000, 1010)
    assert(hit.count() == 11)
    assert(hit.agg(min("length"), max("length")).head ==
      org.apache.spark.sql.Row(1000L, 1010L))
    // the out-of-range batch contributes zero files to the plan
    val (kept, total) = DataSkipping.prunedPaths(spark,
      s"$table/batch-00000001", "length", 1000, 1010)
    assert(kept.isEmpty && total >= 1)
  }
}
