package graft

import graft.ingest.Ingest
import java.nio.file.{Files, Paths}

class IngestSpec extends SparkSpec {

  test("binaryFile discovery lists files with length + content") {
    val dir = Files.createTempDirectory("graft-disc")
    Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    Files.write(dir.resolve("b.bin"), Array[Byte](9))
    Files.writeString(dir.resolve("c.txt"), "hello")

    val df = Ingest.discoverBinary(spark, dir.toString)
    assert(df.count() == 3)
    val lens = df.select("path", "length").collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(lens == Map("a.bin" -> 3L, "b.bin" -> 1L, "c.txt" -> 5L))

    val globbed = Ingest.discoverBinary(spark, dir.toString, Some("*.bin"))
    assert(globbed.count() == 2)
  }

  test("blob ingest round-trips content through bronze parquet") {
    val dir = Files.createTempDirectory("graft-blob")
    val bronze = Files.createTempDirectory("graft-blob-out").resolve("b")
    Files.writeString(dir.resolve("x.txt"), "payload-x")
    Files.writeString(dir.resolve("y.txt"), "payload-yy")

    val manifest = Ingest.ingestBlobs(spark, dir.toString, bronze.toString)
    val rows = manifest.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.toSet ==
      Set(("x.txt", 9L, "ingested"), ("y.txt", 10L, "ingested")))

    val back = spark.read.parquet(bronze.toString)
      .select("file_name", "content").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1)))
      .toMap
    assert(back == Map("x.txt" -> "payload-x", "y.txt" -> "payload-yy"))
  }

  test("csv ingest appends typed rows to the sink table") {
    val dir = Files.createTempDirectory("graft-csv")
    val sink = Files.createTempDirectory("graft-csv-out").resolve("t")
    Files.writeString(dir.resolve("one.csv"), "id,amount\n1,10.5\n2,20.0\n")
    assert(Ingest.ingestCsv(spark, dir.toString, sink.toString) == 2)
    // append semantics (C4 at-least-once: re-run adds rows)
    Files.writeString(dir.resolve("two.csv"), "id,amount\n3,1.0\n")
    assert(Ingest.ingestCsv(spark, dir.toString, sink.toString) == 5)
    val cols = spark.read.parquet(sink.toString).columns.toSet
    assert(cols == Set("id", "amount", "_ingest_file"))
  }
}
