package graft

import graft.archive.Archive
import graft.model.FileMeta
import java.nio.file.{Files, Paths}
import java.time.Instant

class ArchiveSpec extends SparkSpec {
  import Archive._

  private val clock = Instant.parse("2025-11-14T09:30:05Z")

  test("sanitize replaces quotes and is idempotent") {
    assert(sanitize("o'brien's.txt") == "o_brien_s.txt")
    for (n <- Seq("a'b", "no quotes", "''", "")) {
      val once = sanitize(n)
      assert(!once.contains("'"))
      assert(sanitize(once) == once)
    }
  }

  test("archiveName prefixes KL-wall-clock ddMMyyHHmmss") {
    // 09:30:05 UTC = 17:30:05 Asia/Kuala_Lumpur (UTC+8, no DST)
    assert(archiveName("f.csv", clock) == "141125173005_f.csv")
    assert(archiveName("q'4.csv", clock) == "141125173005_q_4.csv")
  }

  test("flag parsing matches the reference's stringly semantics") {
    assert(flagIsTrue("True") && flagIsTrue("true") && flagIsTrue("TRUE"))
    assert(!flagIsTrue("False") && !flagIsTrue(null) && !flagIsTrue("") &&
      !flagIsTrue("yes"))
  }

  private def meta(name: String, folder: String, arch: String,
      del: String): FileMeta =
    FileMeta(name, folder, "Site", s"url/$name", s"lh/$folder", arch, del)

  private def mkTree(root: String, files: Seq[FileMeta]): Unit =
    files.foreach { f =>
      val p = Paths.get(root, f.folder_name, f.file_name)
      Files.createDirectories(p.getParent)
      Files.writeString(p, s"payload of ${f.file_name}")
    }

  test("pipeline: upload → archive → delete with flag gating") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src").toString
    val bronze = Files.createTempDirectory("graft-bronze").toString
    val files = Seq(
      meta("keep.csv", "A", "False", "False"),
      meta("arch.csv", "A", "True", "False"),
      meta("move.csv", "B", "true", "TRUE"))
    mkTree(src, files)

    val manifest = Archive.run(files.toDS,
      new LocalFileOps(src, bronze), clock).collect()
      .map(m => m.file_name -> m).toMap

    assert(manifest.values.forall(_.uploaded))
    assert(manifest.values.forall(_.error == null))
    assert(!manifest("keep.csv").archived && !manifest("keep.csv").deleted)
    assert(manifest("arch.csv").archived && !manifest("arch.csv").deleted)
    assert(manifest("move.csv").archived && manifest("move.csv").deleted)
    // bronze copies exist for all three
    for (f <- files)
      assert(Files.exists(Paths.get(bronze, f.lakehouse_folder, f.file_name)))
    // archive copy has the timestamped name; original gone only for move.csv
    assert(Files.exists(
      Paths.get(src, "A", "archive", "141125173005_arch.csv")))
    assert(Files.exists(Paths.get(src, "A", "arch.csv")))
    assert(!Files.exists(Paths.get(src, "B", "move.csv")))
  }

  test("delete is gated on archive success; failures isolate per file") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src2").toString
    val bronze = Files.createTempDirectory("graft-bronze2").toString
    val files = Seq(
      meta("ok.csv", "A", "True", "True"),
      meta("badarch.csv", "A", "True", "True"),
      meta("badup.csv", "A", "False", "False"))
    mkTree(src, files)

    val ops = new LocalFileOps(src, bronze) {
      override def archiveCopy(f: FileMeta, n: String): Unit =
        if (f.file_name == "badarch.csv") sys.error("archive boom")
        else super.archiveCopy(f, n)
      override def upload(f: FileMeta): Unit =
        if (f.file_name == "badup.csv") sys.error("upload boom")
        else super.upload(f)
    }
    val m = Archive.run(files.toDS, ops, clock).collect()
      .map(x => x.file_name -> x).toMap

    // C2: failed upload skips that file only, others proceed
    assert(!m("badup.csv").uploaded && m("badup.csv").error.contains("upload"))
    assert(m("ok.csv").uploaded && m("ok.csv").archived && m("ok.csv").deleted)
    // C3: failed archive → original retained, NOT deleted
    val bad = m("badarch.csv")
    assert(bad.uploaded && !bad.archived && !bad.deleted)
    assert(bad.error.contains("archive"))
    assert(Files.exists(Paths.get(src, "A", "badarch.csv")))
  }
}
