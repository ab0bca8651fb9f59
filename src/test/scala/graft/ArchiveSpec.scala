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

  test("HTTP FileOps: upload → ensure → copy → delete over scripted Graph calls") {
    import spark.implicits._
    ScriptedGraphTransport.reset()
    val bronze = Files.createTempDirectory("graft-bronze-http").toString
    val base = "https://graph.example.test/drives/d1"
    val t = new ScriptedGraphTransport(Map(
      s"GET $base/root:/Invoices/a.csv:/content" -> ((200, "c1,c2\n1,2")),
      // archive dir absent (404 default) → created at the parent
      s"POST $base/root:/Invoices:/children" -> ((201, "{}")),
      s"POST $base/root:/Invoices/a.csv:/copy" -> ((202, "")),
      s"DELETE $base/root:/Invoices/a.csv" -> ((204, ""))))
    val ops = new HttpFileOps(base, bronze, t,
      graft.pipeline.HttpListing.RetryPolicy(baseDelayMs = 1), _ => ())
    val m = Archive.run(Seq(meta("a.csv", "Invoices", "True", "True")).toDS,
      ops, clock).collect().head
    assert(m.uploaded && m.archived && m.deleted && m.error == null)
    // content landed under the lakehouse folder
    assert(Files.readString(
      Paths.get(bronze, "lh/Invoices", "a.csv")) == "c1,c2\n1,2")
    // wire order matches the reference state machine; DELETE strictly last
    val calls = ScriptedGraphTransport.snapshot()
    assert(calls == Seq(
      s"GET $base/root:/Invoices/a.csv:/content",
      s"GET $base/root:/Invoices/archive",
      s"POST $base/root:/Invoices:/children",
      s"POST $base/root:/Invoices/a.csv:/copy",
      s"DELETE $base/root:/Invoices/a.csv"))
    // folder-create and copy payloads carry the reference's shapes
    // (name + folder facet; parentReference path + timestamped name)
    val mk = ScriptedGraphTransport.bodyOf(s"$base/root:/Invoices:/children")
    assert(mk == """{"name":"archive","folder":{}}""")
    val cp = ScriptedGraphTransport.bodyOf(s"$base/root:/Invoices/a.csv:/copy")
    assert(cp.contains(""""name":"141125173005_a.csv""""))
    assert(cp.contains(""""path":"/drive/root:/Invoices/archive""""))
  }

  test("HTTP FileOps: existing archive dir skips the create POST (K2)") {
    import spark.implicits._
    ScriptedGraphTransport.reset()
    val bronze = Files.createTempDirectory("graft-bronze-http2").toString
    val base = "https://graph.example.test/drives/d1"
    val t = new ScriptedGraphTransport(Map(
      s"GET $base/root:/A/f.txt:/content" -> ((200, "x")),
      s"GET $base/root:/A/archive" -> ((200, """{"folder":{}}""")),
      s"POST $base/root:/A/f.txt:/copy" -> ((200, "")),
      s"DELETE $base/root:/A/f.txt" -> ((204, ""))))
    val m = Archive.run(Seq(meta("f.txt", "A", "True", "True")).toDS,
      new HttpFileOps(base, bronze, t,
        graft.pipeline.HttpListing.RetryPolicy(baseDelayMs = 1), _ => ()),
      clock).collect().head
    assert(m.uploaded && m.archived && m.deleted)
    assert(!ScriptedGraphTransport.snapshot().exists(_.contains(":/children")))
  }

  test("HTTP FileOps: binary content lands bit-exact (no UTF-8 round-trip)") {
    import graft.pipeline.HttpListing.HttpResponse
    val bronze = Files.createTempDirectory("graft-bronze-bin").toString
    val base = "https://graph.example.test/drives/d1"
    // bytes that do NOT survive a UTF-8 String round-trip: an invalid
    // continuation sequence plus a NUL — the head of a real xlsx/pdf
    // is exactly this kind of payload
    val payload = Array[Byte](0x50, 0x4b, 0x03, 0x04, 0xff.toByte,
      0xfe.toByte, 0x00, 0x80.toByte, 0xc3.toByte)
    val t = new graft.pipeline.HttpListing.WriteTransport {
      override def get(url: String): HttpResponse = {
        assert(url == s"$base/root:/Docs/r.xlsx:/content")
        // the transport surfaces BOTH views, as the real one does
        HttpResponse(200, new String(payload,
          java.nio.charset.StandardCharsets.UTF_8), bodyBytes = payload)
      }
      override def post(url: String, body: String,
          contentType: String): HttpResponse = HttpResponse(500, "")
      override def delete(url: String): HttpResponse = HttpResponse(500, "")
    }
    val ops = new HttpFileOps(base, bronze, t,
      graft.pipeline.HttpListing.RetryPolicy(baseDelayMs = 1), _ => ())
    ops.upload(meta("r.xlsx", "Docs", "False", "False"))
    val got = Files.readAllBytes(Paths.get(bronze, "lh/Docs", "r.xlsx"))
    assert(got.toSeq == payload.toSeq,
      "binary payload corrupted by a String round-trip")
  }

  test("HTTP FileOps: failed copy POST retains the original (C3), failed upload isolates (C2)") {
    import spark.implicits._
    ScriptedGraphTransport.reset()
    val bronze = Files.createTempDirectory("graft-bronze-http3").toString
    val base = "https://graph.example.test/drives/d1"
    val t = new ScriptedGraphTransport(Map(
      // badcopy: uploads fine, archive-create fine, copy blows up 500
      s"GET $base/root:/A/badcopy.txt:/content" -> ((200, "x")),
      s"GET $base/root:/A/archive" -> ((200, "{}")),
      s"POST $base/root:/A/badcopy.txt:/copy" -> ((500, """{"error":"boom"}""")),
      // ok: full happy path
      s"GET $base/root:/A/ok.txt:/content" -> ((200, "y")),
      s"POST $base/root:/A/ok.txt:/copy" -> ((202, "")),
      s"DELETE $base/root:/A/ok.txt" -> ((204, ""))))
      // badup: content GET stays unscripted → 404 → fail-fast
    val files = Seq(meta("badcopy.txt", "A", "True", "True"),
      meta("ok.txt", "A", "True", "True"),
      meta("badup.txt", "A", "True", "True"))
    val m = Archive.run(files.toDS,
      new HttpFileOps(base, bronze, t,
        graft.pipeline.HttpListing.RetryPolicy(baseDelayMs = 1), _ => ()),
      clock).collect().map(x => x.file_name -> x).toMap
    // C3: the 500 on :/copy surfaces as an archive error; DELETE never sent
    val bad = m("badcopy.txt")
    assert(bad.uploaded && !bad.archived && !bad.deleted)
    assert(bad.error.contains("archive") && bad.error.contains("500"))
    assert(!ScriptedGraphTransport.snapshot()
      .contains(s"DELETE $base/root:/A/badcopy.txt"))
    // C2: the 404 upload fails that file only; ok.txt ran to completion
    assert(!m("badup.txt").uploaded &&
      m("badup.txt").error.contains("upload"))
    assert(m("ok.txt").uploaded && m("ok.txt").archived && m("ok.txt").deleted)
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

/** Scripted WriteTransport for executor-side FileOps tests. The
  * response script rides the serialized instance (immutable map);
  * recorded calls/bodies ride the companion's STATIC buffers —
  * `Archive.run` serializes the ops into tasks, so instance-field
  * recording would land in the task's clone, invisible to the driver
  * (local mode shares the JVM, statics don't get cloned). Unscripted
  * URLs answer 404 (absent resource / fail-fast probe). */
class ScriptedGraphTransport(script: Map[String, (Int, String)])
    extends graft.pipeline.HttpListing.WriteTransport {
  import graft.pipeline.HttpListing.HttpResponse
  private def resp(key: String): HttpResponse = {
    ScriptedGraphTransport.calls.add(key)
    script.get(key).map { case (st, b) => HttpResponse(st, b) }
      .getOrElse(HttpResponse(404, s"""{"error":"no script for $key"}"""))
  }
  override def get(url: String): HttpResponse = resp(s"GET $url")
  override def post(url: String, body: String,
      contentType: String): HttpResponse = {
    ScriptedGraphTransport.bodies.put(url, body)
    resp(s"POST $url")
  }
  override def delete(url: String): HttpResponse = resp(s"DELETE $url")
}

object ScriptedGraphTransport {
  private val calls =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  private val bodies =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def reset(): Unit = { calls.clear(); bodies.clear() }
  def snapshot(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    calls.asScala.toSeq
  }
  def bodyOf(url: String): String = bodies.get(url)
}
