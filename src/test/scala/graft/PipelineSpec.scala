package graft

import graft.archive.Archive
import graft.model.SourceFolderCfg
import graft.pipeline.TransferPipeline
import java.nio.file.{Files, Paths}
import java.time.Instant

/** End-to-end test of the user-facing orchestrator — the "switch from
  * the reference" story: configure folders, point at a source tree,
  * run, audit the manifest. */
class PipelineSpec extends SparkSpec {

  private val clock = Instant.parse("2025-11-14T09:30:05Z")

  test("full transfer: discover, ingest, archive, gate deletes") {
    val src = Files.createTempDirectory("graft-pipe-src").toString
    val bronze = Files.createTempDirectory("graft-pipe-bronze").toString
    for ((folder, files) <- Seq(
        "Invoices" -> Seq("a.csv", "b'quoted.csv"),
        "Reports" -> Seq("r1.pdf"),
        "Empty" -> Seq())) {
      Files.createDirectories(Paths.get(src, folder))
      files.foreach(f =>
        Files.writeString(Paths.get(src, folder, f), s"data-$f"))
    }
    // a subfolder must be filtered out by the file-facet rule (P1)
    Files.createDirectories(Paths.get(src, "Invoices", "sub"))

    val folders = Seq(
      SourceFolderCfg("Invoices", "Fin", "lh/inv", "True", "True"),
      SourceFolderCfg("Reports", "Fin", "lh/rep", "False", null),
      SourceFolderCfg("Empty", "Ops", "lh/empty", null, null))

    val res = TransferPipeline.run(spark, folders,
      new TransferPipeline.LocalDirListing(src),
      new Archive.LocalFileOps(src, bronze), clock).get

    // catalog: 3 files (subfolder excluded), flags defaulted
    val cat = res.catalog.collect().map(f => f.file_name -> f).toMap
    assert(cat.keySet == Set("a.csv", "b'quoted.csv", "r1.pdf"))
    assert(cat("r1.pdf").delete_original == "False")

    // counts relation: per folder + rollup total
    val counts = res.folderCounts.collect()
      .map(r => Option(r.getString(0)).getOrElse("TOTAL") -> r.getLong(1))
      .toMap
    assert(counts == Map("Invoices" -> 2L, "Reports" -> 1L, "TOTAL" -> 3L))

    // manifest: invoices archived+deleted, report only uploaded
    val m = res.manifest.collect().map(x => x.file_name -> x).toMap
    assert(m.values.forall(_.uploaded))
    assert(m("a.csv").archived && m("a.csv").deleted)
    assert(!m("r1.pdf").archived && !m("r1.pdf").deleted)

    // bronze has sanitized names; archive copies are timestamped
    assert(Files.exists(Paths.get(bronze, "lh/inv", "b_quoted.csv")))
    assert(Files.exists(
      Paths.get(src, "Invoices", "archive", "141125173005_a.csv")))
    assert(!Files.exists(Paths.get(src, "Invoices", "a.csv"))) // deleted
    assert(Files.exists(Paths.get(src, "Reports", "r1.pdf")))  // kept
  }

  test("orchestrator runs over the HTTP listing seam: pages + retry, then transfer") {
    import graft.pipeline.{HttpListing, HttpListingProvider}
    import graft.pipeline.HttpListing.{HttpResponse, RetryPolicy}
    // remote catalog: the listing arrives over (scripted) HTTP with
    // pagination AND a transient 429 on the way — the production
    // swap-in for LocalDirListing, everything downstream unchanged
    val src = Files.createTempDirectory("graft-pipe-http").toString
    val bronze = Files.createTempDirectory("graft-pipe-http-bz").toString
    Files.createDirectories(Paths.get(src, "Invoices"))
    Seq("a.csv", "b.csv", "c.csv").foreach(f =>
      Files.writeString(Paths.get(src, "Invoices", f), s"data-$f"))

    val base = "https://graph.example.test/drives/d1"
    def filePage(names: Seq[String], next: Option[String]) = HttpResponse(
      200, names.map(n =>
        s"""{"name":"$n","size":6,"file":{"mimeType":"text/csv"}}""")
        .mkString("""{"value":[""", ",",
          next.fold("]}")(u => s"""],"@odata.nextLink":"$u"}""")))
    val sleeps = scala.collection.mutable.Buffer[Long]()
    val transport = new HttpListing.Transport {
      private var calls = Map[String, Int]().withDefaultValue(0)
      override def get(url: String): HttpResponse = {
        calls += url -> (calls(url) + 1)
        url match {
          case u if u == s"$base/root:/Invoices:/children" =>
            filePage(Seq("a.csv", "b.csv"), Some(s"$base/p2"))
          case u if u == s"$base/p2" && calls(u) == 1 =>
            HttpResponse(429, "", Map("Retry-After" -> "1"))
          case u if u == s"$base/p2" =>
            filePage(Seq("c.csv"), None)
          case u => HttpResponse(404, s"unexpected $u")
        }
      }
    }
    val listing = new HttpListingProvider(base, transport,
      RetryPolicy(), sleeps += _)

    val res = TransferPipeline.run(spark,
      Seq(SourceFolderCfg("Invoices", "Fin", "lh/inv", "False", null)),
      listing, new Archive.LocalFileOps(src, bronze), clock).get

    // every page's files made it through discovery → catalog → bronze
    assert(res.catalog.collect().map(_.file_name).sorted.toSeq ==
      Seq("a.csv", "b.csv", "c.csv"))
    assert(sleeps.toSeq == Seq(1000L)) // the 429 was retried, once
    val m = res.manifest.collect().map(x => x.file_name -> x).toMap
    assert(m.values.forall(_.uploaded))
    Seq("a.csv", "b.csv", "c.csv").foreach(f =>
      assert(Files.exists(Paths.get(bronze, "lh/inv", f))))
  }

  test("full HTTP lifecycle: list → fetch → archive copy → gated delete on one scripted transport") {
    import graft.pipeline.HttpListingProvider
    import graft.pipeline.HttpListing.RetryPolicy
    // the whole reference pipeline (S5 listing + :80-109 write ops)
    // against ONE scripted Graph endpoint: discovery and the per-file
    // state machine both ride the same WriteTransport, with the C3
    // gate proven over HTTP (500 on :/copy ⇒ no DELETE ever sent)
    ScriptedGraphTransport.reset()
    val bronze = Files.createTempDirectory("graft-pipe-http-full").toString
    val base = "https://graph.example.test/drives/d1"
    val t = new ScriptedGraphTransport(Map(
      s"GET $base/root:/Invoices:/children" -> ((200,
        """{"value":[{"name":"a.csv","size":6,"file":{"mimeType":"text/csv"}},
          {"name":"bad.csv","size":8,"file":{"mimeType":"text/csv"}},
          {"name":"Sub","folder":{"childCount":1}}]}""")),
      s"GET $base/root:/Invoices/a.csv:/content" -> ((200, "data-a")),
      s"GET $base/root:/Invoices/bad.csv:/content" -> ((200, "data-bad")),
      s"GET $base/root:/Invoices/archive" -> ((200, "{}")),
      s"POST $base/root:/Invoices/a.csv:/copy" -> ((202, "")),
      s"POST $base/root:/Invoices/bad.csv:/copy" ->
        ((500, """{"error":"copy boom"}""")),
      s"DELETE $base/root:/Invoices/a.csv" -> ((204, ""))))
    val res = TransferPipeline.run(spark,
      Seq(SourceFolderCfg("Invoices", "Fin", "lh/inv", "True", "True")),
      new HttpListingProvider(base, t, RetryPolicy(baseDelayMs = 1), _ => ()),
      new Archive.HttpFileOps(base, bronze, t,
        RetryPolicy(baseDelayMs = 1), _ => ()),
      clock).get
    // the folder facet was filtered (P1); both files transferred
    assert(res.catalog.collect().map(_.file_name).sorted.toSeq ==
      Seq("a.csv", "bad.csv"))
    val m = res.manifest.collect().map(x => x.file_name -> x).toMap
    assert(m("a.csv").uploaded && m("a.csv").archived && m("a.csv").deleted)
    assert(Files.readString(
      Paths.get(bronze, "lh/inv", "a.csv")) == "data-a")
    // C3 over HTTP: failed :/copy retains the original — no DELETE
    val bad = m("bad.csv")
    assert(bad.uploaded && !bad.archived && !bad.deleted)
    assert(bad.error.contains("archive") && bad.error.contains("500"))
    assert(!ScriptedGraphTransport.snapshot()
      .contains(s"DELETE $base/root:/Invoices/bad.csv"))
  }

  test("DSv2 catalog drives the full lifecycle: pushed listing → ingest → archive → gated delete") {
    import graft.pipeline.HttpListing.RetryPolicy
    import graft.sources.GraphCatalogSource
    // THE production wiring, end to end: the catalog comes from the
    // DataSource V2 scan (not a fixture DataFrame), the write side is
    // the HTTP state machine on a scripted transport — list → fetch →
    // archive → gated delete (C1–C4) with the config-folder predicate
    // pushed INTO the connector.
    ScriptedGraphTransport.reset()
    val bronze = Files.createTempDirectory("graft-pipe-dsv2").toString
    val base = "https://graph.example.test/drives/d9"
    // generator: 4 folders × 3 files, names folder_f_doc_j.{csv,pdf,png}
    val f1 = (0 to 2).map(j => s"folder_1_doc_$j." +
      Seq("csv", "pdf", "png")(j % 3))
    val f3 = (0 to 2).map(j => s"folder_3_doc_$j." +
      Seq("csv", "pdf", "png")(j % 3))
    val script = Map.newBuilder[String, (Int, String)]
    for (n <- f1) {
      script += s"GET $base/root:/folder_1/$n:/content" ->
        ((200, s"payload-$n"))
      script += s"POST $base/root:/folder_1/$n:/copy" -> ((202, ""))
      script += s"DELETE $base/root:/folder_1/$n" -> ((204, ""))
    }
    script += s"GET $base/root:/folder_1/archive" -> ((200, "{}"))
    for (n <- f3) // archive/delete disabled for folder_3: upload only
      script += s"GET $base/root:/folder_3/$n:/content" ->
        ((200, s"payload-$n"))
    val t = new ScriptedGraphTransport(script.result())

    val listed = spark.read.format("graph-items")
      .option("folders", "4").option("filesPerFolder", "3")
      .option("pageSize", "2").load()
    val res = TransferPipeline.runWithListing(spark,
      Seq(SourceFolderCfg("folder_1", "Fin", "lh/f1", "True", "True"),
        SourceFolderCfg("folder_3", "Ops", "lh/f3", "False", "False")),
      listed,
      new Archive.HttpFileOps(base, bronze, t,
        RetryPolicy(baseDelayMs = 1), _ => ()),
      clock).get

    // pushdown through the PIPELINE: one catalog materialization
    // lists ONLY the 2 configured folders (2 pages each at
    // pageSize=2) — folder_0/folder_2 are never listed remotely
    GraphCatalogSource.pagesServed.set(0)
    assert(res.catalog.collect().length == 6)
    assert(GraphCatalogSource.pagesServed.get() == 4,
      s"unconfigured folders were listed: " +
        s"${GraphCatalogSource.pagesServed.get()} pages")

    // lifecycle over the DSv2-derived catalog (C1/C2 via Archive.run)
    val m = res.manifest.collect().map(x => x.file_name -> x).toMap
    assert(m.keySet == (f1 ++ f3).toSet)
    f1.foreach { n =>
      assert(m(n).uploaded && m(n).archived && m(n).deleted,
        s"$n: ${m(n)}") }
    f3.foreach { n =>
      assert(m(n).uploaded && !m(n).archived && !m(n).deleted) }
    // bronze payloads bit-exact under the configured lakehouse roots
    (f1.map(("lh/f1", _)) ++ f3.map(("lh/f3", _))).foreach {
      case (lh, n) =>
        assert(Files.readString(Paths.get(bronze, lh, n)) == s"payload-$n")
    }
    // per-file wire order (calls interleave across files — assert the
    // per-file subsequence): fetch → archive probe → copy → delete
    // strictly last (K3/K4), and folder_3 files never touch the
    // archive/delete verbs (P6 gating)
    val calls = ScriptedGraphTransport.snapshot()
    f1.foreach { n =>
      val mine = calls.filter(_.contains(s"/$n"))
      assert(mine == Seq(
        s"GET $base/root:/folder_1/$n:/content",
        s"POST $base/root:/folder_1/$n:/copy",
        s"DELETE $base/root:/folder_1/$n"), s"wire order for $n: $mine")
    }
    f3.foreach { n =>
      assert(calls.filter(_.contains(s"/$n")) ==
        Seq(s"GET $base/root:/folder_3/$n:/content"))
    }
  }

  test("production path end-to-end: real HTTP transport over a loopback server → catalog → bronze") {
    import graft.pipeline.{HttpListing, HttpListingProvider}
    import graft.pipeline.HttpListing.{CredentialProvider, RetryPolicy}
    // the ONLY difference from production is the socket's far end:
    // TransferPipeline ← HttpListingProvider ← HttpUrlConnectionTransport
    // ← a real loopback HTTP server speaking Graph-shaped JSON
    val src = Files.createTempDirectory("graft-real-http").toString
    val bronze = Files.createTempDirectory("graft-real-http-bz").toString
    Files.createDirectories(Paths.get(src, "Invoices"))
    Seq("a.csv", "b.csv").foreach(f =>
      Files.writeString(Paths.get(src, "Invoices", f), s"data-$f"))

    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}/drives/d1"
    val auths = scala.collection.mutable.Buffer[String]()
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      auths.synchronized {
        auths += ex.getRequestHeaders.getFirst("Authorization") }
      val body = ex.getRequestURI.getPath match {
        case "/drives/d1/root:/Invoices:/children" =>
          s"""{"value":[{"name":"a.csv","size":6,"file":{"mimeType":"text/csv"}}],
             "@odata.nextLink":"$base/p2"}"""
        case "/drives/d1/p2" =>
          """{"value":[{"name":"b.csv","size":6,"file":{"mimeType":"text/csv"}}]}"""
        case p => s"""{"error":"unexpected $p"}"""
      }
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      val listing = new HttpListingProvider(base,
        new HttpListing.HttpUrlConnectionTransport(
          CredentialProvider.Static("e2e-token")),
        RetryPolicy())
      val res = TransferPipeline.run(spark,
        Seq(SourceFolderCfg("Invoices", "Fin", "lh/inv", "False", null)),
        listing, new Archive.LocalFileOps(src, bronze), clock).get
      assert(res.catalog.collect().map(_.file_name).sorted.toSeq ==
        Seq("a.csv", "b.csv"))
      assert(res.manifest.collect().forall(_.uploaded))
      Seq("a.csv", "b.csv").foreach(f =>
        assert(Files.exists(Paths.get(bronze, "lh/inv", f))))
      // every remote call carried the credential
      assert(auths.nonEmpty && auths.forall(_ == "Bearer e2e-token"))
    } finally server.stop(0)
  }

  test("empty discovery short-circuits (P4)") {
    val src = Files.createTempDirectory("graft-pipe-empty").toString
    Files.createDirectories(Paths.get(src, "Nothing"))
    val res = TransferPipeline.run(spark,
      Seq(SourceFolderCfg("Nothing", "S", "lh/x", null, null)),
      new TransferPipeline.LocalDirListing(src),
      new Archive.LocalFileOps(src, src), clock)
    assert(res.isEmpty)
  }

  test("malformed config fails fast (C5/P7)") {
    intercept[IllegalArgumentException] {
      TransferPipeline.run(spark, Seq.empty,
        new TransferPipeline.LocalDirListing("/tmp"),
        new Archive.LocalFileOps("/tmp", "/tmp"), clock)
    }
    intercept[IllegalArgumentException] {
      TransferPipeline.run(spark,
        Seq(SourceFolderCfg("F", "S", null, null, null)),
        new TransferPipeline.LocalDirListing("/tmp"),
        new Archive.LocalFileOps("/tmp", "/tmp"), clock)
    }
  }
}
