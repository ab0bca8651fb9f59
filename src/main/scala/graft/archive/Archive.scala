package graft.archive

import graft.model.FileMeta
import org.apache.spark.sql.{Dataset, SparkSession}
import java.time.{Instant, ZoneId}
import java.time.format.DateTimeFormatter

/** Post-ingest archive/delete state machine — the reference's
  * per-file execute phase (`sharepoint_to_bronze_delta.py:206-233`)
  * with its ordering invariants made explicit:
  *
  *   upload → [copy_to_archive?] archive → [delete_original?] delete
  *
  *  - per-file error isolation: a failed upload skips that file only
  *    (C2, `:213-219`);
  *  - delete is STRICTLY gated on archive success (C3, `:227-231`) —
  *    a failed archive never loses the original;
  *  - flags use the reference's stringly semantics
  *    (`lower(x) == "true"`, `:222,229`);
  *  - archive names carry the `ddMMyyHHmmss_` prefix in
  *    Asia/Kuala_Lumpur wall time (F2, `:189-191`), clock injectable
  *    for tests;
  *  - at-least-once: re-runs overwrite uploads by name and create new
  *    timestamped archive copies (C4, `:174,190`).
  *
  * Side effects run in `mapPartitions` on executors (the reference
  * loops on the driver, one file at a time — SURVEY §4), so transfer
  * parallelism is the partition count, and the returned manifest is a
  * normal Dataset the caller can audit/quarantine from.
  */
object Archive {

  private val ArchiveTz = ZoneId.of("Asia/Kuala_Lumpur")
  private val Fmt = DateTimeFormatter.ofPattern("ddMMyyHHmmss")

  /** F1: quote sanitization (`:208`). */
  def sanitize(name: String): String = name.replace('\'', '_')

  /** F2: timestamped archive name (`:189-191`). */
  def archiveName(name: String, clock: Instant): String =
    Fmt.format(clock.atZone(ArchiveTz)) + "_" + sanitize(name)

  /** P6: the reference's stringly-boolean parse (`:222,229`). */
  def flagIsTrue(flag: String): Boolean =
    flag != null && flag.toLowerCase == "true"

  /** Effectful file operations, injectable so the pipeline is testable
    * (and swappable for a Graph/OneLake-backed impl). Implementations
    * must be Serializable — they run inside executor tasks. */
  trait FileOps extends Serializable {
    def upload(meta: FileMeta): Unit
    def ensureArchiveDir(meta: FileMeta): Unit
    def archiveCopy(meta: FileMeta, archivedName: String): Unit
    def deleteOriginal(meta: FileMeta): Unit
  }

  /** One manifest row per catalog file: what happened, in order. */
  final case class ManifestRow(
      file_name: String,
      folder_name: String,
      uploaded: Boolean,
      archived: Boolean,
      deleted: Boolean,
      error: String)

  /** Run the per-file state machine over the catalog, distributed. */
  def run(catalog: Dataset[FileMeta], ops: FileOps, clock: Instant)
      (implicit spark: SparkSession): Dataset[ManifestRow] = {
    import spark.implicits._
    val clockMs = clock.toEpochMilli // Instant is serializable, but pin
    catalog.mapPartitions { files =>
      val now = Instant.ofEpochMilli(clockMs)
      files.map { f =>
        var uploaded, archived, deleted = false
        var error: String = null
        try {
          ops.upload(f)
          uploaded = true
          if (flagIsTrue(f.copy_to_archive)) {
            try {
              ops.ensureArchiveDir(f)
              ops.archiveCopy(f, archiveName(f.file_name, now))
              archived = true
              if (flagIsTrue(f.delete_original)) {
                ops.deleteOriginal(f)
                deleted = true
              }
            } catch {
              // C3: archive failure is logged, original retained,
              // pipeline proceeds
              case e: Exception => error = s"archive: ${e.getMessage}"
            }
          }
        } catch {
          // C2: upload failure skips this file only
          case e: Exception => error = s"upload: ${e.getMessage}"
        }
        ManifestRow(f.file_name, f.folder_name,
          uploaded, archived, deleted, error)
      }
    }
  }

  /** Local-filesystem FileOps over java.nio (the offline stand-in for
    * the reference's Graph download + `mssparkutils.fs.cp` upload).
    * Paths: src = `srcRoot/folder/file`, bronze = `bronzeRoot/
    * lakehouse_folder/file`, archive = `srcRoot/folder/archive/`. */
  class LocalFileOps(srcRoot: String, bronzeRoot: String)
      extends FileOps {
    import java.nio.file.{Files, Paths, StandardCopyOption}

    private def src(f: FileMeta) =
      Paths.get(srcRoot, f.folder_name, f.file_name)
    private def archDir(f: FileMeta) =
      Paths.get(srcRoot, f.folder_name, "archive")

    override def upload(f: FileMeta): Unit = {
      val dest = Paths.get(bronzeRoot, f.lakehouse_folder,
        sanitize(f.file_name))
      Files.createDirectories(dest.getParent)
      Files.copy(src(f), dest, StandardCopyOption.REPLACE_EXISTING)
    }
    override def ensureArchiveDir(f: FileMeta): Unit = {
      Files.createDirectories(archDir(f)) // K2, idempotent
      ()
    }
    override def archiveCopy(f: FileMeta, archivedName: String): Unit = {
      Files.copy(src(f), archDir(f).resolve(archivedName),
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    override def deleteOriginal(f: FileMeta): Unit = {
      Files.delete(src(f)) // K4: only reached after archive success
    }
  }

  /** Graph-backed FileOps over the injectable
    * [[graft.pipeline.HttpListing.WriteTransport]] — the HTTP twin of
    * [[LocalFileOps]], wiring the reference's write-side calls
    * (`sharepoint_to_bronze_delta.py:80-109`) into the same C2/C3
    * state machine:
    *
    *  - `upload`: GET `root:/{folder}/{file}:/content` (the
    *    download-then-cp at `:163-176`, collapsed to one fetch) →
    *    bytes land under `bronzeRoot/lakehouse_folder/`; the fetch
    *    runs with the 429/5xx retry policy (reads are idempotent).
    *  - `ensureArchiveDir`: GET existence check, else POST
    *    `{name, folder:{}}` to the parent's `:/children` (two-level
    *    split exactly like `:85-91`); 200/201 accepted (`:92-94`).
    *  - `archiveCopy`: POST `:/copy` with a parentReference path and
    *    the timestamped name (`:96-103`); 200/202 accepted (202 is
    *    Graph's async-copy accept).
    *  - `deleteOriginal`: DELETE the item, 204 required (`:105-109`).
    *
    * Writes are deliberately single-shot (no 429/5xx retry): `:/copy`
    * is not idempotent — a retried timeout could double-copy — and the
    * pipeline's at-least-once contract (C4) already re-archives under
    * a fresh timestamped name on re-run, matching the reference's
    * no-retry writes. 401 recovery belongs to the transport layer
    * (wrap in [[graft.pipeline.HttpListing.AuthRefreshTransport]]).
    * The drive id lives in `driveBaseUrl`
    * (`.../drives/{id}`), so payloads carry only the path reference.
    * Content downloads ride [[graft.pipeline.HttpListing
    * .HttpResponse]]'s raw-bytes surface (`bytes`), so binary
    * payloads (xlsx/pdf — the reference's typical downloads) land
    * bit-exact; bulk binary ingest still prefers the `binaryFile`
    * path ([[graft.ingest.Ingest]]), which streams instead of
    * buffering whole bodies. */
  class HttpFileOps(
      driveBaseUrl: String,
      bronzeRoot: String,
      transport: graft.pipeline.HttpListing.WriteTransport,
      policy: graft.pipeline.HttpListing.RetryPolicy =
        graft.pipeline.HttpListing.RetryPolicy(),
      sleeper: Long => Unit = Thread.sleep,
      archiveFolderOf: FileMeta => String =
        f => s"${f.folder_name}/archive",
      chunkBytes: Int = 8 << 20)
      extends FileOps {
    import graft.pipeline.HttpListing
    import java.nio.file.{Files, Paths}

    /** Percent-encode one path segment (SharePoint names routinely
      * carry spaces, '#', '%' — raw splicing would make URI.create
      * throw and the file silently un-ingestable). URLEncoder is
      * form-encoding, so its '+' must become '%20' for a path. */
    private def seg(s: String): String =
      java.net.URLEncoder
        .encode(s, java.nio.charset.StandardCharsets.UTF_8)
        .replace("+", "%20")

    /** Encode a path that may itself contain '/' separators
      * (two-level archive folders): each segment encoded, separators
      * kept. */
    private def segPath(p: String): String =
      p.split("/", -1).map(seg).mkString("/")

    /** JSON string literal with proper escaping — names with quotes
      * or backslashes must not produce malformed payloads. The mapper
      * is shared (construction is Jackson's expensive step; writes
      * are thread-safe) and transient (FileOps serializes into
      * executor tasks; each task lazily builds its own). */
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()
    private def jstr(s: String): String = mapper.writeValueAsString(s)

    private def itemUrl(f: FileMeta): String =
      s"$driveBaseUrl/root:/${segPath(f.folder_name)}/${seg(f.file_name)}"

    override def upload(f: FileMeta): Unit = {
      val dest = Paths.get(bronzeRoot, f.lakehouse_folder,
        sanitize(f.file_name))
      Files.createDirectories(dest.getParent)
      // CHUNKED range fetch → streamed file write: per-task heap is
      // O(chunkBytes) however large the blob — the fix for the
      // whole-payload envelope the reference has at `:163-171` (and
      // that a plain getWithRetry would keep, just executor-side).
      // Raw bytes throughout: xlsx/pdf payloads are not UTF-8 and a
      // String round-trip would corrupt them silently. Transports
      // without real Range support fall back to one whole-body GET
      // inside fetchTo (the 200 path) — old behavior, same bytes.
      val out = Files.newOutputStream(dest)
      try HttpListing.ChunkedTransfer.fetchTo(transport, policy,
        sleeper)(s"${itemUrl(f)}:/content", out, chunkBytes)
      finally out.close()
      ()
    }

    override def ensureArchiveDir(f: FileMeta): Unit = {
      val path = archiveFolderOf(f)
      // the probe is an idempotent read → it rides the retry policy
      // like upload()'s content GET, but through getResilient: its
      // 404 is a semantic answer ("absent"), not a failure
      val check = HttpListing.getResilient(transport, policy, sleeper)(
        s"$driveBaseUrl/root:/${segPath(path)}")
      if (check.status == 200) return // exists — idempotent (K2)
      // ONLY 404 means "absent, create it"; an unretryable or
      // retry-exhausted status must surface, not trigger a blind
      // create against a folder that may well exist
      if (check.status != 404)
        throw new RuntimeException(
          s"Archive-folder check for '$path' failed: " +
            s"${check.status} | ${check.body.take(200)}")
      val (parent, sub) = path.lastIndexOf('/') match {
        case -1 => ("", path)
        case i  => (path.substring(0, i), path.substring(i + 1))
      }
      val createUrl =
        if (parent.nonEmpty)
          s"$driveBaseUrl/root:/${segPath(parent)}:/children"
        else s"$driveBaseUrl/root/children"
      val resp = transport.post(createUrl,
        s"""{"name":${jstr(sub)},"folder":{}}""")
      // 409 nameAlreadyExists = a concurrent ensure won the race —
      // the folder exists, which is all this op promises (K2)
      if (resp.status != 200 && resp.status != 201 && resp.status != 409)
        throw new RuntimeException(
          s"Failed to create archive folder '$path': " +
            s"${resp.status} | ${resp.body.take(200)}")
    }

    override def archiveCopy(f: FileMeta, archivedName: String): Unit = {
      val payload =
        s"""{"parentReference":{"path":${jstr(
          s"/drive/root:/${archiveFolderOf(f)}")}},""" +
          s""""name":${jstr(archivedName)}}"""
      val resp = transport.post(s"${itemUrl(f)}:/copy", payload)
      if (resp.status != 200 && resp.status != 202)
        throw new RuntimeException(
          s"Failed to copy to archive. Status: ${resp.status} | " +
            resp.body.take(200))
    }

    override def deleteOriginal(f: FileMeta): Unit = {
      val resp = transport.delete(itemUrl(f))
      if (resp.status != 204)
        throw new RuntimeException(
          s"Failed to delete original file. Status: ${resp.status} | " +
            resp.body.take(200))
    }
  }
}
