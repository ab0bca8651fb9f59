package graft.pipeline

import graft.archive.Archive
import graft.model.{FileMeta, SourceFolderCfg}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.time.Instant

/** The engine's top-level orchestrator — the drop-in equivalent of the
  * reference's `TransferFromSharepoint(config, spark).process_files()`
  * (`sharepoint_to_bronze_delta.py:237-277`, lifecycle traced in
  * SURVEY §3.1), re-expressed as one declarative catalog query plus a
  * distributed side-effect stage:
  *
  *  1. validate config (C5/P7 fail-fast, `:247-259`);
  *  2. build the file catalog: listing ⨝ folder-config (broadcast),
  *     file-facet filter, 7-column projection (S5+P1+P2+P3+J3, §3.2);
  *  3. empty short-circuit (P4, `:200-202`);
  *  4. per-folder + total counts (A1/A2, logged relation);
  *  5. execute upload→archive→delete per file with the C2/C3 error
  *     isolation and gating — distributed via [[Archive.run]].
  *
  * `ListingProvider` abstracts the remote catalog (Graph over HTTPS in
  * production, a local directory or fixtures offline) exactly where
  * the reference holds its `SharePointService`.
  */
object TransferPipeline {

  /** One discovered item (pre-catalog shape): file facet nullable like
    * the Graph response (folders have none). */
  final case class Listed(folder_name: String, name: String,
      file_mime: String, size: java.lang.Long)

  trait ListingProvider extends Serializable {
    /** List children of one configured folder (S5). Pagination is the
      * provider's job — no silent single-page truncation here. */
    def list(folder: String): Seq[Listed]
  }

  /** Local-directory provider: each configured folder is a subdir. */
  final class LocalDirListing(root: String) extends ListingProvider {
    override def list(folder: String): Seq[Listed] = {
      val dir = new java.io.File(root, folder)
      Option(dir.listFiles()).toSeq.flatten.sortBy(_.getName).map { f =>
        Listed(folder, f.getName,
          if (f.isFile) "application/octet-stream" else null,
          if (f.isFile) f.length() else null)
      }
    }
  }

  final case class Result(
      catalog: Dataset[FileMeta],
      folderCounts: DataFrame,
      manifest: Dataset[Archive.ManifestRow])

  /** Run the full transfer. Returns the catalog, the per-folder count
    * relation, and the per-file manifest (all lazily re-runnable). */
  def run(spark: SparkSession, folders: Seq[SourceFolderCfg],
      listing: ListingProvider, ops: Archive.FileOps,
      clock: Instant = Instant.now()): Option[Result] = {
    import spark.implicits._
    validate(folders)
    // provider path: list exactly the configured folders
    val listed = folders.flatMap(f => listing.list(f.folder_name)).toDS.toDF()
    finish(spark, folders, listed, ops, clock)
  }

  /** Run the full transfer over an ALREADY-PLANNED listing relation —
    * the DSv2 seam: pass `spark.read.format("graph-items")….load()`
    * (or any relation carrying `folder_name`/`name`/`file_mime`
    * columns) and the catalog query COMPOSES onto the scan, so the
    * configured-folder predicate pushes down into the connector
    * (unconfigured folders are never listed remotely — PipelineSpec
    * pins the page counter) and column pruning drops whatever the
    * 7-column projection does not need. This is the production
    * wiring: DSv2 catalog scan → broadcast config join →
    * [[Archive.run]] lifecycle. */
  def runWithListing(spark: SparkSession, folders: Seq[SourceFolderCfg],
      listed: DataFrame, ops: Archive.FileOps,
      clock: Instant = Instant.now()): Option[Result] = {
    validate(folders)
    // the isin lands in the DSv2 scan as a pushed In-filter (S5's
    // "list only what the config names"), not a post-scan predicate
    finish(spark, folders,
      listed.filter(
        col("folder_name").isin(folders.map(_.folder_name): _*)),
      ops, clock)
  }

  /** C5/P7: fail fast on malformed config before any work. */
  private def validate(folders: Seq[SourceFolderCfg]): Unit = {
    require(folders.nonEmpty, "source_folder_list must not be empty")
    folders.foreach { f =>
      require(f.folder_name != null && f.folder_name.nonEmpty,
        "folder_name is required for every source folder") // P3
      require(f.lakehouse_folder != null && f.lakehouse_folder.nonEmpty,
        s"lakehouse_folder is required (folder ${f.folder_name})")
    }
  }

  /** The shared catalog query + lifecycle tail of both entry points. */
  private def finish(spark: SparkSession, folders: Seq[SourceFolderCfg],
      listed: DataFrame, ops: Archive.FileOps,
      clock: Instant): Option[Result] = {
    import spark.implicits._
    val cfg = folders.toDS.toDF()
    val catalog = listed
      .filter(col("file_mime").isNotNull)                       // P1
      .join(broadcast(cfg), "folder_name")                      // J3
      .select(                                                  // P2/P3
        col("name").as("file_name"),
        col("folder_name"), col("site_name"),
        concat_ws("/", col("folder_name"), col("name")).as("file_url"),
        col("lakehouse_folder"),
        coalesce(col("copy_to_archive"), lit("False")).as("copy_to_archive"),
        coalesce(col("delete_original"), lit("False")).as("delete_original"))
      .as[FileMeta]

    if (catalog.isEmpty) None                                   // P4
    else {
      val counts = catalog.toDF()
        .rollup(col("folder_name"))                             // A1/A2
        .agg(count(lit(1)).as("n_files"))
      val manifest = Archive.run(catalog, ops, clock)(spark)
      Some(Result(catalog, counts, manifest))
    }
  }
}
