package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's remote file
  * catalog (SURVEY §2.1 S5 — the Graph folder-children listing,
  * `sharepoint_to_bronze_delta.py:72-77`) as a first-class Spark
  * source. Offline, the "service" is a deterministic generator
  * (options `folders`, `filesPerFolder`); swap the generator for Graph
  * HTTP calls and the planning surface is unchanged.
  *
  * What it fixes vs the reference, by construction:
  *  - one InputPartition PER FOLDER → listings run in parallel on
  *    executors (the reference lists sequentially on the driver);
  *  - `SupportsPushDownFilters` on `folder_name` → unrequested folders
  *    are never listed at all (the reference lists then drops);
  *  - `SupportsPushDownRequiredColumns` → only referenced columns are
  *    materialized (the reference always builds full rows);
  *  - `SupportsPushDownLimit` (PARTIAL push: per-partition cap, Spark
  *    keeps the global limit) → the reference's "first drive" pattern
  *    (filter + limit 1, `sharepoint_to_bronze_delta.py:66`) stops
  *    remote pagination after one page instead of listing everything;
  *  - pagination lives inside the reader, so `@odata.nextLink`
  *    truncation (a real reference bug, SURVEY §7.4) can't recur.
  *
  * Usage: `spark.read.format("graph-items").option("folders", 8)
  *   .option("filesPerFolder", 100).load()`
  */
class GraphCatalogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graph-items"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraphCatalogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraphItemsTable(
      properties.getOrDefault("folders", "4").toInt,
      properties.getOrDefault("filesPerFolder", "25").toInt,
      properties.getOrDefault("pageSize", "10").toInt)
}

object GraphCatalogSource {
  val Schema: StructType = StructType(Seq(
    StructField("folder_name", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("file_mime", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("download_url", StringType, nullable = false)))

  def folderName(f: Int): String = s"folder_$f"
  /** Deterministic fixture content — mirrored by the DuckDB oracle. */
  def fileSize(f: Int, j: Int): Long = (f * 31 + j * 7) % 1000
  /** Deterministic mime variety so a mime predicate actually prunes:
    * items cycle csv → pdf → png by index. */
  val Mimes: Seq[String] = Seq("text/csv", "application/pdf", "image/png")
  def fileMime(j: Int): String = Mimes(j % Mimes.size)
  def fileExt(j: Int): String =
    Seq("csv", "pdf", "png")(j % Mimes.size)

  /** One page of a folder listing: first item index, item count, and
    * the continuation token for the next page — the offline stand-in
    * for Graph's `@odata.nextLink` (an opaque URL there, an opaque int
    * here; the reader must treat "token present" as "more pages",
    * which is exactly the contract the reference's listing loop broke
    * by reading only the first response, SURVEY §7.4). */
  final case class Page(start: Int, count: Int, next: Option[Int])

  /** Test-visible instrumentation: pages served since last reset. */
  val pagesServed = new java.util.concurrent.atomic.AtomicLong(0)

  /** The paginated "service" call. Deterministic; never returns more
    * than `pageSize` items. */
  def listPage(files: Int, pageSize: Int, token: Int): Page = {
    pagesServed.incrementAndGet()
    val n = math.max(0, math.min(pageSize, files - token))
    val nextTok = token + n
    Page(token, n, if (n > 0 && nextTok < files) Some(nextTok) else None)
  }
}

private class GraphItemsTable(folders: Int, filesPerFolder: Int,
    pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"graph_items($folders x $filesPerFolder)"
  override def schema(): StructType = GraphCatalogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraphItemsScanBuilder(folders, filesPerFolder, pageSize)
}

private class GraphItemsScanBuilder(folders: Int, filesPerFolder: Int,
    pageSize: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var required: StructType = GraphCatalogSource.Schema
  private var keptFolders: Option[Set[String]] = None // None = all
  private var keptMimes: Option[Set[String]] = None   // None = all
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var countPushed = false

  // COMPLETE aggregate push for a group-less COUNT(*): the Graph API
  // answers `$count=true` from its index without enumerating items —
  // modeled here by computing the listing cardinality arithmetically
  // (it composes with the pushed folder/mime filters) and serving ONE
  // row from ONE partition, zero pages fetched. `df.count()` on a
  // remote catalog then costs one metadata call instead of paging the
  // tenant. Grouped/other aggregates and limit interplay are refused
  // → Spark falls back to the row scan, which stays correct.
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && limit.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    countPushed = true
    required = new StructType().add("count", LongType, nullable = false)
    true
  }

  // PARTIAL limit push: each partition (folder) stops listing after
  // `limit` items — a `limit 1` fetches one page, not the tenant.
  // Partial because partitions are independent; Spark keeps its global
  // limit to trim across folders.
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = true

  // folder_name predicates prune whole listings at the source;
  // file_mime predicates prune items inside a listing (the real Graph
  // API accepts both as `$filter` terms); other filters stay with
  // Spark (we return them as "not pushed").
  // The incoming array is a CONJUNCTION: a pushed filter is removed
  // from Spark's post-scan evaluation, so each accepted filter must
  // INTERSECT its kept set — unioning would turn
  // `folder_name = 'a' AND folder_name IN ('a','b')` into a superset.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("folder_name" | "file_mime", _: String) => true
      case In("folder_name" | "file_mime", _)              => true
      case _                                               => false
    }
    pushed = ours
    ours.foreach { f =>
      def vals(f: Filter): Set[String] = f match {
        case EqualTo(_, v: String) => Set(v)
        case In(_, xs)             => xs.collect { case s: String => s }.toSet
        case _                     => Set.empty // unreachable (partition above)
      }
      f match {
        case EqualTo("folder_name", _) | In("folder_name", _) =>
          keptFolders = Some(keptFolders.fold(vals(f))(_ intersect vals(f)))
        case _ =>
          keptMimes = Some(keptMimes.fold(vals(f))(_ intersect vals(f)))
      }
    }
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graph-items folders=${keptFolders.fold("*")(_.mkString(","))} " +
        s"mimes=${keptMimes.fold("*")(_.mkString(","))} " +
        s"cols=${required.fieldNames.mkString(",")}" +
        limit.fold("")(l => s" limit=$l") +
        (if (countPushed) " agg=count-pushed" else "")

    override def planInputPartitions(): Array[InputPartition] = {
      val keptFolderIdx = (0 until folders)
        .filter(f => keptFolders.forall(_.contains(
          GraphCatalogSource.folderName(f))))
      if (countPushed) {
        // the remote index answers the cardinality; no listing happens
        val perFolder = (0 until filesPerFolder).count(j =>
          keptMimes.forall(_.contains(GraphCatalogSource.fileMime(j))))
        Array(GraphCountPartition(keptFolderIdx.size.toLong * perFolder))
      } else keptFolderIdx
        .map(f => GraphFolderPartition(f, filesPerFolder, pageSize,
          limit, keptMimes): InputPartition)
        .toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      if (countPushed) new GraphCountReaderFactory
      else new GraphItemsReaderFactory(required)
  }
}

private case class GraphCountPartition(count: Long) extends InputPartition

private class GraphCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val n = p.asInstanceOf[GraphCountPartition].count
      private var served = false
      override def next(): Boolean = { val r = !served; served = true; r }
      override def get(): InternalRow = InternalRow(n)
      override def close(): Unit = ()
    }
}

private case class GraphFolderPartition(folder: Int, files: Int,
    pageSize: Int, limit: Option[Int] = None,
    mimes: Option[Set[String]] = None) extends InputPartition

private class GraphItemsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraphFolderPartition]
    new PartitionReader[InternalRow] {
      // Pagination is OWNED BY THE READER: drain the current page,
      // then follow the continuation token until the service stops
      // returning one — rows stream through `next()/get()` so a
      // million-item folder never materializes in one buffer. This is
      // the @odata.nextLink loop the reference's listing lacked.
      private var page = GraphCatalogSource.listPage(gp.files, gp.pageSize, 0)
      private var off = -1     // offset within the current page
      private var j = 0        // absolute item index = page.start + off
      private var emitted = 0  // pushed-limit budget consumed
      override def next(): Boolean = {
        // pushed limit: stop CONSUMING — and, crucially, stop
        // requesting further pages from the remote service. The limit
        // budget counts EMITTED (post-mime-filter) rows: a pushed
        // filter is gone from Spark's evaluation, so `limit` must be
        // satisfied by surviving rows, not raw listings.
        if (gp.limit.exists(emitted >= _)) return false
        while (true) {
          off += 1
          while (off >= page.count) {
            page.next match {
              case Some(tok) =>
                page = GraphCatalogSource.listPage(gp.files, gp.pageSize, tok)
                off = 0
              case None => return false
            }
          }
          j = page.start + off
          // pushed mime predicate: drop non-matching items here (the
          // remote-$filter stand-in — Spark will not re-check)
          if (gp.mimes.forall(_.contains(GraphCatalogSource.fileMime(j)))) {
            emitted += 1
            return true
          }
        }
        false // unreachable
      }
      override def get(): InternalRow = {
        val fn = GraphCatalogSource.folderName(gp.folder)
        val full: Map[String, Any] = Map(
          "folder_name" -> UTF8String.fromString(fn),
          "name" -> UTF8String.fromString(
            s"${fn}_doc_$j.${GraphCatalogSource.fileExt(j)}"),
          "file_mime" ->
            UTF8String.fromString(GraphCatalogSource.fileMime(j)),
          "size" -> GraphCatalogSource.fileSize(gp.folder, j),
          "download_url" ->
            UTF8String.fromString(s"https://graph.example/$fn/doc_$j"))
        InternalRow.fromSeq(required.fieldNames.toSeq.map(full))
      }
      override def close(): Unit = ()
    }
  }
}
