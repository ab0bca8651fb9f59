package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import scala.collection.mutable

/** Minimal Delta-Lake transaction log (`_delta_log/`) alongside
  * [[BronzeMerge]]'s private manifest, so the reference's one named
  * sink — a Lakehouse **Delta** table (`/root/reference/config.py:16`,
  * `README.md:129-138`) — is readable by an EXTERNAL Delta client,
  * not only by this library. Follows the public Delta transaction
  * protocol (delta.io PROTOCOL.md): one `NNNNNNNNNNNNNNNNNNNN.json`
  * per version, newline-delimited action objects —
  * `protocol` (version 0), `metaData` (version 0 and on schema
  * evolution), `add` / `remove` file actions with sizes and
  * modification times, and a `commitInfo` provenance line.
  *
  * Design: the manifest stays the COMMIT source of truth (its CAS
  * rename is the atomicity point); the delta log is a deterministic
  * MIRROR derived from it by [[sync]]. Sync is idempotent and
  * self-healing: a crash between manifest commit and log write just
  * leaves the log lagging, and the next sync backfills every missing
  * version (diffing consecutive manifests batch-by-batch). If an old
  * manifest was vacuumed before its log version could be written, the
  * gap versions are filled with empty `commitInfo` commits and the
  * final version carries the cumulative diff — replay still lands on
  * exactly the current snapshot (Delta's own "log replay" contract).
  *
  * Scale notes (100 TB): sync appends O(changed files) JSON per
  * commit — the same cost Delta's own writers pay. Replay cost is
  * bounded the way Delta itself bounds it: every
  * [[CheckpointInterval]] commits, sync writes a PARQUET CHECKPOINT
  * (`NNN.checkpoint.parquet`, one row per action with the protocol /
  * metaData / add struct columns the Delta protocol specifies) plus
  * the `_last_checkpoint` pointer, and [[state]] replays
  * checkpoint + JSON tail instead of the whole history. JSON commits
  * at or below a checkpoint become redundant for HEAD reads and can
  * be reclaimed with [[cleanObsoleteLogs]] (forfeiting JSON-replay
  * time travel below the checkpoint — Delta's own log-retention
  * trade). [[BronzeMerge]] callers still read through the manifest
  * (O(1) version file) and never replay; the log is the interop
  * surface.
  */
object DeltaLog {

  val LogDirName = "_delta_log"

  /** Write a parquet checkpoint every this many commits (Delta's own
    * default cadence). */
  val CheckpointInterval = 10

  /** One live data file in the replayed state. */
  final case class AddFile(path: String, size: Long, modificationTime: Long)

  private def logDir(table: String) = new Path(table, LogDirName)

  private def logFile(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.json")

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  private val mapper = new ObjectMapper()

  /** Highest delta version present in the log — JSON commits or a
    * checkpoint that outlives cleaned-up JSON; -1 when none. */
  def latestLogVersion(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    val dir = logDir(table)
    if (!f.exists(dir)) -1L
    else {
      val vs = f.listStatus(dir).map(_.getPath.getName)
        .filter(_.matches("\\d{20}\\.json"))
      val jsonMax =
        if (vs.isEmpty) -1L else vs.map(_.stripSuffix(".json").toLong).max
      math.max(jsonMax, lastCheckpoint(f, table).getOrElse(-1L))
    }
  }

  private def checkpointFile(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.checkpoint.parquet")

  /** Version in `_last_checkpoint`, if present and its parquet file
    * still exists. */
  private def lastCheckpoint(f: FileSystem, table: String): Option[Long] = {
    val ptr = new Path(logDir(table), "_last_checkpoint")
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      scala.util.Try(mapper.readTree(content).get("version").asLong())
        .toOption.filter(v => f.exists(checkpointFile(table, v)))
    }
  }

  // checkpoint row layout per the Delta protocol: one action per row,
  // nullable struct columns (txn omitted: this writer issues none;
  // remove tombstones omitted: vacuum here is manifest-driven)
  private[graft] final case class CpFormat(provider: String,
      options: Map[String, String])
  private[graft] final case class CpMetaData(id: String, format: CpFormat,
      schemaString: String, partitionColumns: Seq[String],
      configuration: Map[String, String], createdTime: Long)
  private[graft] final case class CpProtocol(minReaderVersion: Int,
      minWriterVersion: Int)
  private[graft] final case class CpAdd(path: String,
      partitionValues: Map[String, String], size: Long,
      modificationTime: Long, dataChange: Boolean)
  private[graft] final case class CpRow(protocol: Option[CpProtocol],
      metaData: Option[CpMetaData], add: Option[CpAdd])

  /** Write the parquet checkpoint of the log state at `v` plus the
    * `_last_checkpoint` pointer. Idempotent; the checkpoint is ONE
    * parquet file named per the protocol so an external reader finds
    * it from the pointer alone. Returns false (no-op) when the log at
    * `v` carries no metaData yet — the vacuumed-gap backfill writes
    * filler commits whose state is uncheckpointable, and a skipped
    * optimization must never fail a commit that already landed. */
  def writeCheckpoint(spark: SparkSession, table: String,
      v: Long): Boolean = {
    import spark.implicits._
    val f = fs(spark, table)
    val target = checkpointFile(table, v)
    val written: Option[Long] =
      if (f.exists(target)) None
      else {
        val (files, schemaOpt) = state(spark, table, Some(v))
        val schema = schemaOpt.getOrElse(return false)
        val rows =
          CpRow(Some(CpProtocol(1, 2)), None, None) +:
          CpRow(None, Some(CpMetaData(
            java.util.UUID.nameUUIDFromBytes(table.getBytes("UTF-8")).toString,
            CpFormat("parquet", Map.empty), schema.json, Seq.empty,
            Map.empty, System.currentTimeMillis())), None) +:
          files.map(a => CpRow(None, None,
            Some(CpAdd(a.path, Map.empty, a.size, a.modificationTime,
              dataChange = false))))
        // spark writes a directory; the protocol wants ONE
        // exactly-named file — stage (writer-unique dir), then move
        // the single part file into place
        val tmpDir = new Path(logDir(table),
          f".cp-tmp-$v%020d-${java.util.UUID.randomUUID()}")
        rows.toDS().coalesce(1).write
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(tmpDir.toString)
        val part = f.listStatus(tmpDir).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"checkpoint staging produced no parquet part under $tmpDir"))
        if (!f.rename(part, target) && !f.exists(target))
          throw new IllegalStateException(
            s"checkpoint rename failed: $target")
        f.delete(tmpDir, true)
        Some(rows.length.toLong)
      }
    // pointer last: a crash before this line leaves a valid orphan
    // checkpoint that the next writeCheckpoint call re-points. The
    // pointer swap is a writer-unique temp + atomic OVERWRITE rename
    // (the BronzeMerge.flipPointer pattern): there is NO window where
    // `_last_checkpoint` is absent or partial — a delete-then-rename
    // here would strand the table unreadable if the JSON history
    // below the checkpoint was already cleaned.
    val nActions = written.getOrElse(
      spark.read.parquet(target.toString).count())
    atomicOverwrite(spark, logDir(table), "_last_checkpoint",
      s"""{"version":$v,"size":$nActions}\n""")
    true
  }

  /** Publish `content` at `dir/name` via writer-unique temp + atomic
    * OVERWRITE rename — readers always see a complete old or new
    * file, never absence or a partial write. */
  private def atomicOverwrite(spark: SparkSession, dir: Path,
      name: String, content: String): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dir.toUri, spark.sessionState.newHadoopConf())
    val tmp = new Path(dir, s".$name-${java.util.UUID.randomUUID()}.tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(content.getBytes("UTF-8")) finally out.close()
    fc.rename(tmp, new Path(dir, name),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Drop JSON commits at or below the current checkpoint — Delta's
    * log-retention cleanup. HEAD reads are unaffected (checkpoint +
    * tail); JSON-replay time travel BELOW the checkpoint is forfeited,
    * like any expired Delta log. Returns the deleted file names. */
  def cleanObsoleteLogs(spark: SparkSession, table: String): Seq[String] = {
    val f = fs(spark, table)
    lastCheckpoint(f, table) match {
      case None => Seq.empty
      case Some(cp) =>
        f.listStatus(logDir(table)).map(_.getPath).toSeq
          .filter { p =>
            p.getName.matches("\\d{20}\\.json") &&
              p.getName.stripSuffix(".json").toLong <= cp
          }
          .sortBy(_.getName)
          .map { p => f.delete(p, false); p.getName }
    }
  }

  /** Data files of a committed batch directory, as (relative path,
    * size, mtime) — parquet parts only, never `_SUCCESS`/stats
    * sidecars. */
  private def batchFiles(f: FileSystem, table: String,
      batch: String): Seq[AddFile] = {
    val dir = new Path(table, batch)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map(s => AddFile(s"$batch/${s.getPath.getName}", s.getLen,
        s.getModificationTime))
  }

  /** Replay the log through `version` (inclusive; None = latest):
    * (live files, table schema from the latest metaData). Starts from
    * the newest usable parquet checkpoint ≤ `version` and replays only
    * the JSON tail — full-history JSON replay happens only for time
    * travel below the checkpoint (valid while those commits survive
    * [[cleanObsoleteLogs]]). */
  def state(spark: SparkSession, table: String,
      version: Option[Long] = None): (Seq[AddFile], Option[StructType]) = {
    val f = fs(spark, table)
    val top = version.getOrElse(latestLogVersion(spark, table))
    val live = mutable.LinkedHashMap[String, AddFile]()
    var schema: Option[StructType] = None
    var v = 0L
    lastCheckpoint(f, table).filter(_ <= top).foreach { cp =>
      spark.read.parquet(checkpointFile(table, cp).toString)
        .collect().foreach { row =>
          val addIdx = row.fieldIndex("add")
          val mdIdx = row.fieldIndex("metaData")
          if (!row.isNullAt(addIdx)) {
            val a = row.getStruct(addIdx)
            val add = AddFile(a.getAs[String]("path"),
              a.getAs[Long]("size"), a.getAs[Long]("modificationTime"))
            live(add.path) = add
          } else if (!row.isNullAt(mdIdx)) {
            schema = Some(DataType.fromJson(
              row.getStruct(mdIdx).getAs[String]("schemaString"))
              .asInstanceOf[StructType])
          }
        }
      v = cp + 1
    }
    while (v <= top) {
      val p = logFile(table, v)
      require(f.exists(p), s"delta log version $v missing at ${logDir(table)}")
      val in = f.open(p)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.linesIterator.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("add")) {
          val a = node.get("add")
          val path = a.get("path").asText()
          live(path) = AddFile(path, a.get("size").asLong(),
            a.get("modificationTime").asLong())
        } else if (node.has("remove")) {
          live.remove(node.get("remove").get("path").asText())
        } else if (node.has("metaData")) {
          schema = Some(DataType.fromJson(
            node.get("metaData").get("schemaString").asText())
            .asInstanceOf[StructType])
        }
      }
      v += 1
    }
    (live.values.toSeq, schema)
  }

  /** Read the table the way an external Delta client would: resolve
    * the live file set and schema purely from the log — never from
    * the manifest — and scan exactly those parquet files. `version`
    * time-travels (`VERSION AS OF`). */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val (files, schemaOpt) = state(spark, table, version)
    val schema = schemaOpt.getOrElse(throw new IllegalStateException(
      s"no metaData action in the delta log at $table"))
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .parquet(files.map(a => s"$table/${a.path}"): _*)
  }

  /** Bring `_delta_log/` up to the manifest's current version; returns
    * the latest delta version after sync (-1 on an empty table).
    * Manifest version N ↔ delta version N−1 (Delta counts from 0).
    * Idempotent; safe to call after every commit and after crashes. */
  def sync(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    val (cur, curBatches) = BronzeMerge.currentCommit(spark, table)
    if (cur == 0) return -1L
    val target = cur - 1L
    val logged = latestLogVersion(spark, table)
    if (logged >= target) return logged

    // running state: what the log says is live just before the first
    // version we are about to write (empty log → empty state)
    val (liveFiles, loggedSchema) =
      if (logged < 0) (Seq.empty[AddFile], None)
      else state(spark, table, Some(logged))
    val live = mutable.LinkedHashMap[String, AddFile]()
    liveFiles.foreach(a => live(a.path) = a)
    var schema: Option[StructType] = loggedSchema

    def batchesOf(files: Iterable[AddFile]): Set[String] =
      files.map(_.path.takeWhile(_ != '/')).toSet

    var v = logged + 1
    while (v <= target) {
      val manifestVersion = (v + 1).toInt
      // the batch list this delta version must land on; None when the
      // intermediate manifest was vacuumed (filler commit, diff later)
      val desired: Option[Seq[String]] =
        if (manifestVersion == cur) Some(curBatches)
        else scala.util.Try(
          BronzeMerge.commitAt(spark, table, manifestVersion)).toOption
      val lines = mutable.Buffer[String]()
      if (v == 0)
        lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      desired match {
        case None =>
          lines += commitInfoJson(v, "SKIPPED (manifest vacuumed)")
        case Some(batches) =>
          val have = batchesOf(live.values)
          val want = batches.toSet
          val removed = live.values.toSeq
            .filterNot(a => want.contains(a.path.takeWhile(_ != '/')))
          val addedBatches = batches.filterNot(have.contains)
          val added = addedBatches.flatMap(b => batchFiles(f, table, b))
          // schema: evolution here is ADDITIVE (bronze batches only
          // ever introduce columns), so per-commit cost is the
          // footers of the ADDED batches merged onto the logged
          // schema — never a rescan of every live batch (O(changed
          // files), the streaming hot path's bound). The full
          // mergeSchema scan happens exactly once: the first commit
          // that establishes metaData.
          val newSchema = (schema, addedBatches) match {
            case (s0, Nil) => s0
            case (None, _) if batches.nonEmpty =>
              Some(spark.read.option("mergeSchema", "true")
                .parquet(batches.map(b => s"$table/$b"): _*).schema)
            case (Some(prev), adds) =>
              val addSch = spark.read.option("mergeSchema", "true")
                .parquet(adds.map(b => s"$table/$b"): _*).schema
              val known = prev.fieldNames.toSet
              Some(StructType(
                prev.fields ++ addSch.fields.filterNot(fd =>
                  known.contains(fd.name))))
            case (s0, _) => s0
          }
          if (newSchema.isDefined && newSchema.map(_.json) != schema.map(_.json)) {
            lines += metaDataJson(table, newSchema.get)
            schema = newSchema
          }
          removed.foreach { a =>
            live.remove(a.path)
            lines += removeJson(a)
          }
          added.foreach { a =>
            live(a.path) = a
            lines += addJson(a)
          }
          lines += commitInfoJson(v, "WRITE")
      }
      writeVersion(f, table, v, lines.toSeq)
      // Delta's checkpoint cadence: bound replay (and this sync's own
      // restart cost) to checkpoint + a ≤interval JSON tail
      if ((v + 1) % CheckpointInterval == 0) writeCheckpoint(spark, table, v)
      v += 1
    }
    target
  }

  private def commitInfoJson(v: Long, op: String): String = {
    val root = mapper.createObjectNode()
    val ci = root.putObject("commitInfo")
    ci.put("timestamp", System.currentTimeMillis())
    ci.put("operation", op)
    ci.put("engineInfo", "graft-bronze")
    mapper.writeValueAsString(root)
  }

  private def metaDataJson(table: String, schema: StructType): String = {
    val root = mapper.createObjectNode()
    val md = root.putObject("metaData")
    // deterministic table id: rewriting the log yields the same id
    md.put("id", java.util.UUID
      .nameUUIDFromBytes(table.getBytes("UTF-8")).toString)
    val fmt = md.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    md.put("schemaString", schema.json)
    md.putArray("partitionColumns")
    md.putObject("configuration")
    md.put("createdTime", System.currentTimeMillis())
    mapper.writeValueAsString(root)
  }

  private def addJson(a: AddFile): String = {
    val root = mapper.createObjectNode()
    val add = root.putObject("add")
    putFile(add, a)
    add.put("modificationTime", a.modificationTime)
    add.put("dataChange", true)
    mapper.writeValueAsString(root)
  }

  private def removeJson(a: AddFile): String = {
    val root = mapper.createObjectNode()
    val rm = root.putObject("remove")
    putFile(rm, a)
    rm.put("deletionTimestamp", System.currentTimeMillis())
    rm.put("dataChange", true)
    mapper.writeValueAsString(root)
  }

  private def putFile(node: ObjectNode, a: AddFile): Unit = {
    node.put("path", a.path)
    node.putObject("partitionValues")
    node.put("size", a.size)
  }

  /** Temp + rename, mirroring the manifest CAS. Concurrent syncers
    * race benignly: the content of any version is deterministic from
    * the manifests, so an already-present target is SUCCESS, not
    * conflict. The temp name is WRITER-UNIQUE and created without
    * overwrite — a shared temp would let writer A publish writer B's
    * half-written bytes as the committed version file. */
  private def writeVersion(f: FileSystem, table: String, v: Long,
      lines: Seq[String]): Unit = {
    val dir = logDir(table)
    f.mkdirs(dir)
    val target = logFile(table, v)
    if (f.exists(target)) return
    val tmp = new Path(dir,
      f".tmp-$v%020d-${java.util.UUID.randomUUID()}.json")
    val out = f.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, target)) {
      f.delete(tmp, true)
      require(f.exists(target),
        s"delta log write failed for version $v at $dir")
    }
  }
}
