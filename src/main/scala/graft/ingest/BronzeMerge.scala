package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Delta-SEMANTICS bronze table over plain parquet + a versioned
  * manifest, for environments without the Delta jars (this container
  * has none). The reference names a Lakehouse Delta table as its
  * bronze sink (`config.py:16`, README.md:129-138) but only ever
  * blind-appends; this sink supplies the semantics that actually
  * matter for its at-least-once re-runs (SURVEY C4):
  *
  *  - **Idempotent MERGE on file identity**: a file is keyed by
  *    (file_name, length, modified) — plus `source_item_id` when the
  *    ingest carries one (the reference's Graph drive-item id,
  *    `sharepoint_to_bronze_delta.py:87-109`, which both fetches and
  *    DELETEs by id); re-running the same ingest anti-joins against
  *    the committed key set and appends nothing. With the id in the
  *    key, a deleted item's retained key blocks redelivery of THAT
  *    item's blob, while a byte-identical RE-CREATE under a fresh id
  *    is a new identity and lands — the delete-then-recreate churn
  *    the name+size key could not tell apart.
  *  - **Snapshot isolation**: readers see only batch directories named
  *    by the latest commit record, so a crashed half-written batch is
  *    invisible until its commit lands (the `_delta_log` idea, one
  *    text file per version).
  *  - **Atomic commit with CAS**: version files are written to a temp
  *    name and renamed; an existing target version means a concurrent
  *    writer won — the loser fails loudly instead of corrupting.
  *
  * Scale notes (100 TB): the anti-join is executor-side against the
  * committed-keys parquet (O(files) metadata, never content); data
  * lands in fresh batch directories so no commit ever rewrites
  * existing bytes; the manifest is O(batches) text. Swap-in path: with
  * Delta jars on the classpath, `mergeIngest` becomes
  * `DeltaTable.merge(...).whenNotMatched.insertAll()` and the layout
  * below disappears — callers only see [[mergeIngest]]/[[snapshot]].
  *
  * Layout: `<table>/batch-NNNNNNNN/` (data parquet),
  * `<table>/_keys/batch-NNNNNNNN/` (identity keys of that batch),
  * `<table>/_manifest/vNNNNNNNN` (committed batch names, one/line).
  */
object BronzeMerge {

  private val KeyCols = Seq("file_name", "length", "modified")

  /** Optional source-identity column: the upstream item id (Graph
    * drive-item id in the reference). When an ingest DataFrame
    * carries it, it joins the merge key and rides into the data
    * batches, making row-level deletes id-addressable
    * ([[deleteWhere]] on `source_item_id` /
    * [[deleteMatchingKeys]]). */
  val IdCol = "source_item_id"

  /** Committed identity keys across `batches`, normalized to a fixed
    * 4-column shape: legacy id-less batches surface a null
    * `source_item_id` (parquet matches by name; `mergeSchema` unions
    * the footers so an id-carrying batch next to a legacy one still
    * reads both ids and nulls). */
  private def committedKeys(spark: SparkSession, table: String,
      batches: Seq[String]): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(batches.map(b => s"$table/_keys/$b"): _*)
    if (raw.columns.contains(IdCol)) raw
    else raw.withColumn(IdCol, lit(null).cast("string"))
  }

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(table: String) = new Path(table, "_manifest")

  /** First collision-free directory name for a commit attempt: the
    * deterministic `base` normally; a uniquified `-rXXXX` alternative
    * when a CRASHED attempt (data written, commit never reached — the
    * mid-batch-failure streaming case) or a concurrent writer left
    * the plain name occupied. The orphan stays invisible — readers
    * resolve names only through committed manifests — and [[vacuum]]
    * sweeps any `batch-*` directory the live commit doesn't name. */
  private def freshBatchName(f: FileSystem, table: String,
      base: String): String = {
    if (!f.exists(new Path(table, base))) base
    else {
      var name = ""
      do name = f"$base-r${scala.util.Random.nextInt(0x10000)}%04x"
      while (f.exists(new Path(table, name)))
      name
    }
  }

  /** Latest committed (version, batch names); (0, Nil) = empty table. */
  def currentCommit(spark: SparkSession, table: String): (Int, Seq[String]) = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) return (0, Nil)
    val versions = f.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("v\\d{8}")).sorted
    if (versions.isEmpty) (0, Nil)
    else {
      val in = f.open(new Path(dir, versions.last))
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      (versions.last.drop(1).toInt,
        content.linesIterator.filter(_.nonEmpty).toSeq)
    }
  }

  /** Committed batch names at an arbitrary version — the time-travel
    * primitive (`VERSION AS OF` in Delta terms). Batches are
    * immutable once committed, so any still-present version file
    * reproduces that snapshot exactly. */
  def commitAt(spark: SparkSession, table: String,
      version: Int): Seq[String] = {
    val f = fs(spark, table)
    val vf = new Path(manifestDir(table), f"v$version%08d")
    require(f.exists(vf),
      s"bronze version $version does not exist (vacuumed or never written)")
    val in = f.open(vf)
    val content =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    content.linesIterator.filter(_.nonEmpty).toSeq
  }

  /** Time-travel read: the table exactly as of `version`. */
  def snapshotAt(spark: SparkSession, table: String,
      version: Int): DataFrame = {
    val batches = commitAt(spark, table, version)
    spark.read.parquet(batches.map(b => s"$table/$b"): _*)
  }

  /** Compaction — the small-file answer: rewrite the current snapshot
    * into ONE new batch and commit a manifest naming only it. Old
    * batches are untouched (old versions still time-travel); reclaim
    * them with [[vacuum]]. At 100 TB this runs per-partition-range on
    * a schedule; the manifest CAS makes it safe next to live ingests
    * (a concurrent commit wins the rename and compaction fails loudly,
    * to be retried against the new version). Returns the new version.
    *
    * `clusterBy` turns compaction into `OPTIMIZE ... ZORDER BY`:
    * one column range-partitions + sorts linearly; two INT columns
    * cluster on the Morton interleave
    * ([[graft.functions.ZOrderExprs.zvalue]]) so
    * [[DataSkipping]] stats prune on both. `nFiles` spreads the
    * rewrite over that many files (each a stats pruning unit). */
  def compact(spark: SparkSession, table: String,
      clusterBy: Seq[String] = Nil, nFiles: Int = 1): Int = {
    val f = fs(spark, table)
    val (ver, batches) = currentCommit(spark, table)
    require(batches.nonEmpty, "nothing to compact")
    val batchName = freshBatchName(f, table, f"batch-${ver + 1}%08d")
    // mergeSchema on both reads: a table that gained `source_item_id`
    // mid-life mixes key/data shapes, and a single-footer inference
    // would silently drop the id column from the compacted batch
    val snap = spark.read.option("mergeSchema", "true")
      .parquet(batches.map(b => s"$table/$b"): _*)
    val clustered = clusterBy match {
      case Nil => snap.coalesce(nFiles)
      case Seq(c) => snap.repartitionByRange(nFiles, col(c))
        .sortWithinPartitions(c)
      case Seq(a, b) =>
        snap.withColumn("_z", graft.functions.ZOrderExprs.zvalue(
            col(a).cast("int"), col(b).cast("int")))
          .repartitionByRange(nFiles, col("_z"))
          .sortWithinPartitions("_z")
          .drop("_z")
      case _ => throw new IllegalArgumentException(
        "clusterBy supports 1 (linear) or 2 (z-order) columns")
    }
    clustered.write.mode(SaveMode.ErrorIfExists).parquet(s"$table/$batchName")
    committedKeys(spark, table, batches)
      .distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$table/_keys/$batchName")
    commit(f, table, ver + 1, Seq(batchName))
    DeltaLog.sync(spark, table)
    ver + 1
  }

  /** Copy-on-write row-level DELETE — the lakehouse compliance
    * primitive (Delta `DELETE FROM`). Batches with no matching rows
    * keep their name (and bytes) in the new manifest; only batches
    * that actually contain matches are rewritten without them. Old
    * versions still time-travel to the pre-delete data until
    * [[vacuum]] reclaims them — run vacuum to make the erasure
    * physical. Identity KEYS are retained on purpose: a deleted
    * file's key still blocks re-ingest, so at-least-once upstream
    * redelivery cannot resurrect deleted rows. Returns (new version,
    * rows deleted); no-op (current version, 0) when nothing matches. */
  def deleteWhere(spark: SparkSession, table: String,
      pred: org.apache.spark.sql.Column): (Int, Long) =
    copyOnWrite(spark, table) { df =>
      // a predicate may reference columns a PRE-EVOLUTION batch never
      // wrote (e.g. `source_item_id` on a batch committed before the
      // table carried ids): those read as null — no row of that batch
      // can match, same as parquet's own schema-evolution read
      val missing = org.apache.spark.sql.GraftSqlBridge.expression(pred)
        .references.map(_.name).toSeq
        .distinct.filterNot(c => df.columns.contains(c))
      val dfN = missing.foldLeft(df)((d, c) =>
        d.withColumn(c, lit(null).cast("string")))
      // SQL DELETE semantics: only a TRUE predicate deletes — a null
      // predicate row must SURVIVE the rewrite, not vanish from both
      // the match count and the survivor set
      (dfN.filter(pred), dfN.filter(not(coalesce(pred, lit(false))))
        .select(df.columns.map(col): _*))
    }

  /** Join-based row-level DELETE — [[deleteWhere]] for MASS
    * tombstones: rows whose `joinCols` tuple appears in `keys` are
    * removed. The dead keys stay a DataFrame end-to-end (anti-join,
    * never a literal `isin` list), so a deleted source FOLDER
    * carrying millions of tombstones costs one broadcast/shuffle
    * join per touched batch instead of a million-term expression
    * tree. Null-keyed rows and batches lacking a join column never
    * match (they predate the keyed schema). Returns (new version,
    * rows deleted) like [[deleteWhere]]. */
  def deleteMatchingKeys(spark: SparkSession, table: String,
      keys: DataFrame, joinCols: Seq[String]): (Int, Long) = {
    val dead = keys.select(joinCols.map(col): _*).distinct().persist()
    try copyOnWrite(spark, table) { df =>
      if (!joinCols.forall(df.columns.contains))
        (df.limit(0), df)
      else (df.join(dead, joinCols, "left_semi"),
        df.join(dead, joinCols, "left_anti"))
    } finally { dead.unpersist(); () }
  }

  /** True iff any committed batch's identity keys carry [[IdCol]] —
    * i.e. id-keyed row deletes CAN match something. False on a legacy
    * table whose every batch predates source ids (see
    * [[backfillIds]]). Footer-only check: reads key-file schemas,
    * never data bytes. */
  def carriesIds(spark: SparkSession, table: String): Boolean = {
    val (_, batches) = currentCommit(spark, table)
    batches.nonEmpty &&
      spark.read.option("mergeSchema", "true")
        .parquet(batches.map(b => s"$table/_keys/$b"): _*)
        .columns.contains(IdCol)
  }

  /** MIGRATION: backfill [[IdCol]] onto a LEGACY bronze table whose
    * batches predate source ids, from a `mapping` relation carrying
    * (`source_item_id`, joinCols…) — typically the staged catalog's
    * (`id`, `name`, `size`) projected to (`source_item_id`,
    * `file_name`, `length`). Round 14 made tombstone deletes
    * exclusively id-keyed (and deleted the name+size fallback), so an
    * UPGRADED pipeline pointed at a pre-upgrade table silently stops
    * propagating source deletions — the sync paths warn loudly
    * exactly then, and this one-shot rewrite is the fix the warning
    * names. Batches already carrying the column keep their bytes
    * untouched; id-less batches are rewritten once with the joined id
    * (null where the mapping has no entry — those rows remain
    * undeletable by id, counted out of the returned fill count). The
    * mapping must be FUNCTIONAL on the join key (one id per key):
    * ambiguity fails loudly rather than guessing — the same
    * reasoning that deleted the name+size delete heuristic. Old
    * versions still time-travel to the id-less data until [[vacuum]].
    * Returns (new version, rows filled); no-op (current version, 0)
    * when every batch already carries ids. */
  def backfillIds(spark: SparkSession, table: String, mapping: DataFrame,
      joinCols: Seq[String] = Seq("file_name", "length")): (Int, Long) = {
    val f = fs(spark, table)
    val (ver, batches) = currentCommit(spark, table)
    require(batches.nonEmpty, "empty bronze table")
    val map = mapping.select((IdCol +: joinCols).map(col): _*)
      .distinct().persist()
    try {
      val dup = map.groupBy(joinCols.map(col): _*)
        .agg(countDistinct(col(IdCol)).as("n"))
        .filter(col("n") > 1).count()
      require(dup == 0, s"mapping is ambiguous on " +
        s"(${joinCols.mkString(",")}) for $dup key(s) — refusing to " +
        "guess source ids")
      var filled = 0L
      val newBatches = batches.zipWithIndex.map { case (b, i) =>
        val df = spark.read.parquet(s"$table/$b")
        if (df.columns.contains(IdCol)) b
        else {
          val joined = df.join(map, joinCols, "left")
            .select((df.columns :+ IdCol).map(col): _*)
          val rewritten =
            freshBatchName(f, table, f"batch-${ver + 1}%08d-bf$i")
          joined.write.mode(SaveMode.ErrorIfExists)
            .parquet(s"$table/$rewritten")
          val landed = spark.read.parquet(s"$table/$rewritten")
          filled += landed.filter(col(IdCol).isNotNull).count()
          landed.select((IdCol +: KeyCols).map(col): _*).distinct()
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$table/_keys/$rewritten")
          rewritten
        }
      }
      if (newBatches == batches) (ver, 0L)
      else {
        commit(f, table, ver + 1, newBatches)
        DeltaLog.sync(spark, table)
        (ver + 1, filled)
      }
    } finally { map.unpersist(); () }
  }

  /** Copy-on-write core shared by the delete entry points: `split`
    * maps a committed batch to (matching rows, surviving rows);
    * batches with no matches keep their name and bytes. */
  private def copyOnWrite(spark: SparkSession, table: String)(
      split: DataFrame => (DataFrame, DataFrame)): (Int, Long) = {
    val f = fs(spark, table)
    val (ver, batches) = currentCommit(spark, table)
    require(batches.nonEmpty, "empty bronze table")
    var deleted = 0L
    val newBatches = batches.zipWithIndex.map { case (b, i) =>
      val df = spark.read.parquet(s"$table/$b")
      val (matches, survivors) = split(df)
      val n = matches.count()
      if (n == 0) b
      else {
        deleted += n
        val rewritten = freshBatchName(f, table, f"batch-${ver + 1}%08d-cow$i")
        survivors.write
          .mode(SaveMode.ErrorIfExists).parquet(s"$table/$rewritten")
        // keys carry over verbatim: deletion must not reopen ingest
        spark.read.parquet(s"$table/_keys/$b").write
          .mode(SaveMode.Overwrite).parquet(s"$table/_keys/$rewritten")
        rewritten
      }
    }
    if (deleted == 0) (ver, 0L)
    else {
      commit(f, table, ver + 1, newBatches)
      DeltaLog.sync(spark, table)
      (ver + 1, deleted)
    }
  }

  /** Append-only change feed: the rows added between two committed
    * versions (Delta CDF's insert stream). Valid exactly when every
    * `from`-version batch survives into `to` — i.e. the window holds
    * only [[mergeIngestDf]] appends; a [[compact]] or [[deleteWhere]]
    * in the window rewrites history and the feed fails loudly rather
    * than replaying rewritten batches as inserts. At 100 TB this is
    * the incremental-downstream contract: consumers checkpoint a
    * version number and read only the new batches' bytes.
    *
    * `readSchema` pins the scan schema (parquet matches columns by
    * name; columns a file lacks read as typed nulls). Pass it when
    * the window may span a schema evolution: without it the inferred
    * schema comes from ONE batch's footer, and columns introduced by
    * a later batch in the same window would be dropped — with it,
    * every batch's real values for the pinned columns surface. */
  def readChanges(spark: SparkSession, table: String,
      fromVersion: Int, toVersion: Int,
      readSchema: Option[StructType] = None): DataFrame = {
    require(fromVersion < toVersion,
      s"need fromVersion < toVersion, got $fromVersion ≥ $toVersion")
    val before =
      if (fromVersion == 0) Seq.empty
      else commitAt(spark, table, fromVersion)
    val after = commitAt(spark, table, toVersion)
    val missing = before.filterNot(after.toSet)
    require(missing.isEmpty,
      s"versions $fromVersion→$toVersion rewrite batches " +
        s"${missing.mkString(",")} (compaction/delete) — " +
        "the append-only change feed cannot represent that window")
    val added = after.filterNot(before.toSet)
    // Empty windows exist (e.g. a span covering only a vacuum commit,
    // which bumps the version without changing the batch set). The
    // empty relation must still carry the PINNED schema: after a
    // schema evolution, snapshot()'s current schema differs from the
    // stream's pinned one and would hand the sink a mismatched batch.
    if (added.isEmpty) readSchema match {
      case Some(sc) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
      case None => snapshot(spark, table).filter(lit(false))
    }
    else {
      val reader = readSchema.fold(spark.read)(spark.read.schema)
      reader.parquet(added.map(b => s"$table/$b"): _*)
    }
  }

  /** Reclaim batches no longer referenced by the LATEST commit and
    * drop older manifest versions — forfeits time travel for space.
    * The `_delta_log/` mirror is deliberately left intact (as Delta's
    * own VACUUM does): old log versions reference now-deleted files,
    * so physical time travel below the current version is forfeited,
    * while replay to HEAD still resolves exactly the live files.
    * Returns the deleted batch names. */
  def vacuum(spark: SparkSession, table: String): Seq[String] = {
    val f = fs(spark, table)
    val (ver, live) = currentCommit(spark, table)
    if (ver == 0) return Nil
    val liveSet = live.toSet
    val dead = f.listStatus(new Path(table)).map(_.getPath.getName)
      .filter(n => n.startsWith("batch-") && !liveSet.contains(n)).toSeq
    dead.foreach { b =>
      f.delete(new Path(table, b), true)
      f.delete(new Path(s"$table/_keys", b), true)
    }
    f.listStatus(manifestDir(table)).map(_.getPath.getName)
      .filter(v => v.matches("v\\d{8}") && v.drop(1).toInt < ver)
      .foreach(v => f.delete(new Path(manifestDir(table), v), false))
    dead.sorted
  }

  /** Snapshot read: only committed batch directories are visible.
    * `mergeSchema = true` is the Delta schema-evolution read: batches
    * committed with additional columns union into one wide schema,
    * pre-evolution rows read as null — additive evolution never
    * rewrites committed bytes (the footer-merge cost is why it is
    * opt-in, as in plain Spark). */
  def snapshot(spark: SparkSession, table: String,
      mergeSchema: Boolean = false): DataFrame = {
    val (_, batches) = currentCommit(spark, table)
    if (batches.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("file_name",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("length",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("modified",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("content",
            org.apache.spark.sql.types.BinaryType))))
    else spark.read
      .option("mergeSchema", mergeSchema.toString)
      .parquet(batches.map(b => s"$table/$b"): _*)
  }

  /** MERGE-on-read view: one row per file_name, latest version wins —
    * what a Delta `whenMatched.updateAll` would have left in place. */
  def snapshotLatest(spark: SparkSession, table: String): DataFrame = {
    val w = Window.partitionBy(col("file_name"))
      .orderBy(desc("modified"), desc("length"))
    snapshot(spark, table)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
  }

  /** Idempotent ingest: append only files whose identity key has not
    * been committed. Returns the number of appended rows (0 on an
    * exact re-run — no duplicates, ever). */
  def mergeIngest(spark: SparkSession, srcDir: String,
      table: String): Long =
    mergeIngestDf(spark, Ingest.discoverBinary(spark, srcDir).select(
      substring_index(col("path"), "/", -1).as("file_name"),
      col("length"), col("modificationTime").as("modified"),
      col("content")), table)

  /** [[mergeIngest]] over an arbitrary (file_name, length, modified,
    * content) DataFrame — the seam `foreachBatch` streaming ingest
    * plugs into (`graft.streaming.Streams.streamMergeIngest`).
    * `onSnapshotRead` and `onBeforeCommit` are fault-injection seams:
    * the first runs after this writer has read the commit it will
    * build on (tests interleave a competing full commit
    * deterministically — IngestSpec's concurrent-writer test); the
    * second runs after data and keys have landed but BEFORE the
    * manifest commit — the mid-batch-crash point (StreamsSpec's
    * kill/restart test). Production callers leave both defaults. */
  def mergeIngestDf(spark: SparkSession, src: DataFrame,
      table: String, onSnapshotRead: () => Unit = () => (),
      onBeforeCommit: () => Unit = () => ()): Long = {
    val f = fs(spark, table)
    val (ver, batches) = currentCommit(spark, table)
    onSnapshotRead()
    val hasId = src.columns.contains(IdCol)
    val fresh =
      if (batches.isEmpty) src
      else {
        val keys = committedKeys(spark, table, batches)
        // the base identity must match; then an ID-CARRYING src row is
        // blocked by a committed LEGACY key (null id — written before
        // the table carried ids, exactly the pre-id contract) or by
        // ITS OWN item's key (<=>, null-safe), while a byte-identical
        // re-create under a fresh id is a new identity and lands. An
        // ID-LESS src row cannot distinguish item identities at all,
        // so the bare (name, length, modified) key blocks it REGARDLESS
        // of the committed key's id — the pre-id contract again; any
        // weaker rule re-appends duplicates the moment a table built
        // by the id-less path gains ids (streamMergeIngest next to the
        // id-carrying drain, or a [[backfillIds]] migration).
        val cond = KeyCols.map(c => src(c) === keys(c)).reduce(_ && _) &&
          (if (hasId) keys(IdCol).isNull || (src(IdCol) <=> keys(IdCol))
           else lit(true))
        src.join(keys, cond, "left_anti")
      }
    // collision-free attempt name: a crash between data-write and
    // commit leaves an orphan under the deterministic name, and the
    // RETRY (e.g. a restarted streaming micro-batch) must not trip
    // over it — the orphan is uncommitted, hence invisible, and
    // vacuum reclaims it
    val batchName = freshBatchName(f, table, f"batch-${ver + 1}%08d")
    val dataPath = s"$table/$batchName"
    fresh.write.mode(SaveMode.ErrorIfExists).parquet(dataPath)
    // row count from parquet footers — metadata-only, no content reread
    val appended = spark.read.parquet(dataPath).count()
    if (appended == 0) { f.delete(new Path(dataPath), true); return 0L }
    val keyCols = if (hasId) IdCol +: KeyCols else KeyCols
    spark.read.parquet(dataPath).select(keyCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$table/_keys/$batchName")
    onBeforeCommit()
    commit(f, table, ver + 1, batches :+ batchName)
    // mirror the commit into the external-interop _delta_log (see
    // DeltaLog): sync is idempotent and self-healing, so a crash right
    // here just leaves the log to be backfilled by the next commit
    DeltaLog.sync(spark, table)
    appended
  }

  /** Delta-style CHECK-constraint gate in front of [[mergeIngestDf]]:
    * the whole source batch is rejected if ANY row violates ANY named
    * predicate — all-or-nothing, like a Delta `ADD CONSTRAINT` table
    * writing a bad batch. SQL CHECK semantics: only FALSE violates;
    * NULL passes (so `col.isNotNull` is how NOT NULL is spelled).
    * All constraints evaluate in ONE aggregate pass over the source —
    * no per-constraint scans — and the pass happens BEFORE any batch
    * directory is written, so a rejected batch leaves no trace to
    * vacuum. Returns appended rows; throws with per-constraint
    * violation counts otherwise. */
  def mergeIngestChecked(spark: SparkSession, src: DataFrame,
      table: String, constraints: Seq[(String, Column)]): Long = {
    if (constraints.isEmpty) return mergeIngestDf(spark, src, table)
    // pin the batch: the checked rows MUST be the written rows — an
    // unpinned source over a live directory (or any non-deterministic
    // column) could re-evaluate differently between the two jobs.
    // localCheckpoint, not persist: a cache is best-effort (an evicted
    // or lost partition recomputes from lineage, re-opening the same
    // hole), while a checkpoint SEVERS lineage — after it, the rows
    // the constraint aggregate saw are the only rows that exist.
    // KNOWN TRADE: localCheckpoint blocks are NOT fault-tolerant —
    // losing an executor that holds them between the constraint
    // aggregate and the merge fails the batch with no recompute path
    // (notable under dynamic allocation / node decommission). That is
    // the chosen failure mode: fail-loud-and-retry beats silently
    // re-evaluating a non-deterministic source past the CHECK gate.
    // Production merges on preemptible fleets should swap in reliable
    // checkpoint (spark.sparkContext.setCheckpointDir + .checkpoint()).
    val pinned = src.localCheckpoint()
    try {
      val exprs = constraints.map { case (_, pred) =>
        sum(when(not(coalesce(pred, lit(true))), 1L).otherwise(0L))
      }
      // read positionally — constraint names are caller-supplied
      // strings and must not collide with anything
      val row = pinned.agg(exprs.head, exprs.tail: _*).head()
      val violated = constraints.zipWithIndex
        .map { case ((name, _), i) =>
          name -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
        .filter(_._2 > 0)
      if (violated.nonEmpty)
        throw new IllegalArgumentException(
          "CHECK constraint violation, batch rejected: " +
            violated.map { case (n, c) => s"$n ($c rows)" }
              .mkString(", "))
      mergeIngestDf(spark, pinned, table)
    } finally {
      // release the checkpoint blocks promptly on BOTH the success
      // and the reject/failure path instead of waiting for
      // ContextCleaner GC — the pinned plan is a LogicalRDD over the
      // materialized blocks, and unpersisting that RDD is the only
      // deterministic release (the written batch is on disk; nothing
      // reads the blocks after the merge)
      graft.Scoped.dropCheckpoint(pinned)
    }
  }

  /** Publish the current snapshot (and its identity keys) as bucketed
    * + sorted catalog tables on `file_name` — the at-rest co-location
    * story (BucketSpec) wired into the bronze store itself: every
    * downstream join or aggregation keyed on file identity reads
    * aligned buckets and never reshuffles the content bytes. At
    * 100 TB this is the bronze→silver publication step: content moves
    * over the network exactly once (here), then never again. Returns
    * the published version. */
  def publishBucketed(spark: SparkSession, table: String,
      catalogName: String, nBuckets: Int = 8): Int = {
    val (ver, batches) = currentCommit(spark, table)
    require(batches.nonEmpty, "nothing to publish")
    snapshot(spark, table)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "file_name").sortBy("file_name")
      .saveAsTable(catalogName)
    spark.read.parquet(batches.map(b => s"$table/_keys/$b"): _*)
      .distinct()
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "file_name").sortBy("file_name")
      .saveAsTable(s"${catalogName}_keys")
    ver
  }

  /** Per-batch file statistics for [[DataSkipping]] — the Delta
    * "stats in the log" half of the bronze story. Batches are
    * immutable once committed, so stats are written once per batch
    * and never refreshed; re-running after new commits stats only the
    * new batches. Returns the batches stat'ed this call. */
  def collectStats(spark: SparkSession, table: String,
      cols: Seq[String]): Seq[String] = {
    val f = fs(spark, table)
    val (_, batches) = currentCommit(spark, table)
    batches.filter { b =>
      val statsPath = new Path(s"$table/$b", DataSkipping.StatsDir)
      if (f.exists(statsPath)) false
      else { DataSkipping.writeStats(spark, s"$table/$b", cols); true }
    }
  }

  /** Range-predicate snapshot read that opens only the files whose
    * [[DataSkipping]] stats admit the range — batches without stats
    * (not yet collected) are read in full with the residual filter,
    * so the result is always exact. The 100 TB read path: a selective
    * predicate over a stats-covered bronze table does file-count I/O
    * proportional to the MATCHING files, not the table. */
  def snapshotBetween(spark: SparkSession, table: String, c: String,
      lo: Any, hi: Any): DataFrame = {
    val f = fs(spark, table)
    val (_, batches) = currentCommit(spark, table)
    require(batches.nonEmpty, "empty bronze table")
    batches.map { b =>
      val dir = s"$table/$b"
      if (f.exists(new Path(dir, DataSkipping.StatsDir)))
        DataSkipping.readBetween(spark, dir, c, lo, hi)
      else spark.read.parquet(dir)
        .filter(col(c).between(lit(lo), lit(hi)))
    }.reduce(_ unionByName _)
  }

  /** Incrementally-maintained materialized view: the per-extension
    * rollup (ext, n_files, total_bytes) of the bronze table, refreshed
    * from the CHANGE FEED instead of recomputed — the
    * incremental-view-maintenance pattern every silver-layer rollup
    * at 100 TB needs (a full recompute re-reads the table; the
    * refresh reads only the batches appended since the view's
    * version). Additive aggregates + an append-only feed make the
    * algebra exact: new_mv = old_mv ⊎ agg(delta), outer-merged on the
    * group key with counter addition. The view directory carries its
    * own `_version` marker, so refresh is idempotent (same-version
    * refresh is a no-op) and resumable. If the feed window is
    * unrepresentable (compaction/delete rewrote batches —
    * [[readChanges]] refuses), the caller falls back to
    * [[rebuildRollup]]; that refusal-then-rebuild is the same
    * contract Delta's CDF readers live by. Returns (fromVersion,
    * toVersion, deltaRows). */
  def refreshRollup(spark: SparkSession, table: String,
      mvPath: String): (Int, Int, Long) = {
    val (to, _) = currentCommit(spark, table)
    val ptr = mvPointer(spark, mvPath)
    val from = ptr.map(_._2).getOrElse(0)
    if (from >= to) return (from, to, 0L) // idempotent no-op
    val delta = readChanges(spark, table, from, to)
    val deltaAgg = rollupOf(delta)
    val merged =
      if (from == 0) deltaAgg
      else spark.read.parquet(s"$mvPath/${ptr.get._1}").toDF("ext", "n0", "b0")
        .join(deltaAgg.toDF("ext", "n1", "b1"), Seq("ext"), "full_outer")
        .select(col("ext"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
            .as("n_files"),
          (coalesce(col("b0"), lit(0L)) + coalesce(col("b1"), lit(0L)))
            .as("total_bytes"))
    // stage the new view in its OWN versioned directory, then flip the
    // `_version` pointer (temp + atomic rename) last. The old version's
    // data is never touched, so a crash anywhere before the flip leaves
    // a consistent (old dir, pointer → old dir) pair — the next
    // refresh recomputes the same delta and overwrites the orphan new
    // directory; nothing double-counts. Overwriting a live directory
    // in place (the pre-round-5 layout) is committer/filesystem-
    // dependent and unsafe on object stores; the rename of a one-line
    // pointer file is the only operation that needs atomicity.
    // from < to, so the target dir is never the pointed-to live dir.
    val newDir = mvDirName(to)
    merged.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$mvPath/$newDir")
    flipPointer(spark, mvPath, newDir)
    gcRollup(spark, mvPath, keep = Set(newDir) ++ ptr.map(_._1))
    (from, to, delta.count())
  }

  /** Full recompute of the same rollup — the fallback when the change
    * feed cannot represent the window, and the equivalence oracle the
    * spec holds [[refreshRollup]] to. Safe to run at ANY time,
    * including at the view's current version (the recovery case): the
    * rebuild always stages into a directory that is NOT the live one
    * (a `-rN` suffix when the plain version dir is live), so readers
    * and crash-recovery keep the refresh path's guarantees. */
  def rebuildRollup(spark: SparkSession, table: String,
      mvPath: String): Unit = {
    val f = fs(spark, mvPath)
    val (to, _) = currentCommit(spark, table)
    val ptr = mvPointer(spark, mvPath)
    val base = mvDirName(to)
    // stage into a fresh -rN dir whenever the base dir EXISTS on disk
    // (not merely when it is live): after rebuilds #1 and #2 the base
    // dir is the kept grace-window predecessor — overwriting it in
    // place would clobber a reader mid-scan, the exact hazard this
    // layout exists to rule out
    val newDir =
      if (!f.exists(new Path(mvPath, base))) base
      else {
        var k = 1
        while (f.exists(new Path(mvPath, s"$base-r$k"))) k += 1
        s"$base-r$k"
      }
    rollupOf(snapshot(spark, table)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$mvPath/$newDir")
    flipPointer(spark, mvPath, newDir)
    gcRollup(spark, mvPath, keep = Set(newDir) ++ ptr.map(_._1))
  }

  private def mvDirName(v: Int): String = f"data_v$v%08d"

  /** Version encoded in a data directory name (`data_vNNNNNNNN`,
    * optionally `-rN`-suffixed by a rebuild). */
  private def mvVersionOf(dirName: String): Int =
    dirName.stripPrefix("data_v").takeWhile(_.isDigit).toInt

  /** The `_version` pointer, resolved to (live data directory NAME,
    * view version); None = no view materialized. Naming the directory
    * rather than the bare version is what lets a rebuild at an
    * unchanged table version stage somewhere fresh instead of
    * overwriting the live directory in place. The version rides
    * alongside the name because the legacy directory name carries no
    * parseable version. */
  private def mvPointer(spark: SparkSession,
      mvPath: String): Option[(String, Int)] = {
    val f = fs(spark, mvPath)
    val verFile = new Path(mvPath, "_version")
    if (!f.exists(verFile)) None
    else {
      val in = f.open(verFile)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
        .filter(_.nonEmpty)
        // migration shim: pointers written by the bare-integer format
        // ("5") belong to the pre-versioned-dir layout, whose parquet
        // lives under the literal `data` directory — resolve to THAT
        // name (not data_vNNNNNNNN, which never existed for them) and
        // carry the parsed version separately, so old views stay
        // readable and the next refresh merges from the right version
        // before migrating the view into the versioned-dir layout
        .map(p => if (p.forall(_.isDigit)) ("data", p.toInt)
                  else (p, mvVersionOf(p)))
      finally in.close()
    }
  }

  /** Atomically repoint `_version` → `dirName` (temp file + rename
    * with OVERWRITE via FileContext — atomic on HDFS and local FS). */
  private def flipPointer(spark: SparkSession, mvPath: String,
      dirName: String): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(mvPath).toUri, spark.sessionState.newHadoopConf())
    val tmp = new Path(mvPath, s"._version-$dirName.tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(s"$dirName\n".getBytes("UTF-8")) finally out.close()
    fc.rename(tmp, new Path(mvPath, "_version"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Drop data_v* directories outside the keep set — run strictly
    * after the pointer flip, so failures here cost disk, not
    * correctness. The keep set carries the live directory AND its
    * predecessor: a reader that resolved `_version` just before the
    * flip may still be scanning the previous directory, so the
    * predecessor survives one refresh cycle as its grace window
    * (the Delta-vacuum retention idea, collapsed to depth 1). The
    * FileSystem is resolved from mvPath — the view may live on a
    * different filesystem than the table.
    *
    * SINGLE-WRITER INVARIANT: refresh/rebuild assume one writer per
    * view at a time (the same caveat Delta documents for
    * non-coordinated multi-cluster writers). Two concurrent writers
    * could each GC the other's freshly staged directory before the
    * other's pointer flip — readers are always safe (the grace window
    * plus the atomic pointer), but a concurrent WRITER needs external
    * mutual exclusion. Coordinated commits (the table's own
    * [[commit]]) fail loudly on conflict; the view pointer
    * deliberately does not, because a view refresh is recomputable
    * and last-writer-wins is the desired semantic under a single
    * writer. */
  private def gcRollup(spark: SparkSession, mvPath: String,
      keep: Set[String]): Unit = {
    val f = fs(spark, mvPath)
    val dir = new Path(mvPath)
    if (!f.exists(dir)) return
    f.listStatus(dir).map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith("data_v") && !keep.contains(n))
        f.delete(p, true)
    }
  }

  /** The view definition, shared by refresh and rebuild. */
  private def rollupOf(rows: DataFrame): DataFrame =
    rows.select(
        lower(substring_index(col("file_name"), ".", -1)).as("ext"),
        col("length"))
      .groupBy(col("ext"))
      .agg(count(lit(1)).as("n_files"), sum(col("length")).as("total_bytes"))

  /** Read the materialized rollup as of its own version, resolved
    * through the `_version` pointer. */
  def readRollup(spark: SparkSession, mvPath: String): DataFrame = {
    val ptr = mvPointer(spark, mvPath)
    require(ptr.isDefined, s"no materialized view at $mvPath")
    spark.read.parquet(s"$mvPath/${ptr.get._1}")
  }

  /** Write the version file via temp + atomic rename; an existing
    * target means a concurrent writer committed first — fail loudly.
    * Package-visible so IngestSpec can drive the CAS conflict
    * deterministically. */
  private[graft] def commit(f: FileSystem, table: String, version: Int,
      batches: Seq[String]): Unit = {
    val dir = manifestDir(table)
    f.mkdirs(dir)
    val target = new Path(dir, f"v$version%08d")
    val tmp = new Path(dir, f".tmp-v$version%08d")
    val out = f.create(tmp, false)
    try out.write((batches.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, true)
      throw new IllegalStateException(
        s"bronze commit conflict: version $version already exists at $dir")
    }
  }
}
