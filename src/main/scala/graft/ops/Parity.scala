package graft.ops

import graft.QuerySpec
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parity layer — every data operation the reference actually performs
  * (SURVEY §2), over recorded-fixture relations shaped like the Graph
  * responses it consumes (FIXTURES.md §B). The fixtures are inline
  * literals on BOTH sides (typed Datasets here, `VALUES` in the DuckDB
  * oracle), so these queries are hash-checked without touching the
  * network the reference talks to.
  *
  * Operator coverage: P1 file-facet filter, P2/J3 catalog projection +
  * broadcast config join, P3 null guards, A1/A2 per-folder + total
  * counts, F1 sanitization, F2 timestamped archive naming (fixed
  * clock), P6 stringly-boolean gating, J1 existence semi-join,
  * J2 accessibility report (one join replacing the reference's N+1
  * loop), S4 drive pick.
  */
object Parity {

  // ---- fixture data (FIXTURES.md §B; values are ours, shapes are the
  //      reference's) ----

  private val folderCfg = Seq(
    SourceFolderCfg("Invoices", "Finance", "bronze/invoices", "True", "true"),
    SourceFolderCfg("Reports", "Finance", "bronze/reports", "true", "False"),
    SourceFolderCfg("Scans", "Ops", "bronze/scans", null, null),
    SourceFolderCfg("Archive", "Ops", "bronze/archive", "FALSE", "TRUE"))

  private val driveItems = Seq(
    DriveItem(1, "Invoices", "inv_001.csv", "text/csv", null, 1234L,
      "2025-11-01T02:03:04Z", "https://dl.example/inv_001"),
    DriveItem(2, "Invoices", "Q4'25 summary.xlsx",
      "application/vnd.ms-excel", null, 98765L,
      "2025-11-02T10:11:12Z", "https://dl.example/q425"),
    DriveItem(3, "Invoices", "2024", null, 12, null,
      "2025-01-01T00:00:00Z", null), // subfolder: no file facet
    DriveItem(4, "Reports", "weekly.pdf", "application/pdf", null, 555L,
      "2025-11-03T03:04:05Z", "https://dl.example/weekly"),
    DriveItem(5, "Reports", "empty.bin", "application/octet-stream",
      null, 0L, "2025-11-03T04:05:06Z", "https://dl.example/empty"),
    DriveItem(6, "Scans", "o'brien's notes.txt", "text/plain", null, 42L,
      "2025-11-04T05:06:07Z", "https://dl.example/obrien"),
    DriveItem(7, "Scans", "drafts", null, 3, null,
      "2025-02-02T00:00:00Z", null))

  private val drives = Seq(
    Drive(1, "driveA", "Teams Wiki Data"),
    Drive(2, "driveB", "Documents"),
    Drive(3, "driveC", "Backup"))

  private val sites = Seq(
    Site("host,s1,w1", "Finance", "2025-10-30T00:00:00Z",
      "https://host/sites/Finance"),
    Site("host,s2,w2", "Ops", "2025-10-29T00:00:00Z",
      "https://host/sites/Ops"),
    Site("host,s3,w3", "HR", "2025-10-28T00:00:00Z",
      "https://host/sites/HR"),
    Site("host,s4,w4", "Legal", "2025-10-27T00:00:00Z",
      "https://host/sites/Legal"))

  private val TargetApp = "aaaa-1111"

  private val permissions = Seq(
    SitePermission("host,s1,w1", "p1", Seq("write"),
      Seq(AppGrant(TargetApp, "Site Access App"))),
    SitePermission("host,s1,w1", "p2", Seq("read"),
      Seq(AppGrant("bbbb-2222", "Other App"))),
    SitePermission("host,s2,w2", "p3", Seq("read"),
      Seq(AppGrant("bbbb-2222", "Other App"),
        AppGrant(TargetApp, "Site Access App"))),
    SitePermission("host,s3,w3", "p4", Seq("owner"), null), // no V2 key
    SitePermission("host,s4,w4", "p5", Seq("write"),
      Seq(AppGrant("cccc-3333", "Third App"))))

  // ---- matching DuckDB VALUES CTEs ----

  private val folderCfgSql =
    """folder_cfg(folder_name, site_name, lakehouse_folder,
         copy_to_archive, delete_original) AS (VALUES
       ('Invoices', 'Finance', 'bronze/invoices', 'True', 'true'),
       ('Reports', 'Finance', 'bronze/reports', 'true', 'False'),
       ('Scans', 'Ops', 'bronze/scans', NULL, NULL),
       ('Archive', 'Ops', 'bronze/archive', 'FALSE', 'TRUE'))"""

  private val driveItemsSql =
    """drive_items(item_idx, folder_name, name, file_mime, child_count,
         size, last_modified, download_url) AS (VALUES
       (1, 'Invoices', 'inv_001.csv', 'text/csv', CAST(NULL AS INT),
        CAST(1234 AS BIGINT), '2025-11-01T02:03:04Z', 'https://dl.example/inv_001'),
       (2, 'Invoices', 'Q4''25 summary.xlsx', 'application/vnd.ms-excel',
        NULL, 98765, '2025-11-02T10:11:12Z', 'https://dl.example/q425'),
       (3, 'Invoices', '2024', CAST(NULL AS VARCHAR), 12,
        CAST(NULL AS BIGINT), '2025-01-01T00:00:00Z', CAST(NULL AS VARCHAR)),
       (4, 'Reports', 'weekly.pdf', 'application/pdf', NULL, 555,
        '2025-11-03T03:04:05Z', 'https://dl.example/weekly'),
       (5, 'Reports', 'empty.bin', 'application/octet-stream', NULL, 0,
        '2025-11-03T04:05:06Z', 'https://dl.example/empty'),
       (6, 'Scans', 'o''brien''s notes.txt', 'text/plain', NULL, 42,
        '2025-11-04T05:06:07Z', 'https://dl.example/obrien'),
       (7, 'Scans', 'drafts', NULL, 3, NULL,
        '2025-02-02T00:00:00Z', NULL))"""

  private val sitesSql =
    """sites(site_id, site_name, last_modified, web_url) AS (VALUES
       ('host,s1,w1', 'Finance', '2025-10-30T00:00:00Z', 'https://host/sites/Finance'),
       ('host,s2,w2', 'Ops', '2025-10-29T00:00:00Z', 'https://host/sites/Ops'),
       ('host,s3,w3', 'HR', '2025-10-28T00:00:00Z', 'https://host/sites/HR'),
       ('host,s4,w4', 'Legal', '2025-10-27T00:00:00Z', 'https://host/sites/Legal'))"""

  private val permissionsSql =
    s"""permissions(site_id, perm_id, roles, granted) AS (VALUES
       ('host,s1,w1', 'p1', ['write'],
        [{'app_id': '$TargetApp', 'display_name': 'Site Access App'}]),
       ('host,s1,w1', 'p2', ['read'],
        [{'app_id': 'bbbb-2222', 'display_name': 'Other App'}]),
       ('host,s2,w2', 'p3', ['read'],
        [{'app_id': 'bbbb-2222', 'display_name': 'Other App'},
         {'app_id': '$TargetApp', 'display_name': 'Site Access App'}]),
       ('host,s3,w3', 'p4', ['owner'],
        CAST(NULL AS STRUCT(app_id VARCHAR, display_name VARCHAR)[])),
       ('host,s4,w4', 'p5', ['write'],
        [{'app_id': 'cccc-3333', 'display_name': 'Third App'}]))"""

  /** Fixture permission table as a DataFrame (test access). */
  private[graft] def permissionsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    permissions.toDS.toDF()
  }

  /** K5 as a dataflow operator: the reference's grant utility
    * (`utility_sp_grant_siteselected.py:60-100`) lists a site's
    * permissions, scans the nested grantee array for the app, and
    * POSTs a "write" grant only when absent — a check-then-insert.
    * Re-expressed: requested sites anti-join the already-granted set
    * (existence over the nested array, null-safe for the missing V2
    * key), and only the misses produce new permission rows. Applying
    * the result again grants nothing — idempotent by construction,
    * which the reference achieves only through its if/else. */
  def grantIfAbsent(perms: DataFrame, requests: DataFrame,
      appId: String, displayName: String): DataFrame = {
    val grantedSites = perms
      .filter(exists(col("granted"), g => g("app_id") === appId))
      .select(col("site_id")).distinct()
    requests.join(grantedSites, Seq("site_id"), "left_anti")
      .select(col("site_id"),
        concat(lit("auto_"), col("site_id")).as("perm_id"),
        array(lit("write")).as("roles"),
        array(struct(lit(appId).as("app_id"),
          lit(displayName).as("display_name"))).as("granted"))
  }

  /** The catalog query (§3.2): file-facet filter → broadcast config
    * join → 7-column projection with defaulted flags. */
  private def catalog(s: SparkSession): DataFrame = {
    import s.implicits._
    val items = driveItems.toDS.toDF()
    val cfg = folderCfg.toDS.toDF()
    items.filter(col("file_mime").isNotNull) // P1: has a `file` facet
      .join(broadcast(cfg), "folder_name")  // J3: per-folder constants
      .select(                               // P2 projection, P3 defaults
        col("name").as("file_name"),
        col("folder_name"), col("site_name"),
        col("download_url").as("file_url"),
        col("lakehouse_folder"),
        coalesce(col("copy_to_archive"), lit("False")).as("copy_to_archive"),
        coalesce(col("delete_original"), lit("False")).as("delete_original"))
  }

  private val catalogSql =
    s"""WITH $driveItemsSql, $folderCfgSql
       SELECT i.name AS file_name, i.folder_name, c.site_name,
         i.download_url AS file_url, c.lakehouse_folder,
         COALESCE(c.copy_to_archive, 'False') AS copy_to_archive,
         COALESCE(c.delete_original, 'False') AS delete_original
       FROM drive_items i JOIN folder_cfg c USING (folder_name)
       WHERE i.file_mime IS NOT NULL"""

  val specs: Seq[QuerySpec] = Seq(

    // ---- P1+P2+P3+J3: the file catalog ----
    QuerySpec(
      "p01_catalog_discovery",
      (s, _) => catalog(s).orderBy("file_name"),
      Some(s"$catalogSql ORDER BY file_name")),

    // ---- A1+A2: per-folder counts + grand total (rollup) ----
    QuerySpec(
      "p02_folder_counts",
      (s, _) => {
        catalog(s)
          .rollup(col("folder_name"))
          .agg(count(lit(1)).as("n_files"))
          .select(coalesce(col("folder_name"), lit("TOTAL")).as("folder_name"),
            col("n_files"))
          .orderBy("folder_name")
      },
      Some(s"""SELECT COALESCE(folder_name, 'TOTAL') AS folder_name,
        COUNT(1) AS n_files
      FROM ($catalogSql) c
      GROUP BY ROLLUP(folder_name) ORDER BY folder_name""")),

    // ---- F1+F2: sanitization + timestamped archive naming (fixed
    //      clock 2025-11-14 09:30:05 UTC; KL = UTC+8, no DST) ----
    QuerySpec(
      "p03_archive_naming",
      (s, _) => {
        val fixedClock = to_timestamp(lit("2025-11-14 09:30:05"))
        val prefix = date_format(
          from_utc_timestamp(fixedClock, "Asia/Kuala_Lumpur"), "ddMMyyHHmmss")
        catalog(s)
          .select(col("file_name"),
            translate(col("file_name"), "'", "_").as("sanitized"),
            concat(prefix, lit("_"),
              translate(col("file_name"), "'", "_")).as("archive_name"))
          .orderBy("file_name")
      },
      Some(s"""SELECT file_name,
        replace(file_name, '''', '_') AS sanitized,
        strftime(TIMESTAMP '2025-11-14 09:30:05' + INTERVAL 8 HOUR,
          '%d%m%y%H%M%S') || '_' || replace(file_name, '''', '_')
          AS archive_name
      FROM ($catalogSql) c ORDER BY file_name""")),

    // ---- P6: stringly-boolean gating; delete strictly gated on
    //      archive success (C3 ordering) ----
    QuerySpec(
      "p04_flag_gating",
      (s, _) => {
        val doArchive = lower(col("copy_to_archive")) === "true"
        val doDelete = doArchive && lower(col("delete_original")) === "true"
        catalog(s)
          .select(col("file_name"), col("copy_to_archive"),
            col("delete_original"),
            doArchive.as("do_archive"), doDelete.as("do_delete"))
          .orderBy("file_name")
      },
      Some(s"""SELECT file_name, copy_to_archive, delete_original,
        lower(copy_to_archive) = 'true' AS do_archive,
        lower(copy_to_archive) = 'true'
          AND lower(delete_original) = 'true' AS do_delete
      FROM ($catalogSql) c ORDER BY file_name""")),

    // ---- J1: existence semi-join — sites already granted to the app
    //      (nested-array `exists`, null-safe for missing V2 key) ----
    QuerySpec(
      "p05_permission_semijoin",
      (s, _) => {
        import s.implicits._
        val perms = permissions.toDS.toDF()
        perms
          .filter(exists(col("granted"), g => g("app_id") === TargetApp))
          .select(col("site_id")).distinct()
          .orderBy("site_id")
      },
      Some(s"""WITH $permissionsSql
      SELECT DISTINCT site_id FROM permissions
      WHERE len(list_filter(granted, g -> g.app_id = '$TargetApp')) > 0
      ORDER BY site_id""")),

    // ---- J2: accessibility report — ONE semi-join derives the flag
    //      the reference computes with N+1 HTTP calls ----
    QuerySpec(
      "p06_accessibility_report",
      (s, _) => {
        import s.implicits._
        val sitesDf = sites.toDS.toDF()
        val perms = permissions.toDS.toDF()
        val grantedSites = perms
          .filter(exists(col("granted"), g => g("app_id") === TargetApp))
          .select(col("site_id")).distinct()
          .withColumn("has_grant", lit(true))
        sitesDf.join(grantedSites, Seq("site_id"), "left_outer")
          .select(col("site_name"), col("last_modified"), col("web_url"),
            when(col("has_grant"), "Yes").otherwise("No").as("accessible"))
          .orderBy("site_name")
      },
      Some(s"""WITH $sitesSql, $permissionsSql
      SELECT site_name, last_modified, web_url,
        CASE WHEN site_id IN (
          SELECT site_id FROM permissions
          WHERE len(list_filter(granted, g -> g.app_id = '$TargetApp')) > 0)
        THEN 'Yes' ELSE 'No' END AS accessible
      FROM sites ORDER BY site_name""")),

    // ---- S4: drive scan + first-match pick (response order) ----
    QuerySpec(
      "p07_drive_pick",
      (s, _) => {
        import s.implicits._
        drives.toDS.toDF()
          .filter(col("drive_name") =!= "Teams Wiki Data")
          .orderBy("drive_idx")
          .limit(1)
          .select(col("drive_id"), col("drive_name"))
      },
      Some("""WITH drives(drive_idx, drive_id, drive_name) AS (VALUES
        (1, 'driveA', 'Teams Wiki Data'),
        (2, 'driveB', 'Documents'),
        (3, 'driveC', 'Backup'))
      SELECT drive_id, drive_name FROM drives
      WHERE drive_name <> 'Teams Wiki Data'
      ORDER BY drive_idx LIMIT 1""")),

    // ---- S3: site-metadata single-row lookup (resolve site id by
    //      name, `sharepoint_to_bronze_delta.py:51-58`) ----
    QuerySpec(
      "p08_site_lookup",
      (s, _) => {
        import s.implicits._
        sites.toDS.toDF()
          .filter(col("site_name") === "Finance")
          .select(col("site_id"))
          .limit(1)
      },
      Some(s"""WITH $sitesSql
      SELECT site_id FROM sites WHERE site_name = 'Finance' LIMIT 1""")),

    // ---- S5 as a real connector: custom DataSource V2 catalog source
    //      with folder-filter pushdown (unrequested folders are never
    //      listed) and column pruning; the oracle replicates the
    //      connector's deterministic fixture content ----
    QuerySpec(
      "p09_dsv2_catalog",
      (s, _) => {
        s.read.format("graph-items")
          .option("folders", "6").option("filesPerFolder", "40").load()
          .filter(col("folder_name").isin("folder_1", "folder_3"))
          .groupBy(col("folder_name"))
          .agg(count(lit(1)).as("n_files"), sum(col("size")).as("total_size"))
          .orderBy("folder_name")
      },
      Some("""SELECT folder_name, COUNT(1) AS n_files,
        CAST(SUM(size) AS BIGINT) AS total_size
      FROM (SELECT 'folder_' || f AS folder_name,
              (f * 31 + j * 7) % 1000 AS size
            FROM (SELECT unnest(generate_series(0, 5)) AS f) ff,
                 (SELECT unnest(generate_series(0, 39)) AS j) jj) t
      WHERE folder_name IN ('folder_1', 'folder_3')
      GROUP BY folder_name ORDER BY folder_name""")),

    // ---- K5: permission grant-if-absent — post-state of the
    //      permission table after requesting the app on three sites
    //      (s1 already granted → skipped; s3 null grantee list and s4
    //      other-app-only → new rows). Nested arrays flattened to
    //      joined strings so the output is scalar-sortable. ----
    QuerySpec(
      "p10_grant_upsert",
      (s, _) => {
        import s.implicits._
        val perms = permissions.toDS.toDF()
        val requests = Seq("host,s1,w1", "host,s3,w3", "host,s4,w4")
          .toDF("site_id")
        val post = perms.unionByName(
          grantIfAbsent(perms, requests, TargetApp, "Site Access App"))
        post.select(col("site_id"), col("perm_id"),
            array_join(col("roles"), ",").as("roles"),
            coalesce(array_join(
              transform(col("granted"), g => g("app_id")), ","), lit(""))
              .as("grantee_apps"))
          .orderBy("site_id", "perm_id")
      },
      Some(s"""WITH $permissionsSql,
        requests(site_id) AS (VALUES
          ('host,s1,w1'), ('host,s3,w3'), ('host,s4,w4')),
        granted_sites AS (
          SELECT DISTINCT site_id FROM permissions
          WHERE len(list_filter(granted, g -> g.app_id = '$TargetApp')) > 0),
        new_grants AS (
          SELECT r.site_id, 'auto_' || r.site_id AS perm_id,
            ['write'] AS roles,
            [{'app_id': '$TargetApp', 'display_name': 'Site Access App'}]
              AS granted
          FROM requests r
          WHERE r.site_id NOT IN (SELECT site_id FROM granted_sites)),
        post AS (SELECT * FROM permissions
                 UNION ALL SELECT * FROM new_grants)
      SELECT site_id, perm_id, array_to_string(roles, ',') AS roles,
        coalesce(array_to_string(
          list_transform(granted, g -> g.app_id), ','), '') AS grantee_apps
      FROM post ORDER BY site_id, perm_id"""))
  )
}
