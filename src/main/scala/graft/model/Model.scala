package graft.model

/** Typed data model for the parity layer — the reference's config tree
  * and relations, re-expressed as case classes (SURVEY §1.1).
  *
  * The reference keeps everything stringly (7 × string catalog columns,
  * `"True"`/`"False"` flags — `sharepoint_to_bronze_delta.py:141-149`,
  * `config.py:25-26`); we keep those shapes at the parity boundary and
  * parse to real types inside the engine.
  */

/** One entry of `source_folder_list` (`config.py:22-29`). Flags stay
  * strings at the boundary (parsed with `lower(x) == "true"` parity
  * semantics, `sharepoint_to_bronze_delta.py:222,229`). */
final case class SourceFolderCfg(
    folder_name: String,
    site_name: String,
    lakehouse_folder: String,
    copy_to_archive: String,
    delete_original: String)

/** A Graph drive item (folder-children listing,
  * `sharepoint_to_bronze_delta.py:72-77`). `file_mime` is null for
  * folders (the `file` facet is absent — P1 filter keys on this);
  * `child_count` is null for files. `item_idx` preserves response
  * order (the reference's "first match" semantics rely on it). */
final case class DriveItem(
    item_idx: Int,
    folder_name: String,
    name: String,
    file_mime: String,
    child_count: java.lang.Integer,
    size: java.lang.Long,
    last_modified: String,
    download_url: String)

/** A drive from `/sites/{id}/drives` (S4,
  * `sharepoint_to_bronze_delta.py:60-69`). */
final case class Drive(drive_idx: Int, drive_id: String, drive_name: String)

/** A tenant site (S7, `utility_sp_grant_siteselected.py:130-149`). */
final case class Site(
    site_id: String,
    site_name: String,
    last_modified: String,
    web_url: String)

/** `grantedToIdentitiesV2[].application`
  * (`utility_sp_grant_siteselected.py:69-75`). */
final case class AppGrant(app_id: String, display_name: String)

/** A site permission document (S8); `granted` is null when the Graph
  * response omits `grantedToIdentitiesV2` (the reference guards with
  * a key check, `utility_sp_grant_siteselected.py:69`). */
final case class SitePermission(
    site_id: String,
    perm_id: String,
    roles: Seq[String],
    granted: Seq[AppGrant])

/** The discovered-file catalog row — the reference's central relation
  * (7 string columns, `sharepoint_to_bronze_delta.py:141-149`). */
final case class FileMeta(
    file_name: String,
    folder_name: String,
    site_name: String,
    file_url: String,
    lakehouse_folder: String,
    copy_to_archive: String,
    delete_original: String)
