package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Recorded-JSON fixtures (FIXTURES.md §B): the actual Graph wire
  * shapes consumed at `sharepoint_to_bronze_delta.py:65,76` and
  * `utility_sp_grant_siteselected.py:62,141`, read with
  * `spark.read.json` + explicit nested schemas — the production
  * parsing path for the connector's responses. */
class JsonFixtureSpec extends SparkSpec {

  test("drive-items listing JSON: file-facet filter + projection") {
    val dir = Files.createTempDirectory("graft-json")
    Files.writeString(dir.resolve("drive_items.json"),
      """{"name": "sales_jan.csv", "file": {"mimeType": "text/csv"}, "size": 12345, "lastModifiedDateTime": "2025-11-01T02:03:04Z", "downloadUrl": "https://dl/1"}
        |{"name": "q4'23 report.xlsx", "file": {"mimeType": "application/vnd.ms-excel"}, "size": 9, "lastModifiedDateTime": "2025-11-02T00:00:00Z", "downloadUrl": "https://dl/2"}
        |{"name": "2024", "folder": {"childCount": 12}, "size": 0, "lastModifiedDateTime": "2025-01-01T00:00:00Z"}
        |{"name": "empty.bin", "file": {"mimeType": "application/octet-stream"}, "size": 0, "lastModifiedDateTime": "2025-11-03T00:00:00Z", "downloadUrl": "https://dl/3"}
        |""".stripMargin)

    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("file", StructType(Seq(StructField("mimeType", StringType)))),
      StructField("folder", StructType(Seq(StructField("childCount", LongType)))),
      StructField("size", LongType),
      StructField("lastModifiedDateTime", StringType),
      StructField("downloadUrl", StringType)))

    val items = spark.read.schema(schema).json(dir.toString)
    // P1: the file facet, exactly as the reference keys on it (:140)
    val files = items.filter(col("file").isNotNull)
      .select(col("name"), col("file.mimeType").as("mime"),
        translate(col("name"), "'", "_").as("sanitized"), col("size"))
    val rows = files.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getString(2), r.getLong(3))).toMap
    assert(rows.keySet ==
      Set("sales_jan.csv", "q4'23 report.xlsx", "empty.bin"))
    assert(rows("q4'23 report.xlsx")._2 == "q4_23 report.xlsx")
    assert(rows("empty.bin")._3 == 0L)
  }

  test("permissions JSON: nested grantedToIdentitiesV2 existence semi-join") {
    val dir = Files.createTempDirectory("graft-json-perms")
    Files.writeString(dir.resolve("permissions.json"),
      """{"siteId": "s1", "roles": ["write"], "grantedToIdentitiesV2": [{"application": {"id": "aaaa", "displayName": "Site Access App"}}]}
        |{"siteId": "s2", "roles": ["read"], "grantedToIdentitiesV2": [{"application": {"id": "other"}}]}
        |{"siteId": "s3", "roles": ["owner"]}
        |{"siteId": "s4", "roles": ["read"], "grantedToIdentitiesV2": [{"application": {"id": "other"}}, {"application": {"id": "aaaa"}}]}
        |""".stripMargin)

    val schema = StructType(Seq(
      StructField("siteId", StringType),
      StructField("roles", ArrayType(StringType)),
      StructField("grantedToIdentitiesV2", ArrayType(StructType(Seq(
        StructField("application", StructType(Seq(
          StructField("id", StringType),
          StructField("displayName", StringType))))))))))

    val perms = spark.read.schema(schema).json(dir.toString)
    // J1 (utility:67-77): exists over the nested array, null-safe for
    // the missing-V2-key document (s3)
    val granted = perms.filter(
        exists(col("grantedToIdentitiesV2"), g => g("application")("id") === "aaaa"))
      .select("siteId").collect().map(_.getString(0)).sorted.toSeq
    assert(granted == Seq("s1", "s4"))
  }
}
