package graft.ops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension layer): media payloads are
  * opaque `binary` columns + typed metadata, processed by batched
  * per-partition decode. The container has no image/audio codecs, so
  * the DECODE STEP IS A DETERMINISTIC STUB ([[Multimodal.decodeStub]])
  * — the Spark-side contract (schema, binary handling, batch shape,
  * partition-parallel decode) is real and tested; swap the stub for a
  * JNI/codec call and nothing else changes.
  *
  * The `documents.text` bytes stand in for payloads (the fixtures have
  * no real media); `encode(text)` → BinaryType exercises the same
  * column machinery the reference's blob path needs (S6/K1 payloads,
  * `sharepoint_to_bronze_delta.py:163-176`).
  */
object Multimodal {

  /** Payload stand-in: utf-8 bytes of the document text. */
  private val payload = encode(col("text"), "UTF-8")

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  /** `head` is a comma-joined string (not array<int>): flat scalar
    * columns keep the output sortable by any downstream tool — the
    * driver's rows-only compare chokes on nested arrays. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      mean_byte: Double,
      head: String)

  /** STUB decode: deterministic features from raw bytes (length, mean
    * byte value, first 4 byte codes). A real impl would decode frames
    * / spectrograms here; the mapPartitions + grouped-batch shape is
    * what carries over. */
  def decodeStub(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), payload.as("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // batched like a vectorized (e.g. Arrow) decode loop
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bs = r.payload
            MediaFeatures(r.doc_id, bs.length,
              if (bs.isEmpty) 0.0
              else bs.map(_.toInt & 0xff).sum.toDouble / bs.length,
              bs.take(4).map(_.toInt & 0xff).mkString(","))
          }
        }
      }.toDF()
  }

  val specs: Seq[QuerySpec] = Seq(

    // ---- binary metadata: sizes + content hashes ----
    QuerySpec(
      "m01_binary_meta",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            octet_length(payload).as("n_bytes"),
            sha2(payload, 256).as("sha256"),
            md5(payload).as("md5"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        sha256(text) AS sha256, md5(text) AS md5
      FROM documents ORDER BY doc_id""")),

    // ---- fixed-size chunking (frame-sampling shape): 256-byte
    //      chunks, per-chunk hash — ASCII text so byte and char
    //      offsets coincide for the oracle ----
    QuerySpec(
      "m02_chunking",
      (s, d) => {
        val nChunks = ceil(octet_length(payload) / lit(256.0)).cast("int")
        // guard nChunks=0: sequence(0, -1) counts DOWN ([0,-1]) instead
        // of yielding an empty list — an empty payload must chunk to
        // zero rows, like the oracle's generate_series(1, 0)
        val idx = when(nChunks > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(transform(idx,
              i => substring(payload, i * 256 + 1, lit(256)))))
          .select(col("doc_id"), col("pos").as("chunk_idx"),
            octet_length(col("col")).as("chunk_bytes"),
            md5(col("col")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""SELECT doc_id, CAST(i - 1 AS INT) AS chunk_idx,
        CAST(octet_length(encode(substr(text,
          CAST((i - 1) * 256 + 1 AS INT), 256))) AS INT) AS chunk_bytes,
        md5(substr(text, CAST((i - 1) * 256 + 1 AS INT), 256)) AS chunk_md5
      FROM (SELECT doc_id, text, unnest(generate_series(1,
              CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT))) AS i
            FROM documents) t
      ORDER BY doc_id, chunk_idx""")),

    // ---- frame sampling (video-style temporal downsample): treat the
    //      payload as 64-byte "frames", keep a uniform-stride sample of
    //      at most 8 frames per clip — the budget-bounded selection a
    //      video pipeline runs before decoding anything. All integer
    //      arithmetic (stride = ceil(frames/8), stepped sequence), so
    //      the oracle recomputes it exactly; per-frame decode would
    //      slot into m03's batched stub downstream ----
    QuerySpec(
      "m04_frame_sample",
      (s, d) => {
        val frameSz = 64
        val maxFrames = 8
        val nFrames = ceil(octet_length(payload) / lit(frameSz.toDouble))
          .cast("int")
        val stride = greatest(
          ceil(nFrames / lit(maxFrames.toDouble)).cast("int"), lit(1))
        val idx = when(nFrames > 0,
          sequence(lit(0), nFrames - 1, stride))
          .otherwise(array().cast("array<int>"))
        Tables.documents(s, d)
          .select(col("doc_id"), nFrames.as("n_frames"),
            posexplode(transform(idx,
              i => substring(payload, i * frameSz + 1, lit(frameSz)))))
          .select(col("doc_id"), col("n_frames"),
            col("pos").as("sample_idx"),
            octet_length(col("col")).as("frame_bytes"),
            md5(col("col")).as("frame_md5"))
          .orderBy("doc_id", "sample_idx")
      },
      Some("""SELECT doc_id, CAST(nf AS INT) AS n_frames,
        CAST(i // stride AS INT) AS sample_idx,
        CAST(octet_length(encode(substr(text,
          CAST(i * 64 + 1 AS INT), 64))) AS INT) AS frame_bytes,
        md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_md5
      FROM (
        SELECT doc_id, text, nf, stride,
          unnest(generate_series(0, nf - 1, stride)) AS i
        FROM (
          SELECT doc_id, text,
            CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS nf,
            greatest(CAST(ceil(ceil(octet_length(encode(text)) / 64.0)
              / 8.0) AS BIGINT), 1) AS stride
          FROM documents) b) t
      ORDER BY doc_id, sample_idx""")),

    // ---- stubbed decode → features (typed mapPartitions path). The
    //      stub's features are deterministic byte math, so the oracle
    //      can recompute them exactly: fixture text is ASCII, hence
    //      ascii(char) == byte value and char offsets == byte offsets.
    //      Division parity: int sum / int len is one correctly-rounded
    //      double op in both engines ----
    QuerySpec(
      "m03_decode_features",
      (s, d) => decodeStub(s, Tables.documents(s, d)).orderBy("doc_id"),
      Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(list_sum(list_transform(str_split(text, ''),
                    c -> ascii(c))) AS DOUBLE) / octet_length(encode(text))
        END AS mean_byte,
        array_to_string(list_transform(str_split(text, '')[1:4],
          c -> CAST(ascii(c) AS VARCHAR)), ',') AS head
      FROM documents ORDER BY doc_id""")),

    // ---- image tiling (ViT-style patch grid): synthesize per-doc
    //      image dimensions from metadata (deterministic integer
    //      derivation — the fixtures carry no real pixels), cover each
    //      image with 128×128 tiles, emit one row per tile with its
    //      clipped pixel box. This is the vision-preprocessing twin of
    //      m02's chunking: the explode is the Spark-native fan-out (a
    //      tile row per (tx, ty)), all integer math so the oracle
    //      recomputes every box exactly. Scale shape: per-row explode
    //      of a bounded grid (≤ ceil(w/128)·ceil(h/128) tiles), no
    //      shuffle at all until the output sort; the downstream crop/
    //      resize would run per-tile through m03's batched decode. ----
    QuerySpec(
      "m05_tile_grid",
      (s, d) => {
        val w = (lit(64) + pmod(col("n_chars"), lit(577))).as("w")
        val h = (lit(64) + pmod(col("n_chars") * 7, lit(431))).as("h")
        val ts = 128
        val base = Tables.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id"), w, h)
          .withColumn("nx", floor((col("w") + ts - 1) / ts).cast("long"))
          .withColumn("ny", floor((col("h") + ts - 1) / ts).cast("long"))
        base
          .select(col("doc_id"), col("w"), col("h"), col("ny"),
            explode(sequence(lit(0L), col("nx") - 1)).as("tx"))
          .select(col("doc_id"), col("w"), col("h"), col("tx"),
            explode(sequence(lit(0L), col("ny") - 1)).as("ty"))
          .select(col("doc_id"), col("tx"), col("ty"),
            (col("tx") * ts).as("x0"), (col("ty") * ts).as("y0"),
            least(col("tx") * ts + ts, col("w")).as("x1"),
            least(col("ty") * ts + ts, col("h")).as("y1"))
          .orderBy("doc_id", "tx", "ty")
      },
      Some("""SELECT doc_id, tx, ty,
        tx * 128 AS x0, ty * 128 AS y0,
        least(tx * 128 + 128, w) AS x1,
        least(ty * 128 + 128, h) AS y1
      FROM (
        SELECT doc_id, w, h, tx,
          unnest(generate_series(0, (h + 127) // 128 - 1)) AS ty
        FROM (
          SELECT doc_id, w, h,
            unnest(generate_series(0, (w + 127) // 128 - 1)) AS tx
          FROM (SELECT doc_id,
                  64 + (n_chars % 577) AS w,
                  64 + ((n_chars * 7) % 431) AS h
                FROM documents WHERE doc_id < 200) dims) tq) t
      ORDER BY doc_id, tx, ty""")),

    // ---- modality routing by magic bytes: the dispatch step in
    //      front of every multimodal decode fan-out. Mixed-modality
    //      ingest (the reference's drive listing returns pdf, docx,
    //      png, … side by side — `sharepoint_to_bronze_delta.py:
    //      163-176` fetches them all through one blob path) cannot
    //      trust metadata columns; production routers SNIFF the
    //      payload's leading bytes (JPEG FF D8 FF, PNG 89 50 4E 47,
    //      RIFF 52 49 46 46) and route each row to its decoder.
    //      Fixtures have no real media, so the payload is synthesized
    //      by prepending a signature header chosen from the source id
    //      — the ROUTER then recovers modality from the BYTES ALONE
    //      (sniff = hex of the first 4 bytes; the metadata column is
    //      only used to prove lineage via n_sources). Per-row
    //      projection + one rollup: no extra shuffle beyond the
    //      4-group aggregate; at 100 TB the same `repartition(
    //      $"modality")` feeds per-modality decoder pools. ----
    QuerySpec(
      "m06_modality_route",
      (s, d) => {
        val srcN = substring(col("source"), 4, 10).cast("int")
        val hdrHex = when(pmod(srcN, lit(4)) === 0, lit("FFD8FFE0"))
          .when(pmod(srcN, lit(4)) === 1, lit("89504E47"))
          .when(pmod(srcN, lit(4)) === 2, lit("52494646"))
          .otherwise(lit(""))
        val sniffed = Tables.documents(s, d)
          .select(col("source"),
            concat(unhex(hdrHex), payload).as("payload"))
          .withColumn("sig", hex(expr("substring(payload, 1, 4)")))
        sniffed
          .withColumn("modality",
            when(col("sig").startsWith("FFD8FF"), "image/jpeg")
              .when(col("sig").startsWith("89504E47"), "image/png")
              .when(col("sig").startsWith("52494646"), "audio/riff")
              .otherwise("text/plain"))
          .groupBy(col("modality"))
          .agg(count(lit(1)).as("n_docs"),
            sum(octet_length(col("payload"))).as("n_bytes"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy("modality")
      },
      Some("""WITH p AS (SELECT source,
          CASE CAST(substr(source, 4) AS INT) % 4
            WHEN 0 THEN unhex('FFD8FFE0') || encode(text)
            WHEN 1 THEN unhex('89504E47') || encode(text)
            WHEN 2 THEN unhex('52494646') || encode(text)
            ELSE encode(text) END AS payload
        FROM documents),
      s AS (SELECT source, payload,
          substr(hex(payload), 1, 8) AS sig FROM p)
      SELECT CASE WHEN sig LIKE 'FFD8FF%' THEN 'image/jpeg'
                  WHEN sig LIKE '89504E47%' THEN 'image/png'
                  WHEN sig LIKE '52494646%' THEN 'audio/riff'
                  ELSE 'text/plain' END AS modality,
        COUNT(1) AS n_docs,
        CAST(SUM(octet_length(payload)) AS BIGINT) AS n_bytes,
        COUNT(DISTINCT source) AS n_sources
      FROM s GROUP BY 1 ORDER BY 1"""))
  )
}
