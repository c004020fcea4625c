package graft.ops

import graft.core.{QueryDef, Tables, Text}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary payload) column plumbing.
  *
  * The engine treats image/audio/video as opaque BINARY columns with typed
  * metadata (builder brief). The container has no image/audio codecs, so
  * the DECODE STEP IS A DETERMINISTIC FAKE (clearly marked below); what is
  * real — and what these queries/tests exercise — is the Spark-side
  * plumbing: binary column schema, metadata struct carry-through,
  * partition-parallel batch processing shape, and frame-index explosion.
  *
  * The `media` frame derives payloads from `documents.text` (UTF-8 bytes)
  * so every byte is deterministic and DuckDB can mirror it (`encode()`).
  */
object Multimodal {

  /** documents → media: payload BINARY + meta STRUCT — the multimodal
    * column layout (payload stays opaque; metadata is typed and prunable).
    */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /** Feature extraction over the binary payload: byte length, 8-byte
    * header hex, FAKE-decoded dimensions (deterministic arithmetic on the
    * byte length — a real codec would parse the payload here), and frame
    * count at 32 bytes/frame.
    */
  val mediaFeatures: QueryDef = QueryDef(
    "media_features",
    (s, d) =>
      media(s, d)
        .select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          substring(hex(col("payload")), 1, 16).as("hdr_hex"),
          // FAKE decode: dimensions derived from length, not pixel data
          (col("doc_id") % 64 * 16 + 320).cast("int").as("width"),
          (length(col("payload")) % 480 + 120).cast("int").as("height"),
          ceil(length(col("payload")) / lit(32.0)).cast("long").as("n_frames"),
          col("meta.lang").as("lang"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             substr(hex(encode(text)), 1, 16) AS hdr_hex,
             CAST(doc_id % 64 * 16 + 320 AS INT) AS width,
             CAST(octet_length(encode(text)) % 480 + 120 AS INT) AS height,
             CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT) AS n_frames,
             lang
      FROM documents ORDER BY doc_id
    """),
    doc = "binary payload feature-extract (decode step: deterministic fake)")

  /** Frame sampling: explode each payload's frame index space, keep every
    * 4th frame, emit a per-frame content id (md5 of payload-slice hex —
    * deterministic; a real pipeline would hand the slice to a decoder).
    * The explode is row-local; downstream stays partition-parallel.
    */
  val frameSample: QueryDef = QueryDef(
    "frame_sample",
    (s, d) =>
      media(s, d)
        .withColumn("n_frames",
          ceil(length(col("payload")) / lit(32.0)).cast("int"))
        .select(col("doc_id"), col("payload"),
          explode(expr("sequence(0, n_frames - 1)")).as("frame_i"))
        .filter(col("frame_i") % 4 === 0)
        .select(col("doc_id"), col("frame_i"),
          substring(md5(substring(hex(col("payload")),
            col("frame_i") * 64 + 1, lit(64))), 1, 8).as("frame_id"))
        .orderBy(col("doc_id"), col("frame_i")),
    Some("""
      WITH m AS (SELECT doc_id, hex(encode(text)) AS ph,
                        CAST(ceil(octet_length(encode(text)) / 32.0) AS INT) AS n_frames
                 FROM documents),
      f AS (SELECT doc_id, ph, unnest(generate_series(0, n_frames - 1)) AS frame_i FROM m)
      SELECT doc_id, CAST(frame_i AS INTEGER) AS frame_i,
             substr(md5(substr(ph, frame_i * 64 + 1, 64)), 1, 8) AS frame_id
      FROM f WHERE frame_i % 4 = 0 ORDER BY doc_id, frame_i
    """),
    doc = "frame sampling: row-local index explode, every 4th frame")

  // ---- batch-shape plumbing (mapPartitions; tested, not oracle-checked) --

  /** Typed row for the partition-batch decode path. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], lang: String)

  /** Extracted features per media row. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, checksum: Long, lang: String)

  /** Partition-parallel batch feature extraction — the Scala analog of a
    * pandas-batch UDF: one iterator pass per partition, constant memory,
    * no driver involvement. The per-byte "feature" is a FAKE decode
    * (rolling checksum); a real implementation would decode the payload
    * with a codec library here, batch by batch.
    */
  def decodeBatch(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        var sum = 0L
        var i = 0
        while (i < r.payload.length) {
          sum = (sum * 31 + (r.payload(i) & 0xff)) % Text.P
          i += 1
        }
        MediaFeatures(r.doc_id, r.payload.length, sum, r.lang)
      }
    }
  }

  /** The `binaryFile` SOURCE — how raw media lands in the engine before
    * any table exists: one row per file (path, modificationTime, length,
    * content BINARY), ingestion parallelized across files (each file is
    * one task input; a million-file corpus fans out across the cluster
    * with no driver-side reading). Fixture: 64 driver-written .bin files
    * whose bytes are a pure function of the file index, so the DuckDB
    * oracle regenerates the same bytes from `range(64)` without touching
    * the filesystem. `pathGlobFilter` shows server-side listing-level
    * file pruning (the decoy .tmp file never reaches a task).
    */
  val binaryFilesScan: QueryDef = QueryDef(
    "binary_files_scan",
    (s, d) => {
      val dir = new java.io.File(
        s"target/graft_bin_${d.replaceAll("[^A-Za-z0-9.]", "_")}_" +
          ProcessHandle.current().pid()).getAbsoluteFile
      dir.mkdirs()
      val digest = java.security.MessageDigest.getInstance("MD5")
      def hex(t: String): String =
        digest.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 64).foreach { i =>
        val content = hex(i.toString) * (i % 7 + 1)
        java.nio.file.Files.write(
          dir.toPath.resolve(f"doc_$i%03d.bin"),
          content.getBytes("UTF-8"))
      }
      java.nio.file.Files.write( // decoy: must be pruned by the glob
        dir.toPath.resolve("skip_me.tmp"), "x".getBytes("UTF-8"))
      s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
        .load(dir.getAbsolutePath)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
            .cast("long").as("file_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy(col("file_id"))
    },
    Some("""
      SELECT i AS file_id, CAST(32 * ((i % 7) + 1) AS BIGINT) AS n_bytes,
             md5(repeat(md5(CAST(i AS VARCHAR)), CAST((i % 7) + 1 AS INTEGER))) AS content_md5
      FROM range(64) t(i)
      ORDER BY file_id
    """),
    doc = "binaryFile source: per-file opaque-bytes ingestion + glob pruning")

  val all: Seq[QueryDef] = Seq(mediaFeatures, frameSample, binaryFilesScan)
}
