package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via an imperative
  * per-partition pass (`Dataset.mapPartitions` — the Scala analogue
  * of a batched pandas UDF: iterator-in/iterator-out, one invocation
  * per partition, no per-row closure dispatch).
  *
  * The actual image/audio decode is STUBBED (no media libs in this
  * environment): `decodeStub` derives deterministic fake
  * width/height/luma from an md5 of the payload bytes. Everything
  * around the stub — the binary column, metadata struct, typed
  * Dataset boundary, partition-batched execution shape, and the
  * schema of the decoded output — is real, tested, and
  * oracle-verified (the md5 derivation is reproducible in SQL).
  *
  * Scale notes: payload rows never shuffle — decode is a narrow map;
  * only the small extracted-feature rows flow downstream. At 100 TB
  * you'd co-locate decode with the scan and write features columnar,
  * exactly this plan shape.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, content: Array[Byte], mime: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
                                 height: Int, n_frames: Long, mean_luma: Double)

  /** ??? real decode goes here — stubbed deterministically: the
    * md5-derived 60-bit int of the payload stands in for decoded
    * pixel statistics.
    */
  private def decodeStub(doc_id: Long, content: Array[Byte]): MediaFeatures = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val h = java.lang.Long.parseLong(
      d.digest(content).map(b => f"$b%02x").mkString.take(15), 16)
    MediaFeatures(
      doc_id = doc_id,
      n_bytes = content.length.toLong,
      width = (h % 640L).toInt + 1,
      height = ((h / 640L) % 480L).toInt + 1,
      n_frames = content.length / 16L + 1L, // frame-sample: 1 per 16 bytes
      mean_luma = (h % 256L).toDouble / 255.0)
  }

  /** documents.text re-framed as an opaque binary payload column with
    * typed metadata — the ingest shape for image/audio/video blobs.
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
      col("text").cast("binary").as("content"),
      lit("application/octet-stream").as("mime")).as[MediaRow]
  }

  /** Partition-batched decode/feature-extract (pandas-UDF-shaped). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would init the real codec once here
      rows.map(r => decodeStub(r.doc_id, r.content))
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, dir) => {
      extractFeatures(mediaTable(Tables(s, dir).documents)).toDF()
        .withColumn("mean_luma", round(col("mean_luma"), 4))
    })
  )

  /** The decode stub is md5-derived, so DuckDB reproduces it exactly:
    * the oracle IS the spec of the fake decode.
    */
  def oracles: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id,
        |  cast(octet_length(text::BLOB) AS bigint) AS n_bytes,
        |  cast(('0x' || substr(md5(text), 1, 15))::bigint % 640 + 1 AS int) AS width,
        |  cast((('0x' || substr(md5(text), 1, 15))::bigint // 640) % 480 + 1 AS int) AS height,
        |  cast(octet_length(text::BLOB) // 16 + 1 AS bigint) AS n_frames,
        |  round((('0x' || substr(md5(text), 1, 15))::bigint % 256)::DOUBLE / 255.0, 4) AS mean_luma
        |FROM documents""".stripMargin
  )
}
