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

  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])
  final case class ResizedMeta(doc_id: Long, width: Int, height: Int,
                               target_w: Int, target_h: Int, scale: Double)

  /** Frame sampling: every `stride`-th 16-byte slice of the payload
    * becomes a "frame" row (1→N explode with bounded memory — the
    * slice, not the whole payload, flows downstream). Real video
    * decode would replace the slicing; the iterator shape is the
    * point.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = r.content.length / 16 + 1
        (0 until nFrames by stride).iterator.map { i =>
          val from = math.min(i * 16, r.content.length)
          val until = math.min(from + 16, r.content.length)
          Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.content, from, until))
        }
      }
    }
  }

  /** Resize stub: computes the target geometry (fit into maxDim,
    * aspect preserved) from the fake decoded dims — the ??? real
    * pixel resample is the stubbed step; the metadata math and
    * batched execution shape are real.
    */
  def resizeMeta(features: Dataset[MediaFeatures], maxDim: Int = 224): Dataset[ResizedMeta] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      ResizedMeta(f.doc_id, f.width, f.height,
        math.max(1, math.round(f.width * scale).toInt),
        math.max(1, math.round(f.height * scale).toInt), scale)
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
