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
  * ALL decode paths here run REAL JDK codecs: `javax.imageio` for
  * PNG (extractFeatures, decodeStats) and `javax.sound.sampled` for
  * WAV (audioStats). The payloads are deterministic synthetic media
  * encoded through the same codecs, so every decoded statistic is
  * reproducible arithmetically by an oracle that never sees the
  * container — agreement proves the container parse, inflate,
  * filter-reconstruction, and sample readback are exact.
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

  /** Decode a PNG payload through an EXPLICIT memory-cached ImageIO
    * stream. ImageIO defaults to DISK-backed stream caching — every
    * read/write spills through a temp file in java.io.tmpdir, measured
    * 2.5× slower single-threaded and the source of 10× rep swings
    * under 32 concurrent tasks + neighbor IO (r14). r14 disabled it
    * with `ImageIO.setUseCache(false)`, but that is a JVM-GLOBAL
    * static mutation performed inside executor tasks: it silently
    * changed stream caching for every other ImageIO user in the
    * process (driver included in local mode) and was never restored.
    * Wrapping the byte stream in [[javax.imageio.stream.MemoryCacheImageInputStream]]
    * scopes the no-disk-cache choice to exactly these operators.
    * Payloads here are KB-scale PNGs, so the in-heap cache is a few
    * pages per in-flight image — not a heap-pressure concern even at
    * 32 concurrent tasks (and a 100 TB deployment would budget decode
    * heap per-payload regardless of the cache strategy).
    *
    * `ImageIO.read(ImageInputStream)` closes the stream itself on
    * every path that found a reader; the no-reader path returns null
    * (turned into a require failure here) and the unclosed wrapper
    * over a ByteArrayInputStream holds no OS resource.
    */
  private def readPng(bytes: Array[Byte], docId: Long): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    require(img != null, s"doc $docId: payload is not a decodable image")
    img
  }

  /** PNG-encode through an explicit memory-cached ImageIO stream (see
    * [[readPng]] — same rationale, write direction). `close()` flushes
    * the memory cache's tail into the byte sink, so it must run before
    * `toByteArray`.
    */
  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    bos.toByteArray
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

  /** Partition-batched decode/feature-extract over REAL image
    * payloads (pandas-UDF-shaped). The stage consumes only the binary
    * column: `javax.imageio` parses the PNG container and the raster
    * is read back pixel-by-pixel. `n_bytes` is the DECODED sample
    * byte count (w·h for 8-bit grayscale — the decoded size is what a
    * training pipeline budgets on, not the compressed container),
    * `n_frames` is 1 for a still image, `mean_luma` is the exact
    * IEEE division px_sum / (w·h·255) of exactly-representable
    * integers, so the oracle reproduces it bit-for-bit.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = readPng(r.content, r.doc_id)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        MediaFeatures(r.doc_id, n_bytes = w.toLong * h, width = w, height = h,
          n_frames = 1L, mean_luma = sum.toDouble / (w.toDouble * h * 255.0))
      }
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

  /** Resize planning: computes the target geometry (fit into maxDim,
    * aspect preserved) from the real decoded dims. Emitting geometry
    * instead of resampled pixels is deliberate — a 100 TB pipeline
    * plans the resize (and batches the actual resample inside the
    * same narrow decode pass) rather than shuffling pixel payloads.
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

  // ---- PNG payload synthesis + exact-stats decode --------------------
  // (r12 verdict #3; r14 re-pointed `multimodal_features` here too.)
  // Each doc gets a deterministic synthetic grayscale image (pixel(x, y) =
  // (x + y + doc_id) mod 256, dimensions derived from doc_id), encoded
  // to REAL PNG bytes with `javax.imageio` (zlib deflate, PNG filters,
  // gray color model — the JDK's actual codec). The decode stage sees
  // ONLY the binary column — it parses the PNG container, inflates,
  // de-filters, and reads pixels back through the raster API; the
  // oracle recomputes width/height/pixel-sum ARITHMETICALLY from
  // doc_id, so a broken codec roundtrip (wrong dims, wrong samples,
  // wrong filter reconstruction) fails the hash gate.
  //
  // Scale shape: encode and decode are both narrow mapPartitions
  // passes (codec state per partition, no per-row init); payloads
  // never shuffle — only the small stats rows flow downstream. At
  // 100 TB of images this is the plan you want: decode co-located
  // with the scan, features written columnar.

  /** Deterministic synthetic image geometry: wide enough to exercise
    * multi-scanline filtering, small enough that the oracle's
    * per-pixel arithmetic stays trivial at gate scale.
    */
  private[operators] def synthDims(docId: Long): (Int, Int) =
    (16 + (docId % 32L).toInt, 16 + (docId % 24L).toInt)

  /** Grayscale sample at (x, y) for doc `docId` — the SHARED spec of
    * the image content, reproduced arithmetically by the oracle.
    */
  @inline private[operators] def synthLuma(docId: Long, x: Int, y: Int): Int =
    (((x + y).toLong + docId) % 256L).toInt

  /** Encode each doc's synthetic image to real PNG bytes (TYPE_BYTE_GRAY
    * BufferedImage → ImageIO PNG writer). One narrow pass; the heavy
    * bytes stay inside the partition.
    */
  def syntheticPngTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = synthDims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, synthLuma(id, x, y)); x += 1 }
          y += 1
        }
        MediaRow(id, encodePng(img), "image/png")
      }
    }
  }

  final case class DecodedStats(doc_id: Long, width: Int, height: Int,
                                px_sum: Long, mean_luma_e6: Long)

  /** REAL decode: parse the PNG payload with `javax.imageio`, read
    * every pixel back through the raster, emit exact integer stats.
    * Consumes only (doc_id, content) — the codec is the unit under
    * test, not the synthesis. mean_luma_e6 is an integral DIV of
    * positives (Spark truncates, DuckDB floors — equal on positives).
    */
  def decodeStats(media: Dataset[MediaRow]): Dataset[DecodedStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = readPng(r.content, r.doc_id)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        DecodedStats(r.doc_id, w, h, sum, 1000000L * sum / (w.toLong * h))
      }
    }
  }

  // ---- REAL audio decode (the WAV twin of the PNG row) --------------
  // Same contract: deterministic synthetic 16-bit PCM mono signals,
  // encoded into a REAL RIFF/WAVE container by `javax.sound.sampled`
  // (the JDK's actual audio codec), decoded back by a stage that sees
  // only the bytes (RIFF chunk walk, fmt parse, little-endian signed
  // sample reconstruction), stats verified against an arithmetic
  // oracle that never touches the container.

  /** Frame count and sample spec of doc `docId`'s synthetic signal —
    * the shared spec both the encoder and the oracle compute.
    * sample(i) = ((i·37 + docId) mod 8192) − 4096: full signed range
    * coverage, no float anywhere.
    */
  private[operators] def synthFrames(docId: Long): Int =
    256 + (docId % 512L).toInt
  @inline private[operators] def synthSample(docId: Long, i: Int): Int =
    (((i.toLong * 37L + docId) % 8192L) - 4096L).toInt

  final case class AudioStats(doc_id: Long, n_frames: Long, amp_sum: Long,
                              amp_abs_sum: Long, amp_sq_sum: Long,
                              mean_abs_e6: Long)

  /** Encode each doc's synthetic PCM signal to real WAV bytes. */
  def syntheticWavTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      ids.map { id =>
        val n = synthFrames(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = synthSample(id, i)
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, bos.toByteArray, "audio/wav")
      }
    }
  }

  /** REAL decode: parse the WAV container with the JDK codec, read
    * every 16-bit little-endian signed frame back, emit exact integer
    * stats. mean_abs_e6 is an integral DIV of POSITIVES (abs sum), so
    * Spark's truncation ≡ DuckDB's floor; amp_sum stays a raw sum
    * (signed division would diverge between the engines).
    */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        require(in.getFormat.getSampleSizeInBits == 16 &&
          in.getFormat.getChannels == 1, s"doc ${r.doc_id}: unexpected format")
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        var (sum, absSum, sqSum) = (0L, 0L, 0L)
        var i = 0
        while (i < n) {
          val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          sum += v; absSum += math.abs(v); sqSum += v.toLong * v
          i += 1
        }
        AudioStats(r.doc_id, n.toLong, sum, absSum, sqSum,
          if (n == 0) 0L else 1000000L * absSum / n)
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // real-codec end to end: encode synthetic images to actual PNG
    // bytes, decode them back with ImageIO, emit the feature schema a
    // training pipeline consumes (decoded size, dims, frames, luma)
    "multimodal_features" -> ((s, dir) =>
      extractFeatures(syntheticPngTable(Tables(s, dir).documents)).toDF()),
    "media_decode_stats" -> ((s, dir) =>
      decodeStats(syntheticPngTable(Tables(s, dir).documents)).toDF()),
    "media_audio_stats" -> ((s, dir) =>
      audioStats(syntheticWavTable(Tables(s, dir).documents)).toDF())
  )

  /** Every oracle recomputes the decoded statistics ARITHMETICALLY
    * from doc_id — none sees a container byte — so a hash match is a
    * proof the JDK codec roundtrip reconstructed the media exactly.
    */
  def oracles: Map[String, String] = Map(
    // feature schema over the real PNG decode: dims = 16+(id%32) ×
    // 16+(id%24), pixel(x,y) = (x+y+id)%256; n_bytes is the DECODED
    // sample count (w·h); mean_luma is an IEEE division of
    // exactly-representable integers — bit-identical across engines
    "multimodal_features" ->
      """WITH dims AS (
        |  SELECT doc_id, 16 + (doc_id % 32) AS w, 16 + (doc_id % 24) AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM dims),
        |xy AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs),
        |px AS (
        |  SELECT doc_id, w, h,
        |    cast(sum((x + y + doc_id) % 256) AS bigint) AS px_sum
        |  FROM xy GROUP BY doc_id, w, h)
        |SELECT doc_id, cast(w * h AS bigint) AS n_bytes,
        |  cast(w AS int) AS width, cast(h AS int) AS height,
        |  cast(1 AS bigint) AS n_frames,
        |  px_sum / (w * h * 255) AS mean_luma
        |FROM px""".stripMargin,
    // the REAL-decode row: the oracle recomputes the synthetic image's
    // stats arithmetically from doc_id (pixel(x,y) = (x+y+doc_id)%256,
    // dims = 16+(id%32) × 16+(id%24)) — it never sees the PNG bytes,
    // so agreement proves the ImageIO encode→decode roundtrip
    // reconstructed every pixel exactly
    "media_decode_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, 16 + (doc_id % 32) AS w, 16 + (doc_id % 24) AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM dims),
        |xy AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs),
        |px AS (
        |  SELECT doc_id, w, h,
        |    cast(sum((x + y + doc_id) % 256) AS bigint) AS px_sum
        |  FROM xy GROUP BY doc_id, w, h)
        |SELECT doc_id, cast(w AS int) AS width, cast(h AS int) AS height,
        |  px_sum,
        |  cast((1000000 * cast(px_sum AS HUGEINT)) // (w * h) AS bigint)
        |    AS mean_luma_e6
        |FROM px""".stripMargin,
    // the WAV twin: sample(i) = ((i·37 + doc_id) % 8192) − 4096 over
    // n = 256 + doc_id % 512 frames, recomputed arithmetically — the
    // oracle never sees the RIFF container, so agreement proves the
    // JDK codec reconstructed every 16-bit little-endian frame
    "media_audio_stats" ->
      """WITH frames AS (
        |  SELECT doc_id, 256 + (doc_id % 512) AS n_frames
        |  FROM documents),
        |samp AS (
        |  SELECT doc_id, n_frames,
        |    (i * 37 + doc_id) % 8192 - 4096 AS v
        |  FROM (SELECT doc_id, n_frames, unnest(range(n_frames)) AS i
        |        FROM frames)),
        |agg AS (
        |  SELECT doc_id, n_frames,
        |    cast(sum(v) AS bigint) AS amp_sum,
        |    cast(sum(abs(v)) AS bigint) AS amp_abs_sum,
        |    cast(sum(v * v) AS bigint) AS amp_sq_sum
        |  FROM samp GROUP BY doc_id, n_frames)
        |SELECT doc_id, cast(n_frames AS bigint) AS n_frames, amp_sum,
        |  amp_abs_sum, amp_sq_sum,
        |  cast((1000000 * cast(amp_abs_sum AS HUGEINT)) // n_frames AS bigint)
        |    AS mean_abs_e6
        |FROM agg""".stripMargin
  )
}
