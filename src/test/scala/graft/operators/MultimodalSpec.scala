package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.mediaTable(Tables(spark, sf).documents)

  test("binary payload preserves the exact source bytes") {
    val back = media.toDF()
      .withColumn("round_trip", col("content").cast("string"))
      .join(Tables(spark, sf).documents, Seq("doc_id"))
    assert(back.filter($"round_trip" =!= $"text").count() == 0)
  }

  test("feature extraction REAL-decodes each PNG payload to exact features") {
    val png = Multimodal.syntheticPngTable(Tables(spark, sf).documents)
    val f = Multimodal.extractFeatures(png)
    assert(f.count() == png.count())
    val bad = f.collect().filter { r =>
      val (w, h) = Multimodal.synthDims(r.doc_id)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w)
        sum += Multimodal.synthLuma(r.doc_id, x, y)
      r.width != w || r.height != h || r.n_bytes != w.toLong * h ||
        r.n_frames != 1L ||
        r.mean_luma != sum.toDouble / (w.toDouble * h * 255.0)
    }
    assert(bad.isEmpty, s"feature mismatch for docs ${bad.map(_.doc_id).mkString(",")}")
  }

  test("frame sampling yields ceil(slices/stride) bounded slices") {
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val perDoc = frames.groupBy($"doc_id").count()
    // expected count from the payload itself: one 16-byte slice per
    // stride step over floor(len/16)+1 slices
    val expected = media.toDF()
      .select($"doc_id",
        ceil((floor(length($"content") / 16) + 1) / 4.0).as("want"))
    assert(perDoc.join(expected, Seq("doc_id"))
      .filter($"count" =!= $"want").count() == 0)
    assert(frames.filter(length($"frame_bytes") > 16).count() == 0)
  }

  test("synthetic payloads are REAL PNG files (magic header + codec-parseable)") {
    val png = Multimodal.syntheticPngTable(Tables(spark, sf).documents)
    val rows = png.limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // PNG signature: 0x89 'P' 'N' 'G' \r \n 0x1a \n
      val sig = r.content.take(8).map(_ & 0xff)
      assert(sig.sameElements(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)),
        s"doc ${r.doc_id}: payload is not a PNG container")
      assert(r.mime == "image/png")
    }
  }

  test("ImageIO decode reconstructs every pixel of the synthetic image exactly") {
    val docs = Tables(spark, sf).documents
    val stats = Multimodal.decodeStats(Multimodal.syntheticPngTable(docs))
    // closed-form recomputation of the same stats from doc_id — the
    // Scala twin of the DuckDB oracle's arithmetic
    val bad = stats.collect().filter { s =>
      val (w, h) = Multimodal.synthDims(s.doc_id)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w)
        sum += Multimodal.synthLuma(s.doc_id, x, y)
      s.width != w || s.height != h || s.px_sum != sum ||
        s.mean_luma_e6 != 1000000L * sum / (w.toLong * h)
    }
    assert(bad.isEmpty, s"decode mismatch for docs ${bad.map(_.doc_id).mkString(",")}")
    assert(stats.count() == docs.count())
  }

  test("synthetic audio payloads are REAL RIFF/WAVE containers") {
    val wav = Multimodal.syntheticWavTable(Tables(spark, sf).documents)
    val rows = wav.limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(new String(r.content.take(4), "US-ASCII") == "RIFF" &&
        new String(r.content.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc ${r.doc_id}: payload is not a WAV container")
      assert(r.mime == "audio/wav")
    }
  }

  test("WAV decode reconstructs every 16-bit frame of the synthetic signal exactly") {
    val docs = Tables(spark, sf).documents
    val stats = Multimodal.audioStats(Multimodal.syntheticWavTable(docs))
    val bad = stats.collect().filter { s =>
      val n = Multimodal.synthFrames(s.doc_id)
      var (sum, absSum, sqSum) = (0L, 0L, 0L)
      for (i <- 0 until n) {
        val v = Multimodal.synthSample(s.doc_id, i)
        sum += v; absSum += math.abs(v); sqSum += v.toLong * v
      }
      s.n_frames != n || s.amp_sum != sum || s.amp_abs_sum != absSum ||
        s.amp_sq_sum != sqSum || s.mean_abs_e6 != 1000000L * absSum / n
    }
    assert(bad.isEmpty, s"decode mismatch for docs ${bad.map(_.doc_id).mkString(",")}")
    assert(stats.count() == docs.count())
  }

  test("resize metadata preserves aspect ratio and caps the max side") {
    // maxDim 24 sits inside the synthetic dim range (16–47), so both
    // the downscale and the no-upscale branches are exercised
    val rs = Multimodal.resizeMeta(Multimodal.extractFeatures(
      Multimodal.syntheticPngTable(Tables(spark, sf).documents)), maxDim = 24)
    assert(rs.filter($"target_w" > 24 || $"target_h" > 24).count() == 0)
    assert(rs.filter($"scale" < 1.0).count() > 0, "no downscale exercised")
    // targets are the rounded scaled dims (aspect preserved up to
    // integer rounding, which dominates at extreme aspect ratios)
    val bad = rs.filter(
      abs($"target_w" - $"width" * $"scale") > 0.5 ||
      abs($"target_h" - $"height" * $"scale") > 0.5)
    assert(bad.count() == 0)
    // upscale never happens
    assert(rs.filter($"scale" > 1.0).count() == 0)
  }
}
