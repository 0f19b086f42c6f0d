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

  test("feature extraction emits one row per payload with sane dims") {
    val f = Multimodal.extractFeatures(media)
    assert(f.count() == media.count())
    assert(f.filter($"width" < 1 || $"width" > 640).count() == 0)
    assert(f.filter($"height" < 1 || $"height" > 480).count() == 0)
    assert(f.filter($"mean_luma" < 0.0 || $"mean_luma" > 1.0).count() == 0)
  }

  test("frame sampling yields ceil(n_frames/stride) bounded slices") {
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val perDoc = frames.groupBy($"doc_id").count()
    val expected = Multimodal.extractFeatures(media)
      .select($"doc_id", ceil($"n_frames" / 4.0).as("want"))
    assert(perDoc.join(expected, Seq("doc_id"))
      .filter($"count" =!= $"want").count() == 0)
    assert(frames.filter(length($"frame_bytes") > 16).count() == 0)
  }

  test("resize metadata preserves aspect ratio and caps the max side") {
    val rs = Multimodal.resizeMeta(Multimodal.extractFeatures(media), maxDim = 224)
    assert(rs.filter($"target_w" > 224 || $"target_h" > 224).count() == 0)
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
