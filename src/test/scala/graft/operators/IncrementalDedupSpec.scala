package graft.operators

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def store(): String =
    java.nio.file.Files.createTempDirectory("graft-inc-dedup").toString + "/fp"

  test("first batch keeps in-batch canonicals and seeds the store") {
    val path = store()
    val b1 = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
      .toDF("doc_id", "text")
    val kept = IncrementalDedup.dedupAgainstStore(b1, path)
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(spark.read.parquet(path).count() == 2)
  }

  test("later batches drop docs already fingerprinted in any earlier run") {
    val path = store()
    IncrementalDedup.dedupAgainstStore(
      Seq((1L, "alpha"), (3L, "beta")).toDF("doc_id", "text"), path)
    val b2 = Seq((10L, "alpha"), (11L, "gamma"), (12L, "gamma"))
      .toDF("doc_id", "text")
    val kept2 = IncrementalDedup.dedupAgainstStore(b2, path)
    // alpha seen in run 1; gamma canonicalizes in-batch to doc 11
    assert(kept2.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(11L))
    // replaying the same batch keeps nothing (store now has gamma)
    val kept3 = IncrementalDedup.dedupAgainstStore(b2, path)
    assert(kept3.count() == 0)
  }
}
