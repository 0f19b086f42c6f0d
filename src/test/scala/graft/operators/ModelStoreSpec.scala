package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col

/** r16 verdict item 3: trained ANN models persist fingerprint-keyed
  * (`Dedup.memoModelDisk`) so Lloyd training is index-build cost, not
  * per-query cold latency. The contract under test: (a) a file-backed
  * corpus trains ONCE and later calls — including across fresh
  * JVM-level caches, i.e. fresh sessions — load the identical model
  * from disk; (b) changing the corpus retrains (staleness contract
  * shared with the verdict memo); (c) codecs round-trip exactly;
  * (d) non-file relations never touch the disk tier.
  */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshCache() = new java.util.concurrent.ConcurrentHashMap[
    LogicalPlan, AnyRef]()

  private def writeVecs(dir: java.io.File, n: Int, shift: Double,
                        dim: Int = 3): Unit =
    (0 until n).map(i => (i.toLong,
      Array.tabulate(dim)(d => i * 0.5 + shift + d * 0.125 - 1.0 / (i + d + 1))
        .map(_.toFloat)))
      .toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)

  test("models train once per corpus fingerprint and reload bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("model-store").toFile
    try {
      writeVecs(dir, 20, 0.0)
      def df() = spark.read.parquet(dir.getAbsolutePath)
      var trains = 0
      val kind = s"spec_model_${System.nanoTime()}"
      def call(cache: java.util.concurrent.ConcurrentHashMap[LogicalPlan, AnyRef]) =
        Dedup.memoModelDisk(cache, df(), kind) {
          trains += 1
          Array(Array(1.0, -0.000001), Array(math.Pi, 1e300))
        }(Similarity.encodeMatrix)(Similarity.decodeMatrix)
      val m1 = call(freshCache())
      // FRESH cache — only the disk tier can satisfy this call
      val m2 = call(freshCache())
      assert(trains == 1, s"same-fingerprint corpus retrained ($trains trains)")
      assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq,
        "reloaded model must round-trip exactly (Double.toString/parseDouble)")
      // changed corpus: fingerprint moves, must retrain
      writeVecs(dir, 20, 7.0)
      call(freshCache())
      assert(trains == 2, s"changed corpus did not retrain ($trains trains)")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("non-file relations train per cache, never touching disk") {
    var trains = 0
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    def call() = Dedup.memoModelDisk(freshCache(), df, "spec_model_mem") {
      trains += 1; Array(Array(1.0))
    }(Similarity.encodeMatrix)(Similarity.decodeMatrix)
    call(); call()
    assert(trains == 2,
      "a synthetic relation has no stable content key and must train per cache")
  }

  test("derived-store LRU: eviction drops oldest past the cap, touch refreshes") {
    // r16 verdict item 6: target/derived/{models,verdicts} accumulate
    // one entry per corpus fingerprint forever. The stores are caches
    // (a stale eviction only costs a retrain/re-probe), so they are
    // bounded LRU-by-mtime: memoModelDisk/memoVerdictDisk touch on
    // disk-hit and evict past DerivedStore.{ModelCap,VerdictCap} on
    // write — this spec drives the shared mechanism directly.
    val dir = java.nio.file.Files.createTempDirectory("derived-lru").toFile
    try {
      def mk(name: String, ageSec: Long): java.io.File = {
        val f = new java.io.File(dir, name)
        java.nio.file.Files.writeString(f.toPath, "x")
        java.nio.file.Files.setLastModifiedTime(f.toPath,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - ageSec * 1000))
        f
      }
      (1 to 6).foreach(i => mk(s"m$i", ageSec = 100 - i)) // m1 oldest
      mk("half.tmp", ageSec = 1000) // in-flight write: never a victim
      DerivedStore.evictPast(dir, cap = 4)
      val left = dir.listFiles().map(_.getName).toSet
      assert(left == Set("m3", "m4", "m5", "m6", "half.tmp"),
        s"oldest-2 eviction expected, got $left")
      // a disk-hit touch must move its entry to the LRU front
      DerivedStore.touch(new java.io.File(dir, "m3"))
      mk("m7", ageSec = 0)
      DerivedStore.evictPast(dir, cap = 4)
      val left2 = dir.listFiles().map(_.getName).toSet
      assert(left2 == Set("m3", "m5", "m6", "m7", "half.tmp"),
        s"touched m3 must survive and untouched-oldest m4 must go, got $left2")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("pq pair codec round-trips coarse + nested codebooks exactly") {
    val dir = java.nio.file.Files.createTempDirectory("model-pq").toFile
    try {
      writeVecs(dir, 64, 0.0, dim = 64)
      // drive the REAL trainedPqModels twice through its production
      // cache: second call is a memo hit (no extra Spark jobs), and
      // the persisted file decodes to the trained model exactly
      val emb = spark.read.parquet(dir.getAbsolutePath)
        .select(col("vec_id"), col("embedding"))
      val (c1, m1) = ProductQuantization.trainedPqModels(emb)
      val (c2, m2) = ProductQuantization.trainedPqModels(emb)
      assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
      assert(m1.map(_.map(_.toSeq).toSeq).toSeq == m2.map(_.map(_.toSeq).toSeq).toSeq)
      assert(c1.length == ProductQuantization.CoarseCells)
      assert(m1.length == ProductQuantization.M)
      assert(m1.forall(_.length == ProductQuantization.CodebookK))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
