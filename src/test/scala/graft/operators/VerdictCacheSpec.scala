package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Pins the bounded plan-keyed verdict memo (`Dedup.memoVerdict`) that
  * the jaccard-injectivity, rep-composition, and embedding-dup gates
  * share. Each cache key retains a whole canonicalized logical plan,
  * so a long-lived session probing ever-fresh plans must not grow the
  * map without bound — and because every gated branch is exact,
  * EVICTION MUST BE INVISIBLE: a dropped memo costs one re-probe and
  * must reproduce the same verdict, never flip it.
  */
class VerdictCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshCache() = new java.util.concurrent.ConcurrentHashMap[
    LogicalPlan, java.lang.Boolean]()

  private def planOf(i: Int): LogicalPlan =
    Seq((i, s"doc_$i")).toDF("id", "text")
      .queryExecution.analyzed.canonicalized

  test("verdicts are memoized: one probe per distinct plan") {
    val cache = freshCache()
    var probes = 0
    val key = planOf(1)
    val first = Dedup.memoVerdict(cache, key) { probes += 1; true }
    val second = Dedup.memoVerdict(cache, key) { probes += 1; false } // must not run
    assert(first && second, "memo hit must return the stored verdict")
    assert(probes == 1, s"probe ran $probes times for one plan")
  }

  test("cache never grows past the cap (+1 insertion transient)") {
    val cache = freshCache()
    val n = Dedup.VerdictCacheMax + 64
    (1 to n).foreach(i => Dedup.memoVerdict(cache, planOf(i))(i % 2 == 0))
    assert(cache.size() <= Dedup.VerdictCacheMax + 1,
      s"cache grew to ${cache.size()} past cap ${Dedup.VerdictCacheMax}")
  }

  test("eviction does not change verdicts — an evicted key re-probes to the same answer") {
    val cache = freshCache()
    // deterministic per-plan verdict the way the real gates are
    // (verdicts are a pure function of the input relation)
    def verdictFor(i: Int): Boolean = i % 3 == 0
    val early = (1 to 8).map(i => i -> planOf(i))
    val before = early.map { case (i, p) =>
      i -> Dedup.memoVerdict(cache, p)(verdictFor(i))
    }.toMap
    // flood with fresh plans until every early key has been evicted
    ((100 to (100 + Dedup.VerdictCacheMax + 64)): Range)
      .foreach(i => Dedup.memoVerdict(cache, planOf(i))(verdictFor(i)))
    val evicted = early.count { case (_, p) => !cache.containsKey(p) }
    assert(evicted > 0, "flood was expected to evict at least one early key")
    // re-ask every early key: evicted ones re-probe, all answers equal
    val after = early.map { case (i, p) =>
      i -> Dedup.memoVerdict(cache, p)(verdictFor(i))
    }.toMap
    assert(after == before, "eviction flipped a verdict")
    assert(before == (1 to 8).map(i => i -> verdictFor(i)).toMap)
  }

  // ---- disk tier (r15): verdicts are corpus statistics -------------

  private def writeDocs(dir: java.io.File, rows: Seq[(Long, String)]): Unit = {
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
  }

  test("disk tier: same files skip the probe across fresh caches; changed files re-probe") {
    val dir = java.nio.file.Files.createTempDirectory("verdict-disk").toFile
    try {
      writeDocs(dir, Seq(1L -> "a b c", 2L -> "d e f"))
      def df() = spark.read.parquet(dir.getAbsolutePath)
      var probes = 0
      val kind = s"spec_${System.nanoTime()}" // unique per test run
      val v1 = Dedup.memoVerdictDisk(freshCache(), df(), kind) { probes += 1; true }
      // FRESH in-memory cache — only the disk tier can satisfy this
      val v2 = Dedup.memoVerdictDisk(freshCache(), df(), kind) { probes += 1; false }
      assert(v1 && v2, "disk tier must return the stored verdict")
      assert(probes == 1, s"same-fingerprint corpus re-probed ($probes probes)")
      // grow the corpus: fingerprint changes (size/mtime), must re-probe
      writeDocs(dir, Seq(1L -> "a b c", 2L -> "d e f", 3L -> "g h i"))
      val v3 = Dedup.memoVerdictDisk(freshCache(), df(), kind) { probes += 1; false }
      assert(!v3, "changed corpus must re-probe, not serve the stale verdict")
      assert(probes == 2, s"changed corpus did not re-probe ($probes probes)")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("disk tier: non-file relations stay JVM-memoized only (probe per cache)") {
    var probes = 0
    val df = Seq((1L, "x y")).toDF("doc_id", "text") // LocalRelation leaf
    Dedup.memoVerdictDisk(freshCache(), df, "spec_mem") { probes += 1; true }
    Dedup.memoVerdictDisk(freshCache(), df, "spec_mem") { probes += 1; true }
    assert(probes == 2,
      "a synthetic relation has no stable content key and must re-probe per cache")
  }
}
