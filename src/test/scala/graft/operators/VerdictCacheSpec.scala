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
}
