package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 regression guards for the cold-pass plan-instability fix.
  *
  * The r8 anomaly: exchanges feeding persisted, CPU-heavy relations
  * were AQE-coalesced by BYTE size (sub-MB corpora, heavy per-row
  * compute), the cache froze the collapsed partitioning, and
  * run-to-run threshold flips made six pipelines 5–8× slower on
  * arbitrary runs. The fix pins those exchanges with explicit
  * partition counts (REPARTITION_BY_NUM, which AQE must respect).
  * These tests hold that line: if someone swaps a pinned spread back
  * to a bare `repartition(col)`, the partition count collapses under
  * AQE and the asserts here fail.
  */
class PinnedParallelismSpec extends SparkSpec {

  private def n = spark.sessionState.conf.numShufflePartitions

  test("copurchaseEdges emits the pinned partition count (both variants)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    for (ordered <- Seq(true, false)) {
      val e = ProductAnalytics.copurchaseEdges(li, ordered)
      // materialize through an action so AQE has every chance to
      // coalesce, then check the executed partitioning
      assert(e.rdd.getNumPartitions == n,
        s"ordered=$ordered: ${e.rdd.getNumPartitions} != $n")
    }
  }

  test("curation survivor cache is pinned at full parallelism") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val kept = CorpusCuration.curate(docs)
    kept.count()
    // the persisted kept2 relation feeds the CPU-bound LSH stage; its
    // cached build must hold the session's parallelism, not AQE's
    // byte-sized coalesce of a sub-MB corpus
    val cached = spark.sparkContext.getPersistentRDDs.values
    assert(cached.nonEmpty, "expected the kept2 persist to be live")
    assert(cached.exists(_.getNumPartitions == n),
      s"no cached RDD at $n partitions: ${cached.map(_.getNumPartitions)}")
    spark.catalog.clearCache()
  }

  test("pinCountForBytes floors at session parallelism, scales with bytes, caps") {
    // unknown size keeps the session value — today's pinned behavior
    assert(Parallelism.pinCountForBytes(32, -1L) == 32)
    assert(Parallelism.pinCountForBytes(32, 0L) == 32)
    // sub-target inputs (the sub-MB/CPU-heavy corpora that motivated
    // pinning) still spread across the full session parallelism
    assert(Parallelism.pinCountForBytes(32, 10L << 20) == 32)
    // a 10 GB input at 32 MB/task derives 320 tasks — the count now
    // scales with the data instead of inheriting a local[32] constant
    assert(Parallelism.pinCountForBytes(32, 10L << 30) == 320)
    // 100 TB: ceil(100e12 / 32 MB) ≈ 3.0 M would exceed the cap
    assert(Parallelism.pinCountForBytes(32, 100L * (1L << 40)) ==
      Parallelism.MaxPartitions)
    // tiny bytesPerTask on a real input: still capped
    assert(Parallelism.pinCountForBytes(32, 1L << 40, bytesPerTask = 1) ==
      Parallelism.MaxPartitions)
  }

  test("pinCount derives from leaf input bytes and the exchange honors it") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bytes = Parallelism.leafInputBytes(docs)
    assert(bytes > 0, s"leaf stats should report the parquet size, got $bytes")
    // with a toy per-task target the SAME call site that yields n on
    // this corpus yields a size-derived count — i.e. the pin scales
    // with input size rather than being a constant (r9 verdict #4)
    val tiny = 4096L
    val expected = Parallelism.pinCountForBytes(n, bytes, tiny)
    assert(expected > n, s"toy target should exceed session parallelism " +
      s"($expected vs $n, bytes=$bytes)")
    assert(Parallelism.pinCount(docs, tiny) == expected)
    // and REPARTITION_BY_NUM with the derived count survives AQE
    val spreadDf = docs.repartition(Parallelism.pinCount(docs, tiny), col("doc_id"))
    assert(spreadDf.rdd.getNumPartitions == expected,
      s"${spreadDf.rdd.getNumPartitions} != $expected")
    // default target on a sub-target corpus: unchanged local behavior
    assert(Parallelism.pinCount(docs) == n)
  }

  test("pinCount ignores unmaterialized cache leaves (join-estimate stats)") {
    // persist() rewrites the plan to an InMemoryRelation leaf whose
    // pre-materialization stats are the child's JOIN-OUTPUT estimate —
    // the r10 incident pinned the triangle adjacency at 89,594
    // partitions from exactly this. Unloaded caches must read as
    // unknown size (→ session parallelism).
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val sel = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val joined = sel.join(sel.withColumnRenamed("pk", "pk2"), Seq("ok"))
    val cached = joined.persist()
    try {
      assert(Parallelism.pinCount(cached) == n,
        s"unmaterialized cache leaf must not contribute estimate bytes: " +
          s"${Parallelism.leafInputBytes(cached)}")
      // once materialized the REAL cached bytes are trusted (tiny at
      // this sf — still the session floor)
      cached.count()
      assert(Parallelism.pinCount(cached) == n)
    } finally { cached.unpersist(true); () }
  }

  test("leafInputBytes counts a self-joined scan once, distinct scans each") {
    // an N-way self-join holds the same parquet leaf N times in the
    // plan but reads the same bytes — per-occurrence summing would
    // inflate the derived pin ~N× (r10 advice)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val single = Parallelism.leafInputBytes(docs)
    assert(single > 0)
    val self3 = docs.select(col("doc_id"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    assert(Parallelism.leafInputBytes(self3) == single,
      s"self-join triple-counted: ${Parallelism.leafInputBytes(self3)} vs $single")
    // genuinely distinct relations still sum
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val two = docs.select(col("doc_id"))
      .join(emb.select(col("vec_id").as("doc_id")), Seq("doc_id"))
    val embBytes = Parallelism.leafInputBytes(emb)
    assert(embBytes > 0)
    assert(Parallelism.leafInputBytes(two) == single + embBytes)
  }

  test("bfsHopHistogram releases every cache it creates") {
    spark.catalog.clearCache()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val edges = ProductAnalytics.copurchaseEdges(li, ordered = false)
      .select(col("a").as("src"), col("b").as("dst"))
    val hist = ProductAnalytics.bfsHopHistogram(edges, maxHops = 2,
      prePartitioned = true)
    assert(hist.count() > 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked caches: ${spark.sparkContext.getPersistentRDDs.size}")
  }
}
