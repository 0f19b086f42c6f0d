package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r16 verdict item 5: `labelPropagation` lineage on deep chains.
  *
  * Each propagation round builds `next` from the previous label
  * relation referenced TWICE (the union base and the message join), so
  * a persist-only loop grows a plan tree with 2^rounds root-to-leaf
  * paths — a long-chain duplicate graph (diameter ≈ rounds) stalls
  * Catalyst analysis around round ~25, in driver CPU, before any data
  * problem. The fix checkpoints every [[Dedup.LabelPropCheckpointEvery]]
  * rounds (same reliable/local swap + bounded-stats reset as
  * pageRankConverged), capping plan size regardless of diameter. The
  * 500-link case lives in ZipfSmoke; this spec drives a 20-link chain
  * through two truncations and pins correctness + boundedness.
  */
class LabelPropChainSpec extends SparkSpec {
  import spark.implicits._

  test("a 20-link chain converges to one cluster through 2 lineage truncations") {
    val links = 20
    val edges = (0 until links).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.labelPropagation(edges)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == links + 1, "every chain vertex must be labeled")
    assert(out.values.forall(_ == 0L),
      s"every vertex joins cluster 0 (got ${out.filter(_._2 != 0L)})")
    // ~20 propagation rounds (plus the ≤ 7-round fixpoint overshoot of
    // the batched sum checks — identical labels, see labelPropagation)
    // with truncations every 8: the exit plan carries at most
    // LabelPropCheckpointEvery-1 rounds of lineage above a LogicalRDD
    // leaf. Without the checkpoint this plan would have ~2^20
    // root-to-leaf paths and this collect (and the loop itself) would
    // not finish.
    val planNodes = labels.queryExecution.analyzed.collect { case p => p }.size
    assert(planNodes < 4000,
      s"plan grew to $planNodes nodes — lineage truncation not firing")
  }

  test("singleton and two-clique graphs are unaffected by the checkpoint cadence") {
    // below the cadence (converges in 1-2 rounds): pure persist path
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.labelPropagation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
