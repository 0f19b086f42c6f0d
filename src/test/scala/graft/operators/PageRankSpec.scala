package graft.operators

import graft.SparkSpec

/** PageRank semantics on graphs small enough to iterate by hand —
  * pins the exact variant the corpus oracle computes: d = 0.85,
  * uniform init, isolated nodes keep the (1−d)/N floor, dangling mass
  * dropped (no redistribution), fixed iteration count.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    rounds: Int): Map[Long, Double] =
    ProductAnalytics.pageRankRatios(
        nodes.toDF("part"), edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** The same formula iterated driver-side in doubles; the engine's
    * per-contribution decimal(38,18) rounding differs by < 1e-12
    * after the round(·, 6) — assert to 1e-6.
    */
  private def reference(nodes: Seq[Long], edges: Seq[(Long, Long)],
                        rounds: Int): Map[Long, Double] = {
    val n = nodes.size
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to rounds) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / out(s) }.sum).toMap
      pr = nodes.map(v => v -> (0.15 / n + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    pr.map { case (v, p) => v -> p * n }
  }

  private def assertClose(got: Map[Long, Double], want: Map[Long, Double]): Unit = {
    assert(got.keySet == want.keySet)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-6, s"node $k: got ${got(k)}, want $w")
  }

  test("two-node cycle stays uniform at every iteration count") {
    val got = ranks(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L)), rounds = 3)
    assertClose(got, Map(1L -> 1.0, 2L -> 1.0))
  }

  test("isolated node decays to the (1-d)/N floor ratio") {
    // node 3 receives nothing and contributes nothing
    val got = ranks(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L)), rounds = 2)
    assert(math.abs(got(3L) - 0.15 * 3 / 3) < 1e-6)
    assertClose(got, reference(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L)), 2))
  }

  test("star graph concentrates rank on the hub, matches hand iteration") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), // spokes point at hub
      (1L, 2L), (1L, 3L), (1L, 4L))               // hub splits back out
    val got = ranks(nodes, edges, rounds = 3)
    assertClose(got, reference(nodes, edges, 3))
    assert(got(1L) > got(2L))
  }

  // NOTE: this test intentionally runs a LONG horizon (~29 rounds at
  // tol 1e-2 on the slow-mixing star) — it is the regression guard for
  // driver-side per-round cost. The checkpoint stats squaring bug
  // (fixed via graftshim.CheckpointStats) was invisible at the bench
  // scales' k=5 and surfaced only here, as a hang past round ~20. If
  // this test ever slows from ~30 s to minutes, suspect per-round
  // plan/stats growth before suspecting the executor side.
  test("converged variant stops at tolerance, matches the fixed unroll at its k") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L),
      (1L, 2L), (1L, 3L), (1L, 4L))
    // the star's period-2 oscillation contracts at exactly the 0.85
    // damping bound (~53 rounds to 1e-4), so test the stop rule at
    // 1e-2 (~25 rounds) — the corpus graph mixes ~10×/round instead
    val (ranksDf, k) = ProductAnalytics.pageRankConverged(
      nodes.toDF("part"), edges.toDF("src", "dst"),
      tolL1E6 = 10000L, maxRounds = 50)
    assert(k >= 1 && k < 50, s"tolerance, not the cap, must terminate (k=$k)")
    // the converged result IS the fixed-k result — same recurrence
    val fixed = ranks(nodes, edges, rounds = k)
    val got = ranksDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assertClose(got, fixed)
  }

  test("round cap bounds the loop on a slow-converging graph") {
    // long directed cycle mixes slowly; a tolerance of 0 can never be
    // met, so the cap must terminate
    val nodes = (1L to 8L).toSeq
    val edges = nodes.map(i => i -> (i % 8 + 1))
    val (_, k) = ProductAnalytics.pageRankConverged(
      nodes.toDF("part"), edges.toDF("src", "dst"),
      tolL1E6 = 0L, maxRounds = 4)
    assert(k == 4)
  }

  test("dangling mass is dropped, not redistributed") {
    // 1 → 2, 2 dangles: total ratio mass shrinks below N·(1/N)
    val nodes = Seq(1L, 2L)
    val got = ranks(nodes, Seq((1L, 2L)), rounds = 1)
    assertClose(got, reference(nodes, Seq((1L, 2L)), 1))
    // node 1 keeps only the floor; 2 got 1's full previous rank
    assertClose(got, Map(1L -> 0.15, 2L -> (0.15 + 0.85 * 1.0)))
  }
}
