package graft.operators

import graft.SparkSpec

import scala.util.Random

/** Triangle-participation counts on graphs with a known census —
  * exercises the degree-orientation invariant (every triangle counted
  * exactly once regardless of which endpoint generates the wedge) that
  * the corpus oracle only checks in aggregate.
  */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")
    ProductAnalytics.triangleParticipation(und)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Brute-force census: every vertex triple with all three edges. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val vs = es.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tri = for {
      i <- vs.indices; j <- (i + 1) until vs.length; k <- (j + 1) until vs.length
      if es((vs(i), vs(j))) && es((vs(i), vs(k))) && es((vs(j), vs(k)))
    } yield Seq(vs(i), vs(j), vs(k))
    tri.flatten.groupBy(identity).map { case (v, o) => v -> o.size.toLong }
  }

  test("K4 puts every vertex in C(3,2) = 3 triangles; pendant vertex in none") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = counts(k4 :+ (4L, 5L)) // 5 is pendant
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("square with one diagonal: two triangles sharing the diagonal") {
    // 1-2-3-4-1 plus diagonal 1-3: triangles (1,2,3) and (1,3,4)
    val got = counts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("triangle-free bipartite graph yields no rows") {
    val bip = for (l <- 1L to 3L; r <- 10L to 12L) yield (l, r)
    assert(counts(bip).isEmpty)
  }

  test("graph stats row: wedge identity, triangle totals, bounded coefficients") {
    val r = graft.SparkEntry.queries("part_graph_stats")(spark, sf).collect()(0)
    import org.apache.spark.sql.functions._
    val li = graft.catalog.Tables(spark, sf).lineitem
    val und = ProductAnalytics.copurchaseEdges(li, ordered = true)
      .select(col("a"), col("b")).cache()
    try {
      assert(r.getAs[Long]("n_edges") == und.count())
      // wedges = sum d(d-1)/2 over the independent degree recompute
      val degs = und.select(col("a")).unionAll(und.select(col("b")))
        .groupBy(col("a")).count().collect().map(_.getLong(1))
      assert(r.getAs[Long]("n_wedges") == degs.map(d => d * (d - 1) / 2).sum)
      // triangle total = sum of per-part participation / 3
      assert(r.getAs[Long]("n_triangles") * 3 ==
        ProductAnalytics.triangleParticipation(
          und.select(col("a").as("u"), col("b").as("v")))
          .agg(sum(col("n_tri"))).collect()(0).getLong(0))
      assert(r.getAs[Long]("global_cc_e6") >= 0 &&
        r.getAs[Long]("global_cc_e6") <= 1000000L)
      assert(math.abs(r.getAs[Long]("assortativity_e6")) <= 1000000L)
    } finally und.unpersist()
  }

  test("seeded random graph matches the brute-force census") {
    val rnd = new Random(42)
    val n = 30
    val edges = for {
      i <- 1L to n; j <- (i + 1) to n
      if rnd.nextDouble() < 0.25
    } yield (i, j)
    assert(counts(edges) == brute(edges))
  }
}
