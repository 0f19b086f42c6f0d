package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def hist(edges: Seq[(Long, Long)], maxHops: Int): Map[Int, Long] = {
    // directed both ways, as copurchaseEdges(ordered = false) emits
    val und = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    rows(ProductAnalytics.bfsHopHistogram(und, maxHops))
      .map(m => m("hops").asInstanceOf[Int] ->
        m("n_parts").asInstanceOf[Long]).toMap
  }

  test("path graph: one node per ring, crawl stops at maxHops") {
    // 1-2-3-4-5 from source 1 (min edge-touched id)
    val h = hist(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 3)
    assert(h == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L)) // node 5 beyond bound
  }

  test("disconnected component is never reached; early stop on empty ring") {
    val h = hist(Seq((1L, 2L), (10L, 11L)), 3)
    assert(h == Map(0 -> 1L, 1 -> 1L)) // rings empty after hop 1: 10,11 excluded
  }

  test("empty edge relation yields an empty histogram, no crash") {
    val h = hist(Seq.empty, 3)
    assert(h.isEmpty)
  }

  test("shortest distance wins when multiple paths reach a node") {
    // 1-2-4 and 1-3, 3-4: node 4 at distance 2 exactly once
    val h = hist(Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L)), 3)
    assert(h == Map(0 -> 1L, 1 -> 2L, 2 -> 1L))
  }
}
