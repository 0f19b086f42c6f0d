package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The split-leakage audit's defining invariant: the CLUSTER-SAFE
  * split leaks ZERO cross-boundary n-grams from near-duplicate pairs
  * (a cluster is atomic w.r.t. the split bucket), while the naive
  * doc-hash split can leak — that contrast is the row's entire point.
  */
class SplitLeakageSpec extends SparkSpec {

  test("cluster-safe split shares no near-dup n-grams across boundaries") {
    val rows = run("split_leakage_report").collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("doc_hash", "cluster_hash"))
    val cl = rows("cluster_hash")
    val doc = rows("doc_hash")
    // both methods audit the same gram universe
    assert(cl.getAs[Long]("n_distinct_ngrams") ==
      doc.getAs[Long]("n_distinct_ngrams"))
    assert(cl.getAs[Long]("n_distinct_ngrams") > 0)
    // Shared n-grams under EITHER method come from (a) near-dup pairs
    // straddling the boundary — impossible under the cluster split —
    // or (b) coincidental 8-gram collisions between non-near-dup
    // docs, which affect both methods alike. The invariant that must
    // hold everywhere: the cluster split never leaks MORE than the
    // naive split, on any boundary.
    for (c <- Seq("train_val_shared", "train_test_shared", "val_test_shared"))
      assert(cl.getAs[Long](c) <= doc.getAs[Long](c),
        s"$c: cluster ${cl.getAs[Long](c)} > doc ${doc.getAs[Long](c)}")
  }
}
