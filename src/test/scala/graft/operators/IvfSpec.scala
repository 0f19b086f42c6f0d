package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.catalog.Tables

/** IVF ANN: recall-complete parity with brute force, and the
  * scan-reduction/recall trade at nprobe < Cells.
  */
class IvfSpec extends SparkSpec {

  private def asTuples(rs: Array[Row]): Set[(Long, Long, Int, Double)] =
    rs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("recall-complete IVF (nprobe = all cells) equals brute force exactly") {
    val ivf = asTuples(run("ann_ivf_topk").collect())
    val brute = asTuples(run("ann_cosine_topk").collect())
    assert(ivf == brute)
  }

  test("nprobe=1 searches a strict subset of the corpus per query") {
    val emb = Tables(spark, sf).embeddings
    val centroids = Similarity.trainCentroids(emb)
    val n = emb.count()
    val out = Similarity.ivfTopK(emb, centroids, nprobe = 1)
    val perQuery = out.groupBy("qid").count().collect()
    assert(perQuery.nonEmpty)
    // every query still fills its top-k from its own cell
    assert(perQuery.forall(_.getLong(1) <= 5))
    // the probed fraction is bounded by the largest single cell
    val cellSizes = emb
      .withColumn("cell", Similarity.cellOf(
        org.apache.spark.sql.functions.col("embedding"), centroids))
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(cellSizes.max < n, "a single cell holds the whole corpus — no pruning")
    assert(cellSizes.length > 1, "quantizer collapsed to one cell")
  }

  test("nprobe=1 recall vs brute force is substantial") {
    val emb = Tables(spark, sf).embeddings
    val centroids = Similarity.trainCentroids(emb)
    val ivf1 = Similarity.ivfTopK(emb, centroids, nprobe = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = run("ann_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf1 & brute).size.toDouble / brute.size
    info(f"nprobe=1 recall@5 = $recall%.3f")
    assert(recall >= 0.2, f"recall collapsed: $recall%.3f")
  }
}
