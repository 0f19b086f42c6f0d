package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, HeavyHitters, HyperplaneSig, IvfCell, Md5Hash60, MinHash60, PqEncode, SimHash60, SortedIntersectCount, TopKByScore}

/** Session-extension registration for the engine's custom Catalyst
  * pieces — enables `--conf spark.sql.extensions=graft.GraftExtensions`
  * on any cluster (the per-session `register(spark)` helpers remain
  * for ad-hoc use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // grouped-top-k window filters plan as bounded-heap aggregates
    // (see graft.plans.WindowTopKToHeap for the soundness guards)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKToHeap)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      exprs => TopKByScore(exprs(0), exprs(1), exprs(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      exprs => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "md5_hash60"),
      exprs => Md5Hash60(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      exprs => SimHash60(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash60"),
      new ExpressionInfo(classOf[MinHash60].getName, "minhash60"),
      exprs => MinHash60(exprs.head, exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters"),
      exprs => HeavyHitters(exprs(0), exprs(1)).toAggregateExpression()))
    // pq_encode's SQL surface matches the registry helper: the model
    // arrives as (flat double-array literal, m, subDim)
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      exprs => {
        val flat = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray()
        val m = exprs(2).eval().asInstanceOf[Int]
        val subDim = exprs(3).eval().asInstanceOf[Int]
        val k = flat.length / (m * subDim)
        PqEncode(exprs.head, Array.tabulate(m, k, subDim)((s, c, d) =>
          flat((s * k + c) * subDim + d)))
      }))
    // ivf_cell(emb, flat centroid literal, dim)
    ext.injectFunction((
      FunctionIdentifier("ivf_cell"),
      new ExpressionInfo(classOf[IvfCell].getName, "ivf_cell"),
      exprs => {
        val flat = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray()
        val dim = exprs(2).eval().asInstanceOf[Int]
        IvfCell(exprs.head, Array.tabulate(flat.length / dim, dim)(
          (c, d) => flat(c * dim + d)))
      }))
    // hyperplane_sig(emb, flat plane-weight literal, dim)
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      exprs => {
        val flat = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray()
        val dim = exprs(2).eval().asInstanceOf[Int]
        HyperplaneSig(exprs.head, Array.tabulate(flat.length / dim, dim)(
          (p, j) => flat(p * dim + j)))
      }))
  }
}
