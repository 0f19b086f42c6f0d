package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, Md5Hash60, MinHash60, SimHash60, SortedIntersectCount, TopKByScore}

/** Session-extension registration for the engine's custom Catalyst
  * pieces — enables `--conf spark.sql.extensions=graft.GraftExtensions`
  * on any cluster (the per-session `register(spark)` helpers remain
  * for ad-hoc use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
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
  }
}
