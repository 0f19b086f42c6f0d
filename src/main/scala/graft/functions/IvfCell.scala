package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** IVF coarse-cell assignment: nearest centroid (squared L2, ties →
  * lowest cell id) of an `array<float>` embedding, as ONE primitive
  * pass with the trained centroids riding along as a reference
  * object — the native counterpart of the HOF `cellOf` formulation,
  * for the same reason [[PqEncode]] exists: in a hot corpus-wide
  * projection the higher-order-function form pays boxed per-element
  * lambda evaluation (and re-evaluates shared subexpressions under
  * projection collapse); a K×dim multiply-add loop does not.
  * Operates on RAW (un-normalized) embeddings, matching the
  * distributed trainer [[graft.operators.Similarity.trainCentroids]].
  * Null elements read as 0.
  */
case class IvfCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    IvfCell.compute(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IvfCell.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

object IvfCell {

  /** Shared by interpreted and generated paths. */
  def compute(emb: ArrayData, centroids: Array[Array[Double]]): Int = {
    val dim = centroids(0).length
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val x = if (i < emb.numElements() && !emb.isNullAt(i))
          emb.getFloat(i).toDouble else 0.0
        val t = x - cent(i)
        d += t * t
        i += 1
      }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  /** Centroids cross the Column boundary as a flat double-array
    * literal + the dimension, like [[PqEncode]].
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ivf_cell", exprs => {
        val flat = exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray()
        val dim = exprs(2).eval().asInstanceOf[Int]
        val k = flat.length / dim
        IvfCell(exprs.head,
          Array.tabulate(k, dim)((c, d) => flat(c * dim + d)))
      }, "scala_udf")

  /** Column API (requires [[register]] on the session). */
  def ivf_cell(c: Column, centroids: Array[Array[Double]]): Column =
    call_function("ivf_cell", c, lit(centroids.flatten),
      lit(centroids(0).length))
}
