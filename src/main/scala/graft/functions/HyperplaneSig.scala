package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature of an `array<float>` embedding:
  * bit p is set iff the dot product with plane p's ±1 weight vector
  * is ≥ 0 — one primitive pass over all planes, weights riding as a
  * reference object. Replaces the per-plane
  * `aggregate(zip_with(...))` HOF stack (boxed per-element lambdas ×
  * planes × dims in every corpus-wide projection) with the same
  * sequential double math.
  *
  * Null/length parity with the HOF formulation it replaced: there,
  * any null element (or a length mismatch, via zip_with's null
  * padding) nulls every plane's dot and `when(dot >= 0, …)` falls
  * through to 0 — so the whole signature is 0. This expression
  * returns 0 in exactly those cases.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.compute(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneSig.compute($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {

  /** Shared by interpreted and generated paths. */
  def compute(emb: ArrayData, planes: Array[Array[Double]]): Long = {
    val dim = planes(0).length
    if (emb.numElements() != dim) return 0L
    var i = 0
    while (i < dim) {
      if (emb.isNullAt(i)) return 0L
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += emb.getFloat(j).toDouble * w(j); j += 1 }
      if (dot >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** Plane weights cross the Column boundary as a flat double-array
    * literal + the dimension, like [[IvfCell]].
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_sig", exprs => {
        val flat = exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray()
        val dim = exprs(2).eval().asInstanceOf[Int]
        HyperplaneSig(exprs.head,
          Array.tabulate(flat.length / dim, dim)((p, j) => flat(p * dim + j)))
      }, "scala_udf")

  /** Column API (requires [[register]] on the session). */
  def hyperplane_sig(c: Column, planes: Array[Array[Double]]): Column =
    call_function("hyperplane_sig", c, lit(planes.flatten),
      lit(planes(0).length))
}
