package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: A ∩ B for two ASCENDING-sorted,
  * duplicate-free `array<bigint>` columns via a linear two-pointer
  * merge — the array-returning sibling of [[SortedIntersectCount]]
  * for callers that need the intersection's ELEMENTS, not just its
  * size (triangle closing credits each common neighbor w).
  *
  * `array_intersect` builds a hash set per evaluation and flows
  * through the generic boxed-array path; here the merge writes a
  * primitive long buffer and ships it as an `UnsafeArrayData` —
  * zero boxing, O(|A|+|B|) per pair. Callers MUST pass sorted
  * distinct arrays (the adjacency build sorts once at agg time).
  *
  * `doGenCode` emits a static call so the per-edge loop stays inside
  * whole-stage codegen.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersect.compute(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersect.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {

  /** Shared by interpreted and generated paths. */
  def compute(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(c) = x; c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (c == out.length) out else java.util.Arrays.copyOf(out, c))
  }

  /** Idempotently register `sorted_intersect`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect",
      exprs => SortedIntersect(exprs(0), exprs(1)),
      "scala_udf")

  /** Column-API entry point (requires [[register]] on the session). */
  def sorted_intersect(a: Column, b: Column): Column =
    call_function("sorted_intersect", a, b)
}
