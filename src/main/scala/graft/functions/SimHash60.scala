package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a shingle set (`array<string>`) as ONE codegen'd
  * expression: per element compute [[Md5Hash60]], vote ±1 per bit,
  * set fingerprint bit b iff votes(b) > 0 — numerically identical to
  * the explode → `sum(when((h>>b)&1===1, 1).otherwise(-1))` × 60 →
  * re-assemble formulation (and to the DuckDB oracle CTE in
  * `Dedup.simhashOracleCtes`), but with NO shuffle at all.
  *
  * The aggregate formulation shuffled an exploded (doc_id, shingle)
  * relation and hash-aggregated 60 vote columns; on the sf0.1 bench
  * that was a ~19 s cold query (60 agg expressions ≈ a 9000-line
  * generated aggregate class, JIT-hostile). This is a pure map —
  * embarrassingly parallel, scales with corpus bytes, and keeps the
  * scan→project pipeline inside one whole-stage-codegen span.
  *
  * Null elements are skipped (the shingle producer `zip_with(concat)`
  * over non-null words never emits them); an EMPTY array yields all
  * votes 0 → fingerprint 0. Callers that must match explode/groupBy
  * semantics (which DROP zero-shingle docs) filter `size(toks) > 0`.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    SimHash60.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  /** Shared by interpreted and generated paths. */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = Md5Hash60.compute(toks.getUTF8String(i))
        var b = 0
        while (b < 60) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs.head), "scala_udf")

  /** Column-API entry point (requires [[register]] on the session). */
  def simhash60(c: Column): Column = call_function("simhash60", c)
}
