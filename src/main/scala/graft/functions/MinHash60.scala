package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numPerms` MinHash values of a shingle set (`array<string>`)
  * in ONE codegen'd pass: element k of the result is
  * `min over shingles w of md5_hash60(concat(k + ":", w))` —
  * numerically identical to the explode →
  * `min(md5_hash60(concat("k:", w)))` × numPerms aggregate
  * formulation (and to the DuckDB oracle CTEs), but with NO shuffle:
  * the per-doc signature is computed where the doc row sits.
  *
  * The aggregate formulation exploded the corpus to (doc, shingle)
  * rows and hash-aggregated 16 min columns (16 md5s per shingle ROW
  * carried through a shuffle); this folds the same 16 md5s per
  * shingle into a local loop. An EMPTY array yields all-MaxValue
  * sentinels; callers that must match explode/groupBy semantics
  * (which DROP zero-shingle docs) filter `size(toks) > 0` first.
  */
case class MinHash60(child: Expression, numPerms: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if numPerms > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument and numPerms > 0, " +
            s"got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    MinHash60.compute(v.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHash60.compute($c, $numPerms);")

  override protected def withNewChildInternal(newChild: Expression): MinHash60 =
    copy(child = newChild)
}

object MinHash60 {

  /** "k:" prefixes, interned once — the hash input for permutation k
    * is the UTF-8 concatenation `"k:" + shingle`, byte-identical to
    * the SQL `concat('k:', w)` the oracles hash.
    */
  private val prefixes: Array[UTF8String] =
    Array.tabulate(64)(i => UTF8String.fromString(i + ":"))

  /** Shared by interpreted and generated paths. */
  def compute(toks: ArrayData, numPerms: Int): ArrayData = {
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i)
        var k = 0
        while (k < numPerms) {
          val h = Md5Hash60.compute(UTF8String.concat(prefixes(k), w))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash60", exprs => MinHash60(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")

  /** Column-API entry point (requires [[register]] on the session). */
  def minhash60(c: Column, numPerms: Int): Column =
    call_function("minhash60", c, lit(numPerms))
}
