package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity of two
  * strings — the standard record-linkage scorer (Winkler 1990),
  * which Spark lacks (it ships only `levenshtein`/`soundex`).
  *
  * Textbook definition, bit-compatible with DuckDB's
  * `jaro_winkler_similarity` (the correctness oracle): match window
  * ⌊max(|a|,|b|)/2⌋−1, transpositions counted over the matched
  * subsequences, jaro = (m/|a| + m/|b| + (m−t/2)/m)/3, Winkler
  * prefix boost `jaro + ℓ·0.1·(1−jaro)` with ℓ = common prefix
  * capped at 4, applied only above the 0.7 boost threshold; either
  * side empty ⇒ 0. Scoring is on UTF-8 BYTES (exact for ASCII keys,
  * the record-linkage case; a multi-byte codepoint counts as its
  * byte length on both engines' default path).
  *
  * A Scala UDF here would box two Strings per candidate pair and
  * fall out of whole-stage codegen; `doGenCode` emits a static call
  * so the million-pair scoring loop of a blocked linkage join stays
  * inside the generated stage, zero allocation beyond the two
  * boolean match-flag arrays.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Shared by interpreted and generated paths. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var trans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - trans / 2.0) / md) / 3.0
    if (jaro <= 0.7) return jaro // Winkler boost threshold
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Idempotently register `jaro_winkler`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1)),
      "scala_udf")

  /** Column-API entry point (requires [[register]] on the session). */
  def jaro_winkler(a: Column, b: Column): Column =
    call_function("jaro_winkler", a, b)
}
