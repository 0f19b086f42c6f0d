package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-derived 60-bit hash as a single codegen'd expression —
  * numerically identical to the composed
  * `conv(substring(md5(x),1,15),16,10).cast("long")` (and to DuckDB's
  * `('0x'||substr(md5(x),1,15))::bigint`): the first 15 hex chars of
  * an md5 digest are its first 60 bits, i.e. (first 8 digest bytes as
  * unsigned big-endian) >>> 4.
  *
  * The composed form materializes a 32-char hex string, substrings
  * it, and re-parses base-16 per call; this computes the long
  * directly from the digest bytes. It is the hot inner hash of the
  * MinHash (shingles × permutations) and SimHash paths.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    Md5Hash60.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Hash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {

  private val digestPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = {
    val md = digestPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 8 bytes as unsigned big-endian, top 60 bits kept
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_hash60", exprs => Md5Hash60(exprs.head), "scala_udf")

  /** Column-API entry point (requires [[register]] on the session). */
  def md5_hash60(c: Column): Column = call_function("md5_hash60", c)
}
