package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The window-top-k → heap-aggregate optimizer rule: fires on the
  * guarded pattern with results identical to the window formulation,
  * and leaves every non-matching shape alone.
  */
class WindowTopKRewriteSpec extends SparkSpec {

  // non-nullable (g, score, id): xxhash64 is non-nullable over a
  // non-nullable input (arithmetic like % / pmod is statically
  // NULLABLE — div-by-zero — and correctly refuses the rewrite;
  // that's the nullable-guard test below)
  private def base: DataFrame =
    spark.range(20000).select(
      pmod(col("id"), lit(37L)).cast("long").alias("gn"), col("id"))
      .select(coalesce(col("gn"), lit(0L)).as("g"),
        xxhash64(col("id")).cast("double").as("score"), col("id"))

  private val w = Window.partitionBy(col("g"))
    .orderBy(desc("score"), asc("id"))

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rule fires: no Window/Sort in the plan, heap aggregate instead") {
    val topk = base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("g"), col("rk"), col("id"), col("score"))
    val p = planOf(topk)
    assert(!p.contains("Window"), s"window survived the rewrite:\n${p.take(1500)}")
    assert(!p.contains("Sort"), s"sort survived the rewrite:\n${p.take(1500)}")
    assert(p.contains("ObjectHashAggregate"), p.take(1500))
  }

  test("rewritten results are identical to the window formulation") {
    def q = base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("g"), col("rk"), col("id"), col("score"))
    // collect the rewritten result FIRST (the rule is read at
    // optimization time, i.e. at this collect)
    val rewritten = q
    assert(!planOf(rewritten).contains("Window"))
    val got = rewritten.collect().map(_.toSeq).toSet
    // reference: same query with the rule disabled via excludedRules
    val saved = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.WindowTopKToHeap")
    try {
      val ref = q
      assert(planOf(ref).contains("Window"), "exclusion did not disable the rule")
      val want = ref.collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally saved.fold(spark.conf.unset("spark.sql.optimizer.excludedRules"))(
      spark.conf.set("spark.sql.optimizer.excludedRules", _))
  }

  test("strict-inequality and rank=1 filters fire too") {
    val lt = base.withColumn("rk", row_number().over(w)).filter(col("rk") < 4)
      .select(col("g"), col("id"))
    assert(!planOf(lt).contains("Window"))
    assert(lt.groupBy("g").count().filter(col("count") =!= 3).count() == 0)
    val eq = base.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("g"), col("id"))
    assert(!planOf(eq).contains("Window"))
    assert(eq.count() == 37)
  }

  test("guard: consuming a non-(part,rk,score,id) column keeps the window") {
    val withExtra = base.withColumn("extra", col("id") * 2)
    val q = withExtra.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("g"), col("rk"), col("extra"))
    assert(planOf(q).contains("Window"),
      "rewrite fired despite a column the heap cannot carry")
  }

  test("guard: ascending score or non-rank filters keep the window") {
    val asc1 = Window.partitionBy(col("g")).orderBy(asc("score"), asc("id"))
    val q1 = base.withColumn("rk", row_number().over(asc1))
      .filter(col("rk") <= 5).select(col("g"), col("id"))
    assert(planOf(q1).contains("Window"), "fired on ASC score (heap is DESC)")
    val q2 = base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5 && col("id") > 100).select(col("g"), col("id"))
    assert(planOf(q2).contains("Window"),
      "fired on a filter that references more than rk")
  }

  test("guard: nullable score keeps the window (heap drops nulls, ranks differ)") {
    val nullable = base.withColumn("score",
      when(col("id") % 97 === 0, lit(null)).otherwise(col("score")))
    val q = nullable.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select(col("g"), col("id"))
    assert(planOf(q).contains("Window"), "fired on a nullable score column")
  }

  test("float score + int id fire with exact round-trip values; long score refused") {
    val typed = spark.range(5000).select(
      coalesce(pmod(col("id"), lit(11L)), lit(0L)).as("g"),
      xxhash64(col("id")).cast("float").as("score"),
      col("id").cast("int").as("iid"))
    val wT = Window.partitionBy(col("g")).orderBy(desc("score"), asc("iid"))
    val q = typed.withColumn("rk", row_number().over(wT))
      .filter(col("rk") <= 4).select(col("g"), col("rk"), col("iid"), col("score"))
    assert(!planOf(q).contains("Window"), planOf(q).take(1200))
    val got = q.collect()
    assert(got.nonEmpty)
    // output schema keeps the original types
    assert(q.schema("score").dataType.typeName == "float")
    assert(q.schema("iid").dataType.typeName == "integer")
    // long scores must refuse: doubles collapse distinct longs > 2^53
    val wL = Window.partitionBy(col("g")).orderBy(desc("lscore"), asc("id"))
    val ql = spark.range(5000).select(
      coalesce(pmod(col("id"), lit(11L)), lit(0L)).as("g"),
      xxhash64(col("id")).as("lscore"), col("id"))
      .withColumn("rk", row_number().over(wL))
      .filter(col("rk") <= 4).select(col("g"), col("id"))
    assert(planOf(ql).contains("Window"), "fired on a long score")
  }

  test("guard: rank() / unpartitioned windows keep the window") {
    val q1 = base.withColumn("rk", rank().over(w))
      .filter(col("rk") <= 5).select(col("g"), col("id"))
    assert(planOf(q1).contains("Window"), "fired on rank() — ties differ")
    val global = Window.orderBy(desc("score"), asc("id"))
    val q2 = base.withColumn("rk", row_number().over(global))
      .filter(col("rk") <= 5).select(col("id"))
    assert(planOf(q2).contains("Window") || planOf(q2).contains("TakeOrdered"),
      "unpartitioned top-k belongs to TakeOrderedAndProject, not the heap")
  }
}
