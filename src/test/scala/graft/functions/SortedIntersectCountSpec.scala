package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("merge count equals array_intersect size on sorted distinct arrays") {
    SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("merged", SortedIntersectCount.sorted_intersect_count($"a", $"b"))
      .withColumn("builtin", size(array_intersect($"a", $"b")))
    assert(df.filter($"merged" =!= $"builtin").count() == 0)
  }

  test("empty and disjoint arrays count 0; identical arrays count n") {
    SortedIntersectCount.register(spark)
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))
    ).toDF("a", "b")
      .withColumn("c", SortedIntersectCount.sorted_intersect_count($"a", $"b"))
    assert(df.select($"c").as[Int].collect().toSeq == Seq(0, 0, 3))
  }

  test("usable from SQL text after registration") {
    SortedIntersectCount.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS c")
      .head().getInt(0)
    assert(r == 2)
  }
}
