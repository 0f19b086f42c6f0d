package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.Tables

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression is bit-identical to the HOF formulation") {
    CosineSimilarity.register(spark)
    val emb = Tables(spark, sf).embeddings.limit(50)
    val q = emb.select($"vec_id".as("qid"), $"embedding".as("qe"))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def hofNorm(a: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, v) => acc + v))
    val both = emb.crossJoin(q)
      .withColumn("c_native", CosineSimilarity.cosine_sim($"qe", $"embedding"))
      .withColumn("c_hof", hofDot($"qe", $"embedding") / (hofNorm($"qe") * hofNorm($"embedding")))
    // bit-identical, not just approximately equal
    assert(both.filter($"c_native" =!= $"c_hof").count() == 0)
  }

  test("usable from SQL text after registration") {
    CosineSimilarity.register(spark)
    Tables(spark, sf).embeddings.limit(5).createOrReplaceTempView("emb_test")
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_test").collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-12))
  }

  test("identical vectors → 1.0, opposite → -1.0") {
    CosineSimilarity.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, -2.0f), Array(-1.0f, 0.0f, 2.0f))
    ).toDF("a", "b")
      .withColumn("c", CosineSimilarity.cosine_sim(col("a"), col("b")))
    val cs = df.select("c").as[Double].collect()
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1) + 1.0) < 1e-12)
  }
}
