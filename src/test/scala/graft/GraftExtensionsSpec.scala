package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import graft.functions.{CosineSimilarity, TopKByScore}

/** The injection list is exercised without building a second
  * SparkSession (the test JVM shares one SparkContext across suites;
  * SQL-path behavior of both functions is covered in
  * CosineSimilaritySpec / TopKByScoreSpec via register()).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extension builders construct the expected expressions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builders are applied when a session materializes; here we at
    // least prove the classes wire up and build valid expressions
    val cos = CosineSimilarity(Literal(1.0f), Literal(1.0f))
    assert(cos.prettyName == "cosine_sim")
    val topk = TopKByScore(Literal(1.0), Literal(1L), Literal(5))
    assert(topk.prettyName == "topk_by_score")
    assert(topk.toAggregateExpression().isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression])
  }

  test("SQL path works on the shared session after register()") {
    CosineSimilarity.register(spark)
    TopKByScore.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 AS float), cast(0.0 AS float)),
        |                  array(cast(1.0 AS float), cast(0.0 AS float))) AS c,
        |       topk_by_score(s, i, 2) AS t
        |FROM VALUES (1.0d, 1L), (3.0d, 2L), (2.0d, 3L) AS v(s, i)
        |GROUP BY 1""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val top = r.getSeq[org.apache.spark.sql.Row](1)
    assert(top.map(_.getLong(1)) == Seq(2L, 3L))
  }
}
