package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bounded heap survives partition merges and breaks ties by id") {
    TopKByScore.register(spark)
    // 1000 rows spread over many partitions; scores with ties
    val df = (1L to 1000L).map(i => (i, (i % 10).toDouble)).toDF("id", "score")
      .repartition(16)
    val top = df.agg(TopKByScore.topk_by_score($"score", $"id", 5).as("t"))
      .select(posexplode($"t"))
      .select($"pos", $"col.score", $"col.id")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    // score 9.0 rows are ids 9, 19, 29, ... → smallest ids win ties
    assert(top.map(_._2).toSeq == Seq(9.0, 9.0, 9.0, 9.0, 9.0))
    assert(top.map(_._3).toSeq == Seq(9L, 19L, 29L, 39L, 49L))
  }

  test("aggregate formulation returns exactly the window formulation's rows") {
    val a = run("ann_cosine_topk").select($"qid", $"vec_id", $"rank", $"cosine")
    val b = run("ann_topk_agg").select($"qid", $"vec_id", $"rank", $"cosine")
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("groups smaller than k yield all rows, ordered") {
    TopKByScore.register(spark)
    val df = Seq((1L, 3.0), (2L, 1.0), (3L, 2.0)).toDF("id", "score")
    val top = df.agg(TopKByScore.topk_by_score($"score", $"id", 10).as("t"))
      .select(explode($"t").as("e")).select($"e.id").as[Long].collect()
    assert(top.toSeq == Seq(1L, 3L, 2L))
  }
}
