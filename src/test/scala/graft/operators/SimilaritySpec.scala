package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force cosine top-k: k rows per query, rank 1 is the max") {
    val out = run("ann_cosine_topk")
    val perQuery = out.groupBy($"qid").agg(count(lit(1)).as("n"),
      max($"cosine").as("mx"),
      max(when($"rank" === 1, $"cosine")).as("r1"))
    assert(perQuery.filter($"n" =!= 5).count() == 0)
    assert(perQuery.filter($"r1" =!= $"mx").count() == 0)
    // cosine bounded
    assert(out.filter($"cosine" > 1.0001 || $"cosine" < -1.0001).count() == 0)
  }

  test("LSH top-k cosines agree with brute-force for shared (qid, vec_id)") {
    val bf = run("ann_cosine_topk").select($"qid", $"vec_id", $"cosine".as("c_bf"))
    val lsh = run("ann_lsh_topk").select($"qid", $"vec_id", $"cosine".as("c_lsh"))
    val joined = lsh.join(bf, Seq("qid", "vec_id"))
    assert(joined.filter(abs($"c_bf" - $"c_lsh") > 1e-9).count() == 0)
  }

  test("LSH restricts search to the query's bucket") {
    val out = run("ann_lsh_topk")
    // every returned row carries the bucket, and per query all rows
    // share one bucket value
    val perQuery = out.groupBy($"qid").agg(countDistinct($"bucket").as("nb"))
    assert(perQuery.filter($"nb" > 1).count() == 0)
  }
}
