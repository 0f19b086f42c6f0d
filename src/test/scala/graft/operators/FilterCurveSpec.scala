package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FilterCurveSpec extends SparkSpec {

  test("survival curve is monotone in the threshold and consistent with a direct filter") {
    val out = run("filter_tradeoff_curve")
      .orderBy(col("t_e3")).collect()
    assert(out.length == 21)
    // monotone: raising the cutoff never keeps more
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_docs_kept") >= b.getAs[Long]("n_docs_kept"))
      assert(a.getAs[Long]("n_tokens_kept") >= b.getAs[Long]("n_tokens_kept"))
    }
    // spot-check one grid point against an independent filter at the
    // rational-score level (score > 0 ⇔ sw > 0)
    val zero = out.find(_.getAs[Long]("t_e3") == 0L).get
    graft.functions.Md5Hash60.register(spark)
    val direct = graft.catalog.Tables(spark, sf).documents
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("doc_id"),
        (pmod(graft.functions.Md5Hash60.md5_hash60(col("tok")), lit(2001L))
          - lit(1000L)).as("wi"))
      .groupBy(col("doc_id")).agg(sum(col("wi")).as("sw"))
      .filter(col("sw") > 0L).count()
    assert(zero.getAs[Long]("n_docs_kept") == direct)
  }
}
