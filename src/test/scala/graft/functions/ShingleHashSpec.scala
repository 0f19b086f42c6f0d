package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.Tables

/** SimHash60 / MinHash60 must be bit-identical to the explode →
  * aggregate formulations they replaced (which is also what the
  * DuckDB oracle CTEs compute) — the single-pass expressions are a
  * plan-shape change, never a semantics change.
  */
class ShingleHashSpec extends SparkSpec {
  import spark.implicits._

  private def shingles = {
    val w = split(trim($"text"), "\\s+")
    Tables(spark, sf).documents.select($"doc_id",
      array_distinct(zip_with(
        slice(w, lit(1), greatest(size(w) - 1, lit(0))),
        slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("toks"))
      .filter(size($"toks") > 0)
  }

  test("simhash60 equals the 60-vote-column aggregate formulation") {
    SimHash60.register(spark)
    Md5Hash60.register(spark)
    val fast = shingles.select($"doc_id", SimHash60.simhash60($"toks").as("fp"))
    val toks = shingles.select($"doc_id", explode($"toks").as("w"))
      .withColumn("h", Md5Hash60.md5_hash60($"w"))
    val voteCols = (0 until 60).map { b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val fingerprint = (0 until 60).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    val slow = toks.groupBy($"doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
      .select($"doc_id", fingerprint.as("fp"))
    assert(fast.join(slow, Seq("doc_id"))
      .filter(fast("fp") =!= slow("fp")).count() == 0)
    assert(fast.count() == slow.count())
  }

  test("minhash60 equals the per-permutation min aggregate formulation") {
    MinHash60.register(spark)
    Md5Hash60.register(spark)
    val n = 16
    val fast = shingles.select($"doc_id", MinHash60.minhash60($"toks", n).as("mh"))
    val toks = shingles.select($"doc_id", explode($"toks").as("w"))
    val mhCols = (0 until n).map { i =>
      min(Md5Hash60.md5_hash60(concat(lit(s"$i:"), $"w"))).as(s"mh$i")
    }
    val slow = toks.groupBy($"doc_id").agg(mhCols.head, mhCols.tail: _*)
      .select($"doc_id", array((0 until n).map(i => col(s"mh$i")): _*).as("mh"))
    assert(fast.join(slow, Seq("doc_id"))
      .filter(fast("mh") =!= slow("mh")).count() == 0)
    assert(fast.count() == slow.count())
  }

  test("empty and null arrays: sentinel simhash 0, all-MaxValue minhash, null in null out") {
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, None),
      (3L, Some(Seq("a b", "b c")))
    ).toDF("doc_id", "toks")
    SimHash60.register(spark)
    MinHash60.register(spark)
    val r = df.select($"doc_id",
      SimHash60.simhash60($"toks").as("fp"),
      MinHash60.minhash60($"toks", 4).as("mh"))
      .orderBy($"doc_id").collect()
    assert(r(0).getLong(1) == 0L)
    assert(r(0).getSeq[Long](2) == Seq.fill(4)(Long.MaxValue))
    assert(r(1).isNullAt(1) && r(1).isNullAt(2))
    assert(r(2).getLong(1) != 0L)
  }
}
