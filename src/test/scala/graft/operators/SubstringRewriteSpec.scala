package graft.operators

import graft.SparkSpec

/** Planted-span guard for dedup_substring_rewrite
  * ([[TextAnalysis.substringRewrite]] — the same function the
  * registered query calls): a shared 8-gram must vanish from EVERY
  * doc containing it (including within-doc repeats), unique text
  * must survive verbatim, and reassembly must preserve original
  * token order.
  */
class SubstringRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long)] =
    TextAnalysis.substringRewrite(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap

  test("a span shared across two docs is removed from both; unique text survives") {
    val span = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta gamma $span tail one",
      2L -> s"$span omega psi chi",
      3L -> "entirely unique words that never repeat anywhere else here")
    val out = run(docs)
    assert(!out(1L)._1.contains("dup1") && !out(2L)._1.contains("dup8"),
      s"shared span survived: ${out(1L)._1} / ${out(2L)._1}")
    assert(out(1L)._1 == "alpha beta gamma tail one")
    assert(out(2L)._1 == "omega psi chi")
    assert(out(3L)._1 == docs(2)._2, "unique doc must be untouched")
    assert(out(3L)._2 == out(3L)._3, "unique doc keeps every token")
  }

  test("a span repeated INSIDE one doc is removed (count, not distinct-doc, dedup)") {
    val span = (1 to 8).map(i => s"rep$i").mkString(" ")
    val docs = Seq(
      1L -> s"$span middle filler words go here $span",
      2L -> "other text that is entirely distinct from the first doc")
    val out = run(docs)
    assert(!out(1L)._1.contains("rep1"),
      s"within-doc repeated span survived: ${out(1L)._1}")
    assert(out(1L)._1 == "middle filler words go here")
  }

  test("token order is preserved through removal and reassembly") {
    val span = (1 to 8).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      1L -> s"a1 a2 $span b1 b2 $span c1 c2",
      2L -> s"prefix $span suffix unrelated trailing padding words here")
    val out = run(docs)
    assert(out(1L)._1 == "a1 a2 b1 b2 c1 c2")
    assert(out(2L)._1 == "prefix suffix unrelated trailing padding words here")
  }

  test("short docs (< 8 tokens) pass through untouched") {
    val docs = Seq(1L -> "one two three", 2L -> "one two three")
    val out = run(docs)
    assert(out(1L)._1 == "one two three" && out(2L)._1 == "one two three",
      "docs below gram width must never lose tokens")
  }
}
