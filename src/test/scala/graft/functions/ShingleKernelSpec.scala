package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the fused byte-level shingle kernels to the Catalyst HOF
  * chain they replace — the equivalence contract that lets
  * Dedup/StreamingNearDup swap plans without moving a single output
  * bit. Texts cover the split(limit=-1) edge semantics: leading /
  * trailing non-space whitespace (trim strips 0x20 only, so tabs
  * survive and produce empty tokens), whitespace runs, empty and
  * blank strings, multi-byte UTF-8, and duplicate bigrams (distinct
  * vs multiset behavior).
  */
class ShingleKernelSpec extends SparkSpec {

  private val edge = Seq(
    "", " ", "  ", "\ta", "a\t", "\ta\t", "a", "a b", " a  b ",
    "a\tb\nc", "a b a b a b", "x éé 中文 x",
    "one two three four five", "a  b", "ab c\r\nd",
    "dup dup dup dup", ". , .", "a:b c:d a:b")
  private val rnd = new scala.util.Random(42)
  private val words = Vector("the", "a", "of", "and", "x1", "tok", "ü", "zz")
  private val fuzz = (1 to 200).map { _ =>
    (0 until rnd.nextInt(12)).map(_ =>
      (if (rnd.nextInt(8) == 0) "\t" else "") +
        words(rnd.nextInt(words.size))).mkString(
      Seq(" ", "  ", " \t ", "\n")(rnd.nextInt(4)))
  }

  private def docs = {
    import spark.implicits._
    (edge ++ fuzz).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  // the HOF chain being replaced (Dedup.shingleSetsK(k=2) inlined)
  private def chainToks = {
    val w = split(trim(col("text")), "\\s+")
    val m = greatest(size(w) - lit(1), lit(0))
    array_distinct(zip_with(slice(w, lit(1), m), slice(w, lit(2), m),
      (a, b) => concat(a, lit(" "), b)))
  }

  test("token_count == size(split(trim(text), \\s+))") {
    ShingleKernel.register(spark)
    val d = docs.select(
      ShingleKernel.token_count(col("text")).as("fused"),
      size(split(trim(col("text")), "\\s+")).as("chain"))
    assert(d.filter(col("fused") =!= col("chain")).count() === 0)
  }

  test("minhash60_text == minhash60(chain shingles) on every doc") {
    ShingleKernel.register(spark)
    MinHash60.register(spark)
    val d = docs.select(
      ShingleKernel.minhash60_text(col("text"), 16).as("fused"),
      MinHash60.minhash60(chainToks, 16).as("chain"))
    assert(d.filter(not(col("fused") === col("chain"))).count() === 0)
  }

  test("shingle_sig == (sorted xxhash64 of distinct bigrams, count, minhash)") {
    ShingleKernel.register(spark)
    MinHash60.register(spark)
    val sig = ShingleKernel.shingle_sig(col("text"), 16)
    val d = docs.select(
      sig.getField("vtoks").as("v_fused"),
      sig.getField("n").as("n_fused"),
      sig.getField("mh").as("mh_fused"),
      array_sort(transform(chainToks, x => xxhash64(x))).as("v_chain"),
      size(chainToks).as("n_chain"),
      MinHash60.minhash60(chainToks, 16).as("mh_chain"))
    assert(d.filter(not(col("v_fused") === col("v_chain")) ||
      col("n_fused") =!= col("n_chain") ||
      not(col("mh_fused") === col("mh_chain"))).count() === 0)
  }

  test("shingle_xx(k=3) == xxhash64 over distinct 3-gram strings, in order") {
    ShingleKernel.register(spark)
    val w = split(trim(col("text")), "\\s+")
    val m = greatest(size(w) - lit(2), lit(0))
    val grams = array_distinct(zip_with(
      zip_with(slice(w, lit(1), m), slice(w, lit(2), m),
        (a, b) => concat(a, lit(" "), b)),
      slice(w, lit(3), m), (a, b) => concat(a, lit(" "), b)))
    val d = docs.select(
      ShingleKernel.shingle_xx(col("text"), 3).as("fused"),
      transform(grams, x => xxhash64(x)).as("chain"))
    assert(d.filter(not(col("fused") === col("chain"))).count() === 0)
  }

  test("null text maps to null, matching the chain") {
    ShingleKernel.register(spark)
    import spark.implicits._
    val d = Seq((1L, null: String), (2L, "a b")).toDF("doc_id", "text")
    val r = d.select(ShingleKernel.token_count(col("text")).as("tc"),
      ShingleKernel.minhash60_text(col("text"), 16).as("mh"),
      ShingleKernel.shingle_sig(col("text"), 16).as("sig"))
      .orderBy(desc("tc")).collect()
    assert(r(1).isNullAt(0) && r(1).isNullAt(1) && r(1).isNullAt(2))
    assert(!r(0).isNullAt(0))
  }
}
