package graft.operators

import graft.SparkSpec

/** Edge cases the corpus oracle can't exercise: overlapping
  * occurrences, repeated phrase terms, and boundary positions — the
  * semantics that distinguish positional-postings intersection from
  * substring replace-counting.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrase: Seq[String]) =
    Retrieval.phraseSearch(docs.toDF("doc_id", "text"), phrase)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap

  test("overlapping occurrences of a repeated-term phrase all count") {
    // "a a" occurs at positions 1 and 2 of "a a a" — replace-counting
    // finds only one
    val got = run(Seq((1L, "a a a"), (2L, "b a a b"), (3L, "a b a")), Seq("a", "a"))
    assert(got == Map(1L -> ((2L, 1)), 2L -> ((1L, 2))))
  }

  test("phrase at document boundaries and multiple docs") {
    val got = run(Seq(
      (1L, "x y tail tail"),        // match at start
      (2L, "head head x y"),        // match at end
      (3L, "x z y"),                // terms present, never adjacent
      (4L, "y x")),                 // reversed order
      Seq("x", "y"))
    assert(got == Map(1L -> ((1L, 1)), 2L -> ((1L, 3))))
  }

  test("three-term phrase requires all slots aligned") {
    val got = run(Seq(
      (1L, "p q r"),
      (2L, "p q q r"),              // q twice but never p q r in a row
      (3L, "z p q r p q r")),       // two disjoint occurrences
      Seq("p", "q", "r"))
    assert(got == Map(1L -> ((1L, 1)), 3L -> ((2L, 2))))
  }
}
