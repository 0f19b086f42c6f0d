package graft.operators

import graft.SparkSpec

class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  test("bpe merges pick the weighted top pair and rewrite greedily") {
    // 'aaab' x3 + 'ab' x2: round 1 pairs — (a,a): 2 per 'aaab' x3 = 6,
    // (a,b): 3+2 = 5 → merge (a,a). Greedy left-to-right on 'aaab'
    // merges positions 1-2 only (run alternation), leaving [aa, a, b].
    // Round 2 pairs: (aa,a) 3, (a,b) 5 → merge (a,b) → 'aaab' = [aa, ab].
    val docs = Seq(
      (1L, "aaab aaab aaab ab"),
      (2L, "ab")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeLearnMerges(docs, rounds = 3)
      .orderBy("step").collect()
    assert(out.map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq ==
      Seq((1, "aa", 6L), (2, "ab", 5L), (3, "aaab", 3L)))
  }

  test("merged symbols never chain into the same round's match") {
    // pair (a,a) over 'aaaa': greedy yields [aa, aa] (2 merges), never
    // [aa, a, a] or a 3-symbol chain — the alternation rule
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m1 = TextAnalysis.bpeLearnMerges(docs, rounds = 2)
      .orderBy("step").collect()
    // round 1: (a,a) count 3 → merge; round 2 works on [aa, aa] →
    // merge (aa,aa) count 1
    assert(m1.map(r => (r.getString(3), r.getLong(4))).toSeq ==
      Seq(("aa", 3L), ("aaaa", 1L)))
  }

  test("encode counts words and post-merge symbols per document") {
    // after rounds=2 on this corpus (merges: aa then ab — see the
    // first test), 'aaab' = [aa, ab] (2 tokens), 'ab' = [ab] (1)
    val docs = Seq(
      (1L, "aaab aaab aaab ab"),
      (2L, "ab")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncodeCounts(docs, rounds = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 4L, 7L), (2L, 1L, 1L)))
  }

  test("merge exhaustion: rounds beyond the last pair are skipped, encode still counts") {
    // 'ab ab': round 1 merges (a,b); rounds 2-3 find no pairs — learn
    // must return ONE row and encode must count the fully-merged
    // single symbol per word (the oracle's LEFT JOIN pass-through
    // matches this exactly)
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeLearnMerges(docs, rounds = 3).collect()
    assert(merges.map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq ==
      Seq((1, "ab", 2L)))
    val enc = TextAnalysis.bpeEncodeCounts(docs, rounds = 3).collect()
    assert(enc.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L)))
  }

  test("sf0.001 merges are deterministic and count-monotone within ties") {
    val out = run("bpe_learn_merges").orderBy("step").collect()
    assert(out.length == TextAnalysis.BpeRounds)
    // merged symbol is always lhs + rhs
    out.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
  }
}
