package graft.operators

import graft.SparkSpec

/** Randomized exactness guard for the BPE trainer: on random corpora
  * (including adversarial runs like `aaaa`/`ababab`, where greedy
  * left-to-right non-overlapping merging is easiest to get wrong)
  * the distributed fold-based trainer must learn EXACTLY the merges
  * an independently-coded reference trainer learns — same pairs,
  * same counts, same order — and encode to the same token totals.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference trainer: explicit index-walk greedy merge. */
  private def reference(words: Seq[String], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Int]) = {
    val wf = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var syms: Map[String, Vector[String]] =
      wf.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    for (_ <- 1 to rounds) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, s) <- syms; i <- 0 until s.length - 1)
        pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + wf(w)
      if (pc.nonEmpty) {
        val ((l, r), n) = pc.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r, n))
        syms = syms.map { case (w, s) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += s(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    (merges.toSeq, syms.view.mapValues(_.length).toMap)
  }

  private def check(texts: Seq[String], rounds: Int, label: String): Unit = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val words = texts.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
    val (expMerges, expSyms) = reference(words, rounds)
    val gotMerges = TextAnalysis.bpeLearnMerges(docs, rounds)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(gotMerges == expMerges,
      s"$label: merges diverged — got $gotMerges, expected $expMerges")
    val gotCounts = TextAnalysis.bpeEncodeCounts(docs, rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      if (ws.nonEmpty) {
        val exp = (ws.length.toLong, ws.map(w => expSyms(w).toLong).sum)
        assert(gotCounts(i.toLong) == exp,
          s"$label doc $i: encode counts ${gotCounts(i.toLong)} != $exp")
      }
    }
  }

  test("random low-alphabet corpora match the reference trainer") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val texts = (1 to 25).map(_ =>
        Seq.fill(3 + rnd.nextInt(8))(
          Seq.fill(1 + rnd.nextInt(7))(('a' + rnd.nextInt(3)).toChar)
            .mkString).mkString(" "))
      check(texts, rounds = 4, s"low-alphabet-$trial")
    }
  }

  test("adversarial repeated-run words match the reference trainer") {
    val texts = Seq(
      "aaaa aaa aa a",
      "ababab abab ab",
      "aabb bbaa abab baba",
      "aaaa aaaa aaaa",
      "b bb bbb bbbb bbbbb")
    check(texts, rounds = 5, "repeat-runs")
  }
}
