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
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
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
    (merges.toSeq, syms)
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
        val exp = (ws.length.toLong, ws.map(w => expSyms(w).length.toLong).sum)
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

  /** Decode certificate against an independent reference: vocab ids by
    * (weighted occurrence DESC, token ASC), lossless reconstruction,
    * and the position-weighted id checksum — all recomputed with plain
    * Scala collections and compared to the one-row Spark result.
    */
  private def checkDecode(texts: Seq[String], rounds: Int, label: String)
      : Unit = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val words = texts.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
    val (_, syms) = reference(words, rounds)
    val wf = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nOcc = scala.collection.mutable.Map[String, Long]()
    for ((w, s) <- syms; t <- s) nOcc(t) = nOcc.getOrElse(t, 0L) + wf(w)
    val ids = nOcc.toSeq.sortBy { case (t, n) => (-n, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val expWords = syms.size.toLong
    val expVocab = ids.size.toLong
    val expTokens = syms.values.map(_.length.toLong).sum
    val expOk = syms.count { case (w, s) => s.mkString == w }.toLong
    val expSum = syms.values.flatMap(_.zipWithIndex.map {
      case (t, i) => (i + 1L) * ids(t) }).sum
    val row = TextAnalysis.bpeDecodeRoundtrip(docs, rounds).collect()(0)
    val got = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4))
    val exp = (expWords, expVocab, expTokens, expOk, expSum)
    assert(got == exp, s"$label: certificate $got != $exp")
    assert(row.getLong(3) == row.getLong(0),
      s"$label: decode was lossy — ${row.getLong(3)} of ${row.getLong(0)}")
  }

  test("decode roundtrip certificate matches the reference on random corpora") {
    val rnd = new scala.util.Random(29)
    val texts = (1 to 25).map(_ =>
      Seq.fill(3 + rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(7))(('a' + rnd.nextInt(3)).toChar)
          .mkString).mkString(" "))
    checkDecode(texts, rounds = 4, "decode-random")
    checkDecode(Seq("aaaa aaa aa a", "ababab abab ab", "xyz zyx"),
      rounds = 5, "decode-adversarial")
  }
}
