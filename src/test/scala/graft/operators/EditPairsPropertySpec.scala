package graft.operators

import graft.SparkSpec

/** Randomized exactness guard for editPairs' verify stage: over the
  * deterministic banded-MinHash candidates, the banded thresholded
  * Levenshtein + relative filter must return EXACTLY the pairs an
  * independent reference DP admits at the same threshold — same
  * pairs, same distances. Corpora plant near-dups by random
  * single-character mutation (the regime the operator exists for)
  * plus unrelated noise docs.
  */
class EditPairsPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Textbook full-table Levenshtein, independently coded. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  private def check(docs: Seq[(Long, String)], label: String): Unit = {
    val df = docs.toDF("doc_id", "text")
    val fast = Dedup.editPairs(df)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val byId = docs.toMap
    val cands = Dedup.minhashBandCandidates(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val slow = cands.flatMap { case (a, b) =>
      val (ta, tb) = (byId(a), byId(b))
      val d = lev(ta, tb)
      if (d <= Dedup.EditRelThreshold * math.max(ta.length, tb.length))
        Some((a, b) -> d)
      else None
    }.toMap
    assert(fast == slow,
      s"$label: edit verify diverged from reference DP — " +
        s"missing ${slow.toSet -- fast.toSet}, extra ${fast.toSet -- slow.toSet}")
  }

  private def mutate(s: String, edits: Int, rnd: scala.util.Random): String = {
    var cur = s
    for (_ <- 0 until edits if cur.nonEmpty) {
      val i = rnd.nextInt(cur.length)
      rnd.nextInt(3) match {
        case 0 => cur = cur.updated(i, ('a' + rnd.nextInt(26)).toChar) // swap
        case 1 => cur = cur.take(i) + cur.drop(i + 1)                  // delete
        case _ => cur = cur.take(i) + ('a' + rnd.nextInt(26)).toChar + cur.drop(i) // insert
      }
    }
    cur
  }

  test("planted mutation near-dups match the reference DP") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"tok$i")
    def doc() = Seq.fill(8 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")
    val base = (1L to 20L).map(id => id -> doc())
    // 21..30: light mutations of 1..10 (should mostly qualify);
    // 31..40: heavy mutations (mostly candidates that FAIL the verify)
    val near = (21L to 30L).map(id =>
      id -> mutate(base((id - 21).toInt)._2, 1 + rnd.nextInt(4), rnd))
    val far = (31L to 40L).map(id =>
      id -> mutate(base((id - 31).toInt)._2, 30 + rnd.nextInt(30), rnd))
    check(base ++ near ++ far, "mutation-corpus")
    // sanity: the regime is non-trivial — some pair must qualify
    assert(Dedup.editPairs((base ++ near).toDF("doc_id", "text")).count() > 0)
  }

  test("duplicate-heavy corpus (distance-0 pairs) matches the reference DP") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 10).map(i => s"w$i")
    val texts = (0 until 8).map(_ =>
      Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = (1L to 24L).map(id => id -> texts((id % 8).toInt))
    check(docs, "dup-heavy")
  }
}
