package graft.operators

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fingerprints(texts: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    // recompute the selected-min sets via the registered query's
    // digest inputs: rerun the pipeline pieces through the query and
    // compare digests — for the guarantee test we only need digest
    // EQUALITY/overlap, so reconstruct sets with a reference
    // implementation instead
    import java.security.MessageDigest
    def h60(s: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    texts.map { case (id, t) =>
      val grams = (0 to t.length - 8).map(i => h60(t.substring(i, i + 8)))
      val m = math.max(grams.length - 3, 1)
      val mins = (0 until math.min(m, grams.length))
        .map(j => grams.slice(j, j + 4).min).toSet
      id -> mins
    }.toMap
  }

  test("winnowing guarantee: docs sharing an 11+ char substring share a fingerprint") {
    val shared = "unmistakable-shared-span"
    val a = s"left context here $shared and a tail"
    val b = s"completely different prefix $shared other ending"
    val c = "nothing in common with either document at all"
    val fps = fingerprints(Seq((1L, a), (2L, b), (3L, c)))
    assert((fps(1L) & fps(2L)).nonEmpty, "shared span produced no shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty)
  }

  test("query output: deterministic digests, identical texts collide, short texts empty") {
    val out = run("winnow_fingerprints").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 500)
    // every doc in this corpus is >= 8 chars, so all have fingerprints
    assert(out.forall(_._2 > 0))
    // exact dups (dedup_exact finds some) must share digests
    val texts = run("dedup_exact").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap // doc_id -> md5(text)
    val byText = out.groupBy(t => texts(t._1))
    byText.values.foreach { grp =>
      assert(grp.map(_._3).distinct.length == 1,
        "identical texts produced different winnow digests")
    }
  }
}
