package graft.operators

import graft.SparkSpec

/** Semantics of the mixture-design operators on corpora small enough
  * to check by hand or against a driver-side reference.
  */
class CorpusMixtureSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))

  test("dsirWeights ranks target-distinctive docs above anti-target ones") {
    // 'en' docs use "alpha"; others use "beta"; doc 5 mixes
    val d = docs(
      (1L, "alpha alpha alpha", "en", "s"),
      (2L, "alpha alpha alpha", "en", "s"),
      (3L, "beta beta beta", "de", "s"),
      (4L, "beta beta beta", "fr", "s"),
      (5L, "alpha beta", "de", "s"))
    val got = CorpusMixture.dsirWeights(d, "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(1L) == got(2L))
    assert(got(1L) > got(5L), "pure-target beats mixed")
    assert(got(5L) > got(3L), "mixed beats pure-anti-target")
    assert(got(3L) == got(4L))
    // hand value: p_t(alpha)=(6+.5)/(6+1), p_r(alpha)=(7+.5)/(14+1)
    val expected1 = math.log((6 + 0.5) / (6 + 1.0)) -
      math.log((7 + 0.5) / (14 + 1.0))
    assert(math.abs(got(1L) - math.rint(expected1 * 1e4) / 1e4) < 1e-9)
  }

  test("sourceKl is 0 for an identically-distributed source, larger for skew") {
    val d = docs(
      (1L, "a b", "en", "uniform"),
      (2L, "a b", "en", "uniform2"),
      (3L, "a a a b", "en", "skewed"))
    // corpus: a=5,b=3. uniform sources match each other but not corpus
    val got = CorpusMixture.sourceKl(d)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("uniform") == got("uniform2"))
    assert(got("skewed")._2 > got("uniform")._2,
      "the skewed source diverges more from the corpus mix")
    // exact: KL(skewed) = .75 ln(.75/(5/8)) + .25 ln(.25/(3/8))
    val want = 0.75 * math.log(0.75 / (5.0 / 8)) +
      0.25 * math.log(0.25 / (3.0 / 8))
    assert(math.abs(got("skewed")._2 - math.rint(want * 1e4) / 1e4) < 1e-9)
  }

  test("pmiCollocations surfaces the glued pair above frequent-but-independent ones") {
    // "new york" always adjacent; "the cat"/"the dog" mix contexts
    val text = Seq.fill(10)("new york").mkString(" ")
    val noise = Seq.fill(10)("the cat the dog").mkString(" ")
    val d = docs((1L, text, "en", "s"), (2L, noise, "en", "s"))
    val rows = CorpusMixture.pmiCollocations(d, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    val byPair = rows.map(t => (t._1, t._2) -> t._3).toMap
    assert(byPair.contains(("new", "york")))
    assert(byPair(("new", "york")) > byPair(("the", "cat")),
      "always-adjacent pair outranks independent co-occurrence")
    // ordering is by rounded pmi desc then pair
    assert(rows.sortBy(t => (-t._3, t._1, t._2)).toSeq == rows.toSeq)
  }

  test("weightedSample matches the driver-side A-ES reference and favors heavy docs") {
    // weights 1 vs 1000, decorrelated from the source key (i % 4
    // picks the source, i / 4 parity picks the weight) so every
    // source holds 25 heavy + 25 light docs
    def isHeavy(i: Long): Boolean = (i / 4) % 2 == 0
    val many = (0L until 200L).map { i =>
      (i, if (isHeavy(i)) "x" * 1000 else "x", "en", s"src${i % 4}")
    }
    val d = docs(many: _*)
    val got = CorpusMixture.weightedSample(d, k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.length == 20) // 4 sources x 5
    // reference: same key formula in plain Scala
    def key(id: Long, w: Long): Double = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h60 = new java.math.BigInteger(1, md5.take(8))
        .shiftRight(4).longValue() // top 60 bits
      val h = ((h60 % (1L << 50)) + (1L << 50)) % (1L << 50)
      math.log((h + 1).toDouble / (1L << 50).toDouble) / math.max(w, 1L).toDouble
    }
    val ref = many.groupBy(_._4).flatMap { case (src, rows) =>
      rows.map(r => (src, r._1, key(r._1, r._2.length.toLong)))
        .sortBy { case (_, id, k0) => (-k0, id) }
        .take(5).zipWithIndex
        .map { case ((s, id, _), i) => (s, i + 1, id) }
    }.toSet
    assert(got.toSet == ref)
    val heavyShare = got.count(t => isHeavy(t._3)).toDouble / got.length
    assert(heavyShare >= 0.9, s"heavy docs should dominate, got $heavyShare")
  }

  test("tokenBudgetEpochs: cap binds, budget conserved, quality ordering") {
    // "clean": all 5-char tokens (quality_e6 = 1e6); "noisy": half the
    // tokens are 1-char (quality_e6 = 5e5); equal token counts, so the
    // quality-proportional split targets 2/3 vs 1/3 of a 2x budget
    val d = docs(
      (1L, "heavy heavy heavy heavy", "en", "clean"),
      (2L, "a token a token a token a token", "en", "noisy"))
    val rows = CorpusMixture.tokenBudgetEpochs(d, budgetMultiple = 2,
        maxEpochsE6 = 4000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (nc, qc, ec, ac) = rows("clean")
    val (nn, qn, en, an) = rows("noisy")
    assert(nc == 4 && nn == 8)
    assert(qc == 1000000L && qn == 500000L)
    // qweight = 1e6*4 + 5e5*8 = 8e6; budget = 24 tokens.
    // clean target = 24*4e6/8e6 = 12 -> 3 epochs; noisy = 12 -> 1.5
    assert(ec == 3000000L && en == 1500000L)
    assert(ac == 12L && an == 12L)
    assert(ac + an == 2 * (nc + nn), "uncapped allocation spends the budget")
    // a tight cap binds and leftover is NOT redistributed
    val capped = CorpusMixture.tokenBudgetEpochs(d, budgetMultiple = 2,
        maxEpochsE6 = 2000000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(capped("clean") == ((2000000L, 8L)), "cap binds the clean source")
    assert(capped("noisy") == ((1500000L, 12L)), "uncapped source unchanged")
  }
}
