package graft.operators

import graft.SparkSpec

/** Hand-computed add-k bigram LM values on corpora small enough to
  * verify on paper — the smoothing and context-total arithmetic the
  * corpus oracle exercises only in aggregate.
  */
class BigramLogprobSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Double)] =
    TextAnalysis.bigramLogprob(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("uniform corpus: P(y|x) = (c+k)/(c_v + kV) exactly") {
    // two identical docs "x y": vocab {x, y} (V=2), c(x,y)=2, c(x)=2
    // P(y|x) = (2 + 0.5) / (2 + 0.5·2) = 2.5/3
    val expected = r4(-math.log(2.5 / 3.0))
    val got = run(Seq((1L, "x y"), (2L, "x y")))
    assert(got == Map(1L -> ((1L, expected)), 2L -> ((1L, expected))))
  }

  test("rare continuation scores higher NLL than the common one") {
    // context 'a' continues to 'b' three times, to 'z' once; V = 3
    // c(a) = 4, so P(b|a) = (3+0.5)/(4+0.5·3) = 3.5/5.5 and
    // P(z|a) = 1.5/5.5
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a z"))
    val got = run(docs)
    val nllB = r4(-math.log(3.5 / 5.5))
    val nllZ = r4(-math.log(1.5 / 5.5))
    assert(got(1L) == ((1L, nllB)) && got(4L) == ((1L, nllZ)))
    assert(nllZ > nllB, "rare continuation must score higher NLL")
  }

  test("docs with fewer than two words are excluded; blanks ignored") {
    val got = run(Seq((1L, "solo"), (2L, "  "), (3L, "p q")))
    assert(got.keySet == Set(3L))
    assert(got(3L)._1 == 1L)
  }

  test("multi-bigram doc averages over its occurrences") {
    // doc "m n m n": bigrams (m,n) ×2, (n,m) ×1; V = 2
    // c(m,n)=2, c(m)=2; c(n,m)=1, c(n)=1
    val pMN = (2 + 0.5) / (2 + 0.5 * 2)
    val pNM = (1 + 0.5) / (1 + 0.5 * 2)
    val expected = r4((-math.log(pMN) * 2 + -math.log(pNM)) / 3.0)
    val got = run(Seq((1L, "m n m n")))
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - expected) <= 1e-4,
      s"${got(1L)._2} vs $expected")
  }
}
