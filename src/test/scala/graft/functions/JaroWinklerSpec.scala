package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** [[JaroWinkler]] against known values (verified against DuckDB's
  * `jaro_winkler_similarity`, the correctness oracle) and an
  * INDEPENDENT reference implementation (different algorithm shape:
  * per-character candidate lists instead of flag arrays) under
  * ScalaCheck, plus the codegen path through SQL.
  */
class JaroWinklerSpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(42L)).get

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("known values match the DuckDB oracle function") {
    // probed from duckdb jaro_winkler_similarity (see Scaladoc)
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("ab", "ba") == 0.0) // window 0: no matches
    assert(jw("abc", "cba") == 0.5555555555555555)
    assert(jw("AbC", "abc") == 0.5555555555555555) // case-sensitive
    // boost threshold: jaro 0.5 / 0.667 with common prefixes stay unboosted
    assert(jw("aaxxxxxx", "aayyyyyy") == 0.5)
    assert(jw("abcdxxxx", "abcdyyyy") == 0.6666666666666666)
    // jaro exactly 0.7 (first double above): boost applies
    assert(jw("aedbcxxxxx", "abcde") == 0.7300000000000001)
  }

  test("symmetry and range on random strings") {
    val gen = Gen.listOf(Gen.alphaLowerChar).map(_.mkString)
    val pairs = sample(Gen.zip(gen, gen), 500)
    pairs.foreach { case (a, b) =>
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0)
      // Jaro is symmetric; Winkler prefix is symmetric too
      assert(v == jw(b, a))
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
    }
  }

  /** Independent reference: textbook greedy matching written as an
    * O(n·m) scan over an explicit per-position window WITHOUT the
    * early-exit flag loop, transpositions via collected subsequences.
    */
  private def reference(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val used = Array.fill(b.length)(false)
    val matchedA = new StringBuilder
    val matchedBIdx = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- a.indices) {
      val cands = (math.max(0, i - window) to
        math.min(b.length - 1, i + window)).filter(j => !used(j) && b(j) == a(i))
      if (cands.nonEmpty) {
        used(cands.head) = true
        matchedA += a(i)
        matchedBIdx += cands.head
      }
    }
    val m = matchedA.length
    if (m == 0) return 0.0
    val matchedB = matchedBIdx.sorted.map(b(_)).mkString
    val trans = matchedA.toString.zip(matchedB).count { case (x, y) => x != y }
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m - trans / 2.0) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  test("matches an independent reference implementation on random pairs") {
    val gen = for {
      n <- Gen.choose(0, 12)
      s <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')) // small alphabet: many collisions
    } yield s.mkString
    val pairs = sample(Gen.zip(gen, gen), 2000)
    pairs.foreach { case (a, b) =>
      assert(jw(a, b) == reference(a, b), s"for ('$a','$b')")
    }
  }
}

/** Codegen-path check: the same values through SQL (whole-stage
  * codegen exercises doGenCode, not nullSafeEval).
  */
class JaroWinklerSqlSpec extends SparkSpec {
  test("jaro_winkler through SQL + codegen, null handling") {
    JaroWinkler.register(spark)
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("cold bolt", "old bolt"),
      (null, "x")).toDF("a", "b")
    val out = df.selectExpr("jaro_winkler(a, b) as jw").collect()
    assert(out(0).getDouble(0) == 0.9611111111111111)
    assert(out(1).getDouble(0) > 0.9)
    assert(out(2).isNullAt(0))
  }
}
