package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The per-block skew guard: a blocking group bigger than the cap
  * must NOT be compared all-pairs — candidates come from LSH banding
  * inside the block (subquadratic), with exact verification, and
  * planted duplicates still surface.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot lang×source block: 58 distinct docs + 1 planted dup pair
  private def hotBlock = {
    // token-DISJOINT filler docs (pairwise jaccard 0) so the only
    // legitimate band collisions are the planted duplicates
    val base = (1 to 58).map { i =>
      (i.toLong,
        (0 until 12).map(j => s"tok${i}x$j").mkString(" "),
        "en", "s1")
    }
    val dups = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again", "en", "s1"),
      (101L, "the quick brown fox jumps over the lazy dog again and again", "en", "s1"))
    (base ++ dups).toDF("doc_id", "text", "lang", "source")
  }

  test("oversized block still finds the planted duplicate via the LSH route") {
    val out = Dedup.jaccardPairsBlocked(hotBlock, blockCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((100L, 101L)) == 1.0)
  }

  test("oversized block generates subquadratic candidates, not all pairs") {
    val t = hotBlock.select($"doc_id", $"lang", $"source",
      array_distinct(split(trim($"text"), "\\s+")).as("toks"))
    val nCands = Dedup.bandedCandidates(t, Seq("lang", "source")).count()
    val n = 60L
    assert(nCands < n * (n - 1) / 2 / 4,
      s"banding produced $nCands candidates — effectively all-pairs")
  }

  test("guard not triggered: blocked path matches plain all-pairs output") {
    val capped = Dedup.jaccardPairsBlocked(hotBlock, blockCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all-pairs reference: exact-dup pair must be there, nothing bogus
    assert(capped.contains((100L, 101L)))
  }

  test("small embedding blocks equal brute force exactly (randomized)") {
    val rnd = new scala.util.Random(41)
    val emb = (1L to 80L).map { id =>
      (id, (id % 4).toInt, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "label", "embedding")
    // low threshold so random vectors actually produce pairs
    val fast = Dedup.embeddingPairsBlocked(emb, threshold = 0.1, blockCap = 1000)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    graft.functions.CosineSimilarity.register(spark)
    val brute = emb.select($"label", $"vec_id".as("vec_a"), $"embedding".as("ea"))
      .join(emb.select($"label", $"vec_id".as("vec_b"), $"embedding".as("eb")), Seq("label"))
      .filter($"vec_a" < $"vec_b")
      .withColumn("cosine", graft.functions.CosineSimilarity.cosine_sim($"ea", $"eb"))
      .filter($"cosine" >= 0.1)
      .select($"label", $"vec_a", $"vec_b", round($"cosine", 4).as("cosine"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(brute.nonEmpty, "threshold produced no pairs — test is vacuous")
    assert(fast == brute,
      s"blocked path diverged: missing ${brute -- fast}, extra ${fast -- brute}")
  }

  test("oversized embedding block keeps recall on NON-identical near-dups") {
    // planted pairs at cos ≈ 0.949 (y = 3x + n, x ⊥-ish n of equal
    // norm ⇒ cos = 3/√10): one 6-plane AND signature alone keeps
    // ~40 % of such pairs; the OR-of-8-bands path must do much better
    val mk = (seed: Int) =>
      Array.tabulate(64)(j => math.sin(seed * 64.0 + j))
    val base = (1 to 30).map(i => (i.toLong, 5, mk(i).map(_.toFloat)))
    val planted = (0 until 20).map { i =>
      val x = mk(1000 + i)
      val n = mk(2000 + i)
      (Seq((300L + 2 * i, 5, x.map(_.toFloat)),
        (301L + 2 * i, 5, x.zip(n).map { case (a, b) => (3 * a + b).toFloat })),
        (300L + 2 * i, 301L + 2 * i))
    }
    val emb = (base ++ planted.flatMap(_._1))
      .toDF("vec_id", "label", "embedding")
    val out = Dedup.embeddingPairsBlocked(emb, threshold = 0.9, blockCap = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val found = planted.map(_._2).count(out.contains)
    info(s"banded recall: $found/20")
    assert(found >= 14, s"recall collapsed: $found/20 planted pairs found")
  }

  test("oversized embedding block routes through hyperplane sub-buckets") {
    val mk = (seed: Int) =>
      Array.tabulate(64)(j => math.sin(seed * 64.0 + j).toFloat)
    val base = (1 to 28).map(i => (i.toLong, 5, mk(i)))
    val dups = Seq((100L, 5, mk(999)), (101L, 5, mk(999))) // identical pair
    val emb = (base ++ dups).toDF("vec_id", "label", "embedding")
    val out = Dedup.embeddingPairsBlocked(emb, threshold = 0.9, blockCap = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out.contains((100L, 101L)), s"identical pair missed: $out")
  }
}
