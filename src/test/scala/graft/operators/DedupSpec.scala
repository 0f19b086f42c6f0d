package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_exact groups identical texts under min doc_id at sf0.001") {
    val out = run("dedup_exact")
    val n = out.count()
    assert(n == 500)
    // canonical_id <= doc_id always; dup groups consistent
    assert(out.filter(col("canonical_id") > col("doc_id")).count() == 0)
    assert(out.filter(col("is_duplicate") && col("dup_count") < 2).count() == 0)
  }

  test("dup curve by order matches the hand-computed corpus") {
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "c c"), (4L, "  ")
    ).toDF("doc_id", "text")
    val got = Dedup.dupCurveByOrder(docs).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // n=1: 9 grams, 3 distinct; n=2: 6/4; n=4: 1/1; n=8: no word
    // array reaches length 8, so the order is ABSENT (not a 0-row)
    assert(got == Map(
      1 -> ((9L, 3L, 1.0 - 3.0 / 9.0)),
      2 -> ((6L, 4L, 1.0 - 4.0 / 6.0)),
      4 -> ((1L, 1L, 0.0))), s"curve was $got")
  }

  test("dup span coverage: interval union, self-repeats, and zero cases") {
    val docs = Seq(
      // cross-doc dup: the 8-gram "a b c d e f g h" at position 1
      (1L, "a b c d e f g h x y z q r s t u v"),
      (2L, "a b c d e f g h only once here pad pad2 pad3 pad4 pad5"),
      // SELF-repeating doc: dup positions {1,2,10,11} — overlapping
      // spans merge (contrib 8+1) and a far span re-opens (8... but
      // gap 10-2=8 caps at 8, then +1): total 18 of 18 tokens
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (4L, "short doc"),            // no 8-gram at all
      (5L, "")                      // blank: n_tokens 0, coverage 0
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanCoverage(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((17L, 1L, 8L, 470588L)),
      2L -> ((16L, 1L, 8L, 500000L)),
      3L -> ((18L, 4L, 18L, 1000000L)),
      4L -> ((2L, 0L, 0L, 0L)),
      5L -> ((0L, 0L, 0L, 0L))), s"coverage was $got")
  }

  test("dup curve matches an independent reference on random corpora") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val texts = (1 to 30).map(_ =>
        Seq.fill(rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar.toString)
          .mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val exp = Seq(1, 2, 4, 8).flatMap { n =>
        val grams = texts.map(_.trim).filter(_.nonEmpty)
          .flatMap(_.split("\\s+").sliding(n).filter(_.length == n)
            .map(_.mkString(" ")))
        if (grams.isEmpty) None
        else Some(n -> ((grams.size.toLong, grams.distinct.size.toLong)))
      }.toMap
      val got = Dedup.dupCurveByOrder(docs).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == exp, s"trial $trial: $got != $exp")
    }
  }

  test("dup curve is monotone-ish on the real corpus: unigram dup >> 8-gram dup") {
    val rows = run("dup_curve_by_order").collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(rows(1) > 0.9, s"unigram dup_rate ${rows(1)} should be near 1")
    assert(rows(1) > rows(2) && rows(2) > rows(4),
      s"dup rate should fall with order: $rows")
    assert(rows.contains(8))
  }

  test("jaccard of identical token sets is 1, disjoint is 0") {
    val docs = Seq(
      (1L, "a b c", "en", "s1"), (2L, "c b a", "en", "s1"),
      (3L, "x y z", "en", "s1"), (4L, "a b", "fr", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    // route through the registered query machinery via temp swap:
    val t = docs.select($"doc_id", $"lang", $"source",
      array_distinct(split(trim($"text"), "\\s+")).as("toks"))
    val a = t.select($"lang", $"source", $"doc_id".as("doc_a"), $"toks".as("toks_a"))
    val b = t.select($"lang", $"source", $"doc_id".as("doc_b"), $"toks".as("toks_b"))
    val pairs = a.join(b, Seq("lang", "source")).filter($"doc_a" < $"doc_b")
      .withColumn("jac",
        size(array_intersect($"toks_a", $"toks_b")).cast("double") /
          size(array_union($"toks_a", $"toks_b")).cast("double"))
      .select($"doc_a", $"doc_b", $"jac")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0) // same token set, different order
    assert(pairs((1L, 3L)) == 0.0) // disjoint
    assert(!pairs.contains((1L, 4L))) // different blocking key (lang)
  }

  test("containment rep branch on a copy-heavy corpus matches the hand oracle") {
    // 4/8 docs are exact copies (50 % dup share ≫ the 5 % gate), so
    // containmentPrefixJoin must take the rep-composition branch;
    // expected ordered pairs computed by hand over trigram shingles
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),          // 3 trigrams
      (2L, "w1 w2 w3 w4 w5"),          // copy of 1
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8"), // container: all of 1's trigrams
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8"), // copy of 3
      (5L, "x1 x2 x3 x4"),             // unrelated
      (6L, "x1 x2 x3 x4"),             // copy of 5
      (7L, "w1 w2"),                   // < 3 words: EMPTY shingle set
      (8L, "w1 w2")                    // copy of 7 — must NOT pair
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPrefixJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val intra = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 6L), (6L, 5L))
    // cross-group: every copy of {1,2} is fully inside every copy of
    // {3,4} (C = 3/3); the reverse direction is 3/6 = 0.5 < 0.6
    val cross = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(got.keySet == (intra ++ cross).toSet,
      s"pair set mismatch: got ${got.keySet.toSeq.sorted}")
    assert((intra ++ cross).forall(p => got(p) == 1.0))
  }

  test("jaccard prefix join rep branch on a copy-heavy corpus matches the hand oracle") {
    // 4/8 docs are exact copies (50 % dup share ≫ the 5 % gate), so
    // jaccardPrefixJoin must take the rep-composition branch;
    // expected unordered pairs computed by hand over trigram shingles
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),             // trigrams {123,234,345}
      (2L, "w1 w2 w3 w4 w5"),             // copy of 1
      (3L, "w1 w2 w3 w4 w5 w6"),          // {123,234,345,456}: J vs 1 = 3/4
      (4L, "w1 w2 w3 w4 w5 w6"),          // copy of 3
      (5L, "x1 x2 x3 x4"),                // unrelated
      (6L, "x1 x2 x3 x4"),                // copy of 5
      (7L, "w1 w2"),                      // < 3 words: EMPTY shingle set
      (8L, "w1 w2")                       // copy of 7 — must NOT pair
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ones = Seq((1L, 2L), (3L, 4L), (5L, 6L))
    val cross = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(got.keySet == (ones ++ cross).toSet,
      s"pair set mismatch: got ${got.keySet.toSeq.sorted}")
    assert(ones.forall(p => got(p) == 1.0))
    assert(cross.forall(p => got(p) == 0.75))
  }

  test("minhash-LSH finds planted exact and near duplicates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup
      (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup
      (4L, "completely different words about spark query engines here"),
      (5L, "unrelated text mentioning streams windows and watermarks")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical shingle sets always collide
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup found
    assert(!pairs.keys.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("edit pairs: typo-distance dups found, reordered tokens rejected") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact: dist 0
      (3L, "the quick brown fox jumps over the lazy cat again and again"), // 3 char edits
      (4L, "again and again the quick brown fox jumps over the lazy dog"), // reordered: same tokens, far in edit space
      (5L, "completely different words about spark query engines here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.editPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs((1L, 3L)) == 3) // dog -> cat
    // token-identical but rotated text: candidate (identical shingles
    // minus boundary) yet levenshtein far beyond 25% of 60 chars
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
    assert(!pairs.keys.exists { case (a, b) => Set(a, b).contains(5L) })
  }

  test("edit pairs at sf0.001 stay within the relative threshold") {
    val out = run("dedup_edit_pairs").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("rel_dist") <= Dedup.EditRelThreshold + 1e-9)
    }
  }

  test("clusters: transitive near-dups collapse to one component") {
    // 1≈2 (exact), 2≈3 (near) — 3 must join 1's cluster transitively
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words about spark query engines here"),
      (5L, "unrelated text mentioning streams windows and watermarks")
    ).toDF("doc_id", "text")
    val clusters = Dedup.minhashClusters(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(4L) == 4L && clusters(5L) == 5L)
  }

  test("minhash-LSH pairs respect the verification threshold") {
    val lsh = run("dedup_minhash_lsh")
    assert(lsh.filter(col("jaccard") < 0.5).count() == 0)
  }

  test("cluster_safe_split: near-dup pairs never straddle splits") {
    graft.functions.Md5Hash60.register(spark)
    val docs = graft.catalog.Tables(spark, sf).documents
    val split = Dedup.minhashClusters(docs)
      .withColumn("bucket", pmod(graft.functions.Md5Hash60.md5_hash60(
        $"cluster_id".cast("string")), lit(100L)))
      .withColumn("split", when($"bucket" < 80, "train")
        .when($"bucket" < 90, "val").otherwise("test"))
      .select($"doc_id", $"split")
    val pairs = Dedup.minhashPairs(docs)
    val straddling = pairs
      .join(split.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(split.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .filter($"sa" =!= $"sb")
    assert(straddling.count() == 0, "a near-dup pair crossed the split boundary")
  }

  test("simhash: identical texts get identical fingerprints") {
    val fp = run("simhash")
    val docs = graft.catalog.Tables(spark, sf).documents
    val joined = docs.select($"doc_id", md5($"text").as("h"))
      .join(fp, "doc_id")
      .groupBy($"h").agg(countDistinct($"simhash").as("nfp"))
    assert(joined.filter($"nfp" > 1).count() == 0)
  }

  test("band candidates: hot-bucket salting and singleton drop preserve the pair set") {
    // Regression guard for the r14 skew-proofing of the LSH bucket
    // self-join: a bucket with bn > SaltRows (256) must salt into
    // ceil(bn/256) sub-buckets WITHOUT losing or duplicating pairs,
    // and bn = 1 buckets must be dropped before the pair join.
    // 300 exact copies share every band signature → one 300-member
    // bucket per band (sn = 2); 3 copies of another text exercise the
    // multi-member-but-unsalted path (sn = 1); 5 unique texts land in
    // singleton buckets and must never pair. Expected candidate set is
    // exactly the within-family pairs: C(300,2) + C(3,2).
    val hot = (0 until 300).map(i =>
      (1000L + i, "shared boilerplate header repeated across the mirrored corpus"))
    val small = (0 until 3).map(i =>
      (2000L + i, "a second distinct family of identical documents"))
    val unique = (0 until 5).map(i => // fully disjoint shingle sets
      (3000L + i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val docs = (hot ++ small ++ unique).toDF("doc_id", "text")
    val got = Dedup.minhashBandCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected =
      (for { a <- 1000L until 1300L; b <- (a + 1) until 1300L } yield (a, b)).toSet ++
        (for { a <- 2000L until 2003L; b <- (a + 1) until 2003L } yield (a, b)).toSet
    assert(got.size == 44850 + 3, s"candidate count ${got.size}")
    assert(got == expected,
      s"pair set mismatch: missing ${(expected -- got).take(5)}, extra ${(got -- expected).take(5)}")
  }
}
