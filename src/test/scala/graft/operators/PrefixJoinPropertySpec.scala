package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized exactness guard for jaccardPrefixJoin: on synthetic
  * corpora the prefix-filtered + positionally-pruned + hash-verified
  * pipeline must return EXACTLY the quadratic all-pairs answer —
  * same pairs, same jaccard values. Three corpus shapes stress the
  * different pruning paths: a degenerate tiny vocabulary (huge
  * prefix buckets, the testdata shape), a wide vocabulary (sparse
  * buckets, heavy length-filter pruning), and planted near-dup pairs
  * at mixed lengths (asymmetric probe-prefix + positional-bound
  * edge cases).
  */
class PrefixJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Quadratic reference on k-gram shingle sets, same rounding. */
  private def bruteForce(docs: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = split(trim(col("text")), "\\s+")
    val m = greatest(size(w) - lit(k - 1), lit(0))
    val sets = docs.select(col("doc_id"),
      array_distinct((2 to k).foldLeft(slice(w, lit(1), m))((acc, j) =>
        zip_with(acc, slice(w, lit(j), m),
          (a, b) => concat(a, lit(" "), b)))).as("toks"))
    sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.toks"), col("b.toks"))))
      .withColumn("jac", col("inter").cast("double") /
        greatest(size(col("a.toks")) + size(col("b.toks")) - col("inter"),
          lit(1)).cast("double"))
      .filter(col("jac") >= 0.5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(col("jac"), 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def check(docs: Seq[(Long, String)], label: String): Unit = {
    val df = docs.toDF("doc_id", "text")
    // both supported shingle widths: 2 (dense-bucket stress) and the
    // low-entropy-safe default 3 — exactness must hold at any k
    for (k <- Seq(2, 3)) {
      val fast = Dedup.jaccardPrefixJoin(df, shingleK = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val slow = bruteForce(df, k)
      assert(fast == slow,
        s"$label (k=$k): prefix join diverged from brute force — " +
          s"missing ${slow -- fast}, extra ${fast -- slow}")
    }
  }

  test("tiny vocabulary (degenerate buckets) matches brute force") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (1L to 60L).map { id =>
      id -> Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    check(docs, "tiny-vocab")
  }

  test("wide vocabulary (sparse buckets) matches brute force") {
    val rnd = new scala.util.Random(23)
    val docs = (1L to 60L).map { id =>
      id -> Seq.fill(8 + rnd.nextInt(25))(s"t${rnd.nextInt(4000)}")
        .mkString(" ")
    }
    check(docs, "wide-vocab")
  }

  test("planted near-dups at mixed lengths match brute force") {
    val rnd = new scala.util.Random(37)
    val base = (1L to 30L).map { id =>
      id -> Seq.fill(10 + rnd.nextInt(30))(s"x${rnd.nextInt(200)}")
        .mkString(" ")
    }
    // near-dups: append a short suffix to an existing doc (high
    // jaccard, different lengths — exercises the asymmetric prefix)
    val dups = (0 until 10).map { i =>
      val (srcId, text) = base(i * 3 % base.size)
      (100L + i) -> (text + " " + Seq.fill(1 + i % 3)(s"y$i").mkString(" "))
    }
    check(base ++ dups, "planted-near-dups")
  }

  test("copy-heavy corpus routes through the rep branch and matches brute force") {
    // every doc duplicated 1–3× → dup share far above the 5% gate, so
    // BOTH joins take the exact-then-near representative composition;
    // the quadratic references don't know about reps, so equality
    // proves the composition is output-identical on random input (the
    // hand-oracle tests pin only fixed corpora)
    val rnd = new scala.util.Random(71)
    val base = (1L to 15L).map { id =>
      id -> Seq.fill(6 + rnd.nextInt(15))(s"z${rnd.nextInt(150)}").mkString(" ")
    }
    var nid = 1000L
    val copies = base.flatMap { case (_, text) =>
      (0 until 1 + rnd.nextInt(3)).map { _ => nid += 1; nid -> text }
    }
    val docs = base ++ copies
    check(docs, "copy-heavy")
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(0.6, 0.9)) {
      val fast = Dedup.containmentPrefixJoin(df, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val slow = bruteForceContainment(df, 3, t)
      assert(fast == slow,
        s"copy-heavy containment (t=$t) diverged — missing ${slow -- fast}, " +
          s"extra ${fast -- slow}")
    }
  }

  /** Quadratic ordered-pair containment reference, same rounding. */
  private def bruteForceContainment(docs: org.apache.spark.sql.DataFrame,
                                    k: Int, t: Double) = {
    val w = split(trim(col("text")), "\\s+")
    val m = greatest(size(w) - lit(k - 1), lit(0))
    val sets = docs.select(col("doc_id"),
      array_distinct((2 to k).foldLeft(slice(w, lit(1), m))((acc, j) =>
        zip_with(acc, slice(w, lit(j), m),
          (a, b) => concat(a, lit(" "), b)))).as("toks"))
    sets.as("a").join(sets.as("b"), col("a.doc_id") =!= col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.toks"), col("b.toks"))))
      .withColumn("c", col("inter").cast("double") /
        greatest(size(col("a.toks")), lit(1)).cast("double"))
      .filter(col("c") >= t)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(col("c"), 4).as("containment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("containment join matches ordered brute force, incl. small-in-big") {
    val rnd = new scala.util.Random(53)
    val base = (1L to 25L).map { id =>
      id -> Seq.fill(12 + rnd.nextInt(25))(s"x${rnd.nextInt(150)}")
        .mkString(" ")
    }
    // the asymmetric shape the join exists for: short docs fully
    // embedded inside much longer ones (Jaccard ≈ |A|/|B| ≈ small,
    // containment = 1) plus partial-overlap grafts
    val contained = (0 until 8).map { i =>
      val (_, big) = base(i % base.size)
      val words = big.split(" ")
      (200L + i) -> words.slice(i % 3, i % 3 + 6 + i).mkString(" ")
    }
    val grafts = (0 until 5).map { i =>
      val (_, a) = base(i); val (_, b) = base((i + 7) % base.size)
      (300L + i) -> (a.split(" ").take(8).mkString(" ") + " " +
        b.split(" ").take(4).mkString(" "))
    }
    val df = (base ++ contained ++ grafts).toDF("doc_id", "text")
    for (k <- Seq(2, 3); t <- Seq(0.6, 0.9)) {
      val fast = Dedup.containmentPrefixJoin(df, threshold = t, shingleK = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val slow = bruteForceContainment(df, k, t)
      assert(fast == slow,
        s"containment (k=$k, t=$t) diverged — missing ${slow -- fast}, " +
          s"extra ${fast -- slow}")
      // at least one pair must be a genuine small-in-big inclusion
      // that the symmetric Jaccard join at the same threshold misses
      if (t == 0.9) {
        val jac = bruteForce(df, k)
          .map { case (a, b, _) => (a, b) }
        val asym = slow.map { case (a, b, _) => (a, b) }
          .filterNot(p => jac.contains(p) || jac.contains(p.swap))
        assert(asym.nonEmpty,
          "expected containment-only pairs invisible to Jaccard")
      }
    }
  }
}
