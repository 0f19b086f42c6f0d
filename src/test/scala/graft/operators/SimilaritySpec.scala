package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force cosine top-k: k rows per query, rank 1 is the max") {
    val out = run("ann_cosine_topk")
    val perQuery = out.groupBy($"qid").agg(count(lit(1)).as("n"),
      max($"cosine").as("mx"),
      max(when($"rank" === 1, $"cosine")).as("r1"))
    assert(perQuery.filter($"n" =!= 5).count() == 0)
    assert(perQuery.filter($"r1" =!= $"mx").count() == 0)
    // cosine bounded
    assert(out.filter($"cosine" > 1.0001 || $"cosine" < -1.0001).count() == 0)
  }

  test("LSH top-k cosines agree with brute-force for shared (qid, vec_id)") {
    val bf = run("ann_cosine_topk").select($"qid", $"vec_id", $"cosine".as("c_bf"))
    val lsh = run("ann_lsh_topk").select($"qid", $"vec_id", $"cosine".as("c_lsh"))
    val joined = lsh.join(bf, Seq("qid", "vec_id"))
    assert(joined.filter(abs($"c_bf" - $"c_lsh") > 1e-9).count() == 0)
  }

  test("LSH restricts search to the query's bucket") {
    val out = run("ann_lsh_topk")
    // every returned row carries the bucket, and per query all rows
    // share one bucket value
    val perQuery = out.groupBy($"qid").agg(countDistinct($"bucket").as("nb"))
    assert(perQuery.filter($"nb" > 1).count() == 0)
  }

  test("multi-probe recall vs brute force >= single-bucket recall") {
    def hits(name: String) = run(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = hits("ann_cosine_topk")
    val single = (hits("ann_lsh_topk") & brute).size.toDouble / brute.size
    val multi = (hits("ann_lsh_multiprobe") & brute).size.toDouble / brute.size
    info(f"recall@5: single-bucket $single%.3f, multi-probe $multi%.3f")
    assert(multi >= single,
      f"multi-probe recall $multi%.3f below single-bucket $single%.3f")
    // probing 7 of 64 buckets must widen the reach beyond one bucket:
    // per query, returned neighbors may span several buckets
    val buckets = run("ann_lsh_multiprobe").groupBy($"qid")
      .agg(countDistinct($"bucket").as("nb"))
    assert(buckets.agg(max($"nb")).head().getLong(0) >= 1)
  }

  test("requireExact raises on an over-cap block instead of going approximate") {
    val emb = (1L to 6L).map(i => (0L, i, Array(1.0f, 0.0f)))
      .toDF("label", "vec_id", "embedding")
    val ex = intercept[Exception] {
      Dedup.embeddingPairsBlocked(emb, 0.4, blockCap = 5, requireExact = true)
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pairs would be approximate")), ex.toString)
    // same data under the cap: exact pairs, no error
    assert(Dedup.embeddingPairsBlocked(emb, 0.4, blockCap = 6,
      requireExact = true).count() == 15)
  }

  test("semdedup requireExact handles an empty embeddings table") {
    // max over zero buckets is NULL — the cap check must treat it as
    // 0 and return an empty result, not throw
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semDedup(empty, requireExact = true).count() == 0)
  }

  test("knn join: per-vector ranks complete, symmetric scores, cap raises") {
    val out = run("knn_join_blocked").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // every vector gets exactly KnnK ranked rows (each sf0.001 label
    // block is larger than k) with ranks 1..k
    out.groupBy(_._1).foreach { case (v, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"vector $v ranks not contiguous")
    }
    // cosine is symmetric: if b is a's #1 at c, a scores c with b too
    val score = out.map(t => (t._1, t._3) -> t._4).toMap
    out.filter(_._2 == 1).foreach { case (a, _, b, c) =>
      score.get((b, a)).foreach(cb => assert(math.abs(cb - c) < 1e-9))
    }
    // an over-cap block fails loudly instead of degrading
    val emb = (1L to 12L).map(i =>
      (i, 0, Array.fill(4)(i.toFloat))).toDF("vec_id", "label", "embedding")
    val e = intercept[Exception] {
      Similarity.knnJoinBlocked(emb, k = 2, blockCap = 5).count()
    }
    assert(e.getMessage != null)
    // the guard must also remain IN THE PLAN: it only survives
    // because the always-true bn > 0 filter references the
    // raise_error column, so an optimizer change that folds or
    // prunes that filter would silently drop the cap check — catch
    // that here instead of by a silent accuracy degradation
    val plan = Similarity.knnJoinBlocked(emb, k = 2, blockCap = 5)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("raise_error"),
      "blockCap raise_error guard was optimized out of the plan")
  }

  test("knn rep composition ≡ direct all-pairs on copy-heavy corpora (incl. rk ties)") {
    for (seed <- Seq(7, 41)) {
      val rnd = new scala.util.Random(seed)
      // 8 distinct vectors over 2 labels, each duplicated 1-4×: the
      // 30×-smoke shape in miniature (dup share ≫ the 5% gate)
      val base = (0 until 8).map { i =>
        (i % 2, Array.fill(6)(rnd.nextFloat() * 2 - 1), 1 + (i % 4))
      }
      val rows = base.zipWithIndex.flatMap { case ((lbl, e, copies), gi) =>
        (0 until copies).map(c => ((gi * 10 + c).toLong, lbl, e))
      }
      val emb = rows.toDF("vec_id", "label", "embedding")
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val direct = canon(Similarity.knnJoinDirect(emb, k = 3, blockCap = 100))
      val reps = canon(Similarity.knnJoinReps(emb, k = 3, blockCap = 100))
      assert(reps == direct,
        s"seed $seed: rep-composition output diverged from all-pairs\n" +
          s"only-direct: ${(direct -- reps).take(5)}\nonly-reps: ${(reps -- direct).take(5)}")
      // the gate must route this corpus (dup share ~60%) to reps —
      // i.e. the public entry agrees too
      assert(canon(Similarity.knnJoinBlocked(emb, k = 3, blockCap = 100)) == direct)
      spark.catalog.clearCache()
    }
  }

  test("hot-block salting is invisible: salted ≡ unsalted on a Zipf-labeled corpus") {
    // the r14 Zipf smoke's shape in miniature: one label holds most
    // vectors (the smoke measured the unsalted hot block as ONE
    // 237-second task). saltRows=3 forces multi-salt (sn up to 10)
    // at unit scale; saltRows=MaxValue pins sn=1 — the unsalted
    // reference join. Outputs must match row-for-row, including ties.
    val rnd = new scala.util.Random(23)
    val rows = (1L to 40L).map { i =>
      val lbl = if (i <= 30) 0 else (i % 3 + 1).toInt // hot label 0: 30 rows
      (i, lbl, Array.fill(6)(rnd.nextFloat() * 2 - 1))
    }
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val emb = rows.toDF("vec_id", "label", "embedding")
    val unsalted = canon(Similarity.knnJoinDirect(emb, k = 3, blockCap = 100,
      saltRows = Int.MaxValue))
    val salted = canon(Similarity.knnJoinDirect(emb, k = 3, blockCap = 100,
      saltRows = 3))
    assert(salted == unsalted, "salting changed the direct knn output")
    // same invariant through the rep branch (duplicated hot vectors)
    val dup = rows.flatMap { case (i, l, e) =>
      Seq((i, l, e), (i + 1000L, l, e)) }.toDF("vec_id", "label", "embedding")
    val repsUnsalted = canon(Similarity.knnJoinReps(dup, k = 3, blockCap = 100,
      saltRows = Int.MaxValue))
    val repsSalted = canon(Similarity.knnJoinReps(dup, k = 3, blockCap = 100,
      saltRows = 3))
    assert(repsSalted == repsUnsalted, "salting changed the reps knn output")
    spark.catalog.clearCache()
  }

  test("knn rep branch caps on DISTINCT vectors, not raw copies") {
    // 4 distinct vectors ×10 copies = 40 rows, cap 5: distinct count
    // 4 <= 5, so the rep branch must NOT raise
    val emb = (0 until 4).flatMap(g => (0 until 10).map(c =>
      ((g * 100 + c).toLong, 0, Array.fill(4)((g + 1).toFloat))))
      .toDF("vec_id", "label", "embedding")
    assert(Similarity.knnJoinReps(emb, k = 2, blockCap = 5).count() > 0)
    spark.catalog.clearCache()
  }

  test("semdedup: clusters are consistent and representatives minimal") {
    val out = run("semdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // every vector appears exactly once
    assert(out.map(_._1).distinct.length == out.length)
    // cluster_id is the min member of its cluster, kept <=> id == cluster
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.map(_._1).min == c, s"cluster $c min-id mismatch")
      assert(members.count(_._3) == 1, s"cluster $c keeps != 1 representative")
    }
    // planted duplicate embeddings (if any) must share a cluster;
    // at minimum, output partitions the corpus
    assert(out.map(_._2).distinct.length <= out.length)
  }
}
