package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only scale smoke (like [[Profile]]): unions the REAL sf
  * tables N× in memory (ids offset per copy) and times the heaviest
  * operators at ~N× the bench scale. Identical copies are the
  * ADVERSARIAL case for every LSH/banding structure — each copy
  * group collides in ALL bands, so candidate volume grows
  * quadratically in the copy count within a group while staying
  * linear in groups. Nothing is written to testdata; this exists to
  * answer "does the plan survive a 10× scale-up" with a measurement
  * instead of an argument.
  *
  * Usage: runMain graft.ScaleSmoke [sfDir] [mult] [op,op,...]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    // optional filter: time only the named ops (the 30-50× runs probe
    // the four operators whose growth is intrinsic without paying for
    // the whole battery at that scale)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val spark = GraftSession.local()
    // SPARK_GRAFT_CHECKPOINT_DIR=/path drives the RELIABLE-checkpoint
    // regime (r14 verdict #7): with a checkpoint dir set,
    // pageRankConverged's per-round truncation swaps localCheckpoint →
    // Dataset.checkpoint automatically (DEPLOY.md's cluster contract).
    // Combine with SPARK_GRAFT_PR_DEBUG=1 to get per-round cost so the
    // reliable-vs-local delta is a measured number, not an argument.
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
    val t = graft.catalog.Tables(spark, sfDir)

    // copy offset far above any real id (ids at larger sf can pass
    // 10M; colliding copies would silently merge rows and corrupt
    // the measurement)
    val off = 1L << 40
    def scaled(df: DataFrame, idCols: String*): DataFrame =
      (0 until mult).map(i =>
        idCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i.toLong * off))))
        .reduce(_ unionAll _)

    val docs = scaled(t.documents, "doc_id")
    val emb = scaled(t.embeddings, "vec_id")
    println(s"docs=${docs.count()} vectors=${emb.count()} (mult=$mult over $sfDir)")

    // inputs re-pinned (and re-materialized, OUTSIDE the timer) before
    // every op — see time() below
    val pinned = scala.collection.mutable.ArrayBuffer[DataFrame](docs, emb)

    def time(name: String)(body: => Long): Unit = {
      if (only.exists(!_.contains(name))) return
      // per-op isolation, same as Bench: drop the previous op's
      // internal persists — without this a prior op's cache blocks
      // linger and shift memory/GC cost onto whoever runs next (the
      // r8 smoke saw jaccard_prefix_join swing 13→30 s on identical
      // input from exactly this). Then re-pin + re-materialize the
      // input frames before the timer starts, so every op reads the
      // same warm cached inputs.
      spark.catalog.clearCache()
      pinned.foreach { df =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
      }
      // per-op GC + foreign-CPU telemetry (same sources as Bench):
      // the r12 host-variance investigation had to re-run batteries
      // to separate "slower kernel" from "GC tail / foreign burst" —
      // print the split so one log answers it
      val gc0 = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.stream()
        .mapToLong(_.getCollectionTime).sum()
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      val gcMs = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.stream()
        .mapToLong(_.getCollectionTime).sum() - gc0
      println(f"$name%-28s $sec%7.1f s   rows=$n   gc_ms=$gcMs")
    }

    time("dedup_exact")(docs.withColumn("h", md5(col("text")))
      .groupBy(col("h")).agg(count(lit(1))).count())
    time("minhash_pairs")(graft.operators.Dedup.minhashPairs(docs).count())
    time("edit_pairs")(graft.operators.Dedup.editPairs(docs).count())
    time("minhash_clusters")(graft.operators.Dedup.minhashClusters(docs).count())
    time("jaccard_prefix_join")(
      graft.operators.Dedup.jaccardPrefixJoin(docs).count())
    time("containment_join")(
      graft.operators.Dedup.containmentPrefixJoin(docs).count())
    time("knn_join_blocked")(
      graft.operators.Similarity.knnJoinBlocked(emb).count())
    time("embedding_pairs_blocked")(
      graft.operators.Dedup.embeddingPairsBlocked(emb).count())

    // ---- graph trio at N× (r7 verdict #6) ---------------------------
    // Offsetting BOTH orderkey and partkey yields N disjoint copies of
    // the co-purchase graph — N× nodes and edges, so a linear plan
    // shows ~N× time and a super-linear one (wedge blowup, hub task)
    // shows immediately. (Offsetting only the orderkey would leave the
    // DISTINCT edge set unchanged — a no-op smoke.)
    import graft.operators.ProductAnalytics
    val li = scaled(t.lineitem.select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey")
    println(s"lineitem rows=${li.count()} (graph copies=$mult)")
    pinned += li
    time("part_triangles") {
      val und = ProductAnalytics.copurchaseEdges(li, ordered = true)
        .select(col("a").as("u"), col("b").as("v"))
      ProductAnalytics.triangleParticipation(und).count()
    }
    time("part_pagerank") {
      val edges = ProductAnalytics.copurchaseEdges(li, ordered = false)
        .select(col("a").as("src"), col("b").as("dst"))
      val nodes = li.select(col("l_partkey").as("part")).distinct()
      ProductAnalytics.pageRankRatios(nodes, edges, rounds = 3,
        prePartitioned = true).count()
    }
    time("pagerank_converged") {
      // the tolerance-terminated variant: N disjoint copies mix
      // exactly like one copy (block-diagonal transition matrix, same
      // per-copy deltas scaled by N), so the round count must stay
      // BOUNDED — print it so the smoke line shows rounds, not just
      // seconds
      val edges = ProductAnalytics.copurchaseEdges(li, ordered = false)
        .select(col("a").as("src"), col("b").as("dst"))
      val nodes = li.select(col("l_partkey").as("part")).distinct()
      val (ranks, k) = ProductAnalytics.pageRankConverged(nodes, edges,
        prePartitioned = true)
      val n = ranks.count()
      println(s"  pagerank_converged rounds=$k (cap=${ProductAnalytics.PageRankMaxRounds})")
      n
    }
    time("part_bfs_hops") {
      val edges = ProductAnalytics.copurchaseEdges(li, ordered = false)
        .select(col("a").as("src"), col("b").as("dst"))
      ProductAnalytics.bfsHopHistogram(edges, maxHops = 3).count()
    }
    // disjoint graph copies ⇒ the pair relation and the top-k windows
    // grow linearly in N; expect ~N× time, never N²
    time("item_similarity")(ProductAnalytics.itemNeighbors(li).count())

    // media decode rows: pure narrow maps (zero exchanges,
    // plan-asserted) — the smoke line documents the expected ~N×
    // linearity of real codec work and catches any future shuffle
    // sneaking into the pipeline as a superlinear bend
    time("media_decode_stats")(
      graft.operators.Multimodal.decodeStats(
        graft.operators.Multimodal.syntheticPngTable(docs)).count())
    time("media_audio_stats")(
      graft.operators.Multimodal.audioStats(
        graft.operators.Multimodal.syntheticWavTable(docs)).count())

    // ---- vocabulary-bounded ops at N× ------------------------------
    // linkage: N× part copies leave the DISTINCT-name relation
    // unchanged (the whole point of the exact-then-near composition)
    // — time should stay FLAT, only the first groupBy grows
    val part = scaled(t.part, "p_partkey")
    println(s"part rows=${part.count()}")
    pinned += part
    time("linkage_name_pairs")(
      graft.operators.RecordLinkage.nameLinks(part).count())
    time("dq_profile")(
      graft.operators.DataQuality.profile(
        scaled(t.orders, "o_orderkey"), "orders").count())
    time("embedding_covariance")(
      graft.operators.Features.covarianceMatrix(emb).count())
    spark.stop()
  }
}
