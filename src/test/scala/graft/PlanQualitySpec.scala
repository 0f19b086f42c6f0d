package graft

/** Physical-plan regression guards: the scale-critical plan
  * properties asserted so a refactor can't silently lose pushdown,
  * broadcast, top-k, or partial-aggregation behavior (PLANS.md holds
  * the round-captured evidence; these keep it true).
  */
class PlanQualitySpec extends SparkSpec {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q6: all range predicates reach the parquet scan; schema pruned") {
    val p = planOf("q6_revenue_forecast")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate lower bound not pushed")
    assert(p.contains("LessThanOrEqual(l_discount,0.07)"), "discount range not pushed")
    // pruned read schema: no l_orderkey/l_partkey in the scan
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q5: dimension joins broadcast, no sort-merge at this SF") {
    val p = planOf("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("top-1 queries plan as TakeOrderedAndProject, not global sort") {
    assert(planOf("top1_customer").contains("TakeOrderedAndProject"))
    assert(planOf("best_performing_product").contains("TakeOrderedAndProject"))
  }

  test("heap top-k aggregates partially before the exchange") {
    val p = planOf("ann_topk_agg")
    assert(p.contains("ObjectHashAggregate"))
    // partial + final: the aggregate appears at least twice
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
  }

  test("q1 aggregates with map-side partial combine") {
    val p = planOf("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final HashAggregate")
  }

  test("minhash-LSH never broadcasts the corpus: band join + verify joins all shuffle") {
    val p = planOf("dedup_minhash_lsh")
    assert(!p.contains("BroadcastExchange"),
      "corpus-sized relation broadcast in the LSH pipeline — driver-collect at scale")
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 3,
      "expected shuffle-hash band self-join plus two verify joins")
  }

  test("simhash pair verification never broadcasts the fingerprint relation") {
    val p = planOf("simhash_pairs")
    assert(!p.contains("BroadcastExchange"),
      "fingerprint relation broadcast — driver-collect at scale")
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 3)
  }

  test("media decode rows shuffle NO payload bytes: zero exchanges in the plan") {
    // the 100 TB media contract: codec work co-located with the scan,
    // only small stats rows leave the partition — any Exchange here
    // means payload bytes crossed the wire
    for (q <- Seq("media_decode_stats", "media_audio_stats")) {
      val p = planOf(q)
      assert(!p.contains("Exchange"),
        s"$q plans an exchange — media payloads must never shuffle")
    }
  }

  test("grouped top-k plans as partial+final heap aggregate, no window sort") {
    val p = planOf("top_customers_per_nation")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "expected map-side partial heap aggregation")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      "grouped top-k fell back to the full-shuffle window formulation")
  }

  test("range join buckets to an equi-join: no nested-loop or cartesian operator") {
    val p = planOf("range_join_shipments")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join fell back to O(n×m) pair generation")
  }

  test("per-row curation ops stay shuffle-free: chunking and redaction are pure maps") {
    val chunks = planOf("doc_chunks")
    assert(!chunks.contains("Exchange"),
      "doc_chunks introduced a shuffle — must stay a scan-transform pass")
    val cdc = planOf("cdc_chunks")
    assert(!cdc.contains("Exchange"),
      "cdc_chunks introduced a shuffle — must stay a scan-transform pass")
    val pii = planOf("pii_redact")
    assert(!pii.contains("Exchange"),
      "pii_redact introduced a shuffle — must stay a scan-transform pass")
  }

  test("pca power projection ships the fit as literals: transform is shuffle-free") {
    // the eigensolve happens at plan-build time on width-bounded
    // moments; the RETURNED plan must be scan → project only — any
    // Exchange or join here means the fit leaked into the transform
    val p = planOf("pca_power_projection")
    assert(!p.contains("Exchange"),
      "pca projection introduced a shuffle — fit must ship as plan literals")
    assert(!p.contains("Join"), "pca projection must not join at transform time")
    // formatted explain lists each scan twice (tree node + detail
    // section) — one physical scan ⇒ exactly 2 mentions
    assert("""Scan parquet""".r.findAllIn(p).length == 2,
      "pca projection should read the corpus exactly once")
  }

  test("containment join: every join shuffles on its key, nothing corpus-sized broadcast") {
    val p = planOf("dedup_containment")
    assert(!p.contains("BroadcastExchange"),
      "corpus-sized relation broadcast in the containment join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "containment join degenerated to pairwise compare")
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 3,
      "expected shuffle-hash probe×index join plus two verify joins")
  }

  test("phrase search prunes the token stream before any shuffle") {
    val p = planOf("phrase_search")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the isin(phrase terms) filter must sit under the aggregate, so
    // only phrase-term postings reach the (doc, start) shuffle
    assert(p.contains("slow") && "HashAggregate".r.findAllIn(p).length >= 2,
      "phrase-term pruning or partial aggregation lost")
  }

  test("pagerank rounds are keyed joins + partial aggregates, corpus never broadcast") {
    val p = planOf("part_pagerank")
    // only the 1-row node-count relation may broadcast; the rank
    // relation shuffles on its key every round while the cached
    // (edges ⋈ outdeg) side keeps its hash(src) partitioning
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 3,
      "expected a keyed rank join per unrolled round")
    assert("HashAggregate".r.findAllIn(p).length >= 6,
      "per-destination mass aggregate lost its partial combine")
    assert(p.contains("InMemoryTableScan"),
      "edge relation lost its persist — basket self-join recomputes per round")
    // outdeg must come from groupBy+join, not count().over(src): a
    // window funnels an extreme hub's edges through one task and
    // AQE's skew split can't touch it
    assert(!p.contains("Window"),
      "outdeg reverted to a window — hub-skew unsplittable")
  }

  test("triangle count intersects adjacency lists over the one cached oriented edge list") {
    val p = planOf("part_triangles")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "adjacency attach must ride keyed equi-joins, not a theta join")
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 3,
      "degree attach or adjacency attach lost its keyed shuffle-hash shape")
    assert(p.contains("InMemoryTableScan"),
      "oriented edge relation lost its persist")
    assert(p.contains("sorted_intersect"),
      "triangles must close by the codegen sorted-merge intersection, not a wedge join")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "per-part triangle count lost its partial combine")
  }

  test("oov_mask broadcasts only the tiny top-K vocabulary, not the token stream") {
    val p = planOf("oov_mask")
    assert(p.contains("BroadcastHashJoin"),
      "vocab join lost its broadcast — token stream would shuffle on the word key")
    // the token relation must never be shuffled onto the word key
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "token stream shuffled for the vocab join")
  }

  test("decontamination probes broadcast benchmark ngrams; train stream never shuffles pre-join") {
    val p = planOf("decontaminate")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // the bounded benchmark ngram set broadcasts; the O(corpus) train
    // ngram stream is probed map-side
    assert(p.contains("BroadcastHashJoin"),
      "benchmark ngram set lost its broadcast — train corpus would shuffle on h")
  }

  test("bloom decontamination gates the train stream map-side and verifies without broadcast") {
    val p = planOf("decontaminate_bloom")
    assert(p.contains("might_contain"),
      "train ngram stream lost its map-side Bloom gate")
    assert(p.contains("ShuffledHashJoin"),
      "exact verify join must be a keyed shuffle-hash join (the whole point: no broadcast of the pair set)")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("kmeans final assignment is a pure map over the cached corpus") {
    val p = planOf("kmeans_clusters")
    assert(p.contains("ivf_cell"),
      "assignment lost the one-pass native cell expression")
    assert(p.contains("InMemoryTableScan"),
      "corpus lost its persist across the Lloyd passes")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "per-vector assignment must not shuffle or join — it is a scan-side map")
  }

  test("prefix-filter similarity join never broadcasts a corpus-sized relation") {
    val p = planOf("jaccard_prefix_join")
    assert(!p.contains("BroadcastExchange"),
      "corpus-sized relation broadcast in the prefix-join pipeline")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dim-driven quarter filter dynamically prunes fact partitions") {
    val p = planOf("dpp_quarter_revenue")
    assert(p.contains("dynamicpruningexpression"),
      "no DPP: the fact scan reads every ship_ym partition")
  }

  test("q19: per-side conjuncts of the OR brackets push below the join") {
    val p = planOf("q19_bracket_revenue")
    // the disjunction of brands (common p-side conjunct) must reach
    // the part scan as a pushed filter, and quantity bounds the
    // lineitem scan
    assert(p.contains("PushedFilters"))
    assert(p.contains("EqualTo(p_brand,Brand#11)"),
      "brand disjunction not pushed to the part scan")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)") ||
           p.contains("LessThanOrEqual(l_quantity,30.0)"),
      "derived quantity envelope not pushed to the lineitem scan")
  }

  test("multi-probe LSH fans out on the query side only: probes broadcast") {
    val p = planOf("ann_lsh_multiprobe")
    assert(p.contains("BroadcastHashJoin"),
      "probe relation lost its broadcast — corpus would shuffle on bucket")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus shuffled for the probe join")
  }

  test("q22: anti join stays a join (no per-row subquery), scalar is broadcast") {
    val p = planOf("q22_idle_customers")
    assert(p.contains("LeftAnti"), "NOT EXISTS did not plan as an anti join")
    assert(!p.contains("CartesianProduct"),
      "scalar threshold planned as a cartesian product")
  }

  test("dup_ngram_spans joins gram counts by key — no corpus broadcast, no doc x doc") {
    val p = planOf("dup_ngram_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "gram-duplication metric degenerated to pairwise compare")
  }

  test("per_group_sample goes through the heap aggregate, never a window sort") {
    val p = planOf("per_group_sample")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final heap aggregation")
    assert(!p.contains("Window"),
      "sampling fell back to a full window pass over the corpus")
  }

  test("equi_depth_buckets assigns buckets by a broadcast boundary array, no global sort") {
    val p = planOf("equi_depth_buckets")
    assert(!p.contains("Window"),
      "bucketing fell back to a global-ORDER ntile window (single-task funnel)")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row boundary relation lost its broadcast")
  }

  test("salted agg plans as two aggregate levels with map-side combine") {
    val p = planOf("skew_salted_agg")
    // (key, salt) partial+final, then key partial+final = 4 HashAggregates
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      "salted two-phase aggregation collapsed")
    assert(!p.contains("Window"))
  }

  test("q16: NOT IN exclusion plans as a broadcast anti join; LIKE-free dim filter pushed") {
    val p = planOf("q16_supplier_count")
    assert(p.contains("LeftAnti"), "NOT IN subquery lost its anti-join plan")
    assert(p.contains("BroadcastHashJoin"),
      "part/exclusion dims should broadcast, not shuffle the fact")
  }

  test("q21: correlated EXISTS/NOT EXISTS plan as semi + anti joins, no re-scan loops") {
    val p = planOf("q21_waiting_suppliers")
    assert(p.contains("LeftSemi"), "EXISTS lost its semi-join plan")
    assert(p.contains("LeftAnti"), "NOT EXISTS lost its anti-join plan")
  }

  test("runtime bloom filter prunes the fact scan of a selective non-broadcast join") {
    // At 100 TB the selective-dim ⋈ fact join is too big to
    // broadcast; Spark's InjectRuntimeFilter can still push a bloom
    // filter of the dim keys into the fact scan so most fact rows die
    // before the shuffle. The thresholds are sized for real tables —
    // relax them here to prove the rule fires on this plan shape.
    import org.apache.spark.sql.functions.{col, to_date, lit}
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "100MB")
      spark.conf.set(keys(3), "-1") // force a shuffle join: broadcast wouldn't need the filter
      val t = graft.catalog.Tables(spark, sf)
      val sel = t.orders.filter(col("o_orderpriority") === "1-URGENT" &&
        to_date(col("o_orderdate")) < lit("1995-01-01"))
      val p = t.lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(p.toLowerCase.contains("bloom"), p.take(3000))
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("q11: global-scalar threshold broadcasts; per-supplier agg has partial combine") {
    val p = planOf("q11_supplier_share")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row threshold relation lost its broadcast")
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("ivfpq: native encode projection, heap partial-agg, no corpus shuffle joins") {
    val p = planOf("ann_ivfpq_topk")
    assert(p.contains("pq_encode"),
      "PQ encoding lost the native single-pass expression")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "candidate pool selection lost its map-side partial heap aggregation")
    // the only joins are the broadcast pool/query re-rank joins — the
    // corpus must never shuffle onto a join key
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus shuffled for the re-rank join (pool side must broadcast)")
  }

  test("substring rewrite: keyed dataflow only — no pairwise compare, dup starts joined by gram") {
    val p = planOf("dedup_substring_rewrite")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span removal degenerated to pairwise document compare")
    assert(p.contains("ShuffledHashJoin"),
      "dup-gram filter lost its keyed shuffle join")
  }

  test("heavy hitters aggregate partially before the exchange") {
    val p = planOf("sketch_heavy_hitters")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "MG summary lost map-side partial aggregation — full token stream would shuffle")
  }

  test("weighted sample prunes the text column and heap-aggregates partially") {
    val p = planOf("weighted_sample")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("text"),
      s"A-ES sampling needs only (doc_id, source, n_chars); scan reads: $readSchema")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "per-source reservoir lost map-side partial heap aggregation")
  }

  test("DSIR weights: token-keyed shuffle join, bounded top-k, LM never broadcast") {
    val p = planOf("dsir_weights")
    assert(p.contains("ShuffledHashJoin"),
      "token↔LM join must shuffle on the token key (the LM is vocab-sized)")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 select degenerated to a global sort")
  }

  test("PMI: unigram joins shuffle on token keys, top-20 bounded") {
    val p = planOf("pmi_collocations")
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 2,
      "both unigram-role joins must shuffle (unigram table is vocab-sized)")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("edit pairs: candidate + text-attach joins all shuffle, corpus never broadcast") {
    val p = planOf("dedup_edit_pairs")
    assert(!p.contains("BroadcastExchange"),
      "corpus-sized relation broadcast in the edit-pair pipeline — driver-collect at scale")
    assert("ShuffledHashJoin".r.findAllIn(p).length >= 3,
      "expected shuffle-hash band self-join plus two text-attach joins")
  }

  test("BPE encode: word-keyed shuffle join to the symbol table, partial aggregation") {
    val p = SparkEntry.queries("bpe_encode_counts")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      "doc-words ↔ symbol-table join must shuffle on the word key " +
        "(the vocab is corpus-scale at 100 TB; broadcasting it is a driver collect)")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "per-doc count lost map-side partial aggregation")
  }

  test("linkage: codegen jaro_winkler scores inside the blocked shuffle join") {
    val p = planOf("linkage_name_pairs")
    assert(p.contains("jaro_winkler"),
      "native scorer missing — a UDF here would leave whole-stage codegen")
    assert(p.contains("ShuffledHashJoin"),
      "blocked name self-join must shuffle on the block key")
    assert(!p.contains("CartesianProduct"),
      "blocking degenerated to an all-pairs cross")
  }

  test("dq_profile: one aggregation pass per table, no per-column scans") {
    val p = planOf("dq_profile")
    // two profiled tables → exactly two parquet scans; per-column
    // metrics must NOT each rescan their table (the formatted output
    // names each node twice — tree line + "(n) Scan" detail header —
    // so count the numbered detail headers)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 2,
      "profile re-scans a table per metric instead of one agg pass")
    assert(p.contains("Expand"),
      "exact multi-column count(DISTINCT) should plan as one Expand")
  }

  test("bfs: frontier joins shuffle-hash against the cached edge list") {
    // bfsHopHistogram materializes its bounded histogram and releases
    // every cache before returning (so the RETURNED plan is a local
    // relation) — the ring-join property lives in the loop's executed
    // plans, captured here via a listener on the per-round count
    // actions that run while the query function builds
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      SparkEntry.queries("part_bfs_hops")(spark, sf)
      // the listener fires asynchronously; drain the bus
      // deterministically instead of sleeping (race-prone under load)
      org.apache.spark.graftshim.ListenerBusSync.waitUntilEmpty(
        spark.sparkContext)
      val ringJoins = plans.toArray(Array.empty[String])
        .filter(p => p.contains("ShuffledHashJoin"))
      assert(ringJoins.nonEmpty,
        "ring ⋈ edges must be a shuffle-hash equi-join")
      assert(ringJoins.exists(_.contains("InMemoryTableScan")),
        "edge list should come from the persisted cache, not a rebuild")
    } finally spark.listenerManager.unregister(l)
  }

  test("cluster-family rows consume the derived layout, never re-cluster") {
    // the four rows share one materialized (doc_id, cluster_id)
    // assignment; a regression to inline clustering would put the
    // minhash/LSH machinery back into each plan (at 100 TB: four
    // multi-hour jobs instead of one job + three cheap consumers)
    for (q <- Seq("dedup_clusters", "dedup_cluster_canonical",
        "dedup_cluster_sizes", "cluster_safe_split")) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("cluster_assignment"),
        s"$q does not scan the derived cluster_assignment layout")
      assert(!p.contains("minhash60"),
        s"$q recomputes the minhash pipeline inline")
    }
  }
}
