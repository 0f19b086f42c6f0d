package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables
import graft.functions.Md5Hash60

/** Corpus-curation filters a large-scale training-data pipeline runs
  * between raw ingest and tokenization: repetition-based quality
  * gating, train/benchmark decontamination, sliding-window chunking,
  * PII redaction, and OOV masking.
  *
  * Scale notes (100 TB): every operator here is either a pure per-row
  * map (`pii_redact`, chunk emission) or a doc_id/term-keyed
  * aggregation with map-side combine. The decontamination join is
  * keyed on a 60-bit n-gram hash — 8 bytes carried per n-gram
  * instead of the n-gram string — probing a BROADCAST benchmark set
  * so the train corpus never shuffles; the benchmark side drops
  * super-common n-grams (present in >10 benchmark docs) BEFORE the
  * join, which is what prevents a boilerplate n-gram ("all rights
  * reserved …") from blowing up the probe's match fan-out.
  * The OOV vocabulary is a top-K aggregate (tiny by construction) and
  * is broadcast to the token join.
  */
object CurationFilters {

  /** Whitespace tokens of non-blank docs, exploded WITH position
    * (1-based), plus the in-doc bigram at each position (null at the
    * last token). Positions come from `explode(sequence(...))` +
    * `element_at` so the DuckDB oracle (`ws[i]`) is a literal mirror.
    */
  private def tokens(docs: DataFrame): DataFrame =
    docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(1), size(col("ws")))).as("i"))
      .select(col("doc_id"), col("i"),
        element_at(col("ws"), col("i")).as("w"),
        when(col("i") < size(col("ws")),
          concat(element_at(col("ws"), col("i")), lit(" "),
            element_at(col("ws"), col("i") + lit(1)))).as("bg"))

  /** Shared derivation for the two decontamination variants: the
    * train-split n-gram stream `(doc_id, h)` (NOT distinct — repeats
    * collapse after the match, see the `decontaminate` entry) and the
    * hot-key-capped benchmark n-gram set `(bench_doc, h)` (distinct;
    * n-grams in >10 benchmark docs dropped — the boilerplate guard).
    * Split is the same md5 bucket split as `dataset_split`: buckets
    * 0–79 train, 90–99 held-out benchmark.
    */
  private def decontamSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    Md5Hash60.register(s)
    val bucket = pmod(
      Md5Hash60.md5_hash60(col("doc_id").cast("string")), lit(100L))
    // spread with an EXPLICIT partition count before the n-gram
    // explode: the md5 per 8-gram is the CPU of this operator, and a
    // single-file corpus scans as ONE split — without the pinned
    // shuffle the whole hash stream computes single-task (and, on the
    // broadcast-probe variant, stays single-task end to end because
    // nothing downstream exchanges either)
    val base = Dedup.spread(
      Tables(s, dir).documents
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"),
          bucket.as("bucket"))
        .filter(size(col("ws")) >= 8 && (col("bucket") < 80 || col("bucket") >= 90)),
      col("doc_id"))
    val ng = base
      .select(col("doc_id"), col("bucket"), col("ws"),
        explode(sequence(lit(1), size(col("ws")) - lit(7))).as("i"))
      .select(col("doc_id"), col("bucket"),
        Md5Hash60.md5_hash60(
          array_join(slice(col("ws"), col("i"), lit(8)), " ")).as("h"))
    val trainNg = ng.filter(col("bucket") < 80).select(col("doc_id"), col("h"))
    val benchNg = ng.filter(col("bucket") >= 90)
      .select(col("doc_id").as("bench_doc"), col("h")).distinct()
    val keep = benchNg.groupBy(col("h"))
      .agg(count(lit(1)).as("nb")).filter(col("nb") <= 10).select(col("h"))
    (trainNg, benchNg.join(keep, Seq("h")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Filter-threshold tradeoff curve: before committing a quality
    // cutoff, a curation pipeline wants the whole survival curve —
    // docs and tokens retained at EVERY candidate threshold — from
    // one pass, not one job per threshold. The hashing-trick linear
    // score is a rational sw/(n·1000), so "score > t" rewrites to
    // the DIVISION-FREE integer test sw > t_e3·n (exact for
    // negative thresholds too — no truncation ever happens); the
    // per-doc (sw, n) aggregate fans out ×21 across the threshold
    // grid (a bounded multiplier on the ALREADY-AGGREGATED doc
    // relation, one row per doc — not on the token stream) and one
    // more aggregate folds the curve. Output is 21 rows whatever the
    // corpus size.
    "filter_tradeoff_curve" -> ((s, dir) => {
      Md5Hash60.register(s)
      val w = pmod(Md5Hash60.md5_hash60(col("tok")), lit(2001L)) - lit(1000L)
      val perDoc = Tables(s, dir).documents
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .select(col("doc_id"), w.as("wi"))
        .groupBy(col("doc_id"))
        .agg(sum(col("wi")).as("sw"), count(lit(1)).as("n"))
      val grid = (-50L to 50L by 5).map(lit(_))
      perDoc.select(col("sw"), col("n"),
          explode(array(grid: _*)).as("t_e3"))
        .groupBy(col("t_e3"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("n_tokens"),
          sum(when(col("sw") > col("t_e3") * col("n"), 1L).otherwise(0L))
            .as("n_docs_kept"),
          sum(when(col("sw") > col("t_e3") * col("n"), col("n"))
            .otherwise(0L)).as("n_tokens_kept"))
        .select(col("t_e3"), col("n_docs_kept"), col("n_tokens_kept"),
          expr("(n_docs_kept * 1000000) DIV n_docs").as("pct_docs_e6"),
          expr("(n_tokens_kept * 1000000) DIV n_tokens").as("pct_tokens_e6"))
    }),

    // Split-leakage audit: distinct 8-grams shared across split
    // boundaries under the NAIVE doc-hash split vs the CLUSTER-SAFE
    // split — the report that justifies cluster-keyed splitting (a
    // near-duplicate pair straddling train/test leaks every shared
    // n-gram into eval). One gram-keyed aggregation folds each
    // gram's split memberships into three flags (map-side combined;
    // no gram self-join), then a 2-row rollup per method. The gram
    // relation carries 8-byte hashes, never gram strings, and the
    // explode runs behind the pinned spread like decontaminate's.
    "split_leakage_report" -> ((s, dir) => {
      Md5Hash60.register(s)
      def splitOf(key: org.apache.spark.sql.Column) = {
        val b = pmod(Md5Hash60.md5_hash60(key.cast("string")), lit(100L))
        when(b < 80, "train").when(b < 90, "val").otherwise("test")
      }
      val base = Dedup.spread(
        Tables(s, dir).documents
          .join(Dedup.materializedClusters(s, dir), Seq("doc_id"))
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"),
            splitOf(col("doc_id")).as("split_doc"),
            splitOf(col("cluster_id")).as("split_cluster"))
          .filter(size(col("ws")) >= 8),
        col("doc_id"))
      val grams = base
        .select(col("split_doc"), col("split_cluster"), col("ws"),
          explode(sequence(lit(1), size(col("ws")) - lit(7))).as("i"))
        .select(col("split_doc"), col("split_cluster"),
          Md5Hash60.md5_hash60(
            array_join(slice(col("ws"), col("i"), lit(8)), " ")).as("h"))
      // ONE gram-keyed pass carrying six membership flags (3 splits ×
      // 2 methods) — a per-method unionAll would re-run the whole
      // shingle/md5 stream per branch. The global rollup is a single
      // row; stack() unpivots it into the per-method report.
      def flag(c: String, v: String) =
        max(when(col(c) === v, 1).otherwise(0))
      grams
        .groupBy(col("h"))
        .agg(flag("split_doc", "train").as("d_tr"),
          flag("split_doc", "val").as("d_va"),
          flag("split_doc", "test").as("d_te"),
          flag("split_cluster", "train").as("c_tr"),
          flag("split_cluster", "val").as("c_va"),
          flag("split_cluster", "test").as("c_te"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("d_tr") === 1 && col("d_va") === 1, 1L).otherwise(0L)).as("d_tv"),
          sum(when(col("d_tr") === 1 && col("d_te") === 1, 1L).otherwise(0L)).as("d_tt"),
          sum(when(col("d_va") === 1 && col("d_te") === 1, 1L).otherwise(0L)).as("d_vt"),
          sum(when(col("c_tr") === 1 && col("c_va") === 1, 1L).otherwise(0L)).as("c_tv"),
          sum(when(col("c_tr") === 1 && col("c_te") === 1, 1L).otherwise(0L)).as("c_tt"),
          sum(when(col("c_va") === 1 && col("c_te") === 1, 1L).otherwise(0L)).as("c_vt"))
        .selectExpr(
          """stack(2,
            |  'doc_hash', n, d_tv, d_tt, d_vt,
            |  'cluster_hash', n, c_tv, c_tt, c_vt)
            |AS (method, n_distinct_ngrams,
            |    train_val_shared, train_test_shared, val_test_shared)"""
            .stripMargin)
    }),

    // Temporal split report: train on the past, evaluate on the
    // future (the split that matters for time-series / behavioral
    // models, where hash splits leak the future into training), plus
    // the USER-overlap count — users active on both sides of the
    // cutoff are the entity-level leakage a strict temporal split
    // still carries (their habits are partially memorized). Two
    // map-side-combined aggregates; the overlap folds per-user
    // side-flags exactly like the n-gram split-leakage audit.
    "temporal_split_report" -> ((s, dir) => {
      val cutoff = lit("2024-01-22 00:00:00").cast("timestamp")
      val tagged = Tables(s, dir).events
        .withColumn("split", when(col("ts") < cutoff, "train").otherwise("test"))
      val sides = tagged.groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"))
      val overlap = tagged
        .groupBy(col("user_id"))
        .agg(max(when(col("split") === "train", 1).otherwise(0)).as("tr"),
          max(when(col("split") === "test", 1).otherwise(0)).as("te"))
        .agg(sum(when(col("tr") === 1 && col("te") === 1, 1L).otherwise(0L))
          .as("n_users_both"))
      sides.crossJoin(broadcast(overlap))
        .select(col("split"), col("n_events"), col("n_users"),
          col("n_users_both"))
    }),

    // Gopher-style repetition quality gate: fraction of duplicated
    // words + share of the most frequent bigram. Two doc_id-keyed
    // aggregations (map-side combined) + one doc_id join; thresholds
    // compare the ROUNDED fractions so an ulp difference between
    // engines can never flip the flag.
    "quality_repetition" -> ((s, dir) => {
      val tok = tokens(Tables(s, dir).documents)
      val wstats = tok.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          countDistinct(col("w")).as("n_distinct"))
      val bstats = tok.filter(col("bg").isNotNull)
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_bigram_cnt"), sum(col("c")).as("n_bigrams"))
      val dupFrac = round(lit(1.0) -
        col("n_distinct").cast("double") / col("n_words"), 4)
      val bgFrac = round(coalesce(
        col("top_bigram_cnt").cast("double") / col("n_bigrams"), lit(0.0)), 4)
      wstats.join(bstats, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          dupFrac.as("dup_word_frac"), bgFrac.as("top_bigram_frac"),
          when(dupFrac > 0.6 || bgFrac > 0.1, "repetitive").otherwise("ok")
            .as("repetition_flag"))
    }),

    // Train/benchmark decontamination: flag train-split docs sharing
    // any 8-word n-gram with the held-out test split (same md5 bucket
    // split as dataset_split). Join key is the 60-bit n-gram hash;
    // benchmark n-grams in >10 benchmark docs are dropped first (see
    // object Scaladoc — hot-key guard).
    "decontaminate" -> ((s, dir) => {
      // The benchmark side is BOUNDED (eval suites are MBs against a
      // 100 TB train corpus) — broadcast it so the train n-gram
      // stream is probed map-side and never shuffles; only matching
      // (contaminated) rows reach the per-doc aggregate. No distinct
      // on the train side: countDistinct collapses repeats after the
      // join, when the stream is already tiny.
      val (trainNg, benchKept) = decontamSides(s, dir)
      trainNg.join(broadcast(benchKept), Seq("h"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("h")).as("n_shared_ngrams"),
          countDistinct(col("bench_doc")).as("n_bench_docs"))
    }),

    // Decontamination for the regime where the benchmark n-gram SET
    // is too big to broadcast exactly (say a thousand eval suites):
    // collapse it to a FIXED-SIZE Bloom bitmap (2^23 bits = 1 MB
    // regardless of set size), gate the train n-gram stream map-side
    // with might_contain, and exact-verify only the hits with a
    // shuffle-hash join — no broadcast of the pair set anywhere.
    // False positives just add a few rows to the verify join, so the
    // output is identical to `decontaminate` (same oracle). The one
    // driver-side value is the serialized bitmap — the same bounded-
    // model-ship shape as the ANN quantizers.
    "decontaminate_bloom" -> ((s, dir) => {
      val (trainNg, benchKept) = decontamSides(s, dir)
      graft.functions.BloomGate.register(s)
      val bloomBytes = benchKept
        .agg(graft.functions.BloomGate.bloom_agg(
          col("h"), lit(1L << 20), lit(1L << 23)))
        .head.getAs[Array[Byte]](0)
      trainNg
        .filter(graft.functions.BloomGate.bloom_might_contain(
          lit(bloomBytes), col("h")))
        .join(benchKept.hint("shuffle_hash"), Seq("h"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("h")).as("n_shared_ngrams"),
          countDistinct(col("bench_doc")).as("n_bench_docs"))
    }),

    // Sliding-window chunking for a context-bounded tokenizer: 64
    // tokens per chunk, stride 48 (16-token overlap). Pure per-row
    // explode — no shuffle at all; at 100 TB this is a single
    // scan-transform-write pass.
    "doc_chunks" -> ((s, dir) => {
      Tables(s, dir).documents
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
        .select(col("doc_id"), col("ws"),
          explode(sequence(lit(1), size(col("ws")), lit(48))).as("s"))
        .select(col("doc_id"),
          expr("CAST((s - 1) DIV 48 AS BIGINT)").as("chunk_id"),
          least(lit(64), size(col("ws")) - col("s") + lit(1)).cast("long")
            .as("n_tokens"),
          array_join(slice(col("ws"), col("s"), lit(64)), " ").as("chunk_text"))
    }),

    // Content-defined chunking: a boundary falls after token i
    // wherever the rolling 4-token window's md5-derived hash ≡ 0
    // (mod 8) — expected chunk ≈ 8 tokens, but the BOUNDARIES are a
    // function of content, not offsets. That is the property fixed-
    // stride chunking (doc_chunks) lacks: insert one word near the
    // start of a document and every fixed-stride chunk after it
    // changes, while CDC re-chunks only up to the next hash boundary
    // — so chunk-level dedup/caching keeps matching everything
    // downstream (the rolling-hash trick storage dedup is built on).
    // Pure per-row array HOFs: no shuffle, no window; at 100 TB this
    // is one scan-transform-write pass.
    "cdc_chunks" -> ((s, dir) => cdcChunks(Tables(s, dir).documents)),

    // PII redaction over the events payload: mask email-shaped spans
    // then digit runs. Counts are taken on the ORIGINAL payload (an
    // email's digits count once as an email). Per-row map, no shuffle.
    "pii_redact" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      Tables(s, dir).events.select(
        col("event_id"),
        regexp_replace(regexp_replace(col("props"), email, "<EMAIL>"),
          "[0-9]+", "<NUM>").as("props_redacted"),
        size(regexp_extract_all(col("props"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
          .cast("long").as("n_nums"))
    }),

    // Greedy sequence packing: per-source shards, docs in a
    // deterministic hash-shuffled order, each assigned the 512-token
    // bin its cumulative offset starts in (concat-and-split packing).
    // One window pass per source partition — sources pack in
    // parallel, the cumsum is exact integer math, and the md5 order
    // makes the "shuffle" reproducible across runs and partitionings
    // (RNG-free, like stratified_sample).
    "sequence_packing" -> ((s, dir) => {
      Md5Hash60.register(s)
      val w = Window.partitionBy(col("source"))
        .orderBy(col("hkey"), col("doc_id"))
      Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          TextAnalysis.nWords.as("n_tokens"),
          Md5Hash60.md5_hash60(
            concat(lit("pack:"), col("doc_id").cast("string"))).as("hkey"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          row_number().over(w).cast("long").as("pack_order"),
          (sum(col("n_tokens"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)) -
            col("n_tokens")).as("start_tok"))
        .withColumn("bin", expr("start_tok DIV 512"))
        .drop("start_tok")
    }),

    // The materialization step sequence_packing assigns: each
    // (source, bin) becomes ONE training sequence — member texts
    // concatenated in pack order with an <eod> separator (the
    // concat-then-split convention). Reassembly sorts (pack_order,
    // text) inside a bin-keyed aggregate, so after the packing
    // window there is exactly one more shuffle (on the bin key) and
    // no global sort; bins are ≤ 512 + max-doc tokens by
    // construction, so no aggregate row can blow up.
    "packed_sequences" -> ((s, dir) => {
      Md5Hash60.register(s)
      val w = Window.partitionBy(col("source"))
        .orderBy(col("hkey"), col("doc_id"))
      val packed = Tables(s, dir).documents
        .select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.nWords.as("n_tokens"),
          Md5Hash60.md5_hash60(
            concat(lit("pack:"), col("doc_id").cast("string"))).as("hkey"))
        .select(col("doc_id"), col("source"), col("text"), col("n_tokens"),
          row_number().over(w).cast("long").as("pack_order"),
          (sum(col("n_tokens"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)) -
            col("n_tokens")).as("start_tok"))
        .withColumn("bin", expr("start_tok DIV 512"))
      packed.groupBy(col("source"), col("bin"))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("pack_order"), col("text")))),
            x => x.getField("text")), " <eod> ").as("sequence"),
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))
    }),

    // Multilingual temperature sampling (T=0.7): per-language keep
    // weights w_l ∝ (n_l/N)^0.7, the standard rebalancing that
    // upsamples tail languages. The per-language relation after the
    // aggregate is tiny, so the global normalization window is free;
    // pow() is bit-identical across engines (both delegate to the
    // platform libm) and the normalizer accumulates in decimal.
    "lang_temperature_weights" -> ((s, dir) => {
      val counts = Tables(s, dir).documents
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val total = Window.partitionBy()
      val withP = counts
        .withColumn("p", col("n_docs").cast("double") /
          sum(col("n_docs")).over(total))
        .withColumn("pw", pow(col("p"), lit(0.7)))
      withP
        .withColumn("z",
          sum(col("pw").cast(org.apache.spark.sql.types.DecimalType(18, 9)))
            .over(total).cast("double"))
        .select(col("lang"), col("n_docs"),
          round(col("p"), 4).as("p_raw"),
          round(col("pw") / col("z"), 4).as("p_temp"),
          round(col("pw") / col("z") / col("p"), 4).as("boost"))
    }),

    // OOV masking for tokenizer prep: tokens outside the top-25
    // corpus vocabulary become <unk>; text is reassembled in token
    // order. The vocabulary is tiny by construction (top-K of a
    // corpus-wide count) — broadcast to the token join; reassembly is
    // one doc_id-keyed aggregation sorting each doc's (pos, token)
    // pairs inside the aggregate, not a global sort.
    "oov_mask" -> ((s, dir) => {
      val tok = tokens(Tables(s, dir).documents).select(
        col("doc_id"), col("i"), col("w"))
      val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("tf"))
        .orderBy(desc("tf"), asc("w")).limit(25)
        .select(col("w"), lit(1).as("in_vocab"))
      val masked = tok.join(broadcast(vocab), Seq("w"), "left")
        .select(col("doc_id"), col("i"),
          when(col("in_vocab").isNotNull, col("w")).otherwise(lit("<unk>"))
            .as("w2"))
      masked.groupBy(col("doc_id")).agg(
        array_join(transform(
          array_sort(collect_list(struct(col("i"), col("w2")))),
          x => x.getField("w2")), " ").as("masked_text"),
        sum(when(col("w2") === "<unk>", 1L).otherwise(0L)).as("n_unk"),
        count(lit(1)).as("n_tokens"))
    })
  )

  /** Content-defined chunking: a boundary falls after token i
    * wherever the rolling `w`-token window's md5-derived hash ≡ 0
    * (mod `d`) — expected chunk ≈ d tokens, but the BOUNDARIES are a
    * function of content, not offsets. That is the property fixed-
    * stride chunking (doc_chunks) lacks: insert one word near the
    * start of a document and every fixed-stride chunk after it
    * changes, while CDC re-chunks only up to the next hash boundary
    * (pinned by `CdcChunksSpec`) — so chunk-level dedup/caching keeps
    * matching everything downstream, the rolling-hash trick storage
    * dedup is built on. Pure per-row array HOFs: no shuffle, no
    * window; at 100 TB this is one scan-transform-write pass.
    */
  def cdcChunks(docs: DataFrame, w: Int = 4, d: Int = 8): DataFrame = {
    graft.functions.Md5Hash60.register(docs.sparkSession)
    val ws = split(trim(col("text")), "\\s+")
    val base = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), ws.as("ws"), size(ws).as("m"))
    // candidate boundary positions i ∈ [w, m−1]: window full, last
    // chunk non-empty. (sequence() descends when stop < start, so
    // short docs guard to the empty array.)
    val bnd = when(col("m") - 1 >= w,
      filter(sequence(lit(w), col("m") - 1), i =>
        pmod(graft.functions.Md5Hash60.md5_hash60(
          concat_ws(" ", slice(col("ws"), i - w + 1, lit(w)))), lit(d)) === 0))
      .otherwise(array().cast("array<int>"))
    val withB = base.select(col("doc_id"), col("ws"), bnd.as("bnd"))
    val starts = concat(array(lit(1)), transform(col("bnd"), b => b + 1))
    val ends = concat(col("bnd"), array(size(col("ws"))))
    withB
      .select(col("doc_id"), col("ws"),
        posexplode(zip_with(starts, ends,
          (a, b) => struct(a.as("st"), b.as("en")))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        (col("col.en") - col("col.st") + 1).cast("long").as("n_tokens"),
        array_join(slice(col("ws"), col("col.st"),
          col("col.en") - col("col.st") + 1), " ").as("chunk_text"))
  }

  private val decontamOracle: String =
    """WITH base AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
      |    ('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint % 100 AS bucket
      |  FROM documents WHERE length(trim(text)) > 0),
      |ng AS (
      |  SELECT doc_id, bucket,
      |    ('0x' || substr(md5(array_to_string(list_slice(ws, i, i + 7), ' ')), 1, 15))::bigint AS h
      |  FROM (SELECT doc_id, bucket, ws, unnest(range(1, len(ws) - 7 + 1)) AS i
      |        FROM base
      |        WHERE len(ws) >= 8 AND (bucket < 80 OR bucket >= 90))),
      |train_ng AS (SELECT DISTINCT doc_id, h FROM ng WHERE bucket < 80),
      |bench_ng AS (SELECT DISTINCT doc_id AS bench_doc, h FROM ng WHERE bucket >= 90),
      |keep AS (SELECT h FROM bench_ng GROUP BY h HAVING count(*) <= 10)
      |SELECT t.doc_id, cast(count(DISTINCT t.h) AS bigint) AS n_shared_ngrams,
      |  cast(count(DISTINCT b.bench_doc) AS bigint) AS n_bench_docs
      |FROM train_ng t JOIN bench_ng b USING (h) JOIN keep USING (h)
      |GROUP BY t.doc_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "filter_tradeoff_curve" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |perdoc AS (
        |  SELECT doc_id,
        |    cast(sum(('0x' || substr(md5(tok), 1, 15))::bigint % 2001 - 1000)
        |      AS bigint) AS sw,
        |    cast(count(*) AS bigint) AS n
        |  FROM toks GROUP BY doc_id),
        |grid AS (SELECT unnest(generate_series(-50, 50, 5)) AS t_e3)
        |SELECT cast(t_e3 AS bigint) AS t_e3,
        |  cast(sum(CASE WHEN sw > t_e3 * n THEN 1 ELSE 0 END) AS bigint)
        |    AS n_docs_kept,
        |  cast(sum(CASE WHEN sw > t_e3 * n THEN n ELSE 0 END) AS bigint)
        |    AS n_tokens_kept,
        |  cast((sum(CASE WHEN sw > t_e3 * n THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS bigint) AS pct_docs_e6,
        |  cast((sum(CASE WHEN sw > t_e3 * n THEN n ELSE 0 END) * 1000000)
        |    // sum(n) AS bigint) AS pct_tokens_e6
        |FROM perdoc, grid GROUP BY t_e3""".stripMargin,
    "temporal_split_report" ->
      """WITH tagged AS (
        |  SELECT user_id,
        |    CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00'
        |         THEN 'train' ELSE 'test' END AS split
        |  FROM events),
        |sides AS (
        |  SELECT split, cast(count(*) AS bigint) AS n_events,
        |    cast(count(DISTINCT user_id) AS bigint) AS n_users
        |  FROM tagged GROUP BY 1),
        |flags AS (
        |  SELECT user_id,
        |    max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
        |    max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
        |  FROM tagged GROUP BY 1),
        |overlap AS (
        |  SELECT cast(sum(CASE WHEN tr = 1 AND te = 1 THEN 1 ELSE 0 END)
        |    AS bigint) AS n_users_both FROM flags)
        |SELECT s.split, s.n_events, s.n_users, o.n_users_both
        |FROM sides s, overlap o""".stripMargin,
    "split_leakage_report" ->
      s"""WITH RECURSIVE ${graft.operators.Dedup.minhashOracleCtes("documents")},
         |undirected AS (
         |  SELECT doc_a AS a, doc_b AS b FROM mh_pairs
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM mh_pairs),
         |reach(doc, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT u.b, r.lbl FROM undirected u JOIN reach r ON r.doc = u.a),
         |clusters AS (
         |  SELECT doc AS doc_id, min(lbl) AS cluster_id
         |  FROM reach GROUP BY doc),
         |labeled AS (
         |  SELECT d.doc_id, regexp_split_to_array(trim(d.text), '\\s+') AS ws,
         |    CASE WHEN ('0x' || substr(md5(d.doc_id::varchar), 1, 15))::bigint % 100 < 80 THEN 'train'
         |         WHEN ('0x' || substr(md5(d.doc_id::varchar), 1, 15))::bigint % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split_doc,
         |    CASE WHEN ('0x' || substr(md5(c.cluster_id::varchar), 1, 15))::bigint % 100 < 80 THEN 'train'
         |         WHEN ('0x' || substr(md5(c.cluster_id::varchar), 1, 15))::bigint % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split_cluster
         |  FROM documents d JOIN clusters c USING (doc_id)
         |  WHERE length(trim(d.text)) > 0),
         |grams AS (
         |  SELECT split_doc, split_cluster,
         |    ('0x' || substr(md5(array_to_string(list_slice(ws, i, i + 7), ' ')), 1, 15))::bigint AS h
         |  FROM (SELECT split_doc, split_cluster, ws,
         |          unnest(range(1, len(ws) - 7 + 1)) AS i
         |        FROM labeled WHERE len(ws) >= 8)),
         |by_method AS (
         |  SELECT 'doc_hash' AS method, split_doc AS split, h FROM grams
         |  UNION ALL
         |  SELECT 'cluster_hash' AS method, split_cluster AS split, h FROM grams),
         |flags AS (
         |  SELECT method, h,
         |    max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
         |    max(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS va,
         |    max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
         |  FROM by_method GROUP BY 1, 2)
         |SELECT method, cast(count(*) AS bigint) AS n_distinct_ngrams,
         |  cast(sum(CASE WHEN tr = 1 AND va = 1 THEN 1 ELSE 0 END) AS bigint) AS train_val_shared,
         |  cast(sum(CASE WHEN tr = 1 AND te = 1 THEN 1 ELSE 0 END) AS bigint) AS train_test_shared,
         |  cast(sum(CASE WHEN va = 1 AND te = 1 THEN 1 ELSE 0 END) AS bigint) AS val_test_shared
         |FROM flags GROUP BY method""".stripMargin,
    "sequence_packing" ->
      s"""WITH base AS (
         |  SELECT doc_id, source,
         |    cast(${TextAnalysis.sqlNWords} AS bigint) AS n_tokens,
         |    ('0x' || substr(md5('pack:' || doc_id::varchar), 1, 15))::bigint AS hkey
         |  FROM documents)
         |SELECT doc_id, source, n_tokens,
         |  cast(row_number() OVER w AS bigint) AS pack_order,
         |  cast((sum(n_tokens) OVER w - n_tokens) // 512 AS bigint) AS bin
         |FROM base
         |WINDOW w AS (PARTITION BY source ORDER BY hkey, doc_id
         |             ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "packed_sequences" ->
      s"""WITH base AS (
         |  SELECT doc_id, source, text,
         |    cast(${TextAnalysis.sqlNWords} AS bigint) AS n_tokens,
         |    ('0x' || substr(md5('pack:' || doc_id::varchar), 1, 15))::bigint AS hkey
         |  FROM documents),
         |packed AS (
         |  SELECT doc_id, source, text, n_tokens,
         |    cast(row_number() OVER w AS bigint) AS pack_order,
         |    cast((sum(n_tokens) OVER w - n_tokens) // 512 AS bigint) AS bin
         |  FROM base
         |  WINDOW w AS (PARTITION BY source ORDER BY hkey, doc_id
         |               ROWS UNBOUNDED PRECEDING))
         |SELECT source, bin,
         |  string_agg(text, ' <eod> ' ORDER BY pack_order) AS sequence,
         |  cast(count(*) AS bigint) AS n_docs,
         |  cast(sum(n_tokens) AS bigint) AS n_tokens
         |FROM packed GROUP BY source, bin""".stripMargin,
    "lang_temperature_weights" ->
      """WITH counts AS (
        |  SELECT lang, cast(count(*) AS bigint) AS n_docs FROM documents GROUP BY lang),
        |p AS (
        |  SELECT lang, n_docs,
        |    n_docs::DOUBLE / (SELECT cast(sum(n_docs) AS bigint) FROM counts) AS p,
        |    pow(n_docs::DOUBLE / (SELECT cast(sum(n_docs) AS bigint) FROM counts), 0.7) AS pw
        |  FROM counts),
        |z AS (SELECT cast(sum(cast(pw AS decimal(18,9))) AS double) AS z FROM p)
        |SELECT lang, n_docs,
        |  round(p, 4) AS p_raw,
        |  round(pw / z, 4) AS p_temp,
        |  round(pw / z / p, 4) AS boost
        |FROM p, z""".stripMargin,
    "quality_repetition" ->
      """WITH words AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |tok AS (
        |  SELECT doc_id, ws[i] AS w,
        |    CASE WHEN i < len(ws) THEN ws[i] || ' ' || ws[i+1] END AS bg
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM words)),
        |wstats AS (
        |  SELECT doc_id, cast(count(*) AS bigint) AS n_words,
        |         cast(count(DISTINCT w) AS bigint) AS n_distinct
        |  FROM tok GROUP BY 1),
        |bg AS (SELECT doc_id, bg, count(*) AS c FROM tok WHERE bg IS NOT NULL GROUP BY 1, 2),
        |bstats AS (
        |  SELECT doc_id, cast(max(c) AS bigint) AS top_bigram_cnt,
        |         cast(sum(c) AS bigint) AS n_bigrams
        |  FROM bg GROUP BY 1),
        |scored AS (
        |  SELECT w.doc_id, w.n_words, w.n_distinct,
        |    round(1 - w.n_distinct::DOUBLE / w.n_words, 4) AS dup_word_frac,
        |    round(coalesce(b.top_bigram_cnt::DOUBLE / b.n_bigrams, 0), 4) AS top_bigram_frac
        |  FROM wstats w LEFT JOIN bstats b USING (doc_id))
        |SELECT doc_id, n_words, n_distinct, dup_word_frac, top_bigram_frac,
        |  CASE WHEN dup_word_frac > 0.6 OR top_bigram_frac > 0.1
        |       THEN 'repetitive' ELSE 'ok' END AS repetition_flag
        |FROM scored""".stripMargin,
    "decontaminate" -> decontamOracle,
    // the Bloom gate is a pure prefilter before an exact verify join,
    // so the bloom variant answers the SAME query
    "decontaminate_bloom" -> decontamOracle,
    "doc_chunks" ->
      """SELECT doc_id,
        |  (s - 1) // 48 AS chunk_id,
        |  cast(least(64, len(ws) - s + 1) AS bigint) AS n_tokens,
        |  array_to_string(list_slice(ws, s, least(s + 63, len(ws))), ' ') AS chunk_text
        |FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1, 48)) AS s
        |      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |            FROM documents WHERE length(trim(text)) > 0))""".stripMargin,
    "cdc_chunks" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |b AS (
        |  SELECT doc_id, ws,
        |    list_filter(range(4, len(ws)), i ->
        |      ('0x' || substr(md5(array_to_string(list_slice(ws, i - 3, i), ' ')), 1, 15))::bigint % 8 = 0) AS bnd
        |  FROM w),
        |c AS (
        |  SELECT doc_id, ws,
        |    list_prepend(1, list_transform(bnd, x -> x + 1)) AS starts,
        |    list_append(bnd, len(ws)) AS ends
        |  FROM b)
        |SELECT doc_id, cast(i - 1 AS bigint) AS chunk_id,
        |  cast(ends[i] - starts[i] + 1 AS bigint) AS n_tokens,
        |  array_to_string(list_slice(ws, starts[i], ends[i]), ' ') AS chunk_text
        |FROM (SELECT doc_id, ws, starts, ends,
        |        unnest(range(1, len(starts) + 1)) AS i
        |      FROM c)""".stripMargin,
    "pii_redact" ->
      """SELECT event_id,
        |  regexp_replace(
        |    regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS props_redacted,
        |  cast(len(regexp_extract_all(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS bigint) AS n_emails,
        |  cast(len(regexp_extract_all(props, '[0-9]+')) AS bigint) AS n_nums
        |FROM events""".stripMargin,
    "oov_mask" ->
      """WITH words AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |tok AS (
        |  SELECT doc_id, i, ws[i] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM words)),
        |vocab AS (
        |  SELECT w FROM tok GROUP BY w
        |  ORDER BY count(*) DESC, w ASC LIMIT 25),
        |masked AS (
        |  SELECT t.doc_id, t.i,
        |    CASE WHEN v.w IS NOT NULL THEN t.w ELSE '<unk>' END AS w2
        |  FROM tok t LEFT JOIN vocab v ON t.w = v.w)
        |SELECT doc_id,
        |  string_agg(w2, ' ' ORDER BY i) AS masked_text,
        |  cast(sum(CASE WHEN w2 = '<unk>' THEN 1 ELSE 0 END) AS bigint) AS n_unk,
        |  cast(count(*) AS bigint) AS n_tokens
        |FROM masked GROUP BY doc_id""".stripMargin
  )
}
