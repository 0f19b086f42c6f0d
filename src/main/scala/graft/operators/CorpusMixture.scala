package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Training-mixture design operators: which documents to keep, and in
  * what proportion, when composing a pretraining corpus from
  * heterogeneous sources.
  *
  * Everything here is linear keyed dataflow over the token stream —
  * one explode, map-side-combined counts, token-keyed joins, bounded
  * top-k — so each operator survives a corpus 1000× this size: the
  * only whole-corpus-sized relations are token streams partitioned by
  * token or doc, the LM/count tables are vocab-bounded, and scalars
  * (totals, vocab size) ride as 1-row broadcasts.
  */
object CorpusMixture {

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
      explode(split(trim(col("text")), "\\s+")).as("w"))

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score every doc by
    * the average unigram log-likelihood ratio between a TARGET slice
    * (here lang = `targetLang`) and the raw corpus, add-0.5 smoothing
    * over the joint vocab; the top-weighted docs are the ones to
    * resample into the mixture. Both LMs come out of ONE conditional
    * aggregate over the token stream (the target count is a
    * `sum(when(...))` beside the raw count — no second pass), totals
    * ride as a 1-row broadcast, and the top-50 select is a
    * TakeOrderedAndProject, never a global sort.
    */
  def dsirWeights(docs: DataFrame, targetLang: String): DataFrame = {
    val t = toks(docs)
    val counts = t.groupBy(col("w")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(
      sum(col("cr")).as("nr"), sum(col("ct")).as("nt"),
      count(lit(1)).as("v"))
    // round(4) absorbs last-ulp ln()/summation differences between
    // engines (same convention as unigram_logprob); ordering on the
    // ROUNDED value keeps the top-50 cutoff engine-agnostic
    t.join(counts.hint("shuffle_hash"), Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("llr",
        log((col("ct").cast("double") + lit(0.5)) /
            (col("nt").cast("double") + lit(0.5) * col("v").cast("double"))) -
        log((col("cr").cast("double") + lit(0.5)) /
            (col("nr").cast("double") + lit(0.5) * col("v").cast("double"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), round(avg(col("llr")), 4).as("avg_llr"))
      .orderBy(desc("avg_llr"), asc("doc_id"))
      .limit(50)
  }

  /** Per-source distribution drift: unsmoothed KL(p_source ‖
    * p_corpus) over the token unigram distributions. Tokens absent
    * from a source contribute exactly 0 (lim p→0 of p·ln p), and
    * p_corpus > 0 wherever p_source > 0 because the corpus contains
    * the source — so the unsmoothed form is finite and needs no
    * pseudo-counts. The corpus count table derives from the
    * (source, token) relation (vocab×sources-bounded), never a second
    * pass over the stream; the per-source totals are a tiny broadcast.
    * High-KL sources are the ones temperature-mixing must tame.
    */
  def sourceKl(docs: DataFrame): DataFrame = {
    val cs = toks(docs).groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("csw"))
    val cw = cs.groupBy(col("w")).agg(sum(col("csw")).as("cw"))
    val ns = cs.groupBy(col("source")).agg(sum(col("csw")).as("nsrc"))
    val n = cw.agg(sum(col("cw")).as("n"))
    cs.join(cw.hint("shuffle_hash"), Seq("w"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("ps", col("csw").cast("double") / col("nsrc").cast("double"))
      .withColumn("term",
        col("ps") * (log(col("ps")) -
          log(col("cw").cast("double") / col("n").cast("double"))))
      .groupBy(col("source"))
      .agg(max(col("nsrc")).as("n_toks"), round(sum(col("term")), 4).as("kl"))
  }

  /** PMI collocation mining (the statistic behind phrase-vocab
    * induction): for adjacent token pairs with corpus count ≥
    * `minCount`, pmi = ln(p(v,w) / (p(v)·p(w))), top 20. The bigram
    * split materializes ONCE behind the generator boundary (the
    * projection-collapse lesson), unigram counts join in twice under
    * their two roles, and the final select is bounded —
    * TakeOrderedAndProject on the rounded score, no global sort.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long): DataFrame = {
    val bi = docs.filter(length(trim(col("text"))) > 0)
      .select(split(trim(col("text")), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("ws"), explode(sequence(lit(1), size(col("ws")) - 1)).as("i"))
      .select(element_at(col("ws"), col("i")).as("v"),
        element_at(col("ws"), col("i") + 1).as("w"))
    val cxy = bi.groupBy(col("v"), col("w")).agg(count(lit(1)).as("cxy"))
    val cx = toks(docs).groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val totals = cxy.agg(sum(col("cxy")).as("b"))
      .crossJoin(cx.agg(sum(col("cu")).as("n")))
    cxy.filter(col("cxy") >= minCount)
      .join(cx.withColumnRenamed("w", "v").withColumnRenamed("cu", "cv")
        .hint("shuffle_hash"), Seq("v"))
      .join(cx.withColumnRenamed("cu", "cw").hint("shuffle_hash"), Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(log(
        (col("cxy").cast("double") / col("b").cast("double")) /
          ((col("cv").cast("double") / col("n").cast("double")) *
           (col("cw").cast("double") / col("n").cast("double")))), 4))
      .select(col("v"), col("w"), col("cxy"), col("pmi"))
      .orderBy(desc("pmi"), asc("v"), asc("w"))
      .limit(20)
  }

  /** Weighted reservoir sample, k docs per source with inclusion
    * probability ∝ n_chars, by the A-ES exponential-race key
    * (Efraimidis–Spirakis): rank by ln(u)/weight descending, u a
    * deterministic 50-bit md5-derived uniform in (0,1] — byte-for-byte
    * reproducible in SQL, no RNG state. The per-source top-k runs in
    * the bounded-heap aggregate: k rows per partition per source
    * reach the shuffle and nothing is ever sorted (the window
    * formulation pays two sorts even with Spark's group-limit cap —
    * see TopKByScore's scaladoc).
    */
  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.Md5Hash60.register(spark)
    graft.functions.TopKByScore.register(spark)
    val h = pmod(graft.functions.Md5Hash60.md5_hash60(
      col("doc_id").cast("string")), lit(1L << 50))
    // u = (h+1)/2^50 ∈ (0,1]: numerator and denominator both exact in
    // double, so u is the same IEEE value in every engine
    val key = log((h + lit(1L)).cast("double") / lit((1L << 50).toDouble)) /
      greatest(col("n_chars"), lit(1L)).cast("double")
    docs.withColumn("akey", key)
      .groupBy(col("source"))
      .agg(graft.functions.TopKByScore
        .topk_by_score(col("akey"), col("doc_id"), k).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("doc_id"))
  }

  /** Marginal n-gram novelty per source — the submodular-coverage
    * diagnostic behind greedy data-mixing (each source's value to the
    * mixture is the share of its n-grams nothing "earlier" already
    * contributes; here the order is the deterministic lexicographic
    * source order, so the report is a fixed coverage decomposition
    * rather than a driver-side greedy loop). A source whose novelty
    * share is near zero is redundant with the rest of the corpus and
    * a downweighting candidate regardless of its standalone quality.
    *
    * Dataflow: the 8-gram hash stream (same shingle/hash shape as
    * decontamination, spread before the CPU-heavy md5 map), one
    * distinct per (source, h), the vocab-keyed min-source aggregate,
    * one h-keyed join back, and a source-bounded final aggregate.
    * Everything wide is keyed on the n-gram hash — linear in the
    * token stream at any corpus size. The novelty ratio is ONE IEEE
    * division of two exact ints, so both engines emit the identical
    * double with no rounding layer.
    */
  def sourceNovelty(docs: DataFrame): DataFrame = {
    graft.functions.Md5Hash60.register(docs.sparkSession)
    val base = Dedup.spread(
      docs.filter(length(trim(col("text"))) > 0)
        .select(col("source"), split(trim(col("text")), "\\s+").as("ws"))
        .filter(size(col("ws")) >= 8),
      col("source"))
    val ng = base
      .select(col("source"), explode(
        sequence(lit(1), size(col("ws")) - lit(7))).as("i"),
        col("ws"))
      .select(col("source"), graft.functions.Md5Hash60.md5_hash60(
        array_join(slice(col("ws"), col("i"), lit(8)), " ")).as("h"))
      .distinct()
    val first = ng.groupBy(col("h")).agg(min(col("source")).as("first_source"))
    ng.join(first.hint("shuffle_hash"), Seq("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("source") === col("first_source"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("source"), col("n_ngrams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_ngrams").cast("double"))
          .as("novelty"))
  }

  /** Token-budget epoch allocation: how many epochs of each source to
    * run when composing a fixed-budget pretraining mixture — the
    * budget face of the mixture family (DSIR ranks docs, source_kl
    * measures drift; this row decides REPETITION, the knob production
    * corpora actually turn when the budget exceeds the deduped corpus,
    * cf. Muennighoff et al., "Scaling Data-Constrained Language
    * Models"). Deterministic integer formulation so the hash gate
    * holds: per-source token counts and a quality proxy (share of
    * 3–12-char tokens, in e6 fixed point) come from ONE pass over the
    * token stream; the budget (`budgetMultiple` × corpus tokens)
    * splits across sources proportionally to quality_e6 × n_tokens;
    * epochs_e6 = target/n_tokens caps at `maxEpochsE6` (the repeated-
    * epoch value decay bound — leftover from capped sources is NOT
    * redistributed, a one-shot allocation by design). Every division
    * is an integral DIV with positive operands (Spark truncates,
    * DuckDB floors — equal on positives); products run in
    * decimal(38,0)/HUGEINT, clearing ~1e32 at a 100 TB corpus
    * (2 × 1.25e13 tokens × 1e6 × 1e13). Scale shape: one explode +
    * map-side-combined per-source aggregate; everything after is a
    * sources-bounded relation with a 1-row broadcast total.
    */
  def tokenBudgetEpochs(docs: DataFrame, budgetMultiple: Int = 2,
                        maxEpochsE6: Long = 4000000L): DataFrame = {
    val perSource = toks(docs)
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(length(col("w")).between(3, 12), 1L).otherwise(0L))
          .as("n_good"))
      .withColumn("quality_e6",
        expr("(1000000 * CAST(n_good AS DECIMAL(38,0))) DIV n_tokens"))
    val totals = perSource.agg(
      sum(col("n_tokens")).as("total_tokens"),
      sum(expr("CAST(quality_e6 AS DECIMAL(38,0)) * n_tokens"))
        .as("qweight"))
    perSource.crossJoin(broadcast(totals))
      // degenerate-corpus guard (r12 advice): qweight = 0 means no
      // source has any 3-12-char token — Spark's decimal DIV by zero
      // yields NULL and least(cap, NULL) would then return the CAP,
      // allocating max epochs to quality-0 sources; DuckDB's // 0
      // raises instead, so the engines would diverge. Allocate 0.
      .withColumn("target_tokens", expr(
        s"CASE WHEN qweight > 0 THEN ($budgetMultiple * CAST(total_tokens AS DECIMAL(38,0))" +
          " * quality_e6 * n_tokens) DIV qweight ELSE CAST(0 AS BIGINT) END"))
      .withColumn("epochs_e6", least(lit(maxEpochsE6), expr(
        "(CAST(target_tokens AS DECIMAL(38,0)) * 1000000) DIV n_tokens")))
      .withColumn("alloc_tokens", expr(
        "(CAST(epochs_e6 AS DECIMAL(38,0)) * n_tokens) DIV 1000000"))
      // same guard for the share: an all-zero allocation (possible
      // only via the qweight guard above) must yield share 0, not a
      // 0/0 NULL-vs-error divergence between engines
      .withColumn("share_e6", expr(
        "CASE WHEN sum(alloc_tokens) OVER () > 0 THEN" +
          " (1000000 * CAST(alloc_tokens AS DECIMAL(38,0)))" +
          " DIV sum(alloc_tokens) OVER () ELSE CAST(0 AS BIGINT) END"))
      .select(col("source"), col("n_tokens"), col("quality_e6"),
        col("epochs_e6"), col("alloc_tokens"), col("share_e6"))
      .orderBy(col("source"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "token_budget_epochs" -> ((s, dir) =>
      tokenBudgetEpochs(Tables(s, dir).documents)),
    "source_novelty" -> ((s, dir) => sourceNovelty(Tables(s, dir).documents)),
    "dsir_weights" -> ((s, dir) => dsirWeights(Tables(s, dir).documents, "en")),
    "source_kl" -> ((s, dir) => sourceKl(Tables(s, dir).documents)),
    "pmi_collocations" -> ((s, dir) =>
      pmiCollocations(Tables(s, dir).documents, minCount = 10L)),
    "weighted_sample" -> ((s, dir) =>
      weightedSample(Tables(s, dir).documents, k = 5))
  )

  def oracles: Map[String, String] = Map(
    // mirrors tokenBudgetEpochs step for step: same one-pass counts,
    // same HUGEINT products, same two-step target->epochs integral
    // divisions (folding them would change the truncation points)
    "token_budget_epochs" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |ps AS (
        |  SELECT source, cast(count(*) AS bigint) AS n_tokens,
        |    cast(sum(CASE WHEN len(w) BETWEEN 3 AND 12 THEN 1 ELSE 0 END)
        |      AS bigint) AS n_good
        |  FROM toks GROUP BY source),
        |ps2 AS (
        |  SELECT source, n_tokens,
        |    cast((1000000 * cast(n_good AS HUGEINT)) // n_tokens AS bigint)
        |      AS quality_e6
        |  FROM ps),
        |tot AS (
        |  SELECT cast(sum(n_tokens) AS HUGEINT) AS total_tokens,
        |    sum(cast(quality_e6 AS HUGEINT) * n_tokens) AS qweight
        |  FROM ps2),
        |tgt AS (
        |  SELECT source, n_tokens, quality_e6,
        |    CASE WHEN qweight > 0
        |      THEN (2 * total_tokens * quality_e6 * n_tokens) // qweight
        |      ELSE 0 END AS target_tokens
        |  FROM ps2, tot),
        |ep AS (
        |  SELECT source, n_tokens, quality_e6,
        |    least(4000000, (cast(target_tokens AS HUGEINT) * 1000000)
        |      // n_tokens) AS epochs_e6
        |  FROM tgt),
        |al AS (
        |  SELECT source, n_tokens, quality_e6, epochs_e6,
        |    (cast(epochs_e6 AS HUGEINT) * n_tokens) // 1000000
        |      AS alloc_tokens
        |  FROM ep)
        |SELECT source, n_tokens, cast(quality_e6 AS bigint) AS quality_e6,
        |  cast(epochs_e6 AS bigint) AS epochs_e6,
        |  cast(alloc_tokens AS bigint) AS alloc_tokens,
        |  cast(CASE WHEN (SELECT sum(alloc_tokens) FROM al) > 0
        |    THEN (1000000 * cast(alloc_tokens AS HUGEINT))
        |      // (SELECT sum(alloc_tokens) FROM al)
        |    ELSE 0 END AS bigint) AS share_e6
        |FROM al
        |ORDER BY source""".stripMargin,
    // the same 8-gram md5 hash stream as the decontamination oracle,
    // then min-source coverage attribution; the novelty ratio is one
    // int/int division, identical IEEE in both engines
    "source_novelty" ->
      """WITH base AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |ng AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(array_to_string(list_slice(ws, i, i + 7), ' ')), 1, 15))::bigint AS h
        |  FROM (SELECT source, ws, unnest(range(1, len(ws) - 7 + 1)) AS i
        |        FROM base WHERE len(ws) >= 8)),
        |first AS (SELECT h, min(source) AS first_source FROM ng GROUP BY h)
        |SELECT source, cast(count(*) AS bigint) AS n_ngrams,
        |  cast(sum(CASE WHEN source = first_source THEN 1 ELSE 0 END) AS bigint)
        |    AS n_novel,
        |  sum(CASE WHEN source = first_source THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*)::DOUBLE AS novelty
        |FROM ng JOIN first USING (h)
        |GROUP BY source""".stripMargin,
    "dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |counts AS (
        |  SELECT w, cast(count(*) AS bigint) AS cr,
        |    cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS bigint) AS ct
        |  FROM toks GROUP BY w),
        |totals AS (
        |  SELECT cast(sum(cr) AS bigint) AS nr, cast(sum(ct) AS bigint) AS nt,
        |    cast(count(*) AS bigint) AS v
        |  FROM counts)
        |SELECT doc_id, cast(count(*) AS bigint) AS n_toks,
        |  round(avg(
        |    ln((ct::DOUBLE + 0.5) / (nt::DOUBLE + 0.5 * v::DOUBLE)) -
        |    ln((cr::DOUBLE + 0.5) / (nr::DOUBLE + 0.5 * v::DOUBLE))), 4) AS avg_llr
        |FROM toks JOIN counts USING (w), totals
        |GROUP BY doc_id
        |ORDER BY avg_llr DESC, doc_id ASC LIMIT 50""".stripMargin,
    "source_kl" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |cs AS (SELECT source, w, cast(count(*) AS bigint) AS csw
        |       FROM toks GROUP BY source, w),
        |cw AS (SELECT w, cast(sum(csw) AS bigint) AS cw FROM cs GROUP BY w),
        |ns AS (SELECT source, cast(sum(csw) AS bigint) AS nsrc
        |       FROM cs GROUP BY source),
        |n AS (SELECT cast(sum(cw) AS bigint) AS n FROM cw)
        |SELECT source, cast(max(nsrc) AS bigint) AS n_toks,
        |  round(sum((csw::DOUBLE / nsrc::DOUBLE) *
        |    (ln(csw::DOUBLE / nsrc::DOUBLE) - ln(cw::DOUBLE / n::DOUBLE))), 4)
        |    AS kl
        |FROM cs JOIN cw USING (w) JOIN ns USING (source), n
        |GROUP BY source""".stripMargin,
    "pmi_collocations" ->
      """WITH words AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents
        |  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 2),
        |bi AS (
        |  SELECT ws[i] AS v, ws[i + 1] AS w
        |  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM words)),
        |cxy AS (SELECT v, w, cast(count(*) AS bigint) AS cxy
        |        FROM bi GROUP BY v, w),
        |cx AS (
        |  SELECT w, cast(count(*) AS bigint) AS cu
        |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |        FROM documents)
        |  GROUP BY w),
        |totals AS (
        |  SELECT (SELECT cast(sum(cxy) AS bigint) FROM cxy) AS b,
        |         (SELECT cast(sum(cu) AS bigint) FROM cx) AS n)
        |SELECT cxy.v AS v, cxy.w AS w, cxy.cxy AS cxy,
        |  round(ln((cxy.cxy::DOUBLE / b::DOUBLE) /
        |    ((cv.cu::DOUBLE / n::DOUBLE) * (cwu.cu::DOUBLE / n::DOUBLE))), 4)
        |    AS pmi
        |FROM cxy
        |JOIN cx cv ON cv.w = cxy.v
        |JOIN cx cwu ON cwu.w = cxy.w, totals
        |WHERE cxy.cxy >= 10
        |ORDER BY pmi DESC, v ASC, w ASC LIMIT 20""".stripMargin,
    "weighted_sample" ->
      """WITH scored AS (
        |  SELECT source, doc_id,
        |    ln(((('0x' || substr(md5(doc_id::varchar), 1, 15))::bigint
        |         % 1125899906842624 + 1)::DOUBLE) / 1125899906842624.0)
        |      / greatest(n_chars, 1)::DOUBLE AS akey
        |  FROM documents)
        |SELECT source, cast(row_number() OVER w AS int) AS rk, doc_id
        |FROM scored
        |WINDOW w AS (PARTITION BY source ORDER BY akey DESC, doc_id ASC)
        |QUALIFY row_number() OVER w <= 5""".stripMargin
  )
}
