package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** End-to-end corpus curation — the composite training-data pipeline
  * the individual operators exist for, as ONE dataflow:
  *
  *   quality filter → exact dedup (keep min doc_id per content hash)
  *   → MinHash-LSH near-dup removal (drop the higher doc_id of each
  *   verified pair) → per-language corpus statistics.
  *
  * Scale notes: stage order matters — the cheap narrow quality
  * filter runs first and shrinks everything downstream; exact dedup
  * is one hash shuffle; the LSH stage only sees survivors. No stage
  * materializes to the driver; the whole pipeline is a single
  * Catalyst plan.
  */
object CorpusCuration {

  /** Survivors of the full curation flow (doc-level). */
  def curate(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("text"), col("lang"),
      col("n_chars"),
      TextAnalysis.nWords.as("n_words"),
      (TextAnalysis.hits(" the ") + TextAnalysis.hits(" a ") +
        TextAnalysis.hits(" of ") + TextAnalysis.hits(" and ")).as("stop_hits"))
    // PIN the window shuffle's partition count: an ENSURE_REQUIREMENTS
    // exchange on a sub-MB corpus is AQE-coalesced to ONE partition,
    // and kept2's cache freezes that — every CPU-bound shingle/minhash
    // map downstream then runs single-task (the r8 cold recording's
    // 17.9 s). The explicit-count repartition on the same expression
    // satisfies the window's clustering (alias-aware partitioning
    // propagation), so no second exchange appears.
    val kept1 = Dedup.spread(
      scored.filter(col("n_words") >= 20 && col("stop_hits") > 0),
      md5(col("text")))
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    // kept2 feeds THREE consumers (LSH band generation, LSH verify
    // shingles, and the final anti-join's left side) — persist it or
    // the regex scoring + md5 window shuffle above runs three times
    // (r01 bench: that recompute alone was ~4× the whole baseline).
    // (A min_by(struct(*), doc_id) aggregate was tried instead of the
    // window: the struct-typed buffer falls off the hash-aggregate
    // fast path and measured 2× SLOWER — the sorted window over the
    // md5 shuffle is the better plan here.)
    val kept2 = kept1.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // kept2 is exact-deduped (one survivor per md5 group), so
    // minhashPairs' dup-rate gate picks its direct branch; and kept2
    // already sits on the session's shuffle partitioning (the md5
    // window shuffled it), so that branch's input respread is
    // skipped too
    val nearDupLosers = Dedup.minhashPairs(
        kept2.select(col("doc_id"), col("text")), spreadInput = false)
      .select(col("doc_b").as("doc_id")).distinct()
    kept2.join(nearDupLosers, Seq("doc_id"), "left_anti")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_curation" -> ((s, dir) => {
      curate(Tables(s, dir).documents)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_tokens"),
          sum(col("n_chars")).as("total_chars"))
    })
  )

  def oracles: Map[String, String] = Map(
    "corpus_curation" ->
      s"""WITH scored AS (
         |  SELECT doc_id, text, lang, n_chars,
         |    cast(${TextAnalysis.sqlNWords} AS bigint) AS n_words,
         |    cast(${TextAnalysis.sqlHits(" the ")} + ${TextAnalysis.sqlHits(" a ")}
         |         + ${TextAnalysis.sqlHits(" of ")} + ${TextAnalysis.sqlHits(" and ")} AS bigint) AS stop_hits
         |  FROM documents),
         |kept1 AS (SELECT * FROM scored WHERE n_words >= 20 AND stop_hits > 0),
         |kept2 AS (
         |  SELECT doc_id, text, lang, n_chars, n_words FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM kept1) WHERE rn = 1),
         |${Dedup.minhashOracleCtes("kept2")},
         |kept3 AS (
         |  SELECT k.* FROM kept2 k
         |  LEFT JOIN (SELECT DISTINCT doc_b FROM mh_pairs) p ON k.doc_id = p.doc_b
         |  WHERE p.doc_b IS NULL)
         |SELECT lang, cast(count(*) AS bigint) AS n_docs,
         |  cast(sum(n_words) AS bigint) AS n_tokens,
         |  cast(sum(n_chars) AS bigint) AS total_chars
         |FROM kept3 GROUP BY lang""".stripMargin
  )
}
