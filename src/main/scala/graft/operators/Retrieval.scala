package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** Retrieval-side primitives a training-data pipeline needs once the
  * corpus is deduplicated: an inverted index (term → postings), BM25
  * ranking against a term query, per-source frequency capping (keep
  * at most K docs per origin so one crawl host can't dominate a
  * mixture), and per-language quantile quality gating.
  *
  * Scale notes (100 TB):
  * - The inverted index is (term, doc) keyed aggregation with map-side
  *   combine, then a term-keyed join for document frequencies — the
  *   natural layout is partition-by-term, which is exactly what the
  *   groupBy produces. Nothing corpus-sized is broadcast: the df
  *   relation is vocab-sized (one row per distinct term).
  * - BM25 only materializes postings for the QUERY's terms (the
  *   term-list join prunes before the tf aggregation), carries two
  *   broadcast scalars (N, avgdl), and takes global top-k through the
  *   bounded-heap [[graft.functions.TopKByScore]] — O(partitions × k)
  *   rows cross the wire, never the scored corpus.
  * - Frequency capping is the same heap aggregate grouped by source:
  *   at most K rows per source leave each partition, so a 10-billion-
  *   page crawl with a hot host never shuffles that host's full set.
  * - The quantile gate computes per-language exact percentiles in ONE
  *   aggregation (languages are few; each group's sorted values stay
  *   distributed until the final merge), broadcasts the language →
  *   threshold map, and filters map-side. No global window, no sort
  *   of the corpus.
  */
object Retrieval {

  /** BM25 parameters (standard Robertson defaults). */
  private val K1 = 1.2
  private val B = 0.75

  /** The fixed demo query — terms present in the synthetic vocab. */
  private val QueryTerms = Seq("spark", "query", "fast")

  /** The fixed demo phrase for positional search (occurs as an exact
    * in-order run in the synthetic corpus).
    */
  private val PhraseTerms = Seq("slow", "hash", "batch")

  /** Whitespace tokens of non-blank docs: (doc_id, term). */
  private def tokens(docs: DataFrame): DataFrame =
    docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("term"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Inverted index as posting rows: term → (df, doc_id, tf). Row
    // output (not array postings) keeps the oracle comparison and
    // the downstream joins deterministic; a sink would range-partition
    // by term and sort by (term, doc_id) to lay out contiguous
    // posting lists.
    "inverted_index" -> ((s, dir) => {
      val tok = tokens(Tables(s, dir).documents)
      val postings = tok.groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = postings.groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
      postings.join(broadcast(dfreq), Seq("term"))
        .select(col("term"), col("df"), col("doc_id"), col("tf"))
    }),

    // BM25 top-50 docs for a fixed 3-term query. Lucene's positive
    // IDF form ln(1 + (N − df + ½)/(df + ½)) — the classic form goes
    // NEGATIVE when df > N/2, which this tiny-vocab corpus hits for
    // every term. Scores are rounded to 6 dp BEFORE ranking on both
    // sides so an ulp difference in ln()/summation order can never
    // flip the rank order; ties break by doc_id via the heap
    // aggregate's (score DESC, id ASC) total order.
    "bm25_search" -> ((s, dir) => {
      graft.functions.TopKByScore.register(s)
      val tok = tokens(Tables(s, dir).documents)
      val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val qt = s.createDataFrame(QueryTerms.map(Tuple1(_)))
        .toDF("term")
      val tf = tok.join(broadcast(qt), Seq("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val idf = log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val norm = col("tf") + lit(K1) *
        (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))
      val scored = tf
        .join(broadcast(dfreq), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("s", idf * col("tf") * lit(K1 + 1) / norm)
        .groupBy(col("doc_id"))
        .agg(round(sum(col("s")), 6).as("bm25"))
      scored
        .agg(graft.functions.TopKByScore
          .topk_by_score(col("bm25"), col("doc_id"), 50).as("top"))
        .select(posexplode(col("top")))
        .select((col("pos") + 1).cast("int").as("rk"),
          col("col.id").as("doc_id"), col("col.score").as("bm25"))
    }),

    // Per-source frequency cap: keep the 10 largest docs per source
    // (n_chars DESC, doc_id ASC). The bounded heap means at most 10
    // rows per source per partition reach the shuffle — a hot crawl
    // host never ships its millions of pages to one reducer the way
    // the row_number() window formulation would.
    "source_frequency_cap" -> ((s, dir) => {
      graft.functions.TopKByScore.register(s)
      Tables(s, dir).documents
        .groupBy(col("source"))
        .agg(graft.functions.TopKByScore
          .topk_by_score(col("n_chars").cast("double"), col("doc_id"), 10)
          .as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
          col("col.id").as("doc_id"),
          col("col.score").cast("bigint").as("n_chars"))
    }),

    // Exact PHRASE search via positional-postings intersection — the
    // standard IR layout: tokens carry positions; each phrase term's
    // postings shift left by the term's offset in the phrase; a doc
    // position where ALL k offsets land is a phrase occurrence
    // (handles repeated phrase terms and overlapping matches, which
    // substring replace-counting does not). Scale: the isin() filter
    // prunes the token stream to the phrase terms' postings BEFORE
    // any shuffle, the (doc, start) aggregate combines map-side, and
    // k is phrase length — cost tracks the phrase terms' document
    // frequency, never corpus size.
    "phrase_search" -> ((s, dir) =>
      phraseSearch(Tables(s, dir).documents, PhraseTerms)),

    // Per-language P75 length gate: one exact-percentile aggregation
    // over few language groups, broadcast thresholds, map-side
    // filter, then a per-language summary. Demonstrates the
    // "aggregate → broadcast scalar → filter" quantile pattern that
    // replaces a corpus-wide sort/window at scale.
    "quality_quantile_filter" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val thr = docs.groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.75)).as("thr"))
      docs.join(broadcast(thr), Seq("lang"))
        .filter(col("n_chars").cast("double") >= col("thr"))
        .groupBy(col("lang"))
        .agg(round(max(col("thr")), 4).as("p75_chars"),
          count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("kept_chars"))
    })
  )

  /** Exact phrase occurrences per doc: (doc_id, n_matches,
    * first_pos 1-based). Positional-postings intersection — counts
    * OVERLAPPING occurrences and handles repeated phrase terms
    * ("a a" occurs twice in "a a a"), which substring
    * replace-counting does not. See the `phrase_search` entry for the
    * scale argument.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    val terms = phrase.zipWithIndex
      .map { case (t, i) => struct(lit(t).as("term"), lit(i).as("idx")) }
    val tok = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")))
      .withColumnRenamed("col", "w")
      .filter(col("w").isin(phrase: _*))
      // a token matches every phrase slot holding its word
      .select(col("doc_id"), col("pos"), col("w"),
        explode(array(terms: _*)).as("k"))
      .filter(col("w") === col("k.term"))
    tok
      .groupBy(col("doc_id"), (col("pos") - col("k.idx")).as("start"))
      .agg(count_distinct(col("k.idx")).as("n_slots"))
      .filter(col("n_slots") === phrase.size && col("start") >= 0)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("start")) + 1).cast("int").as("first_pos"))
  }

  def oracles: Map[String, String] = Map(
    "inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |p AS (
        |  SELECT term, doc_id, cast(count(*) AS bigint) AS tf
        |  FROM tok GROUP BY term, doc_id),
        |d AS (
        |  SELECT term, cast(count(*) AS bigint) AS df FROM p GROUP BY term)
        |SELECT term, df, doc_id, tf FROM p JOIN d USING (term)""".stripMargin,
    "bm25_search" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |dl AS (
        |  SELECT doc_id, cast(count(*) AS bigint) AS dl FROM tok GROUP BY doc_id),
        |st AS (
        |  SELECT cast(count(*) AS bigint) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, cast(count(*) AS bigint) AS tf
        |  FROM tok WHERE term IN ('spark', 'query', 'fast')
        |  GROUP BY doc_id, term),
        |dfs AS (
        |  SELECT term, cast(count(*) AS bigint) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT doc_id,
        |    round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |      * tf * 2.2
        |      / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
        |  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        |  GROUP BY doc_id)
        |SELECT cast(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS int) AS rk,
        |  doc_id, bm25
        |FROM sc ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin,
    "source_frequency_cap" ->
      """SELECT source,
        |  cast(row_number() OVER w AS int) AS rk, doc_id, n_chars
        |FROM documents
        |WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC)
        |QUALIFY row_number() OVER w <= 10""".stripMargin,
    "phrase_search" ->
      """WITH words AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |tok AS (
        |  SELECT doc_id, i, ws[i] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM words)),
        |k(idx, term) AS (VALUES (0, 'slow'), (1, 'hash'), (2, 'batch')),
        |hits AS (
        |  SELECT doc_id, i - idx AS start
        |  FROM tok JOIN k ON tok.w = k.term
        |  GROUP BY doc_id, i - idx
        |  HAVING count(DISTINCT idx) = 3 AND i - idx >= 1)
        |SELECT doc_id, cast(count(*) AS bigint) AS n_matches,
        |  cast(min(start) AS int) AS first_pos
        |FROM hits GROUP BY doc_id""".stripMargin,
    "quality_quantile_filter" ->
      """WITH thr AS (
        |  SELECT lang, quantile_cont(n_chars, 0.75) AS thr
        |  FROM documents GROUP BY lang)
        |SELECT lang, round(max(thr), 4) AS p75_chars,
        |  cast(count(*) AS bigint) AS n_kept,
        |  cast(sum(n_chars) AS bigint) AS kept_chars
        |FROM documents JOIN thr USING (lang)
        |WHERE n_chars >= thr
        |GROUP BY lang""".stripMargin
  )
}
