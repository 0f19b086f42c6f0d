package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev micro-bench: time SUB-dataflows of the expensive queries so a
  * multi-second query decomposes into measured pieces instead of
  * guessed ones (optimization guide §1: measure first; §1.4: noop
  * sink so the timed action computes every column of every row and
  * the optimizer can't prune the piece under test).
  *
  * Usage: runMain graft.operators.MicroBench <sfDir> [piece,piece,...] [--reps=N]
  *
  * Pieces replicate the exact expression trees of the operators they
  * decompose (object-private helpers are inlined, with a pointer to
  * the source); they are measurement scaffolding, never query paths.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only =
      if (args.length > 1 && !args(1).startsWith("--"))
        args(1).split(",").toSet
      else Set.empty[String]
    val reps = args.find(_.startsWith("--reps="))
      .map(_.stripPrefix("--reps=").toInt).getOrElse(3)
    val s = graft.GraftSession.local()
    val t = graft.catalog.Tables(s, sfDir)
    graft.functions.MinHash60.register(s)
    graft.functions.ShingleKernel.register(s)

    def docs = t.documents

    // --- inlined copies of Dedup's object-private text kernels -----
    // (Dedup.shingleSetsK / TextAnalysis.hits; keep in sync by eye —
    // a drift here only mis-times a dev probe, never a query)
    def shingles(k: Int): DataFrame = {
      val w = split(trim(col("text")), "\\s+")
      val m = greatest(size(w) - lit(k - 1), lit(0))
      val grams = (2 to k).foldLeft(slice(w, lit(1), m))((acc, j) =>
        zip_with(acc, slice(w, lit(j), m), (a, b) => concat(a, lit(" "), b)))
      docs.select(col("doc_id"), array_distinct(grams).as("toks"))
    }
    def hits(needle: String) =
      ((length(concat(lit(" "), col("text"), lit(" "))) -
        length(expr(s"replace(concat(' ', text, ' '), '$needle', '')"))) /
        lit(needle.length)).cast("long")
    val nWords = when(length(trim(col("text"))) === 0, 0)
      .otherwise(size(split(trim(col("text")), "\\s+"))).cast("long")

    val pieces: Seq[(String, () => DataFrame)] = Seq(
      "docs_scan" -> (() => docs),
      "docs_split" -> (() =>
        docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))),
      "docs_shingle" -> (() => shingles(2)),
      "docs_shingle3" -> (() => shingles(3)),
      "docs_minhash" -> (() => shingles(2)
        .filter(size(col("toks")) >= 1)
        .select(col("doc_id"),
          graft.functions.MinHash60.minhash60(col("toks"), 16  /* Dedup.NumPerms (object-private) */).as("mh"))),
      "mh_cands" -> (() => Dedup.minhashBandCandidates(docs)),
      "mh_pairs" -> (() => Dedup.minhashPairs(docs.select(col("doc_id"), col("text")))),
      "curation_scored" -> (() => docs.select(col("doc_id"), col("text"),
        col("lang"), col("n_chars"), nWords.as("n_words"),
        (hits(" the ") + hits(" a ") + hits(" of ") + hits(" and "))
          .as("stop_hits"))),
      "edit_pairs" -> (() => Dedup.editPairs(docs)),
      "li_scan" -> (() => t.lineitem),
      "li_groupkey" -> (() => t.lineitem
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))),
      "pair_counts" -> (() => ProductAnalytics.materializedPairCounts(s, sfDir)),
      "events_scan" -> (() => t.events),
      "fused_tokcount" -> (() => docs.select(col("doc_id"),
        graft.functions.ShingleKernel.token_count(col("text")).as("tc"))),
      "fused_minhash" -> (() => docs.select(col("doc_id"),
        graft.functions.ShingleKernel.minhash60_text(col("text"), 16).as("mh"))),
      "fused_sig" -> (() => docs.select(col("doc_id"),
        graft.functions.ShingleKernel.shingle_sig(col("text"), 16).as("sig"))),
      "fused_sig3" -> (() => {
        val sig = graft.functions.ShingleKernel.shingle_sig(col("text"), 16)
        docs.select(col("doc_id"), sig.as("s"))
          .select(col("doc_id"), col("s.vtoks").as("vtoks"),
            col("s.n").as("n"), col("s.mh").as("mh"))
      }),
      // dfOrderedPrep's front half (object-private; inlined): the
      // exploded (doc_id, shingle) relation + df counts + the
      // (df, w)-ordered per-doc re-assembly — shared by the
      // containment/jaccard prefix joins (shingleK=3)
      "dfprep3" -> (() => {
        val tok = shingles(3).repartition(32, col("doc_id"))
          .select(col("doc_id"), explode(col("toks")).as("w"))
        val tokDf = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
        tok.join(tokDf.hint("shuffle_hash"), Seq("w"))
          .groupBy(col("doc_id"))
          .agg(array_sort(collect_list(struct(col("df"), col("w")))).as("sorted"))
          .select(col("doc_id"),
            transform(col("sorted"), x => xxhash64(x.getField("w"))).as("toks"),
            size(col("sorted")).as("n"))
      }),
      "dfprep3x" -> (() => {
        val tok = docs.repartition(32, col("doc_id"))
          .select(col("doc_id"), explode(
            graft.functions.ShingleKernel.shingle_xx(col("text"), 3)).as("w"))
        val tokDf = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
        tok.join(tokDf.hint("shuffle_hash"), Seq("w"))
          .groupBy(col("doc_id"))
          .agg(array_sort(collect_list(struct(col("df"), col("w")))).as("sorted"))
          .select(col("doc_id"),
            transform(col("sorted"), x => x.getField("w")).as("toks"),
            size(col("sorted")).as("n"))
      }),
      "chain_sig" -> (() => {
        val toks = shingles(2)
        toks.select(col("doc_id"),
          array_sort(transform(col("toks"), x => xxhash64(x))).as("vtoks"),
          size(col("toks")).as("n"),
          graft.functions.MinHash60.minhash60(col("toks"), 16).as("mh"))
      })
    )
    val sel = pieces.filter(p => only.isEmpty || only(p._1))
    for ((name, fn) <- sel) {
      val times = (1 to reps).map { _ =>
        s.catalog.clearCache()
        s.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-18s " + times.map(x => f"$x%6.2f").mkString(" "))
    }
    s.stop()
  }
}
