package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** IVF-PQ-style approximate nearest neighbor: product-quantize the
  * (L2-normalized) corpus into M per-subspace codebooks, score
  * queries against the 8-byte codes by asymmetric distance
  * computation (ADC), then exactly re-rank a small candidate pool.
  *
  * This is the 100 TB ANN layout ([[Similarity]]'s IVF handles the
  * coarse routing; this adds the compressed fine scan):
  * - The corpus is carried as M small integer codes per vector
  *   (M × ⌈log2 K⌉ = 64 bits here vs 64 × 32-bit floats) — a 32×
  *   smaller scan, which is the entire point at scale: the hot loop
  *   reads codes, not vectors.
  * - Codebooks are M × K × SubDim doubles (8 KiB) — a broadcast
  *   model, like any trained index structure.
  * - ADC distance tables are queries × M × K rows (tiny) — broadcast
  *   and joined against the exploded code relation; the per-query
  *   approximate distance is a SUM over M lookups, map-side combined.
  * - Only `RerankPool` candidates per query ever touch a real
  *   embedding again (the exact re-rank join), so full vectors are
  *   fetched for a few dozen ids, not scanned.
  *
  * Training is Lloyd's algorithm per subspace, all M subspaces in
  * ONE DataFrame pass per iteration; only the model (M × K × SubDim
  * doubles) is ever collected. Everything is seeded/deterministic:
  * initial codebooks are the subvectors of the first K non-query
  * vec_ids, iteration count is fixed.
  *
  * Not SQL-expressible in one oracle query (iterative training), so
  * the driver records a rows-only check for `ann_ivfpq_topk`;
  * correctness is spec-tested instead: deterministic output, and
  * re-ranked recall@10 against the exact brute-force top-10.
  */
object ProductQuantization {

  private[operators] val M = 8        // subspaces
  private[operators] val SubDim = 8   // dims per subspace (64 / M)
  private[operators] val CodebookK = 16 // centroids per subspace
  private val Iters = 4               // fixed Lloyd passes
  private val NumQueries = 10         // vec_id < 10 are queries (TESTDATA)
  private val TopK = 10
  private[operators] val RerankPool = 60

  /** L2-normalized double-array copy of the embedding column. */
  private def normalized(emb: Column): Column = {
    val norm = sqrt(aggregate(emb, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    transform(emb, x => x.cast("double") / norm)
  }

  /** (vec_id, sub, subvec): the normalized vector split into M
    * SubDim-length subvectors. One explode, not M projections.
    */
  private def subvectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), normalized(col("embedding")).as("ne"))
      .select(col("vec_id"), explode(sequence(lit(0), lit(M - 1))).as("sub"),
        col("ne"))
      .select(col("vec_id"), col("sub"),
        slice(col("ne"), col("sub") * SubDim + 1, lit(SubDim)).as("subvec"))

  /** Squared L2 between a subvector column and a centroid-array
    * column (both array<double>), sequential left-to-right fold —
    * deterministic.
    */
  private def l2sqCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Codebook relation (sub, code, centroid array<double>) from the
    * in-driver model — M × K rows, always broadcast.
    */
  private def codebookDf(s: SparkSession,
                         cb: Array[Array[Array[Double]]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = for {
      sub <- cb.indices; code <- cb(sub).indices
    } yield Row(sub, code, cb(sub)(code).toSeq)
    s.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sub",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("code",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))))
  }

  /** Nearest-code assignment of exploded subvectors against a
    * broadcast codebook: one join on `sub` (each row sees its K
    * centroids), argmin by (distance, code).
    */
  private def assign(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), Seq("sub"))
      .withColumn("d", l2sqCol(col("subvec"), col("centroid")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.code").as("code"))

  /** Train M codebooks with fixed-iteration Lloyd over ALL subspaces
    * in one pass per iteration. Returns model[sub][code][dim].
    */
  def trainCodebooks(emb: DataFrame): Array[Array[Array[Double]]] = {
    val subs = subvectors(emb.filter(col("vec_id") >= NumQueries))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic init: subvectors of the first K non-query ids
    val initRows = subs.filter(col("vec_id") < NumQueries + CodebookK)
      .orderBy(col("sub"), col("vec_id")).collect()
    var model: Array[Array[Array[Double]]] = Array.tabulate(M) { m =>
      initRows.filter(_.getInt(1) == m)
        .map(_.getSeq[Double](2).toArray)
    }
    for (_ <- 0 until Iters) {
      val means = assign(subs, codebookDf(emb.sparkSession, model))
        .join(subs, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("subvec")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val byKey = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      model = model.zipWithIndex.map { case (codes, sub) =>
        codes.zipWithIndex.map { case (old, code) =>
          byKey.get((sub, code)) match {
            case Some(rows) =>
              val c = old.clone()
              rows.foreach(r => c(r.getInt(2)) = r.getDouble(3))
              c
            case None => old // empty cell keeps its centroid
          }
        }
      }
    }
    subs.unpersist()
    model
  }

  /** ADC top-k: encode the corpus once, broadcast per-query distance
    * tables, sum M lookups per (query, vector), keep `RerankPool`
    * by approximate distance through the bounded heap, then exactly
    * re-rank that pool by true cosine. Output mirrors the other ANN
    * queries: (qid, vec_id, rank, cosine).
    */
  def ivfpqTopK(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    graft.functions.CosineSimilarity.register(s)
    graft.functions.TopKByScore.register(s)
    val model = trainCodebooks(emb)
    val cb = codebookDf(s, model)
    val codes = assign(subvectors(emb.filter(col("vec_id") >= NumQueries)), cb)
    // distance tables: queries × M × K rows, built by one broadcast
    // join of query subvectors against the codebook
    val qsubs = subvectors(emb.filter(col("vec_id") < NumQueries))
      .select(col("vec_id").as("qid"), col("sub"), col("subvec"))
    val tables = qsubs.join(broadcast(cb), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"),
        l2sqCol(col("subvec"), col("centroid")).as("dpart"))
    // approximate distance: sum of M table lookups; negative distance
    // as the heap score so "closest" is "largest"
    val approx = codes.join(broadcast(tables), Seq("sub", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg((-sum(col("dpart"))).as("negd"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByScore
        .topk_by_score(col("negd"), col("vec_id"), RerankPool).as("pool"))
      .select(col("qid"), explode(col("pool.id")).as("vec_id"))
    // exact re-rank of the tiny pool: fetch true embeddings for the
    // pool ids + broadcast the 10 query vectors
    val qvecs = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("cosine"), asc("vec_id"))
    approx
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qvecs), Seq("qid"))
      .withColumn("cosine", graft.functions.CosineSimilarity
        .cosine_sim(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("vec_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivfpq_topk" -> ((s, dir) => ivfpqTopK(Tables(s, dir).embeddings))
  )

  /** Iterative PQ training is not one-shot SQL-expressible — no
    * oracle entry; the driver records a rows-only check and
    * `ProductQuantizationSpec` carries correctness (determinism +
    * recall against the exact brute-force top-10).
    */
  def oracles: Map[String, String] = Map.empty
}
