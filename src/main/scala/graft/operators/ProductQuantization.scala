package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** IVF-PQ-style approximate nearest neighbor: product-quantize the
  * (L2-normalized) corpus into M per-subspace codebooks, score
  * queries against the compact codes by asymmetric distance
  * computation (ADC), then exactly re-rank a small candidate pool.
  *
  * This is the full 100 TB ANN layout — coarse IVF routing composed
  * with the compressed PQ fine scan (the standalone distributed
  * trainer lives in [[Similarity.trainCentroids]]; here both the
  * coarse quantizer and the codebooks train on ONE bounded
  * driver-side sample) — organized around one asymmetry: MODELS are
  * small, the CORPUS is not.
  * - Codebooks (M × K × SubDim doubles, 8 KiB) are trained with
  *   Lloyd's algorithm on a BOUNDED deterministic sample collected
  *   to the driver — the standard PQ training layout (FAISS trains
  *   on ~10⁵–10⁶ sampled vectors regardless of corpus size): one
  *   O(sample) collect, zero per-iteration cluster jobs.
  * - ENCODING is a shuffle-free projection through the native
  *   [[graft.functions.PqEncode]] expression (normalize + M argmins
  *   in one primitive pass; HOF formulations re-evaluate the
  *   normalization fold per centroid under projection collapse) —
  *   the corpus is scanned exactly once, nothing is exploded through
  *   a join, and the result is M small codes per vector (64 bits vs
  *   64 × 32-bit floats, a 32× smaller representation).
  * - ADC distance tables (queries × M × K doubles) are computed
  *   driver-side from the collected query vectors and shipped as a
  *   literal; the per-(query, vector) approximate distance is a
  *   sequential M-lookup fold — deterministic, unlike a shuffled
  *   float SUM.
  * - The only corpus-wide shuffle is the bounded-heap top-K per
  *   query ([[graft.functions.TopKByScore]], partial-aggregated
  *   map-side); only `RerankPool` ids per query ever touch a real
  *   embedding again, via a broadcast of the POOL (never the
  *   corpus) against one more pruned scan.
  *
  * Everything is seeded/deterministic: the training sample is the
  * first `TrainSample` non-query vec_ids, initial centroids are the
  * first K sample subvectors, iteration count is fixed, and every
  * floating-point reduction is a sequential left fold.
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
  /** Training-sample cap: codebook quality saturates far below
    * corpus size, so training cost must not scale with it.
    */
  private[operators] val TrainSample = 4096
  /** Coarse IVF cells for the routed fine scan. */
  private[operators] val CoarseCells = 8

  /** Local L2 normalize (float → double widening is exact; the norm
    * is a sequential fold, same order as [[graft.functions.PqEncode]]).
    */
  private def normalizeLocal(v: Seq[Float]): Array[Double] = {
    var ss = 0.0
    v.foreach(x => ss += x.toDouble * x.toDouble)
    val n = math.sqrt(ss)
    v.map(_.toDouble / n).toArray
  }

  /** Fixed-iteration local Lloyd: deterministic (argmin ties toward
    * the smaller code, sequential sums, empty cells keep their
    * centroid). Shared by the per-subspace codebook training and the
    * coarse quantizer.
    */
  private def lloyd(points: Array[Array[Double]],
                    init: Array[Array[Double]],
                    iters: Int): Array[Array[Double]] = {
    val k = init.length
    val dim = init(0).length
    var cent = init.map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val cnt = new Array[Int](k)
      points.foreach { v =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - cent(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        cnt(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cent = cent.zipWithIndex.map { case (old, c) =>
        if (cnt(c) == 0) old else sums(c).map(_ / cnt(c))
      }
    }
    cent
  }

  /** Bounded deterministic training sample (first `TrainSample`
    * non-query ids), RAW floats: ONE Spark job of O(sample) rows,
    * independent of corpus size.
    */
  private def collectSample(emb: DataFrame): Array[Seq[Float]] =
    emb.filter(col("vec_id") >= NumQueries)
      .orderBy(col("vec_id")).limit(TrainSample)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0))

  /** M per-subspace codebooks from a raw sample (normalized, split,
    * Lloyd per subspace). Returns model[sub][code][dim].
    */
  private def codebooksFrom(raw: Array[Seq[Float]]): Array[Array[Array[Double]]] = {
    val sample = raw.map(normalizeLocal)
    Array.tabulate(M) { m =>
      val sub = sample.map(v =>
        java.util.Arrays.copyOfRange(v, m * SubDim, (m + 1) * SubDim))
      lloyd(sub, sub.take(CodebookK), Iters)
    }
  }

  /** Train M codebooks driver-side on the bounded sample. */
  def trainCodebooks(emb: DataFrame): Array[Array[Array[Double]]] =
    codebooksFrom(collectSample(emb))

  /** IVF-routed ADC top-k: encode the corpus in one shuffle-free
    * pass (coarse cell + PQ codes, both native expressions), fan
    * each vector out ONLY to the queries probing its cell, score by
    * a sequential M-lookup fold over the literal distance tables,
    * keep `RerankPool` per query through the bounded heap (the
    * single corpus-wide shuffle), then exactly re-rank that pool by
    * true cosine. At `nprobe` < cells the fine scan shrinks by
    * ~nprobe/cells — the IVF point; at `nprobe` = cells (the
    * registered query) routing is recall-complete and the output is
    * identical to an unrouted ADC scan. Output mirrors the other
    * ANN queries: (qid, vec_id, rank, cosine).
    */
  def ivfpqTopK(emb: DataFrame,
                nprobe: Int = CoarseCells): DataFrame = {
    val s = emb.sparkSession
    graft.functions.CosineSimilarity.register(s)
    graft.functions.TopKByScore.register(s)
    graft.functions.IvfCell.register(s)
    // ONE bounded collect feeds both models: the coarse quantizer
    // (raw space — routing partitions candidates, it needn't see
    // normalized vectors) and the per-subspace codebooks (normalized)
    val raw = collectSample(emb)
    val coarse = lloyd(raw.map(_.map(_.toDouble).toArray),
      raw.take(CoarseCells).map(_.map(_.toDouble).toArray), Iters)
    val model = codebooksFrom(raw)
    // query vectors: NumQueries rows — collected once, reused for
    // the local ADC tables AND the re-rank join's broadcast side
    val qRows = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    // tbl(q)(m)(k) = ||qsub − centroid||²: queries × M × K doubles,
    // computed driver-side with the same sequential fold as codegen
    val tbl = qRows.map { case (_, qe) =>
      val nq = normalizeLocal(qe)
      Array.tabulate(M) { m =>
        Array.tabulate(CodebookK) { k =>
          var d = 0.0; var i = 0
          while (i < SubDim) {
            val t = nq(m * SubDim + i) - model(m)(k)(i); d += t * t; i += 1
          }
          d
        }
      }
    }
    val tblLit = array(tbl.map(q => array(q.map(m =>
      array(m.map(lit(_)): _*)): _*)): _*)
    // coarse routing, driver-side: each query's nprobe nearest cells
    // (same L2-on-raw math as IvfCell; ties → lowest cell), inverted
    // into a cell → probing-qids literal so the corpus side fans out
    // ONLY to interested queries
    val probes: Array[Array[Int]] = qRows.map { case (_, qe) =>
      val v = qe.map(_.toDouble).toArray
      coarse.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy { case (d, i) => (d, i) }.take(nprobe).map(_._2)
    }
    val byCell: Array[Array[Long]] = Array.tabulate(coarse.length)(cell =>
      probes.zipWithIndex.collect {
        case (ps, q) if ps.contains(cell) => q.toLong })
    val probeLit = array(byCell.map(qs =>
      if (qs.isEmpty) array().cast("array<bigint>")
      else array(qs.map(lit(_)): _*)): _*)
    graft.functions.PqEncode.register(s)
    val codes = emb.filter(col("vec_id") >= NumQueries)
      .select(col("vec_id"),
        graft.functions.IvfCell.ivf_cell(col("embedding"), coarse).as("cell"),
        graft.functions.PqEncode.pq_encode(col("embedding"), model).as("codes"))
    // negative distance as the heap score so "closest" is "largest";
    // the M-lookup fold is sequential — deterministic double math
    val negd = -aggregate(sequence(lit(0), lit(M - 1)), lit(0.0),
      (acc, m) => acc + element_at(element_at(
        element_at(tblLit, (col("qid") + 1).cast("int")),
        (m + 1).cast("int")),
        (element_at(col("codes"), (m + 1).cast("int")) + 1).cast("int")))
    val pool = codes
      .select(col("vec_id"), col("codes"),
        explode(element_at(probeLit, col("cell") + 1)).as("qid"))
      .select(col("qid"), col("vec_id"), negd.as("negd"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByScore
        .topk_by_score(col("negd"), col("vec_id"), RerankPool).as("pool"))
      .select(col("qid").cast("long").as("qid"),
        explode(col("pool.id")).as("vec_id"))
    // exact re-rank: broadcast the BOUNDED pool (queries × RerankPool
    // ids) against one more pruned corpus scan — the corpus is never
    // broadcast, shuffled, or scanned with full vectors beyond this
    import s.implicits._
    val qvecs = qRows.toSeq.toDF("qid", "qe")
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("cosine"), asc("vec_id"))
    emb.select(col("vec_id"), col("embedding"))
      .join(broadcast(pool), Seq("vec_id"))
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
