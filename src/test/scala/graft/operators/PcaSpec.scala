package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Pca.jacobiEigen]] against algebraic invariants and a planted
  * structure; [[Features.pcaProject]] end-to-end on a corpus with a
  * known dominant direction.
  */
class PcaJacobiSpec extends AnyFunSuite {

  private def matmulVec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
    m.map(row => row.zip(x).map { case (a, b) => a * b }.sum)

  test("eigenpairs satisfy A v = λ v and vectors are orthonormal") {
    // deterministic symmetric matrix
    val n = 8
    val a = Array.tabulate(n, n)((i, j) =>
      math.sin(i * 3 + j) + math.sin(j * 3 + i)) // symmetric by construction
    val (vals, vecs) = Pca.jacobiEigen(a)
    for (c <- 0 until n) {
      val v = vecs.map(_(c))
      val av = matmulVec(a, v)
      v.indices.foreach(i => assert(math.abs(av(i) - vals(c) * v(i)) < 1e-9,
        s"A v != lambda v at ($i, $c)"))
    }
    for (c1 <- 0 until n; c2 <- c1 until n) {
      val dot = (0 until n).map(i => vecs(i)(c1) * vecs(i)(c2)).sum
      val want = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"orthonormality ($c1, $c2)")
    }
  }

  test("diagonal matrix: eigenvalues are the diagonal") {
    val a = Array.tabulate(4, 4)((i, j) => if (i == j) (i + 1).toDouble else 0.0)
    val (vals, _) = Pca.jacobiEigen(a)
    assert(vals.sorted.sameElements(Array(1.0, 2.0, 3.0, 4.0)))
  }
}

class PcaProjectSpec extends SparkSpec {
  import spark.implicits._

  test("first component captures a planted dominant direction") {
    // vectors = t * u + small noise along a second axis; u is the
    // dominant direction so pc00 must order by t
    val dim = 6
    val u = Array(1.0, 2.0, 0.0, -1.0, 0.5, 0.0).map(_ / math.sqrt(6.25))
    val rows = (0 until 200).map { r =>
      val t = (r % 21) - 10.0 // spread -10..10
      val noise = math.sin(r.toDouble) * 0.01
      val v = Array.tabulate(dim)(i => (t * u(i) + (if (i == 2) noise else 0.0)).toFloat)
      (r.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Features.pcaProject(emb, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // projection onto pc00 must correlate (in absolute value) almost
    // perfectly with t
    val ts = rows.map { case (id, _) => (id % 21) - 10.0 }
    val ps = rows.map { case (id, _) => out(id)._1 }
    val corr = {
      val n = ts.size
      val mt = ts.sum / n; val mp = ps.sum / n
      val cov = ts.zip(ps).map { case (a, b) => (a - mt) * (b - mp) }.sum
      val st = math.sqrt(ts.map(a => (a - mt) * (a - mt)).sum)
      val sp = math.sqrt(ps.map(b => (b - mp) * (b - mp)).sum)
      cov / (st * sp)
    }
    assert(math.abs(corr) > 0.9999, s"pc00 does not track the planted direction: corr=$corr")
    // per-component variance ordering: pc00 explains more than pc01
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v0 = variance(rows.map { case (id, _) => out(id)._1 })
    val v1 = variance(rows.map { case (id, _) => out(id)._2 })
    assert(v0 > v1 * 10, s"component variances not ordered: $v0 vs $v1")
  }

  test("mahalanobis flags a correlated-feature outlier that z-scores miss") {
    // x1 ≈ x2 strongly correlated; the outlier keeps both coordinates
    // within their marginal ranges but BREAKS the correlation —
    // per-axis z-scores see nothing, Mahalanobis must rank it first
    val rows = (0 until 100).map { r =>
      val t = ((r % 21) - 10) / 10.0
      (r.toLong, Seq(t.toFloat, (t + math.sin(r.toDouble) * 0.02).toFloat))
    } :+ (999L, Seq(0.8f, -0.8f)) // in-range marginals, anti-correlated
    val emb = rows.toDF("vec_id", "embedding")
    val scores = Features.mahalanobisScores(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val top = scores.maxBy(_._2)._1
    assert(top == 999L, s"outlier not top-ranked: ${scores.toSeq.sortBy(-_._2).take(3)}")
    // ... and by a wide margin over the inliers
    val second = (scores - 999L).values.max
    assert(scores(999L) > second * 3)
  }

  test("ZCA whitening yields identity covariance on correlated data") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 300).map { r =>
      val t = rnd.nextGaussian(); val u = rnd.nextGaussian()
      val v = rnd.nextGaussian()
      // strongly correlated but FULL-RANK 3-dim data (a rank-deficient
      // covariance has a zero eigenvalue the ridge maps to ~0, not 1 —
      // whitening can only identity-ize the non-degenerate subspace)
      (r.toLong, Seq((t).toFloat, (0.8 * t + 0.2 * u).toFloat,
        (u - t + 0.5 * v).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Features.zcaWhiten(emb).collect()
      .map(r => Array(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val n = out.length
    val mean = Array.tabulate(3)(i => out.map(_(i)).sum / n)
    for (i <- 0 until 3; j <- i until 3) {
      val c = out.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 0.02,
        s"whitened cov($i,$j) = $c, want $want")
    }
  }

  test("projection is deterministic across invocations (sign canon)") {
    val t = graft.catalog.Tables(spark, sf)
    val a = Features.pcaProject(t.embeddings, k = 3).orderBy("vec_id").limit(5).collect()
    val b = Features.pcaProject(t.embeddings, k = 3).orderBy("vec_id").limit(5).collect()
    assert(a.sameElements(b))
  }
}

/** The integer power iteration behind the cross-engine-pinned
  * `pca_power_projection` row: direction agreement with the
  * floating-point Jacobi solve, the fixed-point output contract, and
  * agreement of the shipped projection with the double-precision PCA.
  */
class PcaPowerIterateSpec extends SparkSpec {

  private def e6Matrix(a: Array[Array[Double]]): Array[Array[Long]] =
    a.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong))

  test("power iteration aligns with the Jacobi top eigenvector") {
    // deterministic symmetric PSD matrix with a clear top eigenpair:
    // A = B Bᵀ / n on a fixed pseudo-random B
    val n = 12
    val b = Array.tabulate(n, n)((i, j) => math.sin(i * 7 + j * 3 + 1))
    val a = Array.tabulate(n, n)((i, j) =>
      (0 until n).map(k => b(i)(k) * b(j)(k)).sum / n)
    val v = Pca.powerIterateE6(e6Matrix(a), iters = 16).map(_.toDouble / 1e6)
    val (evals, evecs) = Pca.jacobiEigen(a)
    val top = evals.indices.maxBy(evals)
    val u = evecs.map(_(top))
    val cos = v.zip(u).map { case (x, y) => x * y }.sum /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(u.map(x => x * x).sum))
    assert(math.abs(cos) > 0.9999, s"power vs Jacobi cosine $cos")
  }

  test("fixed-point contract: lead component exactly +1e6, deterministic") {
    val a = Array.tabulate(6, 6)((i, j) =>
      math.cos(i + j) + (if (i == j) 3.0 else 0.0))
    val v1 = Pca.powerIterateE6(e6Matrix(a), iters = 16)
    val v2 = Pca.powerIterateE6(e6Matrix(a), iters = 16)
    assert(v1.sameElements(v2))
    assert(v1.map(math.abs).max == 1000000L)
    val lead = v1.indices.maxBy(i => (math.abs(v1(i)), -i))
    assert(v1(lead) > 0, "sign canonicalization: lead must be positive")
  }

  test("shipped integer projection tracks double-precision PCA on the corpus") {
    val t = graft.catalog.Tables(spark, sf)
    val fx = Features.pcaPowerProjection(t.embeddings).collect()
      .map(r => r.getLong(0) -> (r.getLong(1).toDouble, r.getLong(2).toDouble))
      .toMap
    val dbl = Features.pcaProject(t.embeddings, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ids = fx.keys.toSeq.sorted
    def corr(xs: Seq[Double], ys: Seq[Double]): Double = {
      val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
      xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
        (math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum) *
          math.sqrt(ys.map(y => (y - my) * (y - my)).sum))
    }
    val c1 = corr(ids.map(i => fx(i)._1), ids.map(i => dbl(i)._1))
    assert(math.abs(c1) > 0.999,
      s"integer pc1 disagrees with float PCA: corr=$c1")
    // pc2's convergence is bounded by the λ3/λ2 gap (slower than
    // λ2/λ1 on this near-flat spectrum) — hence the looser bar
    val c2 = corr(ids.map(i => fx(i)._2), ids.map(i => dbl(i)._2))
    assert(math.abs(c2) > 0.995,
      s"integer pc2 disagrees with float PCA: corr=$c2")
  }

  test("deflated power vector is orthogonal to the first") {
    val n = 12
    val b = Array.tabulate(n, n)((i, j) => math.sin(i * 7 + j * 3 + 1))
    val a = Array.tabulate(n, n)((i, j) =>
      (0 until n).map(k => b(i)(k) * b(j)(k)).sum / n)
    val c = e6Matrix(a)
    val v1 = Pca.powerIterateE6(c, iters = 24)
    val v2 = Pca.powerIterateE6(Pca.deflateE6(c, v1), iters = 24)
    val dot = v1.zip(v2).map { case (x, y) => x.toDouble * y }.sum
    val cos = dot / (math.sqrt(v1.map(x => x.toDouble * x).sum) *
      math.sqrt(v2.map(x => x.toDouble * x).sum))
    assert(math.abs(cos) < 0.01, s"v1·v2 cosine $cos — deflation failed")
    // and v2 matches Jacobi's second eigenvector in direction
    val (evals, evecs) = Pca.jacobiEigen(a)
    val order = evals.indices.sortBy(i => -evals(i))
    val u2 = evecs.map(_(order(1)))
    val c2 = v2.map(_.toDouble).zip(u2).map { case (x, y) => x * y }.sum /
      (math.sqrt(v2.map(x => x.toDouble * x).sum) *
        math.sqrt(u2.map(x => x * x).sum))
    assert(math.abs(c2) > 0.999, s"v2 vs Jacobi u2 cosine $c2")
  }

  test("rayleighE6 recovers the eigenvalue, scale-invariant in v") {
    // diag(5, 2) at e6 scale: top eigenvector is e1, λ₁_e6 = 5e6
    val cov = Array(Array(5000000L, 0L), Array(0L, 2000000L))
    val v1 = Pca.powerIterateE6(cov, 32)
    assert(Pca.rayleighE6(cov, v1) == 5000000L)
    // homogeneous of degree 0: any rescale of v gives the same λ
    assert(Pca.rayleighE6(cov, v1.map(_ / 4)) == 5000000L)
    // second eigenpair through the deflated matrix
    val cov2 = Pca.deflateE6(cov, v1)
    val v2 = Pca.powerIterateE6(cov2, 32)
    assert(Pca.rayleighE6(cov2, v2) == 2000000L)
    // degenerate vector: defined as 0, not a crash
    assert(Pca.rayleighE6(cov, Array(0L, 0L)) == 0L)
  }

  test("isqrtFixed: floor sqrt, except the known (s+1)^2-1 one-ulp cycle") {
    for (n <- 0L to 10000L) {
      val s = math.sqrt(n.toDouble).toLong
      val r = Pca.isqrtFixed(n)
      // the fixed-count Newton iteration 2-cycles between s and s+1
      // exactly on n = (s+1)^2 - 1; everywhere else it is floor(sqrt)
      assert(r == s || (r == s + 1 && n == (s + 1) * (s + 1) - 1),
        s"n=$n r=$r floor=$s")
    }
    assert(Pca.isqrtFixed(0L) == 0L)
    assert(Pca.isqrtFixed(64000000L) == 8000L) // lam-scale magnitude
    assert(Pca.isqrtFixed(Long.MaxValue) == 3037000499L) // floor(sqrt(2^63-1))
  }

  test("truncated whitening amplifies the planted off-axis outlier") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val t = rng.nextGaussian()
      (i.toLong, Array(t + rng.nextGaussian() * 0.05,
        t + rng.nextGaussian() * 0.05).map(_.toFloat))
    } :+ (200L, Array(1.5f, -1.5f))
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val top = Features.zcaWhitenPc2E9(df, iters = 32)
      .orderBy(abs(col("w2_e9")).desc, col("vec_id").asc)
      .select("vec_id").head.getLong(0)
    assert(top == 200L, s"expected planted outlier 200, got $top")
  }

  test("truncated Mahalanobis ranks the planted off-axis outlier on top") {
    import org.apache.spark.sql.functions._
    // tight correlated cloud along (1,1)… plus one point breaking the
    // correlation — the outlier axis-aligned z-scores miss
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val t = rng.nextGaussian()
      (i.toLong, Array(t + rng.nextGaussian() * 0.05,
        t + rng.nextGaussian() * 0.05).map(_.toFloat))
    } :+ (200L, Array(1.5f, -1.5f))
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val top = Features.mahalanobisTruncatedE6(df, iters = 32)
      .orderBy(desc("maha2_fx")).select("vec_id").head.getLong(0)
    assert(top == 200L, s"expected planted outlier 200, got $top")
  }
}
