package graft.operators

/** Cyclic Jacobi eigendecomposition for the small SYMMETRIC matrices
  * PCA ships to the driver (dim×dim, dim = embedding width — 64
  * here; cost is O(dim³) per sweep, microseconds at this size).
  * Plain-rotation textbook form: repeatedly zero the largest
  * off-diagonal element until all are below tolerance; the
  * accumulated rotations are the eigenvectors.
  */
object Pca {

  /** Fixed-point scale shared by the cross-engine eigensolve: values
    * carry 6 fractional digits as integers (the covariance relation's
    * `cov_e6` convention).
    */
  val FxScale = 1000000L

  /** Fixed-iteration power method over an INTEGER-scaled covariance
    * matrix, entirely in arbitrary-precision integer arithmetic — so
    * the same algorithm, run from the same `cov_e6` inputs inside a
    * SQL oracle, produces the BIT-IDENTICAL vector. That is the trick
    * that puts a driver-side eigensolve under the cross-engine hash
    * gate (r9 verdict #6): floating-point Jacobi can never be pinned
    * against an engine that evaluates in a different operation order,
    * but integer multiply / compare / truncating-divide have exactly
    * one answer everywhere.
    *
    * Per step: w = C·v (exact), then renormalize to fixed-point via
    * v' = sign(w) · (|w| · 1e6) div max|w| — all operands
    * non-negative at the division, so SQL `//` (floor) and BigInt `/`
    * (truncate) agree. A FIXED iteration count rather than a
    * convergence test keeps the two engines in lockstep even when the
    * eigengap is small: convergence then just means "both computed
    * the same partially-converged vector". Sign is canonicalized
    * (largest-|component|, ties to the lowest index, made positive).
    *
    * Returns the vector scaled by [[FxScale]] (entries in
    * [-1e6, 1e6]; the max-|component| entry is exactly ±1e6).
    */
  def powerIterateE6(covE6: Array[Array[Long]], iters: Int): Array[Long] = {
    val n = covE6.length
    var v = Array.fill(n)(BigInt(FxScale))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(n) { i =>
        (0 until n).map(j => BigInt(covE6(i)(j)) * v(j)).sum
      }
      val m = w.iterator.map(_.abs).max.max(BigInt(1))
      v = w.map(x => BigInt(x.signum) * ((x.abs * FxScale) / m))
    }
    val lead = v.indices.maxBy(i => (v(i).abs, -i))
    val canon = if (v(lead).signum < 0) v.map(-_) else v
    canon.map(_.toLong)
  }

  /** Integer Hotelling deflation: C₂ = C − λ₁·u·uᵀ with
    * λ₁·u_i·u_j expressed scale-invariantly as
    * (vᵀCv)·v_i·v_j / (vᵀv)² — homogeneous of degree 0 in any
    * scaling of v, so the UNNORMALIZED fixed-point vector from
    * [[powerIterateE6]] plugs in directly with no square roots (which
    * could never be replayed exactly in SQL). All products exact
    * (int128-range; HUGEINT on the oracle side, BigInt here), the one
    * division truncating with non-negative operands after a sign
    * split. Power-iterating the result yields the SECOND eigenvector
    * with the same bit-for-bit cross-engine guarantee as the first.
    */
  def deflateE6(covE6: Array[Array[Long]], v: Array[Long]): Array[Array[Long]] = {
    val n = covE6.length
    val vb = v.map(BigInt(_))
    val num = (for (i <- 0 until n; j <- 0 until n)
      yield vb(i) * BigInt(covE6(i)(j)) * vb(j)).sum
    val den = vb.map(x => x * x).sum
    val den2 = den * den
    Array.tabulate(n, n) { (i, j) =>
      val t = num * vb(i) * vb(j)
      val sub =
        if (den2.signum == 0) BigInt(0)
        else BigInt(t.signum) * (t.abs / den2)
      (BigInt(covE6(i)(j)) - sub).toLong
    }
  }

  /** Integer Rayleigh quotient: λ_e6 = (vᵀCv) div (vᵀv) with C at
    * the e6 fixed-point scale — the eigenvalue estimate for the
    * power-iterated vector, in the same exact-integer regime as
    * [[powerIterateE6]]/[[deflateE6]] (scale-invariant in v, one
    * sign-split truncating division) so a SQL oracle replays it
    * bit-for-bit. Feeding the truncated-Mahalanobis ridge term.
    */
  def rayleighE6(covE6: Array[Array[Long]], v: Array[Long]): Long = {
    val n = covE6.length
    val vb = v.map(BigInt(_))
    val num = (for (i <- 0 until n; j <- 0 until n)
      yield vb(i) * BigInt(covE6(i)(j)) * vb(j)).sum
    val den = vb.map(x => x * x).sum
    if (den.signum == 0) 0L
    else (BigInt(num.signum) * (num.abs / den)).toLong
  }

  /** Fixed-iteration integer Newton square root: x₀ = max(n, 1),
    * x' = (x + n div x) div 2, `iters` times — every operand
    * non-negative, every division truncating, so the identical
    * unrolled chain replays in SQL. A FIXED count (like
    * [[powerIterateE6]]) keeps both engines in lockstep even on the
    * n = (s+1)²−1 inputs where the iteration 2-cycles between s and
    * s+1: determinism-by-construction is the contract, floor(√n)
    * exactness is not (the one-ulp ambiguity is identical on both
    * sides). 50 iterations converges from x₀ = n for any n < 2⁶³
    * (≈31 halvings to the √n neighborhood, then quadratic).
    */
  def isqrtFixed(n: Long, iters: Int = 50): Long = {
    require(n >= 0, s"isqrtFixed of negative $n")
    if (n == 0) return 0L // the iteration reaches x=0 and would div/0
    val nb = BigInt(n)
    var x = nb
    for (_ <- 1 to iters) x = (x + nb / x) / 2
    x.toLong
  }

  /** Returns (eigenvalues, eigenvectors-as-columns): `vecs(i)(c)` is
    * component i of eigenvector c, paired with `vals(c)`.
    */
  def jacobiEigen(m: Array[Array[Double]],
                  tol: Double = 1e-12,
                  maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > tol / (n * n)) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- i + 1 until a.length) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** One Jacobi rotation zeroing a(p)(q), applied symmetrically and
    * accumulated into v.
    */
  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
                     p: Int, q: Int): Unit = {
    val n = a.length
    val apq = a(p)(q)
    if (apq == 0.0) return
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    // stable tan computation (Golub & Van Loan)
    val t =
      if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
      else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
    val c = 1.0 / math.sqrt(1.0 + t * t)
    val s = t * c
    var i = 0
    while (i < n) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < n) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      i += 1
    }
    i = 0
    while (i < n) {
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }
}
