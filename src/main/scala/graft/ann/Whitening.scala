package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whitening projection on top of the exact `embed_gram` moments (#315) —
  * the offline step a quantization / IVF pipeline runs once per corpus
  * version: collect the 2080-cell Gram read-out (constant-size at any SF),
  * form the covariance C = E[xxᵀ] − μμᵀ on the driver, eigen-decompose
  * with cyclic Jacobi (the textbook symmetric-eigen routine — 64×64 is
  * microseconds), and return W = V·Λ^(−1/2)·Vᵀ (ZCA whitening), so that
  * Wᵀ·C·W = I. The DISTRIBUTED work is only the moment pass; the eigen
  * step is O(d³) driver math on a d×d matrix, exactly like the IVF
  * centroid collect — spec-only by design (no SQL oracle for an
  * eigenbasis; the contract Wᵀ·C·W ≈ I is pinned by WhiteningSpec).
  */
object Whitening {

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors as columns).
    */
  def jacobiEigen(aIn: Array[Array[Double]], sweeps: Int = 32)
      : (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > 1e-14) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-18) {
            // 2x2 rotation zeroing a(p)(q) (Golub & Van Loan 8.4)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sN = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sN * akq
              a(k)(q) = sN * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sN * aqk
              a(q)(k) = sN * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sN * vkq
              v(k)(q) = sN * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Assemble the full symmetric E[xxᵀ] matrix from the upper-triangle
    * `embed_gram` read-out rows (i, j, n, gram), 1-indexed.
    */
  def gramMatrix(rows: Seq[(Int, Int, Double)], dim: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](dim, dim)
    rows.foreach { case (i, j, g) => m(i - 1)(j - 1) = g; m(j - 1)(i - 1) = g }
    m
  }

  /** ZCA whitening matrix W = V·diag((λ+eps)^(−1/2))·Vᵀ for covariance
    * C = E[xxᵀ] − μμᵀ. `eps` regularizes near-null directions (a
    * unit-normalized corpus has rank ≤ d−1 in theory).
    */
  def whiteningMatrix(cov: Array[Array[Double]], eps: Double = 1e-9)
      : Array[Array[Double]] = {
    val n = cov.length
    val (lam, v) = jacobiEigen(cov)
    val w = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- 0 until n) {
      var s = 0.0
      var k = 0
      while (k < n) {
        s += v(i)(k) * v(j)(k) / math.sqrt(math.max(lam(k), 0.0) + eps)
        k += 1
      }
      w(i)(j) = s
    }
    w
  }

  /** The full offline whitening model: per-dim mean μ (micro-unit exact),
    * covariance C of the micro-unit-quantized corpus, and W = C^(−1/2).
    * Consumed by `embed_whiten` (#320), which broadcasts μ and W into the
    * distributed matvec.
    */
  final case class WhitenModel(mu: Array[Double], cov: Array[Array[Double]],
      w: Array[Array[Double]])

  /** End-to-end model build: the #315 moment kernel folded to UNROUNDED
    * second moments (exact DECIMAL integer sums → one double divide per
    * cell — `embed_gram`'s round(·,6) read-out is for rendering; feeding
    * it back into W would smear ≤5e-7 per cell through W's ~1/λ_min
    * amplification and show up in the whitened-identity read-out), plus
    * the micro-unit mean pass. Both collects are constant-size (2080 +
    * 64 rows) at any SF.
    */
  def modelOf(s: SparkSession, dir: String): WhitenModel = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val big = DecimalType(38, 0)
    val cellRows = graft.ops.AnalyticsR15
      .gramMomentCells(s, graft.sources.Tables(s, dir, "embeddings"))
      .groupBy("i", "j")
      .agg(sum("n").cast(LongType).as("n"),
        sum(col("sqq").cast(big)).as("sqq"),
        min("dim").as("dmin"), max("dim").as("dmax"))
      .collect()
    require(cellRows.nonEmpty, "empty embedding corpus")
    require(cellRows.forall(r => r.getInt(4) == r.getInt(5)),
      "ragged embedding dims across tasks")
    val gramRows = cellRows.map { r =>
      (r.getLong(0).toInt, r.getLong(1).toInt,
        r.getDecimal(3).doubleValue() / r.getLong(2) / 1e12)
    }
    val dim = gramRows.map(_._2).max
    val ex = gramMatrix(gramRows.toIndexedSeq, dim)
    val mu = meanVector(s, dir, dim)
    val cov = Array.tabulate(dim, dim)((i, j) => ex(i)(j) - mu(i) * mu(j))
    WhitenModel(mu, cov, whiteningMatrix(cov))
  }

  /** (cov, W) of [[modelOf]] — the WhiteningSpec surface. */
  def whiteningOf(s: SparkSession, dir: String): (Array[Array[Double]], Array[Array[Double]]) = {
    val m = modelOf(s, dir)
    (m.cov, m.w)
  }

  /** Per-dimension mean in the same micro-unit quantization as the Gram
    * pass (q = floor(e·10⁶); exact integer sum, one IEEE divide).
    */
  def meanVector(s: SparkSession, dir: String, dim: Int): Array[Double] = {
    val rows = graft.sources.Tables(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("p", "e")))
      .select(col("p"), floor(col("e").cast("double") * 1000000).as("q"))
      .groupBy("p").agg(count(lit(1)).as("n"), sum("q").as("sq"))
      .collect().map(r => (r.getInt(0), r.getLong(2).toDouble / r.getLong(1) / 1e6))
    val mu = new Array[Double](dim)
    rows.foreach { case (p, m) => mu(p) = m }
    mu
  }

  /** Multiply helper for the spec: Wᵀ·C·W (symmetric W, so W·C·W). */
  def sandwich(w: Array[Array[Double]], c: Array[Array[Double]]): Array[Array[Double]] = {
    val n = w.length
    def mul(x: Array[Array[Double]], y: Array[Array[Double]]) =
      Array.tabulate(n, n)((i, j) => (0 until n).map(k => x(i)(k) * y(k)(j)).sum)
    mul(mul(w, c), w)
  }
}
