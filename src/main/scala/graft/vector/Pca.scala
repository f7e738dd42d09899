package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding compression — the rotation stage a vector
  * pipeline runs BEFORE scalar/product quantization (FAISS's
  * `OPQMatrix`/`PCAMatrix` preprocessors): aligning the basis with the
  * covariance eigenvectors concentrates variance in the leading dims, so a
  * Matryoshka-style prefix or a per-dim quantizer wastes no budget on
  * correlated coordinates.
  *
  * Exactness split (the `kmeansStep` discipline):
  *  - the DISTRIBUTED part — second-moment accumulation — is fixed-point:
  *    coordinates quantize to microunits via `floor(x·1e6)` (multiply is
  *    one correctly-rounded IEEE op, floor is exact), and everything that
  *    crosses the shuffle is LONG arithmetic. `covarianceMicro` is
  *    therefore bit-identical in any engine and oracle-bound
  *    (`vec_covariance`).
  *  - the DRIVER part — a d×d cyclic Jacobi eigendecomposition — runs on
  *    the exact sums (d² doubles, a constant-size artifact like centroids
  *    or codebooks), deterministic given its input: fixed sweep order, no
  *    data-dependent pivoting. Spec-pinned against a single-node reference
  *    running the identical arithmetic (`PcaSpec`).
  *
  * Scale shape: the moment pass emits d(d+1)/2 keys per row into a
  * map-side-combined aggregation — the shuffle carries partitions·d²
  * longs, never the corpus; the projection is one map-only pass against
  * literal (μ, V) arrays. The O(d²) per-row moment cost is the honest
  * covariance cost.
  */
object Pca {

  private val Micro = 1000000.0

  private def microCol: Column =
    transform(col("embedding"), x =>
      floor(x.cast("double") * lit(Micro)).cast("long"))

  /** Exact second-moment sums per dimension pair (i ≤ j): one row per pair
    * with (n_rows, Σqᵢ, Σqⱼ, Σqᵢqⱼ) in microunit longs. Every downstream
    * statistic (mean, covariance, correlation) is a driver-side expression
    * over these exact sums. Long headroom: |q| ≤ ~2·10⁶ ⇒ |qᵢqⱼ| ≤ 4·10¹²,
    * times 10⁹ rows ≈ 4·10²¹ would overflow — ENFORCED below (fail-loud,
    * never a silent wrap): one cheap (count, max|x|) pass bounds
    * n · qmax² against Long range before the moment pass runs. Past the
    * bound, raise the quantum or sum per-partition into DECIMAL; at the
    * shipped SFs the products are ≤ ~10¹⁷, comfortably inside Long. The
    * guard is one extra aggregate job at plan-construction time
    * (`checkHeadroom = false` opts out for callers that have already
    * bounded their coordinates).
    */
  def covarianceMicro(embeddings: DataFrame,
      checkHeadroom: Boolean = true): DataFrame = {
    if (checkHeadroom) {
      val r = embeddings.select(count(lit(1)).as("n"),
        max(aggregate(col("embedding"), lit(0.0),
          (a, x) => greatest(a, abs(x.cast("double"))))).as("mx")).head
      val n = r.getLong(0)
      if (n > 0 && !r.isNullAt(1)) {
        val qMax = math.ceil(r.getDouble(1) * Micro) + 1.0
        require(n.toDouble * qMax * qMax <= 9.0e18,
          f"covarianceMicro: $n%d rows at max|coordinate| ${r.getDouble(1)}%.3g " +
            "would overflow the Long microunit product sums — raise the quantum " +
            "or sum into DECIMAL at this scale")
      }
    }
    embeddings.select(microCol.as("q"))
      .select(posexplode(col("q")).as(Seq("dim_i", "qi")), col("q"))
      .select(col("dim_i"), col("qi"),
        posexplode(col("q")).as(Seq("dim_j", "qj")))
      .filter(col("dim_j") >= col("dim_i"))
      .groupBy(col("dim_i").cast("long").as("dim_i"),
        col("dim_j").cast("long").as("dim_j"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("qi")).as("sum_qi"),
        sum(col("qj")).as("sum_qj"),
        sum(col("qi") * col("qj")).as("sum_qq"))
      .orderBy(col("dim_i"), col("dim_j"))
  }

  case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) // components(c) = c-th eigenvector

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — fixed sweep
    * order (upper triangle row-major), threshold convergence, NO
    * data-dependent pivot choice, so the result is a pure function of the
    * input matrix: the spec's single-node reference reproduces it exactly.
    * Returns (eigenvalues, eigenvectors as rows) sorted by eigenvalue
    * descending with an index tie-break.
    */
  def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (d.toLong * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
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
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- i + 1 until a.length) s += a(i)(j) * a(i)(j)
    s
  }

  /** Fit a PCA model: the exact microunit moments aggregate distributed
    * (ONE bounded shuffle), the d×d eigendecomposition runs on the driver.
    */
  def fit(embeddings: DataFrame): PcaModel = {
    val rows = covarianceMicro(embeddings).collect()
    require(rows.nonEmpty, "cannot fit a PCA model on an empty corpus")
    val d = (math.sqrt(8.0 * rows.length + 1) - 1).toInt / 2
    val n = rows.head.getAs[Long]("n_rows").toDouble
    val sumQ = new Array[Double](d)
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getAs[Long]("dim_i").toInt
      val j = r.getAs[Long]("dim_j").toInt
      if (i == j) sumQ(i) = r.getAs[Long]("sum_qi").toDouble
      val c = (r.getAs[Long]("sum_qq").toDouble / n -
        (r.getAs[Long]("sum_qi").toDouble / n) *
          (r.getAs[Long]("sum_qj").toDouble / n)) / (Micro * Micro)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val mean = sumQ.map(_ / n / Micro)
    val (eig, comps) = jacobiEigen(cov)
    PcaModel(mean, eig, comps)
  }

  /** Project embeddings onto the top-`k` components — map-only against the
    * literal component arrays; `whiten = true` additionally scales each
    * coordinate by 1/√λ (unit variance per component, the preprocessing
    * quantizers want).
    *
    * Codegen-friendly by construction (higher-order functions evaluate
    * interpreted — this is a whole-corpus pass): by linearity,
    * (x−μ)·v = x·v − μ·v, the second term a driver-side constant, so each
    * component is a flat 64-term sum of `element_at`·literal products —
    * plain Catalyst expressions inside whole-stage codegen. The sum folds
    * left-to-right over dimensions; the single-node reference in `PcaSpec`
    * reproduces the identical association order bit-for-bit.
    */
  def project(embeddings: DataFrame, model: PcaModel, k: Int,
      whiten: Boolean = false, eps: Double = 1e-9): DataFrame =
    embeddings.select(col("vec_id"), projectCol(model, k, whiten, eps).as("projected"))

  /** [[project]]'s projection as a standalone Column over `input` — the
    * form other operators embed (the OPQ serve kind rotates both the
    * corpus and the query side with it). Same flat codegen'd expression,
    * same left-to-right association.
    */
  def projectCol(model: PcaModel, k: Int, whiten: Boolean = false,
      eps: Double = 1e-9, input: Column = col("embedding")): Column = {
    val d = model.mean.length
    val comps = (0 until k).map { c =>
      val vc = model.components(c)
      val muDotV = (0 until d).foldLeft(0.0)((acc, i) => acc + model.mean(i) * vc(i))
      val xDotV = (0 until d).map { i =>
        element_at(input, i + 1).cast("double") * lit(vc(i))
      }.reduceLeft(_ + _)
      val y = xDotV - lit(muDotV)
      if (whiten) y / lit(math.sqrt(model.eigenvalues(c) max eps)) else y
    }
    array(comps: _*)
  }
}
