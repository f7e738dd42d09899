package graft

import org.apache.spark.sql.functions._
import graft.vector.Pca

class PcaSpec extends SparkSpec {

  test("covariance moments: exact microunit sums match a driver-side replay") {
    val emb = Tables.embeddings(spark, sf)
    val got = Pca.covarianceMicro(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_qi"),
          r.getAs[Long]("sum_qj"), r.getAs[Long]("sum_qq"))).toMap
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
    val d = vecs.head.length
    for (i <- 0 until d; j <- i until d) {
      val sqq = vecs.map(v => v(i) * v(j)).sum
      val (n, si, sj, sq) = got((i.toLong, j.toLong))
      assert(n == vecs.length && si == vecs.map(_(i)).sum &&
        sj == vecs.map(_(j)).sum && sq == sqq, s"pair ($i,$j) moments must be exact")
    }
  }

  test("covariance headroom guard: coordinates past the Long product bound fail loud") {
    import spark.implicits._
    // |x| = 1e7 → q = 1e13 → q² = 1e26 ≫ Long range even at n = 1: the
    // guard must raise, never let the microunit sums wrap silently
    val wild = Seq((0L, Seq(1e7f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val ex = intercept[IllegalArgumentException] {
      Pca.covarianceMicro(wild)
    }
    assert(ex.getMessage.contains("overflow"), ex.getMessage)
    // the opt-out path still constructs the plan (callers that pre-bound)
    assert(Pca.covarianceMicro(wild, checkHeadroom = false).columns.nonEmpty)
  }

  test("composition: SQ8 in PCA space stays provably exact; PCA prefix beats the raw prefix") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).localCheckpoint(true)
    val model = Pca.fit(emb)
    val d = model.mean.length
    // full-rank rotation: project to ALL components, feed the SQ exact-band
    // kNN — the banded re-rank bound holds for any input space, so the
    // rotated index must equal brute force in the rotated space
    val rotated = Pca.project(emb, model, d)
      .select(col("vec_id"),
        col("projected").cast("array<float>").as("embedding"))
      .withColumn("label", lit(0))
      .localCheckpoint(true)
    val queries = rotated.filter(col("vec_id") % 501 === 0)
    val got = graft.vector.SqIndex.knnJoin(queries, rotated, k = 5).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"), r.getAs[Long]("c_vec_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_vec_id")).orderBy(col("d2"), col("c_vec_id"))
    val brute = queries.select(col("vec_id").as("q_vec_id"), col("embedding").as("qe"))
      .crossJoin(rotated.select(col("vec_id").as("c_vec_id"), col("embedding").as("ce")))
      .withColumn("d2", graft.functions.VectorFunctions.l2Sq(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("q_vec_id", "rank", "c_vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.sameElements(brute.sorted),
      "the SQ exact band must return brute force in the rotated space too")

    // PCA top-k minimizes MSE over affine rank-k maps; keep-first-k +
    // mean-fill is such a map, so the PCA-prefix reconstruction error is
    // provably <= the raw Matryoshka prefix's
    val k = 8
    val rows = emb.select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble))
    val rawMeans = (0 until d).map(i => rows.map(_(i)).sum / rows.length)
    val rawErr = rows.map { x =>
      (k until d).map(i => { val e = x(i) - rawMeans(i); e * e }).sum
    }.sum
    val proj = Pca.project(emb, model, k).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val byId = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    // reconstruction: x̂ = μ + Σ_c y_c v_c; error = |x − x̂|²
    val pcaErr = byId.map { case (id, x) =>
      val y = proj(id)
      (0 until d).map { i =>
        val xi = x(i).toDouble
        val rec = model.mean(i) + (0 until k).map(c => y(c) * model.components(c)(i)).sum
        val e = xi - rec; e * e
      }.sum
    }.sum
    assert(pcaErr <= rawErr + 1e-6,
      s"PCA prefix must reconstruct at least as well as the raw prefix: $pcaErr vs $rawErr")
  }

  test("covariance plan: partial (map-side) aggregation before the d²-key shuffle") {
    val plan = Pca.covarianceMicro(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    // the d(d+1)/2-key roll-up must combine map-side so the shuffle carries
    // partitions·d² longs, not corpus·d² rows
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"covariance aggregation must be partial+final:\n${plan.take(1500)}")
  }

  test("jacobi eigen: recovers a planted spectrum; deterministic; ordered descending") {
    // A = V diag(λ) Vᵀ with a known orthonormal V (2D rotations embedded in 4D)
    val c = math.cos(0.7); val s = math.sin(0.7)
    val v = Array(
      Array(c, -s, 0.0, 0.0), Array(s, c, 0.0, 0.0),
      Array(0.0, 0.0, c, -s), Array(0.0, 0.0, s, c))
    val lam = Array(9.0, 4.0, 1.0, 0.25)
    val a = Array.tabulate(4, 4)((i, j) =>
      (0 until 4).map(k => v(i)(k) * lam(k) * v(j)(k)).sum)
    val (eig, comps) = Pca.jacobiEigen(a)
    assert(eig.zip(lam).forall { case (e, l) => math.abs(e - l) < 1e-9 },
      s"planted spectrum must be recovered: ${eig.toSeq}")
    assert(eig.sameElements(eig.sortBy(-_)), "eigenvalues must come out descending")
    // eigenvectors match the planted basis up to sign
    comps.zipWithIndex.foreach { case (u, k) =>
      val dot = math.abs((0 until 4).map(i => u(i) * v(i)(k)).sum)
      assert(math.abs(dot - 1.0) < 1e-9, s"component $k must align with the planted axis")
    }
    // bitwise determinism: same input, same output
    val (eig2, comps2) = Pca.jacobiEigen(a.map(_.clone()))
    assert(eig.sameElements(eig2) &&
      comps.zip(comps2).forall { case (x, y) => x.sameElements(y) })
  }

  test("distributed projection equals the single-node reference bitwise; whitening normalizes variance") {
    val emb = Tables.embeddings(spark, sf).localCheckpoint(true)
    val model = Pca.fit(emb)
    assert(model.eigenvalues.sameElements(model.eigenvalues.sortBy(-_)))
    val k = 8
    val got = Pca.project(emb, model, k).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // single-node reference with the IDENTICAL arithmetic: x·v − μ·v,
    // both sums folding left-to-right
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    def dotRef(x: Int => Double, v: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += x(i) * v(i); i += 1 }
      acc
    }
    rows.foreach { case (id, x) =>
      val want = (0 until k).map { c =>
        val vc = model.components(c)
        dotRef(i => x(i).toDouble, vc) - dotRef(model.mean(_), vc)
      }
      assert(got(id) == want, s"projection of $id must match the reference bitwise")
    }
    // variance concentrates in eigen order, and whitening flattens it to ~1
    val proj = rows.map { case (_, x) =>
      (0 until k).map { c =>
        x.indices.foldLeft(0.0)((acc, i) =>
          acc + (x(i).toDouble - model.mean(i)) * model.components(c)(i))
      }
    }
    def variance(vals: Seq[Double]): Double = {
      val m = vals.sum / vals.size
      vals.map(v => (v - m) * (v - m)).sum / vals.size
    }
    val vars = (0 until k).map(c => variance(proj.map(_(c))).toDouble)
    vars.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b - 1e-9, s"projected variance must be non-increasing: $vars")
    }
    vars.zipWithIndex.foreach { case (v, c) =>
      assert(math.abs(v - model.eigenvalues(c)) < 0.05 * (model.eigenvalues(c) + 1e-9),
        s"projected variance must match the eigenvalue (quantization slack): $v vs ${model.eigenvalues(c)}")
    }
    val whitened = Pca.project(emb, model, k, whiten = true).collect()
      .map(_.getSeq[Double](1))
    val wvars = (0 until k).map(c => variance(whitened.map(_(c))))
    wvars.foreach(v => assert(math.abs(v - 1.0) < 0.05,
      s"whitened per-component variance must be ~1: $wvars"))
  }
}
