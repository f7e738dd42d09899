package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity as Catalyst higher-order-function expressions
  * (SURVEY.md §2.9 "L2 distance", §2.11). The reference delegates these to
  * FAISS C++ (`faiss_manager.py:275`); here they are declarative Column
  * expressions so Catalyst can pipeline them inside the scan stage — no UDF
  * serialization boundary, no driver-side loop.
  *
  * Determinism contract: every fold is a sequential left-to-right float64
  * accumulation, which matches both DuckDB's `list_sum` (verified bitwise)
  * and any single-pass SIMD-free C loop — so oracle hashes line up exactly.
  */
object VectorFunctions {

  /** Elementwise-product fold: dot(a, b) in float64, as a codegen'd native
    * expression (FloatVecDot).
    */
  private def toExpr(c: Column) = org.apache.spark.sql.GraftSqlBridge.expression(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  def dot(a: Column, b: Column): Column = toCol(FloatVecDot(toExpr(a), toExpr(b)))

  /** Squared L2 distance — the FAISS IndexFlatL2 metric (squared, not
    * rooted: `faiss_manager.py:143`; the verbatim `1 - d/2` similarity in
    * `utils.py:105` depends on it staying squared). Codegen'd native
    * expression (FloatVecL2Sq).
    */
  def l2Sq(a: Column, b: Column): Column = toCol(FloatVecL2Sq(toExpr(a), toExpr(b)))

  /** The k nearest centroids as array<struct<d, cid>> in (d, cid) order —
    * one [[FloatVecNearestCells]] node whose plan cost is CONSTANT in the
    * centroid count (vs the nCells-literal `array_sort(array(...))` form
    * it replaces on every assignment/probe site; bitwise-equal results,
    * SimilaritySpec-pinned).
    */
  def nearestCells(emb: Column, cents: Seq[(Long, Seq[Float])], k: Int): Column =
    toCol(FloatVecNearestCells(toExpr(emb),
      cents.map(_._1).toArray, cents.map(_._2.toArray).toArray, k))

  /** Nearest-centroid cid — the map-only argmin assignment column. */
  def nearestCellCid(emb: Column, cents: Seq[(Long, Seq[Float])]): Column =
    element_at(nearestCells(emb, cents, 1), 1).getField("cid")

  /** Distance to the nearest centroid (squared L2). */
  def nearestCellDistSq(emb: Column, cents: Seq[(Long, Seq[Float])]): Column =
    element_at(nearestCells(emb, cents, 1), 1).getField("d")

  /** The k nearest cids in probe order — the multi-probe cell list. */
  def orderedCellCids(emb: Column, cents: Seq[(Long, Seq[Float])], k: Int): Column =
    transform(nearestCells(emb, cents, k), x => x.getField("cid"))

  /** The sign-LSH signature string ('0'/'1' per hyperplane) as one
    * [[FloatVecSignBits]] node — constant plan cost in the plane count (vs
    * the nBits-literal concat-of-when form it replaces; bitwise-equal
    * output, SimilaritySpec-pinned).
    */
  def signBits(emb: Column, planes: Seq[Seq[Float]]): Column =
    toCol(FloatVecSignBits(toExpr(emb), planes.map(_.toArray).toArray))

  /** Higher-order-function twins of dot/l2Sq — the compose-built-ins
    * formulation (SURVEY §2.9). Kept as the semantics reference: specs
    * assert the native expressions produce bitwise-equal results.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity dot/(|a||b|) in float64. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Reference similarity formula, kept verbatim (`utils.py:105`): only a
    * true cosine for unit vectors and squared-L2 distances — output parity
    * beats mathematical purity here.
    */
  def faissSimilarity(distSq: Column): Column = lit(1.0) - distSq / 2.0
}
