package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector hot path (SURVEY.md §4:
  * "custom Expression for fused L2 distance ... is a perf option").
  *
  * The higher-order-function formulations in VectorFunctions are evaluated
  * interpreted (one closure call per element); at ~millions of pairs x 64
  * dims that dominates the all-pairs similarity scans. These expressions
  * generate a tight primitive loop inside whole-stage codegen instead — no
  * boxing, no per-element virtual calls.
  *
  * Determinism contract (same as the HOF versions, verified equal in
  * SimilaritySpec): each element is widened float->double, then accumulated
  * sequentially left-to-right — bitwise identical to the DuckDB oracle's
  * list_sum fold.
  */
abstract class FloatVecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Java source for one accumulation step given element vars `xa`,`xb`. */
  protected def stepCode(xa: String, xb: String): String
  protected def step(xa: Double, xb: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += step(xs.getFloat(i).toDouble, ys.getFloat(i).toDouble)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xa = (double) $a.getFloat($i);
         |  double xb = (double) $b.getFloat($i);
         |  $acc += ${stepCode("xa", "xb")};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** dot(a, b) over array<float> in float64. */
case class FloatVecDot(left: Expression, right: Expression) extends FloatVecFold {
  override protected def stepCode(xa: String, xb: String): String = s"$xa * $xb"
  override protected def step(xa: Double, xb: Double): Double = xa * xb
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Squared L2 distance over array<float> in float64 (FAISS IndexFlatL2
  * metric, `faiss_manager.py:143`).
  */
case class FloatVecL2Sq(left: Expression, right: Expression) extends FloatVecFold {
  override protected def stepCode(xa: String, xb: String): String = s"($xa - $xb) * ($xa - $xb)"
  override protected def step(xa: Double, xb: Double): Double = (xa - xb) * (xa - xb)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2sq"
}

/** The k nearest centroids of a vector as ONE expression node —
  * array<struct<d: double, cid: long>> in ascending (d, cid) order.
  *
  * The assignment/probe sites used to build nCells SEPARATE
  * `FloatVecL2Sq(col, typedLit(centroid))` subtrees inside
  * `array_sort(array(...))`: correct, but the expression TREE grows
  * linearly with the cell count, and Catalyst pays
  * analysis/optimization/codegen on that tree at EVERY action — the r13
  * resident-curve probe measured the vector ingest gate's wall 2.5× at
  * 100× residents with FLAT read bytes: all of it driver planning over a
  * ~780-literal tree (autoCells grows with the corpus; a gate call plans
  * it in 3–4 separate jobs). Here the centroid matrix is plain object
  * state on a single node — plan size and planning cost are
  * CONSTANT in nCells; evaluation is the same flops in a tight
  * primitive loop.
  *
  * Determinism contract: per-centroid distance accumulates
  * (float→double widened) elementwise left-to-right with the exact
  * [[FloatVecL2Sq]] step, and ordering ties break by cid ascending —
  * bitwise the struct-sort semantics of the literal form it replaces
  * (SimilaritySpec pins equality, ties included). CodegenFallback: the
  * eval IS a compiled primitive loop; generating Java for it would buy
  * nothing and the fallback keeps the node one reference call inside
  * whole-stage codegen.
  */
case class FloatVecNearestCells(child: Expression, cids: Array[Long],
    cents: Array[Array[Float]], k: Int)
  extends UnaryExpression with CodegenFallback {
  require(cids.length == cents.length, "one cid per centroid")
  require(k >= 1, "k must be positive")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = cents.length
    val ds = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cent = cents(c)
      val m = math.min(xs.numElements(), cent.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        val xa = xs.getFloat(i).toDouble
        val xb = cent(i).toDouble
        acc += (xa - xb) * (xa - xb)
        i += 1
      }
      ds(c) = acc
      c += 1
    }
    // total order (d, cid) — TotalOrdering compares doubles like
    // java.lang.Double.compare, the same rule Spark's struct sort uses
    val order = Array.tabulate(n)(identity).sortBy(i => (ds(i), cids(i)))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    var j = 0
    while (j < kk) {
      out(j) = InternalRow(ds(order(j)), cids(order(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "vec_nearest_cells"
}

/** The nBits-plane sign-LSH signature of a vector as ONE expression node —
  * a '0'/'1' string, bit p set iff dot(x, plane_p) ≥ 0.
  *
  * The rpLSH banding sites used to build nBits separate
  * `when(FloatVecDot(col, typedLit(plane)) >= 0, "1")` subtrees under a
  * `concat`: correct, but 64 planes × 64-float literals made the
  * `vec_rplsh_pairs` physical plan 215 KB, and the banding self-join (x/y
  * arms + the bucket-cap anti-join build) replicates that subtree ~4× —
  * Catalyst re-pays analysis/codegen on all of it at every action (the
  * FloatVecNearestCells disease, hyperplane edition). Here the plane
  * matrix is plain object state on a single node; plan size is constant
  * in nBits.
  *
  * Determinism contract: per-plane dot accumulates (float→double widened)
  * elementwise left-to-right with the exact [[FloatVecDot]] step, and the
  * bit is '1' iff the double is ≥ 0 (NaN ⇒ '0', the `when` fall-through)
  * — bitwise the concat-of-when form it replaces (SimilaritySpec pins
  * equality). CodegenFallback for the [[FloatVecNearestCells]] reason: the
  * eval is already a compiled primitive loop.
  */
case class FloatVecSignBits(child: Expression, planes: Array[Array[Float]])
  extends UnaryExpression with CodegenFallback {
  require(planes.nonEmpty, "need at least one hyperplane")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val nb = planes.length
    val bits = new Array[Byte](nb)
    var p = 0
    while (p < nb) {
      val pl = planes(p)
      val m = math.min(xs.numElements(), pl.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        acc += xs.getFloat(i).toDouble * pl(i).toDouble
        i += 1
      }
      bits(p) = if (acc >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(bits)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "vec_sign_bits"
}
