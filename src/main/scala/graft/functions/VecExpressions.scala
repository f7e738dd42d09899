package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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
