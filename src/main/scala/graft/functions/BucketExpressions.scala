package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `bucket_idx(value)` against a sorted cutpoint array: the number of
  * cutpoints ≤ value — i.e. the rank bucket the value falls in, in
  * [0, cutpoints.length]. A codegen'd binary search over a driver-built
  * artifact (quantile cutpoints), replacing what would otherwise be a
  * 2^bits-branch CASE WHEN chain (which falls out of whole-stage codegen
  * at that width) or an O(2^bits) per-row higher-order-function fold.
  *
  * Ties: a value equal to a cutpoint lands in the HIGHER bucket
  * (`count(cut <= v)`), so runs of one heavy-hitter value share a single
  * bucket — the property the skew-robust z-order layout relies on.
  */
case class BucketIdx(child: Expression, cutpoints: Array[Double])
    extends UnaryExpression {
  require(cutpoints.nonEmpty, "bucket_idx needs at least one cutpoint")

  override def dataType: DataType = LongType

  /** Insertion point of v in the sorted cutpoints, counting equal
    * cutpoints as passed.
    */
  def bucketOf(v: Double): Long = {
    var lo = 0
    var hi = cutpoints.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cutpoints(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override def nullSafeEval(input: Any): Any =
    bucketOf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketIdx", this, classOf[BucketIdx].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.bucketOf($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bucket_idx"
}
