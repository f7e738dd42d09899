package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(hash)` over a pre-built Bloom filter, as a native
  * codegen'd Catalyst expression — the runtime-filter primitive for
  * "small-ish set, huge probe stream" joins where the set is too large to
  * broadcast as rows but its Bloom fingerprint is a bounded artifact (the
  * same class as the IVF centroid / PQ codebook sidecars).
  *
  * Guarantee: NO false negatives — a hash that was `putLong` into the
  * filter always returns true — so a bloom pre-filter composed with an
  * exact join downstream preserves exact results; false positives (rate
  * `fpp`) merely ride along to the join and are dropped there.
  *
  * The filter ships to executors as its serialized byte image (a plain
  * `Array[Byte]` field, Java-serialization-friendly) and is deserialized
  * once per JVM via a transient lazy val; generated code calls
  * `mightContainLong` directly — no boxing, stays inside whole-stage
  * codegen.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  @transient lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $ref.bloom().mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContainLong {
  /** Build from a live filter: serialize once on the driver. */
  def fromFilter(child: Expression, bloom: BloomFilter): BloomMightContainLong = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    BloomMightContainLong(child, bos.toByteArray)
  }
}
