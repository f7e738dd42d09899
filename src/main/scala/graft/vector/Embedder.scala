package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** Pluggable text-embedding boundary (SURVEY.md §2.11): the reference wraps
  * SentenceTransformer (`utils.py:12-23`, `server.py:81-90`); there is no
  * JVM equivalent in this environment, so the default is deterministic
  * signed feature hashing — same role (text -> fixed-dim float vector, L2
  * normalized so squared-L2 distance and the `1 - d/2` similarity behave
  * like the reference's unit-vector embeddings), fully reproducible, no
  * native deps. Swapping in a real model is one trait implementation.
  *
  * The driver-side (`embedText`) and executor-side (`embedCol`) paths share
  * one algorithm, mirroring how the reference embeds both stored records
  * and incoming queries with the same model.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Executor path: embedding column from a text column. */
  def embedCol(text: Column): Column
  /** Driver path: embed one query string (the §3.1 query-embed step). */
  def embedText(text: String): Array[Float]
}

object HashingEmbedder {
  /** Signed feature hashing over whitespace tokens; java String.hashCode
    * is the hash family (stable across JVMs by spec). One token updates
    * one bucket with ±1; the result is L2-normalized.
    */
  def embed(text: String, dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    var i = 0
    val n = text.length
    while (i < n) {
      var j = i
      while (j < n && text.charAt(j) != ' ') j += 1
      if (j > i) {
        var h = 0
        var k = i
        while (k < j) { h = 31 * h + text.charAt(k); k += 1 }
        val b = ((h % dim) + dim) % dim
        acc(b) += (if (((h >> 16) & 1) == 0) 1.0 else -1.0)
      }
      i = j + 1
    }
    var ss = 0.0
    var d = 0
    while (d < dim) { ss += acc(d) * acc(d); d += 1 }
    val norm = if (ss == 0.0) 1.0 else math.sqrt(ss)
    val out = new Array[Float](dim)
    d = 0
    while (d < dim) { out(d) = (acc(d) / norm).toFloat; d += 1 }
    out
  }
}

/** Catalyst expression wrapping the hashing embedder (CodegenFallback: the
  * per-row work is a string scan; codegen would not change the bound).
  */
case class FeatureHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val floats = HashingEmbedder.embed(input.asInstanceOf[UTF8String].toString, dim)
    new GenericArrayData(floats.map(f => f: Any))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "feature_hash_embed"
}

class HashingEmbedder(override val dim: Int = 64) extends Embedder {
  override def embedCol(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      FeatureHashEmbed(org.apache.spark.sql.GraftSqlBridge.expression(text), dim))
  override def embedText(text: String): Array[Float] = HashingEmbedder.embed(text, dim)
}
