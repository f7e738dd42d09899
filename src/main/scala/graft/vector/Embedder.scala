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

/** Row-local expression serving a PRECOMPUTED text→vector table: the model
  * ran out-of-band; the plan only looks vectors up. Unknown text fails
  * fast — silently falling back to a different embedding family would
  * poison the index (reference parallel: the model is fixed per index,
  * `utils.py:12-23`).
  */
case class LookupEmbed(child: Expression, table: Map[String, Array[Float]], dim: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val v = table.getOrElse(text,
      throw new IllegalArgumentException(
        s"LookupEmbedder has no precomputed vector for text: ${text.take(60)}"))
    new GenericArrayData(v.map(f => f: Any))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lookup_embed"
}

/** Second `Embedder` implementation — proof that the trait boundary admits
  * a REAL model without touching any index/search code: vectors come from
  * a precomputed table (the deployment shape of an external model — an
  * ONNX session, a GPU batch job, or a vendor API produces embeddings
  * out-of-band and the engine serves them by key). The table is a bounded
  * driver artifact of the same class as the IVF centroid / PQ codebook
  * sidecars and ships to executors inside the serialized expression; a
  * per-row in-JVM model (e.g. ONNX Runtime) would implement the SAME two
  * methods with session inference instead of a map lookup.
  */
class LookupEmbedder(table: Map[String, Array[Float]], override val dim: Int)
    extends Embedder {
  require(table.nonEmpty, "LookupEmbedder needs a non-empty text→vector table")
  require(table.values.forall(_.length == dim),
    s"every precomputed vector must have dim=$dim")
  override def embedCol(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      LookupEmbed(org.apache.spark.sql.GraftSqlBridge.expression(text), table, dim))
  override def embedText(text: String): Array[Float] =
    table.getOrElse(text,
      throw new IllegalArgumentException(
        s"LookupEmbedder has no precomputed vector for text: ${text.take(60)}"))
}

object LookupEmbedder {
  /** Build from a keyed DataFrame of (text, embedding) rows — e.g.
    * documents joined to their model-produced vectors. Duplicate texts
    * keep one vector deterministically (first by the frame's order after
    * dropDuplicates). The collect is the bounded-artifact contract: use
    * this for query-side vocabularies and fixtures; a full-corpus model
    * belongs in a per-row Embedder impl, not a lookup table.
    */
  def fromDataFrame(df: org.apache.spark.sql.DataFrame,
      textCol: String = "text", embCol: String = "embedding"): LookupEmbedder = {
    val rows = df.select(textCol, embCol).dropDuplicates(textCol)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toArray)
    val table = rows.toMap
    new LookupEmbedder(table, table.head._2.length)
  }
}

/** Token-pooled sentence embedding: mean of the TOKEN vectors found in a
  * word→vector table, L2-normalized — fastText's `get_sentence_vector` /
  * classic word2vec sentence-averaging, i.e. REAL inference arithmetic
  * (not a per-text lookup), with the model weights being the word-vector
  * table. Out-of-vocabulary tokens are skipped; a text with no known
  * token embeds to the zero vector (callers that must fail instead can
  * pre-filter on vocabulary coverage).
  *
  * Doubles accumulate the sum (the HashingEmbedder pattern) so the result
  * is independent of float-add ordering; tokens pool in text order, which
  * is well-defined and deterministic either way.
  */
case class PooledEmbed(child: Expression, table: Map[String, Array[Float]], dim: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val floats = PooledEmbedder.embed(input.asInstanceOf[UTF8String].toString, table, dim)
    new GenericArrayData(floats.map(f => f: Any))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pooled_embed"
}

/** Third `Embedder` implementation — per-row inference over broadcast
  * model weights, the serving shape one step up from [[LookupEmbedder]]:
  * the word-vector table (a word2vec/fastText/GloVe artifact, or a
  * distilled token-embedding matrix) rides the serialized expression to
  * executors exactly like the IVF centroid sidecar, and every row runs
  * the pooling arithmetic in the JVM — no per-text precomputation, so
  * UNSEEN text embeds fine as long as its tokens are in vocabulary. A
  * transformer ONNX session would slot into the same two methods with the
  * table replaced by session weights; the pooling tier is what's
  * implementable AND verifiable in a dependency-free sandbox.
  */
class PooledEmbedder(table: Map[String, Array[Float]], override val dim: Int)
    extends Embedder {
  require(table.nonEmpty, "PooledEmbedder needs a non-empty word→vector table")
  require(table.values.forall(_.length == dim),
    s"every word vector must have dim=$dim")
  override def embedCol(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PooledEmbed(org.apache.spark.sql.GraftSqlBridge.expression(text), table, dim))
  override def embedText(text: String): Array[Float] =
    PooledEmbedder.embed(text, table, dim)
}

object PooledEmbedder {
  private[vector] def embed(text: String, table: Map[String, Array[Float]],
      dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    var nTok = 0
    var i = 0
    val n = text.length
    while (i < n) {
      var j = i
      while (j < n && text.charAt(j) != ' ') j += 1
      if (j > i) {
        table.get(text.substring(i, j)) match {
          case Some(v) =>
            var d = 0
            while (d < dim) { acc(d) += v(d); d += 1 }
            nTok += 1
          case None => // OOV token: skipped
        }
      }
      i = j + 1
    }
    val out = new Array[Float](dim)
    if (nTok == 0) return out
    var ss = 0.0
    var d = 0
    while (d < dim) { val m = acc(d) / nTok; ss += m * m; d += 1 }
    val norm = if (ss == 0.0) 1.0 else math.sqrt(ss)
    d = 0
    while (d < dim) { out(d) = (acc(d) / nTok / norm).toFloat; d += 1 }
    out
  }

  /** Build from a (word, vector) DataFrame — the word2vec-artifact load
    * path. Vocabulary is a bounded driver artifact (the centroid/codebook
    * class); duplicate words keep one vector deterministically.
    */
  def fromDataFrame(df: org.apache.spark.sql.DataFrame,
      wordCol: String = "word", embCol: String = "embedding"): PooledEmbedder = {
    val rows = df.select(wordCol, embCol).dropDuplicates(wordCol)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toArray)
    val table = rows.toMap
    new PooledEmbedder(table, table.head._2.length)
  }
}
