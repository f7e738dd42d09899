package graft.vector

import org.apache.spark.sql.Column

/** Adapter skeleton for a REAL transformer embedder — the last
  * reference-parity gap (`server.py:87-90` loads all-MiniLM-L6-v2 via
  * SentenceTransformer; `utils.py:12-23` embeds with it). This sandbox is
  * zero-egress and `build.sbt` must not grow dependencies, so transformer
  * inference itself cannot run or be validated here; what CAN be real is
  * the deployment seam, and this class is that seam:
  *
  *  - the ONNX Runtime is resolved REFLECTIVELY (`ai.onnxruntime.*`) so
  *    this file compiles with no runtime on the classpath, and a
  *    deployment enables inference by dropping `onnxruntime` on the
  *    executor classpath — no code change, no build change here;
  *  - `availability` reports exactly why inference is off (runtime class
  *    missing vs model file missing) instead of failing deep in a job;
  *  - `loadOrFallback` is the deployment pattern: serve the ONNX model
  *    when present, otherwise the validated [[PooledEmbedder]] (real
  *    pooling arithmetic over a broadcast word-vector table — the
  *    documented fallback) or any other [[Embedder]].
  *
  * Inference contract once a deployment enables it: `tokenize` maps text
  * to model token ids (a real MiniLM needs WordPiece — a deployment
  * concern, supplied as a function), the model runs on (input_ids,
  * attention_mask), and the last hidden state is mean-pooled and
  * L2-normalized — the SentenceTransformer recipe the reference uses.
  * The executor path (`embedCol`) intentionally routes through the same
  * driver-validated `embedText` contract via a per-partition session; it
  * is NOT implemented as a codegen expression because a native-library
  * session handle has no place inside whole-stage codegen.
  */
final class OnnxEmbedder private[graft] (
    val modelPath: String,
    override val dim: Int,
    tokenize: String => Array[Long]) extends Embedder {

  override def embedText(text: String): Array[Float] =
    OnnxEmbedder.availability(modelPath) match {
      case Left(reason) =>
        throw new IllegalStateException(
          s"OnnxEmbedder cannot run inference: $reason. " +
            "Deploy onnxruntime on the classpath and a local model file, " +
            "or use PooledEmbedder (the validated fallback).")
      case Right(()) =>
        OnnxEmbedder.runReflective(modelPath, dim, tokenize(text))
    }

  /** Executor path: availability is re-checked per call site; with the
    * runtime absent this throws the same clear message at plan build time
    * rather than per-row inside a task.
    */
  override def embedCol(text: Column): Column =
    OnnxEmbedder.availability(modelPath) match {
      case Left(reason) =>
        throw new IllegalStateException(
          s"OnnxEmbedder cannot embed a column: $reason. " +
            "Use PooledEmbedder.embedCol as the fallback.")
      case Right(()) =>
        // A deployment implements this as mapPartitions over the text
        // column with one reflective session per partition (the session
        // is a native handle — it must live per-executor, never ship in a
        // closure). Left unimplemented until a runtime exists to test it:
        // shipping untestable per-row native calls would be plumbing
        // theater, and no code path in this repo reaches here (the
        // sandbox always takes the Left branch above).
        throw new UnsupportedOperationException(
          "OnnxEmbedder.embedCol: executor-side ONNX inference requires " +
            "the onnxruntime classpath — wire mapPartitions with a " +
            "per-partition session in the deployment.")
    }
}

object OnnxEmbedder {

  val RuntimeClass = "ai.onnxruntime.OrtEnvironment"

  /** Why inference is unavailable, or Right(()) when the runtime class
    * loads AND the model file exists.
    */
  def availability(modelPath: String): Either[String, Unit] = {
    val runtimeOk =
      try { Class.forName(RuntimeClass); true }
      catch { case _: ClassNotFoundException => false }
    if (!runtimeOk)
      Left(s"ONNX Runtime not on the classpath (missing $RuntimeClass)")
    else if (!new java.io.File(modelPath).isFile)
      Left(s"model file not found at $modelPath")
    else Right(())
  }

  /** Load the adapter if inference can actually run; the Left carries the
    * human-readable reason for logs/ops.
    */
  def load(modelPath: String, dim: Int = 384,
      tokenize: String => Array[Long] = whitespaceIdTokenizer): Either[String, OnnxEmbedder] =
    availability(modelPath).map(_ => new OnnxEmbedder(modelPath, dim, tokenize))

  /** The deployment pattern: ONNX when present, the validated fallback
    * otherwise. Returns the chosen embedder plus the reason when falling
    * back (callers log it once at pipeline start).
    */
  def loadOrFallback(modelPath: String, fallback: Embedder, dim: Int = 384,
      tokenize: String => Array[Long] = whitespaceIdTokenizer): (Embedder, Option[String]) =
    load(modelPath, dim, tokenize) match {
      case Right(e) => (e, None)
      case Left(reason) => (fallback, Some(reason))
    }

  /** Stand-in id tokenizer (hashCode-bucketed whitespace tokens) so the
    * seam is exercisable; a real deployment passes its WordPiece/BPE
    * tokenizer here.
    */
  def whitespaceIdTokenizer(text: String): Array[Long] =
    text.split(' ').filter(_.nonEmpty).map(t => ((t.hashCode % 30000) + 30000L) % 30000L)

  /** One live session per model path per JVM: an OrtSession owns native
    * memory and a loaded graph, so creating one per embedText call would
    * leak native allocations and pay model-load latency per row. Cached
    * sessions live for the JVM (the standard serving posture);
    * `closeSessions` exists for an orderly executor shutdown hook.
    */
  private val sessionCache = new scala.collection.concurrent.TrieMap[String, Object]

  private def sessionFor(modelPath: String): Object =
    sessionCache.getOrElseUpdate(modelPath, {
      val envCls = Class.forName(RuntimeClass)
      val env = envCls.getMethod("getEnvironment").invoke(null)
      envCls.getMethod("createSession", classOf[String]).invoke(env, modelPath)
    })

  /** Close and drop every cached session (deployment shutdown hook). */
  def closeSessions(): Unit =
    sessionCache.keys.foreach { k =>
      sessionCache.remove(k).foreach(s => s.getClass.getMethod("close").invoke(s))
    }

  /** The reflective inference call — compiles with no runtime present;
    * only reachable when `availability` is Right, i.e. never in this
    * sandbox. Mirrors the SentenceTransformer recipe: run the cached
    * session on (input_ids, attention_mask), mean-pool the last hidden
    * state over the sequence axis, L2-normalize. Every native allocation
    * this call creates (the two input tensors and the run result — all
    * AutoCloseable in the real runtime) is closed in `finally`; only the
    * cached session outlives the call.
    */
  private[vector] def runReflective(modelPath: String, dim: Int,
      ids: Array[Long]): Array[Float] = {
    val envCls = Class.forName(RuntimeClass)
    val env = envCls.getMethod("getEnvironment").invoke(null)
    val session = sessionFor(modelPath)
    def closeQuietly(o: Object): Unit =
      if (o != null) try o.getClass.getMethod("close").invoke(o) catch { case _: Exception => () }
    val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
    val create = tensorCls.getMethod("createTensor", envCls, classOf[Object])
    var inputIds: Object = null
    var mask: Object = null
    var result: Object = null
    try {
      inputIds = create.invoke(null, env, Array(ids))
      mask = create.invoke(null, env, Array(ids.map(_ => 1L)))
      val inputs = new java.util.HashMap[String, Object]()
      inputs.put("input_ids", inputIds)
      inputs.put("attention_mask", mask)
      result = session.getClass
        .getMethod("run", classOf[java.util.Map[String, Object]])
        .invoke(session, inputs)
      // last_hidden_state: [1][seq][dim] — mean-pool over seq, L2-normalize
      val first = result.getClass.getMethod("get", classOf[Int]).invoke(result, Integer.valueOf(0))
      val hidden = first.getClass.getMethod("getValue").invoke(first)
        .asInstanceOf[Array[Array[Array[Float]]]](0)
      val acc = new Array[Double](dim)
      hidden.foreach { tok =>
        var d = 0; while (d < dim) { acc(d) += tok(d); d += 1 }
      }
      val n = math.max(1, hidden.length)
      var ss = 0.0
      var d = 0
      while (d < dim) { val m = acc(d) / n; ss += m * m; d += 1 }
      val norm = if (ss == 0.0) 1.0 else math.sqrt(ss)
      val out = new Array[Float](dim)
      d = 0
      while (d < dim) { out(d) = (acc(d) / n / norm).toFloat; d += 1 }
      out
    } finally {
      closeQuietly(result)
      closeQuietly(inputIds)
      closeQuietly(mask)
    }
  }
}
