package graft.sources

/** Transient-IO retry policy for DRIVER-side storage calls — the engine
  * half of the reference connector's retry contract
  * (`clients/ticket_client.py:199-253`: 3 retries, exponential ×2 backoff
  * on 429/5xx, non-retryable errors re-raised immediately).
  *
  * Division of labor with Spark, stated once so call sites don't
  * re-litigate it:
  *
  *  - EXECUTOR-side scan IO (parquet reads inside tasks) is retried by
  *    the engine itself — `spark.task.maxFailures` re-runs a task whose
  *    input stream broke, on another executor if need be. Wrapping a
  *    DataFrame scan here would retry a whole JOB around the engine's
  *    own per-task retry, so we don't.
  *  - DRIVER-side metadata IO (exists/list on index roots, manifest and
  *    sidecar reads) has NO engine retry: one throttled `listStatus`
  *    against object storage (S3 429/503 "Slow Down") fails the query
  *    before any task launches. THAT is the gap this wrapper closes, and
  *    it is the exact analog of the reference's connector policy — its
  *    HTTP 429/5xx are our storage-layer throttle/unavailable responses.
  *
  * Transience test: connect/timeout/reset exceptions and IOExceptions
  * whose messages carry throttle/unavailability markers (429, 503, Slow
  * Down, timed out, connection reset) retry; `FileNotFoundException` and
  * everything else re-raise immediately — a missing index is a real
  * answer, not a flake (the fail-loud posture). After the budget the
  * LAST failure re-raises with the attempt count attached, never a
  * silent downgrade.
  */
object RetryingIO {

  /** 3 retries, 200 ms base, ×2 per attempt, capped — `sleeper` is
    * injectable so the fault-injection spec asserts the schedule without
    * real sleeps.
    */
  final case class RetryPolicy(retries: Int = 3, baseDelayMs: Long = 200L,
      maxDelayMs: Long = 5000L, sleeper: Long => Unit = Thread.sleep)

  // Status codes match only as standalone numbers (no digit on either
  // side): a manifest named v00000429.json or a byte count embedding
  // "...1503 bytes" in a wrapped message must NOT trigger a 3× backoff
  // of a permanent failure (ADVICE r9). Punctuation-delimited 429/503
  // still match — real throttle messages arrive as "HTTP 429:",
  // "(503)", "status=429".
  private val statusCode = java.util.regex.Pattern.compile("(?<!\\d)(429|503)(?!\\d)")

  def defaultTransient(t: Throwable): Boolean = t match {
    case _: java.io.FileNotFoundException => false // a real answer
    case _: java.net.ConnectException => true
    case _: java.net.SocketTimeoutException => true
    case e: java.io.IOException =>
      val m = Option(e.getMessage).getOrElse("").toLowerCase
      statusCode.matcher(m).find() || m.contains("slow down") ||
        m.contains("timed out") || m.contains("connection reset") ||
        m.contains("throttl") || m.contains("service unavailable")
    case _ => false
  }

  /** Run `op`, retrying transient failures per `policy`. `what` names the
    * call in the give-up message (an operator reading its index root, a
    * manifest load).
    */
  def withRetry[T](what: String, policy: RetryPolicy = RetryPolicy(),
      isTransient: Throwable => Boolean = defaultTransient)(op: => T): T = {
    var attempt = 0
    var delay = policy.baseDelayMs
    while (true) {
      try return op
      catch {
        case t: Throwable if isTransient(t) && attempt < policy.retries =>
          attempt += 1
          policy.sleeper(math.min(delay, policy.maxDelayMs))
          delay *= 2
        case t: Throwable if isTransient(t) =>
          throw new java.io.IOException(
            s"$what: still failing after ${policy.retries} retries " +
              s"(exponential backoff from ${policy.baseDelayMs} ms)", t)
      }
    }
    sys.error("unreachable")
  }
}
