package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RetryingIO
import graft.sources.RetryingIO.RetryPolicy

/** Fault injection for the driver-side transient-IO policy — the engine
  * analog of the reference connector's retry contract
  * (`clients/ticket_client.py:199-253`). No SparkSession needed: the
  * policy is storage-agnostic by design.
  */
class RetryingIOSpec extends AnyFunSuite {

  private def flaky(failures: Int, t: => Throwable): () => String = {
    var n = 0
    () => { if (n < failures) { n += 1; throw t }; s"ok after $n failures" }
  }

  test("transient failures retry with exponential x2 backoff, then succeed") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val op = flaky(2, new java.io.IOException("503 Slow Down"))
    val got = RetryingIO.withRetry("spec",
      RetryPolicy(retries = 3, baseDelayMs = 100L, sleeper = delays.append)) { op() }
    assert(got == "ok after 2 failures")
    assert(delays.toSeq == Seq(100L, 200L), "x2 schedule, one sleep per failure")
  }

  test("budget exhaustion re-raises the last failure with the attempt count") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val op = flaky(99, new java.net.SocketTimeoutException("read timed out"))
    val ex = intercept[java.io.IOException] {
      RetryingIO.withRetry("spec",
        RetryPolicy(retries = 3, baseDelayMs = 50L, sleeper = delays.append)) { op() }
    }
    assert(ex.getMessage.contains("after 3 retries"))
    assert(ex.getCause.isInstanceOf[java.net.SocketTimeoutException],
      "the real failure travels as the cause, never swallowed")
    assert(delays.toSeq == Seq(50L, 100L, 200L), "exactly the retry budget slept")
  }

  test("non-transient failures re-raise immediately — a missing file is an answer") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val ex = intercept[java.io.FileNotFoundException] {
      RetryingIO.withRetry("spec",
        RetryPolicy(sleeper = delays.append)) {
        throw new java.io.FileNotFoundException("no such index")
      }
    }
    assert(ex.getMessage == "no such index")
    assert(delays.isEmpty, "no backoff on a non-transient failure")
    // arbitrary exceptions are equally non-transient
    intercept[IllegalStateException] {
      RetryingIO.withRetry("spec", RetryPolicy(sleeper = delays.append)) {
        throw new IllegalStateException("logic bug")
      }
    }
    assert(delays.isEmpty)
  }

  test("transience classifier: throttle/unavailable markers retry, the rest do not") {
    import RetryingIO.defaultTransient
    assert(defaultTransient(new java.io.IOException("HTTP 429 Too Many Requests")))
    assert(defaultTransient(new java.io.IOException("Service Unavailable (503)")))
    assert(defaultTransient(new java.io.IOException("Please reduce your request rate: Slow Down")))
    assert(defaultTransient(new java.io.IOException("Connection reset by peer")))
    assert(defaultTransient(new java.net.ConnectException("refused")))
    assert(!defaultTransient(new java.io.FileNotFoundException("x")))
    assert(!defaultTransient(new java.io.IOException("checksum mismatch")))
    assert(!defaultTransient(new RuntimeException("429"))) // only IO-shaped failures
    // status codes only as standalone numbers — digits embedded in paths,
    // versions, or byte counts are permanent failures, not throttles
    assert(!defaultTransient(new java.io.IOException(
      "cannot parse manifest v00000429.json")))
    assert(!defaultTransient(new java.io.IOException(
      "unexpected EOF after 1503 bytes")))
    assert(!defaultTransient(new java.io.IOException("block 42903 corrupt")))
    assert(defaultTransient(new java.io.IOException("status=429, retry later")))
    assert(defaultTransient(new java.io.IOException("throttled (429)")))
  }

  test("delay cap binds: long budgets never sleep past maxDelayMs") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val op = flaky(5, new java.io.IOException("throttled"))
    RetryingIO.withRetry("spec",
      RetryPolicy(retries = 6, baseDelayMs = 100L, maxDelayMs = 300L,
        sleeper = delays.append)) { op() }
    assert(delays.toSeq == Seq(100L, 200L, 300L, 300L, 300L), "capped schedule")
  }
}
