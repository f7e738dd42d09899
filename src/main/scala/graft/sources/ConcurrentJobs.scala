package graft.sources

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

/** Run independent Spark actions concurrently from a bounded driver pool
  * (guide §2.6 — actions are only sequential because the driver calls them
  * sequentially; concurrent jobs back-fill each other's task tails, and at
  * gate/build batch sizes the wall is driver-gap-dominated, so overlapping
  * the jobs collapses those gaps). Every task is awaited before return;
  * the first failure rethrows AFTER all complete, so no write is ever
  * abandoned mid-flight. Callers own the ordering contracts: anything
  * crash-ordered (gate-authority-first rules) must stay OUTSIDE a single
  * concurrent group.
  */
object ConcurrentJobs {
  def run(tasks: Seq[() => Unit], parallelism: Int = 3): Unit = {
    if (tasks.isEmpty) return
    if (tasks.size == 1) { tasks.head(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val done = tasks.map(t => Future(t())).map(f => Try(Await.result(f, Duration.Inf)))
      done.foreach(_.get)
    } finally { pool.shutdown(); () }
  }
}
