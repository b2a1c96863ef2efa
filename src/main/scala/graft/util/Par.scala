package graft.util

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-thread concurrency for INDEPENDENT eager query builds
  * (spark_optimization_guide §2.6 — overlap independent jobs): Spark
  * schedules jobs submitted from several driver threads concurrently,
  * so two pair-source builds whose construction materializes eagerly
  * (internal persists, localCheckpoints, guard counts) overlap their
  * stage tails instead of running back to back. Job descriptions and
  * groups are thread-local in Spark, so each side keeps its own
  * labels. Semantics-neutral by construction: both sides compute
  * exactly what the sequential form would.
  */
object Par {
  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** Evaluate `a` and `b` concurrently (`b` on a pool thread, `a` on
    * the calling thread — no starvation, caller's thread-locals
    * preserved for `a`). Rethrows whichever side fails.
    */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val fb = Future(b)
    val ra = a
    (ra, Await.result(fb, Duration.Inf))
  }
}
