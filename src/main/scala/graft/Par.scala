package graft

/**
 * Driver-side overlap of INDEPENDENT Spark actions (optimization guide
 * §2.6: "actions are only sequential because your driver code calls them
 * sequentially" — Spark's scheduler happily runs several jobs at once and
 * FIFO back-fills executors freed by one job's tail with the next job's
 * tasks). Used by the maintenance/certificate queries, whose bodies chain
 * many small independent actions (build legs, EXCEPT certificates, probe
 * collects) that each block the driver for a full job round-trip.
 *
 * Results are UNCHANGED by construction: each thunk's computation is
 * untouched, values return to their declaration position, and exceptions
 * propagate unwrapped (first failure wins, like sequential code). Safe on
 * shared persisted frames — Spark's BlockManager computes a cached block
 * once under a per-block lock; a second concurrent action blocks on the
 * lock and then reads the cached result.
 */
object Par {

  /** Evaluate two independent thunks concurrently; return both. */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val fb = java.util.concurrent.CompletableFuture.supplyAsync(() => b)
    val ra = a // caller thread does half the work — no pool for the pair
    (ra, join(fb))
  }

  /** Evaluate three independent thunks concurrently; return all three. */
  def all3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fb = java.util.concurrent.CompletableFuture.supplyAsync(() => b)
    val fc = java.util.concurrent.CompletableFuture.supplyAsync(() => c)
    val ra = a
    (ra, join(fb), join(fc))
  }

  /** `Array.tabulate(n)(f)` with the n independent bodies submitted to a
    * bounded thread pool (≤`maxPool` concurrent). Order-deterministic:
    * slot i always holds f(i); exceptions propagate unwrapped so callers
    * keep the sequential error contract. On the first failure the
    * not-yet-started siblings are cancelled (sequential code would never
    * have reached them), and the pool threads are daemons so a wedged
    * thunk cannot block JVM exit. */
  def tabulate[A: scala.reflect.ClassTag](n: Int, maxPool: Int = 8)(f: Int => A): Array[A] =
    if (n <= 1) Array.tabulate(n)(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(n, maxPool),
        (r: Runnable) => { val t = new Thread(r, "graft-par"); t.setDaemon(true); t })
      try {
        val futures = Array.tabulate(n) { i =>
          pool.submit(new java.util.concurrent.Callable[A] { def call(): A = f(i) })
        }
        futures.map { fut =>
          try fut.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              futures.foreach(_.cancel(false)) // queued siblings never start
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }

  private def join[A](f: java.util.concurrent.CompletableFuture[A]): A =
    try f.join()
    catch { case e: java.util.concurrent.CompletionException if e.getCause != null => throw e.getCause }
}
