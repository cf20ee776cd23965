package graft

/** Driver-side concurrency for INDEPENDENT Spark jobs (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — actions are only sequential because driver
  * code calls them sequentially. The sweep/strategy cards build N
  * independent arms whose eager actions (localCheckpoints, 1-row cost
  * collects) otherwise serialize N× the per-job scheduling latency and
  * leave the tail of every small stage idle; submitting the arms from a
  * bounded pool lets the next arm's tasks back-fill executors freed by
  * the current arm's stragglers. FIFO scheduling (the default) gives
  * exactly the back-fill behaviour wanted.
  *
  * Correctness contract: `f` must be deterministic and the items
  * independent (no item reads another's output). Results return in
  * INPUT order — `Par.map(xs)(f)` is observationally `xs.map(f)` — so
  * a card's row order, and therefore its oracle hash, cannot change.
  * Exceptions propagate: the first failed item rethrows its cause, the
  * sequential behaviour. Each call owns a private pool (no shared
  * executor: nested Par.map — a card arm that itself builds an index
  * whose scheme derivation Par.maps its sweep — must never deadlock on
  * a shared bounded pool). */
object Par {
  def map[A, B](xs: Seq[A], parallelism: Int = 5)(f: A => B): Seq[B] = {
    if (xs.size <= 1) return xs.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, xs.size))
    try {
      val futs = xs.map(x => pool.submit(() => f(x)))
      futs.map { fu =>
        try fu.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }
}
