package graft.operators

/** Overlap INDEPENDENT Spark actions from a small driver thread pool —
  * guide §2.6 ("actions are only sequential because your driver code
  * calls them sequentially"): an index build's artifact writes are
  * independent jobs whose tails leave most cores idle, so submitting
  * them concurrently lets the next write's tasks back-fill executors
  * freed by the current one's stragglers. At bench scale the win is
  * mostly the serialized driver round-trips (job submit → result) that
  * now overlap; at 100 TB it is the stage tails.
  *
  * Callers own independence: jobs must not read what a sibling writes
  * (DedupIndex/IvfPqIndex pass only disjoint-directory writes + sidecar
  * builds whose inputs are materialized or memoized). Shared upstream
  * frames must be MATERIALIZED first (persist + count) or the
  * concurrent first-consumers each compute the subtree — the round-14
  * lazy-cache lesson.
  *
  * Scheduling is the default FIFO (earlier job gets resources first,
  * later ones back-fill — exactly the tail-filling behavior wanted);
  * job descriptions stay correct because they are thread-local. */
private[graft] object ParallelJobs { // graft-wide: operators + streaming

  /** Run every job, each on its own pool thread (pool sized to the job
    * count, capped at 4 — "2-3 jobs in flight is plenty"); waits for ALL
    * to finish, then rethrows the FIRST failure (by submission order)
    * unwrapped. One job degenerates to a plain call. */
  def run(jobs: Seq[() => Unit]): Unit = {
    if (jobs.sizeIs <= 1) { jobs.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(jobs.size, 4))
    try {
      val futs = jobs.map(j => pool.submit(
        new java.util.concurrent.Callable[Unit] { def call(): Unit = j() }))
      var firstFailure: Option[Throwable] = None
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty)
              firstFailure = Some(Option(e.getCause).getOrElse(e))
        }
      }
      firstFailure.foreach(throw _)
    } finally { pool.shutdown(); () }
  }
}
