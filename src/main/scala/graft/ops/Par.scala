package graft.ops

/** Overlap INDEPENDENT Spark actions from driver threads (guide §2.6):
  * actions are only sequential because driver code calls them
  * sequentially, so a commit that must land two or three parquet trees
  * can submit each write from its own thread and let the scheduler
  * back-fill executors freed by one job's straggler tail with the next
  * job's tasks. Wall clock for a commit drops from Σ(writes) toward
  * max(writes).
  *
  * Contract: the thunks must be independent (no thunk reads what another
  * writes) and every shared upstream frame must already be materialized
  * (eager checkpoint or a prior action) — two concurrent jobs racing to
  * materialize one lazy cache duplicate its compute (the r18 SetSimJoin
  * lesson). All threads are joined before returning; the first failure
  * is rethrown after every thread has stopped, so a caller's
  * commit-marker write stays strictly after every tree landed or not at
  * all.
  */
object Par {

  def jobs(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_()); return }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = thunks.map { t =>
      val th = new Thread(() => try t() catch {
        case e: Throwable => errs.add(e): Unit
      })
      th.setDaemon(true)
      th.start()
      th
    }
    ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}
