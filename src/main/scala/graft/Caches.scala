package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.Dataset

/** Session-scoped registry of the intermediates this library persists.
  *
  * Several operators (the [[graft.operators.Dedup]] family,
  * [[graft.operators.IvfIndex]]) cache shared subtrees — shingle sets,
  * sketches, normalized vectors — because two or more downstream
  * branches read them. Spark only reclaims those cached partitions by
  * LRU eviction or when the ContextCleaner garbage-collects the plan
  * objects, so a long-lived session making repeated library calls
  * accumulates storage that competes with execution memory.
  *
  * Every such persist is therefore routed through [[persist]], and
  * callers that have consumed their results (run the terminal action)
  * should call [[release]] — e.g. once per query in a request loop, as
  * `Bench`/`Verify` do. Releasing is safe even for results not yet
  * consumed: an unpersisted dependency just recomputes on demand.
  */
object Caches {

  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** `ds.persist()` + register the handle for a later [[release]]. */
  def persist[T](ds: Dataset[T]): Dataset[T] = track(ds.persist())

  /** Register an already-persisted handle for a later [[release]]. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    tracked.add(ds)
    ds
  }

  /** Number of handles currently registered (not yet released). */
  def trackedCount: Int = tracked.size()

  /** Unpersist everything registered since the last release
    * (non-blocking: the executors drop blocks asynchronously). */
  def release(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      ds.unpersist(blocking = false)
      ds = tracked.poll()
    }
  }
}
