package graft.federation.sql

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}

import org.apache.spark.TaskContext

/** Remote-statement cancellation watchdog.
  *
  * A killed Spark task only dies when its thread notices: tasks blocked
  * INSIDE a remote engine call never do on their own. Spark's cooperative
  * points don't help here — `InterruptibleIterator` checks at row
  * boundaries (useless before the first row arrives from a slow engine),
  * and thread interrupts are only sent when the kill carries
  * `interruptThread=true` (off by default for job cancellation). Probed
  * live on embedded Derby: `Statement.cancel` is unimplemented
  * (SQLFeatureNotSupportedException), closing the connection from another
  * thread does NOT stop a running query (it ran to completion), but a
  * thread interrupt aborts it within milliseconds ("Connection closed by
  * unknown interrupt"). The DuckDB subprocess equivalent is killing the
  * process, which EOFs the blocked pipe read.
  *
  * So: each executor registers its in-flight remote fetch here; a single
  * daemon thread polls `TaskContext.isInterrupted()` (set by ANY task
  * kill, with or without `interruptThread`) every 100 ms and fires the
  * engine-appropriate cancel action once. Entries deregister on task
  * completion under the entry lock, so a late poll can never cancel into
  * a thread that has moved on to another task.
  */
object RemoteCancel {

  val EnabledKey = "spark.graft.federation.remoteCancel.enabled"

  private final class Entry(val ctx: TaskContext, val onKill: () => Unit) {
    var done = false
    var fired = false
  }

  private val entries = ConcurrentHashMap.newKeySet[Entry]()

  private lazy val poller = {
    val ex = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-remote-cancel")
      t.setDaemon(true)
      t
    }
    ex.scheduleAtFixedRate(() => sweep(), 100, 100, TimeUnit.MILLISECONDS)
    ex
  }

  private def sweep(): Unit = {
    val it = entries.iterator()
    while (it.hasNext) {
      val e = it.next()
      e.synchronized {
        if (!e.done && !e.fired && e.ctx.isInterrupted()) {
          e.fired = true
          try e.onKill() catch { case _: Throwable => () }
        }
      }
      if (e.synchronized(e.done)) it.remove()
    }
  }

  /** Watch the current task; `onKill` runs (once, on the watchdog thread)
    * if the task is killed while the fetch is in flight. Deregisters
    * itself via a task-completion listener. No-op without a task context
    * (driver-side probes). */
  def watch(onKill: () => Unit): Unit = {
    val ctx = TaskContext.get()
    if (ctx == null) return
    poller // start the daemon on first use
    val e = new Entry(ctx, onKill)
    entries.add(e)
    ctx.addTaskCompletionListener[Unit] { _ =>
      e.synchronized {
        e.done = true
        // a cancel that landed as a thread interrupt between the task
        // body ending and this listener must not leak into the thread's
        // next task
        if (e.fired) Thread.interrupted()
      }
      entries.remove(e)
    }
  }
}
