package graft.streaming

import scala.collection.mutable

/** Measurement-only hook: when enabled (by [[graft.StreamProbe]]),
  * [[StreamOps.runStream]] records wall-clock segments and per-batch
  * progress durations here. Disabled (the default) it costs one volatile
  * read per stream run — the bench path is untouched. */
object StreamProbeHook {
  @volatile private var enabled = false
  private val segments = mutable.LinkedHashMap.empty[String, Double]
  private val batches = mutable.ArrayBuffer.empty[String]

  def reset(): Unit = synchronized {
    enabled = true
    segments.clear()
    batches.clear()
  }

  private[streaming] def isOn: Boolean = enabled

  private[streaming] def segment(name: String, ms: Double): Unit =
    if (enabled) synchronized {
      segments.update(name, segments.getOrElse(name, 0.0) + ms)
    }

  private[streaming] def progress(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    if (enabled) synchronized {
      q.recentProgress.foreach { p =>
        val dur = Option(p.durationMs).map(m =>
          m.entrySet().toArray.map { e0 =>
            val e = e0.asInstanceOf[java.util.Map.Entry[String, java.lang.Long]]
            s"${e.getKey}=${e.getValue}"
          }.sorted.mkString(",")).getOrElse("")
        batches += s"[batch ${p.batchId}: rows=${p.numInputRows} $dur]"
      }
    }

  def report(): String = synchronized {
    val segs = segments.map { case (k, v) => f"$k=$v%.0f" }.mkString(" ")
    s"$segs ${batches.mkString(" ")}"
  }
}
