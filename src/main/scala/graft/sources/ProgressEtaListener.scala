package graft.sources

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** K6 progress bar + ETA (SyncCommandBase.php:61-66,203-221;
  * TicketPublisher.php:37,77-83) as a SparkListener — the scale path
  * COVERAGE.md promises: the reference computes ETA = elapsed /
  * pagesProcessed x pagesRemaining on its page loop; here pages are tasks,
  * and the same estimate runs cluster-wide with zero touch on the data
  * plane. `formatEta` is X17's HH:MM:SS floor/mod rendering.
  */
final class ProgressEtaListener(clock: () => Long = () => System.currentTimeMillis())
    extends SparkListener {

  private val started = new AtomicLong(clock())
  private val total = new AtomicInteger(0)
  private val done = new AtomicInteger(0)

  private[graft] def recordStage(numTasks: Int): Unit = total.addAndGet(numTasks)
  private[graft] def recordTask(): Unit = done.incrementAndGet()

  override def onStageSubmitted(stage: SparkListenerStageSubmitted): Unit =
    recordStage(stage.stageInfo.numTasks)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
    // failed/killed/speculative-duplicate attempts are not progress
    if (taskEnd.reason == org.apache.spark.Success) recordTask()

  def progress: (Int, Int) = (done.get(), total.get())

  /** Remaining-time estimate in millis (None until the first task lands). */
  def etaMillis: Option[Long] = {
    val d = done.get(); val t = total.get()
    if (d == 0 || t <= d) None
    else Some((clock() - started.get()) * (t - d) / d)
  }

  /** X17 (SB:217-220): seconds -> HH:MM:SS via floor/mod. */
  def formatEta: String = etaMillis match {
    case None => "--:--:--"
    case Some(ms) =>
      val s = ms / 1000
      f"${s / 3600}%02d:${s % 3600 / 60}%02d:${s % 60}%02d"
  }
}
