package graft.metrics

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Execution-level throughput/error metrics via the listener bus (north
  * rule: metrics through accumulators AND listeners).
  *
  * The two channels are complementary: `Pipeline.Metrics` accumulators
  * carry OPERATOR-level intent (docs ok/err, spans seen) from inside the
  * extraction code, while this listener observes EXECUTION-level truth
  * (records, bytes, task time, failures) from the scheduler without
  * touching job code — on a real cluster this is the feed for a metrics
  * sink (StatsD/Prometheus), and it keeps working for queries that were
  * never instrumented. All counters are concurrent (listener-bus thread
  * vs reader threads). */
class ThroughputListener extends SparkListener {
  private val recordsRead0 = new LongAdder
  private val bytesRead0 = new LongAdder
  private val recordsWritten0 = new LongAdder
  private val executorRunMs0 = new LongAdder
  private val failedTasks0 = new LongAdder
  private val tasks0 = new LongAdder
  @volatile private var firstLaunch = Long.MaxValue
  @volatile private var lastFinish = 0L

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasks0.increment()
    val info = e.taskInfo
    if (info != null) {
      if (!info.successful) failedTasks0.increment()
      synchronized {
        if (info.launchTime < firstLaunch) firstLaunch = info.launchTime
        if (info.finishTime > lastFinish) lastFinish = info.finishTime
      }
    }
    val m = e.taskMetrics
    if (m != null) {
      recordsRead0.add(m.inputMetrics.recordsRead)
      bytesRead0.add(m.inputMetrics.bytesRead)
      recordsWritten0.add(m.outputMetrics.recordsWritten)
      executorRunMs0.add(m.executorRunTime)
    }
  }

  def tasks: Long = tasks0.sum
  def failedTasks: Long = failedTasks0.sum
  def recordsRead: Long = recordsRead0.sum
  def bytesRead: Long = bytesRead0.sum
  def recordsWritten: Long = recordsWritten0.sum
  def executorRunMs: Long = executorRunMs0.sum
  def wallMs: Long = if (lastFinish > firstLaunch) lastFinish - firstLaunch else 0L
  def recordsPerSec: Double =
    if (wallMs == 0) 0.0 else recordsRead * 1000.0 / wallMs

  /** One-line JSON snapshot for the lineage manifest / metrics sink. */
  def snapshotJson: String =
    s"""{"tasks":$tasks,"failed_tasks":$failedTasks,"records_read":$recordsRead,""" +
      s""""bytes_read":$bytesRead,"records_written":$recordsWritten,""" +
      s""""executor_run_ms":$executorRunMs,"wall_ms":$wallMs}"""
}
