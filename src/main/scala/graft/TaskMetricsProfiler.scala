package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.GraftListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Physical resource profile of a query run, summed over every task
  * between `reset()` and `snapshot()`.
  *
  * Wall time is a noisy scale signal (host drift, GC, neighbors —
  * the whole Bench scaladoc); BYTES are deterministic: the same plan
  * over the same data reads and shuffles the same bytes every run.
  * So the profiler serves two jobs the timers can't:
  *   - ScaleSweep emits shuffle-bytes growth exponents alongside the
  *     time exponents — a noise-free check that a plan's data
  *     movement (not just its wall clock) grows sublinearly. A query
  *     whose time exponent looks fine on a quiet host but whose
  *     shuffle bytes grow at e=2 is a scale bug the time sweep can
  *     miss; the reverse (time drifts, bytes flat) is host noise.
  *   - Bench writes BENCH_PROFILE.json: per-query input/shuffle/spill
  *     bytes at sf0.1, the measured companion to PlanHygieneSpec's
  *     structural allowlist. Spill evidence is the point at 100 TB:
  *     a query spilling at sf0.1 under 32 local cores is guaranteed
  *     to spill on real executors; zero-spill across the suite is the
  *     claim worth committing.
  */
final class TaskMetricsProfiler extends SparkListener {
  private val input = new LongAdder
  private val shuffleRead = new LongAdder
  private val shuffleWrite = new LongAdder
  private val diskSpill = new LongAdder
  private val memSpill = new LongAdder
  private val tasks = new LongAdder

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      input.add(m.inputMetrics.bytesRead)
      shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
      diskSpill.add(m.diskBytesSpilled)
      memSpill.add(m.memoryBytesSpilled)
      tasks.increment()
    }
  }

  def reset(): Unit = {
    input.reset(); shuffleRead.reset(); shuffleWrite.reset()
    diskSpill.reset(); memSpill.reset(); tasks.reset()
  }

  /** Drain the async listener bus, then read the counters. Call with
    * the action already complete; safe outside any timer. */
  def snapshot(spark: SparkSession): TaskMetricsProfiler.Profile = {
    GraftListenerBridge.waitUntilListenerBusEmpty(spark.sparkContext)
    TaskMetricsProfiler.Profile(
      inputBytes = input.sum(),
      shuffleReadBytes = shuffleRead.sum(),
      shuffleWriteBytes = shuffleWrite.sum(),
      diskSpillBytes = diskSpill.sum(),
      memSpillBytes = memSpill.sum(),
      tasks = tasks.sum())
  }
}

object TaskMetricsProfiler {
  final case class Profile(inputBytes: Long, shuffleReadBytes: Long,
      shuffleWriteBytes: Long, diskSpillBytes: Long, memSpillBytes: Long,
      tasks: Long) {
    def json: String =
      s"""{"input":$inputBytes,"shuffle_read":$shuffleReadBytes,""" +
        s""""shuffle_write":$shuffleWriteBytes,"disk_spill":$diskSpillBytes,""" +
        s""""mem_spill":$memSpillBytes,"tasks":$tasks}"""
  }

  /** Register a profiler on the session (once per session). */
  def install(spark: SparkSession): TaskMetricsProfiler = {
    val p = new TaskMetricsProfiler
    spark.sparkContext.addSparkListener(p)
    p
  }
}
