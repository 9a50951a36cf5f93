package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Total shuffle-WRITE bytes of a block of Spark actions, via a task-end
  * listener (round-12 verdict #3: "the currency of 100 TB is bytes
  * crossing exchanges, which wall-time noise masks").
  *
  * Why write-side: every exchange is written exactly once but may be
  * READ many times (AQE retries, ReusedExchange consumers), so write
  * bytes are the stable "how much data crossed the wire" figure — a
  * plan regression that widens a shuffle (lost projection, lost
  * partial-agg, lost broadcast) moves it deterministically, while
  * wall-time needs a 30%+ swing to clear run noise. Bytes wobble only
  * with compression ratios and AQE coalescing — ±few %, so a 2×
  * ceiling pin is safe and tight enough to catch any structural
  * regression (those are 5-100× in practice, e.g. a broadcast join
  * degrading to shuffle).
  *
  * The listener bus is ASYNC: task-end events can trail the blocking
  * action by a beat, so after `body` returns we quiesce-poll the
  * counter until it is stable for 300 ms (bounded at 5 s). Use only
  * from single-threaded harnesses (specs/tools) — concurrent jobs on
  * the same SparkContext would pollute the sum.
  */
object ShuffleMeter {

  /** Run `body`, return (result, totalShuffleWriteBytes). */
  def measure[A](spark: SparkSession)(body: => A): (A, Long) = {
    val bytes = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) bytes.add(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 5000) {
        val cur = bytes.sum()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(100)
        waited += 100
      }
      (r, bytes.sum())
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
