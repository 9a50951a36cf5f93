package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Scratch: stage-level attribution for a registry query's execution. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q_knn_lsh"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        val tm = si.taskMetrics
        val detail = f"in=${tm.inputMetrics.recordsRead}%d " +
          f"sr=${tm.shuffleReadMetrics.recordsRead}%d " +
          f"sw=${tm.shuffleWriteMetrics.recordsWritten}%d " +
          f"cpu=${tm.executorCpuTime / 1000000}%dms " +
          f"run=${tm.executorRunTime}%dms"
        stages.add((si.stageId, wall, si.numTasks, detail))
      }
    })
    name.split(",").foreach { nm =>
    val fn = graft.Queries.benchRegistry(nm)
    (1 to reps).foreach { rep =>
      jobs = 0; stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      var sum = 0L
      val it = stages.iterator()
      println(f"=== $nm rep$rep wall=$wall%.2fs jobs=$jobs stages=${stages.size}")
      while (it.hasNext) {
        val (id, w, nt, nm) = it.next()
        sum += math.max(w, 0)
        println(f"  stage$id%4d ${w}%5d ms tasks=$nt%3d $nm")
      }
      println(f"  stage-wall-sum=${sum}ms (gaps = driver/AQE planning)")
    }
    }
    spark.stop()
  }
}
