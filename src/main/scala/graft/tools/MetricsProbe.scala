package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Scratch diagnostic: executes a registry query and prints the final
  * adaptive plan tree with each node's ACCUMULATED SQL metrics (codegen
  * duration, output rows, per-operator times) — the programmatic stand-in
  * for the SQL tab when the UI is off.
  */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.Queries.benchRegistry(name)
    var q: org.apache.spark.sql.DataFrame = null
    (1 to reps).foreach { _ =>
      q = fn(spark, sfDir)
      // execute THIS QueryExecution (collect, not a fresh write
      // execution) so the metrics accumulate on the plan we then walk
      q.collect()
    }
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.toSeq
        .filter { case (_, m) => m.value > 0 }
        .sortBy(_._1)
        .map { case (k, m) =>
          val v = if (m.metricType == "timing" || k.contains("time") ||
            k.contains("duration")) s"${m.value}ms" else m.value.toString
          s"$k=$v"
        }
      println("  " * depth + p.nodeName + " [" +
        interesting.mkString(", ") + "]")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case s: QueryStageExec => walk(s.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    println(s"==== METRICS $name (last rep) ====")
    walk(q.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
