package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scratch diagnostic: executes a registry query and prints the FINAL
  * adaptive physical plan (post-AQE), where runtime exchange/stage reuse is
  * visible — the static explain shows the pre-AQE plan with duplicated
  * subtrees that AQE's stage cache may dedup at runtime.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val q = graft.Queries.registry(args(0))(spark, d)
    q.collect() // execute THIS QueryExecution so AQE finalizes its plan
    val plan = q.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println("==== FINAL ADAPTIVE PLAN ====")
    println(finalPlan.toString)
    spark.stop()
  }
}
