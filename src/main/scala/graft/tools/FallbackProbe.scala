package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared audit: which expressions in a query's FINAL adaptive plan are
  * `CodegenFallback` — i.e. evaluated interpreted (row-at-a-time
  * reflection) even inside a WholeStageCodegen stage. A graft kernel
  * showing up here means its `doGenCode` stopped being used; a new
  * built-in showing up in a hot path is a 10×-class slowdown at scale
  * that an rc-0 bench at sf0.1 can hide. Consumed by the
  * `CodegenFallbackSpec` pin and the [[FallbackProbe]] diagnostic main.
  */
object FallbackAudit {
  /** Distinct fully-qualified class names of CodegenFallback expressions
    * in the final adaptive plan of an EXECUTED DataFrame (collect first —
    * AQE finalizes the plan on execution).
    */
  def fallbackClasses(df: DataFrame): Set[String] = {
    df.collect()
    val out = collection.mutable.Set[String]()
    def walkE(e: Expression): Unit = {
      if (e.isInstanceOf[CodegenFallback]) out += e.getClass.getName
      e.children.foreach(walkE)
    }
    def walkP(p: SparkPlan): Unit = {
      p.expressions.foreach(walkE)
      p match {
        case q: QueryStageExec => walkP(q.plan)
        case a: AdaptiveSparkPlanExec => walkP(a.executedPlan)
        case _ => ()
      }
      p.subqueries.foreach(walkP)
      p.children.foreach(walkP)
    }
    walkP(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    })
    out.toSet
  }
}

/** Diagnostic main: run every registry query (or a name-regex subset) at
  * a given sf dir with codegen fallback DISABLED (a janino compile
  * failure throws instead of silently interpreting the whole stage) and
  * print the distinct CodegenFallback expression classes per query.
  * Usage: FallbackProbe [sfDir] [nameRegex]
  */
object FallbackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val pat = if (args.length > 1) args(1) else ".*"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.registry.toSeq.sortBy(_._1)
      .filter(_._1.matches(pat)).foreach { case (name, q) =>
        try {
          val fb = FallbackAudit.fallbackClasses(q(spark, sfDir))
          println(s"[fallback] $name: " +
            (if (fb.isEmpty) "-" else fb.toSeq.sorted.mkString(", ")))
        } catch {
          case e: Throwable =>
            println(s"[fallback] $name: EXECUTION FAILED under " +
              s"codegen.fallback=false: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
