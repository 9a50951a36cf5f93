package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: splits a registry query's wall time into
  * (a) DataFrame construction (driver-side operator assembly, any eager
  * training/collect jobs inside the builder), (b) analysis+optimization+
  * physical planning (`queryExecution.executedPlan` forcing), and
  * (c) execution proper (noop sink on the ALREADY-planned frame. AQE
  * re-plans per stage inside (c) — this still bounds how much of the
  * per-rep cost is pure driver planning of the static tree). Usage:
  * PlanCostProbe <name>[,name…] [sfDir] [reps].
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
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
    names.foreach { name =>
      val fn = graft.Queries.benchRegistry(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[cost] $name rep$i build=${(t1 - t0) / 1e9}%.2f " +
          f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
