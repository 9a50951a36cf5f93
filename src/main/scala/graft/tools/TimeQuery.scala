package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: time one benchRegistry query under the Bench
  * harness's exact session shape (local[N], N shuffle partitions, noop
  * sink), printing every rep — cold-vs-warm gaps (janino, shuffle-file
  * reuse, artifact caches) are visible per query without a full bench
  * run. Usage: TimeQuery <name>[,name…] [sfDir] [reps] — names run in
  * order, so a cheap warmup query first isolates plan-specific cold cost
  * from fresh-JVM session warmup.
  */
object TimeQuery {
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
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
