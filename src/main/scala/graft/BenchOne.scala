package graft

import org.apache.spark.sql.SparkSession

/** Developer tool: time a subset of registry queries by name (cold+warm),
  * without running the whole 99-entry suite. Same session config as
  * [[Bench]] so numbers are comparable.
  *
  * Usage: sbt "runMain graft.BenchOne q_neardup_gate q_append"
  * (sf dir from SPARK_GRAFT_SF_DIR, default sf0.1; repeat count from
  * SPARK_GRAFT_REPS, default 2 — first rep is the cold run).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Queries.benchRegistry.keys.toSeq
    names.foreach { name =>
      Queries.benchRegistry.get(name) match {
        case None => println(s"$name: NOT IN REGISTRY")
        case Some(fn) =>
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"$name: ${times.map(t => f"$t%.3f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
