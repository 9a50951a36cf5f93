package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-proportionality probe (round-12 verdict #2): run headline
  * queries across the driver's sf0.001 / sf0.01 / sf0.1 dirs and print
  * one JSON line per (query, sf) with warm wall time AND total
  * shuffle-write bytes ([[ShuffleMeter]]) — the two axes a 100×
  * scale-up stresses. Plan structure can prove "no cartesian, no
  * unbounded collect", but only a measured curve shows a stage whose
  * work grows superlinearly (e.g. a candidate-pair blowup inside a
  * legal equi-join). SCALING.md holds the committed table.
  *
  * Usage: ScalingProbe <name>[,name…] [sfDir,sfDir,…] [reps]
  * Each query runs once cold (discarded) then `reps` warm per sf;
  * reported sec is the median, bytes from the LAST warm rep (bytes are
  * stable across reps — same plan, same data).
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    // "all" = the whole bench registry in sorted order (the
    // SHUFFLE_LEDGER.md sweep)
    val names =
      if (args(0) == "all") graft.Queries.benchRegistry.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val sfDirs = (if (args.length > 1) args(1) else
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1")
      .split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sfDirs.foreach { sf =>
      names.foreach { name =>
        val fn = graft.Queries.benchRegistry(name)
        def run(): Unit =
          fn(spark, sf).write.format("noop").mode("overwrite").save()
        run() // cold, discarded
        // wall reps first (ShuffleMeter's quiesce wait must not ride
        // the timing), then ONE extra rep for the byte capture
        val secs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          run()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = secs(secs.size / 2)
        val (_, bytes) = ShuffleMeter.measure(spark)(run())
        println(f"""{"probe":"scaling","q":"$name","sf":"$sf","sec":$med%.3f,"shuffleMB":${bytes / 1e6}%.2f}""")
      }
    }
    spark.stop()
  }
}
