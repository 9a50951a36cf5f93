package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected registry
  * queries so shuffle/pushdown/broadcast behavior can be reviewed
  * (SURVEY.md §4; the 100 TB design gate).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_select", "q_filter_col", "q_groupagg_sum", "q_melt", "q_join3",
      "q_tfidf", "q_dedup_near", "q_pipeline")
    names.foreach { n =>
      println(s"\n======== $n ========")
      Queries.registry(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
