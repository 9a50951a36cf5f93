package graft.extras

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Approximate/sketch aggregates — absent in the reference (SURVEY.md
  * §2.4: "no HLL/approx anywhere") and indispensable at 100 TB, where an
  * exact count-distinct shuffles every distinct value and an exact
  * quantile sorts the world. All are Spark-native sketches (HLL++,
  * Greenwald-Khanna, count-min-style frequent items): single pass,
  * mergeable partials, fixed memory.
  */
object Approx {

  /** HyperLogLog++ distinct count per group (rsd = relative standard
    * deviation, default 5%).
    */
  def countDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame = {
    val agg = F.approx_count_distinct(F.col(valueCol), rsd).as("approx_distinct")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(F.col): _*).agg(agg)
  }

  /** Greenwald-Khanna approximate percentiles in one pass. */
  def quantiles(df: DataFrame, valueCol: String,
      probabilities: Seq[Double] = Seq(0.5, 0.9, 0.99),
      relativeError: Double = 0.01): Map[Double, Double] = {
    val qs = df.stat.approxQuantile(valueCol, probabilities.toArray, relativeError)
    probabilities.zip(qs.toSeq).toMap
  }

  /** Percentile sketch as a column aggregate (usable inside groupBy). */
  def percentileApprox(valueCol: Column, percentage: Double,
      accuracy: Int = 10000): Column =
    F.percentile_approx(valueCol, F.lit(percentage), F.lit(accuracy))

  /** Frequent items (support >= `support` fraction) per column. */
  def frequentItems(df: DataFrame, cols: Seq[String],
      support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)
}
