package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Storage-layout helpers for scale: bucketing (co-located, shuffle-free
  * joins) and partitioned writes (partition-pruned scans). These are the
  * two layout levers a 100 TB deployment pulls before any join tuning:
  *
  *  - two tables bucketed by the same key into the same bucket count join
  *    with NO exchange on either side — the shuffle happened once at write
  *    time and is amortized over every subsequent join;
  *  - a filter on a partition column prunes entire directories at planning
  *    time (`PartitionFilters` in the scan, no I/O for pruned partitions).
  */
object Layout {

  /** Write `df` as a bucketed+sorted catalog table. Bucket metadata lives
    * in the session catalog; joins between tables bucketed on the same
    * keys with the same `numBuckets` skip the exchange entirely.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int = 8): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Inner join of two same-bucketing catalog tables on the bucket keys.
    * With matching bucket specs the plan contains no Exchange on either
    * side (asserted in tests).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Write `df` partitioned by the given columns (directory-per-value
    * layout). Readers filtering on partition columns scan only matching
    * directories.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Derive a low-cardinality date partition column from a timestamp —
    * the standard event-log layout (partition by day, prune by day).
    */
  def withDatePartition(df: DataFrame, tsCol: String,
      partCol: String = "p_date"): DataFrame =
    df.withColumn(partCol, F.to_date(F.col(tsCol)))
}
