package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator-coverage query registry (SURVEY.md §2 checklist).
  *
  * Conventions shared with the DuckDB oracles:
  *  - every aggregate / computed column is aliased identically on both
  *    sides (the driver compare sorts columns by name before hashing);
  *  - double-valued aggregates are wrapped in `round(_, N)` on both sides
  *    so accumulation-order ULP noise cannot flip the hash;
  *  - every query ends in an explicit total order on its key columns.
  */
object Queries {

  /** TPC-H Q1: pricing summary report (scan → filter → agg → sort). */
  def q1_agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1_agg_sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1_agg _)
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1_agg_sql
  )

  /** Headline subset for the bench harness (each run twice; warm time
    * reported). Kept separate from [[registry]] so correctness coverage can
    * grow without inflating the bench run.
    */
  def benchRegistry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1_agg _)
  )
}
