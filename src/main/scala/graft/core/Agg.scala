package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Aggregator library — the Spark mapping of the reference's six
  * aggregators (`/root/reference/src/Data/DataFrame/Aggregator.hs:6-24`).
  *
  * All numeric aggregators have RealFloat (double) semantics in the
  * reference; `variance`/`sd` are **population** statistics (mean of squared
  * deviations, no n−1 correction — `Aggregator.hs:15-21`), hence `var_pop`/
  * `stddev_pop` and NOT the `var_samp` Spark defaults. `concat` folds group
  * values **in frame order** (`Aggregator.hs:23-24`), which distributed
  * execution must reproduce with an explicit sort of the collected list.
  */
sealed trait KAggregator {
  /** Build the Spark aggregate expression for `field`, given the column that
    * carries the frame's row order (used only by order-sensitive aggs).
    */
  def toColumn(field: String, orderCol: Column): Column
  /** true if the aggregator consumes numeric input (else string). */
  def numeric: Boolean
  /** true if the result depends on the order of values within a group
    * (concat, custom closures). Order-insensitive aggregators let
    * [[KFrame.aggregate]] skip materializing the frame order entirely —
    * a plain hash aggregate, no sort shuffle.
    */
  def orderSensitive: Boolean = false
}

object Agg {
  case object Sum extends KAggregator {
    def toColumn(field: String, orderCol: Column): Column = F.sum(F.col(field))
    val numeric = true
  }
  case object Mean extends KAggregator {
    def toColumn(field: String, orderCol: Column): Column = F.avg(F.col(field))
    val numeric = true
  }
  /** Numeric-typed count (`Aggregator.hs:12-13` returns RealFloat). */
  case object Count extends KAggregator {
    def toColumn(field: String, orderCol: Column): Column =
      F.count(F.col(field)).cast("double")
    val numeric = true
  }
  case object Variance extends KAggregator {
    def toColumn(field: String, orderCol: Column): Column = F.var_pop(F.col(field))
    val numeric = true
  }
  case object Sd extends KAggregator {
    def toColumn(field: String, orderCol: Column): Column = F.stddev_pop(F.col(field))
    val numeric = true
  }
  /** Order-sensitive string concatenation: collect `(order, value)` structs,
    * sort by order, join — deterministic under any partitioning.
    */
  case object Concat extends KAggregator {
    private def collected(field: String, orderCol: Column): Column =
      F.collect_list(F.struct(orderCol.as("o"), F.col(field).as("v")))
    private def finish(c: Column): Column =
      F.array_join(F.transform(F.array_sort(c), x => x.getField("v")), "")
    def toColumn(field: String, orderCol: Column): Column =
      finish(collected(field, orderCol))
    val numeric = false
    override val orderSensitive = true
  }

  /** Arbitrary user aggregator over the group's values in frame order — the
    * Spark surface for the reference's host-language closures
    * (`/root/reference/src/Data/DataFrame/Combinator.hs:124`). Values of one
    * group are collected to an array (same memory model as the reference,
    * which folds a per-group list); groups themselves stay distributed.
    */
  final case class CustomNumeric(f: Seq[Double] => Double) extends KAggregator {
    private def collected(field: String, orderCol: Column): Column =
      F.collect_list(F.struct(orderCol.as("o"), F.col(field).cast("double").as("v")))
    private def finish(c: Column): Column =
      F.udf((xs: Seq[Double]) => f(xs)).apply(
        F.transform(F.array_sort(c), x => x.getField("v")))
    def toColumn(field: String, orderCol: Column): Column =
      finish(collected(field, orderCol))
    val numeric = true
    override val orderSensitive = true
  }

  final case class CustomString(f: Seq[String] => String) extends KAggregator {
    private def collected(field: String, orderCol: Column): Column =
      F.collect_list(F.struct(orderCol.as("o"), F.col(field).as("v")))
    private def finish(c: Column): Column =
      F.udf((xs: Seq[String]) => f(xs)).apply(
        F.transform(F.array_sort(c), x => x.getField("v")))
    def toColumn(field: String, orderCol: Column): Column =
      finish(collected(field, orderCol))
    val numeric = false
    override val orderSensitive = true
  }

  val sum: KAggregator = Sum
  val mean: KAggregator = Mean
  val count: KAggregator = Count
  val variance: KAggregator = Variance
  val sd: KAggregator = Sd
  val concat: KAggregator = Concat
}
