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
  /** The same aggregate as a WINDOW column (KFrame.transform's grouped
    * order-insensitive path). Default `toColumn(...).over(w)` is correct
    * whenever toColumn's top node IS the aggregate; an aggregator that
    * wraps its aggregate in a scalar expression must override — `.over`
    * binds to the TOP expression, and Spark then extracts the inner
    * aggregate into a group-by-less Aggregate node (MISSING_GROUP_BY;
    * found by FuzzChainSpec composing transform(count) into chains).
    */
  def toWindowColumn(field: String, orderCol: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column =
    toColumn(field, orderCol).over(w)
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
    // the double cast must wrap the WINDOW, not sit between the window
    // and the aggregate (see KAggregator.toWindowColumn)
    override def toWindowColumn(field: String, orderCol: Column,
        w: org.apache.spark.sql.expressions.WindowSpec): Column =
      F.count(F.col(field)).over(w).cast("double")
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
    * This list model is REQUIRED only because the closure may be
    * order-sensitive; if the fold is commutative, use
    * [[CustomFoldNumeric]] — bounded memory per group, no list.
    */
  final case class CustomNumeric(f: Seq[Double] => Double) extends KAggregator {
    // struct only when the value is non-null: collect_list skips null
    // entries, so nulls are excluded from the closure's list — matching
    // every other aggregator (a null struct member would otherwise unbox
    // to 0.0 inside the Seq[Double] UDF, silently corrupting the fold)
    private def collected(field: String, orderCol: Column): Column =
      F.collect_list(F.when(F.col(field).isNotNull,
        F.struct(orderCol.as("o"), F.col(field).cast("double").as("v"))))
    private def finish(c: Column): Column =
      F.udf((xs: Seq[Double]) => f(xs)).apply(
        F.transform(F.array_sort(c), x => x.getField("v")))
    def toColumn(field: String, orderCol: Column): Column =
      finish(collected(field, orderCol))
    val numeric = true
    override val orderSensitive = true
  }

  final case class CustomString(f: Seq[String] => String) extends KAggregator {
    // null values skipped, as in CustomNumeric (a null element would
    // reach the user closure and invite an NPE)
    private def collected(field: String, orderCol: Column): Column =
      F.collect_list(F.when(F.col(field).isNotNull,
        F.struct(orderCol.as("o"), F.col(field).as("v"))))
    private def finish(c: Column): Column =
      F.udf((xs: Seq[String]) => f(xs)).apply(
        F.transform(F.array_sort(c), x => x.getField("v")))
    def toColumn(field: String, orderCol: Column): Column =
      finish(collected(field, orderCol))
    val numeric = false
    override val orderSensitive = true
  }

  /** Bounded-memory custom aggregator for ORDER-INSENSITIVE closures
    * (SURVEY §2.12): a true incremental fold compiled through
    * `Aggregator[IN, BUF, OUT]` + `functions.udaf`, so every group carries
    * one fixed-size buffer `B` through partial (map-side) and final
    * aggregation — never a per-group value list. This is the scale path for
    * custom aggregation: [[CustomNumeric]]/[[CustomString]] keep the
    * reference's fold-a-group-list memory model (required for
    * order-sensitive folds) and can OOM on giant groups;
    * a CustomFold cannot.
    *
    * The closure must be a commutative monoid fold — `merge` combines
    * buffers from any two partitions in any order. Nulls are skipped, like
    * every built-in aggregate.
    *
    * IMPORTANT: `step`/`merge` must be PURE — return a new buffer, never
    * mutate their argument. `zero` hands every group the same `zeroBuf`
    * instance (the standard Spark `Aggregator` zero contract), so an
    * in-place-mutating closure (e.g. a mutable Set sketch) would silently
    * accumulate ALL groups into one shared buffer. Use immutable buffer
    * types, as in the example.
    *
    * Example (mean without collect_list):
    * {{{
    * Agg.CustomFoldNumeric[(Double, Long)]((0.0, 0L),
    *   step  = (b, x) => (b._1 + x, b._2 + 1),
    *   merge = (a, b) => (a._1 + b._1, a._2 + b._2),
    *   output = b => if (b._2 == 0) 0.0 else b._1 / b._2)
    * }}}
    */
  final case class CustomFoldNumeric[B](zeroBuf: B, step: (B, Double) => B,
      merge: (B, B) => B, output: B => Double)(
      implicit ct: scala.reflect.ClassTag[B]) extends KAggregator {
    import org.apache.spark.sql.{Encoder, Encoders}
    private val sparkAgg =
      new org.apache.spark.sql.expressions.Aggregator[java.lang.Double, B, Double] {
        def zero: B = zeroBuf
        def reduce(b: B, a: java.lang.Double): B =
          if (a == null) b else step(b, a.doubleValue)
        def merge(b1: B, b2: B): B = CustomFoldNumeric.this.merge(b1, b2)
        def finish(b: B): Double = output(b)
        def bufferEncoder: Encoder[B] =
          Encoders.kryo(ct.runtimeClass.asInstanceOf[Class[B]])
        def outputEncoder: Encoder[Double] = Encoders.scalaDouble
      }
    def toColumn(field: String, orderCol: Column): Column =
      F.udaf(sparkAgg, Encoders.DOUBLE).apply(F.col(field).cast("double"))
    val numeric = true
    // orderSensitive stays false: aggregate/transform take the plain
    // hash-aggregate path — no order materialization, no input sort.
  }

  /** String sibling of [[CustomFoldNumeric]]: bounded-memory incremental
    * fold for ORDER-INSENSITIVE string closures (e.g. lexicographic
    * min/max, sketches over immutable buffers). Same contract:
    * commutative monoid (zero, step, merge, output) with PURE step/merge
    * (see [[CustomFoldNumeric]] — `zero` shares one instance), nulls
    * skipped, one fixed-size buffer per group, no collect_list.
    */
  final case class CustomFoldString[B](zeroBuf: B, step: (B, String) => B,
      merge: (B, B) => B, output: B => String)(
      implicit ct: scala.reflect.ClassTag[B]) extends KAggregator {
    import org.apache.spark.sql.{Encoder, Encoders}
    private val sparkAgg =
      new org.apache.spark.sql.expressions.Aggregator[String, B, String] {
        def zero: B = zeroBuf
        def reduce(b: B, a: String): B = if (a == null) b else step(b, a)
        def merge(b1: B, b2: B): B = CustomFoldString.this.merge(b1, b2)
        def finish(b: B): String = output(b)
        def bufferEncoder: Encoder[B] =
          Encoders.kryo(ct.runtimeClass.asInstanceOf[Class[B]])
        def outputEncoder: Encoder[String] = Encoders.STRING
      }
    def toColumn(field: String, orderCol: Column): Column =
      F.udaf(sparkAgg, Encoders.STRING).apply(F.col(field))
    val numeric = false
  }

  val sum: KAggregator = Sum
  val mean: KAggregator = Mean
  val count: KAggregator = Count
  val variance: KAggregator = Variance
  val sd: KAggregator = Sd
  val concat: KAggregator = Concat
}
