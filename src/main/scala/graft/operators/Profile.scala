package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** One-pass per-column data profiling — the "what did I just ingest"
  * primitive of a training-data pipeline (row/null counts, approximate
  * distinct cardinality, value range, per column). Not a reference
  * surface (KevinLang has no profiler); part of the M8 pipeline-operator
  * extension scope, same family as [[Sketches]].
  *
  * Scale design: ALL requested columns are profiled in ONE aggregation
  * over ONE scan — `count`/`min`/`max` ride the same partial+final
  * aggregate as the bounded KMV sketches ([[Sketches.kmvAggColumn]],
  * ≤ k longs per column per task crossing the exchange), so profiling a
  * 100 TB table costs one pass regardless of how many columns are
  * profiled, and the exchange carries a few hundred bytes per column —
  * never values. The per-column reshape happens on the SINGLE aggregate
  * row (struct array + explode), entirely in the plan: no collect, no
  * second scan. ProfileSpec pins the one-scan shape on the executed plan.
  *
  * Determinism contract (what makes the DuckDB oracle possible):
  * every emitted stat is either integer-exact (`n_rows`, `n_nulls`),
  * a binary-collation extreme cast to string AFTER the typed min/max
  * (`min_value`/`max_value` — exact for integers and ASCII strings in
  * any engine), or the KMV ratio estimate (one correctly-rounded IEEE
  * division — [[Sketches.kmvEstimateCol]]). Float mean/variance are
  * deliberately NOT here: their cross-engine value depends on summation
  * order; that surface lives in the §2 `Agg` battery where groups bound
  * the sums.
  */
object Profile {

  /** Profile `cols` of `df` in one pass: one output row per column —
    * `(col_name, n_rows, n_nulls, est_distinct, min_value, max_value)`.
    * `est_distinct` is the k-minimum-values estimate over the
    * md5-replayable hash domain (exact below k distinct values, ~1/√k
    * relative error above); nulls hash to null and are skipped, so an
    * all-null column profiles as `est_distinct = 0`. `min_value` /
    * `max_value` are the typed extremes rendered as strings (null on an
    * all-null column).
    */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 64,
      hash: Column => Column = Sketches.md5Hash32): DataFrame = {
    require(cols.nonEmpty, "profile: no columns requested")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"profile: unknown column(s) ${missing.mkString(", ")} " +
        s"(have ${df.columns.mkString(", ")})")
    val aggs = F.count(F.lit(1)).as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          F.count(F.col(c)).as(s"__nn$i"),
          Sketches.kmvAggColumn(F.col(c), k, hash).as(s"__kmin$i"),
          F.min(F.col(c)).cast("string").as(s"__min$i"),
          F.max(F.col(c)).cast("string").as(s"__max$i"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      F.struct(
        F.lit(c).as("col_name"),
        F.col("__n").as("n_rows"),
        (F.col("__n") - F.col(s"__nn$i")).as("n_nulls"),
        Sketches.kmvEstimateCol(F.col(s"__kmin$i"), k).as("est_distinct"),
        F.col(s"__min$i").as("min_value"),
        F.col(s"__max$i").as("max_value"))
    }
    one.select(F.explode(F.array(rows: _*)).as("__p")).select("__p.*")
  }
}
