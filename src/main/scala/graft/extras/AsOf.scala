package graft.extras

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-match) joins — the time-series join Spark lacks as a
  * built-in and a staple of event/feature pipelines. Composed from existing
  * operators per the custom-operator preference order (compose > custom
  * Expression > custom plan): a tagged union + per-key window
  * `last(_, ignoreNulls)` — ONE shuffle on (key, time), no range
  * explosion, no cartesian, skew bounded by the per-key event density.
  *
  * Contrast with the naive formulation (`left JOIN right ON key AND r.ts <=
  * l.ts` + max-per-row), which is a range join that degenerates to a
  * per-key cartesian product; this version scales linearly in
  * |left| + |right|.
  */
object AsOf {

  /** For every left row, attach the latest right row whose `timeCol` is <=
    * the left row's (strictly most recent at-or-before match), per `keyCol`.
    * Right-side value columns arrive null when no right row precedes the
    * left row. Ties on (key, time) between a left and right row resolve to
    * the right row (it "happened first").
    *
    * @param valueCols right-side columns to carry (must not collide with
    *                  left columns)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String]): DataFrame =
    asofCore(left, right, keyCol, timeCol, valueCols, forward = false)

  /** Forward as-of: for every left row, attach the EARLIEST right row
    * whose `timeCol` is >= the left row's (next match at-or-after), per
    * `keyCol` — the "time-to-next-event" / next-purchase direction. Same
    * single-shuffle tagged-union plan as [[asofJoin]], with the window
    * frame and tie order mirrored; a right row at the exact left time
    * matches (inclusive), as in the backward direction.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String]): DataFrame =
    asofCore(left, right, keyCol, timeCol, valueCols, forward = true)

  private def asofCore(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String], forward: Boolean): DataFrame = {
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"value columns collide with left side: $collisions")

    // Tie order makes the equal-time right row land INSIDE the left row's
    // frame in both directions: backward frames end at currentRow, so the
    // right row must sort first; forward frames start at currentRow, so
    // it must sort last.
    val Side = "__asof_side"
    val (leftTag, rightTag) = if (forward) (0, 1) else (1, 0)
    val leftCols = left.columns.toSeq

    val taggedLeft = valueCols.foldLeft(left.withColumn(Side, F.lit(leftTag)))(
      (df, c) => df.withColumn(c, F.lit(null).cast(right.schema(c).dataType)))
    val taggedRight = right.select(
      (Seq(F.col(keyCol), F.col(timeCol), F.lit(rightTag).as(Side)) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => F.lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(F.col)): _*)

    val unioned = taggedLeft.unionByName(taggedRight)
    // final deterministic tie key: two RIGHT rows sharing (key, time)
    // would otherwise order arbitrarily and the attached value could
    // flip across runs/retries; hashing the value columns breaks the tie
    // the same way on every execution (identical values may still tie —
    // harmless, the attached value is then identical too)
    val base = Window.partitionBy(keyCol)
      .orderBy(F.col(timeCol).asc, F.col(Side).asc,
        F.xxhash64(valueCols.map(F.col): _*).asc)
    val w =
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(c,
        (if (forward) F.first(F.col(c), ignoreNulls = true)
         else F.last(F.col(c), ignoreNulls = true)).over(w)))
    filled.filter(F.col(Side) === leftTag).drop(Side)
      .select(leftCols.map(F.col) ++ valueCols.map(F.col): _*)
  }
}
