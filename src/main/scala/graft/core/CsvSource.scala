package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** CSV ingest with the reference's schema/trait inference
  * (`/root/reference/src/Data/DataFrame.hs:182-242`).
  *
  * The reference parses each cell as number-or-string and then classifies
  * each column: all-string → `(Text, Dimension, Discrete)`; all-number named
  * exactly `"year"` → `(Number, Dimension, Discrete)`; all-number →
  * `(Number, Measure, Continuous)`; anything with missing/mixed values →
  * runtime error "Invalid data (possibly missing values)"
  * (`DataFrame.hs:211-238`).
  *
  * Spark-side: read everything as strings (header on, RFC-4180 quoting with
  * `""` escapes), profile every column in ONE aggregation pass, apply the
  * rules, cast and attach trait metadata. `strict = false` switches to the
  * lenient mode the reference left commented out (`DataFrame.hs:231-236`):
  * empties become nulls and mixed columns degrade to Text.
  *
  * `detectDates = true` additionally wires the reference's declared-but-
  * disabled Date/Time/DateTime detectors (`DataFrame.hs:207-210` are
  * hard-coded False) using strict ISO formats — an intentional, documented
  * capability upgrade that is OFF by default for parity. Bare time-of-day
  * maps to an epoch-day-anchored `TIMESTAMP_NTZ` carrying the `KTime` trait
  * (Spark's native TIME type is feature-flagged off; a library must not
  * flip session-wide flags).
  */
object CsvSource {

  def load(spark: SparkSession, path: String, strict: Boolean = true,
      detectDates: Boolean = false, multiLine: Boolean = false): KFrame =
    KFrame.fromDataFrame(
      infer(rawStrings(spark, path, multiLine), strict, detectDates))

  /** Read the CSV with every column as a raw string. `multiLine = true`
    * parses quoted cells containing newlines (full RFC 4180) at the cost
    * of unsplittable per-file reads — the default keeps line-splittable
    * scans, which silently breaks embedded-newline cells; flip it when
    * the data has them.
    */
  def rawStrings(spark: SparkSession, path: String,
      multiLine: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .csv(path)

  /** Backtick-quoted column reference: a CSV header may contain dots
    * (which a bare F.col would parse as nested-field access on a flat
    * schema — UNRESOLVED_COLUMN on a valid file) or backticks (escaped
    * by doubling, per the SQL identifier rule).
    */
  private def qc(c: String) = F.col("`" + c.replace("`", "``") + "`")

  /** Apply inference to an all-strings DataFrame (exposed for tests). */
  def infer(raw: DataFrame, strict: Boolean, detectDates: Boolean): DataFrame = {
    val cols = raw.columns.toSeq
    // One aggregation pass computing the per-column profile; the three
    // date/time regex counters are only computed when detectDates asked
    // for them (they were measurable dead work per cell otherwise)
    val profileExprs = cols.zipWithIndex.flatMap { case (c, i) =>
      val v = F.trim(qc(c))
      Seq(
        F.count(F.lit(1)).as(s"t$i"),
        F.count(F.when(qc(c).isNull || v === "", 1)).as(s"e$i"),
        // try_cast, not cast: ANSI mode (Spark 4 default) makes a plain
        // cast throw on the first non-numeric cell instead of profiling it.
        F.count(F.when(
          F.expr(s"try_cast(trim(`${c.replace("`", "``")}`) as double)")
            .isNotNull, 1)).as(s"n$i")) ++
      (if (detectDates) Seq(
        F.count(F.when(v.rlike("^\\d{4}-\\d{2}-\\d{2}$"), 1)).as(s"d$i"),
        F.count(F.when(v.rlike("^\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}$"), 1)).as(s"dt$i"),
        // bare time-of-day; range-checked so the later ANSI cast cannot throw
        F.count(F.when(v.rlike("^([01]\\d|2[0-3]):[0-5]\\d:[0-5]\\d$"), 1)).as(s"tm$i"))
      else Nil)
    }
    val p = raw.agg(profileExprs.head, profileExprs.tail: _*).head()

    val projected = cols.zipWithIndex.map { case (c, i) =>
      val total = p.getAs[Long](s"t$i")
      val empty = p.getAs[Long](s"e$i")
      val num = p.getAs[Long](s"n$i")
      val date = if (detectDates) p.getAs[Long](s"d$i") else 0L
      val datetime = if (detectDates) p.getAs[Long](s"dt$i") else 0L
      val time = if (detectDates) p.getAs[Long](s"tm$i") else 0L
      val nonEmpty = total - empty
      if (strict && empty > 0)
        throw new KevinException("Invalid data (possibly missing values)")
      val allNum = nonEmpty > 0 && num == nonEmpty
      val allDate = detectDates && nonEmpty > 0 && date == nonEmpty
      val allDateTime = detectDates && nonEmpty > 0 && datetime == nonEmpty
      val allTime = detectDates && nonEmpty > 0 && time == nonEmpty
      if (strict && !allNum && !allDate && !allDateTime && !allTime && num > 0)
        throw new KevinException("Invalid data (possibly missing values)")
      val (expr, t) =
        if (allDate)
          (F.to_date(F.trim(qc(c))),
            FieldTraits(KDataType.KDate, DataRole.Dimension, DataInterpretation.Discrete))
        else if (allDateTime)
          (F.to_timestamp(F.regexp_replace(F.trim(qc(c)), "T", " ")),
            FieldTraits(KDataType.KDateTime, DataRole.Dimension, DataInterpretation.Continuous))
        else if (allTime)
          // Time-of-day rides an epoch-day-anchored TIMESTAMP_NTZ (tz-free,
          // parquet/oracle-safe everywhere); the KTime trait drives hh:mm:ss
          // display. Spark 4.1's native TIME type stays behind the
          // spark.sql.timeType.enabled flag, which a library must not flip.
          (F.to_timestamp_ntz(F.concat(F.lit("1970-01-01 "), F.trim(qc(c)))),
            FieldTraits(KDataType.KTime, DataRole.Dimension, DataInterpretation.Continuous))
        else if (allNum && c == "year") // the reference's "year" heuristic (DataFrame.hs:226-228)
          (F.trim(qc(c)).cast("double"), FieldTraits.discreteNumber)
        else if (allNum)
          (F.trim(qc(c)).cast("double"), FieldTraits.measure)
        else
          (qc(c), FieldTraits.text)
      val nulled = F.when(qc(c).isNull || F.trim(qc(c)) === "", F.lit(null)).otherwise(expr)
      (if (empty > 0) nulled else expr).as(c, t.toMetadata())
    }
    raw.select(projected: _*)
  }
}
