package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) ingestion — the lingua franca of
  * training-corpus interchange (extension scope; the reference ingests
  * CSV only, `SURVEY.md §2.1`). Built on Spark's native JSON datasource:
  * splittable line-per-record scans with an EXPLICIT schema, never
  * inference — at 100 TB schema inference is a full extra pass over the
  * data before the real read, and a drifting upstream field silently
  * changes every downstream type.
  *
  * Malformed-line policy mirrors [[graft.core.CsvSource]]'s strict/lenient
  * split:
  *  - [[readJsonl]] (lenient): malformed lines land whole in a
  *    `_corrupt_json` column (PERMISSIVE mode), parsed fields null — the
  *    pipeline quarantines instead of dying mid-epoch;
  *  - [[readJsonlStrict]]: FAILFAST — any malformed line aborts the read
  *    (ingestion-validation shape).
  */
object JsonlSource {

  val CorruptCol = "_corrupt_json"

  /** Lenient read: `schema` fields plus [[CorruptCol]] capturing each
    * malformed source line verbatim (null for clean rows). Callers split
    * the quarantine with `.filter(col(CorruptCol).isNotNull)` — a pure
    * scan-side predicate. Spark refuses queries that reference ONLY the
    * corrupt column of a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    * — always project at least one real field alongside it.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Strict read: abort on the first malformed line. */
  def readJsonlStrict(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** Clean rows only (malformed lines dropped) — DROPMALFORMED mode, not
    * a filter over the [[readJsonl]] quarantine column: a corrupt-column
    * filter poisons any downstream query that prunes to zero data
    * columns (`count()`, `isEmpty`) with Spark's
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN error, because the scan's required
    * schema reduces to the corrupt column alone. DROPMALFORMED keeps the
    * same clean-row set with no corrupt column in the plan at all.
    */
  def readJsonlClean(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** Write as JSONL (one JSON object per line, the interchange format the
    * readers above consume). Column types map to JSON natively; binary
    * columns are base64'd by Spark's JSON writer.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
