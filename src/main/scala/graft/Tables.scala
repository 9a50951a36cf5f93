package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * parquet from it. Reads are plain `spark.read.parquet` so Catalyst's
  * predicate pushdown / column pruning reach the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Footer-inferred schema, cached per path (same JVM-lifetime contract
    * as [[eventsIsNanos]]): `spark.read.parquet` re-infers the schema from
    * the footer on EVERY call, a driver-side read that every registry
    * query pays once per table reference per execution. The first load of
    * a path infers; later loads pass the cached schema explicitly, which
    * skips inference entirely (the production analogue is a catalog table
    * whose schema is metadata, not a per-query footer read). The cache
    * holds schemas only — row data always comes from the parquet scan.
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** The events table's `ts` encoding has varied across driver testdata
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * by default) in some, plain microsecond TIMESTAMP in others. Sniff the
    * footer once per (path) and dispatch:
    *
    *  - micros: a plain scan — pushdown/pruning reach the parquet as-is;
    *  - nanos: read the physical int64 as long and convert with integer
    *    arithmetic (`div 1000` — a double division would lose precision
    *    above 2^53 ns).
    *
    * The nanos handling stays scoped to THAT read — no session conf
    * mutation (round-3 advice item 5). Two pieces make that work:
    *   - an explicit user schema (`ts BIGINT`) skips footer schema
    *     inference, the one step that consults the session-level
    *     `spark.sql.legacy.parquet.nanosAsLong` flag eagerly;
    *   - the flag is passed as a per-read datasource option, which
    *     `newHadoopConfWithOptions` copies into the scan's task-side Hadoop
    *     conf — exactly where the execution-time
    *     `ParquetToSparkSchemaConverter(Configuration)` reads it.
    * Other NANOS parquet reads in the same session are unaffected
    * (proven by a round-trip test in EngineSpec).
    *
    * The sniff itself is one footer read (`spark.read.parquet(...).schema`
    * throws the nanos-unsupported analysis error iff the file is nanos),
    * cached per path so repeated loaders don't re-list.
    */
  private val eventsIsNanos =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val isNanos = eventsIsNanos.computeIfAbsent(path, _ =>
      try { s.read.parquet(path).schema; java.lang.Boolean.FALSE }
      catch {
        case e: Exception
            if e.getMessage != null &&
              e.getMessage.toLowerCase.contains("nanos") =>
          java.lang.Boolean.TRUE
      })
    if (!isNanos) {
      // micros generations carry isAdjustedToUTC=false, which Spark would
      // read as TIMESTAMP_NTZ. The former NTZ→TIMESTAMP cast interpreted
      // the wall clock in the SESSION timezone — correct only because
      // every in-repo entry point pins UTC; a library caller on a
      // non-UTC session got shifted instants. Instead: explicit LTZ
      // schema + the per-read timestampNTZ.enabled=false option (the
      // same task-side Configuration pathway as the nanos branch below),
      // so the file's raw epoch micros land directly in TimestampType —
      // no session-tz interpretation anywhere. No-op when the file is
      // already UTC-adjusted. Timezone independence is test-pinned in
      // EngineSpec.
      val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING"
      s.read.schema(schema)
        .option("spark.sql.parquet.timestampNTZ.enabled", "false")
        .parquet(path)
    } else {
      val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING"
      s.read.schema(schema)
        .option("spark.sql.legacy.parquet.nanosAsLong", "true")
        .parquet(path)
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
