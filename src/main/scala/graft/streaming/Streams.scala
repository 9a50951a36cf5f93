package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming surface over the `events` table shape — extension
  * scope (SURVEY.md §7.2 M8; the reference has no streaming at all,
  * SURVEY.md §2.8).
  *
  * Every transform here is written against a plain DataFrame so the SAME
  * code runs in batch mode (for the DuckDB-oracle correctness gate) and
  * under `readStream` (incremental micro-batches) — the Spark-idiomatic
  * "unified batch/streaming" contract. Watermarks bound state; windowed
  * aggregations use event time, never processing time.
  */
object Streams {

  /** Tumbling-window counts + sums per event type. Batch and streaming
    * both: one hash aggregate keyed on (window, event_type).
    */
  def tumblingStats(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(F.window(F.col("ts"), width).as("w"), F.col("event_type"))
      .agg(
        F.count(F.lit(1)).as("n"),
        F.round(F.sum(F.col("value")), 2).as("sum_value"))
      .select(
        F.col("w.start").as("ws"),
        F.col("event_type"), F.col("n"), F.col("sum_value"))

  /** Sliding-window event counts (window `width`, slide `slide`). */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(F.window(F.col("ts"), width, slide).as("w"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("n"))
      .select(F.col("w.start").as("ws"), F.col("event_type"), F.col("n"))

  /** Session windows per user (gap-based). Streaming-safe: session_window
    * + watermark merges/finalizes sessions incrementally.
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(F.session_window(F.col("ts"), gap).as("w"), F.col("user_id"))
      .agg(F.count(F.lit(1)).as("n_events"),
        F.round(F.sum(F.col("value")), 2).as("sum_value"))
      .select(F.col("w.start").as("session_start"),
        F.col("w.end").as("session_end"),
        F.col("user_id"), F.col("n_events"), F.col("sum_value"))

  /** Open a streaming read over a parquet events directory with the given
    * schema (file-source streaming: each newly-arrived file is a
    * micro-batch; `maxFilesPerTrigger` bounds batch size).
    */
  def readEventStream(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Watermarked tumbling stats for a stream: late events beyond
    * `lateness` are dropped and window state is reclaimed — bounded state
    * at any scale.
    */
  def streamingTumblingStats(stream: DataFrame, width: String = "1 hour",
      lateness: String = "1 hour"): DataFrame =
    tumblingStats(stream.withWatermark("ts", lateness), width)

  /** Streaming dedup by event id within the watermark horizon —
    * exactly-once-per-id delivery with bounded state.
    */
  def streamingDedup(stream: DataFrame, lateness: String = "1 hour"): DataFrame =
    stream.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming exact-dedup of a DOCUMENT stream by normalized content
    * fingerprint ([[graft.operators.TextAnalysis.fingerprint]] —
    * whitespace/punctuation-insensitive), within the watermark horizon:
    * the streaming face of `Dedup.exact`. State = one 8-byte hash per
    * distinct document inside the horizon — bounded, and the codegen'd
    * fingerprint runs in the micro-batch projection, so the dedup state
    * never stores text.
    */
  def streamingDocDedup(stream: DataFrame, textCol: String, tsCol: String,
      lateness: String = "1 hour"): DataFrame =
    stream
      .withColumn("__fp",
        graft.operators.TextAnalysis.fingerprint(F.col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming ingestion dedup against a STATIC reference corpus: drop
    * every incoming doc whose normalized fingerprint already exists in
    * `ref` — the "don't re-ingest what we already curated" gate, run as a
    * stream-static left-anti join on 64-bit fingerprints. No streaming
    * state: the reference side is a bounded table resolved per batch
    * (pre-compute it to parquet for big corpora so each batch reads
    * fingerprints, not text). Combine with [[streamingDocDedup]] for
    * within-stream duplicates.
    */
  def streamingDedupAgainstStatic(stream: DataFrame, textCol: String,
      ref: DataFrame, refTextCol: String): DataFrame = {
    val fp = graft.operators.TextAnalysis.fingerprint _
    val refFp = ref.select(fp(F.col(refTextCol)).as("__fp")).distinct()
    stream.withColumn("__fp", fp(F.col(textCol)))
      .join(refFp, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Streaming NEAR-dup gate against a static corpus's band-Bloom artifact
    * ([[graft.operators.Dedup.saveBandBloom]]): drop incoming docs whose
    * LSH band keys hit the corpus filter — "is this probably a near-dup of
    * what we already curated?", answered inside the micro-batch projection.
    * Zero streaming state, no watermark, no join: the filter bytes ride
    * into the scan as one literal, so this is the ONLY near-dup check that
    * works at streaming ingest time (the banded-join path needs both sides
    * shuffled; stream-side aggregation of candidate verdicts would need
    * state). Conservative by construction — drops a superset of the exact
    * banded path's drops (band collisions below the threshold plus bloom
    * fpp; the no-false-negative direction for corpus hygiene). Exactness
    * later is batch business: re-verify survivors with
    * `Dedup.dedupAgainstIndex` at compaction time.
    */
  def nearDupStreamGate(stream: DataFrame, textCol: String,
      bloomArtifactPath: String): DataFrame =
    graft.operators.Dedup.nearDupGateFromArtifact(stream, textCol,
      bloomArtifactPath)

  /** Continuous corpus ingestion into a persisted band index
    * ([[graft.operators.Dedup.saveBandIndex]]): every micro-batch is
    * appended to BOTH index tables through
    * [[graft.operators.Dedup.appendToBandIndex]] with the streaming
    * batchId as the append's idempotence nonce — foreachBatch's
    * at-least-once replay contract (a batch whose checkpoint commit
    * never landed re-executes with the SAME id after a restart) becomes
    * exactly-once, because a replayed id skips any table that already
    * committed it. A crash anywhere — before either table's commit,
    * between the two (the composite-append window), or after both but
    * before the checkpoint commit — converges to exactly one copy of the
    * batch on replay. `autoCompactParts` passes through to the append's
    * read-amplification valve (safe under this cadence: compaction
    * preserves the batch markers it folds away). The standard pipeline:
    * gate the stream ([[curateStream]] / [[nearDupStreamGate]]) upstream,
    * ingest the survivors here, and the serving index grows continuously
    * without a rebuild.
    *
    * The nonce is `<queryId>-<batchId>`, where queryId is the streaming
    * query's checkpoint-stable id (read from `<checkpointDir>/metadata`,
    * the file Spark writes at query start): stable across restarts from
    * the SAME checkpoint (exactly-once replay), fresh for a NEW
    * checkpoint or a second stream into the same index — a bare batch
    * number would collide there (foreachBatch numbering restarts at 0)
    * and silently skip every replayed-looking batch.
    */
  def ingestToBandIndexStream(stream: DataFrame, idCol: String,
      textCol: String, indexPath: String, checkpointDir: String,
      autoCompactParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    ingestWithNonce(stream, checkpointDir) { (batch, nonce) =>
      graft.operators.Dedup.appendToBandIndex(batch, idCol, textCol,
        indexPath, autoCompactParts, batchId = Some(nonce))
    }
  }

  /** The one foreachBatch ingestion protocol behind every index face:
    * checkpointed stream, the `<queryId>-<batchId>` idempotence nonce
    * (query id resolved lazily from the checkpoint metadata INSIDE the
    * first batch), one `append` call per micro-batch. Keeping the nonce
    * scheme in one place means the exactly-once contract cannot drift
    * between the band/IVF/IVF-PQ faces.
    */
  private def ingestWithNonce(stream: DataFrame, checkpointDir: String)(
      append: (DataFrame, String) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    lazy val queryTag: String = checkpointQueryId(
      stream.sparkSession, checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        append(batch, f"$queryTag-$id%020d")
        ()
      }
      .start()
  }

  /** Continuous ANN-index ingestion: stream new embedding rows into a
    * persisted IVF index ([[graft.operators.Similarity.buildIvfIndex]])
    * via foreachBatch over the idempotent append — the vector analogue
    * of [[ingestToBandIndexStream]], one manifest commit per
    * micro-batch. Structured Streaming replays a batch whose epoch
    * didn't commit (at-least-once), and the append's batch-nonce
    * idempotence turns that into exactly-once: the nonce is
    * `<queryId>-<batchId>` with the query id read from the checkpoint's
    * metadata file — stable across restarts of the SAME checkpoint,
    * fresh for a new one (a bare batch number would restart at 0 under
    * a new checkpoint and silently skip real batches). The quantizer
    * stays frozen (the append contract): rebuild the index on corpus
    * drift, stream between rebuilds. `autoCompactParts` bounds the
    * per-list file count the stream's append cadence would otherwise
    * grow without limit ([[graft.operators.Similarity.compactIvfIndex]]).
    */
  def ingestToIvfIndexStream(stream: DataFrame, idCol: String,
      vecCol: String, indexPath: String, checkpointDir: String,
      autoCompactParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    ingestWithNonce(stream, checkpointDir) { (batch, nonce) =>
      graft.operators.Similarity.appendToIvfIndex(batch, idCol, vecCol,
        indexPath, batchId = Some(nonce),
        autoCompactParts = autoCompactParts)
    }
  }

  /** [[ingestToIvfIndexStream]] for an IVF-PQ index
    * ([[graft.operators.Similarity.buildIvfPqIndex]]): the stored
    * codebooks encode each micro-batch's rows at append time, so
    * streamed vectors are immediately ADC-scorable. Same nonce, same
    * exactly-once contract, same frozen-quantizer caveat.
    */
  def ingestToIvfPqIndexStream(stream: DataFrame, idCol: String,
      vecCol: String, indexPath: String, checkpointDir: String,
      autoCompactParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    ingestWithNonce(stream, checkpointDir) { (batch, nonce) =>
      graft.operators.Similarity.appendToIvfPqIndex(batch, idCol,
        vecCol, indexPath, batchId = Some(nonce),
        autoCompactParts = autoCompactParts)
    }
  }

  // ---- flat sketch-store ingestion (r16 verdict "missing #2") -------------

  /** Continuous telemetry ingestion into a persisted KMV sketch store
    * ([[graft.operators.Sketches.buildKmvStore]]) — the flat stores'
    * natural use is exactly this cadence (per-batch sketch appends, the
    * corpus never rescanned), and this face closes their exactly-once
    * gap: each micro-batch lands through the idempotent
    * `appendToKmvStore(batchId = <queryId>-<batchId>)` ([[ingestWithNonce]],
    * the same nonce protocol as the band/IVF index faces), so
    * foreachBatch's at-least-once replay after a kill/restart converges
    * to exactly one sketch append per batch (StreamingRecoverySpec
    * kills between the append and the checkpoint commit and proves the
    * served estimate equals the batch face over ALL input). The store's
    * sketch contract (k, flavor, group/value cols) is read from its
    * `_params` sidecar per batch — the stream cannot drift from the
    * build. `autoCompactParts` bounds the served part count under an
    * append-forever cadence; compaction preserves the batch markers it
    * folds, so idempotence survives it.
    */
  def ingestToKmvStoreStream(stream: DataFrame, storePath: String,
      checkpointDir: String, autoCompactParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestWithNonce(stream, checkpointDir) { (batch, nonce) =>
      graft.operators.Sketches.appendToKmvStore(batch, storePath,
        autoCompactParts, batchId = Some(nonce))
    }

  /** [[ingestToKmvStoreStream]] for a CMS grid store — same nonce, same
    * exactly-once contract; the grid's linearity makes the folded
    * estimate independent of how the stream was batched.
    */
  def ingestToCmsStoreStream(stream: DataFrame, storePath: String,
      checkpointDir: String, autoCompactParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestWithNonce(stream, checkpointDir) { (batch, nonce) =>
      graft.operators.Sketches.appendToCmsStore(batch, storePath,
        autoCompactParts, batchId = Some(nonce))
    }

  /** [[ingestToKmvStoreStream]] for an HLL register store — max-fold
    * merge, batching-independent by the register-max identity.
    */
  def ingestToHllStoreStream(stream: DataFrame, storePath: String,
      checkpointDir: String, autoCompactParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestWithNonce(stream, checkpointDir) { (batch, nonce) =>
      graft.operators.Sketches.appendToHllStore(batch, storePath,
        autoCompactParts, batchId = Some(nonce))
    }

  /** [[ingestToKmvStoreStream]] for a log2-histogram store — bucket
    * counts sum, batching-independent by linearity.
    */
  def ingestToHistStoreStream(stream: DataFrame, storePath: String,
      checkpointDir: String, autoCompactParts: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ingestWithNonce(stream, checkpointDir) { (batch, nonce) =>
      graft.operators.Sketches.appendToHistStore(batch, storePath,
        autoCompactParts, batchId = Some(nonce))
    }

  /** The checkpoint-stable query id from `<checkpoint>/metadata` — the
    * collision-free half of a streaming append's idempotence nonce
    * (resolved lazily inside the first batch: the metadata file exists
    * once the query has started, before any batch runs).
    */
  private def checkpointQueryId(
      spark: org.apache.spark.sql.SparkSession,
      checkpointDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "metadata")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    "\"id\"\\s*:\\s*\"([0-9a-fA-F-]+)\"".r.findFirstMatchIn(txt)
      .map(_.group(1))
      .getOrElse(throw new IllegalStateException(
        s"$p holds no query id — cannot derive a collision-free " +
          "append nonce for exactly-once ingestion"))
  }

  /** The full streaming ingestion gate, composed: quality filter
    * (`qualityScore >= minQuality`, the banded 0-1 signal — a LIGHTER
    * gate than the batch `Pipelines.cleanCorpus` recipe, which hard-
    * requires token count and word-length bands; align thresholds
    * explicitly if stream and batch must curate identically), then
    * within-stream dedup and the static-corpus gate, both on the SAME
    * normalized 64-bit fingerprint (exact dedup after case/punctuation
    * normalization — near-dup detection stays a batch job). The
    * fingerprint kernel is computed ONCE per surviving row and shared by
    * both dedup stages. One lazy plan per micro-batch; state is bounded
    * by the watermark and the static side carries only fingerprints.
    */
  def curateStream(stream: DataFrame, textCol: String, tsCol: String,
      ref: DataFrame, refTextCol: String, lateness: String = "1 hour",
      minQuality: Double = 0.5): DataFrame = {
    val refFp = ref.select(graft.operators.TextAnalysis
      .fingerprint(F.col(refTextCol)).as("__fp")).distinct()
    qualityGateWithFingerprint(stream, textCol, minQuality)
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__fp")
      .join(refFp, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Shared gate head of [[curateStream]] / [[curateBatch]]: tokenize ONCE
    * per row behind a [[graft.plans.Hygiene.attributeBarrier]] (a Generate
    * is a predicate-pushdown barrier — a plain projection would be
    * substituted back into the pushed quality filter, re-running the
    * tokenizer ~4x per row), gate on the token-array quality score, and
    * compute the normalized fingerprint from the SAME token array. Emits
    * the input columns plus `__fp`.
    */
  private def qualityGateWithFingerprint(docs: DataFrame, textCol: String,
      minQuality: Double): DataFrame = {
    val ta = graft.operators.TextAnalysis
    val t = F.col(textCol)
    val ts = F.col("__ts")
    docs
      .select(docs.columns.map(F.col) :+
        graft.plans.Hygiene.attributeBarrier(ta.tokens(t)).as("__ts"): _*)
      .filter(ta.qualityScoreOf(ts, t) >= minQuality)
      .withColumn("__fp", ta.fingerprintOf(ts))
      .drop("__ts")
  }

  /** The BATCH face of [[curateStream]] — the same gate logic replayed
    * deterministically over a bounded frame, so the streaming ingestion
    * gate's semantics are oracle-checkable (`dropDuplicatesWithinWatermark`
    * only runs on streams, and which duplicate survives there is
    * arrival-order-dependent; the batch stand-in keeps the LOWEST id per
    * normalized fingerprint). Stages, in order, all one lazy plan:
    * quality gate (>= `minQuality`) → one survivor per 64-bit normalized
    * fingerprint (rank-1 window on the 8-byte hash — the shuffle carries
    * fingerprints, never text bodies) → left-anti join against the static
    * reference corpus's fingerprint set.
    */
  def curateBatch(docs: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String,
      minQuality: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val refFp = ref.select(graft.operators.TextAnalysis
      .fingerprint(F.col(refTextCol)).as("__fp")).distinct()
    val gated = qualityGateWithFingerprint(docs, textCol, minQuality)
    val w = Window.partitionBy("__fp").orderBy(F.col(idCol).asc)
    gated
      .withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") === 1)
      .join(refFp, Seq("__fp"), "left_anti")
      .drop("__fp", "__rn")
  }

  /** Interval (time-bounded) equi-join — the STREAM-STREAM join shape:
    * each left row pairs with the right rows of the same key whose
    * timestamp lies within `[leftTs - before, leftTs]` (e.g. "events with
    * the purchases the same user made in the prior 30 minutes"). Plain
    * DataFrames in, so the SAME plan runs in batch (for the oracle gate)
    * and under `readStream` on both sides — there, put a watermark on
    * BOTH inputs (`withWatermark`) so Spark can bound the join state: the
    * time-range condition plus the watermarks tell it when a buffered row
    * can never match again and gets evicted.
    *
    * Scale: an equi-join on the key with the range as a join filter — a
    * sort-merge/shuffled-hash join, never a cartesian; per-key output is
    * bounded by how many right rows fall in the window (the caller's
    * modeling choice, exactly as in Spark's own stream-stream joins).
    * Column names must be disjoint apart from `keyCol` (pre-alias the
    * right side).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, before: String): DataFrame =
    left.join(right,
      left(keyCol) === right(keyCol) &&
        F.col(rightTs) >= F.col(leftTs) - F.expr(s"INTERVAL $before") &&
        F.col(rightTs) <= F.col(leftTs))
      .drop(right(keyCol))

  /** Typed projection of a JSON properties column (the `events.props`
    * shape): parse once with an explicit schema — `from_json` is strict,
    * columnar and codegen-planned, never a per-field reparse — and emit
    * the requested fields as top-level columns alongside the input.
    * Fields absent from a row's JSON (or malformed rows) come out null,
    * the standard semi-structured contract.
    */
  def extractProps(events: DataFrame, propsCol: String,
      schemaDdl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val parsed = F.from_json(F.col(propsCol), schema)
    val fields = schema.fieldNames.toSeq
    events.withColumn("__p", parsed)
      .select(F.col("*") +: fields.map(f => F.col(s"__p.$f").as(f)): _*)
      .drop("__p")
  }

  /** Stream-static enrichment join: each micro-batch joins against the
    * (broadcast) static dimension — no streaming state at all, the
    * canonical fact-stream × dimension-table shape. The dimension is
    * re-resolved per batch, so a backing table that updates between
    * batches is picked up automatically.
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** Multi-output custom state via `flatMapGroupsWithState`: emits one row
    * per NEW high-value event (value above `threshold`) carrying the
    * running per-user count of such events — the alert/enrichment shape
    * (0..n outputs per key per batch) that `mapGroupsWithState`'s
    * one-output contract can't express. State = one counter per user.
    */
  def highValueAlerts(events: DataFrame, threshold: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "event_id", "value")
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Double, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.filter(_._3 > threshold).toSeq.sortBy(_._2).map {
            case (_, eventId, v) =>
              n += 1
              (user, eventId, v, n)
          }
          state.update(n)
          out.iterator
      }
      .toDF("user_id", "event_id", "value", "running_high_count")
  }

  /** Custom arbitrary state per key via `mapGroupsWithState`: running
    * per-user totals (event count + value sum) updated incrementally each
    * micro-batch. The state store holds one small record per user —
    * bounded by cardinality, not stream length; GroupStateTimeout would
    * evict idle users in a production config. Works identically over a
    * batch frame (Spark runs the state function once per group).
    */
  def runningUserTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.{Encoders, Row}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          val (prevN, prevSum) = state.getOption.getOrElse((0L, 0.0))
          var n = prevN
          var sum = prevSum
          rows.foreach { case (_, v) => n += 1; sum += v }
          state.update((n, sum))
          (user, n, math.rint(sum * 100) / 100)
      }
      .toDF("user_id", "n_events", "sum_value")
  }

  // ---- idle-key eviction (TTL) -------------------------------------------
  //
  // The base stateful faces above and below run GroupStateTimeout.NoTimeout:
  // per-KEY state is bounded (a counter, 1 KB of HLL registers, a bucket
  // map), but keys × time is not — an unbounded-key stream grows the state
  // store forever. The ...Ttl variants below close that: each key's state
  // carries an EVENT-TIME timeout `idleHorizon` past the key's LAST event
  // (clamped above the current watermark), re-armed on every update; when
  // the watermark passes it (the key saw no data for ≥ idleHorizon of
  // event time) Spark invokes the function one
  // last time with `hasTimedOut`, the face emits a FINAL flush row
  // (`is_final = true` — the key's last word, so downstream sinks still get
  // a complete record) and removes the state. Active keys are untouched.
  // Event-time (not processing-time) timeout keeps eviction deterministic
  // and replay-safe: a checkpoint restart re-derives the same evictions
  // from the same input — including a restart that straddles an ARMED
  // timeout (the timestamp lives in the state store, the watermark in
  // the commit log; StreamingRecoverySpec kills a query mid-horizon and
  // proves the eviction still fires once, at the same horizon) — and a
  // stalled stream evicts nothing spuriously.
  //
  // Production state backend: these faces run on whatever
  // `spark.sql.streaming.stateStore.providerClass` names. The default
  // HDFS-backed provider keeps every key's state on the executor HEAP —
  // at 100 TB key counts set it to
  // `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
  // (ships with Spark) so state lives off-heap/on-disk with incremental
  // checkpointing; the faces are provider-agnostic and the TTL × restart
  // contract is tested under BOTH providers (StreamingRecoverySpec).
  // Requires `withWatermark` upstream — these variants apply it from
  // (`tsCol`, `lateness`). In BATCH execution timeouts never fire (Spark
  // runs each group once, watermark-less): the variants emit exactly the
  // base face's rows plus `is_final = false`, so the oracle story of the
  // base faces carries over unchanged.

  /** Parse a duration string ("30 minutes", "2 hours") to millis —
    * driver-side, once, so state closures capture a plain long.
    */
  private def durationMs(d: String): Long = {
    val ms = scala.concurrent.duration.Duration(d).toMillis
    require(ms > 0, s"idle horizon must be positive, got '$d'")
    ms
  }

  /** Arm/re-arm a key's idle eviction at `lastEventTsMs + horizonMs`
    * (event time — the key is "idle" once the watermark passes horizon
    * beyond its LAST event), clamped one past the current watermark
    * (Spark rejects a timeout at/below it — a key whose whole horizon
    * is already behind the watermark evicts at the next watermark
    * advance). No-op in batch execution: `getCurrentWatermarkMs` throws
    * there (no watermark exists, and batch state dies with the query).
    */
  private def armIdleTimeout(
      state: org.apache.spark.sql.streaming.GroupState[_],
      lastEventTsMs: Long, horizonMs: Long): Unit =
    try {
      val wm = state.getCurrentWatermarkMs
      state.setTimeoutTimestamp(math.max(lastEventTsMs + horizonMs, wm + 1L))
    } catch { case _: UnsupportedOperationException => () }

  /** [[runningUserTotals]] with idle-key eviction: totals flow with
    * `is_final = false`; a key idle ≥ `idleHorizon` (event time past its
    * last event) flushes its last totals with `is_final = true` and
    * frees its state. A later arrival of the same key starts FRESH
    * totals — the horizon is the caller's declaration that the key's
    * session is over.
    */
  def runningUserTotalsTtl(events: DataFrame, lateness: String = "1 hour",
      idleHorizon: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    val horizonMs = durationMs(idleHorizon)
    events
      // a row with no event time has no place on an event-time-evicted
      // face (and would NPE the typed decode below); the base face never
      // reads ts and keeps such rows — the one documented divergence
      .filter(F.col("ts").isNotNull)
      // the WATERMARKED ts attribute itself must reach the stateful
      // operator (its event-time metadata tag is what the EventTime-
      // Timeout check looks for; a derived unix_millis(ts) column loses
      // the tag) — keep it and read .getTime in the state function
      .withWatermark("ts", lateness)
      .selectExpr("user_id", "value", "ts")
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double, Boolean)](
        GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            val (n, sum) = state.get
            state.remove()
            (user, n, math.rint(sum * 100) / 100, true)
          } else {
            val (prevN, prevSum) = state.getOption.getOrElse((0L, 0.0))
            var n = prevN
            var sum = prevSum
            var maxTs = Long.MinValue
            rows.foreach { case (_, v, t) =>
              n += 1; sum += v; if (t.getTime > maxTs) maxTs = t.getTime
            }
            state.update((n, sum))
            armIdleTimeout(state, maxTs, horizonMs)
            (user, n, math.rint(sum * 100) / 100, false)
          }
      }
      .toDF("user_id", "n_events", "sum_value", "is_final")
  }

  /** [[highValueAlerts]] with idle-key eviction: alert rows are emitted
    * as before; an idle key's counter state is silently dropped after
    * `idleHorizon` (alerts are already-delivered facts — there is no
    * meaningful flush row, so eviction emits nothing).
    */
  def highValueAlertsTtl(events: DataFrame, threshold: Double = 0.9,
      lateness: String = "1 hour",
      idleHorizon: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val horizonMs = durationMs(idleHorizon)
    events
      // null event times are dropped (see runningUserTotalsTtl)
      .filter(F.col("ts").isNotNull)
      // keep the watermarked ts attribute (see runningUserTotalsTtl)
      .withWatermark("ts", lateness)
      .selectExpr("user_id", "event_id", "value", "ts")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Double, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var n = state.getOption.getOrElse(0L)
            val seq = rows.toSeq
            val out = seq.filter(_._3 > threshold).sortBy(_._2).map {
              case (_, eventId, v, _) =>
                n += 1
                (user, eventId, v, n)
            }
            state.update(n)
            armIdleTimeout(state, seq.iterator.map(_._4.getTime).max,
              horizonMs)
            out.iterator
          }
      }
      .toDF("user_id", "event_id", "value", "running_high_count")
  }

  /** Running approximate count-distinct per key via `mapGroupsWithState`
    * + HLL registers ([[graft.operators.Sketches.hllUpdateJvm]]): emits
    * the current estimate for each key touched by a micro-batch. State
    * is ONE 1024-byte register array per key — bounded forever, at any
    * cardinality; an exact streaming distinct would hold every seen
    * value. The state face folds the SAME md5 hash domain as the batch
    * sketch, so after any prefix of the stream its registers (and
    * therefore its estimate) are byte-equal to
    * [[graft.operators.Sketches.hllDistinct]] over the same rows —
    * pinned in PipelineSpec, and the batch face carries a full DuckDB
    * oracle (q_hll_running). Works identically over a batch frame.
    */
  /** Rows per map-side partial chunk in the stateful sketch faces: the
    * per-task accumulator is rebuilt per chunk, so task memory is
    * bounded by ≤ PartialChunkRows keys × one partial each — REGARDLESS
    * of key cardinality (a hand-rolled HashMap has no Catalyst
    * spill/fallback path, so the bound must come from the chunking).
    * Multiple partials per key per task are fine: the state merge is
    * associative and idempotent-safe.
    */
  private val PartialChunkRows = 1 << 16

  def runningApproxDistinct(events: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import graft.operators.Sketches
    val spark = events.sparkSession
    import spark.implicits._
    val keyType = events.schema(keyCol).dataType
    events
      .select(F.col(keyCol).cast("string"), F.col(valueCol).cast("string"))
      .as[(String, String)]
      // map-side partial registers: each task collapses its rows to ONE
      // register array per key per chunk BEFORE the exchange (the same
      // partial-agg trick the column sketch gets from Catalyst), so the
      // shuffle carries ≤ tasks·chunks·keys·1 KB — measured flat across
      // a ×100 decade, where shipping raw rows to the key owner grew
      // linearly. `grouped` keeps the accumulator bounded
      // ([[PartialChunkRows]]).
      .mapPartitions { it =>
        it.grouped(PartialChunkRows).flatMap { chunk =>
          val acc = collection.mutable.HashMap.empty[String, Array[Byte]]
          chunk.foreach { case (k, v) =>
            if (v != null)
              Sketches.hllUpdateJvm(
                acc.getOrElseUpdate(k, new Array[Byte](Sketches.HllM)), v)
          }
          acc.iterator
        }
      }
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Double)](
        GroupStateTimeout.NoTimeout) {
        case (key, parts, state) =>
          val regs = state.getOption
            .getOrElse(new Array[Byte](Sketches.HllM))
          parts.foreach { case (_, p) => Sketches.hllMergeJvm(regs, p) }
          state.update(regs)
          (key, Sketches.hllEstimateJvm(regs))
      }
      .toDF(keyCol, "est_distinct")
      // the key rode through the state machine as a string; restore the
      // caller's type so both faces stay schema-compatible
      .withColumn(keyCol, F.col(keyCol).cast(keyType))
  }

  /** [[runningApproxDistinct]] with idle-key eviction (the TTL
    * contract of [[runningUserTotalsTtl]]): registers older than
    * `idleHorizon` of key inactivity flush one last
    * `(key, est_distinct, is_final = true)` row and free their 1 KB.
    * The map-side partial-register fold is unchanged — the watermark
    * column is consumed by the plan's watermark node below it.
    */
  def runningApproxDistinctTtl(events: DataFrame, keyCol: String,
      valueCol: String, tsCol: String, lateness: String = "1 hour",
      idleHorizon: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import graft.operators.Sketches
    val spark = events.sparkSession
    import spark.implicits._
    val keyType = events.schema(keyCol).dataType
    val horizonMs = durationMs(idleHorizon)
    events
      // a null event time would crash the primitive-Long decode below
      // ('null value in non-nullable field'); such a row has no place on
      // an event-time-evicted face — dropped, like null values
      .filter(F.col(tsCol).isNotNull)
      .select(F.col(keyCol).cast("string"), F.col(valueCol).cast("string"),
        F.unix_millis(F.col(tsCol)))
      .as[(String, String, Long)]
      // map-side partial registers (see runningApproxDistinct) — each
      // partial additionally carries the chunk's max event time per key,
      // the TTL clock
      .mapPartitions { it =>
        it.grouped(PartialChunkRows).flatMap { chunk =>
          val acc =
            collection.mutable.HashMap.empty[String, (Array[Byte], Long)]
          chunk.foreach { case (k, v, t) =>
            if (v != null) {
              val (regs, maxTs) = acc.getOrElseUpdate(k,
                (new Array[Byte](Sketches.HllM), Long.MinValue))
              Sketches.hllUpdateJvm(regs, v)
              if (t > maxTs) acc(k) = (regs, t)
            }
          }
          acc.iterator.map { case (k, (regs, maxTs)) => (k, regs, maxTs) }
        }
      }
      // the watermark is declared AFTER the partial fold: the fold is a
      // typed op whose output attributes carry no event-time tag, and
      // the EventTimeTimeout check needs the tagged attribute at the
      // stateful operator. Declaring it here is equivalent — the fold
      // preserves each key's max event time, so the observed max (which
      // is all a watermark is) is unchanged
      .toDF("__k", "__part", "__tsm")
      .withColumn("__ts", F.timestamp_millis(F.col("__tsm")))
      .withWatermark("__ts", lateness)
      .as[(String, Array[Byte], Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Double, Boolean)](
        GroupStateTimeout.EventTimeTimeout) {
        case (key, parts, state) =>
          if (state.hasTimedOut) {
            val est = Sketches.hllEstimateJvm(state.get)
            state.remove()
            (key, est, true)
          } else {
            val regs = state.getOption
              .getOrElse(new Array[Byte](Sketches.HllM))
            var maxTs = Long.MinValue
            parts.foreach { case (_, p, t, _) =>
              Sketches.hllMergeJvm(regs, p)
              if (t > maxTs) maxTs = t
            }
            state.update(regs)
            armIdleTimeout(state, maxTs, horizonMs)
            (key, Sketches.hllEstimateJvm(regs), false)
          }
      }
      .toDF(keyCol, "est_distinct", "is_final")
      .withColumn(keyCol, F.col(keyCol).cast(keyType))
  }

  /** Running quantiles per key via `flatMapGroupsWithState` + the
    * binary-grid histogram ([[graft.operators.Sketches.histBucketLoJvm]]):
    * emits `(key, q, est_value, n_total)` rows with the CURRENT
    * quantile estimates for each key a micro-batch touches — the live
    * p50/p99 monitoring shape. State is one bucket→count map per key
    * (≤ 2^subBits buckets per octave — a few hundred entries at any
    * data volume); map-side partial histograms collapse each task
    * before the exchange, the same reshape as
    * [[runningApproxDistinct]]. Buckets and the ⌈q·N⌉ rank pick are
    * integer-identical to [[graft.operators.Sketches.histQuantiles]],
    * so after any stream prefix the emitted rows equal the batch face
    * over the same rows (pinned in PipelineSpec); the batch face
    * carries the full DuckDB oracle (q_hist_running). Works identically
    * over a batch frame. Negative values raise (the grid has no sign).
    */
  def runningQuantiles(events: DataFrame, keyCol: String, valueCol: String,
      qs: Seq[Double], subBits: Int = 3): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"runningQuantiles: quantiles must be in (0, 1], got $qs")
    require(subBits >= 0 && subBits <= 20,
      s"runningQuantiles: subBits must be in [0, 20], got $subBits")
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.operators.Sketches
    val spark = events.sparkSession
    import spark.implicits._
    val keyType = events.schema(keyCol).dataType
    events
      .select(F.col(keyCol).cast("string"), F.col(valueCol).cast("long"))
      .as[(String, java.lang.Long)]
      // bounded map-side partial histograms, the
      // [[runningApproxDistinct]] reshape ([[PartialChunkRows]])
      .mapPartitions { it =>
        it.grouped(PartialChunkRows).flatMap { chunk =>
          val acc = collection.mutable.HashMap
            .empty[String, collection.mutable.HashMap[Long, Long]]
          chunk.foreach { case (k, v) =>
            if (v != null) {
              val lo = Sketches.histBucketLoJvm(v.longValue, subBits)
              val h = acc.getOrElseUpdate(k,
                collection.mutable.HashMap.empty[Long, Long])
              h(lo) = h.getOrElse(lo, 0L) + 1L
            }
          }
          acc.iterator.map { case (k, h) => (k, h.toMap) }
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long],
        (String, Double, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, parts, state) =>
          val merged = collection.mutable.HashMap.empty[Long, Long]
          merged ++= state.getOption.getOrElse(Map.empty[Long, Long])
          parts.foreach { case (_, h) =>
            h.foreach { case (lo, n) =>
              merged(lo) = merged.getOrElse(lo, 0L) + n
            }
          }
          val snap = merged.toMap
          state.update(snap)
          Sketches.histQuantilesJvm(snap, qs).iterator.map {
            case (q, lo, tot) => (key, q, lo, tot)
          }
      }
      .toDF(keyCol, "q", "est_value", "n_total")
      // restore the caller's key type (see runningApproxDistinct)
      .withColumn(keyCol, F.col(keyCol).cast(keyType))
  }

  /** [[runningQuantiles]] with idle-key eviction: live rows carry
    * `is_final = false`; a key idle ≥ `idleHorizon` flushes its final
    * quantile rows (`is_final = true`) and frees its bucket map.
    */
  def runningQuantilesTtl(events: DataFrame, keyCol: String,
      valueCol: String, tsCol: String, qs: Seq[Double],
      lateness: String = "1 hour", idleHorizon: String = "2 hours",
      subBits: Int = 3): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"runningQuantilesTtl: quantiles must be in (0, 1], got $qs")
    require(subBits >= 0 && subBits <= 20,
      s"runningQuantilesTtl: subBits must be in [0, 20], got $subBits")
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.operators.Sketches
    val spark = events.sparkSession
    import spark.implicits._
    val keyType = events.schema(keyCol).dataType
    val horizonMs = durationMs(idleHorizon)
    events
      // null event times are dropped (see runningApproxDistinctTtl)
      .filter(F.col(tsCol).isNotNull)
      .select(F.col(keyCol).cast("string"), F.col(valueCol).cast("long"),
        F.unix_millis(F.col(tsCol)))
      .as[(String, java.lang.Long, Long)]
      // bounded map-side partial histograms + per-key max event time
      // (see runningApproxDistinctTtl)
      .mapPartitions { it =>
        it.grouped(PartialChunkRows).flatMap { chunk =>
          val acc = collection.mutable.HashMap
            .empty[String, (collection.mutable.HashMap[Long, Long], Long)]
          chunk.foreach { case (k, v, t) =>
            if (v != null) {
              val (h, maxTs) = acc.getOrElseUpdate(k,
                (collection.mutable.HashMap.empty[Long, Long],
                  Long.MinValue))
              val lo = Sketches.histBucketLoJvm(v.longValue, subBits)
              h(lo) = h.getOrElse(lo, 0L) + 1L
              if (t > maxTs) acc(k) = (h, t)
            }
          }
          acc.iterator.map { case (k, (h, maxTs)) => (k, h.toMap, maxTs) }
        }
      }
      // watermark declared post-fold (see runningApproxDistinctTtl)
      .toDF("__k", "__part", "__tsm")
      .withColumn("__ts", F.timestamp_millis(F.col("__tsm")))
      .withWatermark("__ts", lateness)
      .as[(String, Map[Long, Long], Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long],
        (String, Double, Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        case (key, parts, state) =>
          if (state.hasTimedOut) {
            val snap = state.get
            state.remove()
            Sketches.histQuantilesJvm(snap, qs).iterator.map {
              case (q, lo, tot) => (key, q, lo, tot, true)
            }
          } else {
            val merged = collection.mutable.HashMap.empty[Long, Long]
            merged ++= state.getOption.getOrElse(Map.empty[Long, Long])
            var maxTs = Long.MinValue
            parts.foreach { case (_, h, t, _) =>
              h.foreach { case (lo, n) =>
                merged(lo) = merged.getOrElse(lo, 0L) + n
              }
              if (t > maxTs) maxTs = t
            }
            val snap = merged.toMap
            state.update(snap)
            armIdleTimeout(state, maxTs, horizonMs)
            Sketches.histQuantilesJvm(snap, qs).iterator.map {
              case (q, lo, tot) => (key, q, lo, tot, false)
            }
          }
      }
      .toDF(keyCol, "q", "est_value", "n_total", "is_final")
      .withColumn(keyCol, F.col(keyCol).cast(keyType))
  }
}
