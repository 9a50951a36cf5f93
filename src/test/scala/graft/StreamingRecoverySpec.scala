package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.streaming.Streams

/** Streaming recovery e2e (round-10 verdict "next round #8"): the
  * exactly-once story the streaming gates imply but never tested. A
  * curateStream query writes through an IDEMPOTENT foreachBatch parquet
  * sink (one overwritten directory per batchId — the standard recipe for
  * exactly-once file output under retries), is STOPPED mid-stream, more
  * input arrives, and a NEW query restarts from the same checkpoint:
  *
  *  - no loss: every pre- and post-restart survivor is in the sink;
  *  - no dupes: restart replay of an uncommitted batch lands in the same
  *    batchId directory (overwrite), never twice in the output;
  *  - STATE survives the restart: a document whose fingerprint was seen
  *    BEFORE the stop arrives again AFTER the restart and is still
  *    dropped — dropDuplicatesWithinWatermark's store recovered from the
  *    checkpoint, not rebuilt empty.
  *
  * Two kill shapes (the second is the round-11 ADVICE item): a graceful
  * stop between batches, and a mid-batch CRASH injected after the sink
  * write but before the checkpoint commit — the restarted query then
  * really does execute the same batchId a second time (observed by the
  * sink-call log), and only the per-batchId overwrite keeps the output
  * duplicate-free. A plain append sink provably fails that run.
  */
class StreamingRecoverySpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def ref = {
    import spark.implicits._
    Seq(("this is the known curated reference document that " +
      "we already have stored with many plain words inside")).toDF("text")
  }
  private def doc(id: Long, text: String, minute: Int) =
    (id, text, f"2024-01-01 10:$minute%02d:00")
  private val goodA = "this is a perfectly reasonable document with plenty " +
    "of normal words and a decent length for the quality gate to accept"
  private val goodB = "another entirely different piece of writing whose " +
    "vocabulary and sentence shape pass every quality threshold easily"
  private val goodC = "a third unique article containing sufficiently many " +
    "ordinary terms to clear the gate without any trouble at all"

  /** The file source watches a FLAT dir: write to a scratch dir and move
    * the single part file in as fN.parquet.
    */
  private def writeFile(inDir: String, n: Int,
      docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    val scratch = java.nio.file.Files
      .createTempDirectory(s"graft-rec-scratch$n").toString
    docs.toDF("doc_id", "text", "ts_s")
      .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(inDir, s"f$n.parquet"))
  }

  private def inputSchema = {
    import spark.implicits._
    Seq((1L, "x", "2024-01-01 10:00:00"))
      .toDF("doc_id", "text", "ts_s")
      .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").schema
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("curateStream + idempotent foreachBatch sink: kill/restart across " +
    "micro-batches loses nothing, duplicates nothing, keeps dedup state") {
    val inDir = tmp("graft-rec-in")
    val outDir = tmp("graft-rec-out")
    val ckDir = tmp("graft-rec-ck")

    def startQuery() = {
      val stream = Streams.readEventStream(spark, inDir, inputSchema)
      Streams.curateStream(stream, "text", "ts", ref, "text")
        .writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // idempotent sink: a replayed batchId OVERWRITES its own
          // directory instead of appending a duplicate copy
          batch.write.mode("overwrite")
            .parquet(s"$outDir/batch=$batchId")
        }
        .start()
    }

    // phase 1: two input files -> d1 survives, d2 fails quality,
    // d3 survives, d4 is a within-stream dup of d1
    writeFile(inDir, 1, Seq(doc(1L, goodA, 0), doc(2L, "x@#", 1)))
    writeFile(inDir, 2, Seq(doc(3L, goodB, 2), doc(4L, goodA + "!", 3)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop() // graceful "kill"

    // phase 2 (AFTER the stop): d5 duplicates d1 across the restart —
    // only recovered checkpoint state can catch it; d6 survives; d7 is
    // the static-reference doc re-cased -> gated
    writeFile(inDir, 3, Seq(doc(5L, goodA.toUpperCase, 4), doc(6L, goodC, 5),
      doc(7L, "This is the KNOWN curated reference document that we " +
        "already have stored; with many plain words inside", 6)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.option("basePath", outDir)
      .parquet(s"$outDir/batch=*")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // no dupes anywhere
    out.distinct.size shouldBe out.size
    // exactly one of the goodA fingerprint family {d1, d4} survived (file
    // discovery order decides which), and d5 — its post-restart copy —
    // was dropped by RECOVERED state, not a fresh empty store
    out.count(Set(1L, 4L)) shouldBe 1
    (out should not).contain(5L)
    // no loss: both other survivors present; quality/static gates held
    out should contain allOf (3L, 6L)
    (out should not).contain(2L)
    (out should not).contain(7L)
    out.size shouldBe 3
  }

  test("runningApproxDistinct + runningQuantiles: kill/restart recovers " +
    "the register/histogram STATE from the checkpoint — estimates after " +
    "the restart equal the batch face over ALL input") {
    import spark.implicits._
    import graft.operators.Sketches
    val inDir = tmp("graft-skrec-in")
    val ckA = tmp("graft-skrec-cka")
    val ckQ = tmp("graft-skrec-ckq")

    def eventSchema = Seq((1L, 1.0, "2024-01-01 10:00:00"))
      .toDF("user_id", "value", "ts_s")
      .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").schema
    def writeEvents(n: Int, rows: Seq[(Long, Double, String)]): Unit = {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-skrec-scratch$n").toString
      rows.toDF("user_id", "value", "ts_s")
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"f$n.parquet"))
    }

    // latest row per key (approx-distinct) / per (key, q) (quantiles):
    // foreachBatch closures run on the driver
    val latestA = new java.util.concurrent.ConcurrentHashMap[Long, Double]
    val latestQ =
      new java.util.concurrent.ConcurrentHashMap[(Long, Double), (Long, Long)]
    def startA() = {
      val s = Streams.readEventStream(spark, inDir, eventSchema)
      Streams.runningApproxDistinct(s, "user_id", "value")
        .writeStream.option("checkpointLocation", ckA)
        .outputMode("update")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(r =>
            latestA.put(r.getLong(0), r.getDouble(1))); ()
        }
        .start()
    }
    def startQ() = {
      val s = Streams.readEventStream(spark, inDir, eventSchema)
      Streams.runningQuantiles(s, "user_id", "value", Seq(0.5, 1.0))
        .writeStream.option("checkpointLocation", ckQ)
        .outputMode("append")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(r => latestQ.put(
            (r.getLong(0), r.getDouble(1)),
            (r.getLong(2), r.getLong(3)))); ()
        }
        .start()
    }

    // phase 1: user 1 sees {10, 20, 30}, user 2 sees {10}
    writeEvents(1, Seq((1L, 10.0, "2024-01-01 10:00:00"),
      (1L, 20.0, "2024-01-01 10:01:00"), (1L, 30.0, "2024-01-01 10:02:00"),
      (2L, 10.0, "2024-01-01 10:00:30")))
    val a1 = startA(); try a1.processAllAvailable() finally a1.stop()
    val q1 = startQ(); try q1.processAllAvailable() finally q1.stop()

    // phase 2 (AFTER the kill): user 1 re-sends 10 and adds 40 — with a
    // fresh empty state its estimate would be 2, only RECOVERED
    // registers give 4; user 2 adds 20
    writeEvents(2, Seq((1L, 10.0, "2024-01-01 10:10:00"),
      (1L, 40.0, "2024-01-01 10:11:00"), (2L, 20.0, "2024-01-01 10:10:30")))
    val a2 = startA(); try a2.processAllAvailable() finally a2.stop()
    val q2 = startQ(); try q2.processAllAvailable() finally q2.stop()

    // the batch face over ALL input is the ground truth both faces must
    // land on after the restart
    val all = spark.read.schema(eventSchema).parquet(inDir)
    val wantA = Sketches.hllDistinct(all, Seq("user_id"), "value")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    import scala.jdk.CollectionConverters._
    latestA.asScala.toMap shouldBe wantA
    // user 1's estimate specifically reflects 4 distinct values (not
    // the 2 a fresh state would see)
    latestA.get(1L) shouldBe Sketches.hllDistinct(
        Seq(10.0, 20.0, 30.0, 40.0).toDF("value")
          .withColumn("k", F.lit(1)), Seq("k"), "value")
      .collect().head.getDouble(1)

    val wantQ = Sketches.logHistQuantiles(
        all.select(F.col("user_id"), F.col("value").cast("long")
          .as("value")), Seq("user_id"), "value", Seq(0.5, 1.0))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    latestQ.asScala.toMap shouldBe wantQ
    // n_total = 5 for user 1 proves phase-1 counts survived the restart
    latestQ.get((1L, 1.0))._2 shouldBe 5L
  }

  test("mid-batch crash AFTER the sink write: the restart re-executes the " +
    "same batchId (sink called twice) and per-batchId overwrite is what " +
    "keeps the output duplicate-free") {
    val inDir = tmp("graft-crash-in")
    val outDir = tmp("graft-crash-out")
    val ckDir = tmp("graft-crash-ck")

    // driver-side sink-call log + one-shot crash latch: foreachBatch
    // closures run on the driver, so plain JVM state observes them
    val sinkCalls =
      new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)

    def startQuery(injectCrash: Boolean) = {
      val stream = Streams.readEventStream(spark, inDir, inputSchema)
      Streams.curateStream(stream, "text", "ts", ref, "text")
        .writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("overwrite")
            .parquet(s"$outDir/batch=$batchId")
          sinkCalls.add(batchId)
          // crash AFTER the write, BEFORE the commit: the sink dir now
          // holds batch 0's files but the checkpoint never records it —
          // the uncommitted-batch replay path the graceful-stop variant
          // cannot reach
          if (injectCrash && crashArmed.getAndSet(false))
            throw new RuntimeException("injected mid-batch crash")
        }
        .start()
    }

    writeFile(inDir, 1, Seq(doc(1L, goodA, 0), doc(2L, goodB, 1)))
    val q1 = startQuery(injectCrash = true)
    val e = intercept[StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    e.getMessage should include("injected mid-batch crash")
    // the batch DID reach the sink before the crash
    sinkCalls.size shouldBe 1
    val crashedBatch = sinkCalls.peek()

    // restart from the same checkpoint, plus one more input file
    writeFile(inDir, 2, Seq(doc(3L, goodC, 2)))
    val q2 = startQuery(injectCrash = false)
    try q2.processAllAvailable() finally q2.stop()

    // the uncommitted batchId really executed TWICE — this is the replay
    // the idempotent sink exists for (an append sink would now hold two
    // copies of d1/d2)
    import scala.jdk.CollectionConverters._
    sinkCalls.asScala.toSeq.count(_ == crashedBatch) shouldBe 2
    val out = spark.read.option("basePath", outDir)
      .parquet(s"$outDir/batch=*")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    out.distinct.size shouldBe out.size // overwrite ate the replay
    out.sorted shouldBe Seq(1L, 2L, 3L) // and nothing was lost
  }

  test("band-index streaming ingestion is exactly-once across a crash " +
    "BETWEEN the two table commits: the restart replays the batchId, " +
    "skips the committed table, lands the missing one, and probes are " +
    "whole — no lost batch, no duplicated batch") {
    import graft.operators.{Dedup, StoreLayout}
    val idx = tmp("graft-bandstream") + "/idx"
    val inDir = tmp("graft-bandstream-in")
    val ck = tmp("graft-bandstream-ck")
    // seed corpus: two curated docs the index starts from
    val seed = {
      import spark.implicits._
      Seq((1L, goodA), (2L, goodB)).toDF("doc_id", "text")
    }
    Dedup.saveBandIndex(seed, "doc_id", "text", idx)
    def shingleIds() = StoreLayout.readStore(spark, idx)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    def bandIds() = StoreLayout.readStore(spark, s"$idx/_bands")
      .select("id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    def bandRows() = StoreLayout.readStore(spark, s"$idx/_bands").count()

    def startQuery() = Streams.ingestToBandIndexStream(
      Streams.readEventStream(spark, inDir, inputSchema)
        .select("doc_id", "text"),
      "doc_id", "text", idx, ck, autoCompactParts = 6)

    // run 1: kill in the nastiest window — after the shingle table's
    // manifest commit, before _bands's (the composite-append crash the
    // r14 verdict flagged; the streaming batchId is the healing nonce)
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
    Dedup.bandAppendFault = () =>
      if (crashArmed.getAndSet(false))
        throw new RuntimeException("injected crash between table commits")
    writeFile(inDir, 1, Seq(doc(10L, goodA + " ten", 0),
      doc(11L, goodB + " eleven", 1)))
    try {
      val q1 = startQuery()
      val e = intercept[StreamingQueryException] {
        q1.processAllAvailable()
        q1.awaitTermination()
      }
      e.getMessage should include("injected crash between table commits")
    } finally Dedup.bandAppendFault = () => ()
    // the crash window is visible: shingles committed, bands not
    shingleIds() shouldBe Seq(1L, 2L, 10L, 11L)
    bandIds() shouldBe Seq(1L, 2L)

    // run 2 from the same checkpoint: batch 0 replays under the SAME id
    // (its checkpoint commit never landed) and a new file arrives
    writeFile(inDir, 2, Seq(doc(12L, goodC + " twelve", 2)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    // exactly one copy of every doc in BOTH tables (a non-idempotent
    // replay would duplicate 10/11 in the shingle table)
    shingleIds() shouldBe Seq(1L, 2L, 10L, 11L, 12L)
    bandIds() shouldBe Seq(1L, 2L, 10L, 11L, 12L)
    val perDoc = bandRows() / 5
    bandRows() shouldBe perDoc * 5 // uniform bands per doc: no partials
    // probe wholeness: every ingested doc now near-dups its indexed
    // self, so the incremental-ingest gate drops the whole replayed set
    val reprobe = {
      import spark.implicits._
      Seq((90L, goodA + " ten"), (91L, goodB + " eleven"),
        (92L, goodC + " twelve")).toDF("doc_id", "text")
    }
    Dedup.dedupAgainstIndex(reprobe, "doc_id", "text", idx)
      .count() shouldBe 0L
  }

  test("KMV sketch-store streaming ingestion is exactly-once across a " +
    "crash AFTER the sketch append commits but BEFORE the checkpoint " +
    "commit: the restart replays the batchId, the marker no-ops it, and " +
    "the served estimate equals the batch face over ALL input") {
    import graft.operators.{Sketches, StoreLayout}
    import spark.implicits._
    val store = tmp("graft-kmvstream") + "/store"
    val inDir = tmp("graft-kmvstream-in")
    val ck = tmp("graft-kmvstream-ck")
    // seed build freezes the store's contract (k, flavor, group/value)
    val seed = (1L to 40L).map(i => (s"g${i % 2}", i))
      .toDF("grp", "v")
    Sketches.buildKmvStore(seed, Seq("grp"), "v", k = 16, store)
    def streamSchema = Seq(("g0", 1L, "2024-01-01 10:00:00"))
      .toDF("grp", "v", "ts_s")
      .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").schema
    def writeRows(n: Int, rows: Seq[(String, Long, String)]): Unit = {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-kmvstream-scratch$n").toString
      rows.toDF("grp", "v", "ts_s")
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"f$n.parquet"))
    }
    def servedParts() = StoreLayout.fsFor(spark, store) match {
      case (fs, p) => StoreLayout.servingFiles(fs, p).size
    }
    def startQuery() = Streams.ingestToKmvStoreStream(
      Streams.readEventStream(spark, inDir, streamSchema)
        .select("grp", "v"),
      store, ck)

    // run 1: crash in the window AFTER the append's manifest + marker
    // commit, BEFORE foreachBatch returns — the checkpoint never records
    // the epoch, so the restart MUST replay the same batchId; only the
    // marker keeps the sketch from double-appending (a double-append is
    // silent here: a duplicated k-min part folds to the same estimate
    // only when it adds no new hashes below rank k — with fresh values
    // it skews)
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
    Sketches.storeAppendFault = () =>
      if (crashArmed.getAndSet(false))
        throw new RuntimeException("injected crash before checkpoint commit")
    val b1 = (41L to 80L).map(i => (s"g${i % 2}", i, "2024-01-01 10:00:00"))
    writeRows(1, b1)
    try {
      val q1 = startQuery()
      val e = intercept[StreamingQueryException] {
        q1.processAllAvailable()
        q1.awaitTermination()
      }
      e.getMessage should include("injected crash before checkpoint commit")
    } finally Sketches.storeAppendFault = () => ()
    // the crashed batch DID commit to the store before the injected crash
    val partsAfterCrash = servedParts()

    // run 2 from the same checkpoint: batch 0 replays under the SAME
    // nonce (marker no-op — part count must not grow from the replay),
    // then a genuinely new batch lands
    val b2 = (81L to 100L).map(i => (s"g${i % 2}", i, "2024-01-01 10:01:00"))
    writeRows(2, b2)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    servedParts() shouldBe partsAfterCrash + 1 // +file2 only, no replay dup

    // served estimate == the one-pass batch face over ALL input (k-min
    // fold is batching-independent, so any loss or duplication shows)
    val all = seed.unionByName(
      (b1 ++ b2).map(r => (r._1, r._2)).toDF("grp", "v"))
    val fromStore = Sketches.kmvDistinctFromStore(spark, store)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val direct = Sketches.kmvDistinct(all, Seq("grp"), "v", k = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    fromStore shouldBe direct
  }

  test("IVF-index streaming ingestion is exactly-once across a crash " +
    "in the nastiest window (parts renamed in, manifest not committed): " +
    "the restart replays the batchId, sweeps the torn attempt, lands " +
    "the batch once — probes exact, no lost or duplicated vectors") {
    import graft.operators.{Similarity, StoreLayout}
    import spark.implicits._
    val idx = tmp("graft-ivfstream") + "/idx"
    val inDir = tmp("graft-ivfstream-in")
    val ck = tmp("graft-ivfstream-ck")
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(i => math.sin(seed * 31 + i).abs + 0.1)
    // seed corpus: the build trains the frozen quantizer
    Similarity.buildIvfIndex(
      Seq((1L, vec(1)), (2L, vec(2)), (3L, vec(3)), (4L, vec(4)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, nCentroids = 2)
    def vecSchema = Seq((1L, vec(1), "2024-01-01 10:00:00"))
      .toDF("vec_id", "embedding", "ts_s")
      .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").schema
    def writeVecFile(n: Int, rows: Seq[(Long, Seq[Double], String)]): Unit = {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-ivfstream-scratch$n").toString
      rows.toDF("vec_id", "embedding", "ts_s")
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"f$n.parquet"))
    }
    def storedIds() = StoreLayout.fsFor(spark, idx) match {
      case (fs, p) =>
        val files = StoreLayout.servingFiles(fs, p)
        spark.read.option("basePath", idx)
          .parquet(files.map(n =>
            new org.apache.hadoop.fs.Path(p, n).toString): _*)
          .select("cand_id").collect().map(_.getLong(0)).sorted.toSeq
    }
    def startQuery() = Streams.ingestToIvfIndexStream(
      Streams.readEventStream(spark, inDir, vecSchema)
        .select("vec_id", "embedding"),
      "vec_id", "embedding", idx, ck, autoCompactParts = 6)

    // run 1: crash AFTER the batch's parts are renamed into the live
    // __list= dirs but BEFORE the manifest commit — the torn state a
    // plain mode("append") would serve immediately
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
    Similarity.ivfAppendFault = () =>
      if (crashArmed.getAndSet(false))
        throw new RuntimeException("injected crash before manifest commit")
    writeVecFile(1, Seq((10L, vec(10), "2024-01-01 10:00:00"),
      (11L, vec(11), "2024-01-01 10:01:00")))
    try {
      val q1 = startQuery()
      val e = intercept[StreamingQueryException] {
        q1.processAllAvailable()
        q1.awaitTermination()
      }
      e.getMessage should include("injected crash before manifest commit")
    } finally Similarity.ivfAppendFault = () => ()
    // the torn attempt is invisible: manifest-pinned serving still reads
    // the seed corpus only
    storedIds() shouldBe Seq(1L, 2L, 3L, 4L)

    // run 2 from the same checkpoint: batch 0 replays under the SAME
    // nonce (its epoch never committed) and a new file arrives
    writeVecFile(2, Seq((12L, vec(12), "2024-01-01 10:02:00")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    // exactly one copy of every vector (the replay swept the torn
    // attempt's renamed parts before re-landing the batch)
    storedIds() shouldBe Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L)
    // probe wholeness: an exhaustive probe must equal brute force over
    // the full corpus, including the replayed and post-crash batches
    val all = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L)
      .map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val queries = Seq((10L, vec(10)), (12L, vec(12)))
      .toDF("vec_id", "embedding")
    Similarity.probeIvfIndex(spark, idx, queries, "vec_id", "embedding",
        k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Similarity.bruteForceTopK(queries, all, "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("IVF-PQ streaming ingestion: streamed vectors are ADC-scorable, " +
    "restart from the checkpoint neither loses nor duplicates a batch") {
    import graft.operators.Similarity
    import spark.implicits._
    val idx = tmp("graft-ivfpqstream") + "/idx"
    val inDir = tmp("graft-ivfpqstream-in")
    val ck = tmp("graft-ivfpqstream-ck")
    def vec(seed: Long): Seq[Double] =
      (0 until 8).map(i => math.sin(seed * 31 + i).abs + 0.1)
    Similarity.buildIvfPqIndex(
      (1L to 6L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, dim = 8, nCentroids = 2, m = 4, ksub = 4)
    def vecSchema = Seq((1L, vec(1), "2024-01-01 10:00:00"))
      .toDF("vec_id", "embedding", "ts_s")
      .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").schema
    def writeVecFile(n: Int, rows: Seq[(Long, Seq[Double], String)]): Unit = {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-ivfpqstream-scratch$n").toString
      rows.toDF("vec_id", "embedding", "ts_s")
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"f$n.parquet"))
    }
    def startQuery() = Streams.ingestToIvfPqIndexStream(
      Streams.readEventStream(spark, inDir, vecSchema)
        .select("vec_id", "embedding"),
      "vec_id", "embedding", idx, ck, autoCompactParts = 4)
    writeVecFile(1, Seq((10L, vec(10), "2024-01-01 10:00:00")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // restart the SAME checkpoint with one more file: the committed
    // batch must not re-land, the new one must
    writeVecFile(2, Seq((11L, vec(11), "2024-01-01 10:01:00")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    spark.read.parquet(idx).select("cand_id").collect()
      .map(_.getLong(0)).sorted.toSeq shouldBe (1L to 6L) ++ Seq(10L, 11L)
    // streamed rows are ADC-scorable: exhaustive probe with an
    // all-covering shortlist == brute force over the union
    val all = ((1L to 6L) ++ Seq(10L, 11L)).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, vec(10)), (11L, vec(11)))
      .toDF("vec_id", "embedding")
    Similarity.probeIvfPqIndex(spark, idx, queries, "vec_id", "embedding",
        k = 3, nProbe = 2, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Similarity.bruteForceTopK(queries, all, "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  // ---- TTL × restart (round-13 verdict "next round #2") --------------------
  //
  // StreamingTtlSpec proves eviction; the tests above prove recovery;
  // these prove their INTERACTION: a kill that lands while a key's
  // idle-timeout is ARMED but not yet fired. The timeout timestamp
  // lives in the state store and the watermark in the commit log, so
  // the restarted query must re-derive the SAME eviction at the SAME
  // event-time horizon (t_lastEvent + idleHorizon), flush exactly once,
  // with post-restart estimates equal to the batch face — the spot
  // where deterministic-eviction claims go to die if timeout state were
  // rebuilt empty or re-armed off the restart clock.

  /** The shared script: phase 1 (query run 1) arms key 1's eviction at
    * t2 + 30m = t32 and is KILLED before any watermark reaches it;
    * phase 2 (run 2, restarted from the checkpoint) advances the
    * watermark past t32 with key-2 traffic only, so the pending
    * eviction can only fire from RECOVERED timeout state; phase 3
    * (same run) returns key 1, which must start fresh.
    */
  private def ttlRestartRows(face: DataFrame => DataFrame, mode: String,
      tag: String): Seq[(Int, Long, Row)] = {
    import spark.implicits._
    val inDir = tmp(s"graft-ttlrec-$tag-in")
    val ck = tmp(s"graft-ttlrec-$tag-ck")
    def eventSchema = Seq((1L, 1.0, "2024-01-01 10:00:00"))
      .toDF("user_id", "value", "ts_s")
      .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").schema
    def writeEvents(n: Int, rows: Seq[(Long, Double, String)]): Unit = {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"graft-ttlrec-$tag-scratch$n").toString
      rows.toDF("user_id", "value", "ts_s")
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"f$n.parquet"))
    }
    val cap =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Row)]
    def start(run: Int) = {
      val s = Streams.readEventStream(spark, inDir, eventSchema)
      face(s).writeStream.option("checkpointLocation", ck)
        .outputMode(mode)
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.collect().foreach(r => cap.add((run, id, r))); ()
        }
        .start()
    }
    // phase 1: key 1 sees {10,20,30} up to t2 (timeout arms at t32);
    // key 2 sees 10 @ t0. Watermark after this run ≈ t2 - 10m — far
    // below the horizon. Then KILL.
    writeEvents(1, Seq((1L, 10.0, "2024-01-01 10:00:00"),
      (1L, 20.0, "2024-01-01 10:01:00"), (1L, 30.0, "2024-01-01 10:02:00"),
      (2L, 10.0, "2024-01-01 10:00:30")))
    val q1 = start(1)
    try q1.processAllAvailable() finally q1.stop()
    // phase 2 (after the kill): key 2 @ t50 pushes the watermark to
    // t40 > t32 — the recovered timeout must fire now; phase 3: key 1
    // returns @ t55 and must be FRESH
    writeEvents(2, Seq((2L, 20.0, "2024-01-01 10:50:00")))
    val q2 = start(2)
    try {
      q2.processAllAvailable()
      writeEvents(3, Seq((1L, 10.0, "2024-01-01 10:55:00")))
      q2.processAllAvailable()
    } finally q2.stop()
    import scala.jdk.CollectionConverters._
    cap.asScala.toSeq
  }

  /** Asserts the distinct-face contract over [[ttlRestartRows]] output
    * (columns: user_id, est_distinct, is_final) — shared by the default
    * and RocksDB provider runs.
    */
  private def assertTtlDistinctRestart(tag: String): Unit = {
    import spark.implicits._
    import graft.operators.Sketches
    val rows = ttlRestartRows(
      Streams.runningApproxDistinctTtl(_, "user_id", "value", "ts",
        lateness = "10 minutes", idleHorizon = "30 minutes"),
      mode = "update", tag = tag)
    def est(vs: Double*) = Sketches.hllDistinct(
        vs.toDF("value").withColumn("k", F.lit(1)), Seq("k"), "value")
      .collect().head.getDouble(1)
    // run 1 fired nothing: the kill landed with the timeout ARMED
    rows.filter(_._1 == 1).foreach(t => t._3.getBoolean(2) shouldBe false)
    // the pending eviction fired AFTER the restart, exactly once, with
    // the PRE-KILL registers (est over {10,20,30} — a rebuilt-empty
    // state or a re-armed horizon would emit nothing or a wrong est)
    val finals = rows.filter(_._3.getBoolean(2))
    finals.map(t => (t._1, t._3.getLong(0))) shouldBe Seq((2, 1L))
    finals.head._3.getDouble(1) shouldBe est(10.0, 20.0, 30.0)
    // key 1's return (phase 3, strictly after the flush batch) is FRESH
    val k1Live = rows.filter(t =>
      t._1 == 2 && t._3.getLong(0) == 1L && !t._3.getBoolean(2))
    k1Live should have size 1
    k1Live.head._2 should be > finals.head._2
    k1Live.head._3.getDouble(1) shouldBe est(10.0)
    // key 2 never evicted; post-restart estimate == batch face over ALL
    // of its input ({10 @ t0} before the kill + {20 @ t50} after)
    val k2 = rows.filter(t => t._3.getLong(0) == 2L)
    k2.foreach(t => t._3.getBoolean(2) shouldBe false)
    k2.filter(_._1 == 2).last._3.getDouble(1) shouldBe est(10.0, 20.0)
  }

  test("TTL × restart: an ARMED idle-timeout survives a kill — the " +
    "restarted query fires the same event-time eviction from recovered " +
    "state, flushes exactly once, estimates match the batch face") {
    assertTtlDistinctRestart("dflt")
  }

  test("TTL × restart for runningQuantilesTtl: recovered bucket maps " +
    "flush once at the recovered horizon; the returned key is fresh") {
    import graft.operators.Sketches
    val rows = ttlRestartRows(
      Streams.runningQuantilesTtl(_, "user_id", "value", "ts",
        qs = Seq(0.5, 1.0), lateness = "10 minutes",
        idleHorizon = "30 minutes"),
      mode = "append", tag = "qtl")
    // columns: user_id, q, est_value, n_total, is_final
    rows.filter(_._1 == 1).foreach(t => t._3.getBoolean(4) shouldBe false)
    val finals = rows.filter(_._3.getBoolean(4))
    // exactly one flush per quantile, in run 2, totals = the 3 pre-kill
    // values, bucket values equal the batch face over {10,20,30}
    finals.map(t => (t._1, t._3.getLong(0), t._3.getLong(3))) shouldBe
      Seq((2, 1L, 3L), (2, 1L, 3L))
    val batchQ = {
      import spark.implicits._
      Sketches.logHistQuantiles(
          Seq(10L, 20L, 30L).toDF("value").withColumn("k", F.lit(1)),
          Seq("k"), "value", Seq(0.5, 1.0))
        .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    }
    finals.map(t => t._3.getDouble(1) -> t._3.getLong(2)).toMap shouldBe
      batchQ
    // the returned key is fresh: n_total restarts at 1
    val k1Live = rows.filter(t => t._1 == 2 && t._3.getLong(0) == 1L &&
      !t._3.getBoolean(4))
    k1Live.map(_._3.getLong(3)).distinct shouldBe Seq(1L)
    k1Live.foreach(t => t._2 should be > finals.head._2)
  }

  test("TTL × restart under the RocksDB state store provider — the " +
    "production state backend for 100 TB key counts (config: " +
    "spark.sql.streaming.stateStore.providerClass)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try assertTtlDistinctRestart("rocks")
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
