package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.{functions => F}

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
  */
class StreamingRecoverySpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark

  test("curateStream + idempotent foreachBatch sink: kill/restart across " +
    "micro-batches loses nothing, duplicates nothing, keeps dedup state") {
    import spark.implicits._
    val ref = Seq(("this is the known curated reference document that " +
      "we already have stored with many plain words inside"))
      .toDF("text")
    def doc(id: Long, text: String, minute: Int) =
      (id, text, f"2024-01-01 10:$minute%02d:00")
    val goodA = "this is a perfectly reasonable document with plenty of " +
      "normal words and a decent length for the quality gate to accept"
    val goodB = "another entirely different piece of writing whose " +
      "vocabulary and sentence shape pass every quality threshold easily"
    val goodC = "a third unique article containing sufficiently many " +
      "ordinary terms to clear the gate without any trouble at all"

    val inDir = java.nio.file.Files.createTempDirectory("graft-rec-in")
      .toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-rec-out")
      .toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-rec-ck")
      .toString

    def writeFile(n: Int, docs: Seq[(Long, String, String)]): Unit = {
      // the file source watches a FLAT dir: write to a scratch dir and
      // move the single part file in as fN.parquet
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

    val schema = Seq((1L, "x", "2024-01-01 10:00:00"))
      .toDF("doc_id", "text", "ts_s")
      .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").schema

    def startQuery() = {
      val stream = Streams.readEventStream(spark, inDir, schema)
      Streams.curateStream(stream, "text", "ts", ref, "text")
        .writeStream
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          // idempotent sink: a replayed batchId OVERWRITES its own
          // directory instead of appending a duplicate copy
          batch.write.mode("overwrite")
            .parquet(s"$outDir/batch=$batchId")
        }
        .start()
    }

    // phase 1: two input files -> d1 survives, d2 fails quality,
    // d3 survives, d4 is a within-stream dup of d1
    writeFile(1, Seq(doc(1L, goodA, 0), doc(2L, "x@#", 1)))
    writeFile(2, Seq(doc(3L, goodB, 2), doc(4L, goodA + "!", 3)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop() // graceful "kill"

    // phase 2 (AFTER the stop): d5 duplicates d1 across the restart —
    // only recovered checkpoint state can catch it; d6 survives; d7 is
    // the static-reference doc re-cased -> gated
    writeFile(3, Seq(doc(5L, goodA.toUpperCase, 4), doc(6L, goodC, 5),
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
}
