package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Sketches
import graft.streaming.Streams

/** Idle-key eviction for the stateful streaming faces (round-12 verdict
  * "next round #1"): the ...Ttl variants must (a) evict a key whose
  * event-time horizon the watermark has passed — emitting one final
  * flush row where the face defines one — while leaving active keys'
  * state untouched, (b) restart an evicted key FRESH on its next
  * arrival (the proof the state store entry is really gone), and
  * (c) degrade to the base face (+ `is_final = false`) under batch
  * execution, where timeouts never fire.
  *
  * Eviction is EVENT-time (armed at the key's last event + horizon,
  * clamped above the watermark), so every scenario here is
  * deterministic: the same input batches produce the same evictions on
  * every run — no sleeps, no wall clocks.
  */
class StreamingTtlSpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark

  import StreamingTtlSpec.Sev

  private val base = Timestamp.valueOf("2024-01-01 10:00:00")
  private def ts(minute: Int): Timestamp =
    new Timestamp(base.getTime + minute * 60000L)

  /** Run a streaming face over scripted micro-batches, capturing each
    * batch's rows via foreachBatch (driver-side), and return them in
    * batch order. `mode` is "update" for the mapGroupsWithState faces,
    * "append" for the flatMapGroupsWithState(Append) ones — Spark
    * rejects a mismatch.
    */
  private def runBatches[T <: Product : org.apache.spark.sql.Encoder](
      batches: Seq[Seq[T]], mode: String = "update")(
      face: DataFrame => DataFrame): Seq[(Long, Seq[Row])] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[T]
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Row])]
    val q = face(ms.toDF)
      .writeStream
      .outputMode(mode)
      .foreachBatch { (df: DataFrame, id: Long) =>
        captured.add((id, df.collect().toSeq)); ()
      }
      .start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    import scala.jdk.CollectionConverters._
    captured.asScala.toSeq.sortBy(_._1)
  }

  // the scripted scenario shared by the eviction tests: key 1 goes idle
  // and must evict; key 2 stays active across the horizon; key 1 then
  // returns and must start fresh. lateness 10m, idleHorizon 30m.
  //   b0: key1 ×3 values @t0..t2 (armed t2+30 = t32)
  //       key2 ×2 values @t0,t1
  //   b1: key2 @t50 (re-armed t80); watermark still ~epoch
  //   b2: key99 @t60 → batch starts at wm = t50-10 = t40 > t32:
  //       key1 EVICTS (final flush), key2 (t80) survives
  //   b3: key1 returns @t55 with an ALREADY-SEEN value → fresh state
  private val evictionScript = Seq(
    Seq(Sev(1L, 10.0, ts(0)), Sev(1L, 20.0, ts(1)), Sev(1L, 30.0, ts(2)),
      Sev(2L, 10.0, ts(0)), Sev(2L, 20.0, ts(1))),
    Seq(Sev(2L, 30.0, ts(50))),
    Seq(Sev(99L, 1.0, ts(60))),
    Seq(Sev(1L, 10.0, ts(55))))

  /** Every eviction scenario runs under BOTH state-store providers (r14
    * verdict #5): the in-memory default and RocksDB, the production
    * backend for 100 TB key counts — the TTL contract (arm / evict /
    * flush-once / fresh-restart) must not depend on provider-specific
    * state encoding or timeout bookkeeping. Suites in this project run
    * sequentially in the forked JVM, so flipping the session conf
    * around a scenario is safe.
    */
  private val RocksProvider = "org.apache.spark.sql.execution.streaming" +
    ".state.RocksDBStateStoreProvider"

  private def withProvider(provider: Option[String])(body: => Unit): Unit =
    provider match {
      case None => body
      case Some(cls) =>
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, cls)
        try body
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
    }

  private val Providers =
    Seq("default provider" -> None, "RocksDB provider" -> Some(RocksProvider))

  for ((provTag, prov) <- Providers)
  test(s"runningApproxDistinctTtl [$provTag]: idle key flushes a final " +
    "estimate and restarts fresh; active keys keep their registers") {
    withProvider(prov) {
    import spark.implicits._
    val out = runBatches(evictionScript)(
      Streams.runningApproxDistinctTtl(_, "user_id", "value", "ts",
        lateness = "10 minutes", idleHorizon = "30 minutes"))
    def rows(pred: Row => Boolean) =
      out.flatMap { case (id, rs) => rs.filter(pred).map(id -> _) }
    val finals = rows(_.getBoolean(2))
    // exactly ONE eviction: key 1, flushing its pre-idle estimate
    finals.map(_._2.getLong(0)) shouldBe Seq(1L)
    val batchEst3 = Sketches.hllDistinct(
        Seq(10.0, 20.0, 30.0).toDF("value").withColumn("k", F.lit(1)),
        Seq("k"), "value")
      .collect().head.getDouble(1)
    finals.head._2.getDouble(1) shouldBe batchEst3
    // the flush happened once the watermark passed key 1's horizon —
    // after key 2's t50 batch, before key 1's return batch (Spark may
    // run it in an extra no-data micro-batch after the watermark moves,
    // so only the ordering is pinned, not a batch id)
    finals.head._1 should be > out(1)._1
    finals.head._1 should be < out.last._1
    // key 1's return starts FRESH: estimate of ONE value, not four
    val k1After = rows(r => r.getLong(0) == 1L && !r.getBoolean(2))
      .filter(_._1 > finals.head._1)
    k1After should have size 1
    val batchEst1 = Sketches.hllDistinct(
        Seq(10.0).toDF("value").withColumn("k", F.lit(1)), Seq("k"), "value")
      .collect().head.getDouble(1)
    k1After.head._2.getDouble(1) shouldBe batchEst1
    // key 2 never evicted; its live estimates grew monotonically to 3
    rows(r => r.getLong(0) == 2L).map(_._2.getBoolean(2))
      .forall(_ == false) shouldBe true
    val batchEst2 = Sketches.hllDistinct(
        Seq(10.0, 20.0, 30.0).toDF("value").withColumn("k", F.lit(1)),
        Seq("k"), "value")
      .collect().head.getDouble(1)
    rows(r => r.getLong(0) == 2L).last._2.getDouble(1) shouldBe batchEst2
    }
  }

  for ((provTag, prov) <- Providers)
  test(s"runningQuantilesTtl [$provTag]: idle key flushes final quantile " +
    "rows and restarts with a fresh histogram") {
    withProvider(prov) {
    import spark.implicits._
    val out = runBatches(evictionScript, mode = "append")(
      Streams.runningQuantilesTtl(_, "user_id", "value", "ts",
        qs = Seq(0.5, 1.0), lateness = "10 minutes",
        idleHorizon = "30 minutes"))
    val all = out.flatMap { case (id, rs) => rs.map(id -> _) }
    val finals = all.filter(_._2.getBoolean(4))
    // one evicted key → one final row per quantile, totals = 3 values
    finals.map(_._2.getLong(0)).distinct shouldBe Seq(1L)
    finals should have size 2
    all.filter(t => t._2.getLong(0) == 2L)
      .forall(!_._2.getBoolean(4)) shouldBe true
    finals.map(_._2.getLong(3)).distinct shouldBe Seq(3L)
    // flush values match the batch face over the pre-idle rows
    val batchQ = Sketches.logHistQuantiles(
        { import spark.implicits._
          Seq(10L, 20L, 30L).toDF("value").withColumn("k", F.lit(1)) },
        Seq("k"), "value", Seq(0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    finals.map(t => t._2.getDouble(1) -> t._2.getLong(2)).toMap shouldBe
      batchQ
    // the returned key starts a FRESH histogram: n_total = 1
    val k1After = all.filter(t => t._2.getLong(0) == 1L &&
      !t._2.getBoolean(4) && t._1 > finals.head._1)
    k1After.map(_._2.getLong(3)).distinct shouldBe Seq(1L)
    }
  }

  for ((provTag, prov) <- Providers)
  test(s"runningUserTotalsTtl + highValueAlertsTtl [$provTag]: idle " +
    "counters evict (flush row / silent drop) and restart fresh") {
    withProvider(prov) {
    import spark.implicits._
    val totals = runBatches(evictionScript)(
      Streams.runningUserTotalsTtl(_, lateness = "10 minutes",
        idleHorizon = "30 minutes"))
    val tAll = totals.flatMap { case (id, rs) => rs.map(id -> _) }
    val tFinals = tAll.filter(_._2.getBoolean(3))
    tFinals.map(t => (t._2.getLong(0), t._2.getLong(1),
      t._2.getDouble(2))) shouldBe Seq((1L, 3L, 60.0))
    // fresh restart: n_events back to 1
    tAll.filter(t => t._2.getLong(0) == 1L && t._1 > tFinals.head._1 &&
        !t._2.getBoolean(3))
      .map(_._2.getLong(1)) shouldBe Seq(1L)

    // alerts: threshold 15 → key 1 alerts on 20,30 pre-idle; its counter
    // evicts silently; post-return 10.0 is below threshold (no row), but
    // a fresh high value would restart at 1 — script a 5th batch.
    // (Aev mirrors the eviction script with event ids.)
    import StreamingTtlSpec.Aev
    val aScript = evictionScript.zipWithIndex.map { case (b, i) =>
      b.zipWithIndex.map { case (e, j) =>
        Aev(e.user_id, i * 100L + j, e.value, e.ts)
      }
    } :+ Seq(Aev(1L, 500L, 25.0, ts(56)))
    val alerts = runBatches(aScript, mode = "append")(
      Streams.highValueAlertsTtl(_, threshold = 15.0,
        lateness = "10 minutes", idleHorizon = "30 minutes"))
    val aAll = alerts.flatMap(_._2)
    // pre-idle running counts reached 2; the post-eviction alert
    // restarts at 1 — the state really died
    aAll.map(r => (r.getLong(0), r.getDouble(2), r.getLong(3))) should
      contain allOf ((1L, 20.0, 1L), (1L, 30.0, 2L), (1L, 25.0, 1L))
    }
  }

  test("batch execution: TTL faces == base faces + is_final=false " +
    "(timeouts never fire, oracle story carries over)") {
    import spark.implicits._
    val batch = evictionScript.flatten.toDF()
    def canon(df: DataFrame, cols: Int) = df.collect()
      .map(r => (0 until cols).map(r.get).toList).sortBy(_.toString).toSeq

    val totalsTtl = Streams.runningUserTotalsTtl(batch)
    totalsTtl.collect().forall(!_.getBoolean(3)) shouldBe true
    canon(totalsTtl.drop("is_final"), 3) shouldBe
      canon(Streams.runningUserTotals(batch), 3)

    val adTtl = Streams
      .runningApproxDistinctTtl(batch, "user_id", "value", "ts")
    adTtl.collect().forall(!_.getBoolean(2)) shouldBe true
    canon(adTtl.drop("is_final"), 2) shouldBe
      canon(Streams.runningApproxDistinct(batch, "user_id", "value"), 2)

    val qTtl = Streams.runningQuantilesTtl(batch, "user_id", "value",
      "ts", Seq(0.5, 0.99))
    qTtl.collect().forall(!_.getBoolean(4)) shouldBe true
    canon(qTtl.drop("is_final"), 4) shouldBe
      canon(Streams.runningQuantiles(batch, "user_id", "value",
        Seq(0.5, 0.99)), 4)

    val aBatch = evictionScript.flatten.zipWithIndex
      .map { case (e, i) => StreamingTtlSpec.Aev(e.user_id, i.toLong,
        e.value, e.ts) }
      .toDF()
    val aTtl = Streams.highValueAlertsTtl(aBatch, threshold = 15.0)
    canon(aTtl, 4) shouldBe
      canon(Streams.highValueAlerts(aBatch, threshold = 15.0), 4)

    // a null event time must not crash the TTL decode (the primitive
    // unix_millis(ts) path) — the row is dropped: it has no place on an
    // event-time clock. (The base faces never read ts and keep it.)
    val withNull = batch.union(
      Seq((7L, 1.0, null: java.sql.Timestamp)).toDF("user_id", "value", "ts"))
    Streams.runningApproxDistinctTtl(withNull, "user_id", "value", "ts")
      .filter(F.col("user_id") === 7L).count() shouldBe 0
    Streams.runningQuantilesTtl(withNull, "user_id", "value", "ts", Seq(0.5))
      .filter(F.col("user_id") === 7L).count() shouldBe 0
    Streams.runningUserTotalsTtl(withNull)
      .filter(F.col("user_id") === 7L).count() shouldBe 0
  }
}

object StreamingTtlSpec {
  // top-level case classes: encoders for classes nested in the Spec fail
  case class Sev(user_id: Long, value: Double, ts: java.sql.Timestamp)
  case class Aev(user_id: Long, event_id: Long, value: Double,
    ts: java.sql.Timestamp)
}
