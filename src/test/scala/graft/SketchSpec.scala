package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Sketches

/** Deterministic sketches (operators/Sketches.scala): the KMV bounded
  * aggregate against its built-in-composed baseline and against exact
  * distinct counts; the CMS grid's upper-bound and partitioning-invariance
  * contracts. The registry faces (q_kmv_distinct, q_cms_probe) are
  * additionally DuckDB-oracle-checked end to end.
  */
class SketchSpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = Tables.events(spark, sf)
    .filter(F.col("user_id").isNotNull)

  test("KMV kernel equals the composed built-in baseline (k-min sets)") {
    for (k <- Seq(4, 64); hash <- Seq(Sketches.md5Hash32 _,
        Sketches.xx64Hash32 _)) {
      val kernel = Sketches.kmvSketch(events, Seq("event_type"), "user_id",
          k, hash)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val composed = Sketches.kmvSketchComposed(events, Seq("event_type"),
          "user_id", k, hash)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      composed.keySet shouldBe kernel.keySet
      for ((g, ks) <- kernel) {
        ks shouldBe composed(g)
        ks shouldBe ks.sorted
        ks.distinct.size shouldBe ks.size
        ks.size should be <= k
      }
    }
  }

  test("KMV estimate: exact below saturation, bounded error above") {
    // sf0.001 has 15 distinct users per event type: k=64 stays under
    // saturation -> the estimate IS the exact distinct count
    val under = Sketches.kmvDistinct(events, Seq("event_type"), "user_id",
        k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(F.count_distinct(F.col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    under.keySet shouldBe exact.keySet
    for ((g, est) <- under) est shouldBe exact(g).toDouble
    // k=4 saturates (15 > 4): the ratio estimator engages; with k this
    // small the variance is large, so pin only a loose sanity band
    val over = Sketches.kmvDistinct(events, Seq("event_type"), "user_id",
        k = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((g, est) <- over) {
      est should be > 3.0
      est should be < exact(g) * 20.0
    }
  }

  test("KMV is partitioning-invariant (merge correctness)") {
    val base = Sketches.kmvDistinct(events, Seq("event_type"), "user_id",
      k = 8).collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    for (p <- Seq(1, 7, 32)) {
      val rep = Sketches.kmvDistinct(events.repartition(p),
          Seq("event_type"), "user_id", k = 8)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      rep shouldBe base
    }
  }

  test("KMV skips nulls and accepts an empty group set (global sketch)") {
    val withNulls = Tables.events(spark, sf).withColumn("user_id",
      F.when(F.col("event_id") % 3 === 0, F.lit(null)).otherwise(F.col("user_id")))
    val global = Sketches.kmvDistinct(withNulls, Nil, "user_id", k = 1024)
      .collect()
    global.length shouldBe 1
    val exact = withNulls.filter(F.col("user_id").isNotNull)
      .agg(F.count_distinct(F.col("user_id"))).head().getLong(0)
    global.head.getDouble(0) shouldBe exact.toDouble
  }

  test("CMS estimates are an upper bound on exact counts, exact when alone") {
    val toks = Tables.documents(spark, sf)
      .select(F.explode(graft.operators.TextAnalysis.tokens(F.col("text")))
        .as("tok"))
    val cands = Seq("join", "hash", "zzzunseen")
    val d = 4; val w = 2048
    val sketch = Sketches.cmsSketch(toks, "tok", d, w)
    val est = Sketches.cmsEstimate(sketch, cands, d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.filter(F.col("tok").isin(cands: _*))
      .groupBy("tok").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.keySet shouldBe cands.toSet
    for (c <- cands) est(c) should be >= exact.getOrElse(c, 0L)
    // a sketch over ONLY one token has no colliding mass: estimate exact
    val solo = Sketches.cmsEstimate(
      Sketches.cmsSketch(toks.filter(F.col("tok") === "join"), "tok", d, w),
      Seq("join"), d, w).head().getLong(1)
    solo shouldBe exact("join")
  }

  test("CMS grid is bounded by depth*width and partitioning-invariant") {
    val toks = Tables.documents(spark, sf)
      .select(F.explode(graft.operators.TextAnalysis.tokens(F.col("text")))
        .as("tok"))
    val d = 4; val w = 64 // narrow grid: every cell occupied, heavy collisions
    val sketch = Sketches.cmsSketch(toks, "tok", d, w)
    sketch.count() should be <= (d * w).toLong
    // total mass per row j = total token occurrences
    val total = toks.count()
    val perRow = sketch.groupBy("j").agg(F.sum("n").as("s"))
      .collect().map(_.getLong(1)).toSeq
    perRow.size shouldBe d
    all(perRow) shouldBe total
    val rep = Sketches.cmsSketch(toks.repartition(13), "tok", d, w)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val base = sketch
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    rep shouldBe base
  }
}
