package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Multi-session concurrency smoke (round-12 verdict #6):
  * `GraftExtensions.register` is PER-SESSION, several operators carefully
  * register on the owning session (`Similarity.scala` registers on
  * `df.sparkSession`, not a captured one), and the fit-once artifact
  * caches (SemDeDup centroids, IVF-PQ index dirs, BPE merges, gate
  * blooms) are process-wide ConcurrentHashMaps whose builders run inside
  * `computeIfAbsent` — none of which was ever exercised from two
  * sessions at once. This spec runs a representative registry slice
  * (every risk class: native-kernel text ops, extension-registering
  * similarity ops, artifact-cached ops, KFrame chains, null chains) on
  * TWO `newSession()`s CONCURRENTLY with interleaved (shifted) query
  * order, then checks both sessions computed identical row counts.
  *
  * What a failure here would mean: an extension registered on the wrong
  * session (UNRESOLVED_FUNCTION on the other), a builder racing outside
  * its cache's atomicity (corrupt artifact), or session-conf bleed.
  */
class MultiSessionSpec extends AnyFunSuite with Matchers {

  lazy val base = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  /** One query per risk class; kernel twins and heavy faces included. */
  val names = Vector(
    "q1_agg", // plain DataFrame agg
    "q_groupagg_sum", // KFrame chain (carried state)
    "q_fuzz_null_agg", // null-semantics chain
    "q_cast_pivot", // pivotedWide (guardedTupleKey codegen)
    "q_dedup_exact", // hash dedup
    "q_dedup_near", // MinHash banded join (ShingleHash/MinHashSig kernels)
    "q_dedup_simhash", // SimHash64 kernel
    "q_knn", // brute-force ANN (extension-registering)
    "q_knn_lsh", // SRP-LSH
    "q_semdedup_fixed", // fit-once quantized-centroid cache
    "q_text_quality", // text battery kernels
    "q_gopher", // GopherStats kernel
    "q_bm25", // tf-idf/BM25 shuffle shape
    "q_curate", // 5-stage curation chain
    "q_pack") // packing

  test("two parallel sessions run an interleaved registry slice with " +
    "identical results (per-session extensions + shared fit-once caches)") {
    val s1 = base.newSession()
    val s2 = base.newSession()
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      def runAll(s: org.apache.spark.sql.SparkSession, shift: Int) =
        Future {
          names.indices.map { i =>
            val n = names((i + shift) % names.size)
            n -> Queries.registry(n)(s, sf).count()
          }.toMap
        }
      // shifted order maximizes cross-session interleaving of DIFFERENT
      // queries (both sessions racing the same fit-once builder AND
      // running disjoint plans simultaneously)
      val f1 = runAll(s1, 0)
      val f2 = runAll(s2, names.size / 2)
      val r1 = Await.result(f1, 10.minutes)
      val r2 = Await.result(f2, 10.minutes)
      names.foreach { n =>
        withClue(s"$n rows (session1 vs session2): ") {
          r1(n) shouldBe r2(n)
        }
        withClue(s"$n rows: ") { r1(n) should be > 0L }
      }
    } finally pool.shutdown()
  }
}
