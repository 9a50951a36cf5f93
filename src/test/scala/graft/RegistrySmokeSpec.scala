package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Executes EVERY registry query end-to-end at sf0.001 — the cheap local
  * stand-in for the driver's correctness gate. Value-level correctness is
  * the DuckDB oracle's job; this spec guarantees the whole registry stays
  * RUNNABLE between gate runs (a single broken query is a round-killing
  * failure class: an unexecutable registry entry fails the entire gate).
  * One test per query so a breakage names its query directly.
  */
class RegistrySmokeSpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  // Queries whose correct result CAN be empty at this scale factor would
  // need a weaker assertion; currently every registry query returns rows
  // at sf0.001, so emptiness is treated as a regression.
  Queries.registry.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"$name executes and returns rows at sf0.001") {
      val n = q(spark, sf).count()
      withClue(s"$name returned no rows: ") { n should be > 0L }
    }
  }

  // the bench-only kernel twins must stay RUNNABLE too: a broken twin
  // would poison BENCH_r{N} with -1s even though the correctness gate
  // stays green
  Queries.kernelTwins.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"$name (bench-only twin) executes and returns rows at sf0.001") {
      val n = q(spark, sf).count()
      withClue(s"$name returned no rows: ") { n should be > 0L }
    }
  }

  test("every registry query with an oracle is actually in the registry") {
    val dangling = Queries.oracles.keySet -- Queries.registry.keySet
    dangling shouldBe empty
  }

  test("bench registry = correctness registry + exactly the kernel twins") {
    // every oracle-gated query is benched…
    (Queries.registry.keySet -- Queries.benchRegistry.keySet) shouldBe empty
    // …the only bench-only entries are the declared twins…
    (Queries.benchRegistry.keySet -- Queries.registry.keySet) shouldBe
      Queries.kernelTwins.keySet
    // …and a twin name can never shadow a correctness entry
    Queries.kernelTwins.keySet.intersect(Queries.registry.keySet) shouldBe empty
  }
}
