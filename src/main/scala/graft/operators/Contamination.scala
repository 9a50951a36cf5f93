package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.{functions => F}

/** Test-set contamination control — the standard pre-training step that
  * finds (and removes) training documents sharing long word n-grams with an
  * evaluation/benchmark corpus (extension scope; cf. the n-gram overlap
  * decontamination described in public LLM training reports).
  *
  * Scale design: both sides reduce to EXPLODED 64-bit shingle hashes
  * ([[Dedup.hashedShingles]] — native codegen'd kernel, shingle strings
  * never materialized), the benchmark side is distinct-deduped (a benchmark
  * suite is tiny next to a training corpus, so AQE broadcasts it), and the
  * check is a hash equi-join + per-doc count — no cartesian anywhere, the
  * corpus is scanned once.
  */
object Contamination {

  /** Per-document benchmark-overlap hits: (idCol, hits) where `hits` =
    * number of the doc's DISTINCT n-gram shingles that appear anywhere in
    * the benchmark corpus. Docs with zero overlap are absent. `n` = 8 by
    * default (long n-grams: overlap is then near-certain contamination,
    * not phrase reuse).
    */
  def contaminationHits(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    // register into the sessions that OWN the frames (the Column-builder
    // fallback uses SparkSession.active, wrong in multi-session apps)
    graft.plans.GraftExtensions.register(docs.sparkSession)
    graft.plans.GraftExtensions.register(bench.sparkSession)
    val docSh = docs.select(F.col(idCol),
        F.explode(Dedup.hashedShingles(F.col(textCol), n)).as("__sh"))
    val benchSh = bench.select(
        F.explode(Dedup.hashedShingles(F.col(benchTextCol), n)).as("__sh"))
      .distinct()
    docSh.join(benchSh, "__sh")
      .groupBy(idCol)
      .agg(F.count(F.lit(1)).as("hits"))
  }

  /** Drop every training doc with at least `minHits` benchmark-overlapping
    * n-grams (anti-join against [[contaminationHits]]).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      minHits: Long = 1L): DataFrame = {
    val bad = contaminationHits(docs, idCol, textCol, bench, benchTextCol, n)
      .filter(F.col("hits") >= minHits)
      .select(idCol)
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
