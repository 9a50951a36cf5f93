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

  // ---- Bloom scan-side path --------------------------------------------

  /** Build a Bloom filter of the benchmark's distinct n-gram shingle
    * hashes — the SCAN-SIDE decontamination artifact: instead of the
    * corpus' shingles entering a shuffle to meet the benchmark in an
    * equi-join, the benchmark's shingle SET rides into the corpus scan as
    * one bounded literal and the whole check becomes a pure projection
    * ([[contaminationHitsBloom]]).
    *
    * The build collects the benchmark's distinct hashes to the driver —
    * bounded by the BENCHMARK's size, which is the contract that makes
    * this path apply (eval suites are MBs next to a 100 TB corpus; for a
    * benchmark too big to collect, use the exact join path). Filter size
    * is ~1.2·log2(1/fpp)/8 bytes per shingle (≈3.6 MB per million
    * shingles at the 1e-6 default) — broadcast-class.
    */
  def benchBloom(bench: DataFrame, benchTextCol: String, n: Int = 8,
      fpp: Double = 1e-6): Array[Byte] = {
    graft.plans.GraftExtensions.register(bench.sparkSession)
    val hashes = bench.select(
        F.explode(Dedup.hashedShingles(F.col(benchTextCol), n)).as("__sh"))
      .distinct().collect().map(_.getLong(0))
    require(hashes.nonEmpty, "benchBloom: benchmark produced no shingles")
    graft.functions.BloomKernel.serialize(
      graft.functions.BloomKernel.build(hashes.iterator, hashes.length, fpp))
  }

  /** Per-document POSSIBLE benchmark-overlap hits against a
    * [[benchBloom]] filter: (idCol, hits), docs with zero possible hits
    * absent — the same output shape as [[contaminationHits]], computed in
    * ONE pure projection over the corpus scan (fused shingle kernel +
    * native `bloom_count`, both whole-stage codegen; no shuffle, no join,
    * no explode). No false negatives: hits here is >= the exact path's
    * hits per doc, so filtering on it drops a SUPERSET of the exact
    * drops — conservative in the safe direction for decontamination
    * (subset/superset relation is test-pinned).
    */
  def contaminationHitsBloom(docs: DataFrame, idCol: String, textCol: String,
      bloom: Array[Byte], n: Int = 8): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    docs.select(F.col(idCol),
        graft.plans.GraftExtensions.callNative("bloom_count",
          Dedup.hashedShingles(F.col(textCol), n), F.lit(bloom)).as("hits"))
      .filter(F.col("hits") > 0)
  }

  /** Scan-side [[decontaminate]]: one corpus projection + filter, no
    * shuffle of corpus data anywhere (the anti-join disappears — the
    * filter IS the membership test). Drops a superset of the exact
    * path's drops at rate bounded by `fpp` per (doc, shingle) test.
    */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      minHits: Long = 1L, fpp: Double = 1e-6): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    val bloom = benchBloom(bench, benchTextCol, n, fpp)
    // coalesce(hits, 0): a null text yields a NULL shingle array through
    // the kernel expression, so a bare `NULL < minHits` filter would
    // silently DROP every failed-extraction doc — the exact path keeps
    // them (its explode emits zero shingle rows), and the documented
    // contract is over-dropping at the fpp rate only
    docs.filter(
      F.coalesce(
        graft.plans.GraftExtensions.callNative("bloom_count",
          Dedup.hashedShingles(F.col(textCol), n), F.lit(bloom)),
        F.lit(0L)) < minHits)
  }

  /** Persist a [[benchBloom]] artifact (build once per benchmark-suite
    * release, decontaminate every crawl batch against it): one parquet row
    * carrying the filter bytes AND the shingle size — probes must shingle
    * under the `n` the filter was built with, so the loader reads and
    * applies it and fails fast on a foreign artifact.
    */
  def saveBenchBloom(bench: DataFrame, benchTextCol: String, path: String,
      n: Int = 8, fpp: Double = 1e-6): Unit = {
    val bloom = benchBloom(bench, benchTextCol, n, fpp)
    val spark = bench.sparkSession
    import spark.implicits._
    Seq(("shingle-bloom", n, graft.functions.Tok.HashFamily, bloom))
      .toDF("kind", "n", "hashFamily", "bloom")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** [[decontaminateBloom]] against a persisted [[saveBenchBloom]]
    * artifact — the fit-once/score-many serving face (stream-safe too:
    * the gate is a pure stateless filter).
    */
  def decontaminateFromArtifact(docs: DataFrame, textCol: String,
      path: String, minHits: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    graft.plans.GraftExtensions.register(spark)
    val row = spark.read.parquet(path).head()
    require(row.getAs[String]("kind") == "shingle-bloom",
      s"$path is not a shingle-bloom artifact (kind=${row.getAs[String]("kind")})")
    graft.functions.Tok.checkHashFamily(row, path)
    // same null-text keep contract as decontaminateBloom
    docs.filter(
      F.coalesce(
        graft.plans.GraftExtensions.callNative("bloom_count",
          Dedup.hashedShingles(F.col(textCol), row.getAs[Int]("n")),
          F.lit(row.getAs[Array[Byte]]("bloom"))),
        F.lit(0L)) < minHits)
  }

  /** Word n-gram shingle STRINGS (distinct, space-joined) of a text
    * column via composed `functions._` — the oracle-expressible sibling
    * of [[Dedup.hashedShingles]] (same tokenizer, same n-gram windows;
    * the hashes are just xxhash64 of exactly these strings). Used by the
    * md5 bloom flavor, whose positions must be derivable from the STRING
    * on any engine.
    */
  private[operators] def shingleStrings(text: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    val ts = TextAnalysis.tokens(text)
    F.when(F.size(ts) >= n,
        F.array_distinct(F.transform(
          F.sequence(F.lit(1), F.size(ts) - (n - 1)),
          i => F.array_join(F.slice(ts, i, F.lit(n)), " "))))
      .otherwise(F.array().cast("array<string>"))
  }

  /** md5-POSITION Bloom flavor of the scan-side decontamination gate —
    * the engine-replayable verification face (the md5 convention:
    * hashSplit / DSIR buckets / SimHash halves / SRP planes): shingle
    * `s`'s bit positions are `int(md5(s ∥ "_" ∥ j)[0:8]) mod mBits` for
    * j < kHashes, so any engine with md5 rebuilds the identical filter —
    * INCLUDING its false positives, which is what lets the registry's
    * q_contamination_bloom carry an exact oracle rather than a
    * superset-only check. Same no-false-negative contract as
    * [[contaminationHitsBloom]] (every benchmark shingle's bits are set
    * by construction); same bounded driver build (the benchmark's
    * distinct shingles only). Returns (idCol, hits), hits > 0 rows only.
    *
    * Scan side is the fused `md5_bloom_hits` kernel
    * ([[graft.functions.Md5BloomHits]]) — the SAME zero-shuffle plan
    * shape as the [[contaminationHitsBloom]] hot path (no explode, no
    * per-doc count aggregate; only the position derivation differs, for
    * engine replayability). Byte-equivalence with the exploded string
    * formulation ([[contaminationHitsBloomMd5Composed]]) is pinned in
    * PipelineSpec.
    */
  def contaminationHitsBloomMd5(docs: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String, n: Int = 8,
      mBits: Int = 1 << 20, kHashes: Int = 2): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    val words = md5BloomWords(bench, benchTextCol, n, mBits, kHashes)
    docs.select(F.col(idCol),
        graft.plans.GraftExtensions.callNative("md5_bloom_hits",
          F.col(textCol), F.lit(n), F.typedLit(words.toSeq),
          F.lit(kHashes)).as("hits"))
      .filter(F.col("hits") > 0)
  }

  /** Shared md5-position filter build: the BENCHMARK's distinct shingle
    * strings (the benchBloom contract — an eval suite, never the corpus),
    * driver-collected and bit-packed.
    */
  private def md5BloomWords(bench: DataFrame, benchTextCol: String, n: Int,
      mBits: Int, kHashes: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(kHashes > 0, s"kHashes must be positive, got $kHashes")
    val benchSh = bench
      .select(graft.plans.Hygiene.explodeNonEmpty(
        shingleStrings(F.col(benchTextCol), n)).as("__s"))
      .distinct().collect().map(_.getString(0))
    require(benchSh.nonEmpty,
      "contaminationHitsBloomMd5: benchmark produced no shingles")
    md5PositionWordsFromKeys(benchSh, mBits, kHashes)
  }

  /** The pre-kernel composed formulation (explode + md5-position probe +
    * per-doc count; explicit-count repartition because its shingle
    * lambdas evaluate interpreted) — retained as the equivalence
    * baseline the kernel is pinned against.
    */
  private[graft] def contaminationHitsBloomMd5Composed(docs: DataFrame,
      idCol: String, textCol: String, bench: DataFrame,
      benchTextCol: String, n: Int = 8, mBits: Int = 1 << 20,
      kHashes: Int = 2): DataFrame = {
    val words = md5BloomWords(bench, benchTextCol, n, mBits, kHashes)
    val dsh = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        F.col(idCol))
      .select(F.col(idCol),
        graft.plans.Hygiene.explodeNonEmpty(
          shingleStrings(F.col(textCol), n)).as("__sh"))
    md5PositionProbe(dsh, "__sh", words, kHashes)
      .filter(F.col("__hit")).drop("__hit")
      .groupBy(idCol).agg(F.count(F.lit(1)).as("hits"))
  }

  // ---- the md5-POSITION bit-set machinery ------------------------------
  // THE one definition of "key string -> kHashes md5-derived bit
  // positions" — shared by the md5 bloom decontamination flavor above and
  // Dedup.BandBloomMd5's near-dup gate, and mirrored verbatim by both
  // DuckDB oracles: ('0x' || substr(md5(key || '_' || j), 1, 8))::BIGINT
  // % mBits. A drift between the two flavors (or between a flavor and
  // its oracle) is a silent filter desynchronization; keep the
  // derivation here only.

  /** Word array (mBits/64 longs) with the positions of every
    * (key, j < kHashes) pair set — the driver-side filter build.
    */
  private[operators] def md5PositionWordsFromKeys(keys: Iterable[String],
      mBits: Int, kHashes: Int): Array[Long] = {
    val positions =
      for (s <- keys.iterator; j <- (0 until kHashes).iterator)
        yield graft.plans.Hygiene.md5Prefix32Jvm(s"${s}_$j") % mBits
    wordsFromPositions(positions, mBits)
  }

  /** Word array from raw bit positions (engine-collected or
    * driver-derived).
    */
  private[operators] def wordsFromPositions(positions: Iterator[Long],
      mBits: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words(p.toInt >> 6) |= 1L << (p.toInt & 63))
    words
  }

  /** Engine-side position of one key column's j-th probe. */
  private[operators] def md5Position(key: org.apache.spark.sql.Column,
      j: Int, mBits: Int): org.apache.spark.sql.Column =
    F.pmod(graft.plans.Hygiene.md5Prefix32(
      F.concat(key, F.lit(s"_$j"))), F.lit(mBits.toLong))

  /** Probe `keyCol` strings against a word array: the input rows plus a
    * boolean `__hit` (all kHashes bits present). The bit test goes
    * through `F.expr` because shiftright with a COLUMN shift amount
    * exists only on the SQL surface.
    */
  private[operators] def md5PositionProbe(df: DataFrame, keyCol: String,
      words: Array[Long], kHashes: Int): DataFrame = {
    require(kHashes > 0, s"kHashes must be positive, got $kHashes")
    val mBits = words.length * 64
    val withPos = (0 until kHashes).foldLeft(
        df.withColumn("__w", F.typedLit(words.toSeq))) { (d, j) =>
      d.withColumn(s"__p$j", md5Position(F.col(keyCol), j, mBits))
    }
    val hit = (0 until kHashes).map(j => F.expr(
        s"(shiftright(element_at(__w, CAST(__p$j div 64 AS INT) + 1), " +
          s"CAST(__p$j % 64 AS INT)) & 1) = 1"))
      .reduce(_ && _)
    withPos.withColumn("__hit", hit)
      .drop("__w" +: (0 until kHashes).map(i => s"__p$i"): _*)
  }
}
