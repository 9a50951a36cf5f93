package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.{Aggregator, Window}

import graft.plans.Hygiene

/** Deterministic, engine-replayable sketches — the oracle-checkable
  * complement to [[graft.extras.Approx]]'s Spark-native ones (HLL++ /
  * Greenwald-Khanna / freqItems), whose sketch internals no other engine
  * reproduces and which therefore live outside the DuckDB registry.
  * Everything here derives its randomness from the md5 convention
  * (SURVEY §7.5: `Hygiene.md5Prefix32`, replayable as
  * `('0x' || substr(md5(x), 1, 8))::BIGINT` in any SQL engine) or from
  * xxhash64 for the hot flavor, so the full sketch state — not just the
  * estimate — hash-verifies against an independent replay.
  *
  * Scale design (the reason these exist at 100 TB):
  *  - KMV distinct: the exact `count(distinct v)` shuffles every distinct
  *    value per group; the KMV aggregate carries AT MOST k longs per
  *    group through partial (map-side) and final aggregation — a fixed
  *    ~k·8-byte ceiling per group per partition crossing the exchange,
  *    independent of the value cardinality.
  *  - Count-min: the exact per-token count table shuffles the VOCABULARY
  *    (billions of rows at web scale); the CMS build aggregates to a
  *    fixed depth×width cell grid (partial agg collapses each map task
  *    to ≤ d·w cells before the exchange), and point estimates probe the
  *    grid with a candidate-bounded join.
  */
object Sketches {

  // ---- KMV distinct ----------------------------------------------------

  /** Bounded-memory k-minimum-values aggregate: the k smallest DISTINCT
    * hash values per group, as an ascending `array<bigint>`. A commutative
    * monoid (sorted-merge + trim), so Spark runs it as a partial+final
    * ObjectHashAggregate — the buffer never exceeds k longs
    * ([[graft.core.Agg.CustomFoldNumeric]]'s memory model, and the same
    * vetted ScalaAggregator class in the codegen-fallback allowlist).
    * step/merge are PURE (fresh arrays), per the shared-zero contract.
    */
  private final class KmvAgg(k: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray

    def reduce(buf: Array[Long], v: java.lang.Long): Array[Long] = {
      if (v == null) return buf
      val h = v.longValue
      val n = buf.length
      // saturated and not smaller than the current kth min: no change
      if (n == k && h >= buf(n - 1)) return buf
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) return buf // already present (distinct semantics)
      val ins = -pos - 1
      val outLen = math.min(k, n + 1)
      val out = new Array[Long](outLen)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1,
        math.min(n, outLen - 1) - ins)
      out
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        // skip the duplicate when both sides hold the same hash
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo(classOf[Array[Long]])
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The md5-flavor hash domain: `md5Prefix32 + 1` ∈ [1, 2^32] — shifted
    * off zero so the KMV ratio estimator never divides by zero, and kept
    * 32-bit so `(k-1)·2^32` stays exact in an IEEE double (the estimate
    * is then ONE correctly-rounded division — bit-identical in any
    * engine; the oracle replays it literally).
    */
  def md5Hash32(value: Column): Column =
    Hygiene.md5Prefix32(value.cast("string")) + F.lit(1L)

  /** Hot-flavor 64-bit hash, folded to the same [1, 2^32] domain (top 32
    * bits of xxhash64, plus one) so both flavors share the estimator and
    * its exactness argument.
    */
  def xx64Hash32(value: Column): Column =
    F.shiftrightunsigned(F.xxhash64(value.cast("string")), 32) + F.lit(1L)

  /** KMV sketch per group: `(groupCols..., kmin array<bigint>)` via the
    * bounded aggregate. `hash` must map values into [1, 2^32]
    * ([[md5Hash32]] / [[xx64Hash32]]). Nulls in `valueCol` are skipped
    * (hash of null is null, and the aggregate skips nulls) — the
    * count-distinct convention.
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, hash: Column => Column = md5Hash32): DataFrame = {
    require(k >= 2, s"kmvDistinct: k must be >= 2, got $k")
    val agg = F.udaf(new KmvAgg(k), Encoders.LONG)
      .apply(hash(F.col(valueCol))).as("kmin")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(F.col): _*).agg(agg)
  }

  /** Built-in-composed equivalence baseline for [[kmvSketch]]: distinct
    * hashes → per-group ascending rank ≤ k → sorted collect. The SAME
    * k-min set by construction, at the exact-distinct shuffle width (every
    * distinct hash crosses the exchange) — retained as the pinned
    * baseline the kernel must equal (the `int_dot` convention), not a
    * scale path.
    */
  def kmvSketchComposed(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int,
      hash: Column => Column = md5Hash32): DataFrame = {
    val g = groupCols.map(F.col)
    val hashed = df.filter(F.col(valueCol).isNotNull)
      .select(g :+ hash(F.col(valueCol)).as("__h"): _*).distinct()
    val w = if (groupCols.isEmpty) Window.orderBy(F.col("__h"))
      else Window.partitionBy(g: _*).orderBy(F.col("__h"))
    val ranked = hashed.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= k)
    val grouped = if (groupCols.isEmpty) ranked.groupBy()
      else ranked.groupBy(g: _*)
    grouped.agg(F.sort_array(F.collect_list(F.col("__h"))).as("kmin"))
  }

  /** KMV distinct estimate from a sketch frame: exact sketch size below
    * saturation, else the ratio estimator `(k-1)·2^32 / kth_min` — the
    * numerator is an exact double (k ≤ 2^20 keeps it under 2^53), the
    * division is one correctly-rounded IEEE op, and the result is rounded
    * to 4 decimals, so the oracle's literal replay cannot drift.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.withColumn("est_distinct",
      F.when(F.size(F.col("kmin")) < k,
          F.size(F.col("kmin")).cast("double"))
        .otherwise(F.round(
          F.lit((k - 1).toDouble * 4294967296.0) /
            F.element_at(F.col("kmin"), k).cast("double"), 4)))
      .drop("kmin")

  /** Per-group approximate distinct count: sketch + estimate in one call.
    * Relative error concentrates around 1/sqrt(k-2) (k=64 → ~13%).
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, hash: Column => Column = md5Hash32): DataFrame =
    kmvEstimate(kmvSketch(df, groupCols, valueCol, k, hash), k)

  /** Merge per-part KMV sketches up to coarser groups (fewer columns of
    * the sketch frame's keys, or `Nil` for a global sketch) — EXACTLY
    * the sketch a direct pass over the union would build: every one of
    * the union's k smallest distinct hashes is among its own part's k
    * smallest (fewer than k hashes in that part are below it), so
    * k-min(union of part k-min sets) = k-min(union). This identity is
    * the 100 TB operating mode: sketch each ingest batch / partition
    * once, fold the ≤ k·8-byte summaries — never rescan the corpus for
    * a distinct count over a new grouping or a longer window.
    */
  def kmvMergeSketches(sketches: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val merged = F.slice(F.array_sort(F.array_distinct(
      F.flatten(F.collect_list(F.col("kmin"))))), 1, k).as("kmin")
    if (groupCols.isEmpty) sketches.agg(merged)
    else sketches.groupBy(groupCols.map(F.col): _*).agg(merged)
  }

  /** Distinct-set overlap estimates from a pair of KMV sketch columns
    * (`kmin_a`, `kmin_b`, same k and hash): appends
    *  - `est_union`    — the KMV estimate over the union sketch (the
    *    k smallest of `kmin_a ∪ kmin_b`, which IS the union's sketch
    *    by the merge identity), and
    *  - `est_jaccard`  — |K ∩ A ∩ B| / |K| with K the union sketch
    *    (Beyer et al., "On synopses for distinct-value estimation
    *    under multiset operations", SIGMOD 2007): K is a uniform
    *    k-sample of the union's distinct values, so the fraction
    *    present in both sides is an unbiased Jaccard estimator.
    * Everything is integer set algebra plus the same two rounded
    * double ops as [[kmvEstimate]] — fully oracle-replayable.
    */
  def kmvOverlapColumns(df: DataFrame, k: Int): DataFrame = {
    val u = F.slice(F.array_sort(F.array_distinct(
      F.concat(F.col("kmin_a"), F.col("kmin_b")))), 1, k)
    df.withColumn("__u", u)
      .withColumn("__common", F.size(F.array_intersect(
        F.array_intersect(F.col("__u"), F.col("kmin_a")), F.col("kmin_b"))))
      .withColumn("est_union",
        F.when(F.size(F.col("__u")) < k, F.size(F.col("__u")).cast("double"))
          .otherwise(F.round(
            F.lit((k - 1).toDouble * 4294967296.0) /
              F.element_at(F.col("__u"), k).cast("double"), 4)))
      .withColumn("est_jaccard",
        F.round(F.col("__common").cast("double") /
          F.size(F.col("__u")).cast("double"), 4))
      .drop("__u", "__common")
  }

  /** Corpus-overlap face: compare two sketch frames key-by-key (e.g.
    * per-domain sketches of crawl A vs crawl B) — how much does B
    * overlap what A already has, per key, WITHOUT joining the corpora
    * (the sketches are ≤ k longs per key; the exact answer is a
    * distinct-join over both corpora). `joinCols` empty compares two
    * global sketches (1×1, broadcast).
    */
  def kmvSetEstimates(a: DataFrame, b: DataFrame, joinCols: Seq[String],
      k: Int): DataFrame = {
    val aa = a.withColumnRenamed("kmin", "kmin_a")
    val bb = b.withColumnRenamed("kmin", "kmin_b")
    val joined =
      if (joinCols.isEmpty) aa.crossJoin(F.broadcast(bb))
      else aa.join(bb, joinCols)
    kmvOverlapColumns(joined, k).drop("kmin_a", "kmin_b")
  }

  /** Merge count-min grids built with the SAME (depth, width, hash):
    * cell-wise sum — CMS is a linear sketch, so the merged grid is
    * bit-identical to one built over the concatenated token streams.
    * Per-batch grids + this fold = frequency stats over any batch range
    * without re-reading tokens.
    */
  def cmsMergeSketches(grids: DataFrame): DataFrame =
    grids.groupBy(F.col("j"), F.col("bucket"))
      .agg(F.sum(F.col("n")).as("n"))

  // ---- persisted KMV sketch store ---------------------------------------

  /** Named value-hash flavors a store can be built under. Versioned like
    * [[graft.functions.Tok.HashFamily]]: part sketches are only foldable
    * when every batch hashed values IDENTICALLY, and a derivation change
    * (offset, fold, domain) under the same name would silently skew
    * every estimate — bump the version suffix instead.
    */
  private val Flavors: Map[String, Column => Column] = Map(
    "md5-32-v1" -> (md5Hash32 _),
    "xx64-32-v1" -> (xx64Hash32 _))

  /** Build a persisted sketch-per-batch store: the main table holds one
    * part sketch per (group, appended batch) — `(groupCols..., kmin)` —
    * and `_params` pins the fold contract (k, hashFlavor, groupCols,
    * valueCol). Serving folds parts per group at read time
    * ([[kmvMergeSketches]] — EXACT by the merge identity, so any number
    * of appended batches estimates identically to one pass over the
    * union), which keeps appends pure `mode("append")` writes: no
    * read-modify-overwrite, batches land concurrently, and the store
    * row count is batches × groups with ≤ k longs per row.
    */
  def buildKmvStore(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, path: String, flavor: String = "md5-32-v1"): Unit = {
    require(Flavors.contains(flavor),
      s"buildKmvStore: unknown value-hash flavor $flavor " +
        s"(have ${Flavors.keys.mkString(", ")})")
    val spark = df.sparkSession
    kmvSketch(df, groupCols, valueCol, k, Flavors(flavor))
      .write.mode("overwrite").parquet(path)
    import spark.implicits._
    Seq((k, flavor, groupCols.mkString(","), valueCol))
      .toDF("k", "hashFlavor", "groupCols", "valueCol")
      .repartition(1).write.mode("overwrite").parquet(s"$path/_params")
  }

  /** Read + verify a store's fold contract; fails fast on a missing
    * sidecar or a flavor this engine doesn't produce (folding
    * foreign-flavor parts would silently skew every estimate — the
    * [[graft.functions.Tok.checkHashFamily]] failure class).
    */
  private def readKmvParams(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, String, Seq[String], String) = {
    val row =
      try spark.read.parquet(s"$path/_params").head()
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"$path is not a KMV sketch store (no readable _params " +
              s"sidecar): ${e.getMessage}")
      }
    val flavor = row.getAs[String]("hashFlavor")
    if (!Flavors.contains(flavor))
      throw new IllegalArgumentException(
        s"$path was built with value-hash flavor $flavor, which this " +
          "engine does not produce; part sketches are not foldable — " +
          "rebuild the store")
    (row.getAs[Int]("k"), flavor,
      row.getAs[String]("groupCols").split(',').toSeq.filter(_.nonEmpty),
      row.getAs[String]("valueCol"))
  }

  /** Sketch a new batch UNDER THE STORE'S contract and append its part
    * sketches — the batch is scanned once and never again; old batches
    * are not read at all.
    */
  def appendToKmvStore(batch: DataFrame, path: String): Unit = {
    val (k, flavor, groupCols, valueCol) =
      readKmvParams(batch.sparkSession, path)
    kmvSketch(batch, groupCols, valueCol, k, Flavors(flavor))
      .write.mode("append").parquet(path)
  }

  /** Serving face: fold the stored part sketches per group and estimate
    * — reads batches × groups rows of ≤ k longs, never any corpus.
    */
  def kmvDistinctFromStore(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val (k, _, groupCols, _) = readKmvParams(spark, path)
    kmvEstimate(kmvMergeSketches(spark.read.parquet(path), groupCols, k), k)
  }

  // ---- Count-min sketch ------------------------------------------------

  /** Count-min bucket id for row `j`: `hash32(token ∥ "_" ∥ j) mod width`
    * — the [[graft.operators.Contamination]] md5-position derivation
    * shape, replayable literally in the oracle.
    */
  private def cmsBucket(tok: Column, j: Column, width: Int,
      hash: Column => Column): Column =
    F.pmod(hash(F.concat(tok, F.lit("_"), j.cast("string"))), F.lit(width.toLong))

  /** Build a count-min sketch over a token column: the `(j, bucket, n)`
    * cell grid, at most depth·width rows REGARDLESS of vocabulary size.
    * Each token occurrence feeds `depth` cells (one per row j); the
    * map-side partial aggregate collapses every task to ≤ d·w cells
    * before the single exchange.
    */
  def cmsSketch(toks: DataFrame, tokenCol: String, depth: Int, width: Int,
      hash: Column => Column = md5Hash32): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"cmsSketch: need depth >= 1, width >= 2, got ($depth, $width)")
    toks.select(F.col(tokenCol).as("__tok"),
        F.explode(F.array((0 until depth).map(F.lit): _*)).as("j"))
      .select(F.col("j"),
        cmsBucket(F.col("__tok"), F.col("j"), width, hash).as("bucket"))
      .groupBy(F.col("j"), F.col("bucket"))
      .agg(F.count(F.lit(1)).as("n"))
  }

  /** Point-estimate candidate tokens against a sketch:
    * `est_n = min_j cells(j, bucket_j(tok))` — the classic CMS upper
    * bound (never below the true count; equal when no candidate shares
    * all its buckets with other mass). Both sides are bounded: the
    * candidate side is a literal local relation, the grid side ≤ d·w
    * rows — the grid is broadcast (a left join builds on the right, so
    * the probe side keeps its order-free left role). An absent cell
    * means zero occurrences hashed there — `coalesce 0`.
    */
  def cmsEstimate(sketch: DataFrame, candidates: Seq[String], depth: Int,
      width: Int, hash: Column => Column = md5Hash32): DataFrame = {
    require(candidates.nonEmpty, "cmsEstimate: empty candidate list")
    val spark = sketch.sparkSession
    import spark.implicits._
    val probes = candidates.toDF("token")
      .select(F.col("token"),
        F.explode(F.array((0 until depth).map(F.lit): _*)).as("j"))
      .select(F.col("token"), F.col("j"),
        cmsBucket(F.col("token"), F.col("j"), width, hash).as("bucket"))
    probes.join(F.broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(F.col("token"))
      .agg(F.min(F.coalesce(F.col("n"), F.lit(0L))).as("est_n"))
  }

  // ---- persisted CMS grid store -----------------------------------------

  /** [[buildKmvStore]]'s count-min sibling: per-batch cell grids land as
    * pure appends (≤ d·w rows per batch regardless of vocabulary), the
    * `_params` sidecar pins (depth, width, hashFlavor, tokenCol), and
    * serving sums cells at read time — exact because CMS is linear.
    * Point estimates over any accumulated range never re-read tokens.
    */
  def buildCmsStore(toks: DataFrame, tokenCol: String, depth: Int,
      width: Int, path: String, flavor: String = "md5-32-v1"): Unit = {
    require(Flavors.contains(flavor),
      s"buildCmsStore: unknown value-hash flavor $flavor " +
        s"(have ${Flavors.keys.mkString(", ")})")
    val spark = toks.sparkSession
    cmsSketch(toks, tokenCol, depth, width, Flavors(flavor))
      .write.mode("overwrite").parquet(path)
    import spark.implicits._
    Seq((depth, width, flavor, tokenCol))
      .toDF("depth", "width", "hashFlavor", "tokenCol")
      .repartition(1).write.mode("overwrite").parquet(s"$path/_params")
  }

  private def readCmsParams(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int, String, String) = {
    val row =
      try spark.read.parquet(s"$path/_params").head()
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"$path is not a CMS grid store (no readable _params " +
              s"sidecar): ${e.getMessage}")
      }
    val flavor = row.getAs[String]("hashFlavor")
    if (!Flavors.contains(flavor))
      throw new IllegalArgumentException(
        s"$path was built with value-hash flavor $flavor, which this " +
          "engine does not produce; grid cells are not summable — " +
          "rebuild the store")
    (row.getAs[Int]("depth"), row.getAs[Int]("width"), flavor,
      row.getAs[String]("tokenCol"))
  }

  /** Grid a new batch under the store's contract; pure append. */
  def appendToCmsStore(batch: DataFrame, path: String): Unit = {
    val (depth, width, flavor, tokenCol) =
      readCmsParams(batch.sparkSession, path)
    cmsSketch(batch, tokenCol, depth, width, Flavors(flavor))
      .write.mode("append").parquet(path)
  }

  /** Serving face: sum the stored batch grids cell-wise and point-probe
    * candidates — reads ≤ batches·d·w cell rows, never any tokens.
    */
  def cmsEstimateFromStore(spark: org.apache.spark.sql.SparkSession,
      path: String, candidates: Seq[String]): DataFrame = {
    val (depth, width, flavor, _) = readCmsParams(spark, path)
    cmsEstimate(cmsMergeSketches(spark.read.parquet(path)), candidates,
      depth, width, Flavors(flavor))
  }

  // ---- Misra-Gries heavy hitters ----------------------------------------

  /** Bounded-memory Misra-Gries summary: at most k (value, count)
    * counters. reduce is the classic decrement-all step (Misra & Gries
    * 1982); merge is the mergeable-summaries form (Agarwal et al.,
    * "Mergeable Summaries", PODS 2012): sum counters, then subtract the
    * (k+1)-th largest count from all and keep positives. Both preserve
    * the global undercount bound ≤ N/(k+1), so the candidate set is a
    * SUPERSET of every value with true count > N/(k+1) no matter how
    * Spark partitions the data or orders the merges. The candidate SET
    * itself is order-dependent (any MG is) — only [[heavyHitters]]'s
    * recounted, thresholded face is deterministic, which is why the
    * sketch face never enters the oracle registry.
    *
    * Buffers mutate in place (a per-group live object under
    * ObjectHashAggregate; serialized only across the exchange) EXCEPT
    * the shared `zero` instance, which is copy-on-first-touch — the
    * shared-zero contract ([[graft.core.Agg.CustomFoldNumeric]]).
    */
  private final class MgAgg(k: Int) extends Aggregator[String,
      scala.collection.mutable.HashMap[String, Long], Map[String, Long]] {
    private val zeroBuf = new scala.collection.mutable.HashMap[String, Long]()
    def zero: scala.collection.mutable.HashMap[String, Long] = zeroBuf

    private def fresh(b: scala.collection.mutable.HashMap[String, Long]) =
      if (b eq zeroBuf) new scala.collection.mutable.HashMap[String, Long]()
      else b

    def reduce(buf: scala.collection.mutable.HashMap[String, Long],
        v: String): scala.collection.mutable.HashMap[String, Long] = {
      if (v == null) return buf
      val m = fresh(buf)
      m.get(v) match {
        case Some(c) => m.update(v, c + 1L)
        case None if m.size < k => m.update(v, 1L)
        case None =>
          // decrement-all: each such event retires k+1 occurrences (k
          // stored + this arrival), so there are ≤ N/(k+1) of them —
          // the undercount bound
          val dead = List.newBuilder[String]
          m.foreachEntry { (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1L)
          }
          dead.result().foreach(m.remove)
      }
      m
    }

    def merge(a: scala.collection.mutable.HashMap[String, Long],
        b: scala.collection.mutable.HashMap[String, Long])
        : scala.collection.mutable.HashMap[String, Long] = {
      if (b.isEmpty) return a
      if (a.isEmpty) return b
      val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
      val m = fresh(into)
      from.foreachEntry { (key, c) => m.update(key, m.getOrElse(key, 0L) + c) }
      if (m.size > k) {
        // subtract the (k+1)-th largest count; at most k counts exceed it
        val cs = m.values.toArray
        java.util.Arrays.sort(cs)
        val cut = cs(cs.length - (k + 1))
        val dead = List.newBuilder[String]
        m.foreachEntry { (key, c) =>
          if (c <= cut) dead += key else m.update(key, c - cut)
        }
        dead.result().foreach(m.remove)
      }
      m
    }

    def finish(m: scala.collection.mutable.HashMap[String, Long])
        : Map[String, Long] = m.toMap
    def bufferEncoder: Encoder[scala.collection.mutable.HashMap[String, Long]] =
      Encoders.kryo(classOf[scala.collection.mutable.HashMap[String, Long]])
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Misra-Gries candidate pass: ONE row `(mg map<string,bigint>,
    * n_total bigint)` — every value with true count > n_total/(k+1) is
    * a key of `mg` (superset guarantee; see [[MgAgg]]). ≤ k counters
    * per task cross the exchange regardless of cardinality.
    */
  def mgSummary(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"mgSummary: k must be >= 2, got $k")
    df.agg(F.udaf(new MgAgg(k), Encoders.STRING)
        .apply(F.col(valueCol)).as("mg"),
      F.count(F.col(valueCol)).as("n_total"))
  }

  /** EXACT heavy hitters — every value occurring in at least
    * `minFrac` of the (non-null) rows, with its exact count — in two
    * bounded passes: a [[mgSummary]] candidate pass with
    * k = ⌈1/minFrac⌉ (so k+1 > 1/minFrac and the MG undercount
    * N/(k+1) < minFrac·N ≤ any heavy hitter's count — no heavy hitter
    * can be evicted), then an exact recount of the ≤ k candidates via a
    * broadcast join (the recount exchange carries ≤ k counters per
    * task, not the vocabulary). The exact `groupBy(value).count()`
    * alternative shuffles every distinct value — at web scale that is
    * the vocabulary, billions of rows; this is the classic
    * sketch-then-verify reduction to a fixed-size shuffle. Result is
    * deterministic and plain-SQL-replayable (GROUP BY + HAVING) even
    * though the intermediate candidate set is not.
    */
  def heavyHitters(df: DataFrame, valueCol: String,
      minFrac: Double): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0,
      s"heavyHitters: minFrac must be in (0, 1], got $minFrac")
    val k = math.max(2, math.ceil(1.0 / minFrac).toInt)
    val cand = mgSummary(df, valueCol, k)
      .select(F.explode(F.map_keys(F.col("mg"))).as("token"),
        F.col("n_total"))
    df.join(F.broadcast(cand), F.col(valueCol) === F.col("token"))
      .groupBy(F.col("token"))
      .agg(F.count(F.lit(1)).as("n"),
        F.first(F.col("n_total")).as("n_total"))
      .filter(F.col("n") >=
        F.ceil(F.lit(minFrac) * F.col("n_total")).cast("long"))
      .select(F.col("token"), F.col("n"))
  }
}
