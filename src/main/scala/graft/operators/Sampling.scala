package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling/mixing operators for dataset curation. All
  * selection here is HASH-based, not `rand()`-based: `rand(seed)` is only
  * deterministic for a fixed partitioning, so a repartition or AQE change
  * silently changes the sample — xxhash64 of stable row keys gives the
  * same sample on any cluster, any partitioning, any run. No collects,
  * no windows without partition keys.
  */
object Sampling {

  /** The shared selection hash: uniform in [0, 2^31) per (key, salt).
    * Both samplers compare this ONE definition against their thresholds,
    * so they can never drift apart.
    *
    * NULL keys: xxhash64 skips null children, so every null-key row
    * hashes to the SAME per-salt constant — they form one pseudo-stratum
    * that any fraction keeps or drops ALL-or-nothing (and in
    * mixture/temperatureMixture contributes all-or-none of a source's
    * null-key rows, skewing realized weights). This is the only
    * deterministic contract available (a per-row unique hash would make
    * sampling non-reproducible); corpora with null sampling keys should
    * filter or key-coalesce them upstream.
    */
  private def hashBucket(keyCol: String, salt: Long) =
    F.pmod(F.xxhash64(F.col(keyCol), F.lit(salt)), F.lit(Int.MaxValue.toLong))

  private def toBound(fraction: Double): Long = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1], got $fraction")
    (fraction * Int.MaxValue).toLong
  }

  /** Keep ~`fraction` of rows, chosen by key hash: a row survives iff
    * hashBucket < fraction·2^31. Deterministic per (key, salt); changing
    * `salt` draws an independent sample.
    */
  def byHash(df: DataFrame, keyCol: String, fraction: Double,
      salt: Long = 0L): DataFrame =
    df.filter(hashBucket(keyCol, salt) < toBound(fraction))

  /** Per-class fractions (stratified): each class keeps its own hash
    * fraction — `fractions` classes absent from the map keep nothing.
    */
  def stratified(df: DataFrame, classCol: String, keyCol: String,
      fractions: Map[String, Double], salt: Long = 0L): DataFrame = {
    val bound = fractions.foldLeft(F.lit(-1L)) { case (acc, (cls, frac)) =>
      F.when(F.col(classCol) === cls, F.lit(toBound(frac))).otherwise(acc)
    }
    df.filter(hashBucket(keyCol, salt) < bound)
  }

  /** Exactly-k rows per key, chosen pseudo-randomly but deterministically:
    * rank rows within each key by hash and keep the first k. One shuffle
    * on the key; `WindowGroupLimit` prunes to k per key before the final
    * sort at executor side.
    */
  def perKey(df: DataFrame, keyCol: String, idCol: String, k: Int,
      salt: Long = 0L): DataFrame = {
    val w = Window.partitionBy(F.col(keyCol))
      .orderBy(F.xxhash64(F.col(idCol), F.lit(salt)).asc, F.col(idCol).asc)
    df.withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") <= k)
      .drop("__rn")
  }

  /** Weighted mixture of corpora: each source keeps a hash fraction equal
    * to its weight (weights in [0,1], applied independently per source),
    * tagged with a `source_id` column — the "mix N corpora at given
    * rates" step of training-data assembly.
    */
  def mixture(sources: Seq[(DataFrame, Double)], keyCol: String,
      salt: Long = 0L): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    sources.zipWithIndex.map { case ((df, weight), i) =>
      byHash(df, keyCol, weight, salt + i)
        .withColumn("source_id", F.lit(i))
    }.reduce(_ unionByName _)
  }

  /** Deterministic epoch shuffle: a stable pseudo-random TOTAL order from
    * (key, epoch) — the training-time "shuffle the corpus differently each
    * epoch, identically on every rerun" primitive. Implemented as a global
    * sort on the key's epoch-salted hash (range-partitioned exchange —
    * Spark's scalable total order; no single-task funnel), with the key as
    * tie-break so distinct keys with colliding hashes still order
    * deterministically.
    *
    * CONTRACT: `keyCol` must uniquely identify rows (a doc id, not a
    * content hash with duplicates) — rows SHARING a key value get
    * identical sort keys, and their relative order is then
    * partitioning-dependent like any Spark sort tie. Writing the result
    * with a partition-preserving writer yields the epoch's shard files
    * directly.
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Long): DataFrame =
    df.orderBy(F.xxhash64(F.col(keyCol), F.lit(epoch)).asc,
      F.col(keyCol).asc)

  /** Temperature-weighted corpus mixing (the multilingual-LM standard):
    * the output's composition follows q_i ∝ (n_i/N)^alpha — alpha = 1
    * keeps natural proportions, alpha = 0 equalizes sources, values in
    * between upweight small corpora without drowning large ones. Each
    * source keeps fraction q_i·T/n_i (T = `outFraction`·N target rows),
    * realized by the same deterministic hash filter as [[mixture]].
    *
    * Down-sampling only: a keep-fraction is capped at 1, so a small
    * source that temperature would OVER-sample contributes all its rows
    * once and the realized mixture under-shoots its share (documented
    * standard behavior — row replication is an epoch/packing concern, not
    * a sampling one). One `count()` job per source to learn n_i
    * (parquet-metadata cheap); everything else stays a lazy filter.
    */
  def temperatureMixture(sources: Seq[DataFrame], keyCol: String,
      alpha: Double, outFraction: Double = 1.0, salt: Long = 0L): DataFrame = {
    require(sources.nonEmpty, "temperatureMixture needs at least one source")
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(outFraction > 0 && outFraction <= 1,
      s"outFraction in (0,1], got $outFraction")
    val ns = sources.map(_.count().toDouble)
    require(ns.forall(_ > 0), "temperatureMixture: empty source")
    val total = ns.sum
    val probs = ns.map(n => math.pow(n / total, alpha))
    val z = probs.sum
    val fracs = ns.zip(probs).map { case (n, p) =>
      math.min(1.0, (p / z) * outFraction * total / n)
    }
    mixture(sources.zip(fracs), keyCol, salt)
  }
}
