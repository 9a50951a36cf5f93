package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Sequence packing — assemble chunk rows into fixed-token-budget training
  * examples (the concat-then-split packing used for LLM pretraining
  * batches). Extension scope; the last mile of the curation chain after
  * [[TextAnalysis.chunkDocuments]].
  *
  * Scale design: a single global concatenation order would funnel the
  * whole corpus through one window partition, so packing runs per BUCKET —
  * chunks hash to `nBuckets` independent streams (a document's chunks stay
  * together), each bucket packs by running token count in one windowed
  * pass. One shuffle total, bucket sizes are corpus/nBuckets (uniform
  * hash), and pack boundaries are pure arithmetic: pack k of bucket b =
  * the chunks whose cumulative token start lies in [k·budget, (k+1)·budget).
  * A pack's token total therefore lands within ±(one chunk) of `budget` —
  * exactly the boundary-straddle slop of concat-then-split packing.
  */
object Packing {

  /** Assign every chunk a `pack_id`. Deterministic: bucket = id mod
    * `nBuckets` (numeric ids; hash string keys upstream), order within
    * bucket = (id, chunk index). `pack_id` = bucket · 2^40 + pack ordinal
    * within the bucket.
    *
    * `nBuckets` is REQUIRED (no default): each bucket is ONE window
    * partition — a single task runs its cumulative sum over corpus/nBuckets
    * rows — so a fixed default silently turns into a multi-TB-per-task
    * funnel when the corpus grows. Size it so corpus/nBuckets rows fit one
    * task comfortably, or use [[packChunksAuto]] to derive it from the
    * input at the cost of one count() job. Each bucket's packs are a pure
    * function of that bucket's own chunks (ordinals never cross buckets),
    * so raising nBuckets only splits work, never changes pack semantics.
    */
  def packChunks(chunks: DataFrame, idCol: String, idxCol: String,
      tokCol: String, budget: Int, nBuckets: Int,
      extraPartitionCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0 && nBuckets > 0, "budget and nBuckets must be positive")
    // pack_id = bucket * 2^40 + ordinal must fit a long: buckets < 2^22
    // and <= 2^40 packs per bucket (~10^14 tokens/bucket at budget 256 —
    // far past any per-bucket share of a 100 TB corpus).
    require(nBuckets < (1 << 22), "nBuckets must fit the 2^40 pack-id split")
    // numeric ids bucket by value (the oracle-replayable id-mod shape);
    // string/binary ids hash first — pmod on a string id would either
    // throw under ANSI or NULL-bucket the whole corpus into one window
    val bucketOf = chunks.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        F.pmod(F.col(idCol), F.lit(nBuckets.toLong))
      case _ => F.pmod(F.xxhash64(F.col(idCol)), F.lit(nBuckets.toLong))
    }
    // extraPartitionCols confine packs to finer partitions (e.g. a split
    // label, so no pack straddles a train/val boundary); pack_id stays
    // unique only within an extra-partition value — key on
    // (extraPartitionCols..., pack_id) downstream
    val parts = (F.col("__bucket") +: extraPartitionCols.map(F.col))
    val w = Window.partitionBy(parts: _*)
      .orderBy(F.col(idCol), F.col(idxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("__bucket", bucketOf)
      .withColumn("__end", F.sum(F.col(tokCol).cast("long")).over(w))
      .withColumn("pack_id",
        F.col("__bucket") * F.lit(1L << 40) +
          F.floor((F.col("__end") - F.col(tokCol)) / F.lit(budget.toLong)))
      .drop("__bucket", "__end")
  }

  /** [[packChunks]] with a scale-safe bucket count derived from the input:
    * nBuckets = max(defaultParallelism, ceil(n / maxRowsPerBucket)), so no
    * bucket's single-task cumulative sum ever covers more than
    * `maxRowsPerBucket` rows (expected; id-mod bucketing is uniform for
    * dense ids) and small inputs still use every core. Costs one extra
    * count() job over the chunk frame — callers that already know the
    * corpus size should pass `nBuckets` to [[packChunks]] directly.
    */
  def packChunksAuto(chunks: DataFrame, idCol: String, idxCol: String,
      tokCol: String, budget: Int,
      maxRowsPerBucket: Long = 4L * 1000 * 1000): DataFrame = {
    require(maxRowsPerBucket > 0, "maxRowsPerBucket must be positive")
    val n = chunks.count()
    val parallelism = chunks.sparkSession.sparkContext.defaultParallelism.toLong
    val nBuckets = math.max(parallelism, (n + maxRowsPerBucket - 1) / maxRowsPerBucket)
    packChunks(chunks, idCol, idxCol, tokCol, budget,
      math.min(nBuckets, (1L << 22) - 1).toInt)
  }

  /** Pack summary: one row per pack with its chunk count and token total —
    * the sanity surface for batch-shape monitoring.
    */
  def packStats(packed: DataFrame, tokCol: String): DataFrame =
    packed.groupBy("pack_id")
      .agg(F.count(F.lit(1)).as("n_chunks"),
        F.sum(F.col(tokCol).cast("long")).as("n_tokens"))
}
