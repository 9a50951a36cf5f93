package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Composed end-to-end pipelines — the shapes a training-data curation job
  * actually runs, built entirely from the operator modules so the whole
  * chain stays one lazy Catalyst plan until the sink.
  */
object Pipelines {

  /** Corpus cleaning: quality gate → exact dedup → near-dup dedup.
    *
    * One scan feeds the quality projection; the exact pass shuffles
    * 32-byte hashes; the near-dup pass runs banded LSH over the survivors
    * only. Returns the surviving rows of `df`.
    *
    * The gate tokenizes ONCE per row: the token array is materialized
    * behind a [[graft.plans.Hygiene.attributeBarrier]] (a Generate is a
    * predicate-pushdown barrier — a plain projection would be substituted
    * back into the pushed filter, re-running the tokenizer per predicate
    * per row in every scan stage of the composed plan; plan-pinned).
    */
  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0, nearDupThreshold: Double = 0.8): DataFrame = {
    val t = F.col(textCol)
    val ts = F.col("__ts")
    val quality = df
      .select(df.columns.map(F.col) :+
        graft.plans.Hygiene.attributeBarrier(TextAnalysis.tokens(t)).as("__ts"): _*)
      .filter(TextAnalysis.tokenCountOf(ts) >= minTokens &&
        TextAnalysis.meanWordLenOf(ts).between(minMeanWordLen, maxMeanWordLen))
      .drop("__ts")
    val exact = Dedup.exact(quality, textCol, idCol)
    Dedup.minhashDedup(exact, idCol, textCol, threshold = nearDupThreshold)
  }

  /** The full training-data preparation chain: quality gate → exact dedup
    * → near-dup dedup → PII redaction → token-window chunking. Still ONE
    * lazy Catalyst plan end-to-end — redaction is a projection over the
    * survivors, chunking explodes token windows with no shuffle — so the
    * composite inherits every per-stage scale property (AQE stage reuse
    * across the dedup subtrees, banded LSH, bounded chunk arithmetic).
    * Output: (idCol, chunk_idx, chunk_text, n_tokens), training-ready.
    */
  def curateForTraining(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 100, overlap: Int = 50): DataFrame = {
    val clean = cleanCorpus(df, idCol, textCol)
    val redacted = clean.withColumn(textCol,
      TextAnalysis.redactPII(F.col(textCol)))
    TextAnalysis.chunkDocuments(redacted, idCol, textCol, chunkSize, overlap)
  }
}
