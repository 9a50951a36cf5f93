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
    */
  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0, nearDupThreshold: Double = 0.8): DataFrame = {
    val t = F.col(textCol)
    val quality = df.filter(
      TextAnalysis.tokenCount(t) >= minTokens &&
        TextAnalysis.meanWordLen(t).between(minMeanWordLen, maxMeanWordLen))
    val exact = Dedup.exact(quality, textCol, idCol)
    Dedup.minhashDedup(exact, idCol, textCol, threshold = nearDupThreshold)
  }
}
