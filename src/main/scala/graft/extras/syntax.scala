package graft.extras

import org.apache.spark.sql.DataFrame

import graft.core.KFrame
import graft.operators.{Dedup, Pipelines, Selection, TextAnalysis}

/** Fluent KFrame syntax for the pipeline operators — one chainable surface
  * across the reference-parity core and the M8 extensions:
  *
  * {{{
  * import graft.extras.syntax._
  * docs.analyzeText("text")
  *     .dedupExact("text", "doc_id")
  *     .nearDupDedup("doc_id", "text")
  *     .groupby("lang_pred").aggregate(Agg.count, "doc_id")
  * }}}
  */
object syntax {

  implicit final class PipelineOps(private val kf: KFrame) extends AnyVal {

    // toDF, not toOrderedDF: every op below is order-insensitive, and
    // toOrderedDF would insert a full range-partitioned sort before each
    // stage (the scale-killer saltedJoin's comment warns about).
    private def lift(f: DataFrame => DataFrame): KFrame =
      KFrame.wrap(f(kf.toDF))

    /** Exact content dedup — keep the lowest-key row per duplicate class. */
    def dedupExact(textCol: String, keyCol: String): KFrame =
      lift(Dedup.exact(_, textCol, keyCol))

    /** MinHash near-dup dedup (keep-lowest-id survivor policy). */
    def nearDupDedup(idCol: String, textCol: String,
        threshold: Double = 0.8): KFrame =
      lift(Dedup.minhashDedup(_, idCol, textCol, threshold))

    /** Cluster-level near-dup dedup: one survivor per connected component
      * of the near-dup graph (strictly stronger than [[nearDupDedup]]).
      */
    def nearDupDedupClusters(idCol: String, textCol: String,
        threshold: Double = 0.8): KFrame =
      lift(Dedup.minhashDedupClusters(_, idCol, textCol, threshold))

    /** Replace emails / IPv4s / phone-ish runs in `textCol` with typed
      * placeholders, in place.
      */
    def redactPII(textCol: String): KFrame =
      lift(df => df.withColumn(textCol,
        TextAnalysis.redactPII(org.apache.spark.sql.functions.col(textCol))))

    /** Quality-gate + exact-dedup + near-dup-dedup curation pipeline. */
    def cleanCorpus(idCol: String, textCol: String): KFrame =
      lift(Pipelines.cleanCorpus(_, idCol, textCol))

    /** Append the text-analysis signal columns (tokens, quality, lang…). */
    def analyzeText(textCol: String): KFrame =
      lift(TextAnalysis.analyze(_, textCol))

    /** Per-(doc, term) TF-IDF scores. */
    def tfIdf(idCol: String, textCol: String): KFrame =
      lift(TextAnalysis.tfIdf(_, idCol, textCol))

    /** Drop every doc with a near-dup in `ref` (incremental-ingest dedup
      * against an existing corpus).
      */
    def dedupAgainstCorpus(idCol: String, textCol: String, ref: KFrame,
        refIdCol: String, refTextCol: String,
        threshold: Double = 0.8): KFrame =
      lift(Dedup.dedupAgainst(_, idCol, textCol, ref.toDF, refIdCol,
        refTextCol, threshold))

    /** Keep docs inside the [lo, hi] corpus quantiles of unigram
      * cross-entropy (two-sided perplexity trim); re-joins the survivors
      * so ALL columns ride through, unlike the bare operator's (id, xent).
      */
    def perplexityTrim(idCol: String, textCol: String, lo: Double = 0.05,
        hi: Double = 0.95): KFrame =
      lift { df =>
        val keep = TextAnalysis.perplexityBand(df, idCol, textCol, lo, hi)
          .select(idCol)
        df.join(keep, Seq(idCol), "left_semi")
      }

    /** Keep docs passing the full Gopher/MassiveText rule battery. */
    def gopherFilter(textCol: String): KFrame =
      lift(Selection.gopherFilter(_, textCol))

    /** Append the per-rule Gopher booleans + `gopher_pass`. */
    def gopherRules(textCol: String): KFrame =
      lift(Selection.gopherRules(_, textCol))

    /** Deterministic weighted split column (`split`). */
    def hashSplit(keyCol: String, weights: Seq[(String, Double)],
        salt: String = "graft"): KFrame =
      lift(Selection.hashSplit(_, keyCol, weights, salt))

    /** DSIR-resample toward `target`: keep the k highest
      * importance+Gumbel-scored docs (all columns ride through).
      */
    def dsirResample(idCol: String, textCol: String, target: KFrame, k: Int,
        numBuckets: Int = 1 << 16, seed: Long = 42L): KFrame =
      lift { df =>
        val keep = Selection.dsirSelect(df, target.toDF, idCol, textCol, k,
          numBuckets, seed = seed).select(idCol)
        df.join(keep, Seq(idCol), "left_semi")
      }

    /** Drop docs whose duplicated-passage fraction exceeds `maxDupFrac`
      * (docs shorter than `window` tokens have no spans and are KEPT).
      */
    def dropDuplicatedPassages(idCol: String, textCol: String,
        window: Int = 50, maxDupFrac: Double = 0.3): KFrame =
      lift { df =>
        val bad = TextAnalysis
          .duplicatedPassages(df, idCol, textCol, window)
          .filter(org.apache.spark.sql.functions.col("dup_frac") > maxDupFrac)
          .select(idCol)
        df.join(bad, Seq(idCol), "left_anti")
      }
  }
}
