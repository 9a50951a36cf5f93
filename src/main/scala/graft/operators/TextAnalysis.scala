package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Text-analysis operators for large-scale document pipelines (extension
  * scope, SURVEY.md §7.2 M8 — the reference has no scalar function surface
  * at all, `SURVEY.md §2.8`).
  *
  * Everything here is built from `org.apache.spark.sql.functions` column
  * expressions (whole-stage-codegen'd; no Scala UDF in a hot path), so each
  * operator is a pure projection over the scan — no shuffle, trivially
  * parallel at any scale, and filter/column pushdown pass through.
  */
object TextAnalysis {

  /** Lower-cased word tokens (unicode letters+digits runs).
    *
    * TOKENIZE ONCE: every multi-signal consumer must project this to an
    * attribute (`.select(tokens(col).as("__ts"))`) and compute its signals
    * with the `*Of` token-array variants below. Higher-order-function
    * lambdas are CodegenFallback AND exempt from subexpression elimination
    * (expressions containing `LambdaVariable` are excluded — SPARK-35410),
    * so inlining `tokens(text)` into N signals runs N interpreted tokenizer
    * passes per row. The attribute pattern is plan-pinned (kernel-once
    * test in PipelineSpec).
    */
  def tokens(text: Column): Column =
    // array_remove(…, "") == filter(length > 0) exactly for string arrays
    // (split never yields nulls; empties arise only at the edges), but it
    // is a codegen'd expression while the filter HOF evaluates an
    // interpreted lambda per token in every text query's hottest stage
    F.array_remove(F.split(F.lower(text), "[^\\p{L}\\p{N}]+"), "")

  /** Whitespace token count — the cheap "how many words" measure. */
  def tokenCount(text: Column): Column = tokenCountOf(tokens(text))

  /** [[tokenCount]] over a materialized token-array attribute. */
  def tokenCountOf(ts: Column): Column = F.size(ts)

  /** BPE-ish subword count: splits on whitespace, then charges
    * ceil(len/4) subword units per word — the standard quick estimate of
    * LLM token counts (~4 chars/token) without a tokenizer model.
    */
  def subwordCount(text: Column): Column = subwordCountOf(tokens(text))

  /** [[subwordCount]] over a materialized token-array attribute. */
  def subwordCountOf(ts: Column): Column =
    F.aggregate(ts, F.lit(0L),
      (acc, w) => acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"))

  // ---- BPE token counting ----------------------------------------------

  /** Token count under a REAL byte-pair-encoding merge table (Sennrich et
    * al. 2016) — the production-grade sibling of [[subwordCount]]'s
    * ceil(len/4) estimate: token-budget caps ([[Selection.capTokensPerGroup]])
    * and sequence packing ([[Packing.packChunks]]) take any count column,
    * so swapping this in makes their arithmetic match a deployed
    * tokenizer. One native codegen'd kernel call per row
    * ([[graft.functions.BpeCount]]); the merge table rides as a driver
    * literal (bounded: numMerges pairs), never a broadcast, never per-row
    * state. Unknown characters stay unmerged (1 token/char) — counting
    * never errors on novel text.
    */
  def subwordCountBpe(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.GraftExtensions.callNative("bpe_count", text,
      F.typedLit(merges.map(p => Seq(p._1, p._2))))

  /** The BPE token strings themselves (document order) — inspection face
    * and test ground truth for [[subwordCountBpe]] (same kernel).
    */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.GraftExtensions.callNative("bpe_tokens", text,
      F.typedLit(merges.map(p => Seq(p._1, p._2))))

  /** Learn a BPE merge table from the corpus — classic frequency-greedy
    * training (Sennrich et al. 2016 alg. 1): start from characters, repeat
    * `numMerges` times "count adjacent symbol pairs over the word-frequency
    * dict, fuse the most frequent" (ties break lexicographically, so the
    * table is deterministic).
    *
    * Training is DRIVER-side over a bounded hash-uniform sample
    * (deliberately — the same contract as [[Similarity.trainPqCodebooks]]:
    * a merge table needs a representative sample, not the corpus; the
    * word-frequency dict is one bounded aggregate-collect, uniform across
    * partitions regardless of physical row order, and the merge loop is
    * pure Scala, not numMerges Spark jobs). Everything downstream —
    * counting, capping, packing — is fully distributed through the native
    * kernel. Vocabulary words are the shared lowercase-alnum tokens, the
    * same family the kernel segments at count time.
    */
  def trainBpeMerges(df: DataFrame, textCol: String, numMerges: Int,
      sampleCap: Int = 10000, seed: Long = 42L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    // bounded deterministic sample: lowest xxhash64(text, seed) texts
    // (hash on the text itself — no id column required of callers)
    val sampled = df.select(F.col(textCol).as("__t"),
        F.xxhash64(F.col(textCol), F.lit(seed)).as("__h"))
      .orderBy("__h").limit(sampleCap)
    // word-frequency dict: one aggregate over the sample's tokens;
    // bounded by the sample's vocabulary, collected once
    val wordFreq: Array[(String, Long)] = sampled
      .select(graft.plans.Hygiene.explodeNonEmpty(tokens(F.col("__t"))).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // words as mutable symbol sequences, weighted by frequency
    var words: Array[(Array[String], Long)] = wordFreq.map { case (w, n) =>
      (w.toCharArray.map(String.valueOf), n)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // most frequent pair; deterministic lexicographic tie-break
        val best = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }
        val (a, b) = best._1
        merges += ((a, b))
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
        step += 1
      }
    }
    merges.toSeq
  }

  /** Persist a learned merge table as a parquet sidecar (rank, left,
    * right) — the fit-once/score-many artifact face (same contract as
    * [[Selection.saveNbModel]]): train the vocabulary once, count against
    * it from any number of jobs via [[loadBpeVocab]].
    */
  def saveBpeVocab(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a persisted merge table ([[saveBpeVocab]]) — bounded driver
    * collect (numMerges rows), rank-ascending (segmentation correctness
    * depends on the learned order).
    */
  def loadBpeVocab(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).map(t => (t._2, t._3)).toSeq

  /** Character n-gram shingles of the concatenated token stream — the
    * canonical MinHash input. `n` characters per shingle, distinct.
    * (Guarded: `sequence(1, 0)` would generate a DESCENDING [1,0], so a
    * too-short input must short-circuit to an empty array.)
    */
  def charShingles(text: Column, n: Int = 5): Column = {
    val joined = F.array_join(tokens(text), " ")
    val count = F.length(joined) - (n - 1)
    F.when(count >= 1, F.array_distinct(
        F.transform(F.sequence(F.lit(1), count), i => joined.substr(i, F.lit(n)))))
      .otherwise(F.array().cast("array<string>"))
  }

  /** Word n-gram shingles (distinct) — MinHash/Jaccard input at word
    * granularity. Same descending-sequence guard as [[charShingles]].
    */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val ts = tokens(text)
    val count = F.size(ts) - (n - 1)
    F.when(count >= 1, F.array_distinct(
        F.transform(F.sequence(F.lit(1), count),
          i => F.array_join(F.slice(ts, i, F.lit(n)), " "))))
      .otherwise(F.array().cast("array<string>"))
  }

  /** Stopword ratio against a small English stopword set — one of the
    * standard quality-pipeline signals (Gopher/C4-style rules).
    */
  private val Stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "it", "for", "on", "with", "as", "that", "this")

  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))

  /** [[stopwordRatio]] over a materialized token-array attribute.
    * TOKEN-frequency ratio: stopword occurrences / all tokens — the
    * conventional C4/Gopher-style signal. (The former distinct-types
    * formulation capped the numerator at the stopword-list size, so a
    * long document could never exceed ~18/|vocab| and any conventional
    * 0.1-0.3 threshold classified all long prose as stopword-free.)
    */
  def stopwordRatioOf(ts: Column): Column = {
    val stops = F.array(Stopwords.map(F.lit): _*)
    F.when(F.size(ts) === 0, F.lit(0.0)).otherwise(
      F.size(F.filter(ts, t => F.array_position(stops, t) > 0))
        .cast("double") / F.size(ts))
  }

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    F.when(F.length(text) === 0, F.lit(0.0)).otherwise(
      (F.length(text) - F.length(F.regexp_replace(text, "[\\p{P}\\p{S}]", "")))
        .cast("double") / F.length(text))

  /** Mean word length in characters. */
  def meanWordLen(text: Column): Column = meanWordLenOf(tokens(text))

  /** [[meanWordLen]] over a materialized token-array attribute. */
  def meanWordLenOf(ts: Column): Column =
    // Σ length(token) == length(array_join(ts, "")) — same value, but
    // codegen'd instead of an interpreted aggregate() lambda per token
    F.when(F.size(ts) === 0, F.lit(0.0)).otherwise(
      F.length(F.array_join(ts, "")).cast("double") / F.size(ts))

  /** Composite document-quality score in [0,1]: length band + sane mean
    * word length + low punctuation + some stopwords. The exact recipe is a
    * heuristic (C4/Gopher-flavored); each signal is also exposed alone.
    */
  def qualityScore(text: Column): Column =
    qualityScoreOf(tokens(text), text)

  /** [[qualityScore]] over a materialized token-array attribute (the punct
    * band still reads the raw text — it is a cheap regexp, not a tokenize).
    */
  def qualityScoreOf(ts: Column, text: Column): Column = {
    val lengthOk = F.when(tokenCountOf(ts).between(10, 100000), F.lit(0.25))
      .otherwise(F.lit(0.0))
    val wordLenOk = F.when(meanWordLenOf(ts).between(2.0, 12.0), F.lit(0.25))
      .otherwise(F.lit(0.0))
    val punctOk = F.when(punctRatio(text) < 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    // ratio > 0 ⟺ any stopword present ⟺ non-empty intersect — the
    // presence test stays codegen'd (array_intersect) where the exact
    // ratio needs the per-token filter HOF
    val stopOk = F.when(
      F.size(F.array_intersect(ts, F.typedLit(Stopwords))) > 0, F.lit(0.25))
      .otherwise(F.lit(0.0))
    lengthOk + wordLenOk + punctOk + stopOk
  }

  /** 64-bit stable content fingerprint of the normalized token stream —
    * whitespace/punctuation-insensitive exact-dup key (cf. rolling-hash
    * document fingerprinting; xxhash64 is Spark-native and codegen'd).
    */
  def fingerprint(text: Column): Column = fingerprintOf(tokens(text))

  /** [[fingerprint]] over a materialized token-array attribute. */
  def fingerprintOf(ts: Column): Column =
    F.xxhash64(F.array_join(ts, " "))

  /** Language-ID marker words per language (tiny in-expression profiles —
    * a real deployment would broadcast larger n-gram profiles; the Spark
    * plumbing is identical).
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "une"),
    "es" -> Seq("el", "la", "los", "que", "es", "por", "con", "una"),
    "zh" -> Seq.empty) // CJK handled by script detection below

  /** Heuristic language ID: CJK script share first, then stopword-marker
    * voting; `und` when nothing matches. Pure column expression — runs in
    * codegen, no UDF, no shuffle.
    */
  def langId(text: Column): Column = langIdOf(tokens(text), text)

  /** [[langId]] over a materialized token-array attribute (the CJK-share
    * check still reads the raw text — a regexp, not a tokenize).
    */
  def langIdOf(ts: Column, text: Column): Column = {
    val cjkChars = F.length(F.regexp_replace(text, "[^\\p{IsHan}]", ""))
    // Argmax via ONE array_max over (score, -priority, lang) structs with
    // a (0, +1, "und") sentinel — every marker intersect is evaluated
    // exactly once per row. The previous chained-when formulation inlined
    // each intersect into both the running greatest() and every when()
    // arm: 36 array_intersect evaluations per row in the executed plan
    // for 4 marker languages (measured: the q_corpus_stats aggregate
    // stage spent ~170 µs/doc). Semantics are unchanged:
    //  - struct comparison orders by score first, then -index, so ties go
    //    to the earlier (higher-prior) language exactly as before;
    //  - the sentinel's score 0 at the highest priority wins whenever no
    //    real score exceeds 0 → "und", matching the old maxScore > 0
    //    guard (a null token array nulls every real score, and struct
    //    ordering ranks a null field below 0 → sentinel again).
    val scored = LangMarkers.filter(_._2.nonEmpty).zipWithIndex.map {
      case ((lang, markers), i) =>
        F.struct(
          F.size(F.array_intersect(ts, F.typedLit(markers))).as("s"),
          F.lit(-i).as("r"), F.lit(lang).as("l"))
    } :+ F.struct(F.lit(0).as("s"), F.lit(1).as("r"), F.lit("und").as("l"))
    val pick = F.array_max(F.array(scored: _*)).getField("l")
    F.when(cjkChars * 2 > F.length(text), F.lit("zh")).otherwise(pick)
  }

  /** Split documents into fixed-size token-window chunks with overlap —
    * the context-window preparation step of an embedding/training
    * pipeline. Output: one row per (doc, chunk_idx) with the chunk's text
    * (tokens joined by single spaces) and token count.
    *
    * Chunk i covers tokens [i·stride, i·stride + size) with
    * stride = size − overlap; the last chunk may be short; empty docs
    * produce no chunks. The token array is materialized as a column BEFORE
    * the explode (a generator over a composed expression re-evaluates it
    * per element under interpreted paths), and chunks reference it as an
    * attribute — one tokenize per doc, no shuffle at all.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      size: Int = 100, overlap: Int = 50): DataFrame = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val stride = size - overlap
    // The empty-doc guard lives INSIDE the explode argument, not in a
    // Filter: a filter over this projection would be predicate-pushed
    // below it with `__ts` substituted by the full tokenizer expression —
    // 3 tokenizer evaluations per row in the scan stage (see
    // graft.plans.Hygiene). when(...) → null → explode emits no chunks.
    val base = df.select(F.col(idCol), tokens(F.col(textCol)).as("__ts"))
      .withColumn("__n",
        F.greatest(
          F.ceil((F.size(F.col("__ts")) - size) / F.lit(stride.toDouble)) + 1,
          F.lit(1L)))
    base
      .select(F.col(idCol), F.col("__ts"),
        F.explode(F.when(F.size(F.col("__ts")) > 0,
          F.sequence(F.lit(0L), F.col("__n") - 1))).as("chunk_idx"))
      .select(F.col(idCol), F.col("chunk_idx"),
        F.array_join(
          F.slice(F.col("__ts"), (F.col("chunk_idx") * stride + 1).cast("int"), F.lit(size)),
          " ").as("chunk_text"))
      .withColumn("n_tokens", F.size(F.split(F.col("chunk_text"), " ")))
  }

  /** TF-IDF scores per (document, term): smoothed idf
    * `ln((N+1)/(df+1)) + 1` over raw term frequency.
    *
    * Plan shape (the scale contract): ONE corpus scan + tokenize pass, and
    * every term-keyed operation is either a partial+final aggregate or an
    * AQE-skew-splittable join — never a construct that must colocate all
    * rows of one term in one task:
    *
    *  - df could ride a `Window.partitionBy(term)` count with no join at
    *    all, but a window CANNOT be skew-split: a stop-word appearing in
    *    every document would funnel billions of rows through a single task.
    *    The tf⋈docFreq equi-join keeps AQE free to split the skewed left
    *    partitions against the 1-row-per-term right side.
    *  - the join carries NO broadcast hint: the distinct-term table of a
    *    web corpus is itself huge (Heaps' law), so a forced broadcast is
    *    the 100 TB OOM mode. AQE broadcasts it when runtime stats allow.
    *  - docFreq counts `when(tf >= 1, 1)` — semantically identical to
    *    count(*) since tf >= 1 by construction, but the reference to the
    *    tf value stops column pruning from specializing the docFreq
    *    branch's copy of the tf aggregate (a pruned copy is no longer
    *    canonically identical, AQE's stage cache cannot reuse it, and the
    *    corpus gets scanned + tokenized a second time; with the guard both
    *    branches share ONE tf stage — plan-pinned in PipelineSpec).
    *
    * The 1-row corpus-size aggregate is the only explicit broadcast.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(F.col(idCol), F.explode(tokens(F.col(textCol))).as("term"))
      .groupBy(F.col(idCol), F.col("term"))
      .agg(F.count(F.lit(1)).as("tf"))
    // corpus size as an in-plan 1-row broadcast — no driver-side count job
    val nDF = df.agg(F.count(F.lit(1)).cast("double").as("__n"))
    // tf rows ARE the distinct (doc, term) pairs, so df(term) = row count
    // per term (see the pruning note above for the when-guard).
    val docFreq = tf.groupBy("term")
      .agg(F.count(F.when(F.col("tf") >= 1, 1)).as("df"))
    tf.join(docFreq, "term")
      .crossJoin(F.broadcast(nDF))
      .withColumn("idf",
        F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0))
      .withColumn("tfidf", F.col("tf") * F.col("idf"))
      .select(F.col(idCol), F.col("term"), F.col("tf"), F.col("df"),
        F.col("tfidf"))
  }

  /** BM25 (Okapi, positive Lucene-style idf) relevance weights per
    * (doc, term) — the retrieval-grade sibling of [[tfIdf]], adding
    * per-document length normalization:
    *
    *   idf   = ln((N − df + 0.5) / (df + 0.5) + 1)
    *   bm25  = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * N and avgdl are over tokenized (non-empty-token) documents — the
    * population the tf table normalizes against.
    *
    * Same scale contract as [[tfIdf]] (read its plan notes): every
    * term-keyed step is a partial+final aggregate or an AQE-skew-splittable
    * equi-join, the unbounded vocabulary is never broadcast, and the only
    * hint is the 1-row corpus-stats aggregate. The tf aggregate feeds
    * THREE consumers here (scoring join, docFreq, docLens); each auxiliary
    * consumer references every tf column inside a no-op-by-construction
    * guard so column pruning cannot specialize its copy away from
    * canonical identity — all three share ONE tf stage and the corpus is
    * scanned + tokenized once (the tfIdf trick, plan-pinned in
    * PipelineSpec).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = df
      .select(F.col(idCol), tokens(F.col(textCol)).as("__ts"))
      .select(F.col(idCol), F.size(F.col("__ts")).as("dl"),
        graft.plans.Hygiene.explodeNonEmpty(F.col("__ts")).as("term"))
      .groupBy(F.col(idCol), F.col("dl"), F.col("term"))
      .agg(F.count(F.lit(1)).as("tf"))
    val docFreq = tf.groupBy("term")
      .agg(F.count(F.when(
        F.col("tf") >= 1 && F.col(idCol).isNotNull && F.col("dl") >= 0,
        1)).as("df"))
    val docLens = tf.groupBy(F.col(idCol))
      .agg(F.max(F.when(F.col("tf") >= 1 && F.col("term").isNotNull,
        F.col("dl"))).as("__dl"))
    val stats = docLens.agg(
      F.count(F.lit(1)).cast("double").as("__n"),
      F.avg(F.col("__dl")).as("__avgdl"))
    tf.join(docFreq, "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("idf",
        F.log((F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0))
      .withColumn("bm25",
        F.col("idf") * (F.col("tf") * (k1 + 1.0)) /
          (F.col("tf") + F.lit(k1) *
            (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))))
      .select(F.col(idCol), F.col("term"), F.col("tf"), F.col("dl"),
        F.col("df"), F.col("bm25"))
  }

  /** Top-k BM25 retrieval for one query string: tokenize the query with
    * the corpus tokenizer (driver-side — a query is a handful of terms),
    * keep only matching (doc, term) weights, sum per doc, deterministic
    * top-k (score desc, id asc). Returns (idCol, score).
    *
    * The term filter is an `isin` over the query's tokens, pushed beneath
    * the [[bm25]] join — only matching terms' rows survive the tf side.
    * Repeated query terms weigh once (set semantics), the standard bag-of-
    * words simplification for short queries.
    */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
      query: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = query.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "bm25Search: query has no tokens")
    bm25(df, idCol, textCol, k1, b)
      .filter(F.col("term").isin(qTerms: _*))
      .groupBy(F.col(idCol))
      .agg(F.sum("bm25").as("score"))
      // sort+limit → TakeOrderedAndProject: per-partition top-k merged on
      // the driver (k rows per partition), NOT a global single-partition
      // window — a stop-word query matching the whole corpus still ranks
      // distributed.
      .orderBy(F.col("score").desc, F.col(idCol).asc)
      .limit(k)
  }

  // ---- repetition & PII signals (C4/Gopher-style curation rules) --------

  /** Frequency of the most common token as a fraction of all tokens — the
    * Gopher repetition signal that catches keyword-stuffed / looping docs.
    * Computed as the longest run in the SORTED token array — one
    * O(n log n) sort + one linear fold per row, instead of the naive
    * distinct×n count-per-token scan (measured 4× on the documents
    * bench). No shuffle, no UDF.
    */
  def maxWordFrequency(text: Column): Column =
    maxWordFrequencyOf(tokens(text))

  /** [[maxWordFrequency]] over a materialized token-array attribute. */
  def maxWordFrequencyOf(ts: Column): Column = {
    val best = F.aggregate(
      F.array_sort(ts),
      // (prev token, current run length, best run length); tokens are
      // never empty strings, so "" can't collide with a real first token
      F.struct(F.lit("").as("prev"), F.lit(0).as("run"), F.lit(0).as("best")),
      (acc, w) => {
        val run = F.when(w === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(F.lit(1))
        F.struct(w.as("prev"), run.as("run"),
          F.greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    F.when(F.size(ts) === 0, F.lit(0.0))
      .otherwise(best.cast("double") / F.size(ts))
  }

  /** Fraction of physical lines that are duplicates of an earlier line —
    * boilerplate/navigation detector (Gopher's duplicate-line rule).
    */
  def dupLineFraction(text: Column): Column = {
    val lines = F.split(text, "\n")
    F.when(F.size(lines) <= 1, F.lit(0.0)).otherwise(
      F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / F.size(lines))
  }

  /** Column order of the MassiveText repetition battery
    * ([[repetitionRules]]) and of the `rep_stats` kernel's output array.
    */
  val RepetitionSignals: Seq[String] = Seq(
    "dup_line_frac", "dup_line_char_frac",
    "dup_para_frac", "dup_para_char_frac",
    "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
    "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
    "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac")

  /** Removal thresholds per signal (Rae et al. 2021 A1.1, "repetitious
    * text" table): a document FAILS when any signal EXCEEDS its bound.
    */
  val RepetitionThresholds: Seq[Double] = Seq(
    0.30, 0.20, 0.30, 0.20,          // line / paragraph (frac, char frac)
    0.20, 0.18, 0.16,                // top 2-/3-/4-gram char fraction
    0.15, 0.14, 0.13, 0.12, 0.11, 0.10) // dup 5..10-gram char fraction

  /** MassiveText repetition battery (Rae et al. 2021 A1.1): the 13
    * within-document repetition fractions — duplicate line/paragraph
    * fractions (plain + char-weighted), top-{2,3,4}-gram character
    * fractions, duplicate-{5..10}-gram character fractions — plus the
    * combined `rep_pass` under the paper's thresholds. Complements the
    * cross-document [[duplicatedPassages]] profile and the structural
    * [[Selection.gopherRules]] battery; signal definitions are documented
    * on [[graft.functions.RepStats]] and replayed verbatim by the
    * q_text_rep DuckDB oracle.
    *
    * SCALE: repetition is a PER-DOCUMENT property, so the whole battery is
    * ONE fused native kernel call per row ([[graft.functions.RepStats]])
    * behind an attribute barrier — scan-side, no shuffle, no explode (the
    * groupBy-per-(doc, ngram) formulation would shuffle the corpus nine
    * times over on doc-keyed n-gram rows); kernel-once is plan-pinned.
    */
  def repetitionRules(df: DataFrame, textCol: String): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val inner = df.withColumn("__r", graft.plans.Hygiene.attributeBarrier(
      graft.plans.GraftExtensions.callNative("rep_stats", F.col(textCol))))
    val withSignals = RepetitionSignals.zipWithIndex.foldLeft(inner) {
      case (acc, (name, i)) =>
        acc.withColumn(name, F.get(F.col("__r"), F.lit(i)))
    }
    val pass = RepetitionSignals.zip(RepetitionThresholds)
      .map { case (name, t) => F.col(name) <= t }
      .reduce(_ && _)
    withSignals.withColumn("rep_pass", pass).drop("__r")
  }

  /** Rows passing the full repetition battery, signal columns dropped. */
  def repetitionFilter(df: DataFrame, textCol: String): DataFrame =
    repetitionRules(df, textCol).filter(F.col("rep_pass"))
      .drop(RepetitionSignals :+ "rep_pass": _*)

  /** PII patterns — deliberately RE2-compatible (no backtracking
    * constructs) so the DuckDB oracle can run the IDENTICAL regex.
    */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Rx = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRx = "\\+?\\d[\\d()\\s-]{6,}\\d"

  def emailCount(text: Column): Column =
    F.regexp_count(text, F.lit(EmailRx)).cast("long")

  def ipv4Count(text: Column): Column =
    F.regexp_count(text, F.lit(Ipv4Rx)).cast("long")

  /** Replace emails, IPv4s and phone-ish digit runs with typed placeholder
    * tags — the standard pre-training scrub. Order matters: emails first
    * (an address can contain digits), then IPs, then the greedy phone run.
    */
  def redactPII(text: Column): Column = {
    val noEmail = F.regexp_replace(text, F.lit(EmailRx), F.lit("<EMAIL>"))
    val noIp = F.regexp_replace(noEmail, F.lit(Ipv4Rx), F.lit("<IP>"))
    F.regexp_replace(noIp, F.lit(PhoneRx), F.lit("<PHONE>"))
  }

  /** Canonical text cleanup (NFC + line-terminator/control/whitespace
    * normalization) — run it BEFORE anything content-addressed: exact
    * hashes, fingerprints, shingles and MinHash signatures all diverge on
    * trivially-different encodings of the same text (the CCNet-style
    * normalize-first contract, Wenzek et al. 2020 §4.1). One native kernel
    * call per row ([[graft.functions.NormalizeText]] — rule list and order
    * there), whole-stage codegen, scan-side, no shuffle; every rule is
    * replayable in ANSI SQL so the operator is fully oracle-checked.
    */
  def normalizeText(text: Column): Column =
    graft.plans.GraftExtensions.callNative("normalize_text", text)

  // ---- corpus statistics & perplexity-style scoring ---------------------

  /** ALL word n-grams of a token-array ATTRIBUTE, duplicates kept — the
    * frequency-counting sibling of [[wordShingles]] (which is distinct,
    * for set-based Jaccard). Takes the materialized token array, not the
    * text: a higher-order lambda re-evaluates subtrees per ELEMENT when
    * interpreted, so inlining the tokenizer here would re-tokenize the
    * document once per n-gram (the Generate trap — see the verify notes).
    * Callers project `tokens(text)` to an attribute first.
    */
  def ngramsOf(ts: Column, n: Int): Column = {
    require(n >= 1, s"ngramsOf: n must be >= 1, got $n")
    val count = F.size(ts) - (n - 1)
    F.when(count >= 1,
        F.transform(F.sequence(F.lit(1), count),
          i => F.array_join(F.slice(ts, i, F.lit(n)), " ")))
      .otherwise(F.array().cast("array<string>"))
  }

  /** Top-k most frequent word n-grams over the whole corpus — the basic
    * dataset-statistics query (vocabulary head, boilerplate discovery,
    * contamination probes). Deterministic output order: count desc, then
    * n-gram asc.
    *
    * Scale: tokenize+ngram is a projection over the scan; the count is a
    * partial+final hash aggregate keyed by n-gram (AQE-skew-splittable);
    * sort+limit compiles to TakeOrderedAndProject — per-partition top-k
    * merged on the driver, k rows per partition, never a global sort.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int = 2,
      k: Int = 50): DataFrame = {
    df.select(tokens(F.col(textCol)).as("__ts"))
      .select(ngramsOf(F.col("__ts"), n).as("__gs"))
      .select(graft.plans.Hygiene.explodeNonEmpty(F.col("__gs")).as("ngram"))
      .groupBy("ngram").agg(F.count(F.lit(1)).as("n"))
      .orderBy(F.col("n").desc, F.col("ngram").asc)
      .limit(k)
  }

  /** Per-document unigram cross-entropy (nats/token) under the corpus' own
    * maximum-likelihood unigram model — the cheap stand-in for LM
    * perplexity scoring used in quality filtering (CCNet-style): rare-word
    * gibberish scores high, boilerplate scores low. Self-scoring, so every
    * token is in-vocabulary (no smoothing needed):
    *
    *   xent(doc) = ln T − (Σ_terms tf·ln ctf) / dl
    *
    * with ctf = corpus frequency of the term and T = Σ ctf.
    *
    * Scale contract (the [[bm25]] topology): tf feeds the scoring join and
    * the corpus-frequency aggregate, and ctf feeds the join and the 1-row
    * total — each auxiliary consumer references every upstream column
    * inside a no-op-by-construction guard so column pruning cannot
    * specialize its copy, and all consumers share ONE tf stage: the corpus
    * is scanned and tokenized exactly once (plan-pinned in PipelineSpec).
    * The unbounded vocabulary is never broadcast; the only hint is the
    * 1-row total. Returns (idCol, dl, xent); empty-token docs drop.
    */
  def unigramLogLoss(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df
      .select(F.col(idCol), tokens(F.col(textCol)).as("__ts"))
      .select(F.col(idCol), graft.plans.Hygiene.sizeNonNull(F.col("__ts")).as("dl"),
        graft.plans.Hygiene.explodeNonEmpty(F.col("__ts")).as("term"))
      .groupBy(F.col(idCol), F.col("dl"), F.col("term"))
      .agg(F.count(F.lit(1)).as("tf"))
    val ctf = tf.groupBy("term")
      .agg(F.sum(F.when(
        F.col("tf") >= 1 && F.col(idCol).isNotNull && F.col("dl") >= 0,
        F.col("tf"))).as("ctf"))
    val total = ctf.agg(F.sum(F.when(F.col("term").isNotNull, F.col("ctf")))
      .cast("double").as("__t"))
    tf.join(ctf, "term")
      .crossJoin(F.broadcast(total))
      .groupBy(F.col(idCol), F.col("dl"), F.col("__t"))
      .agg(F.sum(F.col("tf") * F.log(F.col("ctf"))).as("__s"))
      .withColumn("xent", F.log(F.col("__t")) - F.col("__s") / F.col("dl"))
      .select(F.col(idCol), F.col("dl").cast("long").as("dl"), F.col("xent"))
  }

  /** Per-doc duplicated-passage profile (the rolling-window approximation
    * of Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better" — repeated ≥window-token spans anywhere in the corpus
    * mark memorization-prone text): every `window`-token rolling span is
    * keyed, spans whose corpus-wide occurrence count exceeds 1 (ANY
    * repetition — across docs or within one) are duplicated, and each doc
    * reports its duplicated-window fraction. Docs shorter than `window`
    * have no spans and drop.
    *
    * With `hashed = true` (the 100 TB default) span keys are the 64-bit
    * fused shingle hashes (per-token FNV-1a, golden-ratio chaining,
    * avalanche finalizer — `ShingleHashKernel`) — the span STRINGS never
    * enter a shuffle, only 8-byte keys do; `hashed = false` keeps raw
    * strings for oracle replay (same result modulo ~2^-64-scale hash
    * collisions). One corpus
    * scan and one tokenizer pass (shared-stage topology with the explicit
    * superset null filter — see [[bigramLogLoss]]); the span-count
    * aggregate is partial+final on the key, AQE-skew-splittable (heavy
    * boilerplate keys collapse map-side).
    *
    * Returns (idCol, n_windows, n_dup, dup_frac).
    */
  def duplicatedPassages(df: DataFrame, idCol: String, textCol: String,
      window: Int = 50, hashed: Boolean = true): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val spanRows =
      if (hashed) {
        // fused native path: `shingle_hashes_all` tokenizes + hashes every
        // positional window in ONE codegen'd kernel call per row (the
        // composed tokens->transform->concat_ws->xxhash64 chain runs the
        // per-window concat as an interpreted lambda under Generate);
        // duplicates kept — every POSITION is a window
        graft.plans.GraftExtensions.register(df.sparkSession)
        val sh = graft.plans.GraftExtensions.callNative("shingle_hashes_all",
          F.col(textCol), F.lit(window))
        df.select(F.col(idCol), sh.as("__sh"))
          .select(F.col(idCol),
            graft.plans.Hygiene.sizeNonNull(F.col("__sh")).cast("long")
              .as("n_windows"),
            graft.plans.Hygiene.explodeNonEmpty(F.col("__sh")).as("wkey"))
      } else {
        // exact-string flavor: the positional window STRINGS in one
        // gram_strings kernel call per row (the former
        // tokenize→sequence→slice→concat_ws chain ran its per-window
        // concat as an interpreted lambda under Generate). Short docs
        // yield an EMPTY array → explodeNonEmpty drops them, same as the
        // when-guard did; n_windows is the array's own length.
        graft.plans.GraftExtensions.register(df.sparkSession)
        val sp = graft.plans.GraftExtensions.callNative("gram_strings",
          F.col(textCol), F.lit(window))
        df.select(F.col(idCol), sp.as("__sp"))
          .select(F.col(idCol),
            graft.plans.Hygiene.sizeNonNull(F.col("__sp")).cast("long")
              .as("n_windows"),
            graft.plans.Hygiene.explodeNonEmpty(F.col("__sp")).as("wkey"))
      }
    val wtf = spanRows
      // explicit superset filter keeps the stage canonical under
      // inferred isnotnull (see bigramLogLoss)
      .filter(F.col("wkey").isNotNull && F.col(idCol).isNotNull)
      .groupBy(F.col(idCol), F.col("n_windows"), F.col("wkey"))
      .agg(F.count(F.lit(1)).as("c")) // per-doc span tf
    // corpus tf per window as a window sum over wtf — ONE wkey shuffle,
    // no self-join: the former groupBy(wkey)+join-back shape pushed the
    // window keys (8-gram STRINGS in the exact flavor) through an extra
    // aggregate exchange AND both join exchanges. At corpus scale the
    // wkey shuffle is the wide one; crossing it once is the contract.
    val gc = F.sum(F.col("c")).over(
      org.apache.spark.sql.expressions.Window.partitionBy("wkey"))
    wtf.withColumn("gc", gc)
      .groupBy(F.col(idCol), F.col("n_windows"))
      .agg(F.sum(F.when(F.col("gc") > 1, F.col("c")).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac", F.col("n_dup") / F.col("n_windows"))
      .select(F.col(idCol), F.col("n_windows"), F.col("n_dup"),
        F.col("dup_frac"))
  }

  /** Per-doc cross-entropy under a Jelinek-Mercer interpolated BIGRAM
    * language model trained on the corpus itself (the CCNet/KenLM-style
    * upgrade of [[unigramLogLoss]] — Wenzek et al. 2020 filter on LM
    * perplexity; Jelinek & Mercer 1980 interpolation):
    *
    *   p(w2 | w1) = λ · c(w1,w2)/cl(w1) + (1−λ) · cr(w2)/T
    *
    * where c is the corpus bigram count, cl/cr its left/right marginals
    * and T the total bigram positions — ALL derived from ONE bigram
    * term-frequency stage, so the corpus is scanned and tokenized exactly
    * once (the unigram backoff is deliberately the right-position marginal,
    * not a second unigram scan; both engines replay the same definition).
    * Per doc: xent2 = −Σ tf·ln p / (dl−1) over its dl−1 bigram positions.
    * Docs with fewer than 2 tokens drop.
    *
    * SCALE: partial+final aggregates throughout; the corpus-sized btf
    * stage has exactly two consumers (c12 and the per-doc probe), the
    * marginals are window sums over the vocabulary-sized c12 and ride the
    * SAME (w1,w2) join as c12 itself, and the 1-row total sums c12 —
    * the bigram vocabulary is never broadcast or collected; the one
    * btf→c12e join shuffles on term keys and is AQE-skew-splittable.
    */
  def bigramLogLoss(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.9): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    val ts = F.col("__ts")
    // adjacent-pair structs via arrays_zip over two guarded slices — NO
    // lambda in the Generate child (a zip_with/struct lambda defeats
    // exchange canonicalization after self-DAG dedup-rewrite, splitting
    // the shared stage into per-consumer copies); greatest(dl−1, 0) makes
    // 0/1-token docs yield [] instead of a negative slice length
    val n1 = F.greatest(F.size(ts) - 1, F.lit(0))
    val bigrams = F.arrays_zip(
      F.slice(ts, F.lit(1), n1), F.slice(ts, F.lit(2), n1))
    val btf = df
      .select(F.col(idCol), tokens(F.col(textCol)).as("__ts"))
      .select(F.col(idCol), graft.plans.Hygiene.sizeNonNull(ts).as("dl"),
        graft.plans.Hygiene.explodeNonEmpty(bigrams).as("__bg"))
      .select(F.col(idCol), F.col("dl").cast("long").as("dl"),
        F.col("__bg").getField("0").as("w1"),
        F.col("__bg").getField("1").as("w2"))
      // explicit (vacuously true) null filter on BOTH words: each consumer
      // join infers a different isnotnull subset and would push it below
      // the aggregate, splitting the shared stage into non-canonical
      // copies; stating the superset here makes every branch identical
      .filter(F.col("w1").isNotNull && F.col("w2").isNotNull)
      .groupBy(F.col(idCol), F.col("dl"), F.col("w1"), F.col("w2"))
      .agg(F.count(F.lit(1)).as("tf2"))
    // corpus counts — btf has exactly TWO consumers (the c12 aggregate
    // and the final per-doc join probe), and everything else derives from
    // c12: cl/cr are window sums over it (marginals over btf equal
    // marginals over c12 by associativity of sum — the DuckDB oracle
    // derives them the same way) and the 1-row total is a sum over it.
    // This folds what used to be three extra btf-sized aggregation passes
    // plus two corpus-sized marginal joins into two vocabulary-sized
    // window passes and ONE (w1,w2) join carrying c12+cl+cr together —
    // the probe side crosses an exchange once instead of three times.
    // The guards reference every upstream column so column pruning cannot
    // specialize one consumer's copy of the shared stage (bm25's
    // shared-tf-stage shape: identical subtrees ⇒ one exchange, reused).
    def guarded: Column = F.when(
      F.col("tf2") >= 1 && F.col(idCol).isNotNull && F.col("dl") >= 2,
      F.col("tf2"))
    val c12 = btf.groupBy("w1", "w2").agg(F.sum(guarded).as("c12"))
    def guardedC12: Column = F.when(
      F.col("w1").isNotNull && F.col("w2").isNotNull, F.col("c12"))
    val wl = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    val wr = org.apache.spark.sql.expressions.Window.partitionBy("w2")
    val c12e = c12
      .withColumn("cl", F.sum(guardedC12).over(wl))
      .withColumn("cr", F.sum(guardedC12).over(wr))
    val total = c12.agg(F.sum(guardedC12).cast("double").as("__t"))
    val lam = F.lit(lambda)
    val oneMinus = F.lit(1.0) - lam
    btf.join(c12e, Seq("w1", "w2"))
      .crossJoin(F.broadcast(total))
      .withColumn("__p",
        lam * (F.col("c12") / F.col("cl")) + oneMinus * (F.col("cr") / F.col("__t")))
      .groupBy(F.col(idCol), F.col("dl"))
      .agg(F.sum(F.col("tf2") * F.log(F.col("__p"))).as("__s"))
      .withColumn("xent2", -F.col("__s") / (F.col("dl") - 1))
      .select(F.col(idCol), F.col("dl"), F.col("xent2"))
  }

  /** Perplexity-band filtering: keep documents whose unigram cross-entropy
    * sits within the [lo, hi] corpus quantiles — the standard two-sided
    * trim (drop boilerplate at the low tail, gibberish at the high tail).
    *
    * Scores are rounded to 6 decimals BEFORE the quantile so threshold
    * equality is well-defined across engines (ties at a quantile position
    * interpolate to that exact value). The thresholds come from Spark's
    * exact `percentile` aggregate as a 1-row broadcast — no global sort,
    * no window. At extreme cardinality swap in `approx_percentile`; the
    * band then becomes approximate (documented trade, not the default).
    * Returns (idCol, xent) for the surviving documents.
    */
  def perplexityBand(df: DataFrame, idCol: String, textCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val scored = unigramLogLoss(df, idCol, textCol)
      .select(F.col(idCol), F.round(F.col("xent"), 6).as("xent"))
    val th = scored.agg(
      F.percentile(F.col("xent"), F.lit(lo)).as("__lo"),
      F.percentile(F.col("xent"), F.lit(hi)).as("__hi"))
    scored.crossJoin(F.broadcast(th))
      .filter(F.col("xent") >= F.col("__lo") && F.col("xent") <= F.col("__hi"))
      .select(F.col(idCol), F.col("xent"))
  }

  /** Token-count histogram with fixed-width bins — the dataset-card
    * length distribution. Returns (bin_lo, n_docs) where bin_lo is the
    * inclusive lower edge (floor(tokens / width) · width). One projection
    * + one partial+final aggregate keyed by the bin — bin cardinality is
    * corpus_max/width regardless of corpus size, so the exchange is
    * always tiny.
    */
  def tokenHistogram(df: DataFrame, textCol: String,
      binWidth: Int = 20): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    df.select(
        ((tokenCount(F.col(textCol)) / binWidth).cast("long") * binWidth)
          .as("bin_lo"))
      .groupBy("bin_lo")
      .agg(F.count(F.lit(1)).as("n_docs"))
  }

  /** All quality/analysis signals in one pass over the scan: the token
    * array is materialized to a `__ts` attribute in an inner projection
    * and every signal reads the attribute (`*Of` variants) — ONE tokenizer
    * evaluation per row (plan-pinned), where inlining `tokens(text)` into
    * each signal would run ~8 interpreted tokenizer passes per row (HOF
    * lambdas are CSE-exempt, see [[tokens]]). CollapseProject keeps the
    * two projections apart because `__ts` is non-cheap and multiply
    * referenced.
    */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = F.col(textCol)
    val ts = F.col("__ts")
    df.withColumn("__ts", tokens(t))
      .select(df.columns.map(F.col) ++ Seq(
        tokenCountOf(ts).as("n_tokens"),
        subwordCountOf(ts).as("n_subwords"),
        meanWordLenOf(ts).as("mean_word_len"),
        punctRatio(t).as("punct_ratio"),
        stopwordRatioOf(ts).as("stopword_ratio"),
        qualityScoreOf(ts, t).as("quality"),
        langIdOf(ts, t).as("lang_pred"),
        fingerprintOf(ts).as("fingerprint")): _*)
  }
}
