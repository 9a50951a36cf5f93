package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomCount, BpeCount, BpeTokens, CharGramHashes, CharGramStrings, CosineSim, DotProduct, GopherStats, GramStrings, IntDot, Md5BloomHits, Md5GramHashes, MinHashPerms, MinHashSig, NearestCentroids, NormalizeText, PqAdcFixed, PqCodes, PqCodesFixed, PqLutFixed, RegisteredDomain, RepStats, ShingleHash, ShingleHashAll, SimHash64, SimHashMd5, SpliceChars, SpliceTokens, SpliceTokensStats, StripWww}

/** Session extensions registering the engine's native expressions for SQL
  * use. Activate with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  type Builder = Seq[Expression] => Expression

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hashes"),
      { args =>
        require(args.length == 2, "shingle_hashes(text, n) takes 2 arguments")
        ShingleHash(args.head, args(1))
      }),
    (FunctionIdentifier("shingle_hashes_all"),
      new ExpressionInfo(classOf[ShingleHashAll].getName, "shingle_hashes_all"),
      { args =>
        require(args.length == 2,
          "shingle_hashes_all(text, n) takes 2 arguments")
        ShingleHashAll(args.head, args(1))
      }),
    (FunctionIdentifier("gram_strings"),
      new ExpressionInfo(classOf[GramStrings].getName, "gram_strings"),
      { args =>
        require(args.length == 2,
          "gram_strings(text, n) takes 2 arguments")
        GramStrings(args.head, args(1))
      }),
    (FunctionIdentifier("splice_tokens"),
      new ExpressionInfo(classOf[SpliceTokens].getName, "splice_tokens"),
      { args =>
        require(args.length == 3,
          "splice_tokens(text, starts, k) takes 3 arguments")
        SpliceTokens(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("splice_tokens_stats"),
      new ExpressionInfo(classOf[SpliceTokensStats].getName,
        "splice_tokens_stats"),
      { args =>
        require(args.length == 3,
          "splice_tokens_stats(text, starts, k) takes 3 arguments")
        SpliceTokensStats(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("char_gram_strings"),
      new ExpressionInfo(classOf[CharGramStrings].getName,
        "char_gram_strings"),
      { args =>
        require(args.length == 2,
          "char_gram_strings(text, k) takes 2 arguments")
        CharGramStrings(args.head, args(1))
      }),
    (FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashes].getName,
        "char_gram_hashes"),
      { args =>
        require(args.length == 2,
          "char_gram_hashes(text, k) takes 2 arguments")
        CharGramHashes(args.head, args(1))
      }),
    (FunctionIdentifier("splice_chars"),
      new ExpressionInfo(classOf[SpliceChars].getName, "splice_chars"),
      { args =>
        require(args.length == 3,
          "splice_chars(text, starts, k) takes 3 arguments")
        SpliceChars(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("md5_bloom_hits"),
      new ExpressionInfo(classOf[Md5BloomHits].getName, "md5_bloom_hits"),
      { args =>
        require(args.length == 4,
          "md5_bloom_hits(text, n, words, kHashes) takes 4 arguments")
        Md5BloomHits(args.head, args(1), args(2), args(3))
      }),
    (FunctionIdentifier("md5_gram_hashes"),
      new ExpressionInfo(classOf[Md5GramHashes].getName, "md5_gram_hashes"),
      { args =>
        require(args.length == 2,
          "md5_gram_hashes(text, n) takes 2 arguments")
        Md5GramHashes(args.head, args(1))
      }),
    (FunctionIdentifier("minhash_perms"),
      new ExpressionInfo(classOf[MinHashPerms].getName, "minhash_perms"),
      { args =>
        require(args.length == 4,
          "minhash_perms(hashes, as, bs, prime) takes 4 arguments")
        MinHashPerms(args.head, args(1), args(2), args(3))
      }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_signature"),
      { args =>
        require(args.length == 3,
          "minhash_signature(hashes, numHashes, seed) takes 3 arguments")
        MinHashSig(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      { args =>
        require(args.length == 1, "simhash64(text) takes 1 argument")
        SimHash64(args.head)
      }),
    (FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
      { args =>
        require(args.length == 1, "simhash_md5(text) takes 1 argument")
        SimHashMd5(args.head)
      }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      { args =>
        require(args.length == 2, "cosine_sim(a, b) takes 2 arguments")
        CosineSim(args.head, args(1))
      }),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      { args =>
        require(args.length == 2, "dot_product(a, b) takes 2 arguments")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
      { args =>
        require(args.length == 2, "pq_codes(vec, codebooks) takes 2 arguments")
        PqCodes(args.head, args(1))
      }),
    (FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[BpeCount].getName, "bpe_count"),
      { args =>
        require(args.length == 2, "bpe_count(text, merges) takes 2 arguments")
        BpeCount(args.head, args(1))
      }),
    (FunctionIdentifier("rep_stats"),
      new ExpressionInfo(classOf[RepStats].getName, "rep_stats"),
      { args =>
        require(args.length == 1, "rep_stats(text) takes 1 argument")
        RepStats(args.head)
      }),
    (FunctionIdentifier("bloom_count"),
      new ExpressionInfo(classOf[BloomCount].getName, "bloom_count"),
      { args =>
        require(args.length == 2, "bloom_count(hashes, filter) takes 2 arguments")
        BloomCount(args.head, args(1))
      }),
    (FunctionIdentifier("gopher_stats"),
      new ExpressionInfo(classOf[GopherStats].getName, "gopher_stats"),
      { args =>
        require(args.length == 1, "gopher_stats(text) takes 1 argument")
        GopherStats(args.head)
      }),
    (FunctionIdentifier("bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokens].getName, "bpe_tokens"),
      { args =>
        require(args.length == 2, "bpe_tokens(text, merges) takes 2 arguments")
        BpeTokens(args.head, args(1))
      }),
    (FunctionIdentifier("nearest_centroids"),
      new ExpressionInfo(classOf[NearestCentroids].getName,
        "nearest_centroids"),
      { args =>
        require(args.length == 3,
          "nearest_centroids(vec, centroids, m) takes 3 arguments")
        NearestCentroids.fromArgs(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      { args =>
        require(args.length == 1, "normalize_text(text) takes 1 argument")
        NormalizeText(args.head)
      }),
    (FunctionIdentifier("registered_domain"),
      new ExpressionInfo(classOf[RegisteredDomain].getName,
        "registered_domain"),
      { args =>
        require(args.length == 1,
          "registered_domain(host) takes 1 argument")
        RegisteredDomain(args.head)
      }),
    (FunctionIdentifier("strip_www"),
      new ExpressionInfo(classOf[StripWww].getName, "strip_www"),
      { args =>
        require(args.length == 1, "strip_www(host) takes 1 argument")
        StripWww(args.head)
      }),
    (FunctionIdentifier("pq_codes_fixed"),
      new ExpressionInfo(classOf[PqCodesFixed].getName, "pq_codes_fixed"),
      { args =>
        require(args.length == 3,
          "pq_codes_fixed(vec, qcodebooks, shift) takes 3 arguments")
        PqCodesFixed(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("pq_lut_fixed"),
      new ExpressionInfo(classOf[PqLutFixed].getName, "pq_lut_fixed"),
      { args =>
        require(args.length == 3,
          "pq_lut_fixed(vec, qcodebooks, shift) takes 3 arguments")
        PqLutFixed(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntDot].getName, "int_dot"),
      { args =>
        require(args.length == 2, "int_dot(a, b) takes 2 arguments")
        IntDot(args.head, args(1))
      }),
    (FunctionIdentifier("pq_adc_fixed"),
      new ExpressionInfo(classOf[PqAdcFixed].getName, "pq_adc_fixed"),
      { args =>
        require(args.length == 2,
          "pq_adc_fixed(lut, codes) takes 2 arguments")
        PqAdcFixed(args.head, args(1))
      })
  )

  /** Register the functions directly into an existing session (idempotent;
    * used when the session was built without extensions — notebooks, or
    * library code resolving via `call_function`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident))
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** Build a Column calling one of the native functions, registering them
    * into the thread's active session first — the shared fallback for
    * Column-builder APIs that have no DataFrame (and thus no session) in
    * hand. Operators that DO hold a frame additionally register into
    * `df.sparkSession` at entry, which covers multi-session apps where the
    * frame's session is not the active one.
    */
  def callNative(name: String,
      cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column = {
    register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function(name, cols: _*)
  }
}
