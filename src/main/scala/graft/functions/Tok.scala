package graft.functions

/** THE lowercase-alnum tokenizer definition shared by every text kernel
  * (shingles, SimHash votes, bloom grams, BPE words, repetition stats) and
  * mirrored by `TextAnalysis.tokens` / the DuckDB oracle fragment: maximal
  * runs of anything that is not a Unicode letter or digit split the text.
  * ONE compiled Pattern so a flavor and its probes cannot desynchronize —
  * an edit here changes every kernel together, which is the only safe way
  * to change it (signatures, band keys, bloom positions and BPE counts all
  * assume the same token stream).
  */
object Tok {
  val PatternStr = "[^\\p{L}\\p{N}]+"
  val Pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(PatternStr)
}
