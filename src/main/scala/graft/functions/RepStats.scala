package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused counter kernel for the MassiveText REPETITION battery (Rae et
  * al. 2021 appendix A1.1, "repetitious text" rules) — the within-document
  * sibling of [[GopherStats]]: ONE pass over the text computes all 13
  * repetition signals, inside whole-stage codegen, no shuffle (the
  * explode + per-(doc, ngram) groupBy formulation shuffles the corpus on
  * doc-keyed n-gram rows nine times over; repetition is a PER-DOCUMENT
  * property, so it belongs scan-side).
  *
  * Returns `array<double>` of 13 fractions (0.0 for degenerate inputs):
  *
  *  0. dup_line_frac        — Σ occurrences of line classes seen >1× / #lines
  *  1. dup_line_char_frac   — same, char-weighted (class char length)
  *  2. dup_para_frac        — over "\n\n"-split paragraphs
  *  3. dup_para_char_frac
  *  4-6.  top_{2,3,4}gram_char_frac — count(top)·charLen(top) / totalChars,
  *        where top = the most frequent n-gram over the shared lowercase-
  *        alnum token stream (count ties break toward the larger
  *        count·charLen — deterministic and SQL-replayable), charLen =
  *        token code points + (n−1) joiner spaces, totalChars =
  *        code points of the space-joined token stream
  *  7-12. dup_{5..10}gram_char_frac — Σ over n-gram classes seen >1× of
  *        count·charLen / totalChars (occurrences counted in full,
  *        overlaps NOT deduplicated — the standard approximation; since
  *        overlap double-counting can exceed the document, n-gram
  *        fractions clamp at 1.0)
  *
  * Line/paragraph splits keep trailing empties (Spark `split` semantics);
  * classes are 64-bit content hashes (collision odds ~items²/2⁶⁵ per doc —
  * negligible, same contract as the dedup family). Registered for SQL as
  * `rep_stats(text)`.
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rep_stats expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(text: Any): Any =
    RepStatsKernel.stats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.RepStatsKernel.stats($t)")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStatsKernel {

  def stats(text: UTF8String): ArrayData =
    new GenericArrayData(statsArray(if (text == null) null else text.toString))

  private def h64(s: String, from: Int, until: Int): Long = {
    // FNV-1a (poly-31 admits short-segment collisions, which would
    // merge distinct line/paragraph classes and inflate dup fractions
    // against the string-replaying oracle)
    var h = -3750763034362895579L
    var i = from
    while (i < until) { h ^= s.charAt(i); h *= 1099511628211L; i += 1 }
    h
  }

  /** (dupFrac, dupCharFrac) over segment classes: class = content hash,
    * weight = class code-point length. Both fractions count ALL
    * occurrences of classes with count > 1.
    */
  private def dupFracs(hashes: Array[Long], lens: Array[Long]): (Double, Double) = {
    val n = hashes.length
    if (n == 0) return (0.0, 0.0)
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var i = 0
    while (i < n) {
      val e = counts.get(hashes(i))
      if (e == null) counts.put(hashes(i), Array(1L, lens(i)))
      else e(0) += 1
      i += 1
    }
    var dupN = 0L; var dupChars = 0L; var totChars = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      totChars += e(0) * e(1)
      if (e(0) > 1) { dupN += e(0); dupChars += e(0) * e(1) }
    }
    (dupN.toDouble / n,
      if (totChars == 0) 0.0 else dupChars.toDouble / totChars)
  }

  /** Split on a delimiter keeping trailing empties (Spark `split`
    * semantics), returning (hash, codePointLen) per segment.
    */
  private def segments(s: String, delim: String): (Array[Long], Array[Long]) = {
    val hs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ls = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var idx = s.indexOf(delim, start)
    while (idx >= 0) {
      hs += h64(s, start, idx)
      ls += s.codePointCount(start, idx).toLong
      start = idx + delim.length
      idx = s.indexOf(delim, start)
    }
    hs += h64(s, start, s.length)
    ls += s.codePointCount(start, s.length).toLong
    (hs.toArray, ls.toArray)
  }

  def statsArray(s: String): Array[Double] = {
    val out = new Array[Double](13)
    if (s == null) return out
    // lines / paragraphs
    val (lh, ll) = segments(s, "\n")
    val (o0, o1) = dupFracs(lh, ll)
    val (ph, pl) = segments(s, "\n\n")
    val (o2, o3) = dupFracs(ph, pl)
    out(0) = o0; out(1) = o1; out(2) = o2; out(3) = o3
    // token stream (shared lowercase-alnum tokenizer)
    val toks = Tok.Pattern
      .split(s.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
    val nt = toks.length
    if (nt == 0) return out
    val th = new Array[Long](nt)
    val tl = new Array[Long](nt)
    var totChars = (nt - 1).toLong // joiner spaces
    var k = 0
    while (k < nt) {
      th(k) = h64(toks(k), 0, toks(k).length)
      tl(k) = toks(k).codePointCount(0, toks(k).length).toLong
      totChars += tl(k)
      k += 1
    }
    // per n: one class map of (count, charLen); top for 2..4, dup for 5..10
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var n = 2
    while (n <= 10) {
      if (nt >= n) {
        counts.clear()
        var i = 0
        while (i <= nt - n) {
          var h = th(i)
          var charLen = tl(i) + (n - 1).toLong // joiner spaces
          var j = 1
          while (j < n) {
            h = h * 0x9E3779B97F4A7C15L + th(i + j)
            charLen += tl(i + j)
            j += 1
          }
          val e = counts.get(h)
          if (e == null) counts.put(h, Array(1L, charLen))
          else e(0) += 1
          i += 1
        }
        if (n <= 4) {
          // most frequent class; count ties -> larger count*charLen
          var bestC = 0L; var bestMass = 0L
          val it = counts.values().iterator()
          while (it.hasNext) {
            val e = it.next()
            val mass = e(0) * e(1)
            if (e(0) > bestC || (e(0) == bestC && mass > bestMass)) {
              bestC = e(0); bestMass = mass
            }
          }
          out(2 + n) = math.min(1.0, bestMass.toDouble / totChars)
        } else {
          var dupChars = 0L
          val it = counts.values().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e(0) > 1) dupChars += e(0) * e(1)
          }
          out(2 + n) = math.min(1.0, dupChars.toDouble / totChars)
        }
      }
      n += 1
    }
    out
  }
}
