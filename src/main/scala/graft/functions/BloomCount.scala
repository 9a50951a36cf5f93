package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native membership counter against a serialized Bloom filter: how many
  * of an `array<long>` of 64-bit keys MIGHT be in the filter — the kernel
  * of scan-side decontamination (`Contamination.contaminationHitsBloom`),
  * where the benchmark corpus' shingle set rides into the corpus scan as
  * one bounded literal instead of the corpus riding into a shuffle.
  *
  * The filter argument must be a LITERAL (foldable) binary in
  * [[BloomKernel]]'s layout (`k` + bit length header, then the bit array):
  * it parses once on the driver and ships as a codegen reference (the
  * [[PqCodes]] contract). Per key, `k` probe positions come from
  * Kirsch-Mitzenmacher double hashing (h1 + i·h2 over the finalized
  * 64-bit key), so membership tests are k bit-reads with no per-row
  * allocation. No false negatives by construction — a count of 0 PROVES
  * the doc shares no shingle with the filter's build set; positives carry
  * the filter's fpp. Registered for SQL as `bloom_count(hashes, filter)`.
  */
case class BloomCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okKeys = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okFilter = right.foldable && right.dataType == BinaryType
    if (okKeys && okFilter) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_count expects (array<bigint> keys, LITERAL binary filter), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_count"

  @transient private lazy val bloom: BloomKernel.Bloom =
    BloomKernel.deserialize(right.eval().asInstanceOf[Array[Byte]])

  override protected def nullSafeEval(keys: Any, f: Any): Any =
    BloomKernel.countMight(keys.asInstanceOf[ArrayData], bloom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomKernel.Bloom].getName)
    defineCodeGen(ctx, ev, (ks, _) =>
      s"graft.functions.BloomKernel.countMight($ks, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomCount =
    copy(left = newLeft, right = newRight)
}

object BloomKernel {

  /** Parsed filter: `k` probe functions over a word-aligned bit array. */
  final case class Bloom(k: Int, nBits: Long, words: Array[Long])
      extends Serializable

  /** Size a filter for `expectedItems` keys at false-positive rate `fpp`:
    * the standard m = −n·ln p / ln²2 bits, k = m/n·ln 2 probes.
    */
  def build(keys: Iterator[Long], expectedItems: Long, fpp: Double): Bloom = {
    require(expectedItems > 0, "bloom: expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"bloom: fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    val nBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong)
    val k = math.max(1, math.round(nBits.toDouble / expectedItems * ln2).toInt)
    val words = new Array[Long](((nBits + 63) / 64).toInt)
    val b = Bloom(k, words.length * 64L, words)
    keys.foreach(add(b, _))
    b
  }

  /** An empty filter sized for `expectedItems` at `fpp` — deterministic
    * (k, nBits) from the inputs, so independently-built empties over the
    * same sizing are [[or]]-mergeable: the distributed build path
    * (one empty per partition, fold keys in, OR-merge log-depth).
    */
  def emptySized(expectedItems: Long, fpp: Double): Bloom =
    build(Iterator.empty, expectedItems, fpp)

  /** Merge two filters built under the SAME sizing by OR-ing bitmaps —
    * the union filter: a key added to either side tests positive in the
    * merge, and fpp stays bounded by the shared sizing as long as the
    * TOTAL insert count stays within `expectedItems`.
    */
  def or(a: Bloom, b: Bloom): Bloom = {
    require(a.k == b.k && a.nBits == b.nBits,
      s"bloom or-merge: incompatible sizings (k=${a.k}/${b.k}, " +
        s"nBits=${a.nBits}/${b.nBits})")
    val words = new Array[Long](a.words.length)
    var i = 0
    while (i < words.length) { words(i) = a.words(i) | b.words(i); i += 1 }
    Bloom(a.k, a.nBits, words)
  }

  private def mix(h: Long): Long = {
    var x = h
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL
    x ^= (x >>> 33); x *= 0xC4CEB9FE1A85EC53L
    x ^= (x >>> 33); x
  }

  def add(b: Bloom, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < b.k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, b.nBits)
      b.words((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
  }

  def mightContain(b: Bloom, key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < b.k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, b.nBits)
      if ((b.words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def countMight(keys: ArrayData, b: Bloom): Long = {
    var hits = 0L
    var i = 0
    val n = keys.numElements()
    while (i < n) {
      if (mightContain(b, keys.getLong(i))) hits += 1
      i += 1
    }
    hits
  }

  /** Layout: int k, long nBits, then the words. */
  def serialize(b: Bloom): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + 8 + b.words.length * 8)
    buf.putInt(b.k); buf.putLong(b.nBits)
    b.words.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Bloom = {
    require(bytes != null && bytes.length >= 12,
      "bloom_count: filter literal is null or truncated")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val k = buf.getInt(); val nBits = buf.getLong()
    require(k >= 1 && nBits >= 64 && nBits % 64 == 0 &&
        bytes.length == 12 + (nBits / 64) * 8,
      "bloom_count: malformed filter literal")
    val words = new Array[Long]((nBits / 64).toInt)
    var i = 0
    while (i < words.length) { words(i) = buf.getLong(); i += 1 }
    Bloom(k, nBits, words)
  }
}

/** md5-POSITION flavor of [[BloomCount]] for the verification faces:
  * `md5_bloom_hits(text, n, words, kHashes)` counts how many DISTINCT
  * word n-grams of `text` have all `kHashes` md5-derived bit positions
  * (`int(md5(gram ∥ "_" ∥ j)[0:8]) mod mBits`, the
  * `Contamination.md5Position` derivation) set in the literal `words`
  * bit array — the whole scan side of
  * `Contamination.contaminationHitsBloomMd5` in ONE kernel call per row:
  * no explode, no per-doc count aggregate, no interpreted
  * tokenizer/array_join lambdas, zero shuffle (the same plan shape as
  * the production `bloom_count` flavor; only the position derivation
  * differs, for engine replayability). `n`, `words` and `kHashes` must
  * be literals; mBits = 64·|words|. Byte-equivalence with the exploded
  * string formulation is pinned in PipelineSpec.
  */
case class Md5BloomHits(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = {
    val okWords = third.foldable && (third.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (first.dataType == StringType &&
        second.dataType == IntegerType && second.foldable &&
        okWords &&
        fourth.dataType == IntegerType && fourth.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "md5_bloom_hits expects (string, LITERAL int n, LITERAL " +
        "array<bigint> words, LITERAL int kHashes), got " +
        Seq(first, second, third, fourth)
          .map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bloom_hits"

  @transient private lazy val params: (Int, Array[Long], Int) = (
    second.eval().asInstanceOf[Int],
    third.eval().asInstanceOf[ArrayData].toLongArray(),
    fourth.eval().asInstanceOf[Int])

  override protected def nullSafeEval(text: Any, n: Any, words: Any,
      k: Any): Any =
    Md5BloomKernel.hits(
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      params._1, params._2, params._3)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("md5BloomWords", params._2, "long[]")
    val (n, k) = (params._1, params._3)
    defineCodeGen(ctx, ev, (t, _, _, _) =>
      s"graft.functions.Md5BloomKernel.hits($t, $n, $wordsRef, $k)")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Md5BloomHits =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Row kernel of [[Md5BloomHits]]. Tokenization parity is with the
  * COLUMN formulation (`F.lower` = `UTF8String.toLowerCase`, the shared
  * split regex, grams space-joined, DISTINCT per doc — the
  * `Contamination.shingleStrings` semantics).
  */
object Md5BloomKernel {

  private val TokenPattern =
    Tok.Pattern

  def hits(text: org.apache.spark.unsafe.types.UTF8String, n: Int,
      words: Array[Long], kHashes: Int): Long = {
    if (text == null) return 0L
    // an empty filter literal means an empty reference set: zero hits —
    // without this, mBits = 0 reaches floorMod and every row throws
    if (words.length == 0) return 0L
    val mBits = words.length.toLong * 64L
    val toks = TokenPattern.split(text.toLowerCase.toString, -1)
      .filter(_.nonEmpty)
    if (toks.length < n) return 0L
    val seen = new java.util.HashSet[String]()
    var hits = 0L
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val gram = sb.toString
      if (seen.add(gram)) {
        var all = true
        var h = 0
        while (all && h < kHashes) {
          val p = java.lang.Math.floorMod(
            graft.plans.Hygiene.md5Prefix32Jvm(gram + "_" + h), mBits)
          if (((words((p >> 6).toInt) >>> (p & 63L).toInt) & 1L) != 1L)
            all = false
          h += 1
        }
        if (all) hits += 1L
      }
      i += 1
    }
    hits
  }
}
