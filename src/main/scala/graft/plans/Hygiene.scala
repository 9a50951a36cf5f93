package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Plan-hygiene helpers: tiny wrappers that keep specific Catalyst
  * optimizer rules from pessimizing hot paths. Each is a semantic no-op;
  * every use is plan-pinned by a kernel-evaluation-count test.
  */
object Hygiene {

  /** `explode(a)` for an ATTRIBUTE whose defining expression is expensive
    * (tokenizer, shingle hasher).
    *
    * A bare `explode(attribute)` triggers `InferFiltersFromGenerate`,
    * which adds `size(a) > 0 AND isnotnull(a)` above the projection that
    * defines `a`; predicate pushdown then substitutes the full defining
    * expression into that filter below the projection — the scan stage
    * ends up evaluating the expensive kernel THREE times per row (twice in
    * the pushed filter, once in the projection), and as an interpreted
    * Filter when the expression is a higher-order function. Spark's own
    * rule refuses to infer for non-attribute inputs precisely to avoid
    * duplicating expensive expressions (SPARK-36715); wrapping the
    * attribute in `when(size(a) > 0, a)` — a no-op, since `explode` emits
    * nothing for null exactly as for empty — opts the attribute case out
    * too. The `size()` guard runs on the already-materialized array, which
    * is cheap.
    */
  def explodeNonEmpty(a: Column): Column =
    F.explode(F.when(F.size(a) > 0, a))

  /** 8 hex chars of `md5(c)` starting at 1-based `offset`, as an unsigned
    * 32-bit value carried in a long — THE engine-replayable randomness
    * primitive behind every md5 flavor (DSIR/NB feature buckets, Gumbel
    * noise, SimHash sketch halves): any SQL engine reproduces it as
    * `('0x' || substr(md5(x), offset, 8))::BIGINT`. One definition so a
    * flavor and its oracle cannot desynchronize on the derivation.
    * `offset` is 1 (default) or 9 — the two independent halves of one
    * digest.
    */
  def md5Prefix32(c: Column, offset: Int = 1): Column = {
    require(offset == 1 || offset == 9,
      s"md5Prefix32: offset must be 1 or 9, got $offset")
    F.conv(F.substring(F.md5(c), offset, 8), 16, 10).cast("long")
  }

  /** Driver-side twin of [[md5Prefix32]] (offset 1): the first 4 digest
    * bytes packed big-endian as an unsigned 32-bit value in a long —
    * byte-identical to the column form and to the oracle's
    * `('0x' || substr(md5(x), 1, 8))::BIGINT`. Used wherever a filter /
    * permutation constant is derived on the driver and probed on the
    * engine (bloom position sets, minhash perm constants).
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Prefix32Jvm(key: String): Long = {
    // thread-local digest: this helper sits in per-token kernel loops
    // (md5 gram hashes, simhash md5), where a getInstance per call is
    // measurable
    val md = md5Local.get()
    md.reset()
    val d = md.digest(key.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** [[md5Prefix32Jvm]] over `prefix ++ suffix` WITHOUT building the
    * concatenated string: UTF-8 concatenation is byte concatenation, so
    * streaming both arrays through the digest equals
    * `md5Prefix32Jvm(prefixStr + suffixStr)` exactly. For kernels that
    * hash one token under several small derivation suffixes per row
    * (the CMS depth loop): encode the token once, reuse per suffix.
    */
  def md5Prefix32Jvm(prefix: Array[Byte], suffix: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(prefix)
    md.update(suffix)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Materialize an expensive expression as an attribute that FILTERS can
    * reference without re-evaluating it — the filter-side sibling of
    * [[explodeNonEmpty]].
    *
    * A plain `Project(e as a) + Filter(p(a))` does not work: predicate
    * pushdown substitutes the alias through the projection
    * (`PushPredicateThroughNonJoin`), so the scan stage evaluates `e` once
    * per reference in the predicate PLUS once in the projection. A
    * `Generate` is a pushdown barrier for predicates referencing its
    * output, so `explode(array(e))` — exactly one output row per input
    * row, `e` evaluated once — pins the filter ABOVE the single
    * evaluation. The array(...) wrapper also keeps
    * `InferFiltersFromGenerate` away (non-attribute input, SPARK-36715).
    * Null semantics: `e = null` → `array(null)` still emits one row with
    * a null attribute (unlike `explode(null)`, which would DROP the row).
    */
  def attributeBarrier(e: Column): Column = F.explode(F.array(e))

  /** `size(a)` as a NON-NULLABLE column, for a size that is carried
    * through the explode and later compared in a join condition.
    *
    * A nullable `size(a)` attribute in a null-intolerant join condition
    * makes `InferFiltersFromConstraints` add `isnotnull(sz)` above the
    * join input; pushdown then substitutes the defining chain below the
    * projection — `isnotnull(size(kernel(text)))` in the scan stage, a
    * second full kernel evaluation per row. `coalesce(size(a), 0)` is
    * non-nullable, so no filter is ever inferred; it is a semantic no-op
    * on rows that survive [[explodeNonEmpty]] (their array is non-empty,
    * so `size` is never null there).
    */
  def sizeNonNull(a: Column): Column = F.coalesce(F.size(a), F.lit(0))
}
