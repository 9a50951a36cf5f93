package graft.extras

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.core.{KFrame, KevinException}

/** Keyed relational joins — the capability upgrade the reference planned but
  * never built (`/root/reference/TODO:2` "dataframe combination combinators
  * such as join"; `Spec.lhs:113-115` flags the positional `join`'s duplicate
  * column hazard). Kept in `extras` so the reference-parity surface stays
  * auditable: `KFrame.zipColumns` is the parity op, these are the real joins.
  *
  * Scale notes:
  *  - joins are expressed as plain Catalyst joins so the planner picks
  *    broadcast-hash vs shuffled-hash vs sort-merge (AQE re-plans at runtime
  *    from observed sizes, incl. skew-join splitting);
  *  - [[broadcastJoin]] pins the small side with an explicit hint for
  *    star-schema dimensions where we know better than the size estimate;
  *  - join output row order is unspecified (as in SQL); the result frame
  *    gets fresh order-carrying row ids via the pure-projection
  *    `monotonically_increasing_id` path — no shuffle, no count.
  */
object Relational {

  /** Inner equi-join on shared key names. */
  def join(left: KFrame, right: KFrame, keys: Seq[String]): KFrame =
    keyedJoin(left, right, keys, "inner", broadcastRight = false)

  def leftJoin(left: KFrame, right: KFrame, keys: Seq[String]): KFrame =
    keyedJoin(left, right, keys, "left", broadcastRight = false)

  def semiJoin(left: KFrame, right: KFrame, keys: Seq[String]): KFrame =
    keyedJoin(left, right, keys, "left_semi", broadcastRight = false)

  def antiJoin(left: KFrame, right: KFrame, keys: Seq[String]): KFrame =
    keyedJoin(left, right, keys, "left_anti", broadcastRight = false)

  /** Equi-join with the right side explicitly broadcast — the fact-to-dim
    * join shape (lineitem ⋈ nation/region/…): no shuffle of the fact side at
    * all, the dimension ships to every executor once.
    */
  def broadcastJoin(left: KFrame, right: KFrame, keys: Seq[String]): KFrame =
    keyedJoin(left, right, keys, "inner", broadcastRight = true)

  /** Skew-resistant equi-join via key salting: the left (skewed/fact) side
    * gets a random salt in [0, saltFactor); the right side is replicated
    * once per salt value. The hot key's rows then spread across
    * `saltFactor` shuffle partitions instead of hammering one reducer.
    *
    * WHEN TO REACH FOR THIS (measured, graft.tools.SkewProbe: 4M rows,
    * 90% on one key, 8 threads, idle — SkewJoinSpec pins the plan
    * structure): AQE's skew-join split (on by default) is the first
    * tool and usually the fastest — plain join 1.4-1.5s with skew
    * handling off vs 0.6-0.9s with it on; salting alone lands between
    * (1.0-1.3s) and under AQE adds overhead for no gain (the salted
    * exchange is no longer skewed, so the split never fires —
    * SkewJoinSpec asserts exactly that). Salt explicitly when AQE
    * CANNOT re-plan: stream-stream/stream-static joins, a sink that
    * requires a fixed output partitioning, single-key skew so extreme
    * that even split sub-partitions overwhelm a reducer's SORT, or
    * non-adaptive engines replaying this plan. SIZE THE FACTOR to
    * several buckets per reducer (≥ 8× is safe): the hot key's salt
    * buckets land on reducers by hash, and with only 1-2 buckets per
    * reducer that assignment can itself be 2× unbalanced — SkewJoinSpec
    * demonstrates both the failure (16 buckets / 8 reducers re-flagged
    * as skew) and the fix (64 buckets). The salt is
    * `pmod(xxhash64(keys…, row id), saltFactor)` — deterministic per
    * row, uniform across rows.
    */
  def saltedJoin(left: KFrame, right: KFrame, keys: Seq[String],
      saltFactor: Int = 8): KFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    validateJoin(left, right, keys) // same errors as every keyed join here
    val salt = "__salt"
    // Salt = pmod(hash(keys..., row id), f): the id goes INSIDE the hash —
    // adding it outside could overflow a Long, which ANSI mode (Spark 4
    // default) turns into a job-killing ARITHMETIC_OVERFLOW. toDF (not
    // toOrderedDF): join output order is unspecified, and sorting the
    // skewed fact side would defeat the operator's purpose.
    val l = left.toDF.withColumn(salt,
      F.pmod(
        F.xxhash64(keys.map(F.col) :+ F.monotonically_increasing_id(): _*),
        F.lit(saltFactor)).cast("int"))
    val r = right.toDF.withColumn(salt,
      F.explode(F.array((0 until saltFactor).map(F.lit): _*)))
    KFrame.wrap(l.join(r, keys :+ salt, "inner").drop(salt))
  }

  /** Shared join validation: key existence on both sides (the library's
    * KevinException, not a raw Spark resolution error) + non-key column
    * overlap — ONE definition for keyed/broadcast/semi/anti/salted joins.
    */
  private def validateJoin(left: KFrame, right: KFrame,
      keys: Seq[String]): Unit = {
    keys.foreach { k =>
      if (!left.toDF.columns.contains(k))
        throw new KevinException(s"no such field in left frame: $k")
      if (!right.toDF.columns.contains(k))
        throw new KevinException(s"no such field in right frame: $k")
    }
    val overlap = (left.dataColumns.toSet intersect right.dataColumns.toSet) -- keys.toSet
    if (overlap.nonEmpty)
      throw new KevinException(
        s"ambiguous non-key columns on both sides: ${overlap.toSeq.sorted.mkString(", ")}")
  }

  /** Per-key top-k by score: for every distinct `keys` combination keep
    * the `k` rows with the highest `scoreCol`, ties broken by `tieCol`
    * ascending (pass the row's unique id for a deterministic result).
    *
    * Plan shape: `row_number` over (keys, score desc, tie asc) — Spark's
    * rank-limit pushdown turns the `<= k` filter into a WindowGroupLimit
    * that keeps only k candidates per key in each map partition BEFORE
    * the shuffle (plan-pinned), so the exchange carries O(k · keys) rows,
    * not the corpus. Per-key work after the shuffle is bounded by k·(map
    * partitions), never by the key's full row count.
    */
  def topKPerKey(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
      scoreCol: String, tieCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(F.col): _*)
      .orderBy(F.col(scoreCol).desc, F.col(tieCol).asc)
    df.withColumn("__rank", F.row_number().over(w))
      .filter(F.col("__rank") <= k)
      .drop("__rank")
  }

  private def keyedJoin(left: KFrame, right: KFrame, keys: Seq[String],
      how: String, broadcastRight: Boolean): KFrame = {
    validateJoin(left, right, keys)
    val rdf0 = right.toDF
    val rdf = if (broadcastRight) F.broadcast(rdf0) else rdf0
    KFrame.wrap(left.toDF.join(rdf, keys, how))
  }
}
