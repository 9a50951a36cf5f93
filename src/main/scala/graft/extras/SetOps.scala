package graft.extras

import graft.core.{KFrame, KevinException}

/** Set operations over frames — absent in the reference (SURVEY.md §2.7:
  * only `append` = UNION ALL exists; `/root/reference/TODO` never lists
  * them) and free in Spark, exposed in `extras` to keep the parity surface
  * auditable. All require the same column/traits signature as `append`
  * (`Combinator.hs:323-326` check, reused here).
  *
  * Row ORDER of the results is unspecified (as in SQL): the underlying
  * distinct/intersect/except aggregates shuffle, and the returned frame's
  * fresh ids reflect post-shuffle partition order. Sort the result to fix
  * an order.
  */
object SetOps {

  private def requireSameSig(a: KFrame, b: KFrame): Unit = {
    val sa = a.dataColumns.map(c => c -> a.traits(c)).sortBy(_._1)
    val sb = b.dataColumns.map(c => c -> b.traits(c)).sortBy(_._1)
    if (sa != sb)
      throw new KevinException("Can't combine dataframes with different fields")
  }

  // toDF, not toOrderedDF: result order is unspecified (class doc) and
  // the set aggregates re-shuffle anyway, so the range-partitioned sort
  // toOrderedDF pays on each input would be pure wasted work at scale.

  /** UNION (distinct rows of both sides). */
  def union(a: KFrame, b: KFrame): KFrame = {
    requireSameSig(a, b)
    KFrame.wrap(a.toDF.unionByName(
      b.toDF.select(a.dataColumns.map(org.apache.spark.sql.functions.col): _*))
      .distinct())
  }

  /** INTERSECT (distinct rows present on both sides). */
  def intersect(a: KFrame, b: KFrame): KFrame = {
    requireSameSig(a, b)
    KFrame.wrap(a.toDF.intersect(
      b.toDF.select(a.dataColumns.map(org.apache.spark.sql.functions.col): _*)))
  }

  /** EXCEPT (distinct left rows not present on the right). */
  def except(a: KFrame, b: KFrame): KFrame = {
    requireSameSig(a, b)
    KFrame.wrap(a.toDF.except(
      b.toDF.select(a.dataColumns.map(org.apache.spark.sql.functions.col): _*)))
  }

  /** DISTINCT rows of one frame (order unspecified, see class doc). */
  def distinct(a: KFrame): KFrame = KFrame.wrap(a.toDF.distinct())
}
