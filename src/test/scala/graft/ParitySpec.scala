package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._

/** Port of the reference's behavior catalog
  * (`/root/reference/test/Spec.lhs:20-107`) to executable ScalaTest — the
  * reference ships these ~70 input→outcome cases as literate comments; they
  * are its de-facto golden semantics (SURVEY.md §5).
  *
  * Fixture: `src/test/resources/retail.csv`, our own 12×7 retail-shaped
  * table (same column kinds as the reference's canonical fixture; fresh
  * values so nothing is copied).
  */
class ParitySpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark

  def df: KFrame = KFrame.fromCsvFile(spark, "src/test/resources/retail.csv")
  def rowEmpty: KFrame = df.take(0)
  def colEmpty: KFrame = df.select("hehehe")
  def allEmpty: KFrame = df.take(0).select("hehehe")

  /** All user-visible cells of a column, in frame order. */
  def col(kf: KFrame, name: String): Seq[Any] =
    kf.toOrderedDF.select(name).collect().toSeq.map(_.get(0))

  def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  // ---- size / height / width (Spec.lhs:20-25) -------------------------

  test("height df -> 12") { df.height shouldBe 12 }
  test("width df -> 7") { df.width shouldBe 7 }
  test("size df -> (7, 12)") { df.size shouldBe ((7, 12)) }
  test("size rowEmptyDf -> (7, 0)") { rowEmpty.size shouldBe ((7, 0)) }
  test("size colEmptyDf -> (0, 12)") { colEmpty.size shouldBe ((0, 12)) }
  test("size allEmptyDf -> (0, 0)") { allEmpty.size shouldBe ((0, 0)) }

  // ---- take edge cases (Spec.lhs:27-30) -------------------------------

  test("take -1 -> row-empty") { df.take(-1).height shouldBe 0 }
  test("take 0 -> row-empty") { df.take(0).height shouldBe 0 }
  test("take 3 -> 3 rows") { df.take(3).height shouldBe 3 }
  test("take 100 -> all rows") { df.take(100).height shouldBe 12 }

  // ---- head/tail/init/last incl. crash-on-empty (Spec.lhs:32-50) ------

  test("head df -> first row") {
    col(df.head, "sale") shouldBe Seq(1200.0)
  }
  test("head rowEmptyDf -> error") {
    a[KevinException] should be thrownBy rowEmpty.head
  }
  test("head colEmptyDf -> column-empty frame, no error (lazy-eval parity)") {
    colEmpty.head.width shouldBe 0
  }
  test("head allEmptyDf -> column-empty frame, no error") {
    allEmpty.head.width shouldBe 0
  }

  test("tail df -> all but first") {
    df.tail.height shouldBe 11
    col(df.tail, "sale").head shouldBe 4500.0
  }
  test("tail rowEmptyDf -> error") {
    a[KevinException] should be thrownBy rowEmpty.tail
  }
  test("tail colEmptyDf -> no error") { colEmpty.tail.width shouldBe 0 }

  test("init df -> all but last") {
    df.init.height shouldBe 11
    col(df.init, "sale").last shouldBe 2600.0
  }
  test("init rowEmptyDf -> error") {
    a[KevinException] should be thrownBy rowEmpty.init
  }
  test("init colEmptyDf -> no error") { colEmpty.init.width shouldBe 0 }

  test("last df -> last row") {
    col(df.last, "sale") shouldBe Seq(5200.0)
  }
  test("last rowEmptyDf -> error") {
    a[KevinException] should be thrownBy rowEmpty.last
  }
  test("last colEmptyDf -> no error") { colEmpty.last.width shouldBe 0 }

  // ---- select (Spec.lhs:52-60) ----------------------------------------

  test("select one field") {
    df.select("city").toOrderedDF.columns.toSeq shouldBe Seq("city")
  }
  test("select reorders columns to argument order (Combinator.hs:38-55)") {
    df.select("cost", "city").toOrderedDF.columns.toSeq shouldBe Seq("cost", "city")
  }
  test("select unknown field -> column-empty") {
    df.select("hehehe").width shouldBe 0
  }
  test("select known+unknown -> drops unknown silently") {
    df.select("city", "hehehe").toOrderedDF.columns.toSeq shouldBe Seq("city")
  }
  test("select empty list -> column-empty") {
    df.select().width shouldBe 0
  }
  // `select 123` (ill-typed variadic arg, Spec.lhs:56-58) is unrepresentable
  // in the Scala String* surface — compile-time rejection supersedes the
  // reference's runtime error (documented deviation).

  // ---- groupby (Spec.lhs:62-70) ---------------------------------------

  test("groupby records state, rows unchanged") {
    val g = df.groupby("city")
    g.groups shouldBe Seq("city")
    g.height shouldBe 12
  }
  test("groupby two fields") {
    df.groupby("city", "product").groups shouldBe Seq("city", "product")
  }
  test("groupby unknown field -> dropped, no error (Spec.lhs:64-65)") {
    df.groupby("hehehe").groups shouldBe Seq.empty
    df.groupby("city", "hehehe").groups shouldBe Seq("city")
  }
  test("groupby empty -> no groups") {
    df.groupby().groups shouldBe Seq.empty
  }

  // ---- filter (Spec.lhs:72-77) ----------------------------------------

  test("filter text predicate") {
    df.filterText("city", _ == "austin").height shouldBe 4
  }
  test("filter text predicate on numeric column -> inconsistent type") {
    val e = intercept[KevinException](df.filterText("cost", _ == "x"))
    e.getMessage should include("inconsistent type")
  }
  test("filter numeric predicate") {
    df.filterNumber("cost", _ > 500).height shouldBe 5
  }
  test("filter numeric predicate on text column -> inconsistent type") {
    val e = intercept[KevinException](df.filterNumber("city", _ > 1))
    e.getMessage should include("inconsistent type")
  }
  test("filter unknown field -> no such field") {
    intercept[KevinException](df.filterText("hehehe", _ == "x"))
      .getMessage should include("no such field")
    intercept[KevinException](df.filterNumber("hehehe", _ > 1))
      .getMessage should include("no such field")
  }
  test("filter int predicate (year heuristic column)") {
    df.filterInt("year", _ == 2011).height shouldBe 6
  }
  test("filter int on non-integral values -> inconsistent type at eval") {
    val t = intercept[Throwable] {
      df.filterInt("discount", _ > 0).height
    }
    messageChain(t) should include("non-integral")
  }
  test("filter resets groups (Combinator.hs:195)") {
    df.groupby("city").filterNumber("cost", _ > 0).groups shouldBe Seq.empty
  }

  // ---- sort (Spec.lhs:79-81 + Combinator.hs:228-237) ------------------

  test("sort ascending is stable (ties keep frame order)") {
    col(df.sort("gender"), "sale") shouldBe
      Seq(1200.0, 900.0, 1500.0, 1700.0, 1400.0, 2600.0,
        4500.0, 2800.0, 6100.0, 5000.0, 3100.0, 5200.0)
  }
  test("sort descending reverses the entire ascending order (ties reversed)") {
    col(df.sort("gender", ascending = false), "sale") shouldBe
      Seq(5200.0, 3100.0, 5000.0, 6100.0, 2800.0, 4500.0,
        2600.0, 1400.0, 1700.0, 1500.0, 900.0, 1200.0)
  }
  test("sort by value column") {
    col(df.sort("cost"), "cost").take(3) shouldBe Seq(260.0, 300.0, 310.0)
  }
  test("sort unknown field -> frame unchanged (Combinator.hs:235-237)") {
    col(df.sort("hehehe"), "sale").head shouldBe 1200.0
  }
  test("sort keeps groups") {
    df.groupby("city").sort("cost").groups shouldBe Seq("city")
  }
  test("sort then take = lowest n") {
    col(df.sort("cost").take(2), "cost") shouldBe Seq(260.0, 300.0)
  }
  test("sort desc then take = highest n") {
    col(df.sort("cost", ascending = false).take(2), "cost") shouldBe Seq(850.0, 720.0)
  }

  // ---- aggregate (Spec.lhs:83-96) -------------------------------------

  val costs = Seq(300.0, 520.0, 310.0, 430.0, 520.0, 330.0, 640.0, 720.0, 340.0, 420.0, 850.0, 260.0)

  test("aggregate sum by group, key-ascending output (Combinator.hs:66-68)") {
    val out = df.groupby("city").aggregate(Agg.sum, "cost")
    out.toOrderedDF.columns.toSeq shouldBe Seq("city", "cost")
    col(out, "city") shouldBe Seq("austin", "boston", "denver")
    col(out, "cost") shouldBe Seq(1560.0, 2210.0, 1870.0)
  }
  test("aggregate with no groups -> whole frame is one group") {
    col(df.aggregate(Agg.sum, "cost"), "cost") shouldBe Seq(costs.sum)
  }
  test("aggregate mean") {
    col(df.aggregate(Agg.mean, "cost")) shouldBe Seq(costs.sum / costs.length)
  }
  def col(kf: KFrame): Seq[Any] = col(kf, kf.dataColumns.head)
  test("aggregate count is numeric-typed (Aggregator.hs:12-13)") {
    col(df.groupby("gender").aggregate(Agg.count, "cost"), "cost") shouldBe Seq(6.0, 6.0)
  }
  test("aggregate variance is population variance (Aggregator.hs:15-17)") {
    val m = costs.sum / costs.length
    val expect = costs.map(x => (x - m) * (x - m)).sum / costs.length
    val got = col(df.aggregate(Agg.variance, "cost")).head.asInstanceOf[Double]
    got shouldBe expect +- 1e-9
  }
  test("aggregate sd is population sd (Aggregator.hs:20-21)") {
    val m = costs.sum / costs.length
    val expect = math.sqrt(costs.map(x => (x - m) * (x - m)).sum / costs.length)
    val got = col(df.aggregate(Agg.sd, "cost")).head.asInstanceOf[Double]
    got shouldBe expect +- 1e-9
  }
  test("aggregate numeric aggregator on text column -> invalid type") {
    for (a <- Seq(Agg.sum, Agg.mean, Agg.count, Agg.variance, Agg.sd)) {
      intercept[KevinException](df.aggregate(a, "city"))
        .getMessage should include("invalid type")
    }
  }
  test("aggregate concat folds text in frame order (Aggregator.hs:23-24)") {
    col(df.aggregate(Agg.concat, "city")).head shouldBe
      "austin" * 4 + "boston" * 4 + "denver" * 4
  }
  test("aggregate concat on numeric column -> invalid type") {
    intercept[KevinException](df.aggregate(Agg.concat, "cost"))
      .getMessage should include("invalid type")
  }
  test("aggregate unknown field -> no such field") {
    intercept[KevinException](df.aggregate(Agg.sum, "hehehe"))
      .getMessage should include("no such field")
  }
  test("aggregate resets groups") {
    df.groupby("city").aggregate(Agg.sum, "cost").groups shouldBe Seq.empty
  }
  test("sort then aggregate concat folds in sorted frame order (Spec.lhs TODO 3/6)") {
    val out = df.sort("sale").groupby("gender").aggregate(Agg.concat, "city")
    col(out, "gender") shouldBe Seq("F", "M")
    col(out, "city") shouldBe Seq(
      "austin" + "austin" + "denver" + "boston" + "boston" + "denver",
      "austin" + "denver" + "austin" + "boston" + "denver" + "boston")
  }
  test("custom numeric aggregator closure (Combinator.hs:124 host-language fold)") {
    val range = Agg.CustomNumeric(xs => xs.max - xs.min)
    col(df.groupby("gender").aggregate(range, "cost"), "cost") shouldBe
      Seq(850.0 - 300.0, 720.0 - 260.0)
  }
  test("custom string aggregator closure") {
    val firstLast = Agg.CustomString(xs => xs.head + xs.last)
    col(df.groupby("gender").aggregate(firstLast, "city"), "city") shouldBe
      Seq("austindenver", "austindenver")
  }
  test("CustomFoldString: bounded-memory lexicographic min, no collect_list") {
    val lexMin = Agg.CustomFoldString[String]("",
      step = (b, x) => if (b.isEmpty || x < b) x else b,
      merge = (a, b) => if (a.isEmpty) b else if (b.isEmpty) a
        else if (a < b) a else b,
      output = identity)
    col(df.groupby("gender").aggregate(lexMin, "city"), "city") shouldBe
      Seq("austin", "austin")
    val plan = df.groupby("gender").aggregate(lexMin, "city")
      .toOrderedDF.queryExecution.executedPlan.toString
    (plan should not).include("collect_list")
  }

  test("CustomFoldNumeric: bounded-memory fold matches collect_list closure") {
    // mean as a commutative (sum, count) fold — the incremental
    // Aggregator/udaf path, one fixed-size buffer per group
    val foldMean = Agg.CustomFoldNumeric[(Double, Long)]((0.0, 0L),
      step = (b, x) => (b._1 + x, b._2 + 1),
      merge = (a, b) => (a._1 + b._1, a._2 + b._2),
      output = b => if (b._2 == 0) 0.0 else b._1 / b._2)
    val viaFold = col(df.groupby("gender").aggregate(foldMean, "cost"), "cost")
    val viaList = col(df.groupby("gender")
      .aggregate(Agg.CustomNumeric(xs => xs.sum / xs.length), "cost"), "cost")
    viaFold shouldBe viaList
    viaFold shouldBe col(df.groupby("gender").aggregate(Agg.mean, "cost"), "cost")
    // the scale contract: no per-group value list anywhere in the plan
    val plan = df.groupby("gender").aggregate(foldMean, "cost")
      .toOrderedDF.queryExecution.executedPlan.toString
    (plan should not).include("collect_list")
  }

  // ---- melt (Spec.lhs:98-106) -----------------------------------------

  test("melt basic: var-major order, fixed output columns (Combinator.hs:78-120)") {
    val m = df.melt(Seq("city"), Seq("sale", "cost"))
    m.toOrderedDF.columns.toSeq shouldBe Seq("city", "variable", "value")
    m.height shouldBe 24
    col(m, "variable").take(12).toSet shouldBe Set("sale")
    col(m, "variable").drop(12).toSet shouldBe Set("cost")
    col(m, "value").take(3) shouldBe Seq(1200.0, 4500.0, 900.0)
    col(m, "value").drop(12).take(3) shouldBe Seq(300.0, 520.0, 310.0)
  }
  test("melt single-name overloads") {
    df.melt("city", "cost").height shouldBe 12
  }
  test("melt with empty ids -> value columns only") {
    val m = df.melt(Seq.empty[String], Seq("cost"))
    m.toOrderedDF.columns.toSeq shouldBe Seq("variable", "value")
    m.height shouldBe 12
  }
  test("melt unknown vars -> row-empty frame (Spec.lhs:106)") {
    df.melt(Seq("hehehe"), Seq("hahaha")).height shouldBe 0
  }
  test("melt output traits: variable is Text/Dimension, value is Measure") {
    val m = df.melt(Seq("city"), Seq("cost"))
    m.traits("variable") shouldBe FieldTraits.text
    m.traits("value") shouldBe FieldTraits.measure
  }
  test("melt resets groups (Combinator.hs:91)") {
    df.groupby("city").melt(Seq("city"), Seq("cost")).groups shouldBe Seq.empty
  }
  test("melt non-numeric var column -> invalid data") {
    intercept[KevinException](df.melt(Seq("city"), Seq("product")))
      .getMessage should include("invalid data")
  }

  // ---- append / zipColumns (Combinator.hs:317-360) --------------------

  test("append stacks rows, fresh contiguous ids") {
    val a = df.append(df)
    a.height shouldBe 24
    col(a, "sale").take(12) shouldBe col(df, "sale")
    col(a, "sale").drop(12) shouldBe col(df, "sale")
  }
  test("append is column-order-insensitive but result is left order") {
    val a = df.select("city", "cost").append(df.select("cost", "city"))
    a.toOrderedDF.columns.toSeq shouldBe Seq("city", "cost")
    a.height shouldBe 24
  }
  test("append different fields -> error (Combinator.hs:323-326)") {
    intercept[KevinException](df.select("city").append(df.select("cost")))
      .getMessage should include("append")
  }
  test("append resets groups") {
    df.groupby("city").append(df).groups shouldBe Seq.empty
  }

  test("zipColumns pairs rows positionally") {
    val z = df.select("city").zipColumns(df.select("sale"))
    z.toOrderedDF.columns.toSeq shouldBe Seq("city", "sale")
    z.height shouldBe 12
    col(z, "sale") shouldBe col(df, "sale")
  }
  test("zipColumns respects current visible order of both sides") {
    val z = df.sort("cost").select("cost").zipColumns(df.select("city"))
    col(z, "cost").take(2) shouldBe Seq(260.0, 300.0)
    col(z, "city").take(2) shouldBe Seq("austin", "austin")
  }
  test("zipColumns different heights -> error") {
    val t = intercept[Throwable] {
      df.select("city").zipColumns(df.take(5).select("sale")).height
    }
    messageChain(t) should include("different heights")
  }

  // ---- cast / pivot surface (Combinator.hs:269-276) -------------------

  test("cast crosstab values (gender × year, sum of sale)") {
    val c = df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
    c.pivot shouldBe Some(PivotSpec(Seq("gender"), Seq("year"), "sale"))
    val wide = c.pivotedWide
    val cols = wide.columns
    val c2011 = cols.find(_.startsWith("2011")).get
    val c2012 = cols.find(_.startsWith("2012")).get
    val c2013 = cols.find(_.startsWith("2013")).get
    val rows = wide.orderBy("gender").collect()
    rows.map(_.getAs[String]("gender")).toSeq shouldBe Seq("F", "M")
    rows(0).getAs[Double](c2011) shouldBe 6400.0
    rows(0).getAs[Double](c2012) shouldBe 2900.0
    rows(0).isNullAt(rows(0).fieldIndex(c2013)) shouldBe true
    rows(1).getAs[Double](c2011) shouldBe 7600.0
    rows(1).getAs[Double](c2012) shouldBe 8000.0
    rows(1).getAs[Double](c2013) shouldBe 11100.0
  }
  test("pivotedWide multi column fields = single-field pivot on the concat key") {
    import org.apache.spark.sql.{functions => F}
    val wide = df.cast(Seq("gender"), Seq("year", "city"), Agg.sum, "sale")
      .pivotedWide
    // ground truth: pre-concat the tuple key and take the (unchanged)
    // single-field path — identical keys, so identical sorted headers
    // and identical cells
    val keyed = df
      .derive("yc", F.concat_ws(KFrame.WideHeaderSep,
        F.col("year").cast("string"), F.col("city")))
      .cast(Seq("gender"), Seq("yc"), Agg.sum, "sale").pivotedWide
    wide.columns.toSeq shouldBe keyed.columns.toSeq
    wide.orderBy("gender").collect().toSeq shouldBe
      keyed.orderBy("gender").collect().toSeq
    // headers split back into the 2-level column-tree path
    wide.columns.filter(_ != "gender").foreach { h =>
      val path = KFrame.splitWideHeader(h)
      path.length shouldBe 2
      path.head.toDouble should (be >= 2011.0 and be <= 2013.0)
    }
  }
  test("pivotedWide explicit keys: no distinct scan, frozen schema, given order") {
    val c = df.cast(Seq("gender"), Seq("year", "city"), Agg.sum, "sale")
    val auto = c.pivotedWide
    // two real paths (listed in reversed order) + one absent path
    val real = auto.columns.filter(_ != "gender").take(2)
      .map(KFrame.splitWideHeader(_))
    val wide = c.pivotedWide(
      Seq(real(1), real(0), Seq("1999.0", "atlantis")))
    wide.columns.toSeq shouldBe Seq("gender",
      real(1).mkString("|"), real(0).mkString("|"), "1999.0|atlantis")
    // listed-and-present columns carry the same cells as the auto variant
    val byG = wide.orderBy("gender").collect()
    val autoByG = auto.orderBy("gender").collect()
    real.map(_.mkString("|")).foreach { h =>
      byG.map(_.getAs[Any](h)).toSeq shouldBe
        autoByG.map(_.getAs[Any](h)).toSeq
    }
    // the absent path is an all-null column, not an error
    byG.foreach(r =>
      r.isNullAt(r.fieldIndex("1999.0|atlantis")) shouldBe true)
    // wrong-arity path -> error
    intercept[KevinException](c.pivotedWide(Seq(Seq("2011.0"))))
      .getMessage should include("must have 2 elements")
  }
  test("pivotedWide raises when a column-field value contains the separator") {
    import org.apache.spark.sql.{functions => F}
    // "bos|ton" under the default "|" sep would concat-merge with a
    // distinct ("2011.0|bos", "ton") tuple — the guard raises instead
    // of letting first() drop a cell silently
    val poisoned = df.derive("cityx",
      F.when(F.col("city") === "boston", F.lit("bos|ton"))
        .otherwise(F.col("city")))
    val c = poisoned.cast(Seq("gender"), Seq("year", "cityx"), Agg.sum,
      "sale")
    val e = intercept[Exception](c.pivotedWide.collect())
    e.getMessage should include("separator")
    // a sep outside the values' alphabet passes and keeps every tuple
    val wide = c.pivotedWide(sep = "\u0000")
    wide.columns.count(_.contains("bos|ton")) should be >= 1
    // explicit-keys overload: a colliding row whose merged key is NOT
    // among the requested keys is dropped exactly as before the guard
    // existed -- no abort (round-11 ADVICE scoped the raise)
    val okWide = c.pivotedWide(Seq(Seq("2011.0", "austin")))
    okWide.columns should contain("2011.0|austin")
    okWide.collect()
    // ...but a requested key that a colliding row MERGES onto would
    // steal/lose a cell -- that still raises
    val e2 = intercept[Exception](
      c.pivotedWide(Seq(Seq("2012.0|bos", "ton"))).collect())
    e2.getMessage should include("separator")
  }
  test("cast overlapping row/col fields -> error (Combinator.hs:271)") {
    intercept[KevinException](df.cast(Seq("city"), Seq("city"), Agg.sum, "sale"))
      .getMessage should include("overlapping")
  }
  test("cast value field colliding -> error (Combinator.hs:272)") {
    intercept[KevinException](df.cast(Seq("sale"), Seq("year"), Agg.sum, "sale"))
      .getMessage should include("collides")
  }
  test("pivot-aware height/width (Combinator.hs:278-291)") {
    val c = df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
    c.height shouldBe 2 // distinct gender
    c.width shouldBe 3  // distinct year
  }
  test("toPivot unknown value field -> error (DataFrame.hs:279)") {
    intercept[KevinException](df.toPivot("hehehe"))
      .getMessage should include("no such field")
  }
  test("stack/unstack move fields between trees (Combinator.hs:239-267)") {
    val c = df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
    val s = c.stack("year")
    s.pivot shouldBe Some(PivotSpec(Seq("gender", "year"), Seq(), "sale"))
    val u = s.unstack("gender")
    u.pivot shouldBe Some(PivotSpec(Seq("year"), Seq("gender"), "sale"))
  }
  test("stack on non-pivoted frame -> error (Combinator.hs:240)") {
    intercept[KevinException](df.stack("year"))
      .getMessage should include("not pivoted")
  }
  test("stack field not in column tree -> error (Combinator.hs:249)") {
    val c = df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
    intercept[KevinException](c.stack("gender"))
      .getMessage should include("column titles")
  }
  test("unstack field not in row tree -> error (Combinator.hs:255,264)") {
    val c = df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
    intercept[KevinException](c.unstack("year"))
      .getMessage should include("row titles")
  }
  test("fromPivot clears presentation state (DataFrame.hs:273-274)") {
    df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale").fromPivot.pivot shouldBe None
  }
  test("pivoting un-aggregated data errors at render (DataFrame.hs:143-145)") {
    val p = df.select("gender", "sale").toPivot("sale")
    intercept[KevinException](p.render())
      .getMessage should include("many values")
  }
  test("crosstab backing over the display budget errors, never truncates") {
    // retail has 13 rows; maxRows=1 gives a 10-row budget -> explicit error
    // instead of a wrong-looking table with phantom "empty" cells
    val p = df.select("city", "product", "sale").toPivot("sale")
    intercept[KevinException](p.render(maxRows = 1))
      .getMessage should include("display budget")
  }

  // ---- state-effect matrix (SURVEY.md §2.9) ---------------------------

  test("select keeps groups, clears pivot") {
    val g = df.groupby("city").select("city", "cost")
    g.groups shouldBe Seq("city")
    df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
      .select("gender").pivot shouldBe None
  }
  test("take/drop keep groups") {
    df.groupby("city").take(3).groups shouldBe Seq("city")
    df.groupby("city").drop(3).groups shouldBe Seq("city")
  }

  /** DOCUMENTED DIVERGENCE (SURVEY §2.9 quirk): the reference's stored
    * group indices survive row-slicing, so `groupby → take → aggregate`
    * aggregates over rows that are no longer visible
    * (`Combinator.hs:215-222` uses the stored `gs` as-is). We implement
    * the sane semantics the survey recommends: groups are recomputed over
    * the VISIBLE rows when aggregate fires.
    */
  test("groupby -> take -> aggregate uses visible rows only (sane-mode divergence)") {
    val out = df.groupby("gender").take(3).aggregate(Agg.count, "cost")
    // first 3 rows: F, M, F
    col(out, "gender") shouldBe Seq("F", "M")
    col(out, "cost") shouldBe Seq(2.0, 1.0)
  }

  /** The strict-parity flag (SURVEY §2.9's recommendation): with
    * `strictGroups = true`, `aggregate` replays the reference's stored
    * group indices (`Combinator.hs:215-222`) — rows hidden between
    * groupby and aggregate still contribute to their group.
    */
  test("strictGroups: groupby -> take -> aggregate folds HIDDEN rows like the reference") {
    val strict = df.groupby("gender").take(3)
      .aggregate(Agg.count, "cost", strictGroups = true)
    // stored groups span all 12 rows: 6 F, 6 M — the take(3) is ignored
    col(strict, "gender") shouldBe Seq("F", "M")
    col(strict, "cost") shouldBe Seq(6.0, 6.0)
    // the same sequence under drop (the other keep-groups slicer)
    val viaDrop = df.groupby("gender").drop(9)
      .aggregate(Agg.sum, "cost", strictGroups = true)
    col(viaDrop, "cost") shouldBe
      col(df.groupby("gender").aggregate(Agg.sum, "cost"), "cost")
    // filter RESETS groups (Combinator.hs:197, state matrix) — so after a
    // filter there are no stored groups and strict mode has nothing to
    // replay: the whole visible frame folds as one group, like sane mode
    val viaFilter = df.groupby("gender").filterNumber("cost", _ > 400)
      .aggregate(Agg.count, "cost", strictGroups = true)
    col(viaFilter, "cost") shouldBe Seq(7.0)
    // strictGroups without an intervening hide is identical to sane mode
    col(df.groupby("gender").aggregate(Agg.sum, "cost", strictGroups = true),
      "cost") shouldBe
      col(df.groupby("gender").aggregate(Agg.sum, "cost"), "cost")
    // no stored groups -> strict falls back to the visible-frame fold
    col(df.take(3).aggregate(Agg.count, "cost", strictGroups = true),
      "cost") shouldBe Seq(3.0)
  }

  test("strictGroups: renamed group key falls back to sane per-key groups") {
    // the snapshot stores pre-rename columns, so it cannot express the
    // renamed key; strict must fall back to the sane visible-rows path,
    // still partitioned per (renamed) key — NOT collapse to one global
    // group because liveGroups-on-snapshot dropped the unknown name
    val g = df.groupby("gender").rename("gender", "g").drop(3)
    val strict = g.aggregate(Agg.count, "cost", strictGroups = true)
    val sane = g.aggregate(Agg.count, "cost")
    col(strict, "g") shouldBe col(sane, "g")
    col(strict, "cost") shouldBe col(sane, "cost")
    strict.height should be > 1L // per-key groups survived
  }

  // ---- transform / sortByGroups (reference TODO 7/8, Spec.lhs:118-119) --

  test("transform: null group keys aggregate as a real group on BOTH paths") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    // regression: the order-sensitive path joined the aggregates back
    // with a plain equi-join, which never matches null keys — null-key
    // rows got a null aggregate while the window path gave them the real
    // group value
    val kf = KFrame.wrap(Seq(
      (Some("a"), 1.0, "x"), (Some("a"), 2.0, "y"),
      (None, 3.0, "p"), (None, 4.0, "q"))
      .toDF("k", "v", "s")).groupby("k")
    val win = kf.transform(Agg.sum, "v", as = "t") // order-insensitive path
    val join = kf.transform(Agg.concat, "s", as = "c") // order-sensitive path
    val winRows = win.toDF.where(F.col("k").isNull).select("t").collect()
    winRows.map(_.getDouble(0)).toSeq shouldBe Seq(7.0, 7.0)
    val joinRows = join.toDF.where(F.col("k").isNull).select("c").collect()
    joinRows.foreach(_.isNullAt(0) shouldBe false)
    joinRows.map(_.getString(0)).toSet shouldBe Set("pq")
  }

  test("custom closure aggregators skip null values like the built-ins") {
    import spark.implicits._
    // regression: collect_list kept structs with null v; the Seq[Double]
    // UDF then unboxed the null to 0.0 (CustomNumeric) or handed the
    // closure a null element (CustomString NPE bait)
    val kf = KFrame.wrap(Seq(
      ("g", Some(1.0), Some("a")), ("g", None, None), ("g", Some(3.0), Some("b")))
      .toDF("k", "v", "s")).groupby("k")
    val mean = kf.aggregate(
      Agg.CustomNumeric(xs => xs.sum / xs.length), "v")
    col(mean, "v") shouldBe Seq(2.0) // (1+3)/2, null skipped — not (1+0+3)/3
    val cat = kf.aggregate(Agg.CustomString(_.mkString("+")), "s")
    col(cat, "s") shouldBe Seq("a+b")
  }

  test("render budget survives a huge maxRows (no Int overflow)") {
    val c = df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
    // 300M * 10 overflowed Int to a negative take() limit before
    noException should be thrownBy c.render(maxRows = 300000000)
  }

  test("transform keeps all rows and appends per-group aggregate") {
    val out = df.groupby("gender").transform(Agg.sum, "cost", as = "grp_cost")
    out.height shouldBe 12
    out.groups shouldBe Seq("gender") // transform keeps groups
    val byGender = out.toOrderedDF.select("gender", "grp_cost").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    byGender("F") shouldBe (300.0 + 310.0 + 520.0 + 640.0 + 340.0 + 850.0)
    byGender("M") shouldBe (520.0 + 430.0 + 330.0 + 720.0 + 420.0 + 260.0)
  }
  test("transform with no groups uses the whole frame as one group") {
    val out = df.transform(Agg.mean, "cost", as = "mean_cost")
    out.height shouldBe 12
    out.toOrderedDF.select("mean_cost").distinct().count() shouldBe 1
  }
  test("transform with concat folds in frame order within groups") {
    val out = df.sort("sale").groupby("gender")
      .transform(Agg.concat, "city", as = "cities")
    val f = out.toOrderedDF.filter(col("gender") === "F")
      .select("cities").head().getString(0)
    f shouldBe "austinaustindenverbostonbostondenver"
  }
  // ---- derive / rename (capability upgrades) --------------------------

  test("derive appends a computed column, keeps groups and order") {
    import org.apache.spark.sql.functions.{col => c}
    val out = df.groupby("city").sort("sale")
      .derive("margin", c("sale") - c("cost"))
    out.groups shouldBe Seq("city")
    col(out, "margin").head shouldBe (900.0 - 310.0) // lowest sale row first
  }
  test("derive rejects existing names; rename preserves groups/order/traits") {
    intercept[KevinException](df.derive("sale", org.apache.spark.sql.functions.lit(1)))
      .getMessage should include("already exists")
    val r = df.groupby("city").sort("city").rename("city", "town")
    r.groups shouldBe Seq("town")
    r.traits("town") shouldBe FieldTraits.text
    col(r, "town").head shouldBe "austin"
    intercept[KevinException](df.rename("hehehe", "x"))
      .getMessage should include("no such field")
    intercept[KevinException](df.rename("city", "sale"))
      .getMessage should include("already exists")
  }

  test("rename remaps pivot spec fields (no stale column references)") {
    val r = df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
      .rename("gender", "sex")
    r.pivot shouldBe Some(PivotSpec(Seq("sex"), Seq("year"), "sale"))
    r.height shouldBe 2 // pivot-aware height works on the renamed column
    r.render() should include("sex")
  }

  test("chained sorts compose: last sort is primary, prior order breaks ties") {
    val out = df.sort("sale").sort("gender")
    col(out, "gender").take(6).toSet shouldBe Set("F")
    // within F, sale ascending from the prior sort
    col(out, "sale").take(6) shouldBe Seq(900.0, 1200.0, 1400.0, 1500.0, 1700.0, 2600.0)
  }

  test("transform rejects an output name that already exists") {
    intercept[KevinException](df.transform(Agg.sum, "cost", as = "gender"))
      .getMessage should include("already exists")
    intercept[KevinException](df.transform(Agg.sum, "cost", as = "__row_id"))
      .getMessage should include("already exists")
  }

  def col(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col(name)

  test("sortByGroups orders by group keys, stable within groups") {
    val out = df.groupby("product").sortByGroups
    out.groups shouldBe Seq("product")
    // books (rows 1,2,5,6,9,11,12 in frame order) then pens
    col(out, "sale").take(7) shouldBe
      Seq(1200.0, 4500.0, 1500.0, 6100.0, 1400.0, 2600.0, 5200.0)
  }
  test("sortByGroups without groups is a no-op") {
    col(df.sortByGroups, "sale") shouldBe col(df, "sale")
  }

  test("groupby -> select dropping the group column degrades to remaining keys") {
    val out = df.groupby("gender", "city").select("city", "cost")
      .aggregate(Agg.sum, "cost")
    // gender was dropped by select; aggregation proceeds on city alone
    col(out, "city") shouldBe Seq("austin", "boston", "denver")
    col(out, "cost") shouldBe Seq(1560.0, 2210.0, 1870.0)
  }
}
