package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.extras.Relational

/** Engine-level tests beyond the Spec.lhs catalog: CSV trait inference
  * (`/root/reference/src/Data/DataFrame.hs:211-238`), the flat renderer +
  * group footer (`DataFrame.hs:94-127`), and the `extras` keyed joins
  * (capability upgrade over `/root/reference/TODO:2`).
  */
class EngineSpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark

  def df: KFrame = KFrame.fromCsvFile(spark, "src/test/resources/retail.csv")

  // ---- CSV ingest & trait inference -----------------------------------

  test("all-string column -> (Text, Dimension, Discrete) (DataFrame.hs:224-225)") {
    df.traits("city") shouldBe FieldTraits.text
  }
  test("all-number column -> (Number, Measure, Continuous) (DataFrame.hs:229-230)") {
    df.traits("sale") shouldBe FieldTraits.measure
    df.traits("discount") shouldBe FieldTraits.measure
  }
  test("'year' heuristic -> (Number, Dimension, Discrete) (DataFrame.hs:226-228)") {
    df.traits("year") shouldBe FieldTraits.discreteNumber
  }
  test("strict mode errors on missing values (DataFrame.hs:237-238)") {
    intercept[KevinException] {
      KFrame.fromCsvFile(spark, "src/test/resources/missing.csv")
    }.getMessage should include("Invalid data")
  }
  test("lenient mode loads missing values as nulls (DataFrame.hs:231-236)") {
    val m = KFrame.fromCsvFile(spark, "src/test/resources/missing.csv", strict = false)
    m.height shouldBe 3
    m.traits("score").dataType shouldBe KDataType.KNumber
    m.traits("note").dataType shouldBe KDataType.KText
    val scores = m.toOrderedDF.select("score").collect().map(r =>
      if (r.isNullAt(0)) null else r.get(0))
    scores.toSeq shouldBe Seq(10.0, null, 30.0)
  }
  test("typed filter drops null rows (Combinator.hs:132,164,182)") {
    val m = KFrame.fromCsvFile(spark, "src/test/resources/missing.csv", strict = false)
    m.filterNumber("score", _ > 0).height shouldBe 2
  }

  // ---- flat render + group footer -------------------------------------

  test("flat render: header, index column, right alignment") {
    val out = df.take(2).render()
    val lines = out.split("\n").toSeq
    lines.head should include("gender")
    lines.head should include("discount")
    lines(1).trim should startWith("1")
    lines(1) should include("austin")
  }
  test("filtered frame renders ORIGINAL row indices with gaps (index-list semantics)") {
    val out = df.filterNumber("cost", _ > 500).render()
    val idx = out.split("\n").drop(1).filter(_.trim.nonEmpty)
      .takeWhile(l => l.trim.head.isDigit)
      .map(_.trim.split("\\s+").head)
    // costs > 500 are rows 2, 5, 7, 8, 11 of the original frame
    idx.toSeq shouldBe Seq("2", "5", "7", "8", "11")
  }

  test("render of column-empty frame -> (EMPTY DATAFRAME) (DataFrame.hs:107)") {
    df.select("hehehe").render() shouldBe "(EMPTY DATAFRAME)\n"
  }
  test("group footer lists groups key-ascending with frame-order indices (Combinator.hs:66-72)") {
    val out = df.groupby("product").render()
    val lines = out.split("\n").toSeq
    lines should contain("""["product"]""")
    // book < pen; indices within each group in frame order
    val fi = lines.indexOf("""["product"]""")
    lines(fi + 1) shouldBe "[1,2,5,6,9,11,12]"
    lines(fi + 2) shouldBe "[3,4,7,8,10]"
  }
  test("group footer with a null key lists the null group first (nulls-first)") {
    val m = KFrame.fromCsvFile(spark, "src/test/resources/missing.csv", strict = false)
    val out = m.groupby("note").render()
    val lines = out.split("\n").toSeq
    val fi = lines.indexOf("""["note"]""")
    fi should be >= 0
    lines(fi + 1) shouldBe "[3]" // carol, null note — first
    lines(fi + 2) shouldBe "[2]" // fine
    lines(fi + 3) shouldBe "[1]" // good
  }

  test("discrete numbers render with 0 decimals (DataFrame.hs:112-118)") {
    val out = df.take(1).render()
    out should include(" 2011 ")
    (out should not).include("2011.0")
  }
  test("crosstab render with a 2-level column tree nests headers") {
    val c = df.cast(Seq("gender"), Seq("year", "product"), Agg.sum, "sale")
    c.pivot.get.colFields shouldBe Seq("year", "product")
    val out = c.render()
    val lines = out.split("\n").toSeq
    // level-1 header: years; level-2 header: products under each year
    lines.exists(l => l.contains("year") && l.contains("2011")) shouldBe true
    lines.exists(l => l.contains("product") && l.contains("book")) shouldBe true
    // F x 2011 x book = 1200 + 2600 = 3800
    out should include("3800")
  }

  /** DOCUMENTED DEVIATIONS in lenient mode: the reference crashes on an
    * Empty compare in sort (`DataFrame.hs:87`) and errors on Empty in an
    * aggregate group (`Combinator.hs:140,174,192`); strict CSV mode keeps
    * nulls out at ingest (parity), but lenient-mode frames carry SQL
    * nulls with Spark semantics — nulls sort first, aggregates skip them.
    */
  test("lenient-mode null semantics: nulls sort first, aggregates skip them") {
    val m = KFrame.fromCsvFile(spark, "src/test/resources/missing.csv", strict = false)
    val sorted = m.sort("score").toOrderedDF.select("name").collect().map(_.getString(0))
    sorted.head shouldBe "bob" // null score first (Spark nullsFirst asc)
    val agg = m.aggregate(Agg.sum, "score").toOrderedDF.head().getDouble(0)
    agg shouldBe 40.0 // 10 + 30, null skipped
  }

  test("crosstab render contains row/col titles and cells") {
    val out = df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale").render()
    out should include("gender")
    out should include("year")
    out should include("2011")
    out should include("6400")
  }
  test("crosstab with empty row tree renders one content row (cast with no row fields)") {
    val c = df.cast(Seq.empty, Seq("year"), Agg.sum, "sale")
    c.pivot shouldBe Some(PivotSpec(Seq(), Seq("year"), "sale"))
    val out = c.render()
    out should include("year")
    out should include("14000") // 2011 total
    out should include("10900") // 2012 total
    out should include("11100") // 2013 total
    c.height shouldBe 1
    c.width shouldBe 3
  }
  test("crosstab with empty column tree renders one value column (toPivot)") {
    val agg = df.groupby("gender").aggregate(Agg.sum, "sale").toPivot("sale")
    agg.pivot shouldBe Some(PivotSpec(Seq("gender"), Seq(), "sale"))
    val out = agg.render()
    out should include("gender")
    out should include("9300")  // F total
    out should include("26700") // M total
    agg.height shouldBe 2
    agg.width shouldBe 1
  }
  test("absent crosstab cells and null flat cells render as 'empty' (DataFrame.hs:92)") {
    // F x 2013 has no rows -> Empty -> "empty"
    df.cast(Seq("gender"), Seq("year"), Agg.sum, "sale")
      .render() should include("empty")
    val m = KFrame.fromCsvFile(spark, "src/test/resources/missing.csv", strict = false)
    val line = m.render().split("\n").find(_.contains("bob")).get
    line should include("empty")
  }

  // ---- keyed relational joins (extras) --------------------------------

  def dim: KFrame = {
    import spark.implicits._
    KFrame.fromDataFrame(
      Seq(("austin", "TX"), ("boston", "MA"), ("denver", "CO"))
        .toDF("city", "state"))
  }

  test("broadcast equi-join widens the fact side") {
    val j = Relational.broadcastJoin(df, dim, Seq("city"))
    j.height shouldBe 12
    j.dataColumns should contain("state")
    j.filterText("state", _ == "TX").height shouldBe 4
  }
  test("left join keeps unmatched rows") {
    val smallDim = dim.filterText("state", _ == "TX")
    Relational.leftJoin(df, smallDim, Seq("city")).height shouldBe 12
    Relational.join(df, smallDim, Seq("city")).height shouldBe 4
  }
  test("semi/anti joins") {
    val smallDim = dim.filterText("state", _ == "TX")
    Relational.semiJoin(df, smallDim, Seq("city")).height shouldBe 4
    Relational.antiJoin(df, smallDim, Seq("city")).height shouldBe 8
  }
  test("join on missing key -> error") {
    intercept[KevinException](Relational.join(df, dim, Seq("hehehe")))
      .getMessage should include("no such field")
  }
  test("join with ambiguous non-key columns -> error") {
    intercept[KevinException](Relational.join(df, df, Seq("city")))
      .getMessage should include("ambiguous")
  }

  // ---- CSV quote/escape parity (CsvParser.hs:12-45) -------------------

  test("quoted fields keep embedded commas and doubled-quote escapes") {
    val q = KFrame.fromCsvFile(spark, "src/test/resources/quoted.csv")
    q.height shouldBe 3
    val mottos = q.toOrderedDF.select("motto").collect().map(_.getString(0)).toSeq
    mottos shouldBe Seq("hello, world", """she said "hi" to me""", "plain")
    q.traits("score").dataType shouldBe KDataType.KNumber
  }

  test("dotted CSV headers load (no nested-field misparse)") {
    // regression: F.col("sepal.length") parsed the dot as struct access
    // on a flat schema and load crashed with UNRESOLVED_COLUMN
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val f = java.nio.file.Paths.get(dir, "iris.csv")
    java.nio.file.Files.writeString(f,
      "sepal.length,species\n5.1,setosa\n4.9,setosa\n")
    val kf = KFrame.fromCsvFile(spark, f.toString)
    kf.height shouldBe 2
    kf.traits("sepal.length").dataType shouldBe KDataType.KNumber
    kf.toOrderedDF.select("`sepal.length`").collect()
      .map(_.getDouble(0)).toSeq shouldBe Seq(5.1, 4.9)
  }

  test("multiLine option parses quoted embedded newlines (RFC 4180)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csvml").toString
    val f = java.nio.file.Paths.get(dir, "ml.csv")
    java.nio.file.Files.writeString(f,
      "id,note\n1,\"line1\nline2\"\n2,plain\n")
    // default line-splittable mode garbles the quoted newline; the
    // documented multiLine switch parses it whole
    val kf = CsvSource.load(spark, f.toString, strict = true,
      multiLine = true)
    kf.height shouldBe 2
    kf.toOrderedDF.select("note").collect().map(_.getString(0)).toSeq shouldBe
      Seq("line1\nline2", "plain")
  }

  test("saltedJoin validates keys like every other keyed join") {
    import graft.extras.Relational
    intercept[KevinException](
      Relational.saltedJoin(df.select("city"), df.select("city"),
        Seq("no_such_key")))
      .getMessage should include("no such field in left frame")
  }

  // ---- set ops (extras; absent in reference, SURVEY §2.7) -------------

  test("set ops: union/intersect/except/distinct") {
    import graft.extras.SetOps
    val a = df.take(8)
    val b = df.drop(4) // rows 5..12; overlap = rows 5..8
    SetOps.union(a, b).height shouldBe 12
    SetOps.intersect(a, b).height shouldBe 4
    SetOps.except(a, b).height shouldBe 4
    SetOps.distinct(df.append(df)).height shouldBe 12
  }
  test("set ops require matching signatures") {
    import graft.extras.SetOps
    intercept[KevinException](SetOps.union(df.select("city"), df.select("cost")))
      .getMessage should include("different fields")
  }

  // ---- as-of join (extras) --------------------------------------------

  test("asof join attaches the most recent at-or-before match per key") {
    import spark.implicits._
    import graft.extras.AsOf
    val trades = Seq(
      ("A", 1L, "t1"), ("A", 5L, "t2"), ("A", 10L, "t3"),
      ("B", 3L, "t4"))
      .toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      ("A", 0L, 100.0), ("A", 5L, 105.0), ("A", 7L, 107.0),
      ("B", 9L, 50.0))
      .toDF("sym", "ts", "px")
    val out = AsOf.asofJoin(trades, quotes, "sym", "ts", Seq("px"))
      .collect().map(r => r.getAs[String]("trade_id") ->
        Option(r.getAs[Any]("px"))).toMap
    out("t1") shouldBe Some(100.0) // quote at 0 <= 1
    out("t2") shouldBe Some(105.0) // tie at ts=5 resolves to the quote
    out("t3") shouldBe Some(107.0) // latest of 0/5/7
    out("t4") shouldBe None        // B's only quote is later
  }
  test("forward asof join attaches the next at-or-after match per key") {
    import spark.implicits._
    import graft.extras.AsOf
    val trades = Seq(
      ("A", 1L, "t1"), ("A", 5L, "t2"), ("A", 10L, "t3"),
      ("B", 3L, "t4"))
      .toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      ("A", 0L, 100.0), ("A", 5L, 105.0), ("A", 7L, 107.0),
      ("B", 9L, 50.0))
      .toDF("sym", "ts", "px")
    val out = AsOf.asofJoinForward(trades, quotes, "sym", "ts", Seq("px"))
      .collect().map(r => r.getAs[String]("trade_id") ->
        Option(r.getAs[Any]("px"))).toMap
    out("t1") shouldBe Some(105.0) // next quote at-or-after 1 is ts=5
    out("t2") shouldBe Some(105.0) // tie at ts=5 matches (inclusive)
    out("t3") shouldBe None        // no quote after 10
    out("t4") shouldBe Some(50.0)  // B's quote at 9 >= 3
  }

  test("asof join: duplicate (key, time) right rows attach deterministically") {
    import spark.implicits._
    import graft.extras.AsOf
    // two quotes share (A, 5): the attached value must be the SAME on
    // every run and under every partitioning (the orderBy carries a
    // value-hash tiebreak), not whichever struct the shuffle emitted last
    val trades = Seq(("A", 5L, "t1")).toDF("sym", "ts", "trade_id")
    def run(parts: Int): Any = {
      val quotes = Seq(("A", 5L, 105.0), ("A", 5L, 205.0))
        .toDF("sym", "ts", "px").repartition(parts)
      AsOf.asofJoin(trades, quotes, "sym", "ts", Seq("px"))
        .head().getAs[Any]("px")
    }
    val first = run(1)
    (2 to 6).foreach(p => run(p) shouldBe first)
  }

  test("asof join rejects value-column collisions") {
    import spark.implicits._
    import graft.extras.AsOf
    val l = Seq(("A", 1L, 9.0)).toDF("sym", "ts", "px")
    val r = Seq(("A", 0L, 1.0)).toDF("sym", "ts", "px")
    an[IllegalArgumentException] should be thrownBy
      AsOf.asofJoin(l, r, "sym", "ts", Seq("px"))
  }

  // ---- CJK rendering (DataFrame.hs:101-104) ---------------------------

  test("CJK columns render with double-width-aware alignment") {
    val cjk = KFrame.fromCsvFile(spark, "src/test/resources/cjk.csv")
    cjk.height shouldBe 3
    cjk.traits("名前").dataType shouldBe KDataType.KText
    cjk.traits("売上").dataType shouldBe KDataType.KNumber
    val out = cjk.render()
    val lines = out.split("\n").filter(_.nonEmpty).toSeq
    // every table line must have identical DISPLAY width (isLatin1 -> 1,
    // else 2) — plain string length would misalign CJK cells.
    def displayWidth(s: String): Int = s.map(c => if (c.toInt < 256) 1 else 2).sum
    lines.map(displayWidth).distinct.size shouldBe 1
    out should include("東京")
  }

  // ---- date detection (capability upgrade over DataFrame.hs:207-210) --

  test("detectDates=false (parity default): ISO dates stay Text") {
    val d = CsvSource.load(spark, "src/test/resources/dates.csv", strict = true)
    d.traits("day").dataType shouldBe KDataType.KText
  }
  test("detectDates=true: ISO timestamps become DateTime columns") {
    val d = CsvSource.load(spark, "src/test/resources/timestamps.csv",
      strict = true, detectDates = true)
    d.traits("seen").dataType shouldBe KDataType.KDateTime
    d.toOrderedDF.schema("seen").dataType.typeName shouldBe "timestamp"
    d.height shouldBe 2
  }
  test("detectDates=true: bare time-of-day becomes a KTime column") {
    val d = CsvSource.load(spark, "src/test/resources/times.csv",
      strict = true, detectDates = true)
    d.traits("start").dataType shouldBe KDataType.KTime
    d.traits("shift").dataType shouldBe KDataType.KText
    // carried as tz-free epoch-day-anchored TIMESTAMP_NTZ (Spark's TIME
    // type is feature-flagged off; a library must not flip session flags)
    d.toOrderedDF.schema("start").dataType.typeName shouldBe "timestamp_ntz"
    d.filter(org.apache.spark.sql.functions.col("start") >
      org.apache.spark.sql.functions.expr("timestamp_ntz'1970-01-01 12:00:00'"))
      .height shouldBe 2
    // renders as bare hh:mm:ss
    val out = d.render()
    out should include("06:30:00")
    (out should not).include("1970-01-01")
  }
  test("detectDates=true: ISO dates become Date/Dimension columns") {
    val d = CsvSource.load(spark, "src/test/resources/dates.csv",
      strict = true, detectDates = true)
    d.traits("day").dataType shouldBe KDataType.KDate
    d.traits("day").role shouldBe DataRole.Dimension
    d.filter(org.apache.spark.sql.functions.col("day") >
      org.apache.spark.sql.functions.lit("2024-02-01").cast("date"))
      .height shouldBe 2
  }
}
