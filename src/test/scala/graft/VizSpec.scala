package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.{Agg, KFrame, KevinException}
import graft.viz._

/** Viz DSL tests: the Kevin Monoid's duplicate-declaration error matrix
  * (`/root/reference/src/Language/Kevin.hs:19-27`), scale parity errors
  * (`Scales.hs:19`), and the Vega-Lite emitter (the reference's Babel was a
  * stub — `Babel.hs:11-12`; SURVEY.md §2.10 sets "one working emitter" as
  * the capability target).
  */
class VizSpec extends AnyFunSuite with Matchers {

  lazy val spark = TestSpark.spark

  def df: KFrame = KFrame.fromCsvFile(spark, "src/test/resources/retail.csv")

  val cartesian = Coords.cartesian(Scales.category("city"), Scales.linear("sale"))

  // ---- Monoid merge (Kevin.hs:19-27) ----------------------------------

  test("merge with empty is identity") {
    val k = Kevin.coord(cartesian)
    k.merge(Kevin.empty) shouldBe k
    Kevin.empty.merge(k) shouldBe k
  }
  test("coord + mark fragments assemble (both orders)") {
    val a = Kevin.assemble(Kevin.coord(cartesian), Kevin.mark(Marks.point))
    a.coord.isDefined shouldBe true
    a.mark shouldBe Some(Marks.point)
    val b = Kevin.assemble(Kevin.mark(Marks.point), Kevin.coord(cartesian))
    b.mark shouldBe Some(Marks.point)
  }
  test("duplicate coordinate -> error (Kevin.hs:22)") {
    intercept[KevinException] {
      Kevin.coord(cartesian).merge(Kevin.coord(cartesian))
    }.getMessage should include("coordinate already declared")
  }
  test("duplicate mark -> error (Kevin.hs:23)") {
    intercept[KevinException] {
      Kevin.mark(Marks.point).merge(Kevin.mark(Marks.line))
    }.getMessage should include("mark already declared")
  }
  test("full spec + any declaration -> conflicted (Kevin.hs:26)") {
    val full = Kevin.assemble(Kevin.coord(cartesian), Kevin.mark(Marks.point))
    intercept[KevinException](full.merge(Kevin.mark(Marks.line)))
      .getMessage should include("conflicted declaration")
    intercept[KevinException](Kevin.coord(cartesian).merge(full))
      .getMessage should include("conflicted declaration")
  }

  // ---- scales (Scales.hs:8-21) ----------------------------------------

  test("linear scale with orders -> error (Scales.hs:19)") {
    intercept[KevinException](Scales.linear("sale", Seq("a", "b")))
      .getMessage should include("orders are not for linear scales")
  }
  test("category scale carries explicit order") {
    Scales.category("city", Seq("boston", "austin")) shouldBe
      CategoryScale("city", Some(Seq("boston", "austin")))
  }

  // ---- emitter ---------------------------------------------------------

  test("genBabel emits Vega-Lite with trait-driven types") {
    val agg = df.groupby("city").aggregate(Agg.sum, "sale")
    val babel = Babel.`with`(agg,
      Kevin.coord(cartesian), Kevin.mark(Marks.interval))
    val json = babel.json
    json should include("\"mark\": \"bar\"")
    json should include("\"field\": \"city\", \"type\": \"nominal\"")
    json should include("\"field\": \"sale\", \"type\": \"quantitative\"")
    json should include("\"austin\"")
    json should include("vega-lite/v5.json")
  }
  test("explicit category order emits a sort array") {
    val agg = df.groupby("city").aggregate(Agg.sum, "sale")
    val spec = Kevin.assemble(
      Kevin.coord(Coords.cartesian(
        Scales.category("city", Seq("denver", "austin", "boston")),
        Scales.linear("sale"))),
      Kevin.mark(Marks.interval))
    Babel.genBabel(agg, spec).json should include(
      """"sort": ["denver", "austin", "boston"]""")
  }
  test("stack adjustment emits stacked y encoding") {
    val agg = df.groupby("city", "gender").aggregate(Agg.sum, "sale")
    val spec = Kevin.assemble(
      Kevin.coord(cartesian),
      Kevin.mark(Marks.interval.stack),
      Kevin.visual(Visuals.color(Scales.category("gender"))))
    val json = Babel.genBabel(agg, spec).json
    json should include("\"stack\": \"zero\"")
    json should include("\"color\"")
  }
  test("dodge adjustment emits xOffset from the color visual") {
    val agg = df.groupby("city", "gender").aggregate(Agg.sum, "sale")
    val spec = Kevin.assemble(
      Kevin.coord(cartesian),
      Kevin.mark(Marks.interval.dodge),
      Kevin.visual(Visuals.color(Scales.category("gender"))))
    Babel.genBabel(agg, spec).json should include("\"xOffset\"")
  }
  test("polar coord emits arc mark with theta") {
    val agg = df.groupby("gender").aggregate(Agg.sum, "sale")
    val spec = Kevin.assemble(
      Kevin.coord(Coords.polar(Scales.linear("sale"), Scales.category("gender"))),
      Kevin.mark(Marks.interval))
    val json = Babel.genBabel(agg, spec).json
    json should include("\"type\": \"arc\"")
    json should include("\"theta\"")
  }
  test("missing mark or coord -> error") {
    intercept[KevinException](Babel.genBabel(df, Kevin.coord(cartesian)))
      .getMessage should include("no mark declared")
    intercept[KevinException](Babel.genBabel(df, Kevin.mark(Marks.point)))
      .getMessage should include("no coordinate declared")
  }
  test("emitted data values are the frame rows") {
    val agg = df.groupby("city").aggregate(Agg.sum, "sale")
    val json = Babel.genBabel(agg,
      Kevin.assemble(Kevin.coord(cartesian), Kevin.mark(Marks.point))).json
    json should include("\"sale\": 9400.0") // austin: 1200+4500+900+2800
  }
  test("emitted JSON stays valid: NaN -> null, control chars escaped") {
    val spark = TestSpark.spark
    import spark.implicits._
    // NaN measures and a newline inside a category value — both were
    // emitted verbatim before, producing unparseable JSON
    val kf = graft.core.KFrame.wrap(
      Seq(("a\nb", Double.NaN), ("ok", 2.0)).toDF("city", "sale"))
    val json = Babel.genBabel(kf,
      Kevin.assemble(
        Kevin.coord(Coords.cartesian(Scales.category("city"),
          Scales.linear("sale"))),
        Kevin.mark(Marks.point))).json
    json should include("\"sale\": null")
    json should include("a\\nb")
    (json should not).include("NaN")
    // cheap structural check without a JSON lib: balanced braces/brackets
    json.count(_ == '{') shouldBe json.count(_ == '}')
    json.count(_ == '[') shouldBe json.count(_ == ']')
  }
  test("every emitter output shape validates against the vendored " +
    "Vega-Lite v5 subset schema (round-12 verdict #7)") {
    val schema = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/test/resources/vega-lite-v5-subset.schema.json")), "UTF-8")
    import spark.implicits._
    val agg = df.groupby("city").aggregate(Agg.sum, "sale")
    val agg2 = df.groupby("city", "gender").aggregate(Agg.sum, "sale")
    val gagg = df.groupby("gender").aggregate(Agg.sum, "sale")
    val nanKf = graft.core.KFrame.wrap(
      Seq(("a\nb", Double.NaN), ("ok", 2.0)).toDF("city", "sale"))
    // one emission per distinct output shape the emitter can produce
    val emissions = Seq(
      "bar" -> Babel.genBabel(agg, Kevin.assemble(
        Kevin.coord(cartesian), Kevin.mark(Marks.interval))),
      "point" -> Babel.genBabel(agg, Kevin.assemble(
        Kevin.coord(cartesian), Kevin.mark(Marks.point))),
      "line" -> Babel.genBabel(agg, Kevin.assemble(
        Kevin.coord(cartesian), Kevin.mark(Marks.line))),
      "area" -> Babel.genBabel(agg, Kevin.assemble(
        Kevin.coord(cartesian), Kevin.mark(Marks.area))),
      "jittered point (mark-def object)" -> Babel.genBabel(agg,
        Kevin.assemble(Kevin.coord(cartesian),
          Kevin.mark(Marks.point.jitter))),
      "explicit sort order" -> Babel.genBabel(agg, Kevin.assemble(
        Kevin.coord(Coords.cartesian(
          Scales.category("city", Seq("denver", "austin", "boston")),
          Scales.linear("sale"))),
        Kevin.mark(Marks.interval))),
      "stacked + color" -> Babel.genBabel(agg2, Kevin.assemble(
        Kevin.coord(cartesian), Kevin.mark(Marks.interval.stack),
        Kevin.visual(Visuals.color(Scales.category("gender"))))),
      "dodged (xOffset channel)" -> Babel.genBabel(agg2, Kevin.assemble(
        Kevin.coord(cartesian), Kevin.mark(Marks.interval.dodge),
        Kevin.visual(Visuals.color(Scales.category("gender"))))),
      "color scheme scale" -> Babel.genBabel(agg2, Kevin.assemble(
        Kevin.coord(cartesian), Kevin.mark(Marks.point),
        Kevin.visual(ColorV(Scales.category("gender"),
          Some(Visuals.colorScheme1))))),
      "size + shape + label visuals" -> Babel.genBabel(agg2,
        Kevin.assemble(Kevin.coord(cartesian), Kevin.mark(Marks.point),
          Kevin.visual(Visuals.size(Scales.linear("sale"))),
          Kevin.visual(Visuals.shape(Scales.category("gender"))),
          Kevin.visual(Visuals.label(Scales.category("city"))))),
      "polar arc" -> Babel.genBabel(gagg, Kevin.assemble(
        Kevin.coord(Coords.polar(Scales.linear("sale"),
          Scales.category("gender"))),
        Kevin.mark(Marks.interval))),
      "NaN/control-char data" -> Babel.genBabel(nanKf, Kevin.assemble(
        Kevin.coord(Coords.cartesian(Scales.category("city"),
          Scales.linear("sale"))),
        Kevin.mark(Marks.point))))
    emissions.foreach { case (label, babel) =>
      val errs = JsonSchema.validate(schema, babel.json)
      withClue(s"$label: ${babel.json}\nviolations: ") {
        errs shouldBe empty
      }
    }
    // the validator itself rejects: wrong channel type, unknown channel,
    // bare NaN (unparseable) — guards against a vacuous schema
    JsonSchema.validate(schema,
      """{"$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        | "data": {"values": []}, "mark": "bar",
        | "encoding": {"x": {"field": "a", "type": "banana"}}}"""
        .stripMargin) should not be empty
    JsonSchema.validate(schema,
      """{"$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        | "data": {"values": []}, "mark": "bar",
        | "encoding": {"zaxis": {"field": "a", "type": "nominal"}}}"""
        .stripMargin) should not be empty
    an[Exception] should be thrownBy JsonSchema.parse("""{"a": NaN}""")
  }

  test("duplicate encoding channels error instead of silently dropping one") {
    val agg = df.groupby("gender").aggregate(Agg.sum, "sale")
    val spec = Kevin.assemble(
      Kevin.coord(Coords.polar(Scales.linear("sale"), Scales.category("gender"))),
      Kevin.mark(Marks.interval),
      Kevin.visual(Visuals.color(Scales.category("gender"))))
    intercept[KevinException](Babel.genBabel(agg, spec))
      .getMessage should include("duplicate encoding channel")
  }
}
