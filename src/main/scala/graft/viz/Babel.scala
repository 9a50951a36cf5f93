package graft.viz

import graft.core.{DataInterpretation, DataRole, KFrame, KevinException}

/** "Babel" — the code generator the reference declared as a stub
  * (`/root/reference/src/Language/Babel.hs:9-12` returns an empty
  * constructor). Our working emitter targets Vega-Lite (the published
  * JSON dialect of Wilkinson's grammar, which the Kevin surface mirrors).
  *
  * `genBabel` collects the (display-sized, typically aggregated) frame on
  * the driver — the same contract as the reference's `Show`-based sinks.
  * Scale types come from the frame's traits: Dimension/Discrete fields
  * emit `nominal` (or `ordinal` with an explicit category order), Measure/
  * Continuous fields emit `quantitative` — the trait-driven scale
  * selection the reference's `Scales.hs:8` gestured at.
  */
final case class Babel(json: String)

object Babel {

  /** The builder entry point — reference `with df (do ...)` idiom
    * (`Builder.hs:11-14`).
    */
  def `with`(frame: KFrame, fragments: Kevin*): Babel =
    genBabel(frame, Kevin.assemble(fragments: _*))

  def genBabel(frame: KFrame, spec: Kevin): Babel = {
    val mark = spec.mark.getOrElse(throw new KevinException("no mark declared"))
    val coord = spec.coord.getOrElse(throw new KevinException("no coordinate declared"))

    val markJson = mark.kind match {
      case "interval" => "\"bar\""
      case "point" if mark.adjustments.contains(Adjustment.Jitter) =>
        """{"type": "point", "xOffset": {"band": 0.5}}"""
      case k => "\"" + k + "\""
    }

    def fieldType(s: Scale): String = s match {
      case CategoryScale(_, Some(_)) => "ordinal"
      case CategoryScale(_, None) => "nominal"
      case LinearScale(f) =>
        val t = frame.traits(f)
        if (t.role == DataRole.Measure ||
          t.interpretation == DataInterpretation.Continuous) "quantitative"
        else "ordinal"
    }

    def enc(s: Scale, extra: Seq[(String, String)] = Nil): String = {
      val sort = s match {
        case CategoryScale(_, Some(order)) =>
          Seq("sort" -> order.map(q).mkString("[", ", ", "]"))
        case _ => Nil
      }
      (Seq("field" -> q(s.field), "type" -> q(fieldType(s))) ++ sort ++ extra)
        .map { case (k, v) => q(k) + ": " + v }.mkString("{", ", ", "}")
    }

    val stacked = mark.adjustments.contains(Adjustment.Stack)
    val dodged = mark.adjustments.contains(Adjustment.Dodge)

    val channels: Seq[(String, String)] = coord match {
      case Cartesian(h, v) =>
        h.map(s => "x" -> enc(s)).toSeq ++
          v.map(s => "y" -> enc(s,
            if (stacked) Seq("stack" -> "\"zero\"") else Nil)).toSeq
      case Polar(a, d) =>
        a.map(s => "theta" -> enc(s)).toSeq ++
          d.map(s => "color" -> enc(s)).toSeq
    }

    val visualChannels: Seq[(String, String)] = spec.visuals.map {
      case SizeV(s) => "size" -> enc(s)
      case ShapeV(s, scheme) =>
        "shape" -> enc(s, scheme.map(sc => "scale" -> ("{\"scheme\": " + q(sc) + "}")).toSeq)
      case ColorV(s, scheme) =>
        "color" -> enc(s, scheme.map(sc => "scale" -> ("{\"scheme\": " + q(sc) + "}")).toSeq)
      case LabelV(s) => "text" -> enc(s)
    }

    val dodgeChannel: Seq[(String, String)] =
      if (dodged)
        spec.visuals.collectFirst { case ColorV(s, _) =>
          "xOffset" -> enc(s)
        }.toSeq
      else Nil

    val allChannels = channels ++ visualChannels ++ dodgeChannel
    // duplicate keys in a JSON object are last-one-wins in most parsers:
    // a polar distance scale plus a ColorV visual would silently discard
    // one of the two "color" encodings — error like Kevin.merge does for
    // duplicate marks/coords
    val dupes = allChannels.groupBy(_._1).filter(_._2.size > 1).keys
    if (dupes.nonEmpty)
      throw new KevinException(
        s"duplicate encoding channel(s): ${dupes.mkString(", ")}")
    val encoding = allChannels
      .map { case (k, v) => q(k) + ": " + v }.mkString("{", ", ", "}")

    val fields = (coord match {
      case Cartesian(h, v) => Seq(h, v).flatten
      case Polar(a, d) => Seq(a, d).flatten
    }).map(_.field) ++ spec.visuals.map(_.scale.field)

    val rows = frame.toOrderedDF
      .select(fields.distinct.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    val names = fields.distinct
    val values = rows.map { r =>
      names.indices.map { i =>
        q(names(i)) + ": " + (r.get(i) match {
          case null => "null"
          // bare NaN/Infinity tokens are not legal JSON — emit null, the
          // standard JSON stand-in for a missing measure
          case n: java.lang.Number
              if n.doubleValue.isNaN || n.doubleValue.isInfinite => "null"
          case n: java.lang.Number => n.toString
          case other => q(other.toString)
        })
      }.mkString("{", ", ", "}")
    }.mkString("[", ", ", "]")

    Babel(
      s"""{"$$schema": "https://vega.github.io/schema/vega-lite/v5.json", """ +
        s""""data": {"values": $values}, """ +
        (if (coord.isInstanceOf[Polar]) s""""mark": {"type": "arc"}, """
         else s""""mark": $markJson, """) +
        s""""encoding": $encoding}""")
  }

  // full RFC 8259 string escape: backslash, quote, and EVERY control
  // char — a newline inside a category value would otherwise emit an
  // unparseable spec
  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
