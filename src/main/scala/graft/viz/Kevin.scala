package graft.viz

import graft.core.KevinException

/** The "Kevin" grammar-of-graphics spec language — Spark-side re-expression
  * of the reference's declared (but stubbed) visualization DSL:
  *
  *  - spec container with Monoid merge + duplicate-declaration errors
  *    (`/root/reference/src/Language/Kevin.hs:14-27`);
  *  - marks `point/line/area/interval` + position adjustments
  *    `dodge/stack/jitter` (`Marks.hs:5-14`);
  *  - scales `linear`/`category`, category optionally with an explicit
  *    order; linear-with-orders is an error (`Scales.hs:8-21`);
  *  - coords `cartesian/polar` with `horz/vert/angle/distance` channel
  *    binders (`Coords.hs:5-11`);
  *  - visuals `size/shape/color/label` + discrete/continuous schemes
  *    (`Visuals.hs:5-18`).
  *
  * Everything below the container was `undefined` in the reference; the
  * capability target (SURVEY.md §2.10) is "same declared surface, one
  * working emitter" — see [[Babel]] for the Vega-Lite code generator.
  */

// ---- marks ----------------------------------------------------------------

sealed trait Adjustment { def name: String }
object Adjustment {
  case object Dodge extends Adjustment { val name = "dodge" }
  case object Stack extends Adjustment { val name = "stack" }
  case object Jitter extends Adjustment { val name = "jitter" }
}

final case class Mark(kind: String, adjustments: Seq[Adjustment] = Nil) {
  def dodge: Mark = copy(adjustments = adjustments :+ Adjustment.Dodge)
  def stack: Mark = copy(adjustments = adjustments :+ Adjustment.Stack)
  def jitter: Mark = copy(adjustments = adjustments :+ Adjustment.Jitter)
}

object Marks {
  val point: Mark = Mark("point")
  val line: Mark = Mark("line")
  val area: Mark = Mark("area")
  val interval: Mark = Mark("interval") // bar, in Vega-Lite terms
}

// ---- scales ---------------------------------------------------------------

sealed trait Scale { def field: String }
/** Continuous scale (reference `CScale`). */
final case class LinearScale(field: String) extends Scale
/** Discrete scale (reference `DScale`), optionally with an explicit
  * category order.
  */
final case class CategoryScale(field: String, order: Option[Seq[String]] = None)
  extends Scale

object Scales {
  def linear(field: String): Scale = LinearScale(field)
  /** Reference parity (`Scales.hs:19`): orders make no sense for a
    * continuous scale.
    */
  def linear(field: String, orders: Seq[String]): Scale =
    throw new KevinException("orders are not for linear scales")
  def category(field: String): Scale = CategoryScale(field)
  def category(field: String, orders: Seq[String]): Scale =
    CategoryScale(field, Some(orders))
}

// ---- coords ---------------------------------------------------------------

sealed trait Coord
/** `horz`/`vert` channel bindings (`Coords.hs:7-8`). */
final case class Cartesian(horz: Option[Scale] = None, vert: Option[Scale] = None)
  extends Coord
/** `angle`/`distance` channel bindings (`Coords.hs:10-11`). */
final case class Polar(angle: Option[Scale] = None, distance: Option[Scale] = None)
  extends Coord

object Coords {
  def cartesian(horz: Scale, vert: Scale): Coord =
    Cartesian(Some(horz), Some(vert))
  def polar(angle: Scale, distance: Scale): Coord =
    Polar(Some(angle), Some(distance))
}

// ---- visuals --------------------------------------------------------------

sealed trait Visual { def scale: Scale }
final case class SizeV(scale: Scale) extends Visual
final case class ShapeV(scale: Scale, scheme: Option[String] = None) extends Visual
final case class ColorV(scale: Scale, scheme: Option[String] = None) extends Visual
final case class LabelV(scale: Scale) extends Visual

object Visuals {
  def size(s: Scale): Visual = SizeV(s)
  def shape(s: Scale): Visual = ShapeV(s)
  def color(s: Scale): Visual = ColorV(s)
  def label(s: Scale): Visual = LabelV(s)
  // Named schemes (`Visuals.hs:12-18`) — mapped to Vega-Lite scheme names.
  val shapeScheme1 = "circle-square"
  val shapeScheme2 = "triangle-cross"
  val colorScheme1 = "category10"
  val colorScheme2 = "tableau20"
  val continuousColorScheme1 = "viridis"
  val continuousColorScheme2 = "plasma"
}

// ---- the spec container ---------------------------------------------------

/** The Kevin spec: a partial chart declaration that merges monoidally.
  * Mirrors `Kevin { knCoord, knMark }` (`Kevin.hs:14-17`) plus the visuals
  * list the reference declared but never carried.
  */
final case class Kevin(
    coord: Option[Coord] = None,
    mark: Option[Mark] = None,
    visuals: Seq[Visual] = Nil) {

  /** Monoid merge with the reference's duplicate-declaration errors
    * (`Kevin.hs:19-27`): two coords / two marks / both — all errors.
    */
  def merge(other: Kevin): Kevin = (coord, mark, other.coord, other.mark) match {
    case (Some(_), _, Some(_), _) if mark.isEmpty && other.mark.isEmpty =>
      throw new KevinException("coordinate already declared")
    case (_, Some(_), _, Some(_)) if coord.isEmpty && other.coord.isEmpty =>
      throw new KevinException("mark already declared")
    case (Some(_), Some(_), c, m) if c.isDefined || m.isDefined =>
      throw new KevinException("conflicted declaration")
    case (c, m, Some(_), Some(_)) if c.isDefined || m.isDefined =>
      throw new KevinException("conflicted declaration")
    case _ =>
      Kevin(coord.orElse(other.coord), mark.orElse(other.mark),
        visuals ++ other.visuals)
  }
}

object Kevin {
  val empty: Kevin = Kevin()

  def coord(c: Coord): Kevin = Kevin(coord = Some(c))
  def mark(m: Mark): Kevin = Kevin(mark = Some(m))
  def visual(v: Visual): Kevin = Kevin(visuals = Seq(v))

  /** Fold a sequence of partial specs monoidally (the reference's
    * `execWriter` over the Writer monad, `Builder.hs:11-14`).
    */
  def assemble(fragments: Kevin*): Kevin =
    fragments.foldLeft(empty)(_ merge _)
}
