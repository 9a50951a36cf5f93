package graft.core

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField}

/** Core data-model vocabulary of the engine.
  *
  * Mirrors the reference's field-trait system
  * (`/root/reference/src/Data/DataFrame.hs:69-76`): every column carries a
  * declared type plus Tableau-style semantic traits — a *role* (Dimension vs
  * Measure) and an *interpretation* (Discrete vs Continuous). We persist the
  * traits in Spark `StructField.metadata`, which survives `select`/`filter`/
  * plan rewrites for free.
  */
sealed abstract class KDataType(val name: String)
object KDataType {
  case object KText extends KDataType("text")
  case object KNumber extends KDataType("number")
  case object KDate extends KDataType("date")
  case object KTime extends KDataType("time")
  case object KDateTime extends KDataType("datetime")
  case object KGeography extends KDataType("geography")
  val all: Seq[KDataType] = Seq(KText, KNumber, KDate, KTime, KDateTime, KGeography)
  def parse(s: String): KDataType =
    all.find(_.name == s).getOrElse(throw new KevinException(s"unknown data type: $s"))
}

sealed abstract class DataRole(val name: String)
object DataRole {
  case object Dimension extends DataRole("dimension")
  case object Measure extends DataRole("measure")
  def parse(s: String): DataRole = s match {
    case "dimension" => Dimension
    case "measure"   => Measure
    case other       => throw new KevinException(s"unknown role: $other")
  }
}

sealed abstract class DataInterpretation(val name: String)
object DataInterpretation {
  case object Discrete extends DataInterpretation("discrete")
  case object Continuous extends DataInterpretation("continuous")
  def parse(s: String): DataInterpretation = s match {
    case "discrete"   => Discrete
    case "continuous" => Continuous
    case other        => throw new KevinException(s"unknown interpretation: $other")
  }
}

/** `(DataType, DataRole, DataInterpretation)` triple of a column
  * (`/root/reference/src/Data/DataFrame.hs:71`).
  */
final case class FieldTraits(
    dataType: KDataType,
    role: DataRole,
    interpretation: DataInterpretation) {
  def toMetadata(existing: Metadata = Metadata.empty): Metadata =
    new MetadataBuilder()
      .withMetadata(existing)
      .putString(FieldTraits.TypeKey, dataType.name)
      .putString(FieldTraits.RoleKey, role.name)
      .putString(FieldTraits.InterpKey, interpretation.name)
      .build()
}

object FieldTraits {
  val TypeKey = "kevin.type"
  val RoleKey = "kevin.role"
  val InterpKey = "kevin.interpretation"

  val text: FieldTraits =
    FieldTraits(KDataType.KText, DataRole.Dimension, DataInterpretation.Discrete)
  val measure: FieldTraits =
    FieldTraits(KDataType.KNumber, DataRole.Measure, DataInterpretation.Continuous)
  val discreteNumber: FieldTraits =
    FieldTraits(KDataType.KNumber, DataRole.Dimension, DataInterpretation.Discrete)

  def of(f: StructField): Option[FieldTraits] = {
    val m = f.metadata
    if (m.contains(TypeKey) && m.contains(RoleKey) && m.contains(InterpKey))
      Some(FieldTraits(
        KDataType.parse(m.getString(TypeKey)),
        DataRole.parse(m.getString(RoleKey)),
        DataInterpretation.parse(m.getString(InterpKey))))
    else None
  }

  /** Traits of a column that never went through trait inference: derive a
    * sensible default from the Spark type (numeric → measure, else text
    * dimension), so parquet-born frames still render/aggregate correctly.
    */
  def defaultFor(f: StructField): FieldTraits = {
    import org.apache.spark.sql.types._
    f.dataType match {
      case _: NumericType => measure
      case DateType => FieldTraits(KDataType.KDate, DataRole.Dimension, DataInterpretation.Discrete)
      case _: TimestampType | TimestampNTZType =>
        FieldTraits(KDataType.KDateTime, DataRole.Dimension, DataInterpretation.Continuous)
      case _: TimeType => FieldTraits(KDataType.KTime, DataRole.Dimension, DataInterpretation.Continuous)
      case _ => text
    }
  }
}

/** Error type for all reference-parity failures. The reference signals these
  * with Haskell `error` calls (e.g. `Combinator.hs:131` "inconsistent type",
  * `:199` "no such field"); we throw a typed exception with the same trigger
  * conditions.
  */
final class KevinException(msg: String) extends RuntimeException(msg)

/** Crosstab presentation state carried by a pivoted frame — the Spark-side
  * stand-in for the reference's `TitleTrees`
  * (`/root/reference/src/Data/DataFrame.hs:40-42`). `stack`/`unstack` move
  * fields between the row and column trees without touching data.
  */
final case class PivotSpec(
    rowFields: Seq[String],
    colFields: Seq[String],
    valueField: String)

/** One component of the frame's logical row order. The full order is the
  * ordering list (most recent sort first) with `__row_id` as final tiebreak.
  */
final case class SortKey(field: String, ascending: Boolean)
