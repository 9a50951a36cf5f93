package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.{functions => F}

/** Driver-side pretty renderer — the Spark mapping of the reference's
  * `Show DataFrame` (`/root/reference/src/Data/DataFrame.hs:94-180`):
  *
  *  - flat mode: right-aligned table (2-space gutter) with an index column
  *    and a group footer listing group field names + per-group indices;
  *  - pivot mode: full crosstab driven by hierarchical title trees (sorted
  *    distinct values per level, parent value printed once);
  *  - CJK-aware column widths (`isLatin1` → 1 else 2, `DataFrame.hs:101-104`);
  *  - Discrete numbers printed with 0 decimals (`DataFrame.hs:112-118`);
  *  - `(EMPTY DATAFRAME)` for a column-empty frame (`DataFrame.hs:107`).
  *
  * Collects only the rendered result — display-sized by contract.
  */
object Render {

  def render(kf: KFrame, maxRows: Int): String = {
    if (kf.dataColumns.isEmpty) return "(EMPTY DATAFRAME)\n"
    kf.pivot match {
      case None => flat(kf, maxRows)
      case Some(p) => crosstab(kf, p, maxRows)
    }
  }

  // ---- shared ---------------------------------------------------------

  private def cjkWidth(s: String): Int =
    s.map(c => if (c.toInt < 256) 1 else 2).sum

  private def showLines(lines: Seq[Seq[String]]): String = {
    if (lines.isEmpty) return ""
    val ncols = lines.map(_.length).max
    val padded = lines.map(_.padTo(ncols, ""))
    val widths = (0 until ncols).map(i => padded.map(r => cjkWidth(r(i))).max)
    padded.map { row =>
      row.zipWithIndex.map { case (x, i) =>
        (" " * (widths(i) - cjkWidth(x) + 2)) + x
      }.mkString + "\n"
    }.mkString
  }

  /** `Empty` displays as the literal "empty" (`DataFrame.hs:92`
    * `show Empty = "empty"`), both for null cells and absent crosstab
    * intersections.
    */
  private def fmt(v: Any, discrete: Boolean, time: Boolean = false): String =
    v match {
      case null => "empty"
      case d: java.lang.Double => fmtDouble(d, discrete)
      case f: java.lang.Float => fmtDouble(f.toDouble, discrete)
      case n: java.math.BigDecimal => fmtDouble(n.doubleValue, discrete)
      case n: java.lang.Number if discrete => n.toString
      case n: java.lang.Long => n.toString
      case n: java.lang.Integer => n.toString
      // KTime columns ride an epoch-day-anchored TIMESTAMP_NTZ (CsvSource);
      // display only the time-of-day component.
      case t: java.time.LocalDateTime if time => TimeFmt.format(t)
      case t: java.sql.Timestamp if time => TimeFmt.format(t.toLocalDateTime)
      case other => other.toString
    }

  private val TimeFmt = java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss")

  private def fmtDouble(d: Double, discrete: Boolean): String =
    if (discrete) f"$d%.0f"
    else if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15)
      s"${d.toLong}.0"
    else d.toString

  private def isDiscrete(kf: KFrame, field: String): Boolean =
    kf.traits(field).interpretation == DataInterpretation.Discrete

  // ---- flat mode ------------------------------------------------------

  private def flat(kf: KFrame, maxRows: Int): String = {
    val cols = kf.dataColumns
    val rows = kf.ds.orderBy(kf.orderCols: _*)
      .select((KFrame.RowId +: cols).map(F.col): _*)
      .take(maxRows)
    val discrete = cols.map(isDiscrete(kf, _))
    val isTime = cols.map(kf.traits(_).dataType == KDataType.KTime)
    val header = "" +: cols
    // Reference-meaningful ids (1..n assignments, possibly subset by
    // filters) display as-is; synthetic order-carrying ids (wrap ingest,
    // deferred aggregate output) display as a fresh 1..n enumeration —
    // exactly what their eventual materialization would assign.
    val displayIds: Seq[Long] =
      if (kf.idsMeaningful) rows.toSeq.map(_.getLong(0))
      else (1L to rows.length.toLong)
    val records = rows.toSeq.zip(displayIds).map { case (r, id) =>
      id.toString +: cols.indices.map(i =>
        fmt(r.get(i + 1), discrete(i), isTime(i)))
    }
    showLines(header +: records) + groupFooter(kf, rows, displayIds, cols)
  }

  /** Group footer (`DataFrame.hs:122-126`): the group field-name list and
    * each group's row indices. Groups are listed in key-ascending order —
    * the reference sorts the group list by key values (`sortOn snd`,
    * `Combinator.hs:66-68`); `reorderByIndices` (`:69-72`) only orders each
    * group's row indices to current frame order.
    */
  private def groupFooter(kf: KFrame, rows: Array[Row], displayIds: Seq[Long],
      cols: Seq[String]): String = {
    if (kf.groups.isEmpty) return ""
    val gIdx = kf.groups.map(g => cols.indexOf(g) + 1).filter(_ > 0)
    if (gIdx.isEmpty) return ""
    // rows are already in frame order; indices within a group keep it.
    val order = scala.collection.mutable.LinkedHashMap[Seq[Any], scala.collection.mutable.ArrayBuffer[Long]]()
    rows.zip(displayIds).foreach { case (r, id) =>
      val key: Seq[Any] = gIdx.map(i => r.get(i))
      order.getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer.empty) += id
    }
    val names = kf.groups.mkString("[\"", "\",\"", "\"]")
    implicit val keyOrd: Ordering[Seq[Any]] =
      Ordering.Implicits.seqOrdering(
        Ordering.by(numericAware)(
          Ordering.Tuple3(Ordering.Int, Ordering.Double.TotalOrdering, Ordering.String)))
    val groupLines = order.toSeq.sortBy(_._1)
      .map(_._2.mkString("[", ",", "]"))
    (names +: groupLines).mkString("", "\n", "\n")
  }

  // ---- pivot mode -----------------------------------------------------

  /** One node of a driver-side title tree (reference `TitleTree`,
    * `DataFrame.hs:40-42`, built by `makeTitleTree` `:257-271`): sorted
    * distinct values per level, children from rows matching the parent.
    * Nodes are keyed by RAW value (`value`); `label` is display-only, so
    * distinct raw values that happen to format alike stay distinct leaves
    * (the reference keys cells by row-index sets, `DataFrame.hs:137-145`).
    */
  private final case class TNode(label: String, value: Any, leaves: Int,
      children: Seq[TNode])

  /** Sort key for raw values: nulls FIRST (consistent with Spark's
    * asc-nulls-first, which orders every frame in the engine — the footer
    * and an aggregate of the same grouping must agree), then numbers, then
    * strings.
    */
  private def numericAware(v: Any): (Int, Double, String) = v match {
    case null => (-1, 0.0, "")
    case n: java.lang.Number => (0, n.doubleValue, "")
    case other => (1, 0.0, other.toString)
  }

  private def buildTree(tuples: Seq[Seq[Any]]): Seq[TNode] = {
    if (tuples.isEmpty || tuples.head.isEmpty) return Nil
    tuples.groupBy(_.head).toSeq
      .sortBy(g => numericAware(g._1))(
        Ordering.Tuple3(Ordering.Int, Ordering.Double.TotalOrdering, Ordering.String))
      .map { case (value, group) =>
        val children = buildTree(group.map(_.tail).filter(_.nonEmpty))
        val leaves = if (children.isEmpty) 1 else children.map(_.leaves).sum
        TNode(fmtTitle(value), value, leaves, children)
      }
  }

  /** Leaf paths as raw values — the cell-lookup keys. */
  private def treeLeafPaths(nodes: Seq[TNode], prefix: Seq[Any] = Nil): Seq[Seq[Any]] =
    nodes.flatMap { n =>
      if (n.children.isEmpty) Seq(prefix :+ n.value)
      else treeLeafPaths(n.children, prefix :+ n.value)
    }

  /** Per-level title lines: `fieldName, v1, "", v2, …` with each value
    * followed by (leafSpan−1) blanks (`DataFrame.hs:152-166`).
    */
  private def treeLines(fieldNames: Seq[String], roots: Seq[TNode]): Seq[Seq[String]] = {
    def level(nodes: Seq[TNode]): Seq[String] =
      nodes.flatMap(n => n.label +: Seq.fill(n.leaves - 1)(""))
    def iter(names: Seq[String], nodes: Seq[TNode]): Seq[Seq[String]] = names match {
      case Seq() => Nil
      case n +: rest => (n +: level(nodes)) +: iter(rest, nodes.flatMap(_.children))
    }
    iter(fieldNames, roots)
  }

  private def crosstab(kf: KFrame, p: PivotSpec, maxRows: Int): String = {
    val fields = p.rowFields ++ p.colFields
    val sel = (fields :+ p.valueField).map(F.col)
    // Display budget: a crosstab backing larger than maxRows*10 cannot be
    // rendered faithfully (missing cells would print as "empty",
    // indistinguishable from genuinely absent intersections), so the
    // over-budget case is an explicit error, never a silent truncation.
    // long arithmetic: a huge maxRows would overflow Int to a NEGATIVE
    // budget and surface as an unrelated Spark negative-limit error
    val budget = math.min(maxRows.toLong * 10, Int.MaxValue - 1L).toInt
    val rows = kf.ds.select(sel: _*).take(budget + 1)
    if (rows.length > budget)
      throw new KevinException(
        s"crosstab backing exceeds the display budget ($budget rows); " +
          "aggregate further or render fewer pivot levels")
    val valDiscrete = false // cells use plain `show` in the reference (:143)
    val valIsTime = kf.traits(p.valueField).dataType == KDataType.KTime

    def tuplesFor(fs: Seq[String]): Seq[Seq[Any]] =
      rows.toSeq.map(r => fs.map(f => r.get(fields.indexOf(f)))).distinct

    val rowRoots = buildTree(tuplesFor(p.rowFields))
    val colRoots = buildTree(tuplesFor(p.colFields))
    val rowLeafPaths = treeLeafPaths(rowRoots)
    val colLeafPaths = treeLeafPaths(colRoots)

    // cell map: RAW values of all pivot fields -> values at that cell
    val cells = rows.toSeq
      .groupBy(r => fields.indices.map(r.get): Seq[Any])
      .view.mapValues(_.map(_.get(fields.length))).toMap

    def cellAt(rp: Seq[Any], cp: Seq[Any]): String =
      cells.get(rp ++ cp) match {
        case None => "empty" // getVal' [] = Empty -> "empty" (DataFrame.hs:143,92)
        case Some(Seq(v)) => fmt(v, valDiscrete, valIsTime)
        case Some(_) =>
          throw new KevinException("invalid data (many values for the same index)")
      }

    val content: Seq[Seq[String]] =
      if (rowLeafPaths.isEmpty) Seq(colLeafPaths.map(cp => cellAt(Nil, cp)))
      else if (colLeafPaths.isEmpty) rowLeafPaths.map(rp => Seq(cellAt(rp, Nil)))
      else rowLeafPaths.map(rp => colLeafPaths.map(cp => cellAt(rp, cp)))

    val rowTitleCols = treeLines(p.rowFields, rowRoots)
    val rowTitleRows: Seq[Seq[String]] =
      if (rowTitleCols.isEmpty) Nil else rowTitleCols.transpose
    val colTitle = treeLines(p.colFields, colRoots).map { line =>
      line.headOption.map(h =>
        (h +: Seq.fill(math.max(rowTitleCols.length - 1, 0))("")) ++ line.tail
      ).getOrElse(line)
    }

    val combined: Seq[Seq[String]] =
      if (rowTitleRows.isEmpty) colTitle ++ content.map("" +: _)
      else colTitle ++
        ((rowTitleRows.head ++ Seq.fill(colLeafPaths.length)("")) +:
          rowTitleRows.tail.zip(content).map { case (t, c) => t ++ c })
    showLines(combined)
  }

  private def fmtTitle(v: Any): String = v match {
    case null => "empty"
    case n: java.lang.Number => f"${n.doubleValue}%.0f"
    case other => other.toString
  }
}
