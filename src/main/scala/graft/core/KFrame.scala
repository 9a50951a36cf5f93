package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** The engine's frame abstraction — Spark-native re-expression of the
  * reference's 4-tuple `DataFrame Indices Groups TitleTrees [Field]`
  * (`/root/reference/src/Data/DataFrame.hs:65-72`).
  *
  * Design (SURVEY.md §1.3 / §7.1):
  *  - data lives in a plain Catalyst-optimizable `Dataset[Row]` carrying a
  *    hidden `__row_id` long that encodes row *identity* and — whenever the
  *    `ordering` spec is empty — row *order* (ascending row id = frame
  *    order). Ids are NOT guaranteed contiguous: Parquet ingest assigns
  *    `monotonically_increasing_id` (a pure projection, so predicate
  *    pushdown / column pruning / whole-stage codegen all survive), and
  *    filters subset the id space. `idsArePositions` tracks the stronger
  *    invariant "ids are exactly 1..n in frame order", which positional
  *    reshapes (melt/append/zip) restore when they need it;
  *  - row order after a sort is kept logical: `ordering` (most recent sort
  *    first) with the row id as final tiebreak. Order is materialized into
  *    fresh contiguous ids only when an operator structurally needs
  *    positions, via a partition-offset `zipWithIndex` — never a
  *    single-partition global window;
  *  - `groups` is the carried grouping state (`DataFrame.hs:68`): `groupby`
  *    only records names; the shuffle happens when `aggregate` fires;
  *  - `pivot` is the carried crosstab presentation state standing in for the
  *    reference's `TitleTrees`; realized at render time.
  *
  * Descending sorts replicate the reference's `Descending = reverse(asc)`
  * quirk (`Combinator.hs:229-230`): a desc sort reverses the *entire*
  * previous order among equal keys, which we encode by flipping the sense of
  * every existing sort key and of the row-id tiebreak.
  */
final class KFrame private[graft] (
    private[graft] val ds: DataFrame,
    val groups: Seq[String],
    val pivot: Option[PivotSpec],
    private[graft] val ordering: Seq[SortKey],
    private[graft] val rowIdAsc: Boolean,
    private[graft] val idsArePositions: Boolean,
    /** true when row ids descend from a 1..n position assignment (ingest
      * renumber) and are therefore the reference-meaningful indices to
      * display; false for synthetic order-carrying ids
      * (`monotonically_increasing_id` from [[KFrame.wrap]], or deferred
      * aggregate output ids), where the renderer enumerates instead.
      */
    private[graft] val idsMeaningful: Boolean,
    /** The frame as it stood when `groupby` last recorded [[groups]] —
      * the strict-parity substrate for the reference's stale-groups quirk
      * (`Combinator.hs:215-222`): `aggregate(strictGroups = true)` folds
      * the group membership OF GROUPBY TIME, including rows hidden since
      * by filter/take/head-family ops, exactly as the reference's stored
      * group indices do. None until a groupby fires; consulted only by
      * the strict aggregate overload, so the default path never pays for
      * it (it is one extra plan reference, no materialization).
      */
    private[graft] val groupSnapshot: Option[KFrame] = None) {

  import KFrame._

  private def spark: SparkSession = ds.sparkSession

  /** Visible (user-facing) columns, i.e. everything but the hidden row id. */
  def dataColumns: Seq[String] = ds.columns.toSeq.filterNot(_ == RowId)

  def traits(field: String): FieldTraits = {
    val f = ds.schema.fields.find(_.name == field)
      .getOrElse(throw new KevinException(s"no such field: $field"))
    FieldTraits.of(f).getOrElse(FieldTraits.defaultFor(f))
  }

  def withTraits(field: String, t: FieldTraits): KFrame = {
    val existing = ds.schema.fields.find(_.name == field)
      .map(_.metadata).getOrElse(Metadata.empty)
    copyWith(ds = ds.withMetadata(field, t.toMetadata(existing)))
  }

  private def copyWith(
      ds: DataFrame = ds,
      groups: Seq[String] = groups,
      pivot: Option[PivotSpec] = pivot,
      ordering: Seq[SortKey] = ordering,
      rowIdAsc: Boolean = rowIdAsc,
      idsArePositions: Boolean = idsArePositions,
      idsMeaningful: Boolean = idsMeaningful,
      groupSnapshot: Option[KFrame] = groupSnapshot): KFrame =
    new KFrame(ds, groups, pivot, ordering, rowIdAsc, idsArePositions,
      idsMeaningful, groupSnapshot)

  /** The frame's total order as Spark sort columns. */
  private[graft] def orderCols: Seq[Column] = {
    val keys = ordering.map(k =>
      if (k.ascending) F.col(k.field).asc else F.col(k.field).desc)
    keys :+ (if (rowIdAsc) F.col(RowId).asc else F.col(RowId).desc)
  }

  private def flippedOrderCols: Seq[Column] = {
    val keys = ordering.map(k =>
      if (k.ascending) F.col(k.field).desc else F.col(k.field).asc)
    keys :+ (if (rowIdAsc) F.col(RowId).desc else F.col(RowId).asc)
  }

  /** True when ascending row id already IS the frame order (no pending
    * logical sort) — the fast path that lets aggregate/melt skip any
    * order-materializing shuffle.
    */
  private def idOrderIsFrameOrder: Boolean = ordering.isEmpty && rowIdAsc

  /** Renumber row ids to exactly 1..n in the frame's current logical order
    * and clear the ordering spec. Distributed: sort (range-partitioned
    * shuffle) + partition-offset zipWithIndex; no global window. No-op when
    * ids are already positions.
    */
  private[graft] def materializePositions: KFrame =
    if (idOrderIsFrameOrder && idsArePositions) this
    else copyWith(ds = renumber(ds.orderBy(orderCols: _*)),
      ordering = Nil, rowIdAsc = true, idsArePositions = true,
      idsMeaningful = true)

  // ---- §2.2 projection ------------------------------------------------

  /** Project + reorder columns to argument order; unknown names are silently
    * dropped (`Combinator.hs:38-55`). Keeps groups, clears pivot.
    */
  def select(names: String*): KFrame = {
    val existing = names.filter(ds.columns.contains)
    // If the logical order references a column being dropped, bake the order
    // into row ids first so it survives the projection.
    val base =
      if (ordering.forall(k => existing.contains(k.field))) this
      else materializePositions
    base.copyWith(
      ds = base.ds.select((existing :+ RowId).map(F.col): _*),
      pivot = None,
      ordering = base.ordering)
  }

  /** Append a computed column (capability upgrade — the reference has no
    * scalar expression surface at all, SURVEY.md §2.8; our Column overloads
    * ARE that surface). Keeps groups and order, clears pivot. Traits of the
    * new column derive from its Spark type.
    */
  def derive(name: String, expr: Column): KFrame = {
    if (ds.columns.contains(name))
      throw new KevinException(s"column already exists: $name")
    copyWith(ds = ds.withColumn(name, expr), pivot = None)
  }

  /** Rename a column, preserving traits metadata, groups and order
    * (helps avoid the duplicate-field hazards the reference's TODO:4
    * acknowledges). Unknown source names error; occupied target names
    * error.
    */
  def rename(from: String, to: String): KFrame = {
    requireField(from)
    if (ds.columns.contains(to))
      throw new KevinException(s"column already exists: $to")
    def sub(n: String): String = if (n == from) to else n
    copyWith(
      ds = ds.withColumnRenamed(from, to),
      groups = groups.map(sub),
      pivot = pivot.map(p => PivotSpec(
        p.rowFields.map(sub), p.colFields.map(sub), sub(p.valueField))),
      ordering = ordering.map(k => k.copy(field = sub(k.field))))
  }

  // ---- §2.3 filters ---------------------------------------------------

  /** Idiomatic Column-expression filter — Catalyst-optimizable (pushdown).
    * Resets groups, clears pivot (`Combinator.hs:195`).
    */
  def filter(cond: Column): KFrame =
    copyWith(ds = ds.filter(cond), groups = Nil, groupSnapshot = None, pivot = None,
      idsArePositions = false)

  /** Reference-parity typed predicate on a Text column; `Empty` (null) rows
    * are dropped (`Combinator.hs:126-132`).
    */
  def filterText(field: String, pred: String => Boolean): KFrame =
    typedFilter(field, numeric = false, F.udf(pred).apply(F.col(field)))

  /** Typed predicate on a Number column (`Combinator.hs:142-164`). */
  def filterNumber(field: String, pred: Double => Boolean): KFrame =
    typedFilter(field, numeric = true, F.udf(pred).apply(F.col(field).cast("double")))

  /** Typed integral predicate (`Combinator.hs:150-156,176-182`). A
    * non-integral value in the column is an "inconsistent type" error like
    * the reference's failed `toBoundedInteger` dispatch — never silently
    * truncated. Integral-typed columns pass through as exact longs (no
    * double round-trip, so values above 2^53 keep full precision); only
    * floating-point columns go through the integrality guard.
    */
  def filterInt(field: String, pred: Long => Boolean): KFrame = {
    requireField(field)
    val isIntegral = ds.schema(field).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val cond =
      if (isIntegral) F.udf(pred).apply(F.col(field).cast("long"))
      else {
        val guarded = F.udf { (d: Double) =>
          if (d != math.floor(d) || d.isInfinite)
            throw new KevinException(s"inconsistent type: $field has non-integral value $d")
          pred(d.toLong)
        }
        guarded.apply(F.col(field).cast("double"))
      }
    typedFilter(field, numeric = true, cond)
  }

  private def typedFilter(field: String, numeric: Boolean, cond: Column): KFrame = {
    requireField(field)
    requireFieldType(field, numeric)
    copyWith(
      ds = ds.filter(F.col(field).isNotNull && cond),
      groups = Nil, groupSnapshot = None, pivot = None, idsArePositions = false)
  }

  // ---- §2.4 grouping & aggregation -----------------------------------

  /** Record grouping state; the physical groupBy happens in [[aggregate]]
    * (`Combinator.hs:56-72`). Unknown names are dropped without error
    * (`Spec.lhs:64-65`). Sets groups, clears pivot.
    */
  def groupby(names: String*): KFrame =
    // snapshot a snapshot-FREE copy: chains of groupbys must not build a
    // linked list of retained frames (each older snapshot is unreachable
    // anyway — strict aggregate only ever consults the latest); group-
    // resetting ops likewise clear groupSnapshot at their copyWith sites.
    // Repeated names dedup to their first occurrence: a duplicate stored
    // key would make aggregate emit a duplicate-named key column, the
    // undefined duplicate-field hazard of the reference's TODO:4 (every
    // later reference to it is ambiguous — found by FuzzChainSpec).
    copyWith(groups = names.distinct.filter(ds.columns.contains),
      pivot = None,
      groupSnapshot = Some(this.copyWith(groupSnapshot = None)))

  /** Collapse to one row per group, keeping the group-key columns plus the
    * aggregated column under its original name; all other columns dropped
    * (`Combinator.hs:202-226`). With no stored groups the whole visible
    * frame is one group. Output rows are ordered — and given fresh indices
    * 1..nGroups — by the group-key values ascending, matching the
    * reference's `sortOn snd` group ordering (`Combinator.hs:66-68`;
    * `reorderByIndices` at `:69-72` only orders the rows *within* a group to
    * frame order). Resets groups, clears pivot.
    *
    * Scale: for order-insensitive aggregators (sum/mean/count/var/sd) this
    * is ONE hash aggregate (partial+final) — no sort of the input, no
    * renumber; only the group-sized OUTPUT is ordered and renumbered. An
    * order-sensitive aggregator (concat, custom closures) under a pending
    * logical sort first bakes the frame order into the ids so values fold
    * in frame order within each group.
    */
  def aggregate(agg: KAggregator, field: String): KFrame =
    aggregate(agg, field, strictGroups = false)

  /** [[aggregate]] with the reference-parity toggle for the stale-groups
    * quirk (SURVEY §2.9; `Combinator.hs:215-222`): the reference's
    * `aggregate` folds the STORED group indices regardless of current row
    * visibility — rows hidden by a filter/take/head between `groupby` and
    * `aggregate` still contribute to their group. `strictGroups = true`
    * replays that: the fold runs over the [[groupSnapshot]] recorded at
    * groupby time under the stored keys (so hidden rows are back in, and
    * group keys dropped since still partition — both reference
    * behaviors). The default `false` keeps the sane re-filtered
    * semantics: only currently-visible rows aggregate. Falls back to the
    * sane path when no groupby has fired, when groups were consumed, or
    * when the aggregated field OR any current group-key name did not
    * exist at groupby time (a rename in between — the snapshot cannot
    * express either; without the group-key check, a renamed key would
    * silently vanish from the snapshot's liveGroups and collapse the
    * strict fold to ONE global group).
    */
  def aggregate(agg: KAggregator, field: String,
      strictGroups: Boolean): KFrame = {
    if (!ds.columns.contains(field))
      throw new KevinException(s"no such field: $field")
    requireFieldType(field, agg.numeric, err = "invalid type")
    if (strictGroups && this.groups.nonEmpty)
      groupSnapshot.filter(snap => snap.ds.columns.contains(field) &&
          this.groups.forall(snap.ds.columns.contains)) match {
        case Some(snap) =>
          return snap.copyWith(groups = this.groups)
            .aggregate(agg, field, strictGroups = false)
        case None => ()
      }
    val groups = liveGroups
    // Aggregating one of the live group keys would emit TWO columns named
    // `field` (the key column + the aggregate, which keeps the field's
    // name) — the reference's undefined duplicate-field hazard (TODO:4);
    // every later reference to the name is ambiguous. Fail fast (found by
    // FuzzChainSpec chain composition). `transform` is immune: it writes
    // under a caller-supplied fresh name.
    if (groups.contains(field))
      throw new KevinException(
        s"cannot aggregate a group key (duplicate output column): $field")
    val m =
      if (!agg.orderSensitive || idOrderIsFrameOrder) this
      else materializePositions
    val expr = agg.toColumn(field, F.col(RowId)).as(field)
    if (groups.isEmpty)
      copyWith(ds = m.ds.agg(expr).withColumn(RowId, F.lit(1L)),
        groups = Nil, groupSnapshot = None, pivot = None, ordering = Nil,
        rowIdAsc = true, idsArePositions = true, idsMeaningful = true)
    else {
      // Key-ascending frame order stays LOGICAL (ordering spec over the
      // unique group keys) — no output sort, no RDD renumber, the hash
      // aggregate stays inside one codegen'd, AQE-planned lineage. Fresh
      // 1..n ids materialize lazily only if a positional op needs them.
      //
      // The row id must be DETERMINISTIC, not monotonically_increasing_id:
      // a downstream drop/init anti-joins the frame against a limit of
      // itself, so the aggregate subtree appears twice in ONE plan, and
      // AQE may lay the two instances' post-shuffle partitions out
      // differently — monotonic ids then differ per instance and the
      // anti-join removes the wrong rows (found by FuzzChainSpec fuzznull
      // chain #139: aggregate → drop(8) dropped 8 rows, but not the first
      // 8). xxhash64 over the (unique) group keys is identical in every
      // instance. Each key column is prefixed by its null flag: Spark's
      // hash SKIPS null inputs, so without the flag (null, x) and
      // (x, null) would systematically collide. Residual 64-bit collisions
      // only matter if a colliding pair straddles a later drop(n≤2^22)
      // boundary — n·groups/2^64, negligible even at 100 TB group counts
      // (and the n>2^22 path slices by single-instance positions, id-free).
      val idExpr = F.xxhash64(groups.flatMap(g =>
        Seq(F.col(g).isNull.cast("long"), F.col(g))): _*)
      val out = m.ds.groupBy(groups.map(F.col): _*).agg(expr)
        .withColumn(RowId, idExpr)
      copyWith(ds = out, groups = Nil, groupSnapshot = None, pivot = None,
        ordering = groups.map(SortKey(_, ascending = true)),
        rowIdAsc = true, idsArePositions = false, idsMeaningful = false)
    }
  }

  /** The reference's planned-but-unbuilt `transform`
    * (`/root/reference/test/Spec.lhs:119` "aggregate v.s. transform",
    * `TODO:8`): per-group aggregate that KEEPS every row, appending the
    * group's aggregated value as a new column — R plyr's
    * `ddply(..., transform)`, SQL's windowed aggregate. With no stored
    * groups the whole frame is one group. Keeps groups, keeps order,
    * clears pivot.
    *
    * Scale: order-insensitive aggregators (incl. the CustomFold family)
    * run as one window aggregate partitioned by the group keys (hash
    * shuffle). Order-sensitive ones (concat, the CustomNumeric/
    * CustomString list closures) aggregate once per GROUP and join back on
    * the keys — a windowed composite would re-run the sort+finish step per
    * ROW, O(g²) in the group size. The no-groups case is a 1-row
    * aggregate broadcast, never an empty-partitionBy window (which would
    * move the whole frame to a single partition).
    */
  def transform(agg: KAggregator, field: String, as: String): KFrame = {
    if (!ds.columns.contains(field))
      throw new KevinException(s"no such field: $field")
    if (ds.columns.contains(as))
      throw new KevinException(s"column already exists: $as")
    requireFieldType(field, agg.numeric, err = "invalid type")
    val groups = liveGroups
    val m =
      if (!agg.orderSensitive || idOrderIsFrameOrder) this
      else materializePositions
    val out =
      if (groups.isEmpty) {
        val scalarDF = m.ds.agg(agg.toColumn(field, F.col(RowId)).as(as))
        m.ds.crossJoin(F.broadcast(scalarDF))
      } else if (agg.orderSensitive) {
        // null-safe join keys: groupBy (and the window path below) treat
        // a null group key as a REAL group, but a plain equi-join never
        // matches null — null-key rows would get a null aggregate from
        // this path and the true group aggregate from the other
        val grouped = m.ds.groupBy(groups.map(F.col): _*)
          .agg(agg.toColumn(field, F.col(RowId)).as(as))
          .select(groups.map(n => F.col(n).as(s"__g_$n")) :+ F.col(as): _*)
        val cond = groups.map(n => m.ds(n) <=> grouped(s"__g_$n"))
          .reduce(_ && _)
        groups.foldLeft(m.ds.join(grouped, cond, "left"))(
          (d, n) => d.drop(F.col(s"__g_$n")))
      } else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(groups.map(F.col): _*)
        m.ds.withColumn(as, agg.toWindowColumn(field, F.col(RowId), w))
      }
    m.copyWith(ds = out, pivot = None)
  }

  /** The reference's planned-but-unbuilt "sort by group"
    * (`/root/reference/test/Spec.lhs:118`, `TODO:7`): reorder the frame by
    * the stored group keys ascending, stable within groups. Keeps groups,
    * clears pivot.
    */
  def sortByGroups: KFrame = {
    val live = liveGroups
    if (live.isEmpty) copyWith(pivot = None)
    else copyWith(pivot = None,
      ordering = live.map(SortKey(_, ascending = true)) ++ ordering)
  }

  /** Stored group names whose columns still exist. Group names whose
    * columns were since dropped by a select degrade gracefully to the
    * remaining keys (documented divergence: the reference's stored group
    * INDICES survive the column drop and still partition rows, but the
    * key column is silently absent from its output — neither behavior is
    * fully recoverable here).
    */
  private def liveGroups: Seq[String] = groups.filter(ds.columns.contains)

  // ---- §2.5 reshape ---------------------------------------------------

  /** Wide→long (`Combinator.hs:78-120`): id columns replicated once per
    * value column, fixed output columns `variable` (Text/Dimension/Discrete)
    * and `value` (Number/Measure/Continuous), result in **variable-major**
    * order (all rows of var1, then var2, …) with fresh contiguous row ids
    * 1..h·nVars. Unknown var names melt away (possibly to a row-empty
    * frame). Non-numeric var columns are an eager "invalid data" error —
    * the engine cannot mix strings into the numeric `value` column
    * (documented deviation: the reference carries them dynamically). Resets
    * groups, clears pivot.
    *
    * Scale: fresh ids are pure arithmetic `(varIdx-1)*h + oldId` over
    * position ids; `h` comes from an in-plan scalar aggregate broadcast —
    * no driver-side count job.
    */
  def melt(ids: Seq[String], vars: Seq[String]): KFrame = {
    val idCols = ids.filter(ds.columns.contains)
    val varCols = vars.filter(ds.columns.contains)
    // An id column named like melt's fixed output columns would emit a
    // duplicate-name frame (double-melt with `variable` as an id) — the
    // duplicate-field hazard the reference's TODO:4 acknowledges but
    // never defines. Fail as an engine error, not a downstream
    // AnalysisException (found by FuzzChainSpec chain composition).
    Seq(Variable, Value).filter(idCols.contains).foreach(c =>
      throw new KevinException(
        s"melt id column collides with the fixed output column: $c"))
    varCols.foreach(requireFieldType(_, numeric = true, err = "invalid data"))
    // Var-major id arithmetic `(varIdx-1)*h + oldId` needs only an upper
    // bound h >= every id — max(id) works for non-contiguous order-carrying
    // ids too, so frame-ordered inputs skip the renumber. (Overflow bound:
    // mono ids stay < 2^53 at realistic partition counts; nVars is small.)
    val m = if (idOrderIsFrameOrder) this else materializePositions
    if (varCols.isEmpty) {
      val empty = m.ds
        .select(idCols.map(F.col) :+ F.lit("").as(Variable) :+
          F.lit(0.0).as(Value) :+ F.col(RowId): _*)
        .filter(F.lit(false))
      return copyWith(ds = meltTraits(empty), groups = Nil, groupSnapshot = None, pivot = None,
        ordering = Nil, rowIdAsc = true, idsArePositions = true,
        idsMeaningful = true)
    }
    val narrowed = m.ds.select((idCols ++ varCols :+ RowId).map(F.col): _*)
    val unpivoted = narrowed.unpivot(
      (idCols :+ RowId).map(F.col).toArray,
      varCols.map(c => F.col(c).cast("double")).toArray,
      Variable, Value)
    // id upper bound as a 1-row in-plan aggregate, broadcast to every
    // task (equals the height when ids are positions).
    val hDF = m.ds.agg(F.coalesce(F.max(F.col(RowId)), F.lit(0L)).as(MeltH))
    val varIdx = F.array_position(
      F.array(varCols.map(F.lit): _*), F.col(Variable))
    val out = unpivoted
      .crossJoin(F.broadcast(hDF))
      .withColumn(RowId, (varIdx - 1) * F.col(MeltH) + F.col(RowId))
      .drop(MeltH)
    copyWith(ds = meltTraits(out), groups = Nil, groupSnapshot = None, pivot = None,
      ordering = Nil, rowIdAsc = true, idsArePositions = m.idsArePositions,
      idsMeaningful = m.idsArePositions && m.idsMeaningful)
  }

  def melt(id: String, vars: Seq[String]): KFrame = melt(Seq(id), vars)
  def melt(ids: Seq[String], v: String): KFrame = melt(ids, Seq(v))
  def melt(id: String, v: String): KFrame = melt(Seq(id), Seq(v))

  private def meltTraits(df: DataFrame): DataFrame =
    df.withMetadata(Variable, FieldTraits.text.toMetadata())
      .withMetadata(Value, FieldTraits.measure.toMetadata())

  /** Enter pivot form (`DataFrame.hs:276-283`): all non-value columns form
    * the row tree, column tree empty. Keeps groups.
    */
  def toPivot(valueField: String): KFrame = {
    requireField(valueField)
    copyWith(pivot = Some(
      PivotSpec(dataColumns.filterNot(_ == valueField), Nil, valueField)))
  }

  /** Leave pivot form (`DataFrame.hs:273-274`). */
  def fromPivot: KFrame = copyWith(pivot = None)

  /** Move a field from the column tree to the end of the row tree
    * (`Combinator.hs:239-252`).
    */
  def stack(field: String): KFrame = pivot match {
    case None => throw new KevinException("dataframe is not pivoted")
    case Some(p) =>
      if (!p.colFields.contains(field))
        throw new KevinException(s"no such field in column titles: $field")
      copyWith(pivot = Some(p.copy(
        rowFields = p.rowFields :+ field,
        colFields = p.colFields.filterNot(_ == field))))
  }

  /** Move a field from the row tree to the end of the column tree
    * (`Combinator.hs:254-267`).
    */
  def unstack(field: String): KFrame = pivot match {
    case None => throw new KevinException("dataframe is not pivoted")
    case Some(p) =>
      if (!p.rowFields.contains(field))
        throw new KevinException(s"no such field in row titles: $field")
      copyWith(pivot = Some(p.copy(
        rowFields = p.rowFields.filterNot(_ == field),
        colFields = p.colFields :+ field)))
  }

  /** The R-`dcast` composite (`Combinator.hs:269-276`):
    * `groupby(rows++cols) → aggregate(agg, v) → toPivot(v) → unstack cols`.
    */
  def cast(rows: Seq[String], cols: Seq[String], agg: KAggregator, valueField: String): KFrame = {
    if (rows.intersect(cols).nonEmpty)
      throw new KevinException("overlapping row/column fields")
    if ((rows ++ cols).contains(valueField))
      throw new KevinException(s"value field collides with row/column fields: $valueField")
    val aggregated = groupby(rows ++ cols: _*).aggregate(agg, valueField).toPivot(valueField)
    cols.foldLeft(aggregated)((f, c) => f.unstack(c))
  }

  /** Realize the pivot as a flat wide table via Spark's native
    * `groupBy().pivot().agg(first)` — the scalable path for crosstab-shaped
    * results (the renderer uses driver-side trees only for display).
    *
    * One column field pivots on the raw value (header = the value itself,
    * unchanged from before). Multiple column fields pivot on the
    * `concat_ws(sep, ...)` tuple key (SURVEY §2.5's mapping): headers are
    * `"v1<sep>v2<sep>..."` in the column-tree field order, splittable back
    * into the tree with [[KFrame.splitWideHeader]]. HARD contract on `sep`
    * (default `"|"`): it must not occur inside any column-field value.
    * A collision is not merely a header-split ambiguity — two distinct
    * tuples like `("a|b","c")` and `("a","b|c")` concat to the SAME pivot
    * key, so `first()` would keep one of their pre-aggregated cells and
    * drop the other. ENFORCED at runtime: a value containing `sep` raises
    * (codegen'd row check inline in the pivot scan, see
    * `guardedTupleKey`) instead of losing data silently. Pick a `sep`
    * outside the values' alphabet (e.g. `"\u0000"`) when values may
    * contain the default.
    * A NULL in any column field makes
    * `concat_ws` skip that slot, merging the header with the one-shorter
    * tuple; pre-filter or `coalesce` nulls when they are live keys. The
    * pivot's distinct-key scan sorts keys, so column order is
    * deterministic (lexicographic on the joined string).
    */
  def pivotedWide: DataFrame = pivotedWide(KFrame.WideHeaderSep)

  /** [[pivotedWide]] with EXPLICIT pivot keys — the scale path. Without
    * them, Spark's `pivot` runs a distinct+sort+collect job over the whole
    * frame just to learn the output columns: one extra full pass at
    * 100 TB, and an output schema that silently changes with the data.
    * Passing the keys (one Seq per wide column: a 1-element path for a
    * single column field, an N-element path for N) skips the scan and
    * freezes the schema — keys absent from the data become all-null
    * columns, keys present but unlisted are dropped. Wide columns come
    * out in the GIVEN order. Multi-field paths are matched against the
    * same `concat_ws` tuple key as the auto variant (elements joined by
    * `sep` via `toString`; a null path element cannot be expressed — the
    * tuple key skips null slots, see [[pivotedWide]]).
    */
  def pivotedWide(values: Seq[Seq[Any]]): DataFrame =
    pivotedWide(values, KFrame.WideHeaderSep)

  /** [[pivotedWide]] with explicit pivot keys and tuple-key separator. */
  def pivotedWide(values: Seq[Seq[Any]], sep: String): DataFrame = pivot match {
    case Some(PivotSpec(rows, Seq(c), v)) =>
      values.find(_.length != 1).foreach(p => throw new KevinException(
        s"pivot key path $p must have exactly 1 element for column field $c"))
      ds.groupBy(rows.map(F.col): _*).pivot(c, values.map(_.head))
        .agg(F.first(F.col(v)))
    case Some(PivotSpec(rows, cols, v)) if cols.nonEmpty =>
      values.find(_.length != cols.length).foreach(p =>
        throw new KevinException(s"pivot key path $p must have " +
          s"${cols.length} elements for column fields $cols"))
      // scope the collision raise to rows whose MERGED key is one of the
      // requested keys: a colliding row outside the requested list is
      // dropped by the explicit-keys pivot anyway (no cell can be lost),
      // and raising on it would abort previously-working pipelines
      // (round-11 ADVICE)
      val keys = values.map(_.mkString(sep))
      ds.groupBy(rows.map(F.col): _*)
        .pivot(guardedTupleKey(cols, sep, onlyKeys = Some(keys)), keys)
        .agg(F.first(F.col(v)))
    case Some(p) => throw new KevinException(
      s"pivotedWide needs at least one column field, got ${p.colFields}")
    case None => throw new KevinException("dataframe is not pivoted")
  }

  /** [[pivotedWide]] with an explicit tuple-key separator. */
  def pivotedWide(sep: String): DataFrame = pivot match {
    case Some(PivotSpec(rows, Seq(c), v)) =>
      ds.groupBy(rows.map(F.col): _*).pivot(c).agg(F.first(F.col(v)))
    case Some(PivotSpec(rows, cols, v)) if cols.nonEmpty =>
      ds.groupBy(rows.map(F.col): _*)
        .pivot(guardedTupleKey(cols, sep))
        .agg(F.first(F.col(v)))
    case Some(p) => throw new KevinException(
      s"pivotedWide needs at least one column field, got ${p.colFields}")
    case None => throw new KevinException("dataframe is not pivoted")
  }

  /** The multi-column-field tuple key, with the `sep` contract ENFORCED
    * per row: a column-field value containing `sep` merges distinct
    * tuples into one pivot key and `first()` silently drops all but one
    * of their pre-aggregated cells — so it raises instead. The check is a
    * codegen'd string `contains` inline in the same scan the concat
    * already pays (no extra pass, no driver round-trip); NULL values skip
    * the check and keep `concat_ws`'s documented skip-the-slot behavior.
    *
    * `onlyKeys` scopes the raise for the explicit-keys overload: only a
    * colliding row whose MERGED key lands on a requested key can
    * actually steal/lose a cell — any other colliding row is dropped by
    * the explicit-keys pivot exactly as it was before the guard existed.
    * In the auto overload every colliding row feeds the distinct-key
    * scan, so there the raise stays unscoped (`None`).
    */
  private def guardedTupleKey(cols: Seq[String], sep: String,
      onlyKeys: Option[Seq[String]] = None): Column = {
    val raw = F.concat_ws(sep, cols.map(F.col(_).cast("string")): _*)
    // contains on NULL yields NULL: coalesce keeps the slot-skip contract
    val collides = F.coalesce(
      cols.map(c => F.col(c).cast("string").contains(sep))
        .reduce(_ || _), F.lit(false))
    val scoped = onlyKeys match {
      case Some(ks) => collides && raw.isin(ks: _*)
      case None => collides
    }
    F.when(scoped, F.raise_error(F.concat(
      F.lit(s"pivotedWide: separator '$sep' occurs in a column-field " +
        "value of merged pivot key '"), raw,
      F.lit("' — distinct tuples would merge and lose cells silently; " +
        "pass a sep outside the values' alphabet"))).cast("string"))
      .otherwise(raw)
  }

  // ---- §2.6 sorts / limits / positional ------------------------------

  /** Stable single-column sort; unknown field leaves the frame unchanged
    * (`Combinator.hs:235-237`). Descending reverses the whole previous
    * order among ties (`:229-230`). Keeps groups, clears pivot.
    */
  def sort(field: String, ascending: Boolean = true): KFrame = {
    if (!ds.columns.contains(field)) return copyWith(pivot = None)
    if (ascending)
      copyWith(pivot = None,
        ordering = SortKey(field, ascending = true) +: ordering)
    else
      copyWith(pivot = None,
        ordering = SortKey(field, ascending = false) +:
          ordering.map(k => k.copy(ascending = !k.ascending)),
        rowIdAsc = !rowIdAsc)
  }

  /** Attach a hidden contiguous 1..n position column in current frame order
    * while PRESERVING the visible row ids (unlike [[materializePositions]],
    * which rewrites them — reference display parity keeps original indices
    * through take/drop). Distributed: range-partitioned sort + per-partition
    * offset zipWithIndex; no global window, no single-task funnel.
    */
  private def withPositions: DataFrame =
    appendIndex(ds.orderBy(orderCols: _*), Pos)

  /** Positional slice via the distributed position column: `keepFirst` keeps
    * positions <= n (take), otherwise positions > n (drop). The scale path
    * for huge n — a `limit(n)` plan funnels n rows through one task, this
    * funnels none. Exposed package-private so specs can pin its equivalence
    * to the direct paths without a multi-million-row fixture.
    */
  private[graft] def sliceViaPositions(n: Int, keepFirst: Boolean): KFrame = {
    val pred = if (keepFirst) F.col(Pos) <= n else F.col(Pos) > n
    copyWith(ds = withPositions.filter(pred).drop(Pos), pivot = None,
      idsArePositions = false)
  }

  /** First n rows in frame order; Haskell `take` edge semantics
    * (n<=0 → empty, oversized → all) (`Combinator.hs:293-295`).
    *
    * Three plans by cost: ids-are-positions frames slice with a pure
    * distributed filter on the id (zero shuffle, ids stay positions);
    * display-sized n uses `limit(n)` (per-partition LocalLimit then one
    * n-row exchange); n beyond [[KFrame.DirectLimitThreshold]] switches to
    * [[sliceViaPositions]] so no single task ever materializes n rows.
    */
  def take(n: Int): KFrame =
    if (n <= 0) copyWith(ds = ds.filter(F.lit(false)), pivot = None)
    else if (idOrderIsFrameOrder && idsArePositions)
      copyWith(ds = ds.filter(F.col(RowId) <= n), pivot = None)
    else if (n <= DirectLimitThreshold)
      copyWith(ds = ds.orderBy(orderCols: _*).limit(n), pivot = None,
        idsArePositions = false)
    else sliceViaPositions(n, keepFirst = true)

  /** All but the first n rows. Same three-tier plan selection as [[take]];
    * the mid tier anti-joins against the first-n row ids with no broadcast
    * hint — AQE picks broadcast when the limit side is small and degrades to
    * a shuffle join otherwise (never a driver OOM).
    *
    * The mid tier evaluates the frame subtree TWICE in one plan (left side
    * + the limit), so it is sound only because every row-id assignment in
    * the engine is deterministic per plan instance: scan-level monotonic
    * ids ([[KFrame.wrap]]) and key-hash ids ([[aggregate]]) are pure
    * functions of stable inputs. A post-shuffle monotonically_increasing_id
    * here would differ between the two instances under AQE and drop the
    * wrong rows (FuzzChainSpec fuzznull chain #139).
    */
  def drop(n: Int): KFrame =
    if (n <= 0) copyWith(pivot = None)
    else if (idOrderIsFrameOrder && idsArePositions)
      copyWith(ds = ds.filter(F.col(RowId) > n), pivot = None,
        idsArePositions = false)
    else if (n <= DirectLimitThreshold) {
      val firstIds = ds.orderBy(orderCols: _*).limit(n).select(RowId)
      copyWith(ds = ds.join(firstIds, Seq(RowId), "left_anti"),
        pivot = None, idsArePositions = false)
    } else sliceViaPositions(n, keepFirst = false)

  /** Empty-frame crash parity (`Spec.lhs:32-50`): the reference's
    * `head/tail/init/last` crash on a row-empty frame, EXCEPT when the frame
    * is also column-empty — lazy evaluation never forces the index list of a
    * frame with no fields. So: error iff columns exist and no rows do.
    * (`ds.isEmpty` is a limit-1 probe, not a full scan.)
    */
  private def requireNonEmptyRows(op: String): Unit =
    if (dataColumns.nonEmpty && ds.isEmpty)
      throw new KevinException(s"$op: empty dataframe")

  /** Single first visible row; errors on a row-empty frame like the
    * reference's `Prelude.head` crash (`Spec.lhs:33`).
    */
  def head: KFrame = {
    requireNonEmptyRows("head")
    take(1)
  }

  def last: KFrame = {
    requireNonEmptyRows("last")
    copyWith(ds = ds.orderBy(flippedOrderCols: _*).limit(1), pivot = None,
      idsArePositions = false)
  }

  def tail: KFrame = {
    requireNonEmptyRows("tail")
    drop(1)
  }

  def init: KFrame = {
    requireNonEmptyRows("init")
    val lastId = ds.orderBy(flippedOrderCols: _*).limit(1).select(RowId)
    copyWith(ds = ds.join(F.broadcast(lastId), Seq(RowId), "left_anti"),
      pivot = None, idsArePositions = false)
  }

  /** Row count — pivot-aware: a pivoted frame reports its row-tree leaf
    * count (`Combinator.hs:278-291`).
    */
  def height: Long = pivot match {
    case Some(p) if p.rowFields.nonEmpty =>
      ds.select(p.rowFields.map(F.col): _*).distinct().count()
    case Some(_) => 1L
    case None => ds.count()
  }

  /** Column count — pivot-aware (column-tree leaf count when pivoted). */
  def width: Long = pivot match {
    case Some(p) if p.colFields.nonEmpty =>
      ds.select(p.colFields.map(F.col): _*).distinct().count()
    case Some(_) => 1L
    case None => dataColumns.length.toLong
  }

  /** `(width, height)` — reference order (`Spec.lhs:22` `size df -> (7, 13)`). */
  def size: (Long, Long) = (width, height)

  // ---- §2.7 combination ----------------------------------------------

  /** Vertical concat (UNION ALL) with strict column-set + traits equality
    * (order-insensitive; `Combinator.hs:317-337`); result columns in left
    * order, fresh row ids 1..n0+n1. Resets groups.
    *
    * Scale: the right side's ids shift by the left height, obtained from an
    * in-plan 1-row aggregate broadcast — no driver-side count job.
    */
  def append(other: KFrame): KFrame = {
    val leftSig = dataColumns.map(c => c -> traits(c)).sortBy(_._1)
    val rightSig = other.dataColumns.map(c => c -> other.traits(c)).sortBy(_._1)
    if (leftSig != rightSig)
      throw new KevinException("Can't append dataframes with different fields")
    // Order-carrying (non-contiguous) ids are enough: shifting the right
    // side past max(left id) preserves both orders and keeps them disjoint.
    // Only a pending logical sort forces a renumber; parquet-scale appends
    // of frame-ordered sides stay entirely inside Catalyst (no RDD hop).
    val l = if (idOrderIsFrameOrder) this else materializePositions
    val r = if (other.idOrderIsFrameOrder) other else other.materializePositions
    val hDF = l.ds.agg(F.coalesce(F.max(F.col(RowId)), F.lit(0L)).as(MeltH))
    val shifted = r.ds
      .crossJoin(F.broadcast(hDF))
      .withColumn(RowId, F.col(RowId) + F.col(MeltH))
      .drop(MeltH)
    val cols = (dataColumns :+ RowId).map(F.col)
    val positions = l.idsArePositions && r.idsArePositions
    copyWith(ds = l.ds.select(cols: _*).unionByName(shifted.select(cols: _*)),
      groups = Nil, groupSnapshot = None, pivot = None, ordering = Nil, rowIdAsc = true,
      idsArePositions = positions,
      idsMeaningful = positions && l.idsMeaningful && r.idsMeaningful)
  }

  /** Positional horizontal concat — the reference's non-relational `join`
    * (`Combinator.hs:339-360`): pairs row i with row i in current visible
    * order; requires equal heights. Realized as a sort-merge equi-join on
    * materialized positions. Resets groups. (Keyed relational joins live in
    * `graft.extras.Relational` as a capability upgrade.)
    *
    * Scale: the equal-height check is fused into the join itself — a
    * full-outer join whose unmatched rows raise the reference's
    * height-mismatch error at execution time (reference parity: its error
    * also fires lazily, when the frame is forced). No driver-side counts.
    */
  def zipColumns(other: KFrame): KFrame = {
    // same-name columns on both sides would emit a duplicate-name frame
    // (the reference's undefined TODO:4 hazard; every later reference to
    // the name is ambiguous) — same fail-fast contract as the keyed
    // joins' non-key-overlap check (found by FuzzChainSpec composition)
    val overlap = dataColumns.toSet intersect other.dataColumns.toSet
    if (overlap.nonEmpty)
      throw new KevinException(
        s"ambiguous columns on both zip sides: ${overlap.toSeq.sorted.mkString(", ")}")
    val l = materializePositions
    val r = other.materializePositions
    val lm = l.ds.withColumn(ZipL, F.lit(1))
    val rm = r.ds.withColumn(ZipR, F.lit(1))
    val joined = lm.join(rm, Seq(RowId), "full_outer")
    val guard = F.when(F.col(ZipL).isNull || F.col(ZipR).isNull,
      F.raise_error(F.lit("Can't join dataframes with different heights")))
      .otherwise(F.lit(1))
    val out = joined.filter(guard === 1).drop(ZipL, ZipR)
    copyWith(ds = out, groups = Nil, groupSnapshot = None, pivot = None, ordering = Nil,
      rowIdAsc = true, idsArePositions = true, idsMeaningful = true)
  }

  // ---- misc -----------------------------------------------------------

  /** Optional caching passthrough (SURVEY §4: the reference's shared
    * immutable columns map to lineage + optional `ds.cache()`): pin this
    * frame's data in executor memory for iterative reuse.
    */
  def cache(): KFrame = copyWith(ds = ds.cache())

  def unpersist(): KFrame = copyWith(ds = ds.unpersist())

  /** Driver-side pretty render (reference `Show DataFrame`,
    * `DataFrame.hs:94-180`): flat table with index column and group footer,
    * or full crosstab when pivoted; CJK-aware widths; discrete numbers
    * printed with 0 decimals. Collects the (display-sized) result.
    */
  def render(maxRows: Int = 1000): String = Render.render(this, maxRows)

  override def toString: String = render()

  /** Escape hatch: the underlying dataset without the hidden row id. */
  def toDF: DataFrame = ds.drop(RowId)

  /** The underlying dataset in frame order, without the hidden row id. */
  def toOrderedDF: DataFrame =
    ds.orderBy(orderCols: _*).drop(RowId)

  private def requireField(field: String): Unit =
    if (!ds.columns.contains(field))
      throw new KevinException(s"no such field: $field")

  private def requireFieldType(field: String, numeric: Boolean,
      err: String = "inconsistent type"): Unit = {
    val f = ds.schema.fields.find(_.name == field)
      .getOrElse(throw new KevinException(s"no such field: $field"))
    val isNum = f.dataType.isInstanceOf[NumericType]
    val isStr = f.dataType == StringType
    if (numeric && !isNum) throw new KevinException(s"$err: $field is not numeric")
    if (!numeric && !isStr) throw new KevinException(s"$err: $field is not text")
  }
}

object KFrame {
  /** Hidden row-identity column (SURVEY.md §1.3). */
  val RowId = "__row_id"
  /** Fixed melt output column names (`Combinator.hs:116-117`). */
  val Variable = "variable"
  val Value = "value"
  /** Default tuple-key separator for multi-column-field [[KFrame.pivotedWide]]
    * headers.
    */
  val WideHeaderSep = "|"

  /** Split a multi-column-field [[KFrame.pivotedWide]] header back into its
    * column-tree path (one segment per column field, in field order) — the
    * render-side inverse of the `concat_ws` tuple key. A header with fewer
    * segments than expected means a NULL column-field value was skipped by
    * `concat_ws` at pivot time (see [[KFrame.pivotedWide]]).
    */
  def splitWideHeader(header: String, sep: String = WideHeaderSep): Seq[String] =
    header.split(java.util.regex.Pattern.quote(sep), -1).toSeq

  /** Hidden scratch columns. */
  private[core] val MeltH = "__melt_h"
  private[core] val ZipL = "__zip_l"
  private[core] val Pos = "__pos"
  private[core] val ZipR = "__zip_r"

  /** Above this n, take/drop abandon `limit(n)`-shaped plans (whose
    * GlobalLimit funnels n rows through a single task) for the distributed
    * position computation in `sliceViaPositions`. ~4M rows ≈ a few hundred
    * MB through one task at worst — comfortably under executor memory;
    * anything bigger gets the shuffle-based plan.
    */
  private[graft] val DirectLimitThreshold: Int = 1 << 22

  /** Wrap an existing DataFrame, assigning contiguous row ids 1..n in its
    * current order (partition-offset zipWithIndex). Exact position ids, at
    * the price of leaving whole-stage codegen once at ingest — use
    * [[fromParquet]]/[[wrap]] for scan-heavy pipelines.
    */
  def fromDataFrame(df: DataFrame): KFrame =
    new KFrame(renumber(df), Nil, None, Nil, rowIdAsc = true,
      idsArePositions = true, idsMeaningful = true)

  /** Wrap a DataFrame with order-carrying (but non-contiguous) row ids from
    * `monotonically_increasing_id` — a pure projection, so the scan keeps
    * predicate pushdown, column pruning and whole-stage codegen. Ids
    * increase with (partition, offset) = source order. Positional reshapes
    * renumber lazily if and when they need exact positions.
    *
    * Id stability contract (see [[KFrame.drop]]): monotonic ids directly
    * over a SCAN are deterministic per plan instance (file splits are
    * planned, not AQE-adjusted). Wrapping a DataFrame that already
    * contains a shuffle would break that — ids could differ between two
    * instances of the subtree in one plan; use [[fromDataFrame]]
    * (renumbering) for such inputs.
    */
  def wrap(df: DataFrame): KFrame =
    new KFrame(df.withColumn(RowId, F.monotonically_increasing_id() + 1),
      Nil, None, Nil, rowIdAsc = true, idsArePositions = false,
      idsMeaningful = false)

  def fromParquet(spark: SparkSession, path: String): KFrame =
    wrap(spark.read.parquet(path))

  /** CSV ingest with the reference's schema/trait inference —
    * see [[CsvSource]].
    */
  def fromCsvFile(spark: SparkSession, path: String,
      strict: Boolean = true): KFrame =
    CsvSource.load(spark, path, strict)

  /** Append a contiguous 1..n long column named `name` in the frame's
    * current physical order via RDD zipWithIndex (one count job + a map;
    * metadata preserved). Deliberately NOT a `row_number() over ()` — that
    * would shuffle everything to one partition. Shared by [[renumber]]
    * (rewrites the row id) and the take/drop position slices (which keep
    * the row id and add a scratch position column).
    */
  private[core] def appendIndex(df: DataFrame, name: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(name, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Contiguous 1..n ids in current order (see [[appendIndex]]). */
  private[core] def renumber(df: DataFrame): DataFrame = {
    val noId = if (df.columns.contains(RowId)) df.drop(RowId) else df
    appendIndex(noId, RowId)
  }
}
