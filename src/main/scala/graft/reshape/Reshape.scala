package graft.reshape

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{GraftError, Sel, Tbl}

/** Reshaping verbs (tidyr family; siuba/dply/verbs.py:1919-2543 and
  * siuba/experimental/pivot/). All spec-building (name parsing, glue
  * templates) is driver-side string work; execution is a single generator
  * (explode-of-structs) or pivot per call — one shuffle at most, no
  * driver-side data loops, so every verb here scales with partitions.
  */
object Reshape {

  /** Typed NULL-fill applied ONLY to the pivot-created columns (tidyr fills
    * holes the reshape created, never pre-existing NAs in id columns).
    */
  private def fillAny(df: DataFrame, v: Any, cols: Seq[String]): DataFrame =
    v match {
      case d: Double     => df.na.fill(d, cols)
      case f: Float      => df.na.fill(f.toDouble, cols)
      case i: Int        => df.na.fill(i.toLong, cols)
      case l: Long       => df.na.fill(l, cols)
      case s: Short      => df.na.fill(s.toLong, cols)
      case b: Byte       => df.na.fill(b.toLong, cols)
      case s: String     => df.na.fill(s, cols)
      case b: Boolean    => df.na.fill(b, cols)
      case bd: BigDecimal => df.na.fill(bd.toDouble, cols)
      case other         => df.na.fill(other.toString, cols)
    }

  /** Common type for a set of columns being stacked into one: identical
    * types are kept, mixed integrals widen to long (lossless — a double
    * would silently drop bits above 2^53), integral+fractional mixes widen
    * to double, anything else raises.
    */
  private def commonType(fields: Seq[(String, org.apache.spark.sql.types.DataType)],
                         cols: Seq[String], what: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, DoubleType, NumericType, DataType}
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val dts = cols.flatMap(c => fields.collectFirst { case (n, dt) if n == c => dt }).distinct
    if (dts.size == 1) dts.head
    else if (dts.forall(integral)) LongType
    else if (dts.forall(_.isInstanceOf[NumericType])) DoubleType
    else throw GraftError(
      s"$what: value columns mix incompatible types (${dts.mkString(", ")}); cast them to a common type first")
  }

  // ---- gather / spread ----------------------------------------------------

  /** Wide→long over the selected columns (pd.melt; verbs.py:1919-2000).
    * One generator projection — no shuffle. Values take the selected
    * columns' common type (identical types pass through untouched, mixed
    * integrals widen to long, integral+fractional mixes to double, anything
    * else raises loudly) — the old unconditional double cast silently
    * NULLed strings and dropped long precision.
    */
  def gather(t: Tbl, key: String, value: String, sel: Seq[Sel],
             dropNa: Boolean = false): Tbl = {
    val valueCols = Sel.resolveT(t.typedFields, sel).map(_._2)
    val idCols = t.cols.filterNot(valueCols.contains)
    val vt = commonType(t.typedFields, valueCols, "gather")
    val entries = valueCols.map { c =>
      struct(lit(c).as(key), col(c).cast(vt).as(value))
    }
    val exploded = t.df
      .select(idCols.map(col) :+ explode(array(entries: _*)).as("__kv"): _*)
      .select(idCols.map(col) ++ Seq(col(s"__kv.$key"), col(s"__kv.$value")): _*)
    val out = if (dropNa) exploded.filter(col(value).isNotNull) else exploded
    Tbl(out, t.groups, Nil)
  }

  /** Wide→long preserving the value columns' common type (no double cast). */
  def gatherTyped(t: Tbl, key: String, value: String, sel: Seq[Sel],
                  dropNa: Boolean = false): Tbl = {
    val valueCols = Sel.resolveT(t.typedFields, sel).map(_._2)
    val idCols = t.cols.filterNot(valueCols.contains)
    val entries = valueCols.map { c => struct(lit(c).as(key), col(c).as(value)) }
    val exploded = t.df
      .select(idCols.map(col) :+ explode(array(entries: _*)).as("__kv"): _*)
      .select(idCols.map(col) ++ Seq(col(s"__kv.$key"), col(s"__kv.$value")): _*)
    val out = if (dropNa) exploded.filter(col(value).isNotNull) else exploded
    Tbl(out, t.groups, Nil)
  }

  /** Long→wide: key values become columns (unstack; verbs.py:2013-2082).
    * `keyValues` pins the output columns without a discovery job — pass it
    * at scale; omitted, Spark collects distinct keys first (extra job).
    */
  def spread(t: Tbl, key: String, value: String, fill: Option[Any] = None,
             keyValues: Seq[String] = Nil): Tbl = {
    val idCols = t.cols.filterNot(c => c == key || c == value)
    val grouped = t.df.groupBy(idCols.map(col): _*)
    val piv = if (keyValues.nonEmpty) grouped.pivot(key, keyValues) else grouped.pivot(key)
    val out = piv.agg(first(col(value)))
    val pivotCols = out.columns.toSeq.filterNot(idCols.contains)
    val filled = fill.map(fillAny(out, _, pivotCols)).getOrElse(out)
    Tbl(filled, t.groups, Nil)
  }

  // ---- pivot_longer / pivot_wider ----------------------------------------

  /** General gather (siuba/experimental/pivot/pivot_long.py:45-170):
    * `namesTo` may be multiple parts split by `namesSep` or captured by
    * `namesPattern`; the special token ".value" keeps that name-part wide
    * (its values become output columns); `namesPrefix` is stripped first.
    *
    * `namesTransform` (pivot_long.py:57,184): per name-part coercion applied
    * to the part's literal value — e.g. `"wk" -> (_.cast("int"))` turns a
    * name part parsed from column names into a typed key column.
    * `valuesTransform` (pivot_long.py:241): per value-column coercion
    * applied to the stacked values, keyed by output column (`valuesTo`, or
    * the `.value`-derived names); when present for a column it REPLACES the
    * common-type unification — the in-call escape hatch for mixed-type
    * pivots that would otherwise (correctly) raise.
    */
  def pivotLonger(t: Tbl, sel: Seq[Sel], namesTo: Seq[String],
                  valuesTo: String = "value", namesSep: Option[String] = None,
                  namesPattern: Option[String] = None, namesPrefix: Option[String] = None,
                  valuesDropNa: Boolean = false,
                  namesRepair: String = "check_unique",
                  namesTransform: Map[String, Column => Column] = Map.empty,
                  valuesTransform: Map[String, Column => Column] = Map.empty): Tbl = {
    val valueCols = Sel.resolveT(t.typedFields, sel).map(_._2)
    val idCols = t.cols.filterNot(valueCols.contains)

    // names_repair (tidyr pivot_long.py name-repair strategies):
    // "check_unique" raises on an output name colliding with an id column;
    // "unique" deduplicates with a _k suffix (tidyr's "...k" would break
    // Spark's dotted column resolution — documented divergence)
    def repair(outNames: Seq[String]): Map[String, String] = namesRepair match {
      case "check_unique" =>
        outNames.find(idCols.contains).foreach(c => throw GraftError(
          s"pivot_longer: output name '$c' collides with an id column " +
            "(names_repair=check_unique; use names_repair=unique to suffix)"))
        outNames.map(c => c -> c).toMap
      case "unique" =>
        outNames.map { c =>
          if (!idCols.contains(c)) c -> c
          else {
            var k = 1
            var nm = s"${c}_$k"
            while (idCols.contains(nm) || outNames.contains(nm)) { k += 1; nm = s"${c}_$k" }
            c -> nm
          }
        }.toMap
      case other => throw GraftError(
        s"pivot_longer: names_repair must be check_unique or unique, got '$other'")
    }

    // spec: column -> part values, driver-side string work only
    def parts(c: String): Seq[String] = {
      val stripped = namesPrefix.map(p => c.stripPrefix(p)).getOrElse(c)
      (namesSep, namesPattern) match {
        case (Some(sep), _) => stripped.split(java.util.regex.Pattern.quote(sep), -1).toSeq
        case (_, Some(pat)) =>
          val m = pat.r.findFirstMatchIn(stripped)
            .getOrElse(throw GraftError(s"pivot_longer: '$stripped' does not match $pat"))
          (1 to m.groupCount).map(m.group)
        case _ => Seq(stripped)
      }
    }
    val spec: Seq[(String, Seq[String])] = valueCols.map(c => c -> parts(c))
    spec.find(_._2.size != namesTo.size).foreach { case (c, p) =>
      throw GraftError(s"pivot_longer: column '$c' split into ${p.size} parts, names_to has ${namesTo.size}")
    }

    // name-part literal with optional per-part transform
    def nameLit(n: String, v: String): Column =
      namesTransform.get(n).map(_(lit(v))).getOrElse(lit(v))

    if (!namesTo.contains(".value")) {
      // unify to the selected columns' common type: identical types pass
      // through untouched (strings stay strings), mixed numerics widen to
      // double, anything else is a loud error — never a silent NULL-ing
      // cast. A values_transform for this column replaces the unification.
      val vCast: Column => Column = valuesTransform.getOrElse(valuesTo, {
        val vt = commonType(t.typedFields, valueCols, "pivot_longer")
        (c: Column) => c.cast(vt)
      })
      val entries = spec.map { case (c, ps) =>
        struct(namesTo.zip(ps).map { case (n, v) => nameLit(n, v).as(n) } :+
          vCast(col(c)).as(valuesTo): _*)
      }
      val rep = repair(namesTo :+ valuesTo)
      val out = t.df
        .select(idCols.map(col) :+ explode(array(entries: _*)).as("__kv"): _*)
        .select(idCols.map(col) ++
          (namesTo :+ valuesTo).map(n => col(s"__kv.$n").as(rep(n))): _*)
      Tbl(if (valuesDropNa) out.filter(col(rep(valuesTo)).isNotNull) else out,
          t.groups, Nil)
    } else {
      // .value: that part names the output column; remaining parts key rows
      val vIdx = namesTo.indexOf(".value")
      val keyParts = namesTo.zipWithIndex.filterNot(_._2 == vIdx).map(_._1)
      val combos = spec.map { case (_, ps) => ps.zipWithIndex.filterNot(_._2 == vIdx).map(_._1) }.distinct
      val valueNames = spec.map { case (_, ps) => ps(vIdx) }.distinct
      val bySpec = spec.map { case (c, ps) =>
        (ps.zipWithIndex.filterNot(_._2 == vIdx).map(_._1), ps(vIdx)) -> c
      }.toMap
      val entries = combos.map { combo =>
        struct(
          keyParts.zip(combo).map { case (n, v) => nameLit(n, v).as(n) } ++
          valueNames.map { vn =>
            val raw = bySpec.get((combo, vn)).map(c => col(c)).getOrElse(lit(null))
            valuesTransform.get(vn).map(_(raw)).getOrElse(raw).as(vn)
          }: _*)
      }
      val rep = repair(keyParts ++ valueNames)
      val out = t.df
        .select(idCols.map(col) :+ explode(array(entries: _*)).as("__kv"): _*)
        .select(idCols.map(col) ++
          (keyParts ++ valueNames).map(n => col(s"__kv.$n").as(rep(n))): _*)
      Tbl(out, t.groups, Nil)
    }
  }

  /** General spread (siuba/experimental/pivot/pivot_wide.py:98-527): multiple
    * `namesFrom` joined by `namesSep`; multiple `valuesFrom` prefix the value
    * column name; `valuesFn` aggregates duplicates (default first);
    * `valuesFill` fills holes. `namesVals` pins output columns for the
    * no-discovery-job scale path.
    */
  def pivotWider(t: Tbl, namesFrom: Seq[String], valuesFrom: Seq[String],
                 namesSep: String = "_", valuesFn: Column => Column = first(_),
                 valuesFill: Option[Any] = None,
                 namesVals: Seq[String] = Nil,
                 namesGlue: Option[String] = None,
                 valuesFnMap: Map[String, Column => Column] = Map.empty,
                 idColsOpt: Seq[String] = Nil,
                 idExpand: Boolean = false,
                 unusedFn: Map[String, Column => Column] = Map.empty,
                 namesExpand: Boolean = false,
                 namesVary: String = "fastest",
                 namesSort: Boolean = false): Tbl = {
    require(namesVary == "fastest" || namesVary == "slowest",
      s"names_vary must be fastest or slowest, got '$namesVary'")
    // explicit id_cols (tidyr): columns outside id/names/values are "unused" —
    // dropped, or summarized per id row when an unused_fn is given
    val idCols =
      if (idColsOpt.nonEmpty) idColsOpt
      else t.cols.filterNot(c => namesFrom.contains(c) || valuesFrom.contains(c))
    val unused = t.cols.filterNot(c =>
      idCols.contains(c) || namesFrom.contains(c) || valuesFrom.contains(c))
    val src = if (unused.isEmpty) t.df
              else t.df.select((idCols ++ namesFrom ++ valuesFrom).map(col): _*)
    val nameCol = if (namesFrom.size == 1) col(namesFrom.head).cast("string")
                  else concat_ws(namesSep, namesFrom.map(col): _*)
    val base = src.withColumn("__pw_name", nameCol)
    val grouped = base.groupBy(idCols.map(col): _*)
    // names_expand: output columns = cross product of each names_from
    // column's distinct values, so combinations absent from the data still
    // get a (filled) column — and the pivot skips its discovery job
    val pinned =
      if (namesVals.nonEmpty) namesVals
      else if (namesExpand)
        namesFrom
          .map(c => t.df.select(col(c).cast("string")).filter(col(c).isNotNull)
            .distinct().collect().map(_.getString(0)).toSeq.sorted)
          .reduce((a, b) => for (x <- a; y <- b) yield s"$x$namesSep$y")
      else Nil
    val piv = if (pinned.nonEmpty) grouped.pivot("__pw_name", pinned)
              else grouped.pivot("__pw_name")
    // per-column values_fn override (tidyr values_fn as a named list)
    def fnFor(v: String): Column => Column = valuesFnMap.getOrElse(v, valuesFn)
    var out =
      if (valuesFrom.size == 1) piv.agg(fnFor(valuesFrom.head)(col(valuesFrom.head)))
      else piv.agg(fnFor(valuesFrom.head)(col(valuesFrom.head)).as(valuesFrom.head),
                   valuesFrom.tail.map(v => fnFor(v)(col(v)).as(v)): _*)
    // --- output column naming & ordering (pivot_wide.py:106-107,144-146) --
    // Spark's multi-agg pivot emits "{pivotval}_{valueAlias}" in pivot-major
    // order; tidyr's contract is "{value}{names_sep}{pivotval}" varying
    // names_from FASTEST by default ("slowest" interleaves the other way).
    // One driver-side select over the pivoted schema fixes names and order.
    val rawValueCols = out.columns.toSeq.filterNot(idCols.contains)
    def splitRaw(c: String): (String, String) =     // -> (pivotVal, valueCol)
      if (valuesFrom.size == 1) (c, valuesFrom.head)
      else valuesFrom.filter(v => c.endsWith("_" + v)).sortBy(-_.length)
        .headOption.map(v => (c.dropRight(v.length + 1), v))
        .getOrElse((c, valuesFrom.head))
    val parsed = rawValueCols.map(c => (c, splitRaw(c)))
    // names_sort=false keeps the pinned list's given order (the analog of
    // tidyr's first-appearance default on an unordered frame); discovered
    // names arrive sorted from Spark's pivot either way
    val pvOrder0 = if (pinned.nonEmpty) pinned else parsed.map(_._2._1).distinct
    val pvOrder = if (namesSort) pvOrder0.sorted else pvOrder0
    val pvIdx = pvOrder.zipWithIndex.toMap
    val vIdx = valuesFrom.zipWithIndex.toMap
    val orderedParsed =
      if (namesVary == "slowest")
        parsed.sortBy { case (_, (pv, v)) =>
          (pvIdx.getOrElse(pv, Int.MaxValue), vIdx(v)) }
      else
        parsed.sortBy { case (_, (pv, v)) =>
          (vIdx(v), pvIdx.getOrElse(pv, Int.MaxValue)) }
    def finalName(pv: String, v: String): String = namesGlue match {
      // "{name}" = pivot key, "{.value}" = value column, as in the
      // reference's glue naming
      case Some(glue) => glue.replace("{name}", pv).replace("{.value}", v)
      case None => if (valuesFrom.size == 1) pv else s"$v$namesSep$pv"
    }
    def rawCol(c: String): Column = col("`" + c.replace("`", "``") + "`")
    out = out.select(idCols.map(col) ++ orderedParsed.map {
      case (raw, (pv, v)) => rawCol(raw).as(finalName(pv, v)) }: _*)
    // pivot-created value columns, captured before unused/expand join-backs so
    // values_fill never touches unused summaries or pre-existing id NAs
    val pivotCols = out.columns.toSeq.filterNot(idCols.contains)
    // unused_fn: summarize the dropped columns per id row, join back (tidyr's
    // unused_fn); one extra hash aggregate + an id-key join, both shuffle on
    // the same id keys so AQE/Exchange reuse keeps it one pass at scale
    if (unusedFn.nonEmpty) {
      val aggs = unusedFn.toSeq.map { case (c, f) => f(col(c)).as(c) }
      val ua = t.df.groupBy(idCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      out = out.join(ua, idCols, "left")
    }
    // id_expand: cross the per-column distinct id values so every combination
    // appears as a row even when absent from the data (tidyr id_expand);
    // holes are filled by values_fill below
    if (idExpand) {
      val grid = idCols.map(c => t.df.select(col(c)).distinct())
        .reduce(_.crossJoin(_)).alias("__g")
      // null-safe keys: NA id values are legitimate grid members (tidyr
      // crosses NA too) and must still match their pivoted rows
      val o = out.alias("__o")
      val cond = idCols.map(c => col(s"__g.$c") <=> col(s"__o.$c")).reduce(_ && _)
      val rest = out.columns.filterNot(idCols.contains).toSeq
      out = grid.join(o, cond, "left")
        .select(idCols.map(c => col(s"__g.$c").as(c)) ++
                rest.map(c => col(s"__o.$c")): _*)
    }
    val filled = valuesFill.map(fillAny(out, _, pivotCols)).getOrElse(out)
    Tbl(filled, t.groups, Nil)
  }

  // ---- nest / unnest ------------------------------------------------------

  /** Pack selected cols into a per-group array-of-structs column
    * (verbs.py:1414-1485). The reference notes its pandas version "does not
    * scale well to many groups (50k+)"; this is one hash aggregation —
    * scales with partitions.
    */
  def nest(t: Tbl, sel: Seq[Sel], key: String = "data"): Tbl = {
    val inner = Sel.resolveT(t.typedFields, sel).map(_._2)
    val rest = t.cols.filterNot(inner.contains)
    val out = t.df.groupBy(rest.map(col): _*)
      .agg(collect_list(struct(inner.map(col): _*)).as(key))
    Tbl(out, t.groups, Nil)
  }

  /** Explode a nested array-of-structs column back to rows (verbs.py:1492-1535). */
  def unnest(t: Tbl, key: String): Tbl = {
    val rest = t.cols.filterNot(_ == key)
    val out = t.df
      .select(rest.map(col) :+ explode(col(key)).as("__un"): _*)
      .select(rest.map(col) :+ col("__un.*"): _*)
    Tbl(out, t.groups, Nil)
  }

  // ---- separate / unite / extract ----------------------------------------

  /** One-pass generic type inference for string pieces (the reference's
    * `convert=True` / pandas type.convert): each piece column that is
    * all-integer casts to long, all-numeric to double, anything else stays
    * string. One narrow aggregate scan covers every piece at once —
    * data-dependent typing costs exactly one extra job regardless of k.
    */
  private def inferCasts(df: DataFrame, pieces: Seq[Column]): Seq[Column => Column] = {
    val intRe = "^-?\\d+$"
    val numRe = "^-?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"
    val probe = df.select(pieces.flatMap { p =>
      Seq(max(when(p.isNotNull && !p.rlike(intRe), 1).otherwise(0)),
          max(when(p.isNotNull && !p.rlike(numRe), 1).otherwise(0)))
    }: _*).head()
    pieces.indices.map { i =>
      val nonInt = probe.isNullAt(2 * i) || probe.getInt(2 * i) == 1
      val nonNum = probe.isNullAt(2 * i + 1) || probe.getInt(2 * i + 1) == 1
      if (!nonInt) (p: Column) => p.cast("long")
      else if (!nonNum) (p: Column) => p.cast("double")
      else identity[Column] _
    }
  }

  /** Split a string column by a regex into k columns (verbs.py:2284-2398).
    * `extra="merge"` keeps the tail in the last piece; `extra="drop"` /
    * `"warn"` truncate it (the warn diagnostic is the opt-in
    * `separateExtraCount` — an implicit per-call warning pass would double
    * the scan at scale). `fill="right"` (default) leaves trailing pieces
    * NULL when the split is short; `fill="left"` aligns short splits to the
    * last columns, NULLing the leading ones. `convert` infers each result
    * column's type in one narrow aggregate pass (all-integer → long,
    * all-numeric → double, else string), like the reference's
    * type.convert — data-dependent typing costs exactly one extra scan.
    */
  def separate(t: Tbl, c: String, into: Seq[String], sep: String = "[^A-Za-z0-9]+",
               remove: Boolean = true, convert: Boolean = false,
               extra: String = "warn", fill: String = "right"): Tbl = {
    if (!Set("warn", "drop", "merge")(extra))
      throw GraftError(s"separate: extra must be warn/drop/merge, got '$extra'")
    if (!Set("right", "left")(fill))
      throw GraftError(s"separate: fill must be right/left, got '$fill'")
    val limit = if (extra == "merge") into.size else -1
    val sp = split(col(c), sep, limit)
    val k = into.size
    // get() is null-safe out of bounds — pandas fills missing pieces with
    // NaN; ANSI getItem would error instead. fill="left" right-aligns short
    // splits (negative index → NULL for the leading columns).
    def rawPiece(i: Int): Column = {
      val idx =
        if (fill == "left") when(size(sp) < k, size(sp) - lit(k) + lit(i)).otherwise(lit(i))
        else lit(i)
      get(sp, idx)
    }
    val casts: Seq[Column => Column] =
      if (!convert) Seq.fill(k)(identity)
      else inferCasts(t.df, (0 until k).map(rawPiece))
    val pieces = into.zipWithIndex.map { case (n, i) => casts(i)(rawPiece(i)).as(n) }
    val keep = t.cols.filterNot(x => remove && x == c)
    Tbl(t.df.select(keep.map(col) ++ pieces: _*), t.groups, Nil)
  }

  /** tidyr `separate_rows` — on the reference's own TODO list
    * (siuba/dply/verbs.py:47) and unimplemented there: split `c` on `sep`
    * and emit one row per piece, other columns repeated. `convert` reuses
    * separate's one-pass type inference over the exploded pieces. An empty
    * or NULL value keeps its row with a NULL piece (explode_outer), the
    * tidyr `keep_empty = TRUE` shape that loses no rows.
    */
  def separateRows(t: Tbl, c: String, sep: String = "[^A-Za-z0-9]+",
                   convert: Boolean = false): Tbl = {
    val exploded = t.df.withColumn(c,
      explode_outer(when(col(c).isNotNull, split(col(c), sep))))
    val out =
      if (!convert) exploded
      else {
        val cast = inferCasts(exploded, Seq(col(c))).head
        exploded.withColumn(c, cast(col(c)))
      }
    Tbl(out, t.groups, Nil)
  }

  /** The reference's `extra="warn"` diagnostic as an explicit call: rows
    * whose split yields more than `into.size` pieces (silently truncated by
    * `separate`). Opt-in because it is a full scan — at 100 TB a hidden
    * warning pass per verb call would double the read; run it once on a
    * sample or behind a validation stage instead.
    */
  def separateExtraCount(t: Tbl, c: String, into: Seq[String],
                         sep: String = "[^A-Za-z0-9]+"): Long =
    t.df.filter(size(split(col(c), sep, -1)) > into.size).count()

  /** Concat columns into one string column (verbs.py:2413-2471). NULL parts
    * are skipped (concat_ws), a documented divergence from pandas' "nan"
    * stringification.
    */
  def unite(t: Tbl, newCol: String, sel: Seq[Sel], sep: String = "_",
            remove: Boolean = true): Tbl = {
    val src = Sel.resolveT(t.typedFields, sel).map(_._2)
    val keep = t.cols.filterNot(x => remove && src.contains(x))
    Tbl(t.df.select(keep.map(col) :+ concat_ws(sep, src.map(col): _*).as(newCol): _*),
        t.groups, Nil)
  }

  /** Regex capture groups → columns (verbs.py:2476-2543). Non-matching rows
    * yield NULL (pandas str.extract semantics), via a match guard.
    * `convert` runs the same generic one-pass inference as [[separate]]:
    * all-integer captures → long, all-numeric → double, else string (the
    * reference's convert is generic for both verbs).
    */
  def extract(t: Tbl, c: String, into: Seq[String],
              regex: String = "(\\w+)", remove: Boolean = true,
              convert: Boolean = false): Tbl = {
    val matches = col(c).rlike(regex)
    def rawPiece(i: Int): Column = when(matches, regexp_extract(col(c), regex, i + 1))
    val casts: Seq[Column => Column] =
      if (!convert) Seq.fill(into.size)(identity)
      else inferCasts(t.df, into.indices.map(rawPiece))
    val pieces = into.zipWithIndex.map { case (n, i) => casts(i)(rawPiece(i)).as(n) }
    val keep = t.cols.filterNot(x => remove && x == c)
    Tbl(t.df.select(keep.map(col) ++ pieces: _*), t.groups, Nil)
  }

  // ---- expand / complete --------------------------------------------------

  /** Cartesian product of the distinct values of each column
    * (verbs.py:2113-2182). Per-column distincts are tiny relations; the
    * cross join multiplies them — intended for low-cardinality key grids.
    */
  def expand(t: Tbl, cols: Seq[String]): Tbl =
    expandNesting(t, cols.map(Seq(_)))

  /** expand with tidyr `nesting()` groups (verbs.py:2113-2182 note): each
    * group crosses as a UNIT of its observed combinations — one distinct()
    * over the column tuple — instead of the full per-column cross. A
    * single-column group is the plain distinct, so
    * `expandNesting(t, Seq(Seq("a","b"), Seq("c")))` is tidyr's
    * `expand(df, nesting(a, b), c)`.
    */
  def expandNesting(t: Tbl, groups: Seq[Seq[String]]): Tbl = {
    val uniques = groups.map(g => t.df.select(g.map(col): _*).distinct())
    Tbl(uniques.reduce(_.crossJoin(_)), t.groups, Nil)
  }

  /** expand + left-join original + fill NAs (verbs.py:2185-2279).
    * `explicitFill = false` fills ONLY the NAs created by the join (rows
    * absent from the original), leaving pre-existing NAs alone — the
    * reference's merge-indicator behavior.
    */
  def complete(t: Tbl, cols: Seq[String], fill: Map[String, Any] = Map.empty,
               explicitFill: Boolean = true): Tbl =
    completeNesting(t, cols.map(Seq(_)), fill, explicitFill)

  /** complete with tidyr `nesting()` groups — the grid crosses each group's
    * observed combinations (see [[expandNesting]]) before the join-back.
    */
  def completeNesting(t: Tbl, groups: Seq[Seq[String]],
                      fill: Map[String, Any] = Map.empty,
                      explicitFill: Boolean = true): Tbl = {
    val cols = groups.flatten
    val grid = expandNesting(t, groups)
    val marked =
      if (explicitFill) t.df
      else t.df.withColumn("__present", lit(true))
    val joined = grid.join(Tbl(marked), cols.map(k => k -> k), "left")
    val filled = fill.foldLeft(joined.df) { case (acc, (c, v)) =>
      if (explicitFill) acc.withColumn(c, coalesce(col(c), lit(v)))
      else acc.withColumn(c,
        when(col("__present").isNull, coalesce(col(c), lit(v))).otherwise(col(c)))
    }
    Tbl(if (explicitFill) filled else filled.drop("__present"), t.groups, Nil)
  }
}
