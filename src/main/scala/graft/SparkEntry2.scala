package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Fns, Vec}
import graft.reshape.Reshape
import graft.cats.Forcats
import graft.text.{Search, TextFns, UrlFns}
import graft.ml.{Dedup, Fuzzy, Similarity}
import graft.multimodal.Multimodal

/** SparkEntry part 2: reshape (§2.8), scalar families (§2.9), forcats, and
  * the training-data pipeline extensions (dedup / similarity / text /
  * multimodal). Same aliasing + rounding conventions as part 1.
  */
object SparkEntry2 {

  private def t(s: SparkSession, dir: String, name: String): Tbl =
    SparkEntry.readTable(s, dir, name)

  private def scratchPath(dir: String, name: String): String =
    SparkEntry.scratchPath(dir, name)

  /** DuckDB replica of the v1→v2 manifest diff — shared VERBATIM by
    * `q_manifest_diff` (the diff verb itself) and `q_shard_resync` (the
    * incremental re-export, whose receipt IS this diff). */
  private val manifestDiffOracleSql: String =
    """WITH base AS (SELECT doc_id, text, doc_id // 20 AS shard
      |  FROM documents),
      |v1 AS (SELECT * FROM base WHERE shard % 7 <> 0),
      |v2 AS (SELECT doc_id, shard,
      |    CASE WHEN shard % 5 = 1 AND doc_id % 3 = 0
      |      THEN text || ' rev2' ELSE text END AS text
      |  FROM base
      |  WHERE shard % 9 <> 0 AND NOT (shard % 5 = 2 AND doc_id % 13 = 0)),
      |m1 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(sum(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens,
      |    bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) AS fp
      |  FROM v1 GROUP BY 1),
      |m2 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(sum(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens,
      |    bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) AS fp
      |  FROM v2 GROUP BY 1)
      |SELECT coalesce(m1.shard, m2.shard) AS shard,
      |  CASE WHEN m1.fp IS NULL THEN 'added'
      |       WHEN m2.fp IS NULL THEN 'removed'
      |       WHEN m1.fp = m2.fp AND m1.n_rows = m2.n_rows
      |            AND m1.n_tokens IS NOT DISTINCT FROM m2.n_tokens
      |         THEN 'unchanged'
      |       ELSE 'changed' END AS status,
      |  m1.n_rows AS n_rows_old, m2.n_rows AS n_rows_new,
      |  m1.n_tokens AS n_tokens_old, m2.n_tokens AS n_tokens_new
      |FROM m1 FULL OUTER JOIN m2 ON m1.shard = m2.shard""".stripMargin

  import SparkEntry.Q

  // ======================================================================
  // Reshape (SURVEY §2.8)
  // ======================================================================

  private val reshapeQueries: Map[String, Q] = Map(
    "q_gather" -> ((s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .summarize("sum_qty"  -> round(sum(col("l_quantity")), 2),
                   "sum_disc" -> round(sum(col("l_discount")), 2))
      Reshape.gather(wide, "stat", "val",
        Seq(Sel.Name("sum_qty"), Sel.Name("sum_disc"))).df
    }),

    "q_spread" -> ((s, dir) => {
      val counts = t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .summarize("n" -> Fns.Agg.n())
      Reshape.spread(counts, "l_linestatus", "n", keyValues = Seq("F", "O"))
        .mutate("F" -> col("F").cast("long"), "O" -> col("O").cast("long"))
        .df
    }),

    "q_pivot_longer" -> ((s, dir) => {
      val wide = t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .summarize("bal_avg" -> (round(sum(col("c_acctbal")), 2) / count(col("c_acctbal"))),
                   "bal_max" -> round(max(col("c_acctbal")), 2),
                   "bal_min" -> round(min(col("c_acctbal")), 2))
      Reshape.pivotLonger(wide, Seq(Sel.startsWith("bal_")),
        namesTo = Seq("stat"), valuesTo = "value",
        namesPrefix = Some("bal_")).df
    }),

    "q_pivot_wider" -> ((s, dir) => {
      val et = Seq("click", "error", "purchase", "signup", "view")
      Reshape.pivotWider(
        t(s, dir, "events").select(Seq("user_id", "event_type", "value"): _*),
        namesFrom = Seq("event_type"), valuesFrom = Seq("value"),
        // robust mean: round the sum first, then divide (see SparkEntry notes)
        valuesFn = c => when(count(c) > 0, round(sum(c), 2) / count(c)),
        namesVals = et).df
    }),

    "q_pivot_wider_idexpand" -> ((s, dir) => {
      // high-price orders leave a sparse status x priority grid (11/15 cells
      // at sf0.01); id_expand restores the full grid, values_fill plugs holes.
      // Year list pinned so the plan (and oracle) is identical at every sf.
      val f = t(s, dir, "orders")
        .filter(col("o_totalprice") > 499000)
        .mutate("oyear" -> year(col("o_orderdate")))
        .select(Seq("o_orderstatus", "o_orderpriority", "oyear", "o_totalprice"): _*)
      Reshape.pivotWider(f,
        namesFrom = Seq("oyear"), valuesFrom = Seq("o_totalprice"),
        valuesFn = c => round(sum(c), 2),
        valuesFill = Some(0.0),
        namesVals = (1995 to 2001).map(_.toString),
        idExpand = true).df
    }),

    "q_nest_unnest" -> ((s, dir) => {
      // round-trip: nest lineitem per order, unnest back, re-aggregate
      val nested = Reshape.nest(
        t(s, dir, "lineitem").select(Seq("l_orderkey", "l_linenumber", "l_quantity"): _*),
        Seq(Sel.Name("l_linenumber"), Sel.Name("l_quantity")), key = "items")
      Reshape.unnest(nested, "items")
        .summarize("n" -> Fns.Agg.n(), "sum_qty" -> round(sum(col("l_quantity")), 2))
        .df
    }),

    "q_separate" -> ((s, dir) =>
      Reshape.separate(t(s, dir, "part"), "p_name",
        into = Seq("t1", "t2", "t3"), sep = " ")
        .select(Seq("p_partkey", "t1", "t2", "t3"): _*)
        .df),

    "q_separate_rows" -> ((s, dir) =>
      Reshape.separateRows(
        t(s, dir, "part").select(Seq("p_partkey", "p_name"): _*),
        "p_name", sep = " ").df),

    "q_tally" -> ((s, dir) =>
      t(s, dir, "orders").groupBy("o_orderpriority")
        .tally(wt = Some(col("o_totalprice")), sort = true)
        .mutate("n" -> round(col("n"), 2))
        .df),

    "q_unite" -> ((s, dir) =>
      Reshape.unite(t(s, dir, "part"), "brand_type",
        Seq(Sel.Name("p_brand"), Sel.Name("p_type")), sep = "|")
        .select(Seq("p_partkey", "brand_type"): _*)
        .df),

    "q_extract" -> ((s, dir) =>
      Reshape.extract(t(s, dir, "part"), "p_brand",
        into = Seq("brand_no"), regex = "Brand#(\\d+)", convert = true)
        .select(Seq("p_partkey", "brand_no"): _*)
        .df),

    "q_expand_complete" -> ((s, dir) => {
      val sub = t(s, dir, "lineitem").filter(col("l_quantity") <= 2)
      Reshape.complete(
        sub.count(extra = Seq("l_returnflag", "l_linestatus")),
        Seq("l_returnflag", "l_linestatus"), fill = Map("n" -> 0L)).df
    })
  )

  private val reshapeOracle: Map[String, String] = Map(
    "q_gather" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus,
        |    round(sum(l_quantity), 2) AS sq, round(sum(l_discount), 2) AS sd
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, 'sum_qty' AS stat, sq AS val FROM a
        |UNION ALL
        |SELECT l_returnflag, l_linestatus, 'sum_disc' AS stat, sd AS val FROM a""".stripMargin,
    "q_spread" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_pivot_longer" ->
      """WITH a AS (SELECT c_mktsegment,
        |    round(sum(c_acctbal), 2) / count(c_acctbal) AS avg_v,
        |    round(max(c_acctbal), 2) AS max_v,
        |    round(min(c_acctbal), 2) AS min_v
        |  FROM customer GROUP BY 1)
        |SELECT c_mktsegment, 'avg' AS stat, avg_v AS value FROM a
        |UNION ALL SELECT c_mktsegment, 'max' AS stat, max_v FROM a
        |UNION ALL SELECT c_mktsegment, 'min' AS stat, min_v FROM a""".stripMargin,
    "q_pivot_wider" ->
      """SELECT user_id,
        |  round(sum(value) FILTER (WHERE event_type = 'click'), 2)
        |    / count(value) FILTER (WHERE event_type = 'click') AS click,
        |  round(sum(value) FILTER (WHERE event_type = 'error'), 2)
        |    / count(value) FILTER (WHERE event_type = 'error') AS error,
        |  round(sum(value) FILTER (WHERE event_type = 'purchase'), 2)
        |    / count(value) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  round(sum(value) FILTER (WHERE event_type = 'signup'), 2)
        |    / count(value) FILTER (WHERE event_type = 'signup') AS signup,
        |  round(sum(value) FILTER (WHERE event_type = 'view'), 2)
        |    / count(value) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1""".stripMargin,
    "q_pivot_wider_idexpand" ->
      """WITH f AS (
        |  SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS oyear,
        |         o_totalprice
        |  FROM orders WHERE o_totalprice > 499000),
        |grid AS (
        |  SELECT s.o_orderstatus, p.o_orderpriority
        |  FROM (SELECT DISTINCT o_orderstatus FROM f) s
        |  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM f) p),
        |a AS (
        |  SELECT o_orderstatus, o_orderpriority, oyear,
        |         round(sum(o_totalprice), 2) AS v
        |  FROM f GROUP BY 1, 2, 3)
        |SELECT g.o_orderstatus, g.o_orderpriority,
        |  coalesce(max(v) FILTER (WHERE oyear = 1995), 0.0) AS "1995",
        |  coalesce(max(v) FILTER (WHERE oyear = 1996), 0.0) AS "1996",
        |  coalesce(max(v) FILTER (WHERE oyear = 1997), 0.0) AS "1997",
        |  coalesce(max(v) FILTER (WHERE oyear = 1998), 0.0) AS "1998",
        |  coalesce(max(v) FILTER (WHERE oyear = 1999), 0.0) AS "1999",
        |  coalesce(max(v) FILTER (WHERE oyear = 2000), 0.0) AS "2000",
        |  coalesce(max(v) FILTER (WHERE oyear = 2001), 0.0) AS "2001"
        |FROM grid g
        |LEFT JOIN a ON a.o_orderstatus = g.o_orderstatus
        |           AND a.o_orderpriority = g.o_orderpriority
        |GROUP BY 1, 2""".stripMargin,
    "q_nest_unnest" ->
      "SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty FROM lineitem",
    "q_separate" ->
      """SELECT p_partkey, nullif(split_part(p_name, ' ', 1), '') AS t1,
        |  nullif(split_part(p_name, ' ', 2), '') AS t2,
        |  nullif(split_part(p_name, ' ', 3), '') AS t3
        |FROM part""".stripMargin,
    "q_separate_rows" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS p_name
        |FROM part""".stripMargin,
    "q_tally" ->
      """SELECT o_orderpriority, round(sum(o_totalprice), 2) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q_unite" ->
      "SELECT p_partkey, p_brand || '|' || p_type AS brand_type FROM part",
    "q_extract" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_no
        |FROM part""".stripMargin,
    "q_expand_complete" ->
      """WITH sub AS (SELECT * FROM lineitem WHERE l_quantity <= 2),
        |  cnt AS (SELECT l_returnflag, l_linestatus, count(*) AS n FROM sub GROUP BY 1, 2),
        |  grid AS (SELECT l_returnflag, l_linestatus
        |           FROM (SELECT DISTINCT l_returnflag FROM sub)
        |           CROSS JOIN (SELECT DISTINCT l_linestatus FROM sub))
        |SELECT g.l_returnflag, g.l_linestatus, coalesce(c.n, 0) AS n
        |FROM grid g LEFT JOIN cnt c USING (l_returnflag, l_linestatus)""".stripMargin
  )

  // ======================================================================
  // String / datetime / across / forcats (SURVEY §2.9)
  // ======================================================================

  private val scalarQueries: Map[String, Q] = Map(
    "q_str_ops" -> ((s, dir) =>
      t(s, dir, "part")
        .mutate(
          "brand_up"  -> upper(col("p_brand")),
          "type_lo"   -> lower(col("p_type")),
          "name_len"  -> length(col("p_name")).cast("long"),
          "name_sub"  -> substring(col("p_name"), 1, 8),
          "cap"       -> Fns.Str.capitalize(col("p_type")),
          "joined"    -> Fns.Str.strC("|", col("p_brand"), col("p_type")),
          "has_green" -> col("p_name").contains("green"),
          "starts_std" -> col("p_type").startsWith("STANDARD"),
          "replaced"  -> regexp_replace(col("p_name"), " ", "_"),
          "padded"    -> lpad(col("p_brand"), 12, "*"),
          "trimmed"   -> trim(lit("  x  ")))
        .select(Seq("p_partkey", "brand_up", "type_lo", "name_len", "name_sub",
                    "cap", "joined", "has_green", "starts_std", "replaced",
                    "padded", "trimmed"): _*)
        .df),

    "q_dt_ops" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate(
          "y"    -> year(col("o_orderdate")).cast("long"),
          "m"    -> month(col("o_orderdate")).cast("long"),
          "d"    -> dayofmonth(col("o_orderdate")).cast("long"),
          "q"    -> quarter(col("o_orderdate")).cast("long"),
          "doy"  -> dayofyear(col("o_orderdate")).cast("long"),
          "dow0" -> Fns.Dt.dayofweekMon0(col("o_orderdate")).cast("long"),
          "wk"   -> weekofyear(col("o_orderdate")).cast("long"),
          "ld"   -> last_day(col("o_orderdate")),
          "mstart" -> Fns.Dt.floorDate(col("o_orderdate"), "month"),
          "is_me"  -> Fns.Dt.isMonthEnd(col("o_orderdate")),
          "dim"    -> Fns.Dt.daysInMonth(col("o_orderdate")).cast("long"))
        .select(Seq("o_orderkey", "y", "m", "d", "q", "doy", "dow0", "wk",
                    "ld", "mstart", "is_me", "dim"): _*)
        .df),

    // dt.to_period string labels at every supported freq + dt.total_seconds
    // on a timestamp difference (seconds since midnight). events.ts is
    // nanos-as-long (readTable canonicalizes); `div` keeps the ns→µs
    // conversion integral — double division loses precision above 2^53.
    "q_dt_period" -> ((s, dir) =>
      t(s, dir, "events")
        .mutate("ts2" -> expr("timestamp_micros(ts div 1000)"))
        .mutate(
          "p_y" -> Fns.Dt.toPeriod(col("ts2"), "Y"),
          "p_q" -> Fns.Dt.toPeriod(col("ts2"), "Q"),
          "p_m" -> Fns.Dt.toPeriod(col("ts2"), "M"),
          "p_w" -> Fns.Dt.toPeriod(col("ts2"), "W"),
          "p_d" -> Fns.Dt.toPeriod(col("ts2"), "D"),
          "sod" -> Fns.Dt.totalSeconds(col("ts2") - date_trunc("day", col("ts2"))))
        .select(Seq("event_id", "p_y", "p_q", "p_m", "p_w", "p_d", "sod"): _*)
        .df),

    "q_across" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").groupBy("l_returnflag")
      li.summarize(Across(li,
        Seq(Sel.Name("l_quantity"), Sel.Name("l_extendedprice"), Sel.Name("l_discount")),
        Seq("avg" -> (c => round(avg(c), 4)), "max" -> (c => max(c)))): _*).df
    }),

    "q_forcats_lump" -> ((s, dir) => {
      val lumped = Forcats.fctLump(
        t(s, dir, "documents").df, "source", n = 3)
      Tbl(lumped).count(extra = Seq("source")).df
    }),

    "q_forcats_recode" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate("prio" -> Forcats.fctCollapse(col("o_orderpriority"),
          Map("high" -> Seq("1-URGENT", "2-HIGH"), "mid" -> Seq("3-MEDIUM")),
          otherLevel = Some("low")))
        .count(extra = Seq("prio"))
        .df)
  )

  private val scalarOracle: Map[String, String] = Map(
    "q_str_ops" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_up,
        |  lower(p_type) AS type_lo,
        |  length(p_name) AS name_len,
        |  substr(p_name, 1, 8) AS name_sub,
        |  upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS cap,
        |  p_brand || '|' || p_type AS joined,
        |  contains(p_name, 'green') AS has_green,
        |  starts_with(p_type, 'STANDARD') AS starts_std,
        |  replace(p_name, ' ', '_') AS replaced,
        |  lpad(p_brand, 12, '*') AS padded,
        |  trim('  x  ') AS trimmed
        |FROM part""".stripMargin,
    "q_dt_ops" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  quarter(o_orderdate) AS q, dayofyear(o_orderdate) AS doy,
        |  isodow(o_orderdate) - 1 AS dow0, weekofyear(o_orderdate) AS wk,
        |  last_day(o_orderdate) AS ld,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  CAST(o_orderdate AS DATE) = last_day(o_orderdate) AS is_me,
        |  day(last_day(o_orderdate)) AS dim
        |FROM orders""".stripMargin,
    "q_dt_period" ->
      """SELECT event_id,
        |  strftime(ts, '%Y') AS p_y,
        |  strftime(ts, '%Y') || 'Q' || CAST(quarter(ts) AS VARCHAR) AS p_q,
        |  strftime(ts, '%Y-%m') AS p_m,
        |  strftime(date_trunc('week', ts), '%Y-%m-%d') || '/' ||
        |    strftime(date_trunc('week', ts) + INTERVAL 6 DAY, '%Y-%m-%d') AS p_w,
        |  strftime(ts, '%Y-%m-%d') AS p_d,
        |  epoch(ts - date_trunc('day', ts)) AS sod
        |FROM events""".stripMargin,
    "q_across" ->
      """SELECT l_returnflag,
        |  round(avg(l_quantity), 4) AS l_quantity_avg, max(l_quantity) AS l_quantity_max,
        |  round(avg(l_extendedprice), 4) AS l_extendedprice_avg,
        |  max(l_extendedprice) AS l_extendedprice_max,
        |  round(avg(l_discount), 4) AS l_discount_avg, max(l_discount) AS l_discount_max
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_forcats_lump" ->
      """WITH freq AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
        |  top3 AS (SELECT source FROM freq ORDER BY c DESC, source LIMIT 3)
        |SELECT CASE WHEN source IN (SELECT source FROM top3) THEN source
        |            ELSE 'Other' END AS source, count(*) AS n
        |FROM documents GROUP BY 1""".stripMargin,
    "q_forcats_recode" ->
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
        |            WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
        |            ELSE 'low' END AS prio, count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin
  )

  // ======================================================================
  // Training-data pipeline: text analysis, dedup, similarity, multimodal
  // ======================================================================

  private val pipelineQueries: Map[String, Q] = Map(
    "q_dedup_exact" -> ((s, dir) =>
      Tbl(Dedup.exact(t(s, dir, "documents").df, "doc_id", "text")).df),

    "q_repetition" -> ((s, dir) => {
      // Gopher repetition counts over a multi-line view of the corpus (the
      // synthetic docs are single-line word soup, so line/paragraph structure
      // is derived by swapping two frequent words for newline runs — the
      // chr(10)||chr(10) spelling parses identically in Spark SQL and
      // DuckDB, so both engines stat the same text). Output is exact
      // integers only: no float discipline needed (see RepetitionStats).
      val tx = expr(
        "replace(replace(text, ' table ', chr(10) || chr(10)), ' the ', chr(10))")
      t(s, dir, "documents").df
        .withColumn("st", TextFns.repetitionStats(tx))
        .select(col("doc_id") +:
          Seq("lines", "dup_lines", "line_chars", "dup_line_chars",
              "paras", "dup_paras", "para_chars", "dup_para_chars",
              "words", "chars",
              "top2gram_count", "top2gram_len", "top3gram_count",
              "top3gram_len", "top4gram_count", "top4gram_len",
              "dup5gram_chars", "dup8gram_chars")
            .map(f => col(s"st.$f").as(f)): _*)
    }),

    "q_text_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .mutate(
          "n_tok"  -> TextFns.tokenCount(col("text")).cast("long"),
          "punct"  -> TextFns.punctRatio(col("text")),
          "digits" -> TextFns.digitRatio(col("text")))
        .groupBy("lang")
        .summarize(
          "n"         -> Fns.Agg.n(),
          "avg_tok"   -> round(avg(col("n_tok")), 4),
          "avg_chars" -> round(avg(length(col("text"))), 4),
          "avg_punct" -> round(avg(col("punct")), 4),
          "avg_digit" -> round(avg(col("digits")), 4))
        .df),

    "q_token_counts" -> ((s, dir) =>
      t(s, dir, "documents")
        .mutate("n_ws"  -> TextFns.tokenCount(col("text")).cast("long"),
                "n_bpe" -> TextFns.bpeTokenCount(col("text")))
        .select(Seq("doc_id", "n_ws", "n_bpe"): _*)
        .df),

    "q_quality_score" -> ((s, dir) =>
      t(s, dir, "documents")
        .mutate("quality" -> TextFns.qualityScore(col("text")))
        .groupBy("lang")
        .summarize("n" -> Fns.Agg.n(), "avg_q" -> round(avg(col("quality")), 4))
        .df),

    "q_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .mutate("pred" -> TextFns.langId(col("text")))
        .count(extra = Seq("lang", "pred"))
        .df),

    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .mutate("fp" -> TextFns.fingerprint(col("text")))
        .select(Seq("doc_id", "fp"): _*)
        .df),

    "q_ngram_jaccard" -> ((s, dir) =>
      Tbl(Dedup.ngramJaccardPairs(t(s, dir, "documents").df, "doc_id", "text",
          n = 3, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 4))).df),

    // heavy hitters (Misra-Gries mergeable sketch): in the ≤k-distinct
    // regime the summary is the exact count table independent of
    // partitioning, so the sketch path itself is oracle-checkable; the
    // eviction regime is differential-tested in ScaleSpec on tokens
    "q_heavy_hitters" -> ((s, dir) =>
      t(s, dir, "documents").df
        .agg(Fns.Agg.heavyHitters(col("lang"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.est_count").as("est_count"))),

    // bigram LM quality score: per-doc mean add-one-smoothed bigram log
    // probability against counts from the corpus itself (perplexity filter)
    "q_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      TextFns.lmScore(docs, "doc_id", "text", docs, "text")
    }),

    // flagship curation chain, every stage deterministic and oracled as one
    // query: boilerplate strip -> token-count quality gate -> exact dedup
    // (first doc per fingerprint wins) -> benchmark decontamination ->
    // token-budget shard packing
    "q_curation_e2e" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val cleaned = docs
        .withColumn("ctext", TextFns.cleanText(col("text")))
        .withColumn("n_tok", TextFns.tokenCount(col("ctext")).cast("long"))
        .filter(col("n_tok") >= 5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy("doc_id")
      val deduped = cleaned
        .withColumn("fp", TextFns.fingerprint(col("ctext")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn", "fp")
      val bench = deduped.filter(col("doc_id") % 17 === 0)
      val scrubbed = Dedup.decontaminate(deduped, "doc_id", "ctext",
        bench, "ctext", n = 5, maxContaminatedFrac = 0.5)
      graft.ops.Scale.packByBudget(scrubbed, Seq(col("doc_id")),
          col("n_tok"), budget = 2000)
        .select(col("doc_id"), col("n_tok"), col("shard"))
    }),

    // boilerplate strip: synthetic tags/URLs injected deterministically
    "q_clean_text" -> ((s, dir) =>
      t(s, dir, "documents")
        .mutate("aug" -> concat(lit("<div class='x'>"), col("text"),
          lit("</div> see https://ex.org/p?id="), col("doc_id").cast("string"),
          lit(" <br/> end")))
        .mutate("clean" -> TextFns.cleanText(col("aug")))
        .select(Seq("doc_id", "clean"): _*).df),

    // PII scrub: synthetic identifiers injected deterministically from
    // doc_id (the raw corpus has none), then per-type redaction + counts
    "q_pii_redact" -> ((s, dir) =>
      t(s, dir, "documents")
        .mutate("aug" -> concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or +1 (555) 123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ip 10.1."), (col("doc_id") % 256).cast("string"),
          lit(".7 ssn 123-45-6789.")))
        .mutate("red" -> TextFns.redactPii(col("aug")),
                "pc"  -> TextFns.piiCounts(col("aug")))
        .mutate("n_email" -> col("pc.email"), "n_ssn" -> col("pc.ssn"),
                "n_phone" -> col("pc.phone"), "n_ipv4" -> col("pc.ipv4"))
        .select(Seq("doc_id", "red", "n_email", "n_ssn", "n_phone",
                    "n_ipv4"): _*)
        .df),

    // token-budget shard packing: contiguous greedy fill at 2000 tokens
    "q_pack_shards" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df
        .select(col("doc_id"),
                TextFns.tokenCount(col("text")).cast("long").as("n_tok"))
      graft.ops.Scale.packByBudget(sized, Seq(col("doc_id")), col("n_tok"),
          budget = 2000)
        .select(col("doc_id"), col("n_tok"), col("shard"))
    }),

    // rows_upsert: patch priorities for keys % 97 == 0 and insert the same
    // set re-keyed (+1e7); the patch omits o_totalprice, so updates keep the
    // target's value and inserts get NULL — the dplyr rows_* contract
    // pandas ewm(alpha=0.5).mean(), adjust=false: the oracle replays the
    // SAME sequential recursion via a recursive CTE — identical IEEE ops in
    // identical order are bit-exact, so the raw doubles hash-match with no
    // rounding at all
    "q_ewm" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate("cents" -> round(col("o_totalprice") * 100, 0).cast("bigint"))
        .groupBy("o_custkey")
        .arrange(col("o_orderkey"))
        .mutate("m" -> Vec.ewmMean(col("cents"), alpha = 0.5))
        .select(Seq("o_custkey", "o_orderkey", "m"): _*).df),

    // pandas ewm(alpha=0.5).var(): the oracle replays the SAME decayed-sums
    // recursion (sw, swx, sw2, swx2) via a recursive CTE — identical IEEE
    // ops in identical order are bit-exact, raw doubles hash with no rounding
    "q_ewm_var" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate("cents" -> round(col("o_totalprice") * 100, 0).cast("bigint"))
        .groupBy("o_custkey")
        .arrange(col("o_orderkey"))
        .mutate("v" -> Vec.ewmVar(col("cents"), alpha = 0.5))
        .select(Seq("o_custkey", "o_orderkey", "v"): _*).df),

    // pandas expanding().var(): computed from exact integer cumulative sums
    // (n·Σx² − (Σx)²) / (n·(n−1)) in DOLLARS so every intermediate fits
    // int64 — one final division, bit-exact on both engines, no rounding.
    // Vec.expandingVar (the var_samp float path) is pinned to this exact
    // formula in OpsMatrixSpec
    "q_expanding_var" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate("d" -> round(col("o_totalprice"), 0).cast("bigint"))
        .groupBy("o_custkey")
        .arrange(col("o_orderkey"))
        .mutate("n" -> Vec.rowNumber(col("o_orderkey")).transform(_.cast("bigint")),
                "s" -> Vec.cumsum(col("d")),
                "s2" -> Vec.cumsum(col("d") * col("d")))
        .mutate("ev" -> when(col("n") > 1,
          (col("n") * col("s2") - col("s") * col("s")).cast("double") /
            (col("n") * (col("n") - 1))))
        .select(Seq("o_custkey", "o_orderkey", "ev"): _*).df),

    // exact rolling median on integer cents: odd frames hit an element,
    // even frames average two int64s (exact half-integers) — no float noise
    "q_rolling_median" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate("cents" -> round(col("o_totalprice") * 100, 0).cast("bigint"))
        .groupBy("o_custkey")
        .arrange(col("o_orderkey"))
        .mutate("rm" -> Vec.rollingMedian(col("cents"), 5))
        .select(Seq("o_custkey", "o_orderkey", "rm"): _*).df),

    // exact rolling lower-quartile on integer cents: h = (n-1)/4 is dyadic,
    // cents < 2^27, so lower + (upper-lower)*frac is exact on both engines
    // (DuckDB quantile_cont uses the same linear interpolation)
    "q_rolling_quantile" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate("cents" -> round(col("o_totalprice") * 100, 0).cast("bigint"))
        .groupBy("o_custkey")
        .arrange(col("o_orderkey"))
        .mutate("rq" -> Vec.rollingQuantile(col("cents"), 0.25, 5))
        .select(Seq("o_custkey", "o_orderkey", "rq"): _*).df),

    "q_rows_upsert" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(Seq("o_orderkey", "o_orderpriority", "o_totalprice"): _*)
      val hit = o.df.where(col("o_orderkey") % 97 === 0)
      val patch = hit
        .select(col("o_orderkey"), lit("0-PATCHED").as("o_orderpriority"))
        .unionByName(hit.select(
          (col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit("9-NEW").as("o_orderpriority")))
      o.rowsUpsert(Tbl(patch), Seq("o_orderkey")).df
    }),

    // data-quality gate: violation counts over lineitem/orders (duplicate
    // composite keys, nulls, price range, FK orphans) — all exact integers
    "q_data_checks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").df
      val o = t(s, dir, "orders").df
      graft.ops.Checks.duplicateKeyCount(li, Seq("l_orderkey", "l_linenumber"))
        .crossJoin(graft.ops.Checks.nullCounts(li,
          Seq("l_shipdate", "l_returnflag")))
        .crossJoin(graft.ops.Checks.outOfRangeCount(li,
          col("l_quantity"), lit(1), lit(50)))
        .crossJoin(graft.ops.Checks.orphanCount(li, "l_orderkey",
          o, "o_orderkey"))
    }),

    // pd.cut-style binning (pandas parity extension): integer-cent
    // boundaries so both engines compare exactly; out-of-range -> NULL group
    "q_cut" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate(
          "cents" -> round(col("o_totalprice") * 100, 0).cast("bigint"),
          "bucket" -> Fns.cut(col("cents"),
            Seq(0d, 5000000d, 15000000d, 30000000d),
            labels = Seq("low", "mid", "high"), includeLowest = true))
        .groupBy("bucket")
        .summarize("n" -> Fns.Agg.n())
        .df),

    // pd.qcut-style quartiles: integer-cent values keep every non-edge
    // comparison exact; edge values only arise at frac=0 indices where both
    // engines interpolate exactly
    "q_qcut" -> ((s, dir) => {
      val o = t(s, dir, "orders").df
        .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("bigint"))
      Tbl(o.withColumn("bucket", Fns.qcut(o, col("cents"), 4,
          labels = Seq("q1", "q2", "q3", "q4"))))
        .groupBy("bucket")
        .summarize("n" -> Fns.Agg.n())
        .df
    }),

    // round-7 flagship: the corpus-quality layers composed as ONE lazy plan
    // — frequent-line removal -> repetition gate (exact integer
    // cross-multiplication, no float thresholds) -> per-domain quota ->
    // fixed-length sequence packing. PlanSpec asserts the plan shape.
    "q_quality_e2e" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      val docs = t(s, dir, "documents").df
        .withColumn("tx",
          expr("replace(replace(text, ' the ', chr(10)), ' a ', chr(10))"))
        .select("doc_id", "source", "tx")
      val deduped = Dedup.dropFrequentLines(docs, "doc_id", "tx",
        maxDocFreq = 3, minLen = 4, hash = ph)
      val st = TextFns.repetitionStats(col("tx"), topNs = Seq(2), dupNs = Seq(5))
      // keep iff top-2-gram coverage <= 1/5 of chars AND dup-5-gram
      // coverage <= 1/4 — exact integer comparisons
      val gated = deduped.withColumn("st", st)
        .where(col("st.top2gram_count") * col("st.top2gram_len") * 5 <= col("st.chars")
          && col("st.dup5gram_chars") * 4 <= col("st.chars"))
        .withColumn("n_clean", col("st.chars"))
        .drop("st")
      val dom = gated.withColumn("domain",
        UrlFns.registeredDomain(concat(lit("www."), col("source"), lit(".com"))))
      val quota = Tbl(dom).sampleQuota(Seq("domain"), Seq(col("doc_id")), k = 10).df
      graft.ops.Scale.packSequences(quota, Seq(col("doc_id")),
          col("n_clean"), seqLen = 512)
        .select(col("doc_id"), col("domain"), col("seq_id"),
          col("tok_start"), col("tok_end"))
    }),

    // C4/RefinedWeb-style corpus-level boilerplate pass: drop lines
    // appearing in > 3 distinct docs. Lines derive from the same
    // chr(10)-swap trick as q_repetition (two fillers -> denser repeats);
    // the line hash is the portable md5 leaf so DuckDB reproduces the
    // offender set (and its collision behavior) exactly.
    "q_line_dedup" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      val docs = t(s, dir, "documents").df
        .withColumn("tx",
          expr("replace(replace(text, ' the ', chr(10)), ' a ', chr(10))"))
        .select("doc_id", "tx")
      Dedup.dropFrequentLines(docs, "doc_id", "tx",
          maxDocFreq = 3, minLen = 4, hash = ph)
        .select(col("doc_id"), col("tx").as("clean"))
    }),

    // blocked edit-distance fuzzy lookup: probe names (one deterministic
    // char deletion) matched into the part catalog; prefix block + length
    // band, threshold-bounded levenshtein. All-integer output.
    "q_fuzzy_join" -> ((s, dir) => {
      val part = t(s, dir, "part").df
      val probes = part.filter(col("p_partkey") % 997 === 0)
        .select(col("p_partkey").as("probe_id"),
          concat(substring(col("p_name"), 1, 10),
            col("p_name").substr(lit(12), length(col("p_name"))))
            .as("ptext"))
      Fuzzy.editDistanceJoin(probes, "probe_id", "ptext",
          part, "p_partkey", "p_name", maxDist = 2, broadcastLeft = true)
        .select(col("id_a").as("probe_id"), col("id_b").as("part_id"),
          col("dist"))
    }),

    // sorted-neighborhood fuzzy candidates: one global name order, pairs
    // within a 5-wide window, bounded levenshtein — skew-proof blocking
    "q_fuzzy_snm" -> ((s, dir) =>
      Fuzzy.sortedNeighborhoodJoin(t(s, dir, "part").df,
        "p_partkey", "p_name", sortKey = col("p_name"),
        windowSize = 5, maxDist = 2)),

    // Okapi BM25 lexical retrieval: top-10 docs per query. k1=1.25/b=0.75
    // are exactly binary-representable, so every float literal parses to
    // the same double in both engines; all corpus stats are exact integers.
    "q_bm25" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "spark join table"), (2L, "fast hash value"),
                   (3L, "window order data")).toDF("query_id", "qtext")
      Search.bm25(t(s, dir, "documents").df, "doc_id", "text",
          qs, "query_id", "qtext", k1 = 1.25, b = 0.75, topK = 10)
        .select(col("query_id"), col("id").as("doc_id"), col("score"),
          col("rank"))
    }),

    // tf-idf keyword extraction: top-3 characteristic terms per doc. Each
    // score is a single ln + multiply of identical exact-integer-derived
    // doubles — no summation, so even the pre-round rank order is
    // bit-deterministic across engines.
    "q_tfidf" -> ((s, dir) =>
      Search.tfidfTerms(t(s, dir, "documents").df, "doc_id", "text", topK = 3)
        .select(col("id").as("doc_id"), col("term"), col("score"),
          col("rank"))),

    // Flesch–Kincaid readability gate: exact-integer word/sentence/vowel
    // counts, deterministic float formula mirrored operation-for-operation
    "q_readability" -> ((s, dir) =>
      t(s, dir, "documents").df
        .select(col("doc_id"),
          round(TextFns.fleschKincaid(col("text")), 4).as("fk"))),

    // T5 denoising prep: deterministic span corruption — the mask coin is
    // the portable md5 leaf on (doc_id, position), so the corrupted pairs
    // are bit-reproducible in any engine (and across reruns: replayable
    // augmentation). Exact strings, no floats.
    "q_span_corrupt" -> ((s, dir) =>
      t(s, dir, "documents").df
        .withColumn("sc",
          TextFns.spanCorrupt(col("text"), col("doc_id"), rateBp = 1500))
        .select(col("doc_id"), col("sc.input").as("input"),
          col("sc.target").as("target"))),

    // deterministic integer PageRank over the symmetric customer<->supplier
    // purchase graph (suppliers as negative node ids). Exact int64 fixed
    // point: bit-identical under any partitioning — hash-oracled against a
    // chained-CTE DuckDB recomputation of the same recurrence.
    "q_pagerank" -> ((s, dir) => {
      val ol = t(s, dir, "orders").df.join(t(s, dir, "lineitem").df,
        col("l_orderkey") === col("o_orderkey"))
      // suppliers shift to -(key+1): both key spaces start at 0, and a
      // plain negation would conflate customer 0 with supplier 0
      val fwd = ol.select(col("o_custkey").as("src"),
        (-(col("l_suppkey") + 1)).as("dst"))
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      graft.graph.Graph.pageRank(edges, iters = 5)
    }),

    // personalized PageRank (random walk with restart) from a deterministic
    // customer seed set — same exact integer recurrence, teleport and
    // initial mass restricted to seeds
    "q_pagerank_pers" -> ((s, dir) => {
      val ol = t(s, dir, "orders").df.join(t(s, dir, "lineitem").df,
        col("l_orderkey") === col("o_orderkey"))
      // suppliers shift to -(key+1): both key spaces start at 0, and a
      // plain negation would conflate customer 0 with supplier 0
      val fwd = ol.select(col("o_custkey").as("src"),
        (-(col("l_suppkey") + 1)).as("dst"))
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "customer").df
        .filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("node"))
      graft.graph.Graph.pageRank(edges, iters = 5, seeds = Some(seeds))
    }),

    // synchronous label propagation (community detection) over the same
    // symmetric purchase graph: integer counts + min tie-breaks only, so
    // labels are bit-identical across engines — hash-oracled against a
    // chained-CTE replay of the argmax recurrence
    "q_label_prop" -> ((s, dir) => {
      val ol = t(s, dir, "orders").df.join(t(s, dir, "lineitem").df,
        col("l_orderkey") === col("o_orderkey"))
      val fwd = ol.select(col("o_custkey").as("src"),
        (-(col("l_suppkey") + 1)).as("dst"))
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      graft.graph.Graph.labelPropagation(edges, iters = 4)
    }),

    // per-group Misra-Gries heavy hitters (the sketch under groupBy): one
    // mergeable summary per language; exact regime (k > distinct sources)
    // so the sketch output is hash-oracleable
    "q_heavy_hitters_grouped" -> ((s, dir) =>
      t(s, dir, "documents").df
        .groupBy("lang")
        .agg(Fns.Agg.heavyHitters(col("source"), 64).as("hh"))
        .select(col("lang"), explode(col("hh")).as("e"))
        .select(col("lang"), col("e.item").as("item"),
          col("e.est_count").as("est_count"))),

    // hybrid retrieval: RRF fusion of the BM25 lexical ranking and the
    // embedding-cosine ranking (partial coverage at sf0.1 — only 2/5 of
    // docs have vectors — exercises RRF's missing-list semantics). Query
    // docs are excluded from both lists; two lists keep the fused sum a
    // single commutative IEEE add, so ranks are engine-deterministic.
    "q_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val emb = t(s, dir, "embeddings").df
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      val lex = Search.bm25(docs, "doc_id", "text", qs, "query_id", "qtext",
          k1 = 1.25, b = 0.75, topK = 20)
        .where(col("id") =!= col("query_id"))
        .select(col("query_id"), col("id"), col("rank"))
      val sem = Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 20)
        .select(col("query_id"), col("item_id").as("id"),
          col("rk").cast("long").as("rank"))
      Search.rrfFuse(Seq(lex, sem), k0 = 60, topK = 10)
        .select(col("query_id"), col("id").as("doc_id"), col("rrf"),
          col("n_lists"), col("rank"))
    }),

    // PMI bigram collocations: exact integer counts, one ln per pair —
    // bit-deterministic; global top-k plans TakeOrderedAndProject.
    "q_pmi" -> ((s, dir) =>
      Search.pmiCollocations(t(s, dir, "documents").df, "doc_id", "text",
        minCount = 5, topK = 20)),

    // corpus vocabulary health: all-integer single row
    "q_vocab_stats" -> ((s, dir) =>
      Search.vocabStats(t(s, dir, "documents").df, "text")),

    // BM25 topic tagging against frozen-corpus stats: best topic per doc
    // (rank over the 4-dp score, topic_id tiebreak). The same stats table
    // drives the streaming scrub-on-ingest sibling.
    "q_bm25_tag" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").df
      val topics = Seq((1L, "join hash merge"), (2L, "window stream batch"),
                       (3L, "scan filter table")).toDF("topic_id", "ttext")
      val stats = Search.bm25TopicStats(docs, "doc_id", "text",
        topics, "topic_id", "ttext")
      Search.bm25TagAgainst(docs, "doc_id", "text", stats,
          k1 = 1.25, b = 0.75)
        .select(col("id").as("doc_id"), col("topic_id"), col("score"),
          col("rank"))
    }),

    // skip-gram PMI at window 2 (gaps d=1,2): same exact-integer contract
    // as q_pmi with the generalized pair/total counting
    "q_skipgram" -> ((s, dir) =>
      Search.pmiCollocations(t(s, dir, "documents").df, "doc_id", "text",
        minCount = 5, topK = 20, window = 2)),

    // content-defined chunking: boundaries where the 5-gram md5 leaf ≡ 0
    // (mod 8) — shift-resistant dedup units with md5 chunk fingerprints
    "q_cdc_chunks" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      t(s, dir, "documents").df
        .withColumn("__w", TextFns.tokens(col("text")))
        .select(col("doc_id"),
          posexplode(TextFns.cdcChunks(col("__w"), n = 5, divisor = 8,
            hash = ph)).as(Seq("chunk_idx", "c")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("c.tok_start").cast("long").as("tok_start"),
          col("c.n_tok").cast("long").as("n_tok"),
          col("c.chunk_md5").as("chunk_md5"))
    }),

    // CDC dedup-ratio report: how much of the corpus is duplicate chunks —
    // the triage number a storage/dedup pass starts from. All integers.
    "q_cdc_dedup" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      val chunks = t(s, dir, "documents").df
        .withColumn("__w", TextFns.tokens(col("text")))
        .select(explode(TextFns.cdcChunks(col("__w"), n = 5, divisor = 8,
          hash = ph)).as("c"))
        .select(col("c.n_tok").cast("long").as("n_tok"),
          col("c.chunk_md5").as("h"))
      val per = chunks.groupBy("h")
        .agg(count(lit(1)).as("cnt"), first(col("n_tok")).as("__nt"))
      per.agg(
          sum(col("cnt")).cast("long").as("total_chunks"),
          count(lit(1)).cast("long").as("distinct_chunks"),
          sum(col("cnt") * col("__nt")).cast("long").as("total_tok"),
          sum(when(col("cnt") > 1, (col("cnt") - 1) * col("__nt"))
            .otherwise(0L)).cast("long").as("dup_tok"))
        .withColumn("dup_bp", expr("(10000L * dup_tok) div total_tok"))
    }),

    // winnowing fingerprints (MOSS): rightmost-minimal gram hash per
    // 4-window over 5-gram md5 leaves — deterministic position-aware
    // sampling, every >=8-token shared substring guaranteed a shared fp
    "q_winnow" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      Dedup.winnowFingerprints(t(s, dir, "documents").df, "doc_id", "text",
        n = 5, w = 4, hash = ph)
    }),

    // winnowed candidate pairs: docs sharing >= 3 selected fingerprints
    "q_winnow_pairs" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      Dedup.winnowPairs(t(s, dir, "documents").df, "doc_id", "text",
        n = 5, w = 4, minShared = 3, maxDf = 1000, hash = ph)
    }),

    // winnow-driven dedup resolve: MOSS fingerprint pairs -> connected
    // components -> canonical survivors — the full sampled-fingerprint
    // dedup chain as one flow (cheaper candidate gen than all-shingle
    // Jaccard: only ~2/(w+1) of grams ever join)
    "q_winnow_resolve" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      val docs = t(s, dir, "documents").df
      val pairs = Dedup.winnowPairs(docs, "doc_id", "text", n = 5, w = 4,
        minShared = 3, maxDf = 1000, hash = ph)
      Dedup.keepCanonical(docs, "doc_id", pairs).select("doc_id", "lang")
    }),

    // winnow candidates served from the PERSISTED bucket-pruned fp index:
    // corpus = even doc_ids indexed under fp_part=pmod(fp,16), probe =
    // odd doc_ids reading only its own fps' partitions — identical
    // output to the flat distinct-fps join (the oracle IS that join)
    "q_winnow_indexed" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val idx = scratchPath(dir, "winnow_idx")
      Dedup.buildWinnowIndex(s, docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", idx, n = 5, w = 4, parts = 16, portable = true)
      Dedup.winnowCandidatesAgainstIndex(s, idx,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        minShared = 2)
    }),

    // winnow index GROWTH: build(quarter) then append(the other even
    // quarter) must probe identically to build(all evens) — oracle
    // shared VERBATIM with q_winnow_indexed
    "q_winnow_indexed_append" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val idx = scratchPath(dir, "winnow_idx_app")
      Dedup.buildWinnowIndex(s, docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", idx, n = 5, w = 4, parts = 16, portable = true)
      Dedup.appendToWinnowIndex(s, idx,
        docs.filter(col("doc_id") % 4 === 2), "doc_id", "text")
      Dedup.winnowCandidatesAgainstIndex(s, idx,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        minShared = 2)
    }),

    // winnow index MAINTENANCE: build(quarter) ∘ append(the other even
    // quarter) ∘ COMPACT (every batch_seq partition collapsed into the
    // base, fp_part bucketing recomputed under the staged swap + lease)
    // must still probe identically to build(all evens) — oracle shared
    // VERBATIM with q_winnow_indexed
    "q_winnow_compact" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val idx = scratchPath(dir, "winnow_idx_cmp")
      Dedup.buildWinnowIndex(s, docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", idx, n = 5, w = 4, parts = 16, portable = true)
      Dedup.appendToWinnowIndex(s, idx,
        docs.filter(col("doc_id") % 4 === 2), "doc_id", "text")
      Dedup.compactWinnowIndex(s, idx)
      Dedup.winnowCandidatesAgainstIndex(s, idx,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        minShared = 2)
    }),

    // winnow dedup-on-INGEST with index growth: build(quarter), admit
    // the other even quarter (drops vs the standing quarter, survivors'
    // fps append), then admit the odds — which dedup against quarter ∪
    // first batch's ADMITTED set (growth is what the oracle replays).
    // Output = the admitted odd docs; too-short docs pass through.
    "q_winnow_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val idx = scratchPath(dir, "winnow_idx_ing")
      Dedup.buildWinnowIndex(s, docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", idx, n = 5, w = 4, parts = 16, portable = true)
      Dedup.winnowIngest(s, idx, docs.filter(col("doc_id") % 4 === 2),
        "doc_id", "text", minShared = 2)
      Dedup.winnowIngest(s, idx, docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", minShared = 2)
        .select("doc_id")
    }),

    // the ingest lifecycle round trip: same admissions, but the index is
    // COMPACTED between batches AND the final batch is REPLAYED across a
    // compaction boundary — the re-derived emission (batch-id exclusion;
    // no recorded evidence anywhere) must come out identical, so the
    // oracle is q_winnow_ingest's VERBATIM
    "q_winnow_ingest_compact" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val idx = scratchPath(dir, "winnow_idx_ingc")
      Dedup.buildWinnowIndex(s, docs.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", idx, n = 5, w = 4, parts = 16, portable = true)
      Dedup.winnowIngest(s, idx, docs.filter(col("doc_id") % 4 === 2),
        "doc_id", "text", minShared = 2)
      Dedup.compactWinnowIndex(s, idx)
      Dedup.winnowIngest(s, idx, docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", minShared = 2)
      Dedup.compactWinnowIndex(s, idx)
      Dedup.winnowIngest(s, idx, docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", minShared = 2)
        .select("doc_id")
    }),

    // winnow pair verification: candidates graded by the longest shared
    // token run (MOSS's contiguity check) — scattered idiom overlap scores
    // low, lifted passages score high. Same portable md5 gram hash.
    "q_winnow_verify" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      val docs = t(s, dir, "documents").df
      val pairs = Dedup.winnowPairs(docs, "doc_id", "text", n = 5, w = 4,
        minShared = 3, maxDf = 1000, hash = ph)
      Dedup.winnowVerifyPairs(docs, "doc_id", "text", pairs, n = 5, hash = ph)
    }),

    // exact substring-span dedup (Lee et al. 2022 ExactSubstr, n-gram
    // interval-merge formulation): per-doc duplicated-token stats + the
    // masked text. Everything integer or exact-string; the gram key is the
    // portable md5 leaf so DuckDB reproduces counts (and collisions) exactly.
    "q_substr_dedup" -> ((s, dir) => {
      val ph = (c: org.apache.spark.sql.Column) =>
        graft.ops.Sketch.portableHash(c) // digest-direct, value-identical
      val docs = t(s, dir, "documents").df
      val stats = Dedup.duplicateSpanStats(docs, "doc_id", "text",
        n = 8, hash = ph)
      val masked = Dedup.maskDuplicateSpans(docs, "doc_id", "text",
          n = 8, hash = ph)
        .select(col("doc_id"), col("text").as("masked"))
      stats.join(masked, "doc_id")
    }),

    // per-domain quota curation (Common-Crawl-style caps): registered
    // domain from a constructed URL -> keep the 10 lowest-doc_id pages per
    // domain. Composes UrlFns with the quota sampler.
    // deterministic sampled quantiles: bottom-500 portable-hash sample per
    // returnflag, exact percentiles of the sample. Dyadic probs (.25/.5/.75)
    // on integer cents make the interpolation exact — bit-identical on both
    // engines, no rounding
    "q_sample_quantile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .mutate("cents" -> round(col("l_extendedprice") * 100, 0).cast("bigint"))
        .groupBy("l_returnflag")
        // cents joins the sample ordering: (l_orderkey, l_linenumber) is
        // NOT unique in this data (118k dup pairs with different prices),
        // so without the value tiebreak the bottom-k CUT is scan-order-
        // nondeterministic in BOTH engines
        .quantilesBySample(col("cents"), Seq(0.25, 0.5, 0.75), k = 500,
          sampleKey = Seq(col("l_orderkey"), col("l_linenumber"), col("cents")),
          hash = Some(graft.ops.Sketch.portableHash(concat_ws("|",
            col("l_orderkey"), col("l_linenumber")))))
        .df),

    // leakage-safe train/val/test split keyed on the GROUP (source), not the
    // row: every doc from one source lands in one split. Portable md5 hash
    // leaf so DuckDB reproduces the assignment bit-for-bit
    "q_split" -> ((s, dir) =>
      t(s, dir, "documents")
        .splitByHash("source",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          hash = Some(graft.ops.Sketch.portableHash(col("source"))))
        .select(Seq("doc_id", "source", "split"): _*).df),

    "q_domain_quota" -> ((s, dir) => {
      val url = concat(lit("https://www."), col("source"), lit(".com/p/"),
        col("doc_id"))
      t(s, dir, "documents")
        .mutate("domain" -> UrlFns.registeredDomain(UrlFns.urlHost(url)))
        .sampleQuota(Seq("domain"), Seq(col("doc_id")), k = 10)
        .select(Seq("doc_id", "domain"): _*).df
    }),

    // temperature-scaled mixture: en dominates the corpus, alpha=0.5
    // compresses its advantage (weights = sqrt(per-lang counts) — IEEE sqrt
    // is correctly rounded, so DuckDB computes bit-identical weights from
    // the same integer counts)
    "q_interleave_temp" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val sources = Seq("de", "en", "es", "fr", "zh").map(l =>
        l -> docs.where(col("lang") === l).select("doc_id", "lang"))
      graft.ops.Scale.interleaveByTemperature(sources, alpha = 0.5,
          d => Seq(d("doc_id")))
        .select(col("doc_id"), col("tag"), col("mix_ord"))
    }),

    // URL family over deterministically constructed web-ish URLs (the
    // corpus has no URL column): alternating shapes exercise ports, query
    // order, fragments, and multi-part public suffixes
    "q_url_ops" -> ((s, dir) => {
      val url = when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("HTTPS://www."), col("source"), lit(".Example.COM:443/"),
            col("lang"), lit("/p"), col("doc_id"),
            lit("?b="), pmod(col("doc_id"), lit(3)), lit("&a=1#sec")))
        .otherwise(
          concat(lit("http://"), col("source"), lit(".news.CO.UK:8080/a/b/c?z=9")))
      t(s, dir, "documents").df
        .withColumn("url", url)
        .select(col("doc_id"),
          UrlFns.urlHost(col("url")).as("host"),
          UrlFns.registeredDomain(UrlFns.urlHost(col("url"))).as("domain"),
          UrlFns.urlPathDepth(col("url")).cast("long").as("depth"),
          UrlFns.urlParam(col("url"), "a").as("pa"),
          UrlFns.urlParam(col("url"), "b").as("pb"),
          UrlFns.normalizeUrl(col("url")).as("norm"))
    }),

    // daily resample with explicit gap rows: rare events (value > 195) leave
    // 6-10 missing days per type, which the spine materializes as zeros.
    // Sums stay in exact integer cents (see the float-discipline convention).
    "q_resample" -> ((s, dir) => {
      val ev = t(s, dir, "events").df
        .where(col("value") > 195)
        // ts arrives as nanos-since-epoch (readTable canonicalizes any
        // on-disk timestamp type); micro truncation is irrelevant at days
        .withColumn("tstamp", timestamp_micros(expr("ts div 1000")))
        .withColumn("cents", round(col("value") * 100, 0).cast("bigint"))
      graft.ops.Resample.resample(ev, col("tstamp"), "day", Seq("event_type"),
          Seq("n" -> count(lit(1)), "vsum_cents" -> sum(col("cents"))),
          fill = Map("n" -> lit(0L), "vsum_cents" -> lit(0L)))
        .select(col("event_type"), col("bucket").cast("date").as("day"),
          col("n"), col("vsum_cents"))
    }),

    // fixed-length sequence packing: documents laid end to end in doc_id
    // order, cut every 2048 tokens (n_chars stands in for the token count —
    // an existing exact-integer column keeps the oracle arithmetic-free)
    "q_pack_sequences" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df.select(col("doc_id"), col("n_chars"))
      graft.ops.Scale.packSequences(sized, Seq(col("doc_id")), col("n_chars"),
          seqLen = 2048)
        .select(col("doc_id"), col("seq_id"),
          col("tok_start"), col("tok_end"), col("seq_off"))
    }),

    // the shard MANIFEST the dataloader reads instead of listing files:
    // per shard, row/token counts, the contiguous id range, and an
    // order-free BIT_XOR content fingerprint of portable md5 leaves —
    // two manifests diff shard-by-shard without reading data
    "q_shard_manifest" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
          col("text"))
      val packed = graft.ops.Scale.packByBudget(sized, Seq(col("doc_id")),
        col("n_tok"), budget = 2000)
      graft.ops.Scale.shardManifest(packed, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
    }),

    // Manifest MERGEABILITY as a first-class claim (the
    // q_calibration_merge pattern for the shard artifact): manifests
    // built over the even-id and odd-id ROW halves of the same packed
    // corpus — every shard straddles the split — merge by column
    // sums/min/max/XOR into the manifest of the union, which must equal
    // the one-shot build (the oracle IS q_shard_manifest's, VERBATIM).
    // This is what lets standing manifests maintain incrementally on
    // ingest (shardManifestIngest) with no re-read of old data.
    "q_manifest_merge" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
          col("text"))
      val packed = Dedup.trackCache(graft.ops.Scale.packByBudget(sized,
        Seq(col("doc_id")), col("n_tok"), budget = 2000))
      def part(p: org.apache.spark.sql.DataFrame) =
        graft.ops.Scale.shardManifest(p, "shard", "doc_id",
          col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      graft.ops.Scale.mergeShardManifests(Seq(
        part(packed.filter(col("doc_id") % 2 === 0)),
        part(packed.filter(col("doc_id") % 2 =!= 0))))
    }),

    // The terminal export with its integrity proof: pack, write the
    // shards + manifest, then VERIFY by recomputing the manifest from
    // the files on disk and diffing — a clean export is all-unchanged
    // with both sides carrying the true counts, which is exactly what
    // the oracle computes from the raw corpus (the round trip through
    // parquet partitions is the thing under test).
    "q_shard_verify" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
          col("text"))
      val packed = graft.ops.Scale.packByBudget(sized, Seq(col("doc_id")),
        col("n_tok"), budget = 2000)
      val path = scratchPath(dir, "shard_export")
      graft.ops.Scale.writeShardsWithManifest(packed, path, "shard",
        "doc_id", col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      graft.ops.Scale.verifyShards(s, path, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
    }),

    // Diff two corpus VERSIONS from their manifests alone — which
    // id-range shards re-enter the pipeline, decided without reading a
    // byte of corpus: v1 drops every 13th doc, v2 restores them but
    // mutates every 11th doc's text, shards are fixed 50-id key ranges
    // (the standing-corpus layout, so versions share shard keys), and
    // the diff classifies each shard added/removed/changed/unchanged
    // from (fingerprint, n_rows) alone.
    "q_manifest_diff" -> ((s, dir) => {
      val base = t(s, dir, "documents").df
        .select(col("doc_id"), col("text"))
        .withColumn("shard", expr("doc_id div 20"))
      // v1 lacks every 7th shard (-> 'added' in the diff), v2 lacks
      // every 9th ('removed'), mutates text in shard%5==1 ('changed' by
      // fingerprint) and drops docs in shard%5==2 ('changed' by count —
      // the XOR guard); everything else 'unchanged'
      val v1 = base.filter(col("shard") % 7 =!= 0)
      val v2 = base.filter(col("shard") % 9 =!= 0)
        .withColumn("text",
          when(col("shard") % 5 === 1 && col("doc_id") % 3 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
        .filter(!(col("shard") % 5 === 2 && col("doc_id") % 13 === 0))
      def mf(df: org.apache.spark.sql.DataFrame) =
        graft.ops.Scale.shardManifest(
          df.withColumn("n_tok",
            TextFns.tokenCount(col("text")).cast("long")),
          "shard", "doc_id", col("n_tok"),
          graft.ops.Sketch.portableHash(col("text")))
      graft.ops.Scale.manifestDiff(mf(v1), mf(v2))
    }),

    // Incremental re-export in the driver gate: export v1, then RESYNC
    // the export to v2 — only added/changed shards rewrite (dynamic
    // partition overwrite), removed partitions drop, and the returned
    // receipt is exactly the manifest diff, so the oracle is
    // q_manifest_diff's VERBATIM. (ScaleSpec separately pins that
    // untouched shard files stay byte-identical and the resynced export
    // verifies all-unchanged.)
    "q_shard_resync" -> ((s, dir) => {
      val base = t(s, dir, "documents").df
        .select(col("doc_id"), col("text"))
        .withColumn("shard", expr("doc_id div 20"))
      val v1 = base.filter(col("shard") % 7 =!= 0)
      val v2 = base.filter(col("shard") % 9 =!= 0)
        .withColumn("text",
          when(col("shard") % 5 === 1 && col("doc_id") % 3 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
        .filter(!(col("shard") % 5 === 2 && col("doc_id") % 13 === 0))
      def sized(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("n_tok",
          TextFns.tokenCount(col("text")).cast("long"))
      val path = scratchPath(dir, "shard_resync")
      graft.ops.Scale.writeShardsWithManifest(sized(v1), path, "shard",
        "doc_id", col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      graft.ops.Scale.resyncShards(s, sized(v2), path, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
    }),

    // O(delta) incremental re-export for a GROWING corpus: export the
    // doc_id < 390 prefix (tail shard 19 partial), then hand
    // resyncShardsDelta ONLY the touched shards' full new content (the
    // grown tail shard + the brand-new shards — the ascending-id packing
    // contract); untouched shards are never read or rewritten, their
    // manifest rows carry forward verbatim. The emitted relation is
    // verifyShards over the final export: every shard 'unchanged' proves
    // the on-disk bytes (prefix write + delta rewrite) match the full
    // corpus exactly — the oracle recomputes those per-shard stats from
    // scratch. (ScaleSpec separately pins receipt statuses, untouched-
    // file byte-identity, and the scan set.)
    "q_resync_delta" -> ((s, dir) => {
      val base = t(s, dir, "documents").df
        .select(col("doc_id"), col("text"))
        .withColumn("shard", expr("doc_id div 20"))
        .withColumn("n_tok",
          TextFns.tokenCount(col("text")).cast("long"))
      val fp = graft.ops.Sketch.portableHash(col("text"))
      val path = scratchPath(dir, "shard_resync_delta")
      graft.ops.Scale.writeShardsWithManifest(
        base.filter(col("doc_id") < 390), path, "shard", "doc_id",
        col("n_tok"), fp)
      graft.ops.Scale.resyncShardsDelta(s,
        base.filter(col("shard") >= 19), path, "shard", "doc_id",
        col("n_tok"), fp)
      graft.ops.Scale.verifyShards(s, path, "shard", "doc_id",
        col("n_tok"), fp)
    }),

    // batch_seq-store compaction (the streaming admitted store's
    // maintenance verb): three dynamic-overwrite partitions land, the
    // first two fold into the base batch_seq=-1 under the staged swap +
    // lease, the last stays individually addressable (the redelivery /
    // export-cursor contract). Rows and their fold assignment replay
    // exactly in the oracle.
    "q_batchstore_compact" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df.select(col("doc_id"), col("lang"))
      val path = scratchPath(dir, "batch_store_cmp")
      (0 to 2).foreach { b =>
        docs.filter(pmod(col("doc_id"), lit(3)) === b)
          .withColumn("batch_seq", lit(b.toLong))
          .write.partitionBy("batch_seq")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(path)
      }
      graft.ops.Scale.compactBatchStore(s, path, upToSeq = 1L)
      s.read.parquet(path).select(col("doc_id"), col("lang"),
        col("batch_seq").cast("long").as("batch_seq"))
    }),

    // The manifest's CONSUMER side: the deterministic resumable epoch
    // schedule — shards permuted by the portable hash of (shard, seed),
    // dealt round-robin to 4 dataloader workers, each worker's shards
    // numbered by step with the exact cumulative token offset consumed
    // before it. Resume-at-step-k is a filter, not a replay; the whole
    // schedule is a pure function of (manifest, seed), replayed verbatim
    // by the oracle.
    "q_epoch_plan" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
          col("text"))
      val packed = graft.ops.Scale.packByBudget(sized, Seq(col("doc_id")),
        col("n_tok"), budget = 2000)
      val manifest = graft.ops.Scale.shardManifest(packed, "shard",
        "doc_id", col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      graft.ops.Scale.epochPlan(manifest, "shard", seed = "42",
        nWorkers = 4)
    }),

    // Epoch plan over VERIFIED shards — the resilient-dataloader
    // handshake: export shards with their manifest, corrupt the STORED
    // manifest's shard-0 fingerprint (simulating a damaged shard: stored
    // and recomputed rows disagree), then plan only over shards that
    // verify; shard 0 is reported 'changed' with NULL schedule columns
    // instead of silently entering the schedule.
    "q_epoch_verified" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
          col("text"))
      val packed = graft.ops.Scale.packByBudget(sized, Seq(col("doc_id")),
        col("n_tok"), budget = 2000)
      val path = scratchPath(dir, "shard_export_verified")
      graft.ops.Scale.writeShardsWithManifest(packed, path, "shard",
        "doc_id", col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      // doctor the stored manifest: flip shard 0's digest (checkpoint
      // first — the write overwrites its own source)
      val m0 = s.read.parquet(s"$path/manifest").localCheckpoint(true)
      m0.withColumn("fingerprint",
          when(col("shard") === 0,
            col("fingerprint").bitwiseXOR(lit(1L)))
          .otherwise(col("fingerprint")))
        .write.mode("overwrite").parquet(s"$path/manifest")
      graft.ops.Scale.epochPlanVerified(s, path, "shard", "doc_id",
        col("n_tok"), graft.ops.Sketch.portableHash(col("text")),
        seed = "42", nWorkers = 4)
    }),

    // The whole-training-run schedule: 3 epochs, each its own derived
    // permutation ((shard, seed#epoch) hash), workers round-robin per
    // epoch, tok_offset cumulative ACROSS epochs per worker — the
    // (epoch, step) resume point of a crashed multi-epoch run, still a
    // pure function of (manifest, seed).
    "q_epoch_schedule" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tok"),
          col("text"))
      val packed = graft.ops.Scale.packByBudget(sized, Seq(col("doc_id")),
        col("n_tok"), budget = 2000)
      val manifest = graft.ops.Scale.shardManifest(packed, "shard",
        "doc_id", col("n_tok"), graft.ops.Sketch.portableHash(col("text")))
      graft.ops.Scale.epochSchedule(manifest, "shard", seed = "42",
        nWorkers = 4, nEpochs = 3)
    }),

    // the packing run's efficiency report — one row: sequence/segment
    // counts, packed tokens, cross-document boundary crossings (the
    // attention masks a collator must cut), fill rate and mean segments
    // per sequence; exact integers + two guarded divisions
    "q_pack_stats" -> ((s, dir) => {
      val sized = t(s, dir, "documents").df.select(col("doc_id"), col("n_chars"))
      graft.ops.Scale.packStats(
        graft.ops.Scale.packSequences(sized, Seq(col("doc_id")),
          col("n_chars"), seqLen = 2048), seqLen = 2048)
    }),

    // weighted mixture interleave: urgent orders at 2x the rate of high
    "q_interleave" -> ((s, dir) => {
      val o = t(s, dir, "orders").df.select("o_orderkey", "o_orderpriority")
      graft.ops.Scale.interleaveWeighted(
          Seq(("urgent", o.filter(col("o_orderpriority") === "1-URGENT"), 2.0),
              ("high",   o.filter(col("o_orderpriority") === "2-HIGH"),   1.0)),
          d => Seq(d("o_orderkey")))
        .select(col("tag"), col("o_orderkey"), col("mix_ord"))
    }),

    // per-stratum quota: top-3 largest docs per (lang, source)
    "q_quota_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .sampleQuota(Seq("lang", "source"),
                     Seq(col("n_chars").desc, col("doc_id")), k = 3)
        .select(Seq("lang", "source", "doc_id", "n_chars"): _*).df),

    // benchmark decontamination: 5-gram overlap of every doc against the
    // doc_id%17 slice standing in for a held-out benchmark suite. Both
    // queries run the hashed ShingleHash join path (no gram string is ever
    // materialized — 2.4x faster at sf0.1) while the oracle recomputes the
    // same counts from literal gram strings: outputs are per-doc counts, so
    // they hash-match exactly when the 64-bit equality classes agree, which
    // the PipelineSpec hashed==string differential pins.
    "q_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      Dedup.contaminationReport(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 17 === 0), "text", n = 5)
    }),

    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      // Bloom-prefiltered path: identical output to the plain hashed join
      // (no false negatives; exact join rejects bloom false positives), so
      // the string-gram oracle still pins it — and the driver gate now
      // exercises the 100 TB shape (map-side sketch probe before the join)
      Tbl(Dedup.decontaminateBloom(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 17 === 0), "text",
          n = 5, maxContaminatedFrac = 0.5))
        .select(Seq("doc_id", "lang", "source"): _*).df
    }),

    // The SAME scrub through the persisted-artifact lifecycle: the
    // benchmark's gram table + Bloom sketch are frozen ONCE
    // (buildDecontamIndex) and every batch probes the artifact — no
    // per-batch benchmark re-aggregation. Output identical to the
    // inline Bloom path: the oracle is q_decontaminate's VERBATIM (the
    // q_lm_persisted discipline).
    "q_decontam_pers" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val path = scratchPath(dir, "decontam_index")
      Dedup.buildDecontamIndex(s, docs.filter(col("doc_id") % 17 === 0),
        "text", path, n = 5)
      Tbl(Dedup.decontaminateFromIndex(s, path, docs, "doc_id", "text",
          maxContaminatedFrac = 0.5))
        .select(Seq("doc_id", "lang", "source"): _*).df
    }),

    // The GROWING-benchmark path: the index is built on half the
    // benchmark slice and the other half APPENDS (text-scan cost paid
    // only for the new slice; the union's Bloom rebuilt over slim
    // standing grams) — the scrub against the appended index must equal
    // the scrub against the whole benchmark, so the oracle is
    // q_decontaminate's VERBATIM.
    "q_decontam_append" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val bench = docs.filter(col("doc_id") % 17 === 0)
      val path = scratchPath(dir, "decontam_index_append")
      Dedup.buildDecontamIndex(s,
        bench.filter(col("doc_id") % 2 === 0), "text", path, n = 5)
      Dedup.appendToDecontamIndex(s, path,
        bench.filter(col("doc_id") % 2 =!= 0), "text")
      Tbl(Dedup.decontaminateFromIndex(s, path, docs, "doc_id", "text",
          maxContaminatedFrac = 0.5))
        .select(Seq("doc_id", "lang", "source"): _*).df
    }),

    // minhash at fixed seed is fully deterministic; with the SQL-portable
    // md5 shingle leaf the whole pipeline (signatures -> banding -> scored
    // pairs) is reproducible in DuckDB, graduating this query from
    // rows-only to hash-checked. Engine path (MinHashAgg, xxhash banding,
    // score-then-dedup) is identical to the default-leaf production route.
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents").df, "doc_id", "text",
        n = 3, bands = 16, rows = 2, threshold = 0.3,
        hashLeaf = Some(TextFns.shingleHashesPortable(col("text"), 3)))
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))),

    "q_dedup_simhash" -> ((s, dir) =>
      // maxDist=7 -> 8x8-bit chunk banding (derived): pigeonhole-guaranteed
      // recall at this distance. Portable md5 token hash makes the whole
      // fingerprint -> banding -> popcount pipeline reproducible in DuckDB
      // (generated oracle below) — hash-checked, no longer rows-only.
      Dedup.simhashPairs(t(s, dir, "documents").df, "doc_id", "text",
        maxDist = 7, hashLeaf = Some(TextFns.portableHash64))),

    "q_ann_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").df
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(emb, queries, k = 3)
        .select(col("query_id"), col("item_id"), col("rk").cast("long").as("rk"),
                round(col("cosine"), 6).as("cosine"))
    }),

    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").df
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.lshTopK(emb, queries, k = 3, dim = 64, nPlanes = 8, nTables = 8)
        .select(col("query_id"), col("item_id"), col("rk").cast("long").as("rk"))
    }),

    // IVF coarse-quantizer probing: deterministic (hash-sampled centroids,
    // cosine-desc/item-id ranks) but the centroid hash isn't SQL-portable —
    // rows-only; recall vs brute force pinned in MiscSpec
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").df
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val queries = emb.filter(col("vec_id") < 10)
      // portable centroid hash -> the whole probe/rank pipeline is
      // reproducible in DuckDB (generated oracle): hash-checked
      Similarity.ivfTopK(emb, queries, k = 3, nCentroids = 16, nProbe = 4,
          centroidHash = Some(TextFns.portableHash64(col("vec_id").cast("string"))))
        .select(col("query_id"), col("item_id"), col("rk").cast("long").as("rk"))
    }),

    // k-means topic bucketing on 1e6-quantized embeddings: every sum/dot is
    // an exact integer in double, so two full Lloyd iterations are
    // bit-reproducible — the generated oracle replays init, both assigns
    // and the centroid update in DuckDB and the labels hash-match
    "q_kmeans" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").df
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000000.0).cast("double")).as("qv"))
      graft.ml.Clustering.kmeans(emb, k = 8, iters = 2,
        idCol = "vec_id", vecCol = "qv",
        initHash = Some(graft.ops.Sketch.portableHash(
          col("vec_id").cast("string"))))
    }),

    "q_knn_join" -> ((s, dir) => {
      // corpus-to-corpus linking: odd-id vectors retrieve their top-2
      // neighbors among even-id vectors — two disjoint corpora, neither
      // broadcast in the operator itself
      val emb = t(s, dir, "embeddings").df
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val odd = emb.filter(col("vec_id") % 2 === 1)
      val even = emb.filter(col("vec_id") % 2 === 0)
      // 10-bit signatures: 1024 buckets/table keeps candidate pairs ~0.5M at
      // sf0.1 (8-bit collided ~4x more); radius-1 multi-probe supplies the
      // recall the extra bits would otherwise cost
      Similarity.knnJoin(odd, even, k = 2, dim = 64, nPlanes = 10, nTables = 8)
        .select(col("query_id"), col("item_id"), col("rk").cast("long").as("rk"))
    }),

    "q_embed_neardup" -> ((s, dir) => {
      // derive a near-dup-rich set from the testdata: each vector + a
      // slightly perturbed copy (id + 1e6); finds the planted pairs
      val emb = t(s, dir, "embeddings").df
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val perturbed = emb
        .withColumn("vec_id", col("vec_id") + 1000000)
        .withColumn("embedding", transform(col("embedding"), x => x * 1.001 + 0.0001))
      val both = emb.unionByName(perturbed)
      Dedup.embeddingNearDupPairs(both, "vec_id", "embedding", dim = 64,
          threshold = 0.999, nPlanes = 8)
        .select(col("id_a"), col("id_b"))
    }),

    // full dedup pipeline: exact-jaccard pairs -> connected components ->
    // canonical corpus (one survivor per duplicate cluster)
    "q_dedup_resolve" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      Dedup.keepCanonical(docs, "doc_id", pairs).select("doc_id", "lang")
    }),

    // capstone: the full training-data pipeline in one composable flow —
    // quality-filter -> near-dup dedup (pairs -> clusters -> canonical) ->
    // language-ID -> per-language corpus stats
    "q_pipeline_e2e" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // spread first: quality scoring, shingling and language-ID are
      // CPU-bound per-row passes — a single small row group would otherwise
      // run them all on one core (no-op when the scan is already wide)
      // cache: qual feeds BOTH pair generation and the canonical anti-join —
      // without it the (regex-heavy) quality scoring pass runs twice.
      // Registered via trackCache so Dedup.unpersistIntermediates() releases
      // it with the rest of the pipeline's pinned blocks.
      val qual = Tbl(Dedup.trackCache(
        Tbl(graft.ops.Scale.spread(docs.df))
          .mutate("q" -> TextFns.qualityScore(col("text")))
          .filter(col("q") >= 0.6)
          .df))
      // LSH candidate generation, not the exact shingle self-join: at corpus
      // scale the all-pairs-by-shingle join is quadratic in hot shingles;
      // banded MinHash keeps candidate generation an equi-join. Exact Jaccard
      // stays as the recall oracle in PipelineSpec.
      val pairs = Dedup.minhashLshPairs(qual.df, "doc_id", "text",
        n = 3, threshold = 0.5)
      Tbl(Dedup.keepCanonical(qual.df, "doc_id", pairs))
        .mutate("pred"  -> TextFns.langId(col("text")),
                "n_tok" -> TextFns.tokenCount(col("text")).cast("long"))
        .groupBy("pred")
        .summarize(
          "n_docs"    -> Fns.Agg.n(),
          "sum_tok"   -> sum(col("n_tok")),
          "avg_chars" -> (round(sum(length(col("text"))), 2) / count(lit(1))))
        .df
    }),

    "q_multimodal" -> ((s, dir) => {
      // binary plumbing over real bytes: documents.text as the payload.
      // Every output column is engine-portable — the payload is ASCII
      // (non-ASCII code points are stripped HERE and in the oracle: Spark
      // slices the binary by BYTE while the oracle slices the varchar by
      // CHARACTER, which only agree when every char is one byte), so binary
      // header/frame slices equal string slices in any SQL engine, and the
      // metadata stub runs on the portable md5 leaf (60-bit: nonnegative,
      // so % == pmod on both sides) instead of xxhash64.
      val ph = (h: org.apache.spark.sql.Column, k: Int) =>
        graft.ops.Sketch.portableHash(concat(h.cast("string"), lit("|" + k)))
      val media = Multimodal.attachMeta(
        t(s, dir, "documents").df.withColumn("payload",
          to_binary(regexp_replace(col("text"), "[^\\x00-\\x7F]", ""), lit("utf-8"))),
        "doc_id", "payload", headerHash = ph)
      val feats = Multimodal.extractFeaturesBatched(media, dim = 8)
      Multimodal.sampleFrames(feats, nFrames = 2)
        .select(
          col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
          col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("ts_ms").cast("double").as("ts_ms"),
          length(col("frame_bytes")).cast("long").as("frame_chars"),
          md5(col("frame_bytes")).as("frame_md5"))
    })
  )

  private val pipelineOracle: Map[String, String] = Map(
    // mirrors RepetitionStats's documented semantics exactly: string_split /
    // regexp_split_to_array keep all empty segments like Java split(-1);
    // duplicate accounting is occurrences-beyond-first; n-grams are counted
    // with overlap via 1-based inclusive list slices; ties break on binary
    // string order (= Java compareTo on ASCII). All outputs exact BIGINTs.
    "q_repetition" -> {
      def gramCte(n: Int): String =
        s"""g$n AS (SELECT doc_id, array_to_string(ws[i:i+${n - 1}], ' ') AS gram
           |  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - ${n - 2})) AS i) r),
           |gc$n AS (SELECT doc_id, gram, count(*) AS c FROM g$n GROUP BY 1, 2)""".stripMargin
      def topCte(n: Int): String =
        s"""top$n AS (SELECT doc_id, CAST(c AS BIGINT) AS top${n}gram_count,
           |    CAST(length(gram) AS BIGINT) AS top${n}gram_len
           |  FROM (SELECT doc_id, c, gram,
           |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
           |    FROM gc$n) WHERE rn = 1)""".stripMargin
      def dupCte(n: Int): String =
        s"""dup$n AS (SELECT doc_id,
           |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * length(gram) END), 0)
           |      AS BIGINT) AS dup${n}gram_chars
           |  FROM gc$n GROUP BY 1)""".stripMargin
      s"""WITH t AS (SELECT doc_id,
         |    replace(replace(text, ' table ', chr(10) || chr(10)), ' the ', chr(10)) AS tx
         |  FROM documents),
         |l AS (SELECT doc_id, ln, count(*) AS c, length(ln) AS cl
         |  FROM (SELECT doc_id, unnest(string_split(tx, chr(10))) AS ln FROM t)
         |  GROUP BY 1, 2),
         |lst AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS lines,
         |    CAST(sum(c) - count(*) AS BIGINT) AS dup_lines,
         |    CAST(sum(c * cl) AS BIGINT) AS line_chars,
         |    CAST(sum((c - 1) * cl) AS BIGINT) AS dup_line_chars
         |  FROM l GROUP BY 1),
         |p AS (SELECT doc_id, pa, count(*) AS c, length(pa) AS cl
         |  FROM (SELECT doc_id, unnest(regexp_split_to_array(tx, '\\n{2,}')) AS pa FROM t)
         |  GROUP BY 1, 2),
         |pst AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS paras,
         |    CAST(sum(c) - count(*) AS BIGINT) AS dup_paras,
         |    CAST(sum(c * cl) AS BIGINT) AS para_chars,
         |    CAST(sum((c - 1) * cl) AS BIGINT) AS dup_para_chars
         |  FROM p GROUP BY 1),
         |w AS (SELECT doc_id,
         |    list_filter(regexp_split_to_array(tx, '\\s+'), x -> x <> '') AS ws,
         |    CAST(length(tx) AS BIGINT) AS chars FROM t),
         |wst AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS words, chars FROM w),
         |${gramCte(2)}, ${topCte(2)},
         |${gramCte(3)}, ${topCte(3)},
         |${gramCte(4)}, ${topCte(4)},
         |${gramCte(5)}, ${dupCte(5)},
         |${gramCte(8)}, ${dupCte(8)}
         |SELECT lst.doc_id, lines, dup_lines, line_chars, dup_line_chars,
         |  paras, dup_paras, para_chars, dup_para_chars, words, chars,
         |  coalesce(top2gram_count, 0) AS top2gram_count,
         |  coalesce(top2gram_len, 0) AS top2gram_len,
         |  coalesce(top3gram_count, 0) AS top3gram_count,
         |  coalesce(top3gram_len, 0) AS top3gram_len,
         |  coalesce(top4gram_count, 0) AS top4gram_count,
         |  coalesce(top4gram_len, 0) AS top4gram_len,
         |  coalesce(dup5gram_chars, 0) AS dup5gram_chars,
         |  coalesce(dup8gram_chars, 0) AS dup8gram_chars
         |FROM lst JOIN pst USING (doc_id) JOIN wst USING (doc_id)
         |  LEFT JOIN top2 USING (doc_id) LEFT JOIN top3 USING (doc_id)
         |  LEFT JOIN top4 USING (doc_id) LEFT JOIN dup5 USING (doc_id)
         |  LEFT JOIN dup8 USING (doc_id)""".stripMargin
    },
    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h,
        |  min(doc_id) AS keep_id, count(*) AS n_dupes
        |FROM documents GROUP BY 1""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, count(*) AS n,
        |  round(avg(len(regexp_split_to_array(trim(lower(text)), '\s+'))), 4) AS avg_tok,
        |  round(avg(length(text)), 4) AS avg_chars,
        |  round(avg(CASE WHEN length(text) > 0 THEN
        |    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 / length(text)
        |    ELSE 0.0 END), 4) AS avg_punct,
        |  round(avg(CASE WHEN length(text) > 0 THEN
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text)
        |    ELSE 0.0 END), 4) AS avg_digit
        |FROM documents GROUP BY 1""".stripMargin,
    "q_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,
    "q_quality_score" ->
      """WITH q AS (SELECT lang,
        |  len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tok,
        |  length(regexp_replace(trim(text), '\s+', '', 'g')) AS n_nosp,
        |  length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 / length(text) AS punct,
        |  length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) AS digits,
        |  length(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0 / length(text) AS uppers
        | FROM documents)
        |SELECT lang, count(*) AS n, round(avg((
        |  (CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END) +
        |  (CASE WHEN n_nosp * 1.0 / n_tok BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
        |  (CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END) +
        |  (CASE WHEN digits <= 0.2 THEN 1.0 ELSE 0.0 END) +
        |  (CASE WHEN uppers <= 0.3 THEN 1.0 ELSE 0.0 END)) / 5), 4) AS avg_q
        |FROM q GROUP BY 1""".stripMargin,
    "q_lang_id" ->
      """WITH sc AS (SELECT lang,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      t -> t IN ('the','and','of','to','is'))) AS s_en,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      t -> t IN ('der','und','die','das','ist'))) AS s_de,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      t -> t IN ('le','la','et','les','est'))) AS s_fr,
        |  len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |      t -> t IN ('el','de','la','que','es'))) AS s_es
        |FROM documents)
        |SELECT lang,
        |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
        |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |       WHEN s_es = greatest(s_en, s_de, s_es) THEN 'es'
        |       WHEN s_en = greatest(s_en, s_de) THEN 'en'
        |       ELSE 'de' END AS pred,
        |  count(*) AS n
        |FROM sc GROUP BY 1, 2""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "q_curation_e2e" ->
      """WITH cl AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
        |      text, '<[^>]*>', ' ', 'g'), '(https?|ftp)://[^\s]+', ' ', 'g'),
        |      '\s+', ' ', 'g')) AS ctext
        |  FROM documents),
        |sz AS (
        |  SELECT doc_id, ctext,
        |    CAST(len(regexp_split_to_array(trim(lower(ctext)), '\s+')) AS BIGINT) AS n_tok
        |  FROM cl
        |  WHERE len(regexp_split_to_array(trim(lower(ctext)), '\s+')) >= 5),
        |dd AS (
        |  SELECT doc_id, ctext, n_tok FROM (
        |    SELECT *, row_number() OVER (
        |        PARTITION BY md5(regexp_replace(trim(lower(ctext)), '\s+', ' ', 'g'))
        |        ORDER BY doc_id) AS rn
        |    FROM sz) t WHERE rn = 1),
        |tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(ctext)), '\s+') AS w
        |  FROM dd),
        |gr AS (SELECT doc_id, list_distinct(
        |    CASE WHEN len(w) >= 5 THEN
        |      list_transform(range(1, len(w) - 3),
        |                     i -> array_to_string(list_slice(w, i, i + 4), ' '))
        |    ELSE [array_to_string(w, ' ')] END) AS gs FROM tok),
        |tg AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g FROM gr),
        |bg AS (SELECT DISTINCT g FROM
        |  (SELECT unnest(gs) AS g FROM gr WHERE doc_id % 17 = 0)),
        |bad AS (SELECT tg.doc_id FROM tg JOIN bg USING (g)
        |  GROUP BY tg.doc_id, tg.n_grams
        |  HAVING round(count(*) * 1.0 / tg.n_grams, 4) > 0.5),
        |keep AS (SELECT doc_id, n_tok FROM dd
        |  WHERE doc_id NOT IN (SELECT doc_id FROM bad))
        |SELECT doc_id, n_tok,
        |  CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
        |FROM keep""".stripMargin,
    "q_clean_text" ->
      """WITH aug AS (SELECT doc_id,
        |    '<div class=''x''>' || text || '</div> see https://ex.org/p?id='
        |    || CAST(doc_id AS VARCHAR) || ' <br/> end' AS t0
        |  FROM documents)
        |SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
        |    t0, '<[^>]*>', ' ', 'g'),
        |    '(https?|ftp)://[^\s]+', ' ', 'g'),
        |    '\s+', ' ', 'g')) AS clean
        |FROM aug""".stripMargin,
    "q_describe" -> {
      def side(c: String) =
        s"""SELECT '$c' AS "column", count($c) AS count,
           |  round(avg($c), 2) AS mean,
           |  round(stddev_samp($c), 4) AS stddev,
           |  round(min($c), 4) AS min,
           |  round(quantile_cont($c, 0.25), 4) AS q25,
           |  round(quantile_cont($c, 0.50), 4) AS q50,
           |  round(quantile_cont($c, 0.75), 4) AS q75,
           |  round(max($c), 4) AS max
           |FROM (SELECT CAST($c AS DOUBLE) AS $c FROM orders)""".stripMargin
      side("o_totalprice") + "\nUNION ALL\n" + side("o_custkey")
    },
    // heavy_hitters with k=64 > 5 distinct langs never evicts -> exact
    // counts, independent of partitioning
    "q_heavy_hitters" ->
      """SELECT lang AS item, count(*) AS est_count
        |FROM documents GROUP BY 1""".stripMargin,
    "q_lm_score" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |    FROM documents),
        |  uni AS (SELECT w1, count(*) AS u
        |    FROM (SELECT unnest(w) AS w1 FROM tok) GROUP BY 1),
        |  vocab AS (SELECT count(*) AS v FROM uni),
        |  big AS (SELECT doc_id,
        |      CASE WHEN len(w) >= 2 THEN
        |        list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |      ELSE CAST([] AS VARCHAR[]) END AS bs
        |    FROM tok),
        |  cb AS (SELECT b, count(*) AS bc
        |    FROM (SELECT unnest(bs) AS b FROM big) GROUP BY 1),
        |  db AS (SELECT doc_id, unnest(bs) AS b FROM big),
        |  j AS (SELECT db.doc_id,
        |      ln((coalesce(cb.bc, 0) + 1) * 1.0 /
        |         (coalesce(uni.u, 0) + vocab.v)) AS logp
        |    FROM db LEFT JOIN cb USING (b)
        |    LEFT JOIN uni ON uni.w1 = string_split(db.b, ' ')[1]
        |    CROSS JOIN vocab)
        |SELECT doc_id, count(*) AS n_bigrams, round(avg(logp), 4) AS avg_logp
        |FROM j GROUP BY 1""".stripMargin,
    "q_weighted_mean" ->
      """SELECT o_orderpriority,
        |  round(sum(o_totalprice * (o_orderkey % 7 + 1)) /
        |        sum(o_orderkey % 7 + 1), 4) AS wm
        |FROM orders GROUP BY 1""".stripMargin,
    "q_rolling_std" ->
      """WITH c AS (SELECT *, CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |    AS cents FROM orders),
        |b AS (SELECT o_custkey, o_orderkey,
        |    round(stddev_samp(o_totalprice) OVER w, 4) AS rs,
        |    count(*) OVER w AS nw,
        |    sum(cents) OVER w AS sw,
        |    sum(cents * cents) OVER w AS s2w
        |  FROM c
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |SELECT o_custkey, o_orderkey, rs,
        |  CASE WHEN nw >= 2 THEN
        |    CAST((2*(nw*s2w - sw*sw) + nw*(nw-1)) // (2*nw*(nw-1))
        |         AS DOUBLE) / 10000.0
        |  END AS rv
        |FROM b""".stripMargin,
    "q_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |    FROM events),
        |c AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1)
        |SELECT c.cohort, e.day - c.cohort AS period_offset,
        |       count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |    FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t FROM e
        |       WHERE event_type = 'click' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts_us) AS t FROM e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'view' AND e.ts_us > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts_us) AS t FROM e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts_us > s2.t GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS step, 'click' AS stage,
        |       (SELECT count(*) FROM s1) AS n
        |UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin,
    "q_corpus_overlap" ->
      """WITH a AS (SELECT count(DISTINCT doc_id) AS n_a FROM documents),
        |b AS (SELECT count(DISTINCT doc_id) AS n_b FROM documents
        |      WHERE doc_id % 2 = 0),
        |i AS (SELECT count(DISTINCT doc_id) AS n_intersection FROM documents
        |      WHERE doc_id % 2 = 0)
        |SELECT a.n_a, b.n_b, i.n_intersection, a.n_a AS n_union,
        |  round(i.n_intersection * 1.0 / a.n_a, 4) AS jaccard
        |FROM a, b, i""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |b AS (SELECT event_id, user_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT event_id, user_id,
        |  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
        |    AS BIGINT) AS session
        |FROM b""".stripMargin,
    "q_lump_prop" ->
      """WITH fr AS (SELECT lang AS seg,
        |    count(*) * 1.0 / (SELECT count(*) FROM documents) AS f
        |  FROM documents GROUP BY 1)
        |SELECT CASE WHEN lang IN (SELECT seg FROM fr WHERE f >= 0.3)
        |  THEN lang ELSE 'Other' END AS lang, count(*) AS n
        |FROM documents GROUP BY 1""".stripMargin,
    "q_window_extras" ->
      """WITH l AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority,
        |    lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pl
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  round(corr(o_totalprice, pl) OVER (PARTITION BY o_custkey), 4) AS ac,
        |  bool_and(o_totalprice IS NOT NULL AND coalesce(o_totalprice >= pl, true))
        |    OVER (PARTITION BY o_custkey) AS mono_i,
        |  (row_number() OVER (PARTITION BY o_custkey, o_orderpriority
        |                      ORDER BY o_orderkey) > 1) AS dup
        |FROM l""".stripMargin,
    "q_mask_where" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0.0 END AS wr,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS mk,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr
        |FROM customer""".stripMargin,
    "q_get_dummies" ->
      """SELECT doc_id,
        |  CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS lang_de,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lang_en,
        |  CASE WHEN lang = 'es' THEN 1 ELSE 0 END AS lang_es,
        |  CASE WHEN lang = 'fr' THEN 1 ELSE 0 END AS lang_fr,
        |  CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS lang_zh
        |FROM documents""".stripMargin,
    "q_explode" ->
      """SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS piece
        |FROM orders""".stripMargin,
    "q_pii_redact" ->
      """WITH aug AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.com or +1 (555) 123-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' ip 10.1.' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.7 ssn 123-45-6789.' AS t0
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |    regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
        |  FROM aug),
        |s2 AS (SELECT doc_id, n_email,
        |    CAST(len(regexp_extract_all(t1, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
        |    regexp_replace(t1, '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g') AS t2
        |  FROM s1),
        |s3 AS (SELECT doc_id, n_email, n_ssn,
        |    CAST(len(regexp_extract_all(t2, '(\+|\b)(\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b')) AS BIGINT) AS n_phone,
        |    regexp_replace(t2, '(\+|\b)(\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b', '[PHONE]', 'g') AS t3
        |  FROM s2),
        |s4 AS (SELECT doc_id, n_email, n_ssn, n_phone,
        |    CAST(len(regexp_extract_all(t3, '\b(25[0-5]|2[0-4]\d|1?\d?\d)(\.(25[0-5]|2[0-4]\d|1?\d?\d)){3}\b')) AS BIGINT) AS n_ipv4,
        |    regexp_replace(t3, '\b(25[0-5]|2[0-4]\d|1?\d?\d)(\.(25[0-5]|2[0-4]\d|1?\d?\d)){3}\b', '[IPV4]', 'g') AS red
        |  FROM s3)
        |SELECT doc_id, red, n_email, n_ssn, n_phone, n_ipv4 FROM s4""".stripMargin,
    "q_pack_shards" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT doc_id, n_tok,
        |  CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
        |FROM s""".stripMargin,
    "q_shard_manifest" ->
      """WITH s AS (SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (SELECT doc_id, text, n_tok,
        |    CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
        |  FROM s)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
        |    AS fingerprint
        |FROM p GROUP BY 1""".stripMargin,
    // a clean export verifies all-unchanged with the true per-shard
    // stats on BOTH sides — recomputed here from the raw corpus
    "q_shard_verify" ->
      """WITH s AS (SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (SELECT doc_id, text, n_tok,
        |    CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
        |  FROM s),
        |m AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM p GROUP BY 1)
        |SELECT shard, 'unchanged' AS status,
        |  n_rows AS n_rows_old, n_rows AS n_rows_new,
        |  n_tokens AS n_tokens_old, n_tokens AS n_tokens_new
        |FROM m""".stripMargin,
    "q_manifest_diff" -> manifestDiffOracleSql,
    // the resync receipt IS the manifest diff over the same v1/v2 —
    // oracle shared VERBATIM (the persisted-artifact discipline)
    "q_shard_resync" -> manifestDiffOracleSql,
    // after the delta resync the export must hold EXACTLY the full
    // corpus, shard by shard — verifyShards all-'unchanged' with the
    // per-shard stats the oracle recomputes from scratch
    "q_resync_delta" ->
      """WITH base AS (SELECT doc_id, text, doc_id // 20 AS shard
        |  FROM documents),
        |m AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM base GROUP BY 1)
        |SELECT shard, 'unchanged' AS status,
        |  n_rows AS n_rows_old, n_rows AS n_rows_new,
        |  n_tokens AS n_tokens_old, n_tokens AS n_tokens_new
        |FROM m""".stripMargin,
    // compaction folds batches 0 and 1 into the base partition, keeps
    // batch 2 addressable; no row gained, lost, or re-labeled otherwise
    "q_batchstore_compact" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 3 <= 1 THEN CAST(-1 AS BIGINT)
        |       ELSE CAST(2 AS BIGINT) END AS batch_seq
        |FROM documents""".stripMargin,
    "q_epoch_plan" ->
      """WITH s AS (SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (SELECT doc_id, text, n_tok,
        |    CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
        |  FROM s),
        |m AS (SELECT shard, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM p GROUP BY 1),
        |r AS (SELECT shard, n_tokens,
        |    row_number() OVER (ORDER BY
        |      CAST(('0x' || substr(md5(CAST(shard AS VARCHAR) || '|42'), 1, 15)) AS BIGINT),
        |      shard) - 1 AS rk
        |  FROM m)
        |SELECT shard, n_tokens, CAST(rk % 4 AS BIGINT) AS worker,
        |  CAST(rk // 4 AS BIGINT) AS step,
        |  CAST(sum(n_tokens) OVER (PARTITION BY rk % 4 ORDER BY rk // 4)
        |    - n_tokens AS BIGINT) AS tok_offset
        |FROM r""".stripMargin,
    // the plan over shards that verify (shard 0's stored digest was
    // flipped, so it is excluded and reported 'changed' with NULL
    // schedule columns); the planned rows are q_epoch_plan's ranking
    // restricted to shard <> 0
    "q_epoch_verified" ->
      """WITH s AS (SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (SELECT doc_id, text, n_tok,
        |    CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
        |  FROM s),
        |m AS (SELECT shard, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM p GROUP BY 1),
        |r AS (SELECT shard, n_tokens,
        |    row_number() OVER (ORDER BY
        |      CAST(('0x' || substr(md5(CAST(shard AS VARCHAR) || '|42'), 1, 15)) AS BIGINT),
        |      shard) - 1 AS rk
        |  FROM m WHERE shard <> 0)
        |SELECT shard, n_tokens, CAST(rk % 4 AS BIGINT) AS worker,
        |  CAST(rk // 4 AS BIGINT) AS step,
        |  CAST(sum(n_tokens) OVER (PARTITION BY rk % 4 ORDER BY rk // 4)
        |    - n_tokens AS BIGINT) AS tok_offset,
        |  'verified' AS status
        |FROM r
        |UNION ALL
        |SELECT shard, n_tokens, NULL, NULL, NULL, 'changed'
        |FROM m WHERE shard = 0""".stripMargin,
    "q_epoch_schedule" ->
      """WITH s AS (SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (SELECT doc_id, text, n_tok,
        |    CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
        |  FROM s),
        |m AS (SELECT shard, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM p GROUP BY 1),
        |r AS (SELECT shard, n_tokens, e.epoch,
        |    row_number() OVER (PARTITION BY e.epoch ORDER BY
        |      CAST(('0x' || substr(md5(CAST(shard AS VARCHAR) || '|42#'
        |        || CAST(e.epoch AS VARCHAR)), 1, 15)) AS BIGINT),
        |      shard) - 1 AS rk
        |  FROM m, (SELECT unnest(range(0, 3)) AS epoch) e)
        |SELECT shard, n_tokens, CAST(epoch AS BIGINT) AS epoch,
        |  CAST(rk % 4 AS BIGINT) AS worker,
        |  CAST(rk // 4 AS BIGINT) AS step,
        |  CAST(sum(n_tokens) OVER (PARTITION BY rk % 4
        |    ORDER BY epoch, rk // 4) - n_tokens AS BIGINT) AS tok_offset
        |FROM r""".stripMargin,
    // merged-halves == one-shot is the Spark-side claim; the oracle is
    // q_shard_manifest's one-shot build VERBATIM
    "q_manifest_merge" ->
      """WITH s AS (SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (SELECT doc_id, text, n_tok,
        |    CAST(floor(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
        |  FROM s)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
        |    AS fingerprint
        |FROM p GROUP BY 1""".stripMargin,
    "q_ewm" ->
      """WITH RECURSIVE c AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders),
        |e AS (
        |  SELECT o_custkey, o_orderkey, rn, CAST(cents AS DOUBLE) AS m
        |  FROM c WHERE rn = 1
        |  UNION ALL
        |  SELECT c.o_custkey, c.o_orderkey, c.rn,
        |    0.5 * e.m + 0.5 * CAST(c.cents AS DOUBLE)
        |  FROM e JOIN c ON c.o_custkey = e.o_custkey AND c.rn = e.rn + 1)
        |SELECT o_custkey, o_orderkey, m FROM e""".stripMargin,
    "q_ewm_var" ->
      """WITH RECURSIVE c AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders),
        |e AS (
        |  SELECT o_custkey, o_orderkey, rn,
        |    CAST(1.0 AS DOUBLE) AS sw,
        |    CAST(cents AS DOUBLE) AS swx,
        |    CAST(1.0 AS DOUBLE) AS sw2,
        |    CAST(cents AS DOUBLE) * CAST(cents AS DOUBLE) AS swx2
        |  FROM c WHERE rn = 1
        |  UNION ALL
        |  SELECT c.o_custkey, c.o_orderkey, c.rn,
        |    1.0 + 0.5 * e.sw,
        |    CAST(c.cents AS DOUBLE) + 0.5 * e.swx,
        |    1.0 + 0.25 * e.sw2,
        |    CAST(c.cents AS DOUBLE) * CAST(c.cents AS DOUBLE) + 0.5 * e.swx2
        |  FROM e JOIN c ON c.o_custkey = e.o_custkey AND c.rn = e.rn + 1)
        |SELECT o_custkey, o_orderkey,
        |  CASE WHEN sw * sw = sw2 THEN NULL
        |       ELSE (swx2 / sw - (swx / sw) * (swx / sw))
        |            * ((sw * sw) / (sw * sw - sw2)) END AS v
        |FROM e""".stripMargin,
    "q_expanding_var" ->
      """WITH c AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice) AS BIGINT) AS d FROM orders),
        |w AS (SELECT o_custkey, o_orderkey,
        |    row_number() OVER win AS n,
        |    CAST(sum(d) OVER win AS BIGINT) AS s,
        |    CAST(sum(d * d) OVER win AS BIGINT) AS s2
        |  FROM c WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT o_custkey, o_orderkey,
        |  CASE WHEN n > 1
        |       THEN CAST(n * s2 - s * s AS DOUBLE) / (n * (n - 1)) END AS ev
        |FROM w""".stripMargin,
    "q_rolling_median" ->
      """WITH c AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  median(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rm
        |FROM c""".stripMargin,
    "q_rolling_quantile" ->
      """WITH c AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  quantile_cont(cents, 0.25) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderkey ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rq
        |FROM c""".stripMargin,
    "q_rows_upsert" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority, o_totalprice
        |  FROM orders),
        |p AS (SELECT o_orderkey, '0-PATCHED' AS o_orderpriority FROM o
        |    WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, '9-NEW' FROM o
        |    WHERE o_orderkey % 97 = 0),
        |upd AS (SELECT o.o_orderkey,
        |    CASE WHEN p.o_orderkey IS NOT NULL THEN p.o_orderpriority
        |         ELSE o.o_orderpriority END AS o_orderpriority,
        |    o.o_totalprice
        |  FROM o LEFT JOIN p ON o.o_orderkey = p.o_orderkey),
        |ins AS (SELECT p.o_orderkey, p.o_orderpriority,
        |    CAST(NULL AS DOUBLE) AS o_totalprice
        |  FROM p WHERE p.o_orderkey NOT IN (SELECT o_orderkey FROM o))
        |SELECT * FROM upd UNION ALL SELECT * FROM ins""".stripMargin,
    "q_data_checks" ->
      """SELECT
        |  (SELECT CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |     AS BIGINT) FROM lineitem) AS duplicate_rows,
        |  (SELECT CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |     AS BIGINT) FROM lineitem) AS l_shipdate_nulls,
        |  (SELECT CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
        |     AS BIGINT) FROM lineitem) AS l_returnflag_nulls,
        |  (SELECT CAST(sum(CASE WHEN l_quantity IS NOT NULL
        |       AND (l_quantity < 1 OR l_quantity > 50) THEN 1 ELSE 0 END)
        |     AS BIGINT) FROM lineitem) AS out_of_range,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |     WHERE l.l_orderkey IS NOT NULL
        |       AND l.l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |    AS orphans""".stripMargin,
    "q_qcut" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |qs AS (SELECT quantile_cont(cents, [0.0, 0.25, 0.5, 0.75, 1.0]) AS b
        |  FROM c),
        |lab AS (SELECT cents, CASE
        |    WHEN cents >= b[1] AND cents <= b[2] THEN 'q1'
        |    WHEN cents > b[2] AND cents <= b[3] THEN 'q2'
        |    WHEN cents > b[3] AND cents <= b[4] THEN 'q3'
        |    WHEN cents > b[4] AND cents <= b[5] THEN 'q4'
        |  END AS bucket FROM c, qs)
        |SELECT bucket, count(*) AS n FROM lab GROUP BY 1""".stripMargin,
    "q_cut" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |b AS (SELECT CASE
        |    WHEN cents >= 0 AND cents <= 5000000 THEN 'low'
        |    WHEN cents > 5000000 AND cents <= 15000000 THEN 'mid'
        |    WHEN cents > 15000000 AND cents <= 30000000 THEN 'high'
        |  END AS bucket FROM c)
        |SELECT bucket, count(*) AS n FROM b GROUP BY 1""".stripMargin,
    // the four stage oracles of the round-7 layers chained: line-dedup CTEs
    // (same as q_line_dedup), top2/dup5 repetition counts on the CLEANED
    // text, integer-exact gate, domain quota, sequence packing
    "q_quality_e2e" ->
      """WITH t AS (SELECT doc_id, source,
        |    replace(replace(text, ' the ', chr(10)), ' a ', chr(10)) AS tx
        |  FROM documents),
        |w AS (SELECT doc_id, source, string_split(tx, chr(10)) AS ls FROM t),
        |l AS (SELECT doc_id, source, pos, ls[pos] AS ln
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS pos) r),
        |h AS (SELECT doc_id, source, pos, ln,
        |    CAST(('0x' || substr(md5(ln), 1, 15)) AS BIGINT) AS lh FROM l),
        |f AS (SELECT lh FROM (
        |    SELECT lh, count(DISTINCT doc_id) AS df FROM h
        |    WHERE length(ln) >= 4 GROUP BY 1) WHERE df > 3),
        |k AS (SELECT doc_id, source, pos, ln FROM h
        |  WHERE lh NOT IN (SELECT lh FROM f)),
        |dd AS (SELECT d.doc_id, d.source, coalesce(g.clean, '') AS clean
        |  FROM t d LEFT JOIN (SELECT doc_id,
        |      array_to_string(list(ln ORDER BY pos), chr(10)) AS clean
        |    FROM k GROUP BY 1) g USING (doc_id)),
        |ww AS (SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(clean, '\s+'), x -> x <> '') AS ws,
        |    CAST(length(clean) AS BIGINT) AS chars FROM dd),
        |g2 AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS gram
        |  FROM ww, LATERAL (SELECT unnest(range(1, len(ws))) AS i) r),
        |gc2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
        |top2 AS (SELECT doc_id, CAST(c AS BIGINT) AS t2c,
        |    CAST(length(gram) AS BIGINT) AS t2l
        |  FROM (SELECT doc_id, c, gram, row_number() OVER
        |      (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
        |    FROM gc2) WHERE rn = 1),
        |g5 AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
        |  FROM ww, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS i) r),
        |gc5 AS (SELECT doc_id, gram, count(*) AS c FROM g5 GROUP BY 1, 2),
        |dup5 AS (SELECT doc_id,
        |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * length(gram) END), 0)
        |      AS BIGINT) AS d5 FROM gc5 GROUP BY 1),
        |gate AS (SELECT ww.doc_id, ww.source, ww.chars
        |  FROM ww LEFT JOIN top2 USING (doc_id) LEFT JOIN dup5 USING (doc_id)
        |  WHERE coalesce(t2c, 0) * coalesce(t2l, 0) * 5 <= chars
        |    AND coalesce(d5, 0) * 4 <= chars),
        |dom AS (SELECT doc_id, chars, lower(source) || '.com' AS domain
        |  FROM gate),
        |quota AS (SELECT doc_id, chars, domain FROM (
        |    SELECT *, row_number() OVER
        |        (PARTITION BY domain ORDER BY doc_id) AS rk FROM dom)
        |  WHERE rk <= 10),
        |cum AS (SELECT doc_id, domain, chars,
        |    CAST(sum(chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cm
        |  FROM quota),
        |seg AS (SELECT doc_id, domain, cm, cm - chars AS strt FROM cum
        |  WHERE chars > 0),
        |ex AS (SELECT doc_id, domain, strt, cm,
        |    unnest(range(strt // 512, (cm - 1) // 512 + 1)) AS seq_id
        |  FROM seg)
        |SELECT doc_id, domain, seq_id,
        |  greatest(seq_id * 512, strt) - strt AS tok_start,
        |  least((seq_id + 1) * 512, cm) - strt AS tok_end
        |FROM ex""".stripMargin,
    "q_line_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    replace(replace(text, ' the ', chr(10)), ' a ', chr(10)) AS tx
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(tx, chr(10)) AS ls FROM t),
        |l AS (SELECT doc_id, pos, ls[pos] AS ln
        |  FROM w, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS pos) r),
        |h AS (SELECT doc_id, pos, ln,
        |    CAST(('0x' || substr(md5(ln), 1, 15)) AS BIGINT) AS lh FROM l),
        |f AS (SELECT lh FROM (
        |    SELECT lh, count(DISTINCT doc_id) AS df FROM h
        |    WHERE length(ln) >= 4 GROUP BY 1) WHERE df > 3),
        |k AS (SELECT doc_id, pos, ln FROM h
        |  WHERE lh NOT IN (SELECT lh FROM f)),
        |g AS (SELECT doc_id,
        |    array_to_string(list(ln ORDER BY pos), chr(10)) AS clean
        |  FROM k GROUP BY 1)
        |SELECT d.doc_id, coalesce(g.clean, '') AS clean
        |FROM documents d LEFT JOIN g USING (doc_id)""".stripMargin,
    "q_pagerank" -> pagerankOracleSql(iters = 5, dampBp = 8500L,
      scale = 1000000000000L),
    // seeds must mirror the Spark side: customers (positive nodes) with
    // key % 97 == 0 that APPEAR IN THE GRAPH (the seed df is intersected
    // with nodes by construction; customers without orders drop out)
    "q_pagerank_pers" -> pagerankOracleSql(iters = 5, dampBp = 8500L,
      scale = 1000000000000L,
      seedPred = Some("({n} >= 0 AND {n} % 97 = 0)")),
    "q_label_prop" -> labelPropOracleSql(iters = 4),
    "q_heavy_hitters_grouped" ->
      """SELECT lang, source AS item, count(*) AS est_count
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "q_readability" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1)
        |         AS BIGINT) AS w,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |         AS BIGINT) AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |         AS BIGINT) AS vg
        |  FROM documents)
        |SELECT doc_id,
        |  round(0.39 * (CAST(w AS DOUBLE) / s)
        |      + 11.8 * (CAST(greatest(vg, w) AS DOUBLE) / w) - 15.59, 4) AS fk
        |FROM c""".stripMargin,
    "q_span_corrupt" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |fl AS (SELECT doc_id, ws,
        |    list_transform(range(0, len(ws)), i ->
        |      CAST('0x' || substr(md5(doc_id || '|' || i), 1, 15) AS BIGINT)
        |        % 10000 < 1500) AS flags
        |  FROM tok),
        |st AS (SELECT doc_id, ws, flags,
        |    list_transform(range(0, len(ws)), i ->
        |      flags[i + 1] AND (i = 0 OR NOT flags[i])) AS starts
        |  FROM fl)
        |SELECT doc_id,
        |  coalesce(array_to_string(flatten(list_transform(range(0, len(ws)), i ->
        |    CASE WHEN NOT flags[i + 1] THEN [ws[i + 1]]
        |         WHEN starts[i + 1] THEN ['<extra_id_' ||
        |           (len(list_filter(starts[1:i + 1], x -> x)) - 1) || '>']
        |         ELSE [] END)), ' '), '') AS input,
        |  coalesce(array_to_string(flatten(list_transform(range(0, len(ws)), i ->
        |    CASE WHEN starts[i + 1] THEN ['<extra_id_' ||
        |           (len(list_filter(starts[1:i + 1], x -> x)) - 1) || '>',
        |           ws[i + 1]]
        |         WHEN flags[i + 1] THEN [ws[i + 1]]
        |         ELSE [] END)), ' '), '') AS target
        |FROM st""".stripMargin,
    "q_hybrid_rrf" ->
      """WITH q AS (SELECT doc_id AS query_id, text AS qtext
        |    FROM documents WHERE doc_id < 3),
        |tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |post AS (SELECT doc_id, len(ws) AS dl, w AS term, count(*) AS tf
        |  FROM tok, LATERAL (SELECT unnest(ws) AS w) r GROUP BY 1, 2, 3),
        |corp AS (SELECT count(DISTINCT doc_id) AS n_docs,
        |    CAST(sum(tf) AS BIGINT) AS sum_dl FROM post),
        |dfq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
        |qt AS (SELECT query_id,
        |    unnest(list_distinct(regexp_split_to_array(trim(lower(qtext)), '\s+'))) AS term
        |  FROM q),
        |sc AS (SELECT qt.query_id, post.doc_id,
        |    round(sum(
        |      ln(1.0 + (corp.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((post.tf * 2.25) /
        |       (post.tf + 1.25 * ((1.0 - 0.75) +
        |         ((0.75 * post.dl) / (CAST(corp.sum_dl AS DOUBLE) / corp.n_docs)))))
        |    ), 4) AS score
        |  FROM post JOIN qt USING (term) JOIN dfq USING (term) CROSS JOIN corp
        |  GROUP BY 1, 2),
        |lexrk AS (SELECT query_id, doc_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS rank FROM sc),
        |lex AS (SELECT query_id, doc_id AS id, rank FROM lexrk
        |  WHERE rank <= 20 AND doc_id <> query_id),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |eq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
        |cosd AS (SELECT eq.query_id, e.vec_id AS id,
        |    list_dot_product(e.v, eq.qv)
        |      / (sqrt(list_dot_product(e.v, e.v))
        |         * sqrt(list_dot_product(eq.qv, eq.qv))) AS cosine
        |  FROM e CROSS JOIN eq WHERE e.vec_id <> eq.query_id),
        |semrk AS (SELECT query_id, id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, id) AS rank FROM cosd),
        |sem AS (SELECT query_id, id, rank FROM semrk WHERE rank <= 20),
        |u AS (SELECT query_id, id, 1.0 / (rank + 60) AS t FROM lex
        |  UNION ALL SELECT query_id, id, 1.0 / (rank + 60) AS t FROM sem),
        |f AS (SELECT query_id, id, sum(t) AS s,
        |    CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY 1, 2),
        |rk AS (SELECT query_id, id, s, n_lists,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY s DESC, id) AS BIGINT) AS rank FROM f)
        |SELECT query_id, id AS doc_id, round(s, 6) AS rrf, n_lists, rank
        |FROM rk WHERE rank <= 10""".stripMargin,
    "q_pmi" ->
      """WITH tok AS (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |uni AS (SELECT w, count(*) AS c
        |  FROM (SELECT unnest(ws) AS w FROM tok) GROUP BY 1),
        |bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2
        |  FROM tok, LATERAL (SELECT unnest(range(1, len(ws))) AS i) r),
        |cb AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2
        |  HAVING count(*) >= 5),
        |tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS t_tok,
        |    CAST(sum(len(ws) - 1) AS BIGINT) AS b_tok FROM tok),
        |sc AS (SELECT w1, w2, c_xy,
        |    ln(CAST(c_xy * t_tok * t_tok AS DOUBLE) /
        |       CAST(b_tok * u1.c * u2.c AS DOUBLE)) AS p
        |  FROM cb JOIN uni u1 ON u1.w = cb.w1 JOIN uni u2 ON u2.w = cb.w2
        |  CROSS JOIN tot)
        |SELECT w1, w2, c_xy, round(p, 4) AS pmi FROM sc
        |ORDER BY p DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_fuzzy_snm" ->
      """WITH r AS (SELECT p_partkey AS id, p_name AS t,
        |    CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS rn
        |  FROM part)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
        |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 4
        |WHERE levenshtein(a.t, b.t) <= 2""".stripMargin,
    "q_bm25_tag" ->
      """WITH tp(topic_id, ttext) AS (VALUES
        |    (1, 'join hash merge'), (2, 'window stream batch'),
        |    (3, 'scan filter table')),
        |tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |qt AS (SELECT CAST(topic_id AS BIGINT) AS topic_id,
        |    unnest(list_distinct(regexp_split_to_array(trim(lower(ttext)), '\s+'))) AS term
        |  FROM tp),
        |dfq AS (SELECT w AS term, count(*) AS df
        |  FROM (SELECT doc_id, unnest(list_distinct(ws)) AS w FROM tok)
        |  WHERE w IN (SELECT term FROM qt) GROUP BY 1),
        |corp AS (SELECT count(*) AS n_docs,
        |    CAST(sum(len(ws)) AS BIGINT) AS sum_dl FROM tok),
        |tf AS (SELECT qt.topic_id, t.doc_id, len(t.ws) AS dl, w.term,
        |    coalesce(dfq.df, 0) AS df, count(*) AS tf
        |  FROM tok t, LATERAL (SELECT unnest(t.ws) AS term) w
        |  JOIN qt ON qt.term = w.term
        |  LEFT JOIN dfq ON dfq.term = w.term
        |  GROUP BY 1, 2, 3, 4, 5),
        |sc AS (SELECT topic_id, doc_id,
        |    round(sum(
        |      ln(1.0 + (corp.n_docs - tf.df + 0.5) / (tf.df + 0.5)) *
        |      ((tf.tf * 2.25) /
        |       (tf.tf + 1.25 * ((1.0 - 0.75) +
        |         ((0.75 * tf.dl) / (CAST(corp.sum_dl AS DOUBLE) / corp.n_docs)))))
        |    ), 4) AS score
        |  FROM tf CROSS JOIN corp GROUP BY 1, 2),
        |rk AS (SELECT doc_id, topic_id, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, topic_id) AS BIGINT) AS rank FROM sc)
        |SELECT doc_id, topic_id, score, rank FROM rk""".stripMargin,
    "q_skipgram" ->
      """WITH tok AS (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |uni AS (SELECT w, count(*) AS c
        |  FROM (SELECT unnest(ws) AS w FROM tok) GROUP BY 1),
        |bg AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
        |  FROM tok, LATERAL (SELECT unnest(range(1, len(ws))) AS i) r
        |  UNION ALL
        |  SELECT ws[i] AS w1, ws[i + 2] AS w2
        |  FROM tok, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r),
        |cb AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2
        |  HAVING count(*) >= 5),
        |tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS t_tok,
        |    CAST(sum(greatest(len(ws) - 1, 0) + greatest(len(ws) - 2, 0))
        |         AS BIGINT) AS b_tok FROM tok),
        |sc AS (SELECT w1, w2, c_xy,
        |    ln(CAST(c_xy * t_tok * t_tok AS DOUBLE) /
        |       CAST(b_tok * u1.c * u2.c AS DOUBLE)) AS p
        |  FROM cb JOIN uni u1 ON u1.w = cb.w1 JOIN uni u2 ON u2.w = cb.w2
        |  CROSS JOIN tot)
        |SELECT w1, w2, c_xy, round(p, 4) AS pmi FROM sc
        |ORDER BY p DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_vocab_stats" ->
      """WITH tok AS (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |uni AS (SELECT w, count(*) AS c
        |  FROM (SELECT unnest(ws) AS w FROM tok) GROUP BY 1)
        |SELECT CAST(sum(c) AS BIGINT) AS t_tok,
        |  count(*) AS vocab,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  CAST(max(c) AS BIGINT) AS top_c,
        |  (10000 * CAST(max(c) AS BIGINT)) // CAST(sum(c) AS BIGINT) AS top_bp
        |FROM uni""".stripMargin,
    "q_fuzzy_join" ->
      """WITH pr AS (SELECT p_partkey AS probe_id,
        |    substr(p_name, 1, 10) || substr(p_name, 12) AS ptext
        |  FROM part WHERE p_partkey % 997 = 0),
        |j AS (SELECT pr.probe_id, p.p_partkey AS part_id,
        |    levenshtein(pr.ptext, p.p_name) AS d
        |  FROM pr JOIN part p
        |    ON substr(pr.ptext, 1, 3) = substr(p.p_name, 1, 3)
        |    AND abs(length(pr.ptext) - length(p.p_name)) <= 2)
        |SELECT probe_id, part_id, CAST(d AS BIGINT) AS dist
        |FROM j WHERE d <= 2""".stripMargin,
    "q_bm25" ->
      """WITH q(query_id, qtext) AS (VALUES
        |    (1, 'spark join table'), (2, 'fast hash value'),
        |    (3, 'window order data')),
        |tok AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |post AS (SELECT doc_id, len(ws) AS dl, w AS term, count(*) AS tf
        |  FROM tok, LATERAL (SELECT unnest(ws) AS w) r GROUP BY 1, 2, 3),
        |corp AS (SELECT count(DISTINCT doc_id) AS n_docs,
        |    CAST(sum(tf) AS BIGINT) AS sum_dl FROM post),
        |dfq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
        |qt AS (SELECT query_id,
        |    unnest(list_distinct(regexp_split_to_array(trim(lower(qtext)), '\s+'))) AS term
        |  FROM q),
        |sc AS (SELECT CAST(qt.query_id AS BIGINT) AS query_id, post.doc_id,
        |    round(sum(
        |      ln(1.0 + (corp.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      ((post.tf * 2.25) /
        |       (post.tf + 1.25 * ((1.0 - 0.75) +
        |         ((0.75 * post.dl) / (CAST(corp.sum_dl AS DOUBLE) / corp.n_docs)))))
        |    ), 4) AS score
        |  FROM post JOIN qt USING (term) JOIN dfq USING (term) CROSS JOIN corp
        |  GROUP BY 1, 2),
        |rk AS (SELECT query_id, doc_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM sc)
        |SELECT * FROM rk WHERE rank <= 10""".stripMargin,
    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |post AS (SELECT doc_id, w AS term, count(*) AS tf
        |  FROM tok, LATERAL (SELECT unnest(ws) AS w) r GROUP BY 1, 2),
        |corp AS (SELECT count(DISTINCT doc_id) AS n_docs FROM post),
        |dfq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
        |sc AS (SELECT post.doc_id, post.term,
        |    CAST(post.tf AS DOUBLE) *
        |      ln(CAST(corp.n_docs AS DOUBLE) / dfq.df) AS s
        |  FROM post JOIN dfq USING (term) CROSS JOIN corp),
        |rk AS (SELECT doc_id, term, s,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY s DESC, term) AS BIGINT) AS rank
        |  FROM sc)
        |SELECT doc_id, term, round(s, 4) AS score, rank
        |FROM rk WHERE rank <= 3""".stripMargin,
    "q_cdc_chunks" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |cu AS (SELECT doc_id, ws,
        |  list_filter(CASE WHEN len(ws) >= 5 THEN
        |    list_transform(range(1, len(ws) - 3), g ->
        |      CASE WHEN CAST('0x' ||
        |          substr(md5(array_to_string(ws[g:g+4], ' ')), 1, 15)
        |          AS BIGINT) % 8 = 0
        |        THEN g + 3 ELSE -1 END)
        |    ELSE [] END, x -> x >= 0) AS cuts FROM tok),
        |st AS (SELECT doc_id, ws,
        |  list_filter(list_sort(list_distinct(
        |    [0] || list_transform(cuts, c -> c + 1))),
        |    x -> x < len(ws)) AS starts
        |  FROM cu)
        |SELECT doc_id, CAST(ci - 1 AS BIGINT) AS chunk_idx,
        |  CAST(starts[ci] AS BIGINT) AS tok_start,
        |  CAST(coalesce(starts[ci + 1], len(ws)) - starts[ci] AS BIGINT)
        |    AS n_tok,
        |  md5(array_to_string(
        |    ws[starts[ci] + 1 : coalesce(starts[ci + 1], len(ws))], ' '))
        |    AS chunk_md5
        |FROM st, LATERAL (SELECT unnest(range(1, len(starts) + 1)) AS ci) r""".stripMargin,
    "q_cdc_dedup" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |cu AS (SELECT doc_id, ws,
        |  list_filter(CASE WHEN len(ws) >= 5 THEN
        |    list_transform(range(1, len(ws) - 3), g ->
        |      CASE WHEN CAST('0x' ||
        |          substr(md5(array_to_string(ws[g:g+4], ' ')), 1, 15)
        |          AS BIGINT) % 8 = 0
        |        THEN g + 3 ELSE -1 END)
        |    ELSE [] END, x -> x >= 0) AS cuts FROM tok),
        |st AS (SELECT doc_id, ws,
        |  list_filter(list_sort(list_distinct(
        |    [0] || list_transform(cuts, c -> c + 1))),
        |    x -> x < len(ws)) AS starts
        |  FROM cu),
        |ch AS (SELECT
        |  coalesce(starts[ci + 1], len(ws)) - starts[ci] AS nt,
        |  md5(array_to_string(
        |    ws[starts[ci] + 1 : coalesce(starts[ci + 1], len(ws))], ' ')) AS h
        |  FROM st, LATERAL (SELECT unnest(range(1, len(starts) + 1)) AS ci) r),
        |per AS (SELECT h, count(*) AS cnt, min(nt) AS nt FROM ch GROUP BY 1)
        |SELECT CAST(sum(cnt) AS BIGINT) AS total_chunks,
        |  count(*) AS distinct_chunks,
        |  CAST(sum(cnt * nt) AS BIGINT) AS total_tok,
        |  CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * nt ELSE 0 END)
        |       AS BIGINT) AS dup_tok,
        |  (10000 * CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * nt ELSE 0 END)
        |       AS BIGINT)) // CAST(sum(cnt * nt) AS BIGINT) AS dup_bp
        |FROM per""".stripMargin,
    "q_winnow" -> winnowOracleSql(minShared = None),
    "q_winnow_indexed" -> winnowIndexedOracleSql,
    // oracle VERBATIM with q_winnow_indexed: append ∘ compact preserves
    // probe output exactly (the compaction collapses partitions, never
    // rows)
    "q_winnow_compact" -> winnowIndexedOracleSql,
    "q_winnow_ingest" -> winnowIngestOracleSql,
    // oracle VERBATIM with q_winnow_ingest: compaction between batches
    // and a replayed final batch change nothing — re-derived emission
    "q_winnow_ingest_compact" -> winnowIngestOracleSql,
    // oracle VERBATIM with q_winnow_indexed: build(quarter)∘append(rest
    // of evens) must equal build(evens)
    "q_winnow_indexed_append" -> winnowIndexedOracleSql,
    "q_winnow_pairs" -> winnowOracleSql(minShared = Some(3L)),
    "q_winnow_resolve" -> winnowResolveOracleSql(minShared = 3L),
    "q_winnow_verify" -> winnowVerifyOracleSql(minShared = 3L),
    "q_substr_dedup" ->
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |occ AS (SELECT doc_id, i - 1 AS pos,
        |    CAST('0x' || substr(md5(array_to_string(ws[i:i+7], ' ')), 1, 15)
        |         AS BIGINT) AS gk
        |  FROM tok, LATERAL (SELECT unnest(range(1, len(ws) - 6)) AS i) r),
        |dup AS (SELECT gk FROM occ GROUP BY gk HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, p
        |  FROM occ JOIN dup USING (gk),
        |       LATERAL (SELECT unnest(range(pos, pos + 8)) AS p) r),
        |sp AS (SELECT doc_id, count(*) AS dup_tok,
        |    CAST(sum(CASE WHEN lg = p - 1 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS dup_spans
        |  FROM (SELECT doc_id, p,
        |      lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS lg FROM cov)
        |  GROUP BY doc_id),
        |tp AS (SELECT doc_id, unnest(ws) AS w,
        |    unnest(range(0, len(ws))) AS p FROM tok),
        |mk AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS masked
        |  FROM tp ANTI JOIN cov USING (doc_id, p) GROUP BY doc_id)
        |SELECT t.doc_id, len(t.ws) AS n_tok,
        |  coalesce(sp.dup_tok, 0) AS dup_tok,
        |  coalesce(sp.dup_spans, 0) AS dup_spans,
        |  (10000 * coalesce(sp.dup_tok, 0)) // len(t.ws) AS dup_bp,
        |  coalesce(mk.masked, '') AS masked
        |FROM tok t LEFT JOIN sp USING (doc_id) LEFT JOIN mk USING (doc_id)""".stripMargin,
    "q_sample_quantile" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST('0x' || substr(md5(l_orderkey || '|' || l_linenumber), 1, 15)
        |      AS BIGINT) AS h,
        |    l_orderkey, l_linenumber
        |  FROM lineitem),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY h, l_orderkey, l_linenumber, cents) AS rk FROM c)
        |SELECT l_returnflag,
        |  quantile_cont(cents, 0.25) AS q250,
        |  quantile_cont(cents, 0.5)  AS q500,
        |  quantile_cont(cents, 0.75) AS q750
        |FROM r WHERE rk <= 500 GROUP BY 1""".stripMargin,
    "q_split" -> {
      // cut points computed EXACTLY as Tbl.splitByHash computes them
      // (cumulative scanLeft in double, truncated), then interpolated
      val m = 1L << 30
      val cuts = Seq(0.8, 0.1, 0.1).scanLeft(0.0)(_ + _).tail
        .map(f => (m * f).toLong)
      s"""WITH h AS (SELECT doc_id, source,
         |    CAST('0x' || substr(md5(source), 1, 15) AS BIGINT) % $m AS hv
         |  FROM documents)
         |SELECT doc_id, source,
         |  CASE WHEN hv < ${cuts(0)} THEN 'train'
         |       WHEN hv < ${cuts(1)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h""".stripMargin
    },
    "q_domain_quota" ->
      """WITH d AS (SELECT doc_id, lower(source) || '.com' AS domain
        |  FROM documents),
        |r AS (SELECT doc_id, domain,
        |    row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rk
        |  FROM d)
        |SELECT doc_id, domain FROM r WHERE rk <= 10""".stripMargin,
    "q_interleave_temp" ->
      """WITH d AS (SELECT doc_id, lang FROM documents
        |  WHERE lang IN ('de','en','es','fr','zh')),
        |c AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
        |p AS (SELECT d.doc_id, d.lang AS tag,
        |    (row_number() OVER (PARTITION BY d.lang ORDER BY d.doc_id) - 0.5)
        |      / sqrt(c.n) AS pos
        |  FROM d JOIN c ON d.lang = c.lang)
        |SELECT doc_id, tag,
        |  row_number() OVER (ORDER BY pos, tag, doc_id) AS mix_ord
        |FROM p""".stripMargin,
    // generic regex mirrors of parse_url + the registered-domain heuristic;
    // DuckDB regexp_extract returns '' on miss where parse_url gives NULL,
    // hence the nullif on params
    "q_url_ops" ->
      """WITH u AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      'HTTPS://www.' || source || '.Example.COM:443/' || lang || '/p'
        |        || doc_id || '?b=' || (doc_id % 3) || '&a=1#sec'
        |    ELSE 'http://' || source || '.news.CO.UK:8080/a/b/c?z=9' END AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url,
        |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^:/?#]+)', 1) AS host,
        |    lower(regexp_extract(url, '^([a-zA-Z]+)://', 1)) AS scheme,
        |    regexp_extract(url,
        |      '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)', 1) AS port,
        |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS q
        |  FROM u),
        |d AS (SELECT *, string_split(lower(host), '.') AS labels FROM p)
        |SELECT doc_id, host,
        |  CASE WHEN len(labels) <= 1 THEN lower(host)
        |       WHEN len(labels) >= 3
        |            AND labels[len(labels)-1] IN
        |              ('co','com','net','org','gov','edu','ac','or','ne')
        |            AND length(labels[len(labels)]) = 2
        |       THEN array_to_string(labels[len(labels)-2:len(labels)], '.')
        |       ELSE array_to_string(labels[len(labels)-1:len(labels)], '.')
        |  END AS domain,
        |  CAST(len(list_filter(string_split(path, '/'), x -> x <> ''))
        |    AS BIGINT) AS depth,
        |  nullif(regexp_extract(url, '[?&]a=([^&#]*)', 1), '') AS pa,
        |  nullif(regexp_extract(url, '[?&]b=([^&#]*)', 1), '') AS pb,
        |  scheme || '://' || lower(host) ||
        |    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
        |              AND NOT (scheme = 'https' AND port = '443')
        |         THEN ':' || port ELSE '' END ||
        |    path ||
        |    CASE WHEN q = '' THEN ''
        |         ELSE '?' || array_to_string(list_sort(string_split(q, '&')), '&')
        |    END AS norm
        |FROM d""".stripMargin,
    "q_resample" ->
      """WITH f AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value > 195),
        |b AS (SELECT event_type, day, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS vsum_cents
        |  FROM f GROUP BY 1, 2),
        |r AS (SELECT event_type, min(day) AS lo, max(day) AS hi
        |  FROM b GROUP BY 1),
        |spine AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM r)
        |SELECT spine.event_type, CAST(spine.day AS DATE) AS day,
        |  coalesce(n, 0) AS n, coalesce(vsum_cents, 0) AS vsum_cents
        |FROM spine LEFT JOIN b USING (event_type, day)""".stripMargin,
    "q_pack_sequences" ->
      """WITH c AS (SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM documents),
        |s AS (SELECT doc_id, n_chars, cum, cum - n_chars AS strt FROM c
        |  WHERE n_chars > 0),
        |e AS (SELECT doc_id, strt, cum,
        |    unnest(range(strt // 2048, (cum - 1) // 2048 + 1)) AS seq_id
        |  FROM s)
        |SELECT doc_id, seq_id,
        |  greatest(seq_id * 2048, strt) - strt AS tok_start,
        |  least((seq_id + 1) * 2048, cum) - strt AS tok_end,
        |  greatest(seq_id * 2048, strt) - seq_id * 2048 AS seq_off
        |FROM e""".stripMargin,
    "q_pack_stats" ->
      """WITH c AS (SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM documents),
        |s AS (SELECT doc_id, n_chars, cum, cum - n_chars AS strt FROM c
        |  WHERE n_chars > 0),
        |e AS (SELECT doc_id, strt, cum,
        |    unnest(range(strt // 2048, (cum - 1) // 2048 + 1)) AS seq_id
        |  FROM s),
        |p AS (SELECT seq_id,
        |    greatest(seq_id * 2048, strt) - strt AS tok_start,
        |    least((seq_id + 1) * 2048, cum) - strt AS tok_end
        |  FROM e)
        |SELECT CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(coalesce(sum(tok_end - tok_start), 0) AS BIGINT) AS n_tokens,
        |  CAST(count(*) FILTER (WHERE tok_start > 0) AS BIGINT)
        |    AS n_crossings,
        |  CASE WHEN count(DISTINCT seq_id) > 0 THEN
        |    round(sum(tok_end - tok_start)
        |      / (count(DISTINCT seq_id) * 2048), 6) END AS fill_rate,
        |  CASE WHEN count(DISTINCT seq_id) > 0 THEN
        |    round(count(*) / count(DISTINCT seq_id), 6) END AS segs_per_seq
        |FROM p""".stripMargin,
    "q_interleave" ->
      """WITH a AS (SELECT o_orderkey, 'urgent' AS tag,
        |    (row_number() OVER (ORDER BY o_orderkey) - 0.5) / 2.0 AS pos
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |b AS (SELECT o_orderkey, 'high' AS tag,
        |    (row_number() OVER (ORDER BY o_orderkey) - 0.5) / 1.0 AS pos
        |  FROM orders WHERE o_orderpriority = '2-HIGH'),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT tag, o_orderkey,
        |  row_number() OVER (ORDER BY pos, tag, o_orderkey) AS mix_ord
        |FROM u""".stripMargin,
    "q_quota_sample" ->
      """SELECT lang, source, doc_id, n_chars FROM (
        |  SELECT lang, source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang, source
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) t WHERE rn <= 3""".stripMargin,
    "q_contamination" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |    FROM documents),
        |  gr AS (SELECT doc_id, list_distinct(
        |      CASE WHEN len(w) >= 5 THEN
        |        list_transform(range(1, len(w) - 3),
        |                       i -> array_to_string(list_slice(w, i, i + 4), ' '))
        |      ELSE [array_to_string(w, ' ')] END) AS gs
        |    FROM toks),
        |  tg AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g FROM gr),
        |  bg AS (SELECT DISTINCT g FROM
        |    (SELECT unnest(gs) AS g FROM gr WHERE doc_id % 17 = 0))
        |SELECT tg.doc_id, tg.n_grams, count(*) AS n_contaminated,
        |  round(count(*) * 1.0 / tg.n_grams, 4) AS contaminated_frac
        |FROM tg JOIN bg USING (g) GROUP BY 1, 2""".stripMargin,
    "q_decontaminate" -> decontaminateOracleSql,
    // persisted-artifact scrub == inline scrub: the oracle is SHARED
    "q_decontam_pers" -> decontaminateOracleSql,
    // append(half) ∘ build(half) == build(whole): same oracle verbatim
    "q_decontam_append" -> decontaminateOracleSql,
    "q_ngram_jaccard" -> ngramJaccardOracleSql(0.5),
    "q_pipeline_e2e" ->
      """WITH RECURSIVE qual AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT *,
        |      len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tok,
        |      length(regexp_replace(trim(text), '\s+', '', 'g')) AS n_nosp,
        |      length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 / length(text) AS punct,
        |      length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) AS digits,
        |      length(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0 / length(text) AS uppers
        |    FROM documents) q
        |  WHERE ((CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END) +
        |         (CASE WHEN n_nosp * 1.0 / n_tok BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) +
        |         (CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END) +
        |         (CASE WHEN digits <= 0.2 THEN 1.0 ELSE 0.0 END) +
        |         (CASE WHEN uppers <= 0.3 THEN 1.0 ELSE 0.0 END)) / 5 >= 0.6),
        |  toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM qual),
        |  sh AS (SELECT doc_id, unnest(list_distinct(
        |      CASE WHEN len(w) >= 3 THEN
        |        list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [array_to_string(w, ' ')] END)) AS g
        |    FROM toks),
        |  sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |  prs AS (SELECT id_a, id_b FROM (
        |      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) p
        |    JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |    WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5),
        |  edges AS (SELECT id_a AS s, id_b AS d FROM prs UNION SELECT id_b, id_a FROM prs),
        |  reach(id, r) AS (SELECT s, s FROM edges
        |    UNION SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.id),
        |  lab AS (SELECT id, min(r) AS lbl FROM reach GROUP BY 1),
        |  canon AS (SELECT * FROM qual
        |    WHERE doc_id NOT IN (SELECT id FROM lab WHERE lbl < id)),
        |  sc AS (SELECT doc_id, text,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        t -> t IN ('the','and','of','to','is'))) AS s_en,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        t -> t IN ('der','und','die','das','ist'))) AS s_de,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        t -> t IN ('le','la','et','les','est'))) AS s_fr,
        |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |        t -> t IN ('el','de','la','que','es'))) AS s_es
        |  FROM canon)
        |SELECT
        |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
        |       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |       WHEN s_es = greatest(s_en, s_de, s_es) THEN 'es'
        |       WHEN s_en = greatest(s_en, s_de) THEN 'en'
        |       ELSE 'de' END AS pred,
        |  count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT) AS sum_tok,
        |  round(sum(length(text)), 2) / count(*) AS avg_chars
        |FROM sc GROUP BY 1""".stripMargin,
    "q_dedup_resolve" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |    FROM documents),
        |  sh0 AS (SELECT doc_id, unnest(list_distinct(
        |      CASE WHEN len(w) >= 3 THEN
        |        list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |      ELSE [array_to_string(w, ' ')] END)) AS g
        |    FROM toks),
        |  sh AS (SELECT sh0.* FROM sh0
        |    JOIN (SELECT g FROM sh0 GROUP BY g HAVING count(*) <= 1000) ok USING (g)),
        |  sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |  prs AS (SELECT id_a, id_b FROM (
        |      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) p
        |    JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |    WHERE common * 1.0 / (sa.sz + sb.sz - common) >= 0.5),
        |  edges AS (SELECT id_a AS s, id_b AS d FROM prs
        |            UNION SELECT id_b, id_a FROM prs),
        |  reach(id, r) AS (SELECT s, s FROM edges
        |    UNION SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.id),
        |  lab AS (SELECT id, min(r) AS lbl FROM reach GROUP BY 1)
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM lab WHERE lbl < id)""".stripMargin,
    // brute-force ANN is deterministic (cosine DESC, item_id tie-break) and
    // SQL-expressible: mirror the double-cast, the explicit dot/norm formula
    // (same left-to-right summation as the DotProduct codegen), and the
    // round(6) exactly
    "q_ann_bruteforce" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |  q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |  scored AS (
        |    SELECT q.query_id, e.vec_id AS item_id,
        |           list_dot_product(e.v, q.qv)
        |             / (sqrt(list_dot_product(e.v, e.v))
        |                * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
        |    FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |  rk AS (SELECT query_id, item_id, cosine,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, item_id) AS rk
        |         FROM scored)
        |SELECT query_id, item_id, rk, round(cosine, 6) AS cosine
        |FROM rk WHERE rk <= 3""".stripMargin,
    // minhash at fixed seed is deterministic end to end with the portable
    // md5 shingle leaf: the oracle recomputes signatures from the SAME
    // permutation coefficients (interpolated below), mimics banding by
    // direct band-slice equality (bucket-hash equality minus vanishing
    // xxhash collisions, which the est>=threshold filter kills anyway),
    // and scores agreement/k exactly like ArrayEqCount.
    "q_dedup_minhash" -> minhashOracleSql(bands = 16, rows = 2,
      threshold = 0.3, seed = 42L),
    "q_dedup_simhash" -> simhashOracleSql(maxDist = 7),
    // hyperplane signatures ARE SQL-portable when the planes are
    // interpolated as literals: list_dot_product sums left-to-right exactly
    // like the DotProduct codegen (the q_ann_bruteforce oracle already
    // leans on that), so sign bits, buckets, and the cosine filter agree
    // bit-for-bit — and the output is ids only.
    "q_embed_neardup" -> embedNearDupOracleSql(dim = 64, nPlanes = 8,
      seed = 42L, threshold = 0.999),
    "q_ann_lsh" -> annLshOracleSql(dim = 64, nPlanes = 8, nTables = 8,
      k = 3, seed = 42L),
    // radius-1 multi-probe has a clean relational form: a query's probe
    // set hits a corpus bucket iff the two signatures differ in <= 1 bit —
    // bit_count(xor(sigs)) <= 1 replaces the whole probe-set expansion
    "q_knn_join" -> knnJoinOracleSql(dim = 64, nPlanes = 10, nTables = 8,
      k = 2, seed = 42L),
    "q_ann_ivf" -> annIvfOracleSql(nCentroids = 16, nProbe = 4, k = 3),
    "q_kmeans" -> kmeansOracleSql(k = 8, iters = 2),
    // the multimodal payload is ASCII text (both sides strip non-ASCII
    // code points first — Spark's binary slices are BYTE-indexed, this
    // varchar side is CHARACTER-indexed, and they only agree at one byte
    // per char), so DuckDB reproduces every binary operation on the
    // VARCHAR side: substr == binary slice, the md5-leaf metadata stub
    // interpolates the same salts, and Spark's double->int cast truncation
    // is matched with trunc() (DuckDB CAST rounds). ts_ms stays exact:
    // duration * i / 2 is a half-integer.
    "q_multimodal" ->
      """WITH h0 AS (SELECT doc_id AS media_id,
        |    regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS text
        |  FROM documents),
        |h AS (SELECT media_id, text,
        |    substr(text, 1, 16) AS hdr FROM h0),
        |m AS (SELECT media_id, text,
        |    CAST(('0x' || substr(md5(hdr || '|0'), 1, 15)) AS BIGINT) % 4 + 1 AS fmt_idx,
        |    CAST((CAST(('0x' || substr(md5(hdr || '|1'), 1, 15)) AS BIGINT) % 1920 + 32) AS INT) AS width,
        |    CAST((CAST(('0x' || substr(md5(hdr || '|2'), 1, 15)) AS BIGINT) % 1080 + 32) AS INT) AS height,
        |    CAST(('0x' || substr(md5(hdr || '|3'), 1, 15)) AS BIGINT) % 600000 AS duration_ms
        |  FROM h),
        |f AS (SELECT m.*, unnest([0, 1]) AS frame_idx FROM m),
        |s AS (SELECT *, substr(text,
        |    CAST(trunc(frame_idx * greatest(length(text) / 2.0, 1.0) + 1) AS INT),
        |    64) AS fb FROM f)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |  (['jpeg', 'png', 'wav', 'mp4'])[fmt_idx] AS format,
        |  width, height, duration_ms,
        |  duration_ms * frame_idx / 2 AS ts_ms,
        |  CAST(length(fb) AS BIGINT) AS frame_chars,
        |  md5(fb) AS frame_md5
        |FROM s""".stripMargin
  )

  /** DuckDB replica of `q_kmeans`: 1e6-quantized vectors, 60-bit md5 init
    * sample, each Lloyd iteration replayed CTE by CTE. Every sum and dot
    * here is an exact integer in double (|dim value| < 6e5, 64 dims, ≤2e4
    * rows → all magnitudes < 2^53), so both engines compute identical
    * doubles, identical argmins, identical labels — no rounding anywhere.
    */
  private def kmeansOracleSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (SELECT vec_id,
              |    list_transform(embedding,
              |      x -> floor(CAST(x AS DOUBLE) * 1000000.0)) AS v
              |  FROM embeddings),
              |c0 AS (SELECT
              |    CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
              |      AS BIGINT) AS cid,
              |    v AS cvec
              |  FROM q ORDER BY cid LIMIT $k),
              |""".stripMargin
    val d = "list_dot_product(c.cvec, c.cvec)" +
      " - 2.0 * list_dot_product(q.v, c.cvec)"
    for (i <- 0 to iters) {
      val sep = if (i < iters) "," else ""
      sb ++= s"""a$i AS (SELECT vec_id, v, cid FROM (
                |  SELECT q.vec_id, q.v, c.cid,
                |    row_number() OVER (PARTITION BY q.vec_id
                |      ORDER BY $d, c.cid) AS rk
                |  FROM q CROSS JOIN c$i c) WHERE rk = 1)$sep
                |""".stripMargin
      if (i < iters) {
        sb ++= s"""u$i AS (SELECT cid, ii.i AS i, sum(v[ii.i]) AS s,
                  |    count(*) AS n
                  |  FROM a$i, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) ii
                  |  GROUP BY cid, ii.i),
                  |c${i + 1} AS (SELECT cid, list(s / n ORDER BY i) AS cvec
                  |  FROM u$i GROUP BY cid),
                  |""".stripMargin
      }
    }
    sb ++= s"SELECT vec_id, cid AS cluster FROM a$iters"
    sb.toString
  }

  /** DuckDB replica of `q_ann_ivf`: portable-hash centroid sample (16
    * smallest md5-based id hashes), nearest-centroid assignment and
    * nProbe-nearest query probes with the same (cdist desc, centroid_id)
    * tie-break, exact-cosine ranking of probed candidates.
    */
  private def annIvfOracleSql(nCentroids: Int, nProbe: Int, k: Int): String = {
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) " +
        s"* sqrt(list_dot_product($b, $b)))"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |hu AS (SELECT vec_id, v,
       |    CAST(CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
       |         AS BIGINT) AS HUGEINT) * 4294967296
       |      + CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 9, 8))
       |        AS BIGINT) AS u
       |  FROM e),
       |h AS (SELECT vec_id, v,
       |    CAST(CASE WHEN u >= 9223372036854775808
       |         THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS hid
       |  FROM hu),
       |cent AS (SELECT hid AS centroid_id, v AS cvec FROM h
       |  ORDER BY hid LIMIT $nCentroids),
       |assign AS (SELECT e.vec_id, cent.centroid_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cos("e.v", "cent.cvec")} DESC, cent.centroid_id)
       |      AS crk
       |  FROM e CROSS JOIN cent),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, i.vec_id AS item_id
       |  FROM (SELECT * FROM assign WHERE crk <= $nProbe AND vec_id < 10) q
       |  JOIN (SELECT * FROM assign WHERE crk = 1) i
       |    ON i.centroid_id = q.centroid_id
       |  WHERE i.vec_id <> q.vec_id),
       |scored AS (SELECT cand.query_id, cand.item_id,
       |    ${cos("cv.v", "qv.v")} AS cosine
       |  FROM cand
       |  JOIN e cv ON cv.vec_id = cand.item_id
       |  JOIN e qv ON qv.vec_id = cand.query_id),
       |rk AS (SELECT query_id, item_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, item_id) AS rk
       |  FROM scored)
       |SELECT query_id, item_id, CAST(rk AS BIGINT) AS rk
       |FROM rk WHERE rk <= $k""".stripMargin
  }

  /** DuckDB replica of `q_knn_join`: odd-id queries against the even-id
    * corpus, per-table hyperplane signatures (interpolated planes),
    * radius-1 multi-probe as Hamming-distance-1 signature match, exact
    * cosine ranking.
    */
  private def knnJoinOracleSql(dim: Int, nPlanes: Int, nTables: Int,
                               k: Int, seed: Long): String = {
    def sigExpr(tbl: Int): String = {
      val ps = Similarity.planes(dim, nPlanes, seed + tbl)
      ps.zipWithIndex.map { case (p, j) =>
        val lits = p.map(_.toString).mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product(v, ${lits}::DOUBLE[]) >= 0 " +
          s"THEN ${1L << j} ELSE 0 END"
      }.mkString("(", "\n      + ", ")")
    }
    val sigCols = (0 until nTables).map(t => s"${sigExpr(t)} AS sig$t")
      .mkString(",\n    ")
    val probeHit = (0 until nTables)
      .map(t => s"bit_count(xor(c.sig$t, q.sig$t)) <= 1")
      .mkString("\n     OR ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |    $sigCols
       |  FROM e),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS item_id
       |  FROM s c JOIN s q ON ($probeHit)
       |  WHERE q.vec_id % 2 = 1 AND c.vec_id % 2 = 0),
       |scored AS (SELECT cand.query_id, cand.item_id,
       |    list_dot_product(cv.v, qv.v)
       |      / (sqrt(list_dot_product(cv.v, cv.v))
       |         * sqrt(list_dot_product(qv.v, qv.v))) AS cosine
       |  FROM cand
       |  JOIN e cv ON cv.vec_id = cand.item_id
       |  JOIN e qv ON qv.vec_id = cand.query_id),
       |rk AS (SELECT query_id, item_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, item_id) AS rk
       |  FROM scored)
       |SELECT query_id, item_id, CAST(rk AS BIGINT) AS rk
       |FROM rk WHERE rk <= $k""".stripMargin
  }

  /** DuckDB replica of `q_ann_lsh` (lshTopK): per-table hyperplane sign
    * signatures with interpolated plane literals, any-table bucket match,
    * distinct candidate pairs, exact-cosine ranking with the same
    * (cosine desc, item_id) tie-break.
    */
  private def annLshOracleSql(dim: Int, nPlanes: Int, nTables: Int,
                              k: Int, seed: Long): String = {
    def sigExpr(tbl: Int): String = {
      val ps = Similarity.planes(dim, nPlanes, seed + tbl)
      ps.zipWithIndex.map { case (p, j) =>
        val lits = p.map(_.toString).mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product(v, ${lits}::DOUBLE[]) >= 0 " +
          s"THEN ${1L << j} ELSE 0 END"
      }.mkString("(", "\n      + ", ")")
    }
    val sigCols = (0 until nTables).map(t => s"${sigExpr(t)} AS sig$t")
      .mkString(",\n    ")
    val anyTable = (0 until nTables).map(t => s"c.sig$t = q.sig$t")
      .mkString("\n     OR ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |    $sigCols
       |  FROM e),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS item_id
       |  FROM s c JOIN s q ON ($anyTable)
       |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |scored AS (SELECT cand.query_id, cand.item_id,
       |    list_dot_product(cv.v, qv.v)
       |      / (sqrt(list_dot_product(cv.v, cv.v))
       |         * sqrt(list_dot_product(qv.v, qv.v))) AS cosine
       |  FROM cand
       |  JOIN e cv ON cv.vec_id = cand.item_id
       |  JOIN e qv ON qv.vec_id = cand.query_id),
       |rk AS (SELECT query_id, item_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, item_id) AS rk
       |  FROM scored)
       |SELECT query_id, item_id, CAST(rk AS BIGINT) AS rk
       |FROM rk WHERE rk <= $k""".stripMargin
  }

  /** DuckDB replica of `q_embed_neardup`: same perturbed-copy corpus, same
    * hyperplane sign bits (plane literals from [[Similarity.planes]]),
    * bucket equality pairs, exact-cosine threshold.
    */
  private def embedNearDupOracleSql(dim: Int, nPlanes: Int, seed: Long,
                                    threshold: Double): String = {
    val ps = Similarity.planes(dim, nPlanes, seed)
    val sigSum = ps.zipWithIndex.map { case (p, j) =>
      val lits = p.map(_.toString).mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product(v, ${lits}::DOUBLE[]) >= 0 " +
        s"THEN ${1L << j} ELSE 0 END"
    }.mkString("\n      + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT vec_id + 1000000 AS vec_id,
       |    list_transform(v, x -> x * 1.001 + 0.0001) AS v FROM e),
       |both_t AS (SELECT * FROM e UNION ALL SELECT * FROM p),
       |sig AS (SELECT vec_id, v,
       |    $sigSum AS sig
       |  FROM both_t)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id
       |WHERE list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v))
       |         * sqrt(list_dot_product(b.v, b.v))) >= $threshold""".stripMargin
  }

  /** DuckDB replica of the portable-leaf simhash pipeline (see
    * `q_dedup_simhash`): md5-based 64-bit token hashes, per-bit ±1 votes,
    * disjoint-bit packing via addition (== bitwise OR), derived chunk
    * banding by shift-and-mask equality, popcount distance filter.
    */
  private def simhashOracleSql(maxDist: Int): String = {
    val nChunks = maxDist + 1
    val base = 64 / nChunks
    val rem = 64 % nChunks
    val widths = Seq.tabulate(nChunks)(c => if (c < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _).init
    val votes = (0 until 64).map { j =>
      s"sum(CASE WHEN (th & ${1L << j}) != 0 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(",\n    ")
    // disjoint bits: addition == OR; the sign bit's term (Long.Min) LAST so
    // every partial sum stays in int64 range
    val pack = ((0 until 63).map(j =>
      s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END") :+
      s"CASE WHEN b63 > 0 THEN ${1L << 63} ELSE 0 END").mkString("\n    + ")
    val chunkEq = (0 until nChunks).map { c =>
      val mask = (1L << widths(c)) - 1
      s"((a.sh >> ${offsets(c)}) & $mask) = ((b.sh >> ${offsets(c)}) & $mask)"
    }.mkString("\n     OR ")
    s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(list_distinct(
       |    regexp_split_to_array(trim(lower(text)), '\\s+'))) AS tok
       |  FROM documents),
       |thu AS (SELECT doc_id,
       |    CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)
       |         AS HUGEINT) * 4294967296
       |      + CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) AS u
       |  FROM tok),
       |th AS (SELECT doc_id,
       |    CAST(CASE WHEN u >= 9223372036854775808
       |         THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS th
       |  FROM thu),
       |bits AS (SELECT doc_id,
       |    $votes
       |  FROM th GROUP BY 1),
       |sh AS (SELECT doc_id,
       |    $pack AS sh
       |  FROM bits)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE ($chunkEq)
       |  AND bit_count(xor(a.sh, b.sh)) <= $maxDist""".stripMargin
  }

  /** DuckDB replica of the portable-leaf minhash pipeline (see
    * `q_dedup_minhash`): same md5 shingle hashes, same (a,b) permutation
    * coefficients from [[Dedup.minhashCoeffs]], slice-equality banding,
    * agreement/k scoring.
    */
  private def minhashOracleSql(bands: Int, rows: Int, threshold: Double,
                               seed: Long): String = {
    val k = bands * rows
    val p = 2147483647L
    val sigExprs = Dedup.minhashCoeffs(k, seed).map { case (a, b) =>
      s"list_min(list_transform(hs, x -> (${a} * (x % ${p}) + ${b}) % ${p}))"
    }.mkString("[\n      ", ",\n      ", "]")
    val bandCond = (0 until bands).map { t =>
      (1 to rows).map { r =>
        val i = t * rows + r
        s"a.sig[$i] = b.sig[$i]"
      }.mkString("(", " AND ", ")")
    }.mkString("\n      OR ")
    s"""WITH w AS (SELECT doc_id,
       |    regexp_split_to_array(trim(lower(text)), '\\s+') AS wr
       |  FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(
       |    range(1, len(wr) - 1),
       |    i -> CAST(concat('0x',
       |           substr(md5(wr[i] || ' ' || wr[i+1] || ' ' || wr[i+2]), 1, 15))
       |         AS BIGINT))) AS hs
       |  FROM w WHERE len(wr) >= 3),
       |sig AS (SELECT doc_id, $sigExprs AS sig FROM sh),
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    list_sum(list_transform(range(1, ${k + 1}),
       |      i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) / ${k}.0
       |      AS est
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE $bandCond)
       |SELECT id_a, id_b, round(est, 4) AS est_jaccard
       |FROM cand WHERE est >= $threshold""".stripMargin
  }

  // ======================================================================
  // Extensions: extra aggregates, theta join, set ops, cube, where()
  // ======================================================================

  /** Chained-CTE DuckDB recomputation of [[graft.graph.Graph.pageRank]]'s
    * exact integer recurrence on the symmetric customer<->supplier purchase
    * graph — one CTE per iteration, generated so the Spark config and the
    * oracle can never drift. Every op is int64 floor arithmetic, so the
    * hash compare is exact.
    */
  /** Winnowing (n=5, w=4, portable md5 leaf): fingerprints per doc, or —
    * with `minShared` — candidate pairs sharing that many fingerprints.
    * Mirrors the rightmost-minimal-per-window rule exactly.
    */
  /** odd-docs probe vs even-docs winnow corpus: the persisted-index
    * probe's oracle — shared VERBATIM by q_winnow_indexed (one-shot
    * build) and q_winnow_indexed_append (build + append). */
  private def winnowIndexedOracleSql: String =
    winnowOracleSql(minShared = None)
      .replaceFirst("\nSELECT doc_id, pos, fp FROM fp$",
        """,
          |d AS (SELECT DISTINCT doc_id, fp FROM fp)
          |SELECT p.doc_id AS id_new, c.doc_id AS id_corpus,
          |  count(*) AS n_shared
          |FROM d p JOIN d c ON p.fp = c.fp
          |WHERE p.doc_id % 2 = 1 AND c.doc_id % 2 = 0
          |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin)

  /** q_winnow_ingest / q_winnow_ingest_compact: the two-stage winnow
    * admission replayed from scratch — batch 1 (doc_id %4=2) admits
    * against the built quarter (%4=0), batch 2 (odds) admits against
    * quarter ∪ batch 1's ADMITTED set (the index-growth semantics).
    * A doc is dropped iff it shares >= 2 fps with any standing doc;
    * too-short docs (no fps) pass through via the final NOT IN. */
  private def winnowIngestOracleSql: String =
    winnowOracleSql(minShared = None)
      .replaceFirst("\nSELECT doc_id, pos, fp FROM fp$",
        """,
          |d AS (SELECT DISTINCT doc_id, fp FROM fp),
          |dup1 AS (SELECT DISTINCT p.doc_id AS id
          |  FROM d p JOIN d c ON p.fp = c.fp
          |  WHERE p.doc_id % 4 = 2 AND c.doc_id % 4 = 0
          |  GROUP BY p.doc_id, c.doc_id HAVING count(*) >= 2),
          |std2 AS (SELECT doc_id, fp FROM d WHERE doc_id % 4 = 0
          |  UNION ALL
          |  SELECT doc_id, fp FROM d WHERE doc_id % 4 = 2
          |    AND doc_id NOT IN (SELECT id FROM dup1)),
          |dup2 AS (SELECT DISTINCT p.doc_id AS id
          |  FROM d p JOIN std2 c ON p.fp = c.fp
          |  WHERE p.doc_id % 2 = 1
          |  GROUP BY p.doc_id, c.doc_id HAVING count(*) >= 2)
          |SELECT doc_id FROM documents
          |WHERE doc_id % 2 = 1
          |  AND doc_id NOT IN (SELECT id FROM dup2)""".stripMargin)

  private def winnowOracleSql(minShared: Option[Long]): String = {
    val base =
      """WITH tok AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |occ AS (SELECT doc_id, i - 1 AS pos,
        |    CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)
        |         AS BIGINT) AS gk
        |  FROM tok, LATERAL (SELECT unnest(range(1, len(ws) - 3)) AS i) r),
        |hs AS (SELECT doc_id, list(gk ORDER BY pos) AS h,
        |    list(pos ORDER BY pos) AS ps FROM occ GROUP BY 1),
        |sl AS (SELECT doc_id, h, ps,
        |  CASE WHEN len(h) >= 4 THEN
        |    list_distinct(list_transform(range(1, len(h) - 2), i ->
        |      i - 1 + 4 - list_position(list_reverse(h[i:i+3]),
        |                                list_aggregate(h[i:i+3], 'min'))))
        |  WHEN len(h) >= 1 THEN
        |    [len(h) - list_position(list_reverse(h), list_aggregate(h, 'min'))]
        |  ELSE [] END AS sels FROM hs),
        |fp AS (SELECT doc_id, ps[s + 1] AS pos, h[s + 1] AS fp
        |  FROM sl, LATERAL (SELECT unnest(sels) AS s) r)""".stripMargin
    minShared match {
      case None => base + "\nSELECT doc_id, pos, fp FROM fp"
      case Some(t) => base +
        s""",
           |d AS (SELECT DISTINCT doc_id, fp FROM fp),
           |k AS (SELECT fp FROM d GROUP BY fp HAVING count(*) <= 1000),
           |s2 AS (SELECT d.doc_id, d.fp FROM d JOIN k USING (fp))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  count(*) AS n_shared
           |FROM s2 a JOIN s2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |GROUP BY 1, 2 HAVING count(*) >= $t""".stripMargin
    }
  }

  /** winnow pairs -> transitive closure -> canonical (min-id) survivors —
    * the recursive-CTE resolve over [[winnowOracleSql]]'s pair CTE.
    */
  private def winnowResolveOracleSql(minShared: Long): String =
    "WITH RECURSIVE " +
      winnowOracleSql(Some(minShared))
        .replaceFirst("^WITH ", "")
        .replace("SELECT a.doc_id AS id_a",
          ", prs AS (SELECT a.doc_id AS id_a")
        .replace(s"HAVING count(*) >= $minShared",
          s"HAVING count(*) >= $minShared)") +
      s""",
         |edges AS (SELECT id_a AS s, id_b AS d FROM prs
         |          UNION SELECT id_b, id_a FROM prs),
         |reach(id, r) AS (SELECT s, s FROM edges
         |  UNION SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.id),
         |lab AS (SELECT id, min(r) AS lbl FROM reach GROUP BY 1)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM lab WHERE lbl < id)""".stripMargin

  /** winnow pairs graded by longest shared token run (gaps-and-islands over
    * the matched gram diagonals — `pos − row_number()` groups consecutive
    * positions, the SQL twin of the Scala `aggregate` fold).
    */
  private def winnowVerifyOracleSql(minShared: Long): String =
    winnowOracleSql(Some(minShared))
      .replace("SELECT a.doc_id AS id_a",
        ", prs AS (SELECT a.doc_id AS id_a")
      .replace(s"HAVING count(*) >= $minShared",
        s"HAVING count(*) >= $minShared)") +
      s""",
         |m AS (SELECT DISTINCT p.id_a, p.id_b, oa.pos - ob.pos AS dg,
         |    oa.pos AS pa
         |  FROM prs p
         |  JOIN occ oa ON oa.doc_id = p.id_a
         |  JOIN occ ob ON ob.doc_id = p.id_b AND ob.gk = oa.gk),
         |isl AS (SELECT id_a, id_b, dg, pa,
         |    pa - row_number() OVER (PARTITION BY id_a, id_b, dg
         |                            ORDER BY pa) AS grp
         |  FROM m),
         |rl AS (SELECT id_a, id_b, count(*) AS run
         |  FROM isl GROUP BY id_a, id_b, dg, grp),
         |mr AS (SELECT id_a, id_b, max(run) AS mx FROM rl GROUP BY 1, 2)
         |SELECT prs.id_a, prs.id_b, prs.n_shared,
         |  CAST(coalesce(mx + 4, 0) AS BIGINT) AS run_tokens
         |FROM prs LEFT JOIN mr USING (id_a, id_b)""".stripMargin

  private def pagerankOracleSql(iters: Int, dampBp: Long, scale: Long,
                                seedPred: Option[String] = None): String = {
    // seedPred: SQL predicate template over the node column — reference it
    // as `{n}` (None = uniform teleport over all nodes)
    def p(c: String) = seedPred.getOrElse("true").replace("{n}", c)
    val sb = new StringBuilder
    sb.append(
      s"""WITH
         |e AS (SELECT DISTINCT o_custkey AS src, -(l_suppkey + 1) AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  UNION SELECT DISTINCT -(l_suppkey + 1), o_custkey
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |odeg AS (SELECT src, count(*) AS odeg FROM e GROUP BY 1),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |n AS (SELECT count(*) AS cnt FROM nodes WHERE ${p("node")}),
         |pr0 AS (SELECT node,
         |  CASE WHEN ${p("node")} THEN $scale // cnt ELSE 0 END AS mass
         |  FROM nodes, n)""".stripMargin)
    for (k <- 1 to iters) {
      sb.append(
        s""",
           |pr$k AS (SELECT nd.node,
           |  (CASE WHEN ${p("nd.node")}
           |        THEN ($scale * ${10000 - dampBp}) // (10000 * n.cnt)
           |        ELSE 0 END)
           |    + ($dampBp * coalesce(im.m, 0)) // 10000 AS mass
           |  FROM nodes nd CROSS JOIN n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum(p.mass // o.odeg) AS BIGINT) AS m
           |    FROM pr${k - 1} p JOIN e ON p.node = e.src
           |    JOIN odeg o ON o.src = e.src
           |    GROUP BY 1) im ON im.node = nd.node)""".stripMargin)
    }
    sb.append(s"\nSELECT node, mass FROM pr$iters")
    sb.toString
  }

  /** DuckDB replica of `q_label_prop`: the synchronous argmax recurrence
    * replayed CTE by CTE. Votes are exact integer counts; the argmax tie
    * breaks on the smallest label — both engines compute row_number over
    * (count DESC, label ASC), so labels agree bit-for-bit.
    */
  private def labelPropOracleSql(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH
        |e AS (SELECT DISTINCT o_custkey AS src, -(l_suppkey + 1) AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  UNION SELECT DISTINCT -(l_suppkey + 1), o_custkey
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |lp0 AS (SELECT node, node AS label FROM nodes)""".stripMargin)
    for (k <- 1 to iters) {
      sb.append(
        s""",
           |lp$k AS (SELECT l.node, coalesce(b.lbl, l.label) AS label
           |  FROM lp${k - 1} l LEFT JOIN (
           |    SELECT dst, label AS lbl FROM (
           |      SELECT e.dst, v.label,
           |        row_number() OVER (PARTITION BY e.dst
           |          ORDER BY count(*) DESC, v.label ASC) AS rk
           |      FROM lp${k - 1} v JOIN e ON v.node = e.src
           |      GROUP BY e.dst, v.label) WHERE rk = 1
           |  ) b ON b.dst = l.node)""".stripMargin)
    }
    sb.append(s"\nSELECT node, label FROM lp$iters")
    sb.toString
  }

  private val extraQueries: Map[String, Q] = Map(
    "q_agg_extra" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .summarize(
          "sk"   -> round(Fns.Agg.skewCorrected(col("c_acctbal")), 4),
          "ku"   -> round(Fns.Agg.kurtCorrected(col("c_acctbal")), 4),
          "sem"  -> round(Fns.Agg.sem(col("c_acctbal")), 4),
          "cov"  -> round(covar_samp(col("c_acctbal"), col("c_nationkey")), 2),
          "dotp" -> round(Fns.Agg.dot(col("c_acctbal"), col("c_nationkey")), 2),
          "prodp" -> round(product(lit(1) + col("c_acctbal") / 100000000.0), 6),
          "idx_max" -> Fns.Agg.idxMax(col("c_custkey"),
            col("c_acctbal") + col("c_custkey") / 1000000000.0),
          "idx_min" -> Fns.Agg.idxMin(col("c_custkey"),
            col("c_acctbal") + col("c_custkey") / 1000000000.0),
          "all_pos" -> Fns.Agg.all(col("c_acctbal") > 0),
          "any_big" -> Fns.Agg.any(col("c_acctbal") > 9000))
        .df),

    "q_mad" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .mutate("dev" -> abs(col("l_quantity") - avg(col("l_quantity"))))
        .summarize("mad" -> round(avg(col("dev")), 4), "n" -> Fns.Agg.n())
        .df),

    "q_theta_join" -> ((s, dir) =>
      t(s, dir, "supplier")
        .thetaJoin(t(s, dir, "customer"), (l, r) =>
          l("s_nationkey") === r("c_nationkey") && l("s_acctbal") > r("c_acctbal"))
        .groupBy("s_nationkey")
        .summarize("n" -> Fns.Agg.n(),
                   "sum_c" -> round(sum(col("c_acctbal")), 2))
        .df),

    "q_intersect" -> ((s, dir) => {
      val pos = t(s, dir, "customer").filter(col("c_acctbal") > 0)
        .select(Seq("c_nationkey", "c_mktsegment"): _*).distinct()
      val big = t(s, dir, "customer").filter(col("c_acctbal") > 8000)
        .select(Seq("c_nationkey", "c_mktsegment"): _*).distinct()
      pos.intersect(big).df
    }),

    "q_except" -> ((s, dir) => {
      val all = t(s, dir, "customer")
        .select(Seq("c_nationkey", "c_mktsegment"): _*).distinct()
      val big = t(s, dir, "customer").filter(col("c_acctbal") > 8000)
        .select(Seq("c_nationkey", "c_mktsegment"): _*).distinct()
      all.except(big).df
    }),

    "q_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(Seq("l_returnflag", "l_linestatus"))(
          "n" -> Fns.Agg.n(),
          "sum_qty" -> round(sum(col("l_quantity")), 2))
        .df),

    "q_rollup" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup(Seq("o_orderpriority", "o_orderstatus"))(
          "n" -> Fns.Agg.n(),
          "rev" -> round(sum(col("o_totalprice")), 2))
        .df),

    "q_where_across" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.summarize(Across(c, Seq(Sel.whereNumeric),
        // robust mean: round(sum)/count (see SparkEntry notes)
        Seq("avg" -> (x => round(sum(x), 2) / count(x)))): _*).df
    }),

    // computed grouping keys (group_by kwargs create columns first,
    // siuba/dply/verbs.py:280-368)
    "q_group_computed" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("price_bucket" -> Fns.floorDiv(col("o_totalprice"), lit(100000)))
        .summarize("n" -> Fns.Agg.n(),
                   "rev" -> round(sum(col("o_totalprice")), 2))
        .df),

    // group_by keeps NULL groups (dropna=False, siuba/dply/verbs.py:366-368)
    "q_group_nulls" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .mutate("disc0" -> Fns.naIf(col("l_discount"), 0.0))
        .count(extra = Seq("disc0"))
        .df),

    // as-of (backward) join via union+window — no range-join amplification
    "q_asof_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders").df
      val snapshots = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"), col("o_orderkey"),
                col("o_totalprice").as("snap_price"))
      val left = orders.select("o_custkey", "o_orderkey", "o_totalprice")
      Tbl(left).asofJoin(Tbl(snapshots), "o_custkey", "o_orderkey")
        .df.withColumnRenamed("o_orderkey_right", "snap_orderkey")
    }),

    // range join via coarse bucketing — no inequality BNLJ amplification
    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").df
      val iv = ev.filter(col("event_id") % 100 === 0)
        .select(col("event_id").as("iv_id"), col("ts").as("start_ts"),
                (col("ts") + lit(60000000000L)).as("end_ts"))
      val pt = ev.select(col("ts"), col("value"))
      Tbl(pt).rangeJoin(Tbl(iv), "ts", "start_ts", "end_ts",
          bucketWidth = 60000000000L)
        .groupBy("iv_id")
        .summarize("n_pts" -> Fns.Agg.n(),
                   "sum_v" -> round(sum(col("value")), 2))
        .df
    }),

    // interval-overlap join: session-ish windows from two event types
    "q_interval_overlap" -> ((s, dir) => {
      val ev = t(s, dir, "events").df
      val a = ev.filter(col("event_id") % 97 === 0)
        .select(col("event_id").as("a_id"), col("ts").as("a_s"),
                (col("ts") + lit(120000000000L)).as("a_e"))
      val b = ev.filter(col("event_id") % 89 === 0)
        .select(col("event_id").as("b_id"), col("ts").as("b_s"),
                (col("ts") + lit(120000000000L)).as("b_e"))
      Tbl(graft.ops.RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e",
          bucketWidth = 120000000000L))
        .select(Seq("a_id", "b_id"): _*)
        .df
    }),

    // rolling (trailing 3-row) window family — extension
    "q_rolling" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .arrange(col("o_orderkey"))
        .mutate(
          "r_sum" -> Vec.rollingSum(col("o_totalprice"), 3).transform(round(_, 2)),
          "r_avg" -> Vec.rollingMean(col("o_totalprice"), 3)
                        .transform(x => round(x, 4)),
          "r_max" -> Vec.rollingMax(col("o_totalprice"), 3),
          "r_min" -> Vec.rollingMin(col("o_totalprice"), 3))
        .ungroup
        .select(Seq("o_custkey", "o_orderkey", "r_sum", "r_avg", "r_max", "r_min"): _*)
        .df),

    // semi-structured: JSON payload extraction from events.props
    "q_json_props" -> ((s, dir) =>
      t(s, dir, "events")
        .mutate("k" -> graft.sources.Sources.jsonGet(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .summarize(
          "n"     -> Fns.Agg.n(),
          "avg_k" -> (round(sum(col("k")), 2) / count(col("k"))),
          "max_k" -> max(col("k")))
        .df),

    // extended string-method surface (pandas str.* family, SURVEY §2.9)
    "q_str_ops2" -> ((s, dir) =>
      t(s, dir, "part")
        .mutate(
          "cnt_a"  -> Fns.Str.strCount(col("p_name"), "a"),
          "find_e" -> Fns.Str.find(col("p_name"), "e"),
          "z"      -> Fns.Str.zfill(col("p_size").cast("string"), 5),
          "ch2"    -> Fns.Str.get(col("p_name"), 2),
          "sl"     -> Fns.Str.slice(col("p_name"), 2, 7),
          "rep"    -> Fns.Str.repeat(col("p_brand"), 2),
          "alpha"  -> Fns.Str.isAlpha(col("p_type")),
          "digit"  -> Fns.Str.isDigit(col("p_size").cast("string")),
          "ttl"    -> Fns.Str.title(col("p_name")))
        .select(Seq("p_partkey", "cnt_a", "find_e", "z", "ch2", "sl", "rep",
                    "alpha", "digit", "ttl"): _*)
        .df),

    // round-4 string additions: swapcase/center/wrap/rsplit/slice_replace
    "q_str_ops3" -> ((s, dir) =>
      t(s, dir, "part")
        .mutate(
          "sw"  -> Fns.Str.swapcase(col("p_brand")),
          "ctr" -> Fns.Str.center(col("p_brand"), 15, "_"),
          "wr"  -> Fns.Str.wrap(col("p_name"), 10),
          "rs"  -> array_join(Fns.Str.rsplit(col("p_name"), " ", 1), "|"),
          "sr"  -> Fns.Str.sliceReplace(col("p_name"), 2, 5, "XX"))
        .select(Seq("p_partkey", "sw", "ctr", "wr", "rs", "sr"): _*)
        .df),

    "q_value_counts" -> ((s, dir) =>
      t(s, dir, "customer").valueCounts("c_mktsegment", normalize = true).df),

    // describeExact: sort-based percentiles -> deterministic and
    // quantile_cont-oracleable (summary()'s approx sketch is neither).
    // mean at 2dp: engine summation-order noise (~1e-7 abs here) needs the
    // wider margin; the quartiles are interpolations of cents-valued
    // doubles and round exactly at 4dp.
    "q_describe" -> ((s, dir) =>
      t(s, dir, "orders")
        .describeExact(Sel.Name("o_totalprice"), Sel.Name("o_custkey")).df
        .select(col("column"), col("count"),
          round(col("mean"), 2).as("mean"),
          round(col("stddev"), 4).as("stddev"),
          round(col("min"), 4).as("min"), round(col("q25"), 4).as("q25"),
          round(col("q50"), 4).as("q50"), round(col("q75"), 4).as("q75"),
          round(col("max"), 4).as("max"))),

    "q_weighted_mean" -> ((s, dir) =>
      t(s, dir, "orders").groupBy("o_orderpriority")
        .summarize("wm" -> round(Fns.Agg.weightedMean(
          col("o_totalprice"), col("o_orderkey") % 7 + 1), 4))
        .df),

    "q_rolling_std" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .arrange(col("o_orderkey"))
        .mutate(
          "rs"    -> Vec.rollingStd(col("o_totalprice"), 3)
                       .transform(round(_, 4)),
          // rolling variance oracled in exact integer-cents arithmetic:
          // bigint sums are order-free, so the value is bit-identical across
          // engines no matter how each accumulates the frame. var_samp at
          // ~1e10 rounded to 4dp sits ~13 ulps above double resolution and
          // is NOT oracle-stable (round-6 hash failure).
          "cents" -> round(col("o_totalprice") * 100, 0).cast("bigint"),
          "nw"    -> Vec.rollingSum(lit(1L), 3),
          "sw"    -> Vec.rollingSum(col("cents"), 3),
          "s2w"   -> Vec.rollingSum(col("cents") * col("cents"), 3),
          // ...and round half-up in integer space too: exact rationals land
          // on .00005 boundaries often, where Spark's exact-decimal HALF_UP
          // and DuckDB's float-space round() disagree (measured: 50/15000).
          // (2a+b) div 2b == round-half-up(a/b) for a,b > 0.
          "rv"    -> when(col("nw") >= 2,
            expr("CAST((2*(nw*s2w - sw*sw) + nw*(nw-1)) div (2*nw*(nw-1)) " +
                 "AS DOUBLE) / 10000.0")))
        .select(Seq("o_custkey", "o_orderkey", "rs", "rv"): _*).df),

    "q_lump_prop" -> ((s, dir) =>
      Tbl(Forcats.fctLumpProp(t(s, dir, "documents").df, "lang", prop = 0.3))
        .count(extra = Seq("lang"))
        .df),

    // theta-sketch corpus overlap triage: at these cardinalities the sketch
    // is in exact mode (2^16 retained entries >> 10k docs), so estimates
    // EQUAL true distinct counts and the query oracles against plain
    // count(DISTINCT) SQL
    "q_corpus_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      graft.ops.Scale.distinctOverlap(
        docs, docs.filter(col("doc_id") % 2 === 0), "doc_id")
    }),

    // retention cohorts composed ENTIRELY from existing verbs: day-grained
    // cohort = each user's first active day (agg-in-mutate), then distinct
    // users per (cohort, day offset) — the classic retention matrix in one
    // verb chain, no bespoke operator
    "q_retention" -> ((s, dir) =>
      t(s, dir, "events")
        .mutate("day" -> expr("(ts div 1000) div 86400000000"))
        .groupBy("user_id")
        .mutate("cohort" -> min(col("day")))
        .groupBy("cohort")
        .mutate("period_offset" -> (col("day") - col("cohort")))
        .groupBy("cohort", "period_offset")
        .summarize("n_users" -> Fns.Agg.nDistinct(col("user_id")))
        .df),

    // ordered conversion funnel click -> view -> purchase per user; ts
    // truncated to micros on both sides so strict > comparisons agree
    // (Spark sees nanos, DuckDB micros)
    "q_funnel" -> ((s, dir) =>
      t(s, dir, "events")
        .mutate("ts_us" -> expr("ts div 1000"))
        .groupBy("user_id")
        .funnel(col("ts_us"), col("event_type"),
                Seq("click", "view", "purchase"))
        .select(col("step").cast("long").as("step"), col("stage"), col("n"))),

    // batch sessionization over the events table: 30-minute inactivity gap.
    // ts is nanos-as-long on the Spark side and micros in DuckDB's
    // TIMESTAMP — truncate to micros on BOTH sides (integer div / epoch_us)
    // so session boundaries are bit-exact integer comparisons.
    "q_sessionize" -> ((s, dir) =>
      t(s, dir, "events")
        .mutate("ts_us" -> expr("ts div 1000"))
        .groupBy("user_id")
        .arrange(col("ts_us"), col("event_id"))
        .mutate("session" -> Vec.sessionId(col("ts_us"), 1800000000L,
                  order = Seq(col("ts_us"), col("event_id")))
                  .transform(_.cast("long")))
        .select(Seq("event_id", "user_id", "session"): _*).df),

    // autocorr / is_monotonic / duplicated: the nested-window trio (inner
    // lag hoisted into a temp projection by mutate automatically)
    "q_window_extras" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .arrange(col("o_orderkey"))
        .mutate(
          "ac"     -> Vec.autocorr(col("o_totalprice")).transform(round(_, 4)),
          "mono_i" -> Vec.isMonotonicIncreasing(col("o_totalprice")),
          "dup"    -> Vec.duplicated(col("o_orderpriority")))
        .select(Seq("o_custkey", "o_orderkey", "ac", "mono_i", "dup"): _*)
        .df),

    "q_mask_where" -> ((s, dir) =>
      t(s, dir, "customer")
        .mutate(
          "wr" -> Fns.where(col("c_acctbal"), col("c_acctbal") > 0, lit(0.0)),
          "mk" -> Fns.mask(col("c_acctbal"), col("c_acctbal") < 0),
          "tr" -> Fns.Str.translate(col("c_mktsegment"), "AEIOU", "aeiou"))
        .select(Seq("c_custkey", "wr", "mk", "tr"): _*).df),

    "q_get_dummies" -> ((s, dir) =>
      t(s, dir, "documents")
        .getDummies("lang")
        .select(Seq("doc_id", "lang_de", "lang_en", "lang_es", "lang_fr",
                    "lang_zh"): _*).df),

    "q_explode" -> ((s, dir) =>
      t(s, dir, "orders")
        .mutate("piece" -> split(col("o_orderpriority"), "-"))
        .explode("piece")
        .select(Seq("o_orderkey", "piece"): _*).df),

    // context-window chunking: 50-token chunks, 10-token overlap
    "q_chunk_docs" -> ((s, dir) =>
      TextFns.chunkDocs(t(s, dir, "documents").df, "doc_id", "text",
          chunkSize = 50, overlap = 10)
        .withColumn("chunk_id", col("chunk_id").cast("long"))),

    "q_str_ops4" -> ((s, dir) =>
      t(s, dir, "part")
        .mutate(
          "rf"  -> Fns.Str.rfind(col("p_name"), "a"),
          "lj"  -> Fns.Str.ljust(col("p_brand"), 12, "."),
          "rj"  -> Fns.Str.rjust(col("p_brand"), 12, "."),
          "dec" -> Fns.Str.isDecimal(col("p_partkey").cast("string")),
          "num" -> Fns.Str.isNumeric(regexp_replace(col("p_name"), "[^0-9]", "")))
        .select(Seq("p_partkey", "rf", "lj", "rj", "dec", "num"): _*)
        .df),

    // trailing 60-second event-time rolling aggregates (RANGE frame on the
    // epoch-ns order column — ties are frame peers, deterministic)
    "q_rolling_range" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .mutate(
          "r_sum" -> Vec.rollingSumRange(col("value"), col("ts"), 60000000000L)
            .transform(round(_, 2)),
          "r_n" -> Vec.rollingCountRange(col("ts"), 60000000000L))
        .select(Seq("event_id", "event_type", "r_sum", "r_n"): _*).df),

    // event-time tumbling window over the ns-timestamp events table (batch
    // form of the streaming verb; ts read as nanos-long, bucketed to minutes)
    "q_events_window" -> ((s, dir) =>
      t(s, dir, "events")
        .mutate("minute" -> (col("ts") / lit(60000000000L)).cast("long"))
        .groupBy("minute", "event_type")
        .summarize("n" -> Fns.Agg.n(),
                   "sum_v" -> (round(sum(col("value")), 2)))
        .df)
  )

  private val extraOracle: Map[String, String] = Map(
    "q_agg_extra" ->
      """SELECT c_mktsegment,
        |  round(skewness(c_acctbal), 4) AS sk,
        |  round(kurtosis(c_acctbal), 4) AS ku,
        |  round(stddev_samp(c_acctbal) / sqrt(count(c_acctbal)), 4) AS sem,
        |  round(covar_samp(c_acctbal, c_nationkey), 2) AS cov,
        |  round(sum(c_acctbal * c_nationkey), 2) AS dotp,
        |  round(product(1 + c_acctbal / 100000000.0), 6) AS prodp,
        |  arg_max(c_custkey, c_acctbal + c_custkey / 1000000000.0) AS idx_max,
        |  arg_min(c_custkey, c_acctbal + c_custkey / 1000000000.0) AS idx_min,
        |  bool_and(c_acctbal > 0) AS all_pos,
        |  bool_or(c_acctbal > 9000) AS any_big
        |FROM customer GROUP BY 1""".stripMargin,
    "q_mad" ->
      """WITH d AS (SELECT l_returnflag,
        |    abs(l_quantity - avg(l_quantity) OVER (PARTITION BY l_returnflag)) AS dev
        |  FROM lineitem)
        |SELECT l_returnflag, round(avg(dev), 4) AS mad, count(*) AS n
        |FROM d GROUP BY 1""".stripMargin,
    "q_theta_join" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS sum_c
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |GROUP BY 1""".stripMargin,
    "q_intersect" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0
        |INTERSECT
        |SELECT DISTINCT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 8000""".stripMargin,
    "q_except" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |EXCEPT
        |SELECT DISTINCT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 8000""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin,
    "q_where_across" ->
      """SELECT round(sum(c_custkey), 2) / count(c_custkey) AS c_custkey_avg,
        |  round(sum(c_nationkey), 2) / count(c_nationkey) AS c_nationkey_avg,
        |  round(sum(c_acctbal), 2) / count(c_acctbal) AS c_acctbal_avg
        |FROM customer""".stripMargin,
    "q_group_computed" ->
      """SELECT CAST(floor(o_totalprice / 100000) AS BIGINT) AS price_bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY 1""".stripMargin,
    "q_group_nulls" ->
      """SELECT nullif(l_discount, 0.0) AS disc0, count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_asof_join" ->
      """SELECT l.o_custkey, l.o_orderkey, l.o_totalprice,
        |  r.o_orderkey AS snap_orderkey, r.snap_price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice FROM orders) l
        |ASOF LEFT JOIN
        |  (SELECT o_custkey, o_orderkey, o_totalprice AS snap_price
        |   FROM orders WHERE o_orderstatus = 'F') r
        |ON l.o_custkey = r.o_custkey AND l.o_orderkey >= r.o_orderkey""".stripMargin,
    "q_interval_overlap" ->
      """WITH a AS (SELECT event_id AS a_id, epoch_ns(ts) AS a_s,
        |             epoch_ns(ts) + 120000000000 AS a_e
        |           FROM events WHERE event_id % 97 = 0),
        |  b AS (SELECT event_id AS b_id, epoch_ns(ts) AS b_s,
        |          epoch_ns(ts) + 120000000000 AS b_e
        |        FROM events WHERE event_id % 89 = 0)
        |SELECT a_id, b_id FROM a JOIN b ON a_s <= b_e AND b_s <= a_e""".stripMargin,
    "q_range_join" ->
      """WITH iv AS (SELECT event_id AS iv_id, epoch_ns(ts) AS start_ts,
        |              epoch_ns(ts) + 60000000000 AS end_ts
        |            FROM events WHERE event_id % 100 = 0),
        |  pt AS (SELECT epoch_ns(ts) AS pts, value FROM events)
        |SELECT iv_id, count(*) AS n_pts, round(sum(value), 2) AS sum_v
        |FROM iv JOIN pt ON pts >= start_ts AND pts <= end_ts
        |GROUP BY 1""".stripMargin,
    "q_rolling" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER w3, 2) AS r_sum,
        |  round(avg(o_totalprice) OVER w3, 4) AS r_avg,
        |  max(o_totalprice) OVER w3 AS r_max,
        |  min(o_totalprice) OVER w3 AS r_min
        |FROM orders
        |WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_json_props" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 2)
        |    / count(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS avg_k,
        |  max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "q_str_ops2" ->
      """SELECT p_partkey,
        |  CAST((length(p_name) - length(replace(p_name, 'a', ''))) / 1 AS BIGINT) AS cnt_a,
        |  CAST(strpos(p_name, 'e') - 1 AS BIGINT) AS find_e,
        |  lpad(CAST(p_size AS VARCHAR), 5, '0') AS z,
        |  substr(p_name, 3, 1) AS ch2,
        |  substr(p_name, 3, 5) AS sl,
        |  repeat(p_brand, 2) AS rep,
        |  regexp_full_match(p_type, '[A-Za-z]+') AS alpha,
        |  regexp_full_match(CAST(p_size AS VARCHAR), '[0-9]+') AS digit,
        |  list_aggregate(list_transform(string_split(p_name, ' '),
        |    w -> upper(w[1]) || lower(w[2:])), 'string_agg', ' ') AS ttl
        |FROM part""".stripMargin,
    "q_str_ops3" ->
      """SELECT p_partkey,
        |  array_to_string(list_transform(string_split(p_brand, ''),
        |    x -> CASE WHEN x <> lower(x) THEN lower(x) ELSE upper(x) END), '') AS sw,
        |  rpad(lpad(p_brand,
        |    CAST(length(p_brand) + floor((15 - length(p_brand)) / 2) AS INT), '_'),
        |    15, '_') AS ctr,
        |  rtrim(regexp_replace(p_name, '(.{1,10})(\s+|$)', '\1' || chr(10), 'g'),
        |    chr(10)) AS wr,
        |  regexp_replace(p_name, ' ([^ ]*)$', '|\1') AS rs,
        |  substr(p_name, 1, 2) || 'XX' || substr(p_name, 6) AS sr
        |FROM part""".stripMargin,
    "q_value_counts" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS n
        |FROM customer GROUP BY 1""".stripMargin,
    "q_chunk_docs" ->
      """WITH toks AS (SELECT doc_id,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |  base AS (SELECT doc_id, w,
        |    CASE WHEN len(w) <= 50 THEN 1
        |         ELSE CAST(ceil((len(w) - 10) * 1.0 / 40) AS BIGINT) END AS k
        |    FROM toks),
        |  expanded AS (SELECT doc_id, w,
        |    unnest(generate_series(1, k)) AS i FROM base)
        |SELECT doc_id, i - 1 AS chunk_id,
        |  array_to_string(w[(i-1)*40 + 1 : (i-1)*40 + 50], ' ') AS chunk
        |FROM expanded""".stripMargin,
    "q_str_ops4" ->
      """SELECT p_partkey,
        |  CASE WHEN strpos(reverse(p_name), 'a') = 0 THEN -1
        |       ELSE length(p_name) - strpos(reverse(p_name), 'a') END AS rf,
        |  CASE WHEN length(p_brand) >= 12 THEN p_brand
        |       ELSE rpad(p_brand, 12, '.') END AS lj,
        |  CASE WHEN length(p_brand) >= 12 THEN p_brand
        |       ELSE lpad(p_brand, 12, '.') END AS rj,
        |  regexp_full_match(CAST(p_partkey AS VARCHAR), '[0-9]+') AS dec,
        |  regexp_full_match(regexp_replace(p_name, '[^0-9]', '', 'g'), '[0-9]+') AS num
        |FROM part""".stripMargin,
    "q_events_window" ->
      """SELECT CAST(floor(epoch_ns(ts) / 60000000000) AS BIGINT) AS minute,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_rolling_range" ->
      """SELECT event_id, event_type,
        |  round(sum(value) OVER w, 2) AS r_sum,
        |  count(*) OVER w AS r_n
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ns(ts)
        |             RANGE BETWEEN 60000000000 PRECEDING AND CURRENT ROW)""".stripMargin
  )

  def queries: Map[String, Q] =
    reshapeQueries ++ scalarQueries ++ pipelineQueries ++ extraQueries

  /** Replays [[graft.ml.Dedup.ngramJaccardPairs]] (3-gram shingles, the
    * maxDf=1000 stop-shingle guard, exact Jaccard) at the given threshold —
    * shared by q_ngram_jaccard (0.5) and q_jaccard_prefix (PPJoin's 0.8
    * regime), parameterized so the two entries can never drift apart.
    */
  private[graft] def ngramJaccardOracleSql(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
       |    FROM documents),
       |  sh0 AS (SELECT doc_id, unnest(list_distinct(
       |      CASE WHEN len(w) >= 3 THEN
       |        list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |      ELSE [array_to_string(w, ' ')] END)) AS g
       |    FROM toks),
       |  -- stop-shingle guard mirrors graft's maxDf=1000 default: shingles
       |  -- in >1000 docs are excluded from sizes AND overlaps consistently
       |  sh AS (SELECT sh0.* FROM sh0
       |    JOIN (SELECT g FROM sh0 GROUP BY g HAVING count(*) <= 1000) ok USING (g)),
       |  sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |  pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       |    FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  round(common * 1.0 / (sa.sz + sb.sz - common), 4) AS jaccard
       |FROM pairs JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
       |WHERE common * 1.0 / (sa.sz + sb.sz - common) >= $threshold""".stripMargin

  /** Shared by q_decontaminate and q_decontam_pers — persisted-artifact
    * scrubbing must equal the inline Bloom path bit-for-bit. */
  private def decontaminateOracleSql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
      |    FROM documents),
      |  gr AS (SELECT doc_id, list_distinct(
      |      CASE WHEN len(w) >= 5 THEN
      |        list_transform(range(1, len(w) - 3),
      |                       i -> array_to_string(list_slice(w, i, i + 4), ' '))
      |      ELSE [array_to_string(w, ' ')] END) AS gs
      |    FROM toks),
      |  tg AS (SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g FROM gr),
      |  bg AS (SELECT DISTINCT g FROM
      |    (SELECT unnest(gs) AS g FROM gr WHERE doc_id % 17 = 0)),
      |  bad AS (SELECT tg.doc_id FROM tg JOIN bg USING (g)
      |    GROUP BY tg.doc_id, tg.n_grams
      |    HAVING round(count(*) * 1.0 / tg.n_grams, 4) > 0.5)
      |SELECT doc_id, lang, source FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin

  def oracleSql: Map[String, String] =
    reshapeOracle ++ scalarOracle ++ pipelineOracle ++ extraOracle
}
