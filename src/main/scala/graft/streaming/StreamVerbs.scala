package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.Tbl

/** StatefulProcessor for the transformWithState verb: per-key running
  * (count, sum) held in ValueState — the Spark 4 arbitrary-state API that
  * supersedes mapGroupsWithState (typed state handles, timers, TTL).
  */
class RunningTotalsProcessor
    extends StatefulProcessor[String, (String, Double), (String, Long, Double)] {
  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Double)](
      "totals", Encoders.product[(Long, Double)], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Double)],
                               timers: TimerValues): Iterator[(String, Long, Double)] = {
    val (n0, s0) = Option(state.get()).getOrElse((0L, 0.0))
    var n = n0; var s = s0
    rows.foreach { case (_, v) => n += 1; s += v }
    state.update((n, s))
    Iterator.single((key, n, s))
  }
}

/** Structured-Streaming verbs. The reference has no streaming at all
  * (SURVEY §2.10) — this is the pure-extension layer, nearly free by
  * construction because graft verbs are `DataFrame => DataFrame`: a
  * `readStream` source flows through the same pipeline code.
  */
object StreamVerbs {

  /** Event-time watermark as a verb (late-data bound for stateful ops). */
  def withWatermark(t: Tbl, tsCol: String, delay: String): Tbl =
    t.copy(df = t.df.withWatermark(tsCol, delay))

  /** Tumbling (or sliding, if `slide` given) event-time window aggregation:
    * `group_by(window(ts), keys) >> summarize(...)`. State is bounded by the
    * watermark; partial aggregation happens map-side before the shuffle.
    */
  def windowedSummarize(t: Tbl, tsCol: String, duration: String,
                        slide: Option[String] = None)
                       (aggs: (String, Column)*): Tbl = {
    val win = slide.map(s => window(col(tsCol), duration, s))
      .getOrElse(window(col(tsCol), duration))
    val keys = win.as("window") +: t.groups.map(col)
    val named = aggs.map { case (n, c) => c.as(n) }
    Tbl(t.df.groupBy(keys: _*).agg(named.head, named.tail: _*))
  }

  /** Session windows (gap-based grouping) per key. */
  def sessionSummarize(t: Tbl, tsCol: String, gap: String)
                      (aggs: (String, Column)*): Tbl = {
    val keys = session_window(col(tsCol), gap).as("session") +: t.groups.map(col)
    val named = aggs.map { case (n, c) => c.as(n) }
    Tbl(t.df.groupBy(keys: _*).agg(named.head, named.tail: _*))
  }

  /** Streaming dedup on key columns, state-bounded by the watermark —
    * the streaming form of `distinct(keepAll = true)`.
    */
  def dedup(t: Tbl, keys: Seq[String]): Tbl =
    t.copy(df = t.df.dropDuplicates(keys))

  /** Streaming dedup that admits re-delivery outside the watermark window
    * (bounded state, at-least-once semantics).
    */
  def dedupWithinWatermark(t: Tbl, keys: Seq[String]): Tbl =
    t.copy(df = t.df.dropDuplicatesWithinWatermark(keys))

  /** Stream-stream inner join: both sides watermarked, matches constrained
    * to an event-time band so state stays bounded (Spark requires the
    * time-interval condition for state cleanup).
    */
  def streamJoin(left: Tbl, right: Tbl, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 delay: String, band: String): Tbl = {
    val l = left.df.withWatermark(leftTs, delay).alias("l")
    val r = right.df.withWatermark(rightTs, delay).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond = col(s"r.$rightTs").between(
      col(s"l.$leftTs") - expr(s"INTERVAL $band"),
      col(s"l.$leftTs") + expr(s"INTERVAL $band"))
    Tbl(l.join(r, keyCond && timeCond, "inner"))
  }

  /** Per-key running totals via the Spark 4 `transformWithState` API
    * (ValueState handle; use OutputMode.Update). Same semantics as
    * `runningTotals`, modern state backend (RocksDB-compatible, TTL-able).
    */
  def runningTotalsTws(t: Tbl, keyCol: String, valueCol: String): DataFrame = {
    val spark = t.df.sparkSession
    import spark.implicits._
    t.df.select(col(keyCol).cast("string").as("k"),
                col(valueCol).cast("double").as("v"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("key", "running_n", "running_sum")
  }

  /** Custom-state example: per-key running (count, sum) via
    * `mapGroupsWithState` — the KeyValueGroupedDataset escape hatch for
    * stateful logic the built-in operators can't express. Emits one updated
    * row per key per micro-batch (use OutputMode.Update).
    */
  def runningTotals(t: Tbl, keyCol: String, valueCol: String): DataFrame = {
    val spark = t.df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    t.df.select(col(keyCol).cast("string").as("k"),
                col(valueCol).cast("double").as("v"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          (key, n, s)
      }
      .toDF("key", "running_n", "running_sum")
  }
}
