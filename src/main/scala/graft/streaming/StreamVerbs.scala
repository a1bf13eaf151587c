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

/** State for [[StreamVerbs.streamingResample]]: the last bucket already
  * emitted (its start, epoch ms; Long.MinValue before the first emission)
  * and the still-open buckets as (bucketStart, n, sum, min, max). Bounded:
  * open buckets span at most the watermark delay plus the source's
  * event-time skew, divided by the bucket width.
  */
case class ResampleState(lastClosed: Long,
                         open: Seq[(Long, Long, Double, Double, Double)])

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

  /** Approximate top-k items per event-time window (and per group key):
    * the Misra-Gries `heavy_hitters` aggregate — its buffer serializes into
    * the state store between micro-batches and merges on the next, so the
    * per-window state is ≤ k counters no matter how many distinct items the
    * stream carries. StreamingSpec pins stream == batch.
    */
  def windowedHeavyHitters(t: Tbl, tsCol: String, duration: String,
                           item: Column, k: Int,
                           slide: Option[String] = None): Tbl =
    windowedSummarize(t, tsCol, duration, slide)(
      "hh" -> graft.functions.Fns.Agg.heavyHitters(item, k))

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

  /** Streaming MinHash-LSH near-dup CANDIDATES (dedup-on-ingest): each
    * incoming doc gets a per-row signature (pure array expression —
    * [[graft.ml.Dedup.minhashSignatureRow]], no aggregation), explodes to
    * its `bands` bucket keys, and one `flatMapGroupsWithState` keyed on the
    * bucket holds the signatures seen there. A new doc agreeing with a
    * stored one on >= `threshold` of the k signature slots emits an
    * (id_a, id_b, est_jaccard) candidate immediately — the streaming half
    * of the lambda dedup architecture (candidates stream out; periodic
    * batch `connectedComponents` + `keepCanonical` resolves).
    *
    * State bounds: `maxBucketState` caps signatures kept per bucket (FIFO
    * eviction) — hot buckets degrade to recent-window recall instead of
    * unbounded state, the same guard as batch `maxBucket`. A pair sharing
    * several buckets may emit once per shared bucket; the resolve step's
    * edge handling is duplicate-tolerant by construction.
    */
  def streamingNearDupCandidates(t: Tbl, idCol: String, textCol: String,
                                 n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                                 threshold: Double = 0.7, seed: Long = 42L,
                                 maxBucketState: Int = 64): DataFrame = {
    val spark = t.df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val k = bands * rowsPerBand
    val banded = t.df
      .select(col(idCol).cast("long").as("id"),
        graft.ml.Dedup.minhashSignatureRow(col(textCol), n, k, seed).as("sig"))
      .select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(":", b.cast("string"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
              .cast("string"))))
          .as("bucket"))
    banded.select(col("bucket"), col("id"), col("sig"))
      .as[(String, Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, docs: Iterator[(String, Long, Seq[Long])],
         state: GroupState[Seq[(Long, Seq[Long])]]) =>
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[(Long, Long, Double)]
          docs.foreach { case (_, id, sig) =>
            seen.foreach { case (oid, osig) =>
              if (oid != id) {
                var agree = 0; var i = 0
                while (i < k) { if (sig(i) == osig(i)) agree += 1; i += 1 }
                val est = agree.toDouble / k
                if (est >= threshold)
                  out += ((math.min(id, oid), math.max(id, oid), est))
              }
            }
            seen = ((id, sig) +: seen).take(maxBucketState)
          }
          state.update(seen)
          out.result().iterator
      }
      .toDF("id_a", "id_b", "est_jaccard")
  }

  /** Streaming decontamination (scrub-on-ingest): drop incoming docs whose
    * contamination against a STATIC benchmark corpus exceeds `maxFrac`
    * (default 0: any shared n-gram drops the doc). The anti-join/distinct
    * shapes the scrub needs are illegal on an unbounded stream, so this is
    * the canonical `foreachBatch` pattern: every micro-batch is a plain
    * batch DataFrame and runs the EXACT batch operator
    * ([[graft.ml.Dedup.decontaminate]]) against benchmark grams that are
    * distinct'd and cached ONCE — identical semantics on-ingest and in
    * backfill, nothing stateful, static side broadcast by AQE. Returns the
    * started-ready writer; caller sets trigger/checkpoint and `.start()`.
    */
  def streamingDecontaminate(t: Tbl, idCol: String, textCol: String,
                             bench: DataFrame, benchText: String,
                             n: Int = 13, maxFrac: Double = 0.0)
                            (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // benchmark gram set: one batch job, reused by every micro-batch.
    // Registered with the dedup intermediate-cache registry (releasable via
    // Dedup.unpersistIntermediates after the stream stops; an unpersist
    // mid-stream merely recomputes, never corrupts).
    val bg = graft.ml.Dedup.trackCache(
      graft.ml.Dedup.benchmarkGrams(bench, benchText, n))
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Dedup.decontaminateAgainst(
        batch, idCol, textCol, bg, n, maxFrac))
    }
  }

  /** Streaming KNN retrieval against a STATIC corpus: each micro-batch of
    * query vectors runs the batch [[graft.ml.Similarity.knnJoin]] against
    * the corpus — stream and backfill produce identical results by
    * construction (same code object). The corpus signature work is
    * recomputed per batch unless the caller caches/persists the corpus
    * DataFrame; at scale, persist it bucketed and pass the cached frame.
    */
  def streamingKnnJoin(queries: Tbl, corpus: DataFrame, k: Int, dim: Int,
                       queryIdCol: String = "vec_id",
                       corpusIdCol: String = "vec_id",
                       vecCol: String = "embedding",
                       nPlanes: Int = 12, nTables: Int = 4,
                       seed: Long = 42L)
                      (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queries.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Similarity.knnJoin(batch, corpus, k, dim,
        queryIdCol, corpusIdCol, vecCol, nPlanes, nTables, seed))
    }

  /** Streaming per-stratum quota curation — the streaming half of
    * [[graft.Tbl.sampleQuota]]: hold the best `k` (score desc, id asc) rows
    * seen so far PER GROUP in state and re-emit a group's current top-k
    * whenever a micro-batch touches it (OutputMode.Update). State is
    * exactly k entries per group — bounded by construction, no watermark
    * needed — so "keep the 1000 best docs per domain as the crawl streams
    * in" runs forever in constant memory.
    */
  def streamingQuotaSample(t: Tbl, groupCol: String, idCol: String,
                           scoreCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = t.df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    t.df.select(col(groupCol).cast("string").as("g"),
                col(idCol).cast("long").as("id"),
                col(scoreCol).cast("double").as("score"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[Seq[(Long, Double)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
              rows.map(r => (r._2, r._3)))
            .sortBy { case (id, s) => (-s, id) }.take(k)
          state.update(merged)
          (g, merged)
      }
      .flatMap { case (g, items) =>
        items.zipWithIndex.map { case ((id, s), i) => (g, id, s, i + 1L) }
      }
      .toDF(groupCol, idCol, scoreCol, "rank")
  }

  private val fixedUnitMs = Map(
    "second" -> 1000L, "minute" -> 60000L, "hour" -> 3600000L,
    "day" -> 86400000L)

  /** Streaming resample with TICKER gap-fill — the streaming half of
    * [[graft.ops.Resample.resample]]. Per key, rows are bucketed to
    * fixed-width event-time buckets (epoch-aligned `second`/`minute`/
    * `hour`/`day` — calendar units like month are not fixed-width and stay
    * batch-only); a bucket is emitted exactly once, when the watermark
    * passes its end. Buckets the data skipped are emitted too, as
    * (n = 0, NULL sum/min/max) gap rows — and unlike the batch verb, the
    * ticker keeps emitting empty buckets for a key that goes quiet until
    * the stream stops (that is what makes it a ticker: downstream consumers
    * see explicit silence, via each key's event-time timer re-arming at the
    * next bucket boundary).
    *
    * State per key: the open (not-yet-closable) buckets plus one Long —
    * bounded by (watermark delay + event-time skew) / bucket width, no
    * matter how long the stream runs. Late rows for already-emitted buckets
    * are dropped (the watermark contract). Append-mode output.
    */
  def streamingResample(t: Tbl, keyCol: String, tsCol: String,
                        valueCol: String, unit: String,
                        delay: String): DataFrame = {
    val unitMs = fixedUnitMs.getOrElse(unit.toLowerCase,
      throw graft.GraftError(
        s"streamingResample needs a fixed-width unit ${fixedUnitMs.keys}, got '$unit'"))
    val spark = t.df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val src = t.df
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, delay)
      // keep the watermarked timestamp ATTRIBUTE itself — projecting it
      // through unix_millis would strip the event-time tag and fail the
      // streaming checker ("event-time timeout not supported without
      // watermark"); millis conversion happens inside the function
      .select(col(keyCol).cast("string").as("k"),
              col(tsCol).as("ts"),
              col(valueCol).cast("double").as("v"))
      .as[(String, java.sql.Timestamp, Double)]
    src.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Double)],
         state: GroupState[ResampleState]) =>
          val st = state.getOption.getOrElse(ResampleState(Long.MinValue, Nil))
          var lastClosed = st.lastClosed
          val open = scala.collection.mutable.Map(
            st.open.map(b => b._1 -> (b._2, b._3, b._4, b._5)): _*)
          rows.foreach { case (_, tsv, v) =>
            val b = Math.floorDiv(tsv.getTime, unitMs) * unitMs
            if (lastClosed == Long.MinValue || b > lastClosed) {
              val (n, s, mn, mx) =
                open.getOrElse(b, (0L, 0.0, Double.MaxValue, Double.MinValue))
              open(b) = (n + 1, s + v, math.min(mn, v), math.max(mx, v))
            } // else: late beyond an emitted bucket — dropped
          }
          if (lastClosed == Long.MinValue && open.isEmpty) {
            // nothing ever observed for this key (all rows late-dropped)
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            if (lastClosed == Long.MinValue) lastClosed = open.keys.min - unitMs
            val out = Seq.newBuilder[
              (String, Long, Long, Option[Double], Option[Double], Option[Double])]
            var b = lastClosed + unitMs
            while (b + unitMs <= wm) {
              out += (open.remove(b) match {
                case Some((n, s, mn, mx)) =>
                  (key, b, n, Some(s), Some(mn), Some(mx))
                case None => (key, b, 0L, None, None, None)
              })
              lastClosed = b
              b += unitMs
            }
            state.update(ResampleState(lastClosed,
              open.iterator.map { case (bk, (n, s, mn, mx)) =>
                (bk, n, s, mn, mx) }.toSeq))
            // re-arm at the next bucket's close; the loop above guarantees
            // lastClosed + 2*unit > wm, which setTimeoutTimestamp requires
            state.setTimeoutTimestamp(lastClosed + 2 * unitMs)
            out.result().iterator
          }
      }
      .toDF("k", "bucket_ms", "n", "sum", "min", "max")
      .select(col("k").as(keyCol),
        timestamp_millis(col("bucket_ms")).as("bucket"),
        col("n"), col("sum"), col("min"), col("max"))
  }

  /** Streaming per-group quantile estimation — the streaming half of
    * [[graft.Tbl.quantilesBySample]]: hold each group's k smallest
    * `xxhash64(key, seed)` sample rows in state (bounded: exactly ≤k entries
    * per group, forever) and re-emit the group's current sample quantiles
    * whenever a micro-batch touches it (OutputMode.Update). Because the
    * bottom-k-by-hash sample is merge-order-independent, the state after
    * any prefix of the stream equals the batch sample over the same rows —
    * stream and batch quantiles agree exactly once the data matches.
    * Output: (group, qs array — one entry per prob, linear interpolation).
    */
  def streamingQuantileSample(t: Tbl, groupCol: String, keyCol: String,
                              xCol: String, probs: Seq[Double], k: Int,
                              seed: Long = 42L): DataFrame = {
    require(k > 0, "k must be positive")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be in [0, 1]")
    val spark = t.df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    t.df.select(col(groupCol).cast("string").as("g"),
                xxhash64(col(keyCol), lit(seed)).as("h"),
                col(keyCol).cast("long").as("id"),
                col(xCol).cast("double").as("x"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[(String, Long, Long, Double)],
         state: GroupState[Seq[(Long, Long, Double)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
              rows.map(r => (r._2, r._3, r._4)))
            .sortBy { case (h, id, _) => (h, id) }.take(k)
          state.update(merged)
          val xs = merged.map(_._3).sorted
          val qs = probs.map { p =>
            val h = (xs.size - 1) * p
            val lo = h.toInt
            val hi = math.min(lo + 1, xs.size - 1)
            xs(lo) + (xs(hi) - xs(lo)) * (h - lo)
          }
          (g, qs)
      }
      .toDF(groupCol, "qs")
  }

  /** Streaming nearest-centroid assignment against FIXED k-means centroids
    * (from [[graft.ml.Clustering.kmeansFit]], typically persisted): each
    * micro-batch runs the batch [[graft.ml.Clustering.assign]] — labels on
    * ingest equal a batch re-assign by construction (same code object,
    * broadcast centroids, map-side only, nothing stateful).
    */
  def streamingKmeansAssign(t: Tbl, centroids: DataFrame,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding")
                           (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Clustering.assign(batch, centroids, idCol, vecCol))
    }

  /** Custom-state example: per-key running (count, sum) via
    * `mapGroupsWithState` — the KeyValueGroupedDataset escape hatch for
    * stateful logic the built-in operators can't express. Emits one updated
    * row per key per micro-batch (use OutputMode.Update).
    */
  /** Ingest-time boilerplate filter: scrub every arriving document's lines
    * against a PERSISTED offender table (built batch-side by
    * `Dedup.lineDocFrequencies(...).where(doc_freq > maxDf)` over the
    * existing corpus) — the streaming sibling of
    * [[graft.ml.Dedup.dropFrequentLines]]. Runs as foreachBatch: within a
    * micro-batch it is exactly the batch anti-join + reassembly (docs
    * arrive whole in one row, so reassembly never crosses batches and no
    * streaming state accrues); the offender table broadcasts map-side.
    */
  def streamingDropFrequentLines(t: Tbl, idCol: String, textCol: String,
                                 offenders: DataFrame,
                                 hash: Column => Column = xxhash64(_))
                                (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val off = offenders.select("line_hash")
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val exploded = batch.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      val kept = exploded.join(broadcast(off),
        hash(col("__line")) === col("line_hash"), "left_anti")
      val reassembled = kept.groupBy(idCol)
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")), "\n").as(textCol))
      sink(batch.drop(textCol).join(reassembled, Seq(idCol), "left")
        .withColumn(textCol, coalesce(col(textCol), lit(""))))
    }
  }

  /** Ingest-time exact-substring scrub: mask every arriving doc's spans
    * that a PERSISTED duplicated-gram table (built batch-side by
    * [[graft.ml.Dedup.corpusDupGrams]] over the frozen corpus) already
    * knows are duplicated — the streaming sibling of
    * [[graft.ml.Dedup.maskDuplicateSpans]]. foreachBatch: docs arrive
    * whole, so span-merging never crosses batches and no streaming state
    * accrues; the gram join is stats-driven (the gram table can exceed
    * broadcast size).
    */
  def streamingMaskDuplicateSpans(t: Tbl, idCol: String, textCol: String,
                                  dupGrams: DataFrame, n: Int = 8,
                                  hash: Column => Column = xxhash64(_))
                                 (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Dedup.maskDuplicateSpansAgainst(
        batch, idCol, textCol, dupGrams, n, hash))
    }

  /** Ingest-time BM25 topic tagging against a PERSISTED
    * [[graft.text.Search.bm25TopicStats]] table (frozen-corpus idf/avgdl,
    * so backfill and ingest score identically) — the streaming sibling of
    * [[graft.text.Search.bm25TagAgainst]]. foreachBatch, stats broadcast;
    * no streaming state.
    */
  def streamingBm25Tag(t: Tbl, idCol: String, textCol: String,
                       stats: DataFrame, k1: Double = 1.2, b: Double = 0.75)
                      (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.text.Search.bm25TagAgainst(batch, idCol, textCol, stats,
        k1, b))
    }

  /** Incremental BM25 corpus statistics over an ingest stream: each batch's
    * [[graft.text.Search.bm25TopicStats]] folds into the running stats via
    * [[graft.text.Search.bm25StatsMerge]] — additive exact integers, so the
    * running table after any prefix of batches is bit-identical to a
    * from-scratch recompute over their union. `sink` receives the UPDATED
    * cumulative stats after every batch (persist it and tag with
    * [[streamingBm25Tag]]); `initial` seeds from a frozen corpus.
    */
  def streamingBm25Stats(t: Tbl, idCol: String, textCol: String,
                         topics: DataFrame, tidCol: String, ttextCol: String,
                         initial: Option[DataFrame] = None)
                        (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // the running stats table is broadcast-sized (|topic terms| rows); each
    // batch merge materializes it so the next batch folds into VALUES, not
    // an ever-growing lazy plan
    var acc: Option[DataFrame] = initial
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val bs = graft.text.Search.bm25TopicStats(batch, idCol, textCol,
        topics, tidCol, ttextCol)
      val merged = acc match {
        case None       => bs
        case Some(prev) => graft.text.Search.bm25StatsMerge(prev, bs)
      }
      val pinned = merged.localCheckpoint()
      acc = Some(pinned)
      sink(pinned)
    }
  }

  /** Ingest-time semantic dedup: arriving vectors are dropped when they
    * duplicate the persisted clustered corpus
    * ([[graft.ml.Dedup.semanticDedupAgainstCorpus]] — broadcast centroid
    * assign, cluster-scoped cosine verify). foreachBatch, stateless; the
    * micro-batch runs the exact batch operator, so backfill and ingest
    * agree (StreamingSpec pins batch == stream).
    */
  def streamingSemanticDedup(t: Tbl, idCol: String, vecCol: String,
                             centroids: DataFrame, corpus: DataFrame,
                             threshold: Double)(sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Dedup.semanticDedupAgainstCorpus(batch, idCol, vecCol,
        centroids, corpus, threshold))
    }

  /** Incremental Count–Min maintenance over a stream: each micro-batch's
    * sketch ([[graft.ops.Sketch.countMin]]) folds into the running cell
    * table via [[graft.ops.Sketch.countMinMerge]] — counters are additive
    * integers, so the running sketch after any prefix of batches is
    * bit-identical to a from-scratch build over their union (the same
    * contract as [[streamingBm25Stats]]). The accumulator is bounded by
    * depth×width cells regardless of stream length; each merge
    * localCheckpoints so batch N folds into VALUES, not a growing plan.
    */
  def streamingCountMin(t: Tbl, key: Column, width: Int, depth: Int,
                        initial: Option[DataFrame] = None)
                       (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var acc: Option[DataFrame] = initial
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val bs = graft.ops.Sketch.countMin(batch, key, width, depth)
      val merged = acc match {
        case None       => bs
        case Some(prev) => graft.ops.Sketch.countMinMerge(prev, bs)
      }
      val pinned = merged.localCheckpoint()
      acc = Some(pinned)
      sink(pinned)
    }
  }

  /** Streaming per-group quantile sketch: each micro-batch builds its own
    * [[graft.ops.Sketch.quantileSketchByGroup]] summary and folds it into
    * the standing sketch with `quantileSketchMerge` — the incremental-
    * quantiles sibling of [[streamingCountMin]]; batch N never re-reads
    * batches 1..N−1 (that mergeability is the sketch's reason to exist).
    * The sink receives the standing sketch after every batch; query it
    * with `quantileEstimate`.
    */
  def streamingQuantileSketch(t: Tbl, grpCols: Seq[String], value: Column,
                              k: Int, initial: Option[DataFrame] = None)
                             (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var acc: Option[DataFrame] = initial
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val bs = graft.ops.Sketch.quantileSketchByGroup(batch, grpCols, value, k)
      val merged = acc match {
        case None       => bs
        case Some(prev) => graft.ops.Sketch.quantileSketchMerge(prev, bs,
          grpCols, k)
      }
      val pinned = merged.localCheckpoint()
      acc = Some(pinned)
      sink(pinned)
    }
  }

  /** Streaming corpus dataset card: the per-batch signal relation folds
    * into two standing mergeable tables — the per-language (docs, tokens,
    * quality-sum) aggregate (all additive) and the distinct-fingerprint
    * table (union + distinct) — and the sink receives the SAME one-row
    * card [[graft.ops.Checks.corpusReport]] computes in batch, updated per
    * micro-batch with exact parity (StreamingSpec pins stream == batch).
    * The fingerprint table is the only growing state — it IS the exact
    * dedup state a persisted corpus keeps anyway; swap in an HLL sketch
    * if an approximate dup count suffices at extreme scale.
    */
  def streamingCorpusReport(t: Tbl, idCol: String, textCol: String)
                           (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.text.TextFns
    var langAcc: Option[DataFrame] = None
    var fpAcc: Option[DataFrame] = None
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val tc = col(textCol)
      val sig = batch.select(
        TextFns.tokenCount(tc).cast("long").as("__ntok"),
        TextFns.qualityScore(tc).as("__q"),
        TextFns.langId(tc).as("__lang"),
        TextFns.fingerprint(tc).as("__fp"))
      val batchLang = sig.groupBy("__lang").agg(
        count(lit(1)).as("__docs"), sum("__ntok").as("__toks"),
        sum("__q").as("__qsum"))
      val lang = (langAcc match {
        case None       => batchLang
        case Some(prev) => prev.unionByName(batchLang).groupBy("__lang")
          .agg(sum("__docs").as("__docs"), sum("__toks").as("__toks"),
            sum("__qsum").as("__qsum"))
      }).localCheckpoint()
      val fps = (fpAcc match {
        case None       => sig.select("__fp").distinct()
        case Some(prev) => prev.unionByName(sig.select("__fp")).distinct()
      }).localCheckpoint()
      langAcc = Some(lang); fpAcc = Some(fps)
      val main = lang.agg(
        sum("__docs").cast("long").as("n_docs"),
        sum("__toks").cast("long").as("n_tokens"),
        round(sum("__qsum") / sum("__docs"), 4).as("mean_quality"))
      val topLang = lang
        .agg(max(struct(col("__docs").as("__c"), col("__lang"))).as("__m"))
        .select(col("__m.__lang").as("top_lang"),
          col("__m.__c").cast("long").as("top_lang_docs"))
      val dups = main.select(col("n_docs")).crossJoin(
          broadcast(fps.agg(count(lit(1)).as("__nfp"))))
        .select((col("n_docs") - col("__nfp")).cast("long").as("dup_docs"))
      sink(main.crossJoin(broadcast(topLang)).crossJoin(broadcast(dups)))
    }
  }

  /** Ingest-time PQ encoding: arriving vectors encoded map-side against a
    * FROZEN codebook table ([[graft.ml.Pq.train]] output) — the serve/
    * ingest half of product quantization, same codes as a batch encode of
    * the same rows. foreachBatch because the per-(vector, subspace)
    * argmin is a window rank-filter (not supported inside a streaming
    * query plan); the codebooks broadcast into every batch.
    */
  def streamingPqEncode(t: Tbl, codebooks: DataFrame, idCol: String,
                        vecCol: String, m: Int)
                       (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Pq.encode(batch, codebooks, idCol, vecCol, m))
    }

  /** Streaming retrieval against a PERSISTED IVF-PQ index
    * ([[graft.ml.Pq.buildIvfPqIndex]] / [[graft.ml.Pq.appendToIvfPqIndex]]):
    * each micro-batch of query vectors runs the batch
    * [[graft.ml.Pq.adcTopKFromIndex]] probe — coarse routing against the
    * broadcast persisted centroids, then ADC over ONLY the probed
    * `centroid_id=` directories. The dynamic-partition-pruning scan shape
    * applies per micro-batch exactly as in the batch probe (the probe
    * table is re-derived from each batch's queries), so a steady query
    * stream reads a small, query-dependent slice of the codes each tick —
    * and stream == backfill by construction (same code object;
    * StreamingSpec pins the parity). foreachBatch because the per-query
    * top-k is a window rank-filter (not supported inside a streaming
    * plan).
    */
  def streamingIvfPqProbe(queries: Tbl, path: String, k: Int,
                          nProbe: Int = 4, idCol: String = "vec_id",
                          vecCol: String = "embedding")
                         (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queries.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Pq.adcTopKFromIndex(batch.sparkSession, path, batch,
        k, nProbe, idCol, vecCol))
    }

  /** Streaming LM quality scoring: arriving documents scored against a
    * FROZEN persisted gram table ([[graft.text.Lm.ngramCounts]] output) —
    * the ingest half of the CCNet-style filter ([[graft.text.Lm]]): train
    * the model once on the reference corpus, score the crawl as it
    * streams in, gate on avg_lp. foreachBatch (the per-doc position-
    * ordered fold is a collect_list aggregate, not a streaming-plan
    * construct); stream == batch by construction (same code object,
    * StreamingSpec pins it).
    */
  def streamingLmScore(t: Tbl, idCol: String, textCol: String,
                       grams: DataFrame, n: Int, vocab: Long,
                       alpha: Double = 1.0)
                      (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.text.Lm.scoreDocs(batch, idCol, textCol, grams, n,
        vocab, alpha))
    }

  /** Streaming TWO-STAGE retrieval — the serving shape production ANN
    * stacks actually run, per micro-batch: stage 1 probes the persisted
    * IVF-PQ index compressed-domain ([[graft.ml.Pq.adcTopKFromIndex]],
    * DPP-pruned codes scan) for `kCand` candidates per query; stage 2
    * re-ranks ONLY those candidates by exact cosine against the original
    * vector store ([[graft.ml.Similarity.refineTopK]] — two id-keyed hash
    * equi-joins, point lookups, never a scan). `vectors` is the standing
    * corpus vector relation (typically a parquet read over the same
    * corpus the index was built from). Batch == stream by construction
    * (same code objects; StreamingSpec pins parity against the one-shot
    * probe + refine). foreachBatch: both stages end in per-query window
    * rank-filters, which streaming plans don't support.
    */
  def streamingIvfPqRefine(queries: Tbl, path: String, vectors: DataFrame,
                           k: Int, kCand: Int, nProbe: Int = 4,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding")
                          (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(kCand >= k, "kCand must be >= k (stage 1 feeds stage 2)")
    queries.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val cand = graft.ml.Pq.adcTopKFromIndex(batch.sparkSession, path,
        batch, kCand, nProbe, idCol, vecCol)
      sink(graft.ml.Similarity.refineTopK(cand, batch, vectors, k,
        idCol, idCol, vecCol))
    }
  }

  /** Streaming SQ8 probe: arriving query batches rank against a FROZEN
    * persisted scalar-quantized index ([[graft.ml.Sq.buildSqIndex]] —
    * bounds + codes), reconstructing codes on the fly inside codegen —
    * the serving sibling of [[streamingIvfPqProbe]] one fidelity tier up
    * (¼-width scan, no coarse routing). Batch == stream by construction
    * (same code object — [[graft.ml.Sq.sqTopKFromIndex]] per micro-batch;
    * StreamingSpec pins parity). foreachBatch: the per-query rank filter
    * is a window, which streaming plans don't support.
    */
  def streamingSqProbe(queries: Tbl, path: String, k: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding")
                      (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queries.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Sq.sqTopKFromIndex(batch.sparkSession, path, batch,
        k, idCol, vecCol))
    }

  /** Streaming tokenization: arriving documents encode to token-id
    * sequences against a FROZEN persisted tokenizer
    * ([[graft.text.Bpe.buildTokenizer]] — merges + vocab) — the ingest
    * half of the tokenize-on-arrival pipeline. foreachBatch (the per-doc
    * position-ordered reassembly is a collect_list aggregate); batch ==
    * stream by construction (same code object,
    * [[graft.text.Bpe.encodeDocsFromTokenizer]] per micro-batch;
    * StreamingSpec pins parity).
    */
  def streamingTokenize(docs: Tbl, path: String, idCol: String,
                        textCol: String, asciiOnly: Boolean = true)
                       (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.text.Bpe.encodeDocsFromTokenizer(batch.sparkSession,
        path, batch, idCol, textCol, asciiOnly))
    }

  /** Streaming gate monitoring: each micro-batch of LABELED scored rows
    * (a holdout slice riding the ingest stream) emits its own
    * [[graft.ml.Eval.aucBinary]] row — the live dashboard signal that a
    * deployed quality gate's score is still separating classes (a
    * collapsing AUC means the model or the traffic drifted, the
    * classifier sibling of [[graft.ml.Pq.rebuildAdvised]]). Batch ==
    * stream by construction (same code object per batch; StreamingSpec
    * pins each batch's row equals the batch-side AUC of that slice).
    */
  def streamingAucMonitor(scored: Tbl, labelCol: String, scoreCol: String)
                         (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    scored.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Eval.aucBinary(batch, labelCol, scoreCol))
    }

  /** Streaming CALIBRATION monitoring — the stateful sibling of
    * [[streamingAucMonitor]]: each micro-batch of labeled scored rows
    * folds its exact per-bin counts into the STANDING reliability bins
    * ([[graft.ml.Eval.eceMonitorIngest]] — ≤ bins rows of mergeable long
    * sufficient statistics under the marker-swap carry discipline), and
    * the sink receives the CUMULATIVE reliability report + ECE over
    * everything streamed so far — bit-identical to the one-shot batch
    * [[graft.ml.Eval.calibrationReport]] on the same rows (StreamingSpec
    * pins it). The foreachBatch batchId rides into the state, so a
    * replayed micro-batch re-emits the current report instead of
    * double-counting. A drifting `ece` is the live signal the admission
    * gate's calibrated threshold has stopped meaning its probability.
    */
  def streamingEceMonitor(scored: Tbl, labelCol: String, scoreCol: String,
                          bins: Int, statePath: String)
                         (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    scored.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.ml.Eval.eceMonitorIngest(batch.sparkSession, statePath,
        batch, labelCol, scoreCol, bins, batchId))
    }

  /** Cumulative OOV monitor on ingest —
    * [[graft.text.Bpe.oovMonitorIngest]] per micro-batch: each arriving
    * batch encodes against the frozen persisted tokenizer, its
    * per-group token/OOV counts fold into standing mergeable totals,
    * and the sink receives the CUMULATIVE per-group coverage report —
    * bit-identical to the one-shot [[graft.text.Bpe.vocabCoverage]]
    * over everything streamed (StreamingSpec pins it). The live
    * retrain-the-tokenizer signal, per mixture component. batchId
    * threads into the carry for replay re-emission; a tokenizer or
    * vocab-limit mismatch against the accumulated state fails loudly.
    */
  def streamingOovMonitor(t: Tbl, idCol: String, textCol: String,
                          byCol: String, tokPath: String,
                          statePath: String,
                          vocabLimit: Long = Long.MaxValue)
                         (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.text.Bpe.oovMonitorIngest(batch.sparkSession, statePath,
        batch, idCol, textCol, byCol, tokPath, vocabLimit, batchId))
    }

  /** Streaming Stupid Backoff LM scoring against a PERSISTED model
    * ([[graft.text.Lm.buildBackoffModel]]): each micro-batch of arriving
    * documents runs the batch [[graft.text.Lm.scoreDocsFromModel]] — the
    * frozen parquet gram relation joins per batch, n and the token total
    * come from the artifact's meta row. The full train-once /
    * score-forever lifecycle: the reference corpus was scanned once at
    * build time, the crawl scores as it arrives, batch == stream by
    * construction (same code object; StreamingSpec pins the parity).
    */
  def streamingLmScoreBackoff(t: Tbl, idCol: String, textCol: String,
                              path: String, backoff: Double = 0.4)
                             (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.text.Lm.scoreDocsFromModel(batch.sparkSession, path, batch,
        idCol, textCol, backoff))
    }

  /** Ingest-time Naive Bayes classification against a persisted
    * [[graft.text.Classify.buildNbModel]] artifact — the classifier
    * sibling of [[streamingLmScoreBackoff]]: the model was trained ONCE
    * (the fastText-style lang-id/quality-gate shape), and each arriving
    * micro-batch classifies via [[graft.text.Classify.classifyFromModel]],
    * bit-identical to batch classification with the same frozen model
    * (StreamingSpec pins it). foreachBatch, stateless; the word model
    * joins as a relation (never assumed broadcastable), class stats are a
    * bounded driver read.
    */
  def streamingNbClassify(t: Tbl, idCol: String, textCol: String,
                          path: String)
                         (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.text.Classify.classifyFromModel(batch.sparkSession, path,
        batch, idCol, textCol))
    }

  /** Ingest-time concat-and-chunk packing — the LAST packing step
    * running on the stream instead of as a terminal batch job: each
    * micro-batch's id arrays run through
    * [[graft.ops.Scale.contextWindowsIngest]] against the standing carry
    * state (the < windowLen-token partial window rides
    * `<statePath>/remainder`; window ids stay globally consecutive via
    * `<statePath>/meta`), and the sink receives the batch's FULL windows
    * with global ids. Micro-batches run serially, so the carry is
    * race-free; documents must arrive in ascending `idCol` order across
    * batches (file-ordered ingest — [[contextWindows]]' orderCol rule —
    * ENFORCED against the persisted max_id). The foreachBatch batchId is
    * threaded into the carry state, so the update is IDEMPOTENT under
    * Spark's at-least-once replay: a restart that re-delivers the last
    * micro-batch after its carry swap committed is detected by id (and
    * content fingerprint) and the sink receives the SAME windows
    * recomputed from the retained previous state — never a double pack
    * (StreamingSpec pins the replay and the out-of-order rejection).
    */
  def streamingContextWindows(t: Tbl, idCol: String, idsCol: String,
                              windowLen: Int, statePath: String,
                              insertSep: Option[Long] = None)
                             (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.ops.Scale.contextWindowsIngest(batch.sparkSession,
        statePath, batch, idCol, idsCol, windowLen, batchId, insertSep))
    }

  /** Ingest-time length-grouped batching — the padding-minimizing
    * batcher running on the stream against FROZEN bucket boundaries
    * (trained once via [[graft.ops.Scale.quantileBoundaries]], the
    * q_ccnet_assign serving pattern) with per-bucket carry of the open
    * batch ([[graft.ops.Scale.lengthBatchesIngest]] — the
    * contextWindowsIngest carry pattern: cumulative token totals, one
    * row per bucket). The foreachBatch batchId rides into the carry, so
    * replays re-emit instead of double-count; documents must arrive in
    * ascending `idCol` order (enforced). StreamingSpec pins stream ==
    * the one-shot [[graft.ops.Scale.lengthBatchesByBoundaries]] over
    * the concatenated corpus.
    */
  def streamingLengthBatches(t: Tbl, idCol: String, sizeCol: Column,
                             boundaries: DataFrame, batchBudget: Long,
                             statePath: String)
                            (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.ops.Scale.lengthBatchesIngest(batch.sparkSession,
        statePath, batch, idCol, sizeCol, boundaries, batchBudget, batchId))
    }

  /** Standing shard-manifest maintenance on ingest —
    * [[graft.ops.Scale.shardManifestIngest]] per micro-batch: each
    * arriving packed batch's manifest merges into the persisted
    * standing manifest (sum/min/max/XOR columns — order-free, partial
    * shards from earlier batches keep filling), the sink receives the
    * cumulative manifest, and `<statePath>/carry/manifest` is a
    * consistent dataloader-readable snapshot at every commit point.
    * batchId-idempotent under replay; StreamingSpec pins final streamed
    * == the one-shot [[graft.ops.Scale.shardManifest]] over the union.
    */
  def streamingShardManifest(t: Tbl, shardCol: String, idCol: String,
                             sizeCol: Column, fpCol: Column,
                             statePath: String)
                            (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.ops.Scale.shardManifestIngest(batch.sparkSession,
        statePath, batch, shardCol, idCol, sizeCol, fpCol, batchId))
    }

  /** Span corruption on the stream — [[graft.ops.Scale.spanCorruptionPairs]]
    * per micro-batch: the op is per-document and its noise is
    * hash-derived from (doc, position) alone, so stream == batch with no
    * state at all (StreamingSpec pins it). The objective-prep step rides
    * ingest like tokenization does.
    */
  def streamingSpanCorruption(t: Tbl, idCol: String, idsCol: String,
                              noisePct: Int = 15,
                              sentinelBase: Long = 1000L)
                             (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ops.Scale.spanCorruptionPairs(batch, idCol, idsCol,
        noisePct, sentinelBase))
    }

  /** Masked-LM pairs on the stream — [[graft.ops.Scale.mlmPairs]] per
    * micro-batch: map-only and hash-deterministic per (doc, position),
    * so stream == batch with no state (StreamingSpec pins it alongside
    * the span-corruption sibling).
    */
  def streamingMlmPairs(t: Tbl, idCol: String, idsCol: String,
                        noisePct: Int = 15, maskId: Long, vocabSize: Long)
                       (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ops.Scale.mlmPairs(batch, idCol, idsCol, noisePct,
        maskId, vocabSize))
    }

  /** Ingest-time CALIBRATED quality gate — the FineWeb classifier loop
    * on a stream (q_gate_calibrated's serving twin): each micro-batch
    * scores its documents' binary log-odds against the FROZEN NB model
    * ([[graft.text.Classify.scoreBinaryFromModel]]) and admits exactly
    * the rows meeting the threshold calibrated at BUILD time and frozen
    * next to the model ([[graft.text.Classify.saveGateThreshold]]).
    * Output per batch: the admitted rows (original columns + s). The
    * threshold is ONE driver read at stream construction — per-batch
    * work is the model equi-join + a map-side filter, stateless;
    * StreamingSpec pins stream == the batch gate's admitted set.
    */
  def streamingCalibratedGate(t: Tbl, idCol: String, textCol: String,
                              path: String, posCls: String = "pos",
                              negCls: String = "neg")
                             (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val (thr, _) = graft.text.Classify.gateThreshold(
      t.df.sparkSession, path)
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val scored = graft.text.Classify.scoreBinaryFromModel(
        batch.sparkSession, path, batch, idCol, textCol, posCls, negCls)
      sink(batch.join(scored, Seq(idCol)).filter(col("s") >= thr))
    }
  }

  /** The FULL admission chain per micro-batch — the streaming twin of
    * q_ingest_e2e: each arriving batch is quality-gated (`qualityPred`),
    * decontaminated against the frozen benchmark
    * ([[graft.ml.Dedup.decontaminateBloom]] — map-side sketch probe), and
    * deduped against the PERSISTED minhash index
    * ([[graft.ml.Dedup.ingestDedup]] — drop vs standing signatures, drop
    * vs smaller-id batch siblings, append survivors), so later
    * micro-batches dedup against everything earlier ones admitted.
    * foreachBatch; micro-batches run serially, so index growth is
    * race-free; the index is the only state. StreamingSpec pins stream ==
    * running the same chain batch-by-batch.
    */
  def streamingAdmission(t: Tbl, idCol: String, textCol: String,
                         qualityPred: Column, bench: DataFrame,
                         benchText: String, indexPath: String,
                         contamN: Int = 5,
                         maxContaminatedFrac: Double = 0.5,
                         threshold: Double = 0.8, maxBucket: Int = 100000)
                        (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val qual = batch.filter(qualityPred)
      val dec = graft.ml.Dedup.decontaminateBloom(qual, idCol, textCol,
        bench, benchText, contamN, maxContaminatedFrac)
      sink(graft.ml.Dedup.ingestDedup(batch.sparkSession, indexPath, dec,
        idCol, textCol, threshold, maxBucket, batchId))
    }

  /** Ingest-time benchmark scrub against a persisted
    * [[graft.ml.Dedup.buildDecontamIndex]] artifact — the decontamination
    * serving twin: the benchmark's gram table + Bloom sketch were frozen
    * ONCE at build time, and each arriving micro-batch probes the sketch
    * map-side + exact-joins the frozen grams
    * ([[graft.ml.Dedup.decontaminateFromIndex]] per batch — no benchmark
    * re-aggregation, no per-batch Bloom build). foreachBatch, stateless;
    * output identical to the inline Bloom path (q_decontam_pers shares
    * q_decontaminate's oracle VERBATIM).
    */
  def streamingDecontaminateFromIndex(t: Tbl, idCol: String,
                                      textCol: String, indexPath: String,
                                      maxContaminatedFrac: Double = 0.0)
                                     (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Dedup.decontaminateFromIndex(batch.sparkSession,
        indexPath, batch, idCol, textCol, maxContaminatedFrac))
    }

  /** The outputs of one [[lifecycleIngest]] micro-batch: the admitted
    * source rows, the batch's FULL context windows (global ids), its
    * length-bucket batch assignments, and the cumulative standing shard
    * manifest after the batch folded in. `oov`/`ece` carry the health
    * monitors' cumulative reports when their riders are enabled. */
  final case class LifecycleBatchOut(admitted: DataFrame, windows: DataFrame,
                                     batches: DataFrame, manifest: DataFrame,
                                     oov: Option[DataFrame] = None,
                                     ece: Option[DataFrame] = None)

  /** ONE MICRO-BATCH of the WHOLE training-data lifecycle — the
    * streaming twin of q_lifecycle_e2e ("corpus in, training shards +
    * data card out"), every stage the serving form of a frozen artifact
    * or a replay-safe standing state:
    *
    *   1. calibrated NB quality gate — score against the persisted model,
    *      admit at the threshold frozen at build time
    *      ([[graft.text.Classify.scoreBinaryFromModel]] /
    *      [[graft.text.Classify.gateThreshold]]);
    *   2. decontamination against the PERSISTED benchmark artifact
    *      ([[graft.ml.Dedup.decontaminateFromIndex]] — the frozen Bloom
    *      sketch probes map-side, the frozen gram table exact-joins; no
    *      per-batch benchmark re-aggregation);
    *   3. dedup-on-ingest vs the standing minhash index WITH growth
    *      ([[graft.ml.Dedup.ingestDedup]] — replay-evidence columns ride
    *      the appended partition);
    *   4. encode survivors with the persisted separator tokenizer
    *      ([[graft.text.Bpe.encodeDocsFromTokenizer]] — the sep id comes
    *      from the artifact's meta, never assumed);
    *   5. cut the boundary-marked id stream into `windowLen`-token
    *      context windows with doc-span provenance against the standing
    *      carry ([[graft.ops.Scale.contextWindowsIngest]]);
    *   6. length-group survivors into ≤ `batchBudget`-token batches
    *      against FROZEN bucket boundaries
    *      ([[graft.ops.Scale.lengthBatchesIngest]]);
    *   7. fold the batch's per-`srcCol` doc/token counts + id
    *      fingerprints into the standing shard manifest — the data card
    *      maintained incrementally
    *      ([[graft.ops.Scale.shardManifestIngest]]);
    *   8. OPTIONAL health-monitor riders: `oovVocabLimit` folds the
    *      admitted docs' per-source vocabulary coverage into the
    *      standing OOV monitor ([[graft.text.Bpe.oovMonitorIngest]] at
    *      `<statePath>/oov`), `eceLabelCol` folds the gate's scored
    *      batch into the standing calibration monitor
    *      ([[graft.ml.Eval.eceMonitorIngest]] at `<statePath>/ece`) —
    *      so the ONE lifecycle stream also maintains its health
    *      artifacts, bit-identical to running the monitors standalone
    *      over the same batches.
    *
    * Exactly-once as a CHAIN: the foreachBatch `batchId` threads into
    * every stateful stage, and the stages commit in a FIXED order
    * (dedup append → window carry → batch carry → manifest), so a crash
    * anywhere leaves a committed prefix — on redelivery each committed
    * stage detects the replay and re-emits bit-identically while the
    * first uncommitted stage applies fresh. Documents must arrive in
    * ascending `idCol` order across batches (the packing contract,
    * enforced); per-batch work is O(batch) against bounded standing
    * state everywhere (signatures scan slim, carry < windowLen tokens,
    * totals ≤ buckets rows, manifest one row per shard).
    */
  def lifecycleIngest(spark: org.apache.spark.sql.SparkSession,
                      statePath: String, batch: DataFrame,
                      idCol: String, textCol: String, srcCol: String,
                      gatePath: String, decontamPath: String,
                      indexPath: String, tokPath: String, windowLen: Int,
                      boundaries: DataFrame, batchBudget: Long,
                      maxContaminatedFrac: Double = 0.5,
                      dedupThreshold: Double = 0.3, maxBucket: Int = 100000,
                      posCls: String = "pos", negCls: String = "neg",
                      batchId: Long = -1L,
                      failAfterStage: Option[Int] = None,
                      oovVocabLimit: Option[Long] = None,
                      eceLabelCol: Option[String] = None): LifecycleBatchOut = {
    // TEST-ONLY failure injection: throw after stage k's commit, turning
    // the fixed-order-commit crash argument into an executed proof —
    // StreamingSpec kills the verb at every boundary in turn and pins
    // the redelivered outputs bit-identical to an uncrashed run.
    // Stage commits: 1 = dedup index append, 2 = window carry,
    // 3 = batch carry, 4 = manifest; 0 = before any commit.
    def crashPoint(k: Int): Unit =
      if (failAfterStage.contains(k))
        throw new RuntimeException(
          s"lifecycleIngest: injected crash after stage $k (test hook)")
    val (thr, _) = graft.text.Classify.gateThreshold(spark, gatePath)
    val scored = graft.text.Classify.scoreBinaryFromModel(spark, gatePath,
      batch, idCol, textCol, posCls, negCls)
    val gated = batch.join(scored.filter(col("s") >= thr).select(idCol),
      Seq(idCol), "left_semi")
    val dec = graft.ml.Dedup.decontaminateFromIndex(spark, decontamPath,
      gated, idCol, textCol, maxContaminatedFrac)
    crashPoint(0)
    val admitted = graft.ml.Dedup.trackCache(
      graft.ml.Dedup.ingestDedup(spark, indexPath, dec, idCol, textCol,
        dedupThreshold, maxBucket, batchId))
    crashPoint(1)
    val ids = graft.ml.Dedup.trackCache(
      graft.text.Bpe.encodeDocsFromTokenizer(spark, tokPath, admitted,
        idCol, textCol))
    val (sep, _, _) = graft.text.Bpe.tokenizerMeta(spark, tokPath)
    val windows = graft.ops.Scale.contextWindowsIngest(spark,
      s"$statePath/windows", ids, idCol, "ids", windowLen, batchId, sep)
    crashPoint(2)
    val batches = graft.ops.Scale.lengthBatchesIngest(spark,
      s"$statePath/batches", ids, idCol, col("n_tokens"), boundaries,
      batchBudget, batchId)
    crashPoint(3)
    val manifest = graft.ops.Scale.shardManifestIngest(spark,
      s"$statePath/manifest",
      batch.select(col(idCol), col(srcCol))
        .join(ids.select(col(idCol), col("n_tokens")), Seq(idCol)),
      srcCol, idCol, col("n_tokens"),
      graft.ops.Sketch.portableHash(col(idCol).cast("string")), batchId)
    crashPoint(4)
    // HEALTH-MONITOR RIDERS — the OOV and calibration monitors folded
    // into the same per-batch pass (one deployment wires ONE stream, not
    // four), each a standalone verb invoked on this batch's relations so
    // rider state is BIT-IDENTICAL to running the monitor separately
    // over the same batches (StreamingSpec pins it). They commit LAST
    // (stages 5/6): a crash between the manifest and a rider leaves the
    // rider one batch behind, and the redelivery re-emits stages 1–4
    // while the rider applies fresh — same exactly-once algebra.
    val oov = oovVocabLimit.map { lim =>
      graft.text.Bpe.oovMonitorIngest(spark, s"$statePath/oov", admitted,
        idCol, textCol, srcCol, tokPath, vocabLimit = lim,
        batchId = batchId)
    }
    crashPoint(5)
    val ece = eceLabelCol.map { lab =>
      graft.ml.Eval.eceMonitorIngest(spark, s"$statePath/ece",
        scored.join(batch.select(col(idCol), col(lab)), Seq(idCol)),
        lab, "s", bins = 10, batchId = batchId)
    }
    crashPoint(6)
    LifecycleBatchOut(admitted, windows, batches, manifest, oov, ece)
  }

  /** [[lifecycleIngest]] on a stream — the whole q_lifecycle_e2e chain
    * running per micro-batch under foreachBatch, batchId-idempotent at
    * every stateful stage (StreamingSpec pins streamed windows, batch
    * assignments, and the final manifest against the one-shot batch
    * composition over the same frozen artifacts).
    *
    * OPTIONAL EXPORT RIDER (`exportEvery` > 0 + `exportPath`): the one
    * lifecycle stream also keeps a TRAINING-SHARD EXPORT in line.
    * Each batch's admitted survivors land in a standing
    * `<statePath>/admitted` store as their OWN `batch_seq=batchId`
    * partition (dynamic overwrite — a redelivered batch replaces its own
    * partition with the identical re-emitted survivor set, so the store
    * is replay-idempotent); every `exportEvery` batches
    * [[lifecycleExportCycle]] reconciles the export at O(delta), not
    * O(corpus): a persisted cursor (`<statePath>/export_cursor`,
    * staged-swap committed LAST) names the highest batch_seq already
    * exported, the cycle reads ONLY the newer `batch_seq=` partitions
    * (partition-pruned), derives the touched `shard = id div
    * exportDocsPerShard` keys from them (documents arrive in ascending
    * id order — the packing contract — so these are the tail shards),
    * re-reads ONLY those shards' standing rows from the export itself
    * (shard-pruned), and hands the deduped union to
    * [[graft.ops.Scale.resyncShardsDelta]] (data first, manifest last,
    * bootstrap included — a crashed cycle at ANY point leaves the prior
    * manifest-or-absence authoritative and the rerun completes
    * idempotently; the id-dedup absorbs rows a crashed data write
    * already landed). `admittedCompactEvery` > 0 additionally collapses
    * the admitted store's already-exported `batch_seq=` partitions into
    * a base every that many batches ([[graft.ops.Scale
    * .compactBatchStore]]), bounding the store's partition count for
    * the life of the stream; the current batch and un-exported
    * partitions are never folded, so redelivery overwrite and the
    * cursor's pruning both keep working across the boundary. */
  def streamingLifecycle(t: Tbl, idCol: String, textCol: String,
                         srcCol: String, gatePath: String,
                         decontamPath: String, indexPath: String,
                         tokPath: String, windowLen: Int,
                         boundaries: DataFrame, batchBudget: Long,
                         statePath: String,
                         maxContaminatedFrac: Double = 0.5,
                         dedupThreshold: Double = 0.3,
                         maxBucket: Int = 100000,
                         oovVocabLimit: Option[Long] = None,
                         eceLabelCol: Option[String] = None,
                         compactEvery: Int = 0,
                         exportEvery: Int = 0,
                         exportPath: String = null,
                         exportDocsPerShard: Long = 1000L,
                         admittedCompactEvery: Int = 0)
                        (sink: LifecycleBatchOut => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(exportEvery <= 0 || exportPath != null,
      "exportEvery > 0 requires exportPath")
    t.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      // auto-maintenance between batches (see streamingIngestDedup): the
      // standing minhash index compacts every compactEvery batches in the
      // serial foreachBatch slot, keeping its partition count bounded for
      // the life of the stream
      val compactNow = compactEvery > 0 && batchId >= 0 &&
        batchId % compactEvery == (compactEvery - 1)
      val o0 = lifecycleIngest(spark, statePath, batch, idCol,
        textCol, srcCol, gatePath, decontamPath, indexPath, tokPath,
        windowLen, boundaries, batchBudget, maxContaminatedFrac,
        dedupThreshold, maxBucket, batchId = batchId,
        oovVocabLimit = oovVocabLimit, eceLabelCol = eceLabelCol)
      // on a compacting batch, pin every emitted frame first — they are
      // lazy over the pre-compaction sigs files the swap will delete
      // (see streamingIngestDedup)
      val o = if (compactNow)
        o0.copy(admitted = o0.admitted.localCheckpoint(true),
          windows = o0.windows.localCheckpoint(true),
          batches = o0.batches.localCheckpoint(true),
          manifest = o0.manifest.localCheckpoint(true),
          oov = o0.oov.map(_.localCheckpoint(true)),
          ece = o0.ece.map(_.localCheckpoint(true)))
        else o0
      sink(o)
      if (exportEvery > 0 && batchId >= 0) {
        // standing admitted store — the batch's own partition, replaced
        // wholesale on redelivery (ingestDedup re-emits the identical
        // survivor set). Written BEFORE any compaction so the frame's
        // file lineage is still alive. Refused loudly while an offline
        // compactBatchStore holds the store's sibling maintenance lease.
        val admittedPath = s"$statePath/admitted"
        graft.ops.Lease.check(spark, s"$admittedPath.maint",
          "streamingLifecycle admitted append")
        graft.ops.CarryState.recoverDir(spark, admittedPath)
        o.admitted.withColumn("batch_seq", lit(batchId))
          .write.partitionBy("batch_seq")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(admittedPath)
        if (batchId % exportEvery == (exportEvery - 1))
          lifecycleExportCycle(spark, statePath, exportPath, idCol,
            textCol, batchId, exportDocsPerShard)
        if (admittedCompactEvery > 0 &&
            batchId % admittedCompactEvery == (admittedCompactEvery - 1)) {
          // fold only partitions that are BOTH already exported (the
          // cursor's pruning needs un-exported ones individually
          // addressable) AND past the redelivery window (the current
          // batch's partition must stay replaceable wholesale)
          val upTo = math.min(exportCursor(spark, statePath), batchId - 1)
          if (upTo >= 0)
            graft.ops.Scale.compactBatchStore(spark, admittedPath, upTo)
        }
      }
      if (compactNow)
        graft.ml.Dedup.compactMinhashIndex(spark, indexPath)
    }
  }

  /** The export rider's persisted cursor: the highest `batch_seq` whose
    * admitted partition has been folded into the shard export. -1 before
    * the first completed cycle (or if a crash corrupted the cursor — the
    * cycle then re-derives from ALL partitions, slower but idempotent). */
  private[graft] def exportCursor(
      spark: org.apache.spark.sql.SparkSession, statePath: String): Long = {
    graft.ops.CarryState.recoverDir(spark, s"$statePath/export_cursor")
    scala.util.Try(
      spark.read.parquet(s"$statePath/export_cursor").head()
        .getAs[Long]("last_seq")).getOrElse(-1L)
  }

  /** ONE EXPORT CYCLE of [[streamingLifecycle]]'s training-shard rider,
    * O(delta) in the new admitted data, never O(accumulated corpus):
    *
    *   1. read ONLY the admitted partitions newer than the persisted
    *      cursor (`batch_seq > last_seq` — partition-pruned);
    *   2. derive the touched `shard` keys from those rows alone
    *      (ascending-id packing → the tail shards; bounded driver list,
    *      the DPP-handle idiom);
    *   3. re-read ONLY those shards' standing rows from the export
    *      (shard-pruned — the export is its own record of what each
    *      shard held), dedup by id against the new rows (absorbs rows a
    *      crashed previous cycle's data write already landed);
    *   4. [[graft.ops.Scale.resyncShardsDelta]]: rewrite exactly the
    *      added/changed shards (data first), carry every untouched
    *      manifest row forward verbatim, manifest last;
    *   5. advance the cursor (staged swap, [[graft.ops.CarryState
    *      .replaceDir]]) — LAST, so a crash anywhere earlier replays the
    *      whole cycle against the old cursor and lands identically.
    *
    * Exposed private[graft] so the spec can drive cycles directly and
    * pin the scan set. */
  private[graft] def lifecycleExportCycle(
      spark: org.apache.spark.sql.SparkSession, statePath: String,
      exportPath: String, idCol: String, textCol: String, batchId: Long,
      docsPerShard: Long): Unit = {
    val admittedPath = s"$statePath/admitted"
    val lastSeq = exportCursor(spark, statePath)
    val newRows = spark.read.parquet(admittedPath)
      .filter(col("batch_seq").cast("long") > lastSeq)
      .drop("batch_seq")
    val shardOf = expr(s"CAST(`$idCol` AS BIGINT) div $docsPerShard")
    // tail-shard keys, from the new rows alone (bounded: new docs only)
    val touchedKeys = newRows.select(shardOf.as("shard")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (touchedKeys.nonEmpty) {
      val sizeC = graft.text.TextFns.tokenCount(col(textCol)).cast("long")
      val fpC = graft.ops.Sketch.portableHash(col(textCol))
      val fs = new org.apache.hadoop.fs.Path(exportPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the touched shards' standing rows come from the export ITSELF
      // (shard-pruned read), so the accumulated admitted store is never
      // re-scanned; absent on bootstrap
      val standing =
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$exportPath/data")))
          scala.util.Try(
            spark.read.parquet(s"$exportPath/data")
              .filter(col("shard").isin(touchedKeys: _*))
              .drop("shard"))
            .getOrElse(newRows.limit(0))
        else newRows.limit(0)
      // id-dedup: disjoint in normal operation (ascending ids); under a
      // crashed-cycle replay the standing tail already holds some new
      // rows — identical content, either copy serves
      val full = standing.unionByName(newRows)
        .dropDuplicates(Seq(idCol))
        .withColumn("shard", shardOf)
      graft.ops.Scale.resyncShardsDelta(spark, full, exportPath, "shard",
        idCol, sizeC, fpC)
    }
    // cursor LAST — the cycle's commit point
    graft.ops.CarryState.replaceDir(spark, s"$statePath/export_cursor") {
      staging =>
        spark.range(1).select(lit(batchId).as("last_seq"))
          .write.mode("overwrite").parquet(staging)
    }
  }

  /** Ingest-time snapshot classification against a FROZEN corpus version
    * ([[graft.ops.Scale.snapshotDiff]] per micro-batch): every arriving
    * row is labeled `added` (id unseen in the old snapshot), `changed`
    * (content fingerprint differs), or `unchanged` — the change-data feed
    * that decides what re-enters a curation pipeline. `removed` is
    * undefined per batch (absence from one micro-batch is not absence
    * from the stream), so the per-batch output is restricted to the
    * ARRIVING ids; StreamingSpec pins stream == the batch diff restricted
    * the same way. foreachBatch, stateless — the old snapshot is the only
    * state, re-read per batch (DPP/caching applies at real scale).
    */
  def streamingSnapshotDiff(t: Tbl, idCol: String, contentCols: Seq[String],
                            oldPath: String)
                           (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val old = batch.sparkSession.read.parquet(oldPath)
      sink(graft.ops.Scale.snapshotDiff(old, batch, idCol, contentCols)
        .join(batch.select(idCol), Seq(idCol), "left_semi"))
    }

  /** Ingest-time linear-probe scoring against a persisted
    * [[graft.ml.Regress.saveModel]] artifact — the FineWeb-Edu serving
    * shape: the probe was fit ONCE on a reference corpus, and each
    * arriving micro-batch is scored map-only with the frozen 1-row
    * weights broadcast ([[graft.ml.Regress.predictFromModel]] per batch),
    * bit-identical to batch scoring (StreamingSpec pins it). foreachBatch,
    * stateless.
    */
  def streamingProbeScore(t: Tbl, path: String, xCols: Seq[String],
                          yCol: Option[String] = None)
                         (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Regress.predictFromModel(batch.sparkSession, path,
        batch, xCols, yCol))
    }

  /** Ingest-time quantile-bucket assignment against a persisted
    * [[graft.ops.Scale.quantileBoundaries]] artifact — the CCNet serving
    * shape: the cutoffs were computed ONCE on a reference corpus, and
    * every arriving row is assigned by comparison against the frozen
    * boundary relation ([[graft.ops.Scale.assignByBoundaries]] per
    * micro-batch — broadcast-sized boundary side, no re-ranking, no
    * state). StreamingSpec pins stream == batch assignment.
    */
  def streamingBucketAssign(t: Tbl, grpCols: Seq[String], valueCol: Column,
                            boundariesPath: String)
                           (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ops.Scale.assignByBoundaries(batch, grpCols, valueCol,
        batch.sparkSession.read.parquet(boundariesPath)))
    }

  /** Ingest-time interpolated-KN quality scoring against a persisted
    * [[graft.text.Lm.buildKnModel]] artifact — the Kneser–Ney sibling of
    * [[streamingLmScoreBackoff]]: each micro-batch scores via
    * [[graft.text.Lm.scoreDocsKNFromModel]], bit-identical to batch
    * scoring with the same frozen model (StreamingSpec pins it).
    * foreachBatch, stateless; the model joins as a relation (never
    * assumed broadcastable).
    */
  def streamingLmScoreKN(t: Tbl, idCol: String, textCol: String,
                         path: String, discount: Double = 0.75)
                        (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.text.Lm.scoreDocsKNFromModel(batch.sparkSession, path,
        batch, idCol, textCol, discount))
    }

  /** Dedup-on-ingest against a PERSISTED minhash index
    * ([[graft.ml.Dedup.buildMinhashIndex]]) WITH index growth: each
    * micro-batch drops docs near-duplicating the standing signatures (or a
    * smaller-id batch sibling), appends the survivors' signatures as a
    * fresh `batch_seq` partition, and emits the admitted rows — so later
    * micro-batches dedup against everything earlier ones admitted, the
    * streaming twin of running [[graft.ml.Dedup.ingestDedup]] batch after
    * batch (StreamingSpec pins stream == sequential batch ingest).
    * foreachBatch; micro-batches run serially, so index growth is
    * race-free. No streaming state — the index IS the state, durable and
    * shared with any batch backfill.
    */
  def streamingIngestDedup(t: Tbl, idCol: String, textCol: String,
                           path: String, threshold: Double = 0.8,
                           maxBucket: Int = 100000,
                           compactEvery: Int = 0)
                          (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // AUTO-MAINTENANCE: foreachBatch micro-batches run serially, so
      // "after the sink, before the next batch" is the natural offline
      // slot the compactor's single-writer lease asks for. Compaction
      // preserves the LAST partition verbatim, so an immediate replay of
      // THIS batch still re-emits across the boundary; partition count
      // stays bounded at streaming cadence instead of growing forever.
      val compactNow = compactEvery > 0 && batchId >= 0 &&
        batchId % compactEvery == (compactEvery - 1)
      val out0 = graft.ml.Dedup.ingestDedup(batch.sparkSession, path, batch,
        idCol, textCol, threshold, maxBucket, batchId)
      // on a compacting batch, PIN the emitted frame before the sink:
      // `out` is lazy over the PRE-compaction sigs files, and a sink that
      // does not fully materialize its input synchronously (async write,
      // retained lazy frame) would otherwise hit FileNotFound when the
      // swap deletes them. localCheckpoint severs the file-index lineage.
      val out = if (compactNow) out0.localCheckpoint(true) else out0
      sink(out)
      if (compactNow)
        graft.ml.Dedup.compactMinhashIndex(batch.sparkSession, path)
    }

  /** Ingest-time winnowed near-dup candidates: arriving docs' winnowed
    * fingerprints ([[graft.ml.Dedup.winnowFingerprints]], same n/w/hash as
    * the persisted corpus index) joined against the PERSISTED (id, fp)
    * table; emits (id_new, id_corpus, n_shared >= minShared). foreachBatch,
    * stateless; the fp join is stats-driven.
    */
  def streamingWinnowCandidates(t: Tbl, idCol: String, textCol: String,
                                corpusFps: DataFrame, n: Int = 5, w: Int = 4,
                                minShared: Long = 2,
                                hash: Column => Column = xxhash64(_))
                               (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val newFps = graft.ml.Dedup
        .winnowFingerprints(batch, idCol, textCol, n, w, hash)
        .select(col(idCol).as("id_new"), col("fp")).distinct()
      val corpus = corpusFps
        .select(col(corpusFps.columns.head).as("id_corpus"), col("fp"))
        .distinct()
      sink(newFps.join(corpus, "fp")
        .groupBy("id_new", "id_corpus")
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= minShared))
    }

  /** [[streamingWinnowCandidates]] served from a PERSISTED
    * [[graft.ml.Dedup.buildWinnowIndex]] with partition pruning: each
    * micro-batch probes only the `fp_part=` partitions its own
    * fingerprints can collide in, instead of re-joining the WHOLE corpus
    * fp table per batch (the flat form's scan — the pre-r16 minhash
    * shape). Output identical to the flat join against the same corpus
    * (StreamingSpec pins it); n/w/hash come from the index meta.
    * foreachBatch, stateless — the index is the only state. */
  def streamingWinnowCandidatesIndexed(t: Tbl, idCol: String,
                                       textCol: String, indexPath: String,
                                       minShared: Long = 2)
                                      (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ml.Dedup.winnowCandidatesAgainstIndex(batch.sparkSession,
        indexPath, batch, idCol, textCol, minShared))
    }

  /** Winnow dedup-on-ingest WITH index growth — the streaming twin of
    * running [[graft.ml.Dedup.winnowIngest]] batch after batch: each
    * micro-batch drops docs sharing `minShared` winnowed fingerprints
    * with the standing corpus, appends the survivors' fps as a fresh
    * partition, and emits the admitted rows, so later micro-batches
    * dedup against everything earlier ones admitted (StreamingSpec pins
    * stream == sequential batch ingest). foreachBatch; micro-batches run
    * serially, so index growth is race-free and the per-batch
    * `_MAINTENANCE` lease never contends with itself. Replays re-derive
    * exactly (the batch-id exclusion — see [[graft.ml.Dedup
    * .winnowIngest]]), so no streaming state exists: the index IS the
    * state, durable and shared with any batch backfill.
    *
    * `compactEvery` > 0 folds the accumulated `batch_seq=` partitions
    * into the base every that many batches
    * ([[graft.ml.Dedup.compactWinnowIndex]]) in the serial slot after
    * the sink — the partition count stays bounded at streaming cadence.
    * On compacting batches the emitted frame is localCheckpoint-pinned
    * BEFORE the sink: the swap deletes the pre-compaction fps files the
    * lazy frame reads, and a sink that does not materialize its input
    * synchronously would otherwise hit FileNotFound (the
    * [[streamingIngestDedup]] hazard, closed the same way).
    */
  def streamingWinnowIngest(t: Tbl, idCol: String, textCol: String,
                            indexPath: String, minShared: Long = 2L,
                            compactEvery: Int = 0)
                           (sink: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    t.df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val compactNow = compactEvery > 0 && batchId >= 0 &&
        batchId % compactEvery == (compactEvery - 1)
      val out0 = graft.ml.Dedup.winnowIngest(batch.sparkSession, indexPath,
        batch, idCol, textCol, minShared)
      val out = if (compactNow) out0.localCheckpoint(true) else out0
      sink(out)
      if (compactNow)
        graft.ml.Dedup.compactWinnowIndex(batch.sparkSession, indexPath)
    }

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
