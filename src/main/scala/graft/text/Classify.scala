package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classification at corpus scale — the
  * deterministic stand-in for the fastText-style classifiers real curation
  * pipelines train for language ID and quality gating (CCNet trains
  * fastText lang-id; GPT-3/WebText gate on a quality classifier; FineWeb
  * scores with a linear probe). Reference semantics: the standard
  * add-one-smoothed multinomial NB (Manning–Raghavan–Schütze, IIR ch. 13):
  *
  *   score(doc, c) = ln P(c) + Σ_pos ln (cnt(c, w_pos) + 1) / (N_c + |V|)
  *
  * with P(c) = docs_c / docs_total, N_c = class token total, |V| = the
  * TRAINING vocabulary size, and prediction = argmax_c (score, then class
  * name ascending on exact ties so the argmax is a total function of the
  * counts).
  *
  * Shapes at 100 TB:
  *   - TRAIN is one corpus pass: explode tokens, one map-side-combined
  *     (cls, w) count aggregate. The model is a standing RELATION
  *     (persist with [[buildNbModel]], score forever) — never assumed
  *     broadcastable, a web-scale vocabulary times classes is itself big.
  *   - Class stats (docs, tokens per class) are BOUNDED by the label set —
  *     a classifier's label space is a model parameter, not data — so they
  *     ride into scoring as a driver-collected literal array and the
  *     doc × class expansion is a map-side explode, not a join.
  *   - SCORE is the [[Lm.scoreDocs]] plan: explode doc tokens, explode the
  *     literal class structs, ONE hash equi-join against the model on
  *     (cls, w), then a per-(doc, class) position-ordered fold (bitwise
  *     partition-invariant — float addition order can never perturb a
  *     score) and a per-doc argmax window over ≤ |classes| rows.
  *
  * Determinism: counts are exact integers; the smoothed conditional is one
  * division; `ln` agrees bitwise between the JVM and DuckDB on these
  * inputs (the q_lm family discipline); ties in the argmax break on the
  * class name. The whole train→score pipeline replays in DuckDB
  * (q_nb_classify), with the final score rounded to 6dp on both sides.
  */
object Classify {

  /** Per-class training-doc and token totals: (cls, n_docs, n_tokens).
    * One aggregate over the training corpus; bounded by the label set.
    */
  def nbClassStats(df: DataFrame, classCol: String, textCol: String,
                   asciiOnly: Boolean = true): DataFrame =
    df.select(col(classCol).as("cls"),
        size(Lm.tokens(col(textCol), asciiOnly)).as("__n"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_tokens"))

  /** Train the word-count model: one row per distinct (class, word) —
    * (cls, w, cnt), exact counts over the training corpus. One explode +
    * one map-side-combined count aggregate; persist next to the corpus
    * (or via [[buildNbModel]]) and score against it forever.
    */
  def nbWordCounts(df: DataFrame, classCol: String, textCol: String,
                   asciiOnly: Boolean = true): DataFrame =
    df.select(col(classCol).as("cls"),
        explode(Lm.tokens(col(textCol), asciiOnly)).as("w"))
      .groupBy("cls", "w")
      .agg(count(lit(1)).as("cnt"))

  /** Training vocabulary size |V| — distinct words across ALL classes of a
    * [[nbWordCounts]] relation (the add-one denominator).
    */
  def nbVocab(wordCounts: DataFrame): Long =
    wordCounts.select("w").distinct().count()

  /** Per-(doc, class) posterior scores: (idCol, cls, n_toks, score) with
    * one row per document per class — the full posterior surface
    * (calibration checks, margin-based abstention). `classStats` is the
    * driver-collected (cls, n_docs, n_tokens) list — bounded by the label
    * set — and `totalDocs` the training-corpus document count. Documents
    * with zero in-vocabulary tokens score the bare class prior.
    */
  def nbScoresAll(docs: DataFrame, idCol: String, textCol: String,
                  wordCounts: DataFrame,
                  classStats: Seq[(String, Long, Long)], vocab: Long,
                  totalDocs: Long,
                  asciiOnly: Boolean = true): DataFrame = {
    require(classStats.nonEmpty, "classStats must be non-empty")
    require(vocab > 0, "vocab must be positive")
    require(totalDocs > 0, "totalDocs must be positive")
    // the bounded label set as a literal struct array: the doc x class
    // expansion is a map-side explode, never a join the optimizer has to
    // get right. The model joins PIVOTED to one row per word (each class's
    // count a column — |classes| is a model parameter, bounded), so the
    // corpus-scale join probes once per TOKEN, not once per token × class;
    // the class explode happens AFTER the join on the slim joined rows.
    // Values are unchanged: cnt_c read from the pivoted column is exactly
    // the (cls, w) count the per-class join row carried.
    val classes = classStats.sortBy(_._1)
    val clsArr = array(classes.map { case (c, nd, nt) =>
      struct(lit(c).as("cls"), lit(nd).as("n_docs"), lit(nt).as("n_tokens"))
    }: _*)
    val cntCols = classes.zipWithIndex.map { case ((c, _, _), i) =>
      max(when(col("cls") === c, col("cnt"))).as(s"__cnt_$i") }
    val pivoted = wordCounts.groupBy("w")
      .agg(cntCols.head, cntCols.tail: _*)
    val ex = docs
      .select(col(idCol), Lm.tokens(col(textCol), asciiOnly).as("__ts"))
      .select(col(idCol), posexplode_outer(col("__ts")).as(Seq("pos", "w")))
    val lp = ex
      .join(pivoted, Seq("w"), "left")
      .select(Seq(col(idCol), col("pos"), col("w"),
        explode(clsArr).as("c")) ++
        classes.indices.map(i => col(s"__cnt_$i")): _*)
      .select(col(idCol), col("pos"), col("w"), col("c.cls").as("cls"),
        col("c.n_docs").as("n_docs"), col("c.n_tokens").as("n_tokens"),
        classes.zipWithIndex.foldLeft(lit(null).cast("long")) {
          case (acc, ((c, _, _), i)) =>
            when(col("c.cls") === c, col(s"__cnt_$i")).otherwise(acc)
        }.as("cnt"))
      .withColumn("lp", when(col("w").isNotNull, log(
        (coalesce(col("cnt"), lit(0L)) + lit(1.0d)) /
          (col("n_tokens") + lit(vocab)))))
    lp.groupBy(col(idCol), col("cls"), col("n_docs"))
      .agg(count(col("w")).as("n_toks"),
        // nulls (the outer row of a token-less doc) drop out of the list
        collect_list(when(col("w").isNotNull,
          struct(col("pos"), col("lp")))).as("__ps"))
      .select(col(idCol), col("cls"), col("n_toks"),
        (log(col("n_docs") / lit(totalDocs)) +
          expr("aggregate(transform(array_sort(__ps), s -> s.lp), 0.0D," +
            " (a, x) -> a + x)")).as("score"))
  }

  /** Classify documents: (idCol, n_toks, pred, score) — the argmax class
    * per document with its posterior score. The argmax window runs over
    * ≤ |classes| rows per document (hash-partitioned by id, no skew);
    * ties break on the class name ascending.
    */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
                 wordCounts: DataFrame,
                 classStats: Seq[(String, Long, Long)], vocab: Long,
                 totalDocs: Long,
                 asciiOnly: Boolean = true): DataFrame = {
    val scores = nbScoresAll(docs, idCol, textCol, wordCounts, classStats,
      vocab, totalDocs, asciiOnly)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("cls").asc)
    scores.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("n_toks"), col("cls").as("pred"), col("score"))
  }

  /** Per-class top-k indicative words — classifier introspection (what a
    * fastText `dump`/feature-inspection pass gives you): rank each class's
    * words by the add-one-smoothed log-odds against the REST of the
    * training corpus,
    *
    *   ln[ ((cnt_c + 1)/(N_c + |V|)) / ((cnt_rest + 1)/(N_rest + |V|)) ],
    *
    * ties on the word ascending. One total-count aggregate + one hash
    * join against the model + a per-class top-k window (≤ |V| rows per
    * class, hash-partitioned). Pure count arithmetic + one ln — replays
    * in DuckDB (q_nb_features).
    */
  def nbTopFeatures(wordCounts: DataFrame,
                    classStats: Seq[(String, Long, Long)], vocab: Long,
                    k: Int): DataFrame = {
    require(classStats.nonEmpty, "classStats must be non-empty")
    require(vocab > 0 && k > 0, "vocab and k must be positive")
    val totalTokens = classStats.map(_._3).sum
    val ntokMap = map(classStats.sortBy(_._1).flatMap { case (c, _, nt) =>
      Seq(lit(c), lit(nt)) }: _*)
    val tot = wordCounts.groupBy("w").agg(sum("cnt").as("cnt_all"))
    val scored = wordCounts.join(tot, Seq("w"))
      .withColumn("__nt", element_at(ntokMap, col("cls")))
      .withColumn("log_odds", log(
        ((col("cnt") + lit(1.0d)) / (col("__nt") + lit(vocab))) /
          ((col("cnt_all") - col("cnt") + lit(1.0d)) /
            ((lit(totalTokens) - col("__nt")) + lit(vocab)))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cls")).orderBy(col("log_odds").desc, col("w").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("cls"), col("w"), col("rank").cast("long").as("rank"),
        col("log_odds"))
  }

  /** Persist the trained classifier as a self-describing artifact:
    * `<path>/words` = the (cls, w, cnt) relation, `<path>/classes` = the
    * (cls, n_docs, n_tokens) stats, `<path>/meta` = (vocab, total_docs).
    * Train once — the corpus is scanned twice (word counts, class stats),
    * both single aggregates — then every future batch or stream classifies
    * against the frozen parquet ([[classifyFromModel]],
    * [[graft.streaming.StreamVerbs.streamingNbClassify]]). Vocab is
    * counted from the WRITTEN words so model and meta can never disagree.
    */
  def buildNbModel(df: DataFrame, classCol: String, textCol: String,
                   path: String, asciiOnly: Boolean = true): Unit = {
    nbWordCounts(df, classCol, textCol, asciiOnly)
      .write.mode("overwrite").parquet(s"$path/words")
    nbClassStats(df, classCol, textCol, asciiOnly)
      .write.mode("overwrite").parquet(s"$path/classes")
    val spark = df.sparkSession
    val vocab = nbVocab(spark.read.parquet(s"$path/words"))
    val totalDocs = spark.read.parquet(s"$path/classes")
      .agg(coalesce(sum("n_docs"), lit(0L))).head().getLong(0)
    spark.range(1)
      .select(lit(vocab).as("vocab"), lit(totalDocs).as("total_docs"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Incrementally fold a new labeled batch into a persisted
    * [[buildNbModel]] artifact — the O(model + batch) training update:
    * NB's sufficient statistics are COUNTS, so the updated model is the
    * old (cls, w, cnt) relation unioned with the batch's counts and
    * re-aggregated; class stats add; vocab and totals recount from the
    * merged relations. The original corpus is never re-read. The merged
    * relations are staged next to the live ones and swapped in with a
    * filesystem rename (reading and overwriting the same parquet path in
    * one job is undefined), so a crash mid-append leaves the old model
    * intact on any filesystem with atomic rename (HDFS, local; on object
    * stores the rename is a copy — still correct, just not atomic).
    * NbSpec pins append == retrain-from-scratch bit-identity.
    */
  def appendToNbModel(spark: org.apache.spark.sql.SparkSession,
                      path: String, df: DataFrame, classCol: String,
                      textCol: String, asciiOnly: Boolean = true): Unit = {
    // the PATH's filesystem, not the default one — the model may live on
    // an object store while defaultFS is HDFS/local
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def swap(name: String): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$path/$name")
      val staged = new org.apache.hadoop.fs.Path(s"$path/$name.staging")
      fs.delete(live, true)
      require(fs.rename(staged, live), s"staging swap failed for $name")
    }
    spark.read.parquet(s"$path/words")
      .unionByName(nbWordCounts(df, classCol, textCol, asciiOnly))
      .groupBy("cls", "w").agg(sum("cnt").as("cnt"))
      .write.mode("overwrite").parquet(s"$path/words.staging")
    spark.read.parquet(s"$path/classes")
      .unionByName(nbClassStats(df, classCol, textCol, asciiOnly))
      .groupBy("cls")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      .write.mode("overwrite").parquet(s"$path/classes.staging")
    swap("words")
    swap("classes")
    val vocab = nbVocab(spark.read.parquet(s"$path/words"))
    val totalDocs = spark.read.parquet(s"$path/classes")
      .agg(coalesce(sum("n_docs"), lit(0L))).head().getLong(0)
    spark.range(1)
      .select(lit(vocab).as("vocab"), lit(totalDocs).as("total_docs"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Classify against a persisted [[buildNbModel]] artifact: the class
    * stats and meta are 1-row-scale driver reads (the self-describing-
    * index pattern of [[graft.ml.Pq.adcTopKFromIndex]]); the word model
    * joins as a relation. Bit-identical to classifying with the in-memory
    * model (NbSpec pins it).
    */
  def classifyFromModel(spark: org.apache.spark.sql.SparkSession,
                        path: String, docs: DataFrame, idCol: String,
                        textCol: String,
                        asciiOnly: Boolean = true): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val stats = spark.read.parquet(s"$path/classes")
      .collect().map(r => (r.getAs[String]("cls"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toSeq
    nbClassify(docs, idCol, textCol, spark.read.parquet(s"$path/words"),
      stats, meta.getAs[Long]("vocab"), meta.getAs[Long]("total_docs"),
      asciiOnly)
  }

  /** Binary posterior LOG-ODDS against a persisted [[buildNbModel]]
    * artifact trained on two classes: (idCol, s) with
    * s = round(score(posCls) − score(negCls), 6) — the scored relation
    * the threshold gate, PR sweep and calibration report all consume
    * (q_nb_auc's shape), served from the frozen model. Same plan as
    * [[classifyFromModel]] minus the argmax window: one model equi-join,
    * one per-doc pivot.
    */
  def scoreBinaryFromModel(spark: org.apache.spark.sql.SparkSession,
                           path: String, docs: DataFrame, idCol: String,
                           textCol: String, posCls: String = "pos",
                           negCls: String = "neg",
                           asciiOnly: Boolean = true): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val stats = spark.read.parquet(s"$path/classes")
      .collect().map(r => (r.getAs[String]("cls"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toSeq
    require(stats.exists(_._1 == posCls) && stats.exists(_._1 == negCls),
      s"model at $path lacks class $posCls or $negCls")
    nbScoresAll(docs, idCol, textCol, spark.read.parquet(s"$path/words"),
        stats, meta.getAs[Long]("vocab"), meta.getAs[Long]("total_docs"),
        asciiOnly)
      .groupBy(idCol)
      .agg(max(when(col("cls") === posCls, col("score"))).as("__sp"),
        max(when(col("cls") === negCls, col("score"))).as("__sn"))
      .select(col(idCol), round(col("__sp") - col("__sn"), 6).as("s"))
  }

  /** Calibrate and FREEZE the admission threshold next to a gate model:
    * sweep the PR curve of a scored calibration relation
    * ([[scoreBinaryFromModel]] output joined to truth), take the HIGHEST
    * score whose 6dp-rounded recall still reaches `recallTarget`
    * (q_gate_calibrated's rule — maximize precision subject to keeping
    * the positives), write it to `<path>/threshold` (one row: thr,
    * recall_target). The PR relation is distinct-score-bounded and the
    * pick is a 1-row driver read; serving never recomputes it
    * ([[graft.streaming.StreamVerbs.streamingCalibratedGate]]). Throws
    * when no threshold reaches the target (an uncalibratable gate should
    * fail at BUILD time, not admit everything at serve time).
    */
  def saveGateThreshold(spark: org.apache.spark.sql.SparkSession,
                        path: String, scored: DataFrame, labelCol: String,
                        recallTarget: Double): Unit = {
    val pr = graft.ml.Eval.prCurve(scored, labelCol, "s")
    val thr = pr.filter(col("recall") >= recallTarget).agg(max("s")).head()
    require(!thr.isNullAt(0),
      s"no threshold reaches recall $recallTarget: gate uncalibratable")
    spark.range(1)
      .select(lit(thr.getDouble(0)).as("thr"),
        lit(recallTarget).as("recall_target"))
      .write.mode("overwrite").parquet(s"$path/threshold")
  }

  /** The frozen (thr, recall_target) of [[saveGateThreshold]] — one
    * driver-read row. */
  def gateThreshold(spark: org.apache.spark.sql.SparkSession,
                    path: String): (Double, Double) = {
    val r = spark.read.parquet(s"$path/threshold").head()
    (r.getAs[Double]("thr"), r.getAs[Double]("recall_target"))
  }
}
