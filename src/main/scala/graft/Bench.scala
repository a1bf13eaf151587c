package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. local[32] with shuffle.partitions=32 (match cores,
  * not the 200 default) and AQE on — the same knobs a cluster deployment
  * would start from.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table (file index + parquet footers) and JIT the
    // codegen/shuffle paths once, so per-query timings measure the engine,
    // not first-job init.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$tbl.parquet").count()
    SparkEntry.queries.get("q1_agg").foreach(q => q(spark, sfDir).count())
    SparkEntry.queries.get("q_join_multi").foreach(q => q(spark, sfDir).count())

    // optional args: run only the named queries (local iteration aid);
    // the driver passes none and gets the full suite
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    // min-of-3 per query: a single-shot count() has no defense against a
    // contended host — one noisy scheduling window inflated unrelated
    // shuffle-bearing queries ~10x in a past artifact. The minimum is the
    // least-contended observation and the best estimate of the engine's cost.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // A throwing query must NOT produce a timing: in round 8 nine broken
    // queries were recorded as 0.06-0.18s "results" (time-to-throw), three
    // of which read as improvements. Failures go to a parallel errors map.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val allTimes = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            errors.getOrElseUpdate(name,
              Option(e.getMessage).getOrElse(e.getClass.getName)
                .linesIterator.take(1).mkString)
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // pair generators cache intermediates that feed multiple consumers
        // within one query; across 80+ queries those pins accumulate into
        // GC/spill pressure that contaminates later timings — and a repeat
        // must not reuse the previous run's cache. Measure each run from a
        // clean block manager.
        spark.catalog.clearCache()
        if (ok) Some(dt) else None
      }
      if (times.isEmpty) None else Some(name -> times)
    }
    val results = allTimes.map { case (name, ts) => name -> ts.min }
    // 3dp per-query values: full-precision doubles pushed the single JSON
    // line past the driver's bounded stdout-tail capture in round 6 and the
    // first ~35 queries (incl. q1_agg and the whole dedup tail) were lost
    // from the permanent record. 3dp halves the line; printing the map alone
    // on its own line FIRST means even a truncated tail still ends with the
    // full contract line.
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Contention canary: the round-11 committed record doubled trivial
    // map-only queries (q_select/q_mutate/q_rename never change plan — they
    // should never move) alongside 2-6x swings on shuffle-heavy ones: a
    // contended-host window recorded as permanent perf history. Compare the
    // trivial band against the PRIOR committed record (read before this run
    // overwrites it) and flag the run loudly so a noisy record is never
    // silently committed again.
    val canaryQs = Seq("q_select", "q_mutate", "q_rename")
    val contended: Boolean = {
      val priorFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_local.json")
      val prior: Map[String, Double] =
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(priorFile)), "UTF-8")
          // a real JSON reader (Jackson rides Spark's classpath), not the
          // ad-hoc regexes this block used to carry — key order, spacing
          // or nesting changes in the record can no longer blind it
          val root = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(txt)
          // only a same-scale record is a valid baseline: after an sf (or
          // machine) switch the trivial band legitimately moves, and a
          // false "contended" flag would poison the durable history the
          // canary exists to protect
          val priorSf = Option(root.get("sf")).map(_.asText())
          if (!priorSf.contains(sfDir)) Map.empty
          else {
            val qn = Option(root.get("queries"))
            val found = canaryQs.flatMap { q =>
              qn.flatMap(n => Option(n.get(q))).map(q -> _.asDouble())
            }.toMap
            // a same-sf record with NO canary baselines means the record
            // format (or the canary query names) drifted — say so instead
            // of silently degrading to "no baseline", which would disable
            // the canary without a trace
            if (found.isEmpty)
              System.err.println("graft bench WARNING: prior record " +
                s"$priorFile matches sf but yielded no canary baselines " +
                s"(${canaryQs.mkString("/")}) - record format drift? " +
                "contention canary is running blind this round")
            found
          }
        } catch { case _: Exception => Map.empty }
      val now = results.toMap
      val ratios = canaryQs.flatMap(q =>
        for (p <- prior.get(q); c <- now.get(q) if p > 0) yield (q, c / p))
      val hot = ratios.filter(_._2 > 1.5)
      if (hot.nonEmpty)
        System.err.println("graft bench WARNING: contention canary tripped - " +
          hot.map { case (q, r) => f"$q ${r}%.2fx prior" }.mkString(", ") +
          "; this record reflects a contended host, re-run in a quiet window")
      hot.nonEmpty
    }
    // Full contract line (metric/value/unit/queries/sf) printed FIRST: the
    // per-query map alone is ~6 KB at 276 queries, far past the driver's
    // ~2 KB stdout-tail capture — BENCH_r15..r18 all recorded parsed:null
    // because this line used to be LAST and its head (including "metric" and
    // "value") fell off the front of the tail. The driver reads the tail
    // from the END, so the parseable line must be the final one and must be
    // small; the full map stays here (whole-stdout consumers, humans) and in
    // the committed bench_local.json record.
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","contended":$contended,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    // canary-normalized ratios baseline: mean of the trivial trio
    // (map-only plans that never change) — used both in the compact line
    // below and the durable record's normalized block.
    val trio = Seq("q_select", "q_rename", "q1_agg").flatMap(results.toMap.get)
    val canaryMean = if (trio.nonEmpty) trio.sum / trio.size else 0.0
    // Compact summary LAST (~200 bytes): always intact inside the tail
    // capture, so the driver's cross-round comparison has a non-null total
    // again. Per-query ground truth lives in bench_local.json (committed).
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"contended":$contended,"canary_mean":${f3(canaryMean)},"queries_file":"bench_local.json","errors":$errs,"sf":"$sfDir"}""")
    // Durable record: the driver's stdout-tail capture truncates long lines
    // (r6 and r7 both lost the head of the per-query map), so the full map
    // is ALSO written to a repo file and committed each round — cross-round
    // perf comparison must not depend on what survives the tail buffer.
    // Full runs only: a filtered local iteration must not overwrite the
    // round's complete record.
    if (args.isEmpty) {
      val file = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_local.json")
      // canary-normalized ratios: each query / the mean of the trivial
      // trio (q_select/q_rename/q1_agg — map-only plans that never
      // change). Host-window drift moves the whole record INCLUDING the
      // trio, so a code-attributable regression is one whose NORMALIZED
      // ratio moved across rounds — the cross-round drift adjudication
      // (README perf table) reads this block instead of relitigating raw
      // seconds by hand every round.
      val norm =
        if (canaryMean > 0)
          results.map { case (k, v) => "\"" + k + "\":" + f3(v / canaryMean) }
            .mkString("{", ",", "}")
        else "{}"
      // per-query WITHIN-RUN scatter (max/min across the reps): the r18
      // q_interleave A/B showed some queries scatter 2x+ between
      // invocations of IDENTICAL bytecode inside one window — more than
      // the canary trio models — so a cross-round normalized ratio on a
      // high-spread query is scatter until a same-minute A/B says
      // otherwise. This block is the evidence: drift adjudication reads
      // the PRIOR record's spread before escalating a ratio.
      def f2(v: Double) = BigDecimal(v).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toString
      val spread = allTimes.filter(_._2.size >= 2)
        .map { case (k, ts) => "\"" + k + "\":" + f2(ts.max / ts.min) }
        .mkString("{", ",", "}")
      val body = s"""{"metric":"total","value":${f3(total)},"unit":"sec","reps":$reps,"contended":$contended,"canary_mean":${f3(canaryMean)},"queries":$qs,"normalized":$norm,"spread":$spread,"errors":$errs,"sf":"$sfDir"}\n"""
      try java.nio.file.Files.write(java.nio.file.Paths.get(file),
        body.getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"graft warning: could not write $file: $e") }
    }
    spark.stop()
  }
}
