package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Scale, Sketch}
import graft.ml.Dedup

/** SparkEntry part 3 (round 9 additions): sketch-based frequency triage,
  * deterministic weighted corpus sampling, Z-order data layout, semantic
  * (embedding-cluster-scoped) dedup, leakage-safe cluster splits, BPE
  * tokenizer training, and triangle counting. Same aliasing + portable-hash
  * conventions as parts 1–2.
  */
object SparkEntry3 {

  private def t(s: SparkSession, dir: String, name: String): Tbl =
    SparkEntry.readTable(s, dir, name)

  import SparkEntry.Q

  private val CM_WIDTH = 64
  private val CM_DEPTH = 3

  private val Z_BITS = 8
  // quantization envelopes for q_zorder (clamped — sf-independent)
  private val Z_CUST_HI = 20000.0
  private val Z_PRICE_HI = 600000.0

  private val SEM_K = 64
  private val SEM_ITERS = 1
  private val SEM_THRESHOLD = 0.999

  def queries: Map[String, Q] = Map(
    // Count-Min frequency sketch over the event stream's user ids: build
    // the depth×width counter table in one counter-row shuffle, then probe
    // the estimates for a key subset. width=64 is deliberately undersized
    // for the user cardinality so the oracle exercises the collision
    // (overestimate) regime, not just exact counts.
    "q_count_min" -> ((s, dir) => {
      val ev = t(s, dir, "events").df
      val sk = Sketch.countMin(ev, col("user_id"), CM_WIDTH, CM_DEPTH)
      Sketch.countMinEstimate(sk, ev.filter(col("user_id") < 100),
        col("user_id"), CM_WIDTH, CM_DEPTH)
    }),

    // Per-group HLL cardinality sketches in the exact coupon regime
    // (distinct per group << 2^lgK): estimates equal exact distinct
    // counts, so the sketch path itself is oracle-checkable (the same
    // trick as q_heavy_hitters' exact regime).
    "q_hll_groups" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      Sketch.hllEstimate(
        Sketch.hllByGroup(docs, Seq("lang"), col("doc_id") % 50),
        Seq("lang"))
    }),

    // Efraimidis–Spirakis weighted sample without replacement: 20 customers
    // per market segment, weighted by account balance (shifted positive).
    // The sample is a pure function of (c_custkey, seed) — the oracle
    // replays the identical draw.
    "q_weighted_sample" -> ((s, dir) =>
      Scale.weightedSampleBy(t(s, dir, "customer").df,
          Seq("c_mktsegment"), "c_custkey",
          col("c_acctbal") + lit(1000.0), k = 20)
        .select("c_custkey", "c_mktsegment")),

    // Morton (Z-order) key over (customer, price): the layout key behind
    // multi-dimension file skipping. The query materializes the key itself
    // (the layout is plan-shape, pinned in ScaleSpec).
    "q_zorder" -> ((s, dir) => {
      val o = t(s, dir, "orders").df
      o.select(col("o_orderkey"),
        Scale.zorderValue(Seq(
          Scale.zorderQuantize(col("o_custkey"), 0.0, Z_CUST_HI, Z_BITS),
          Scale.zorderQuantize(col("o_totalprice"), 0.0, Z_PRICE_HI, Z_BITS)),
          Z_BITS).as("zval"))
    }),

    // Leakage-safe corpus split: near-dup clusters (exact-Jaccard pairs ->
    // connected components) land WHOLE on one side of the train/heldout
    // boundary; 8/10 of cluster-label hash space goes to train.
    "q_leak_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents").df
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      Dedup.leakSafeSplit(docs, "doc_id", pairs, trainParts = 8, denom = 10)
        .select("doc_id", "split")
    }),

    // Distributed BPE tokenizer training: 8 merge rounds over the document
    // corpus's word-frequency table. The learned merge table (rank, left,
    // right, freq) is exact integers + deterministic tie-breaks, so the
    // generated oracle replays every round — pair stats, argmax, greedy
    // application — and hash-matches.
    "q_bpe" -> ((s, dir) =>
      graft.text.Bpe.train(t(s, dir, "documents").df, "text", nMerges = 8)),

    // Exact triangle count by degree orientation on a derived unipartite
    // graph (part/supplier keys folded into one 300-node id space, dense
    // enough to close many triangles). One exact-integer row.
    "q_triangles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").df
      graft.graph.Graph.triangleCount(li.select(
        (col("l_partkey") % 300).as("src"),
        (col("l_suppkey") % 300).as("dst")))
    }),

    // SemDeDup on the perturbed-copy corpus (each vector + a near-identical
    // copy at id+1e6): cluster with deterministic k-means on 1e6-quantized
    // vectors, pair within clusters, cosine-verify at 0.999, resolve to
    // canonical survivors. Every arithmetic step is exact-integer or
    // correctly-rounded, so the survivor set replays bit-for-bit.
    "q_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").df
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val pert = emb
        .withColumn("vec_id", col("vec_id") + 1000000)
        .withColumn("embedding",
          transform(col("embedding"), x => x * 1.001 + 0.0001))
      val both = emb.unionByName(pert)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x * 1000000.0).cast("double")).as("qv"))
      Dedup.semanticDedup(both, "vec_id", "qv",
          k = SEM_K, iters = SEM_ITERS, threshold = SEM_THRESHOLD,
          initHash = Some(Sketch.portableHash(col("vec_id").cast("string"))))
        .select("vec_id")
    })
  )

  // ---------------------------------------------------------------------
  // oracles
  // ---------------------------------------------------------------------

  /** DuckDB-side portable hash: same 60-bit md5 leaf as [[Sketch.portableHash]]. */
  private def ph(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  private def countMinOracleSql(width: Int, depth: Int): String =
    s"""WITH ks AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
       |    WHERE user_id IS NOT NULL),
       |d AS (SELECT unnest(range(0, $depth)) AS d),
       |s AS (SELECT d.d AS d,
       |    ${ph("CAST(d.d AS VARCHAR) || '|' || ks.k")} % $width AS b,
       |    count(*) AS cnt
       |  FROM ks CROSS JOIN d GROUP BY 1, 2),
       |q AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
       |    WHERE user_id < 100),
       |e AS (SELECT q.k, d.d AS d,
       |    ${ph("CAST(d.d AS VARCHAR) || '|' || q.k")} % $width AS b
       |  FROM q CROSS JOIN d)
       |SELECT e.k, min(coalesce(s.cnt, 0)) AS est
       |FROM e LEFT JOIN s ON s.d = e.d AND s.b = e.b
       |GROUP BY 1""".stripMargin

  private def weightedSampleOracleSql(k: Int): String =
    s"""WITH c AS (SELECT c_custkey, c_mktsegment,
       |    c_acctbal + 1000.0 AS w,
       |    (${ph("CAST(c_custkey AS VARCHAR) || '|42'")} + 1)
       |      / 1152921504606846976.0 AS u
       |  FROM customer)
       |SELECT c_custkey, c_mktsegment FROM c
       |QUALIFY row_number() OVER (PARTITION BY c_mktsegment
       |  ORDER BY ln(u) / w DESC, c_custkey) <= $k""".stripMargin

  /** The same shift/mask OR-chain [[Scale.zorderValue]] builds, rendered as
    * DuckDB SQL (bit j of column i → output bit j·n + i). */
  private def zorderExprSql(cols: Seq[String], bits: Int): String =
    cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until bits).map { j =>
        s"((($c >> $j) & 1) << ${j * cols.size + i})"
      }
    }.mkString(" | ")

  private def quantizeSql(c: String, lo: Double, hi: Double, bits: Int): String =
    s"least(greatest(CAST(floor(($c - $lo) / ${hi - lo} * ${1L << bits}) " +
      s"AS BIGINT), 0), ${(1L << bits) - 1})"

  private def zorderOracleSql(bits: Int): String =
    s"""WITH q AS (SELECT o_orderkey,
       |    ${quantizeSql("o_totalprice", 0.0, Z_PRICE_HI, bits)} AS zy,
       |    ${quantizeSql("CAST(o_custkey AS DOUBLE)", 0.0, Z_CUST_HI, bits)} AS zx
       |  FROM orders)
       |SELECT o_orderkey, ${zorderExprSql(Seq("zx", "zy"), bits)} AS zval
       |FROM q""".stripMargin

  /** DuckDB replica of `q_semantic_dedup`: quantized original + perturbed
    * corpus, the [[graft.ml.Clustering]] Lloyd replay (md5 init sample,
    * argmin with (distance, cid) tie-break), within-cluster cosine pairs at
    * the threshold, recursive-CTE connected components, min-id survivors.
    */
  private def semanticDedupOracleSql(k: Int, iters: Int,
                                     threshold: Double): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS raw
              |  FROM embeddings),
              |q AS (SELECT vec_id,
              |    list_transform(raw, x -> floor(x * 1000000.0)) AS v
              |  FROM e
              |  UNION ALL
              |  SELECT vec_id + 1000000,
              |    list_transform(raw,
              |      x -> floor((x * 1.001 + 0.0001) * 1000000.0)) AS v
              |  FROM e),
              |c0 AS (SELECT
              |    ${ph("CAST(vec_id AS VARCHAR)")} AS cid,
              |    v AS cvec
              |  FROM q ORDER BY cid LIMIT $k),
              |""".stripMargin
    val d = "list_dot_product(c.cvec, c.cvec)" +
      " - 2.0 * list_dot_product(q.v, c.cvec)"
    for (i <- 0 to iters) {
      sb ++= s"""a$i AS (SELECT vec_id, v, cid FROM (
                |  SELECT q.vec_id, q.v, c.cid,
                |    row_number() OVER (PARTITION BY q.vec_id
                |      ORDER BY $d, c.cid) AS rk
                |  FROM q CROSS JOIN c$i c) WHERE rk = 1),
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
    sb ++= s"""prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              |  FROM a$iters a JOIN a$iters b
              |    ON a.cid = b.cid AND a.vec_id < b.vec_id
              |  WHERE list_dot_product(a.v, b.v)
              |      / (sqrt(list_dot_product(a.v, a.v))
              |         * sqrt(list_dot_product(b.v, b.v))) >= $threshold),
              |edges AS (SELECT id_a AS s, id_b AS d FROM prs
              |          UNION SELECT id_b, id_a FROM prs),
              |reach(id, r) AS (SELECT s, s FROM edges
              |  UNION SELECT ed.s, r.r FROM edges ed JOIN reach r ON ed.d = r.id),
              |lab AS (SELECT id, min(r) AS lbl FROM reach GROUP BY 1)
              |SELECT vec_id FROM q
              |WHERE vec_id NOT IN (SELECT id FROM lab WHERE lbl < id)""".stripMargin
    sb.toString
  }

  /** Recursive-CTE replay of `q_leak_split`: the q_dedup_resolve pair +
    * component construction (same 3-gram Jaccard, hot-gram guard, min-label
    * reach), then the portable-hash split on coalesce(label, own id). */
  private def leakSplitOracleSql(trainParts: Int, denom: Int): String =
    s"""WITH RECURSIVE toks AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
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
       |SELECT d.doc_id,
       |  CASE WHEN ${ph("CAST(coalesce(lab.lbl, d.doc_id) AS VARCHAR)")}
       |         % $denom < $trainParts
       |       THEN 'train' ELSE 'heldout' END AS split
       |FROM documents d LEFT JOIN lab ON lab.id = d.doc_id""".stripMargin

  private val trianglesOracleSql: String =
    """WITH e0 AS (SELECT least(l_partkey % 300, l_suppkey % 300) AS a,
      |    greatest(l_partkey % 300, l_suppkey % 300) AS b
      |  FROM lineitem),
      |e AS (SELECT DISTINCT a, b FROM e0 WHERE a <> b),
      |d AS (SELECT node, count(*) AS deg FROM (
      |    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
      |  GROUP BY 1),
      |o AS (SELECT
      |    CASE WHEN x.deg < y.deg OR (x.deg = y.deg AND a < b)
      |         THEN a ELSE b END AS u,
      |    CASE WHEN x.deg < y.deg OR (x.deg = y.deg AND a < b)
      |         THEN b ELSE a END AS v,
      |    CASE WHEN x.deg < y.deg OR (x.deg = y.deg AND a < b)
      |         THEN y.deg ELSE x.deg END AS dv
      |  FROM e JOIN d x ON x.node = e.a JOIN d y ON y.node = e.b),
      |w AS (SELECT x.v AS u, y.v AS v FROM o x JOIN o y
      |  ON x.u = y.u AND (x.dv < y.dv OR (x.dv = y.dv AND x.v < y.v)))
      |SELECT count(*) AS n_triangles FROM w
      |WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.u AND o.v = w.v)""".stripMargin

  /** DuckDB replica of `q_bpe`: the word-frequency table, then per merge
    * round — weighted adjacent-pair counts, the (freq desc, left, right)
    * argmax, and the greedy leftmost non-overlapping application. The
    * greedy fold is replayed as gaps-and-islands: matches can only overlap
    * when left == right (a run), where greedy takes every ODD position
    * within each run of consecutive match starts.
    */
  private def bpeOracleSql(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH t0 AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
              |  FROM documents),
              |wds AS (SELECT word, count(*) AS cnt FROM t0
              |  WHERE word <> '' AND regexp_matches(word, '^[a-z]+$$')
              |  GROUP BY 1),
              |w1 AS MATERIALIZED (SELECT row_number() OVER () AS wid, cnt,
              |    list_append(list_transform(range(1, length(word) + 1),
              |      i -> word[i:i]), '</w>') AS ts
              |  FROM wds),
              |""".stripMargin
    for (r <- 1 to nMerges) {
      val sep = if (r < nMerges) "," else ""
      sb ++= s"""p$r AS MATERIALIZED (SELECT lhs, rhs, c FROM (
                |    SELECT ts[ii.i] AS lhs, ts[ii.i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS c
                |    FROM w$r, LATERAL (SELECT unnest(range(1, len(ts))) AS i) ii
                |    GROUP BY 1, 2)
                |  ORDER BY c DESC, lhs, rhs LIMIT 1)$sep
                |""".stripMargin
      if (r < nMerges) {
        sb ++= s"""e$r AS MATERIALIZED (SELECT wid, cnt, ii.i AS i, ts[ii.i] AS t
                  |  FROM w$r, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) ii),
                  |m$r AS MATERIALIZED (SELECT wid, ii.i AS i
                  |  FROM w$r, LATERAL (SELECT unnest(range(1, len(ts))) AS i) ii
                  |  WHERE ts[ii.i] = (SELECT lhs FROM p$r)
                  |    AND ts[ii.i + 1] = (SELECT rhs FROM p$r)),
                  |i$r AS (SELECT wid, i,
                  |    i - row_number() OVER (PARTITION BY wid ORDER BY i) AS isl
                  |  FROM m$r),
                  |sel$r AS MATERIALIZED (SELECT wid, i FROM (
                  |    SELECT wid, i,
                  |      row_number() OVER (PARTITION BY wid, isl ORDER BY i) AS k
                  |    FROM i$r)
                  |  WHERE k % 2 = 1),
                  |w${r + 1} AS MATERIALIZED (SELECT e.wid, min(e.cnt) AS cnt,
                  |    list(CASE WHEN s1.i IS NOT NULL
                  |              THEN (SELECT lhs FROM p$r) || (SELECT rhs FROM p$r)
                  |              ELSE e.t END ORDER BY e.i) AS ts
                  |  FROM e$r e
                  |  LEFT JOIN sel$r s1 ON s1.wid = e.wid AND s1.i = e.i
                  |  LEFT JOIN sel$r s2 ON s2.wid = e.wid AND s2.i = e.i - 1
                  |  WHERE s2.i IS NULL
                  |  GROUP BY e.wid),
                  |""".stripMargin
      }
    }
    sb ++= (1 to nMerges).map(r =>
        s"""SELECT CAST($r AS BIGINT) AS rank, lhs AS "left", rhs AS "right",
           |  c AS freq FROM p$r""".stripMargin)
      .mkString("\nUNION ALL\n")
    sb.toString
  }

  def oracleSql: Map[String, String] = Map(
    "q_bpe"             -> bpeOracleSql(8),
    "q_count_min"       -> countMinOracleSql(CM_WIDTH, CM_DEPTH),
    // exact coupon regime: <= 50 distinct per group with lgK=12
    "q_hll_groups"      ->
      "SELECT lang, count(DISTINCT doc_id % 50) AS nd FROM documents GROUP BY 1",
    "q_leak_split"      -> leakSplitOracleSql(8, 10),
    "q_triangles"       -> trianglesOracleSql,
    "q_weighted_sample" -> weightedSampleOracleSql(20),
    "q_zorder"          -> zorderOracleSql(Z_BITS),
    "q_semantic_dedup"  -> semanticDedupOracleSql(SEM_K, SEM_ITERS,
                             SEM_THRESHOLD)
  )
}
