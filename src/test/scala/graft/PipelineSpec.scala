package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{Dedup, Similarity}
import graft.text.TextFns
import graft.multimodal.Multimodal

/** Tests for the training-data pipeline ops. LSH methods are graded against
  * the exact brute-force ground truth computed by the same engine (recall
  * bounds), mirroring how the reference's tests use pandas as the oracle.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>")).cache()

  test("minhash LSH finds the exact-jaccard near-dup pairs (recall)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain near-dup documents")
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 16, rows = 2, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("minhash est_jaccard approximates exact jaccard") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
    val sigs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 16, rows = 2, threshold = 0.2)
    val joined = exact.join(sigs, Seq("id_a", "id_b"))
      .select(abs(col("jaccard") - col("est_jaccard")).as("err"))
      .agg(avg("err")).head().getDouble(0)
    assert(joined < 0.2, s"mean |jaccard - est| = $joined")
  }

  test("PQ: subvectors reassemble; codes bounded; encode partition-invariant") {
    import graft.ml.Pq
    val m = 4
    val sv = Pq.subVectors(emb, "vec_id", "embedding", m)
    // ordered subvector concat == the original vector
    val back = sv.groupBy("vec_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("subv").as("p")))),
        e => e.getField("p"))).as("rebuilt"))
      .join(emb, "vec_id")
      .filter(col("rebuilt") =!= col("embedding"))
    assert(back.count() === 0L)
    val cb = graft.ml.Dedup.trackCache(
      Pq.train(emb, "vec_id", "embedding", m, k = 8, iters = 2))
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", m)
    val bad = codes.filter(size(col("codes")) =!= m ||
      exists(col("codes"), c => c < 0 || c >= 8))
    assert(bad.count() === 0L)
    TestSpark.assertSameRows(codes,
      Pq.encode(emb.repartition(11), cb, "vec_id", "embedding", m))
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("PQ ADC: k>=n codebooks are exact VQ; trained codebooks find planted near-dups") {
    import spark.implicits._
    import graft.ml.Pq
    // exactness regime: one centroid per distinct subvector (k >= n,
    // iters>=1 makes each centroid the vector itself) -> ADC distance IS
    // the true squared distance, so ranking == brute force on the corpus
    val tiny = emb.filter(col("vec_id") < 40)
    val cbx = graft.ml.Dedup.trackCache(
      Pq.train(tiny, "vec_id", "embedding", 4, k = 64, iters = 1))
    val cx = Pq.encode(tiny, cbx, "vec_id", "embedding", 4)
    val queries = tiny.filter(col("vec_id") < 5)
    val adc = Pq.adcTopK(cx, cbx, queries, "vec_id", "embedding", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    // ADC ranks exact squared distance here, so the self-query's top hit
    // must be the query itself
    for (q <- 0L until 5L) assert(adc((q, 1L)) === q, s"query $q top-1")
    // lossy regime: planted perturbed copies (id+10000) must retrieve
    // their source in the ADC top-3 for most queries
    val pert = emb.withColumn("vec_id", col("vec_id") + 10000)
      .withColumn("embedding",
        transform(col("embedding"), x => x * 1.01))
    val cb = graft.ml.Dedup.trackCache(
      Pq.train(emb, "vec_id", "embedding", 4, k = 8, iters = 2))
    val codes = Pq.encode(emb, cb, "vec_id", "embedding", 4)
    val hits = Pq.adcTopK(codes, cb, pert.filter(col("vec_id") < 10020),
        "vec_id", "embedding", 4, 3)
      .filter(col("item_id") === col("query_id") - 10000).count()
    assert(hits >= 16L, s"ADC recall of planted copies: $hits/20")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("IVF-routed ADC: full-probe == flat ADC; routed recall >= 0.9 on clustered data") {
    import graft.ml.Pq
    val cb = graft.ml.Dedup.trackCache(
      Pq.train(emb, "vec_id", "embedding", 4, k = 8, iters = 2))
    val codes = graft.ml.Dedup.trackCache(
      Pq.encode(emb, cb, "vec_id", "embedding", 4))
    val queries = emb.filter(col("vec_id") < 10)
    val flat = Pq.adcTopK(codes, cb, queries, "vec_id", "embedding", 4, 5)
    // probing EVERY coarse centroid routes every (query, item) pair, so the
    // composition must reproduce the flat ADC exactly — the splice is pure
    // candidate pruning, never a scoring change
    TestSpark.assertSameRows(flat,
      Pq.adcTopKRouted(emb, codes, cb, queries, "vec_id", "embedding",
        4, 5, nCentroids = 8, nProbe = 8))
    // the serving config (nProbe=4 of 16 — each query ADC-scores ~1/4 of
    // the corpus): recall@5 vs the flat ADC on a PLANTED CLUSTERED corpus,
    // the geometry IVF assumes. (The synthetic embeddings table is
    // isotropic noise — neighbors of a random direction spread over ALL
    // coarse cells, so no routing could keep recall there; real embedding
    // spaces cluster, which is the whole premise of the IVF layout.)
    // 50 base directions x 20 small affine jitters = 1000 vectors in 50
    // tight clusters; cluster siblings share a coarse centroid, so the
    // flat top-5 (siblings) must survive the routing.
    val clustered = graft.ml.Dedup.trackCache(
      (0 until 20).map { j =>
        emb.select((col("vec_id") + lit(j * 1000)).as("vec_id"),
          transform(col("embedding"),
            x => x * (lit(1.0) + lit(0.002) * j) + lit(0.0003) * j)
            .as("embedding"))
      }.reduce(_ unionByName _))
    val cb1 = graft.ml.Dedup.trackCache(
      Pq.train(clustered, "vec_id", "embedding", 4, k = 8, iters = 2))
    val codes1 = graft.ml.Dedup.trackCache(
      Pq.encode(clustered, cb1, "vec_id", "embedding", 4))
    val queries1 = clustered.filter(col("vec_id") < 10)
    val flat1 = Pq.adcTopK(codes1, cb1, queries1, "vec_id", "embedding", 4, 5)
    val routed = Pq.adcTopKRouted(clustered, codes1, cb1, queries1, "vec_id",
      "embedding", 4, 5, nCentroids = 16, nProbe = 4)
    val recall = Similarity.recallAtK(
        flat1.select("query_id", "item_id"),
        routed.select("query_id", "item_id"))
      .filter(col("query_id").isNull).select("recall").head().getDouble(0)
    assert(recall >= 0.9, s"routed-ADC recall@5 vs flat = $recall")
    // the refine stage: exact-cosine re-rank of the routed top-10 must
    // recover AT LEAST the raw compressed top-5's agreement with the exact
    // ranking — compression error (m=4, k=8 codebooks on 64 dims) misranks
    // neighbors the exact re-rank restores. Ground truth:
    // bruteForceTopK, which EXCLUDES self-matches — so self is dropped
    // from both approximate sets before comparing.
    import org.apache.spark.sql.expressions.Window
    val truth = Similarity.bruteForceTopK(clustered, queries1, k = 5)
      .select("query_id", "item_id")
    def top5NonSelf(df: org.apache.spark.sql.DataFrame) =
      df.where(col("query_id") =!= col("item_id"))
        .withColumn("__rk2", row_number().over(
          Window.partitionBy("query_id").orderBy("rk")))
        .filter(col("__rk2") <= 5)
    val cand10 = Pq.adcTopKRouted(clustered, codes1, cb1, queries1,
        "vec_id", "embedding", 4, 10, nCentroids = 16, nProbe = 4)
      .where(col("query_id") =!= col("item_id"))
    val refined = Similarity.refineTopK(cand10, queries1, clustered, 5)
    val raw5 = top5NonSelf(Pq.adcTopKRouted(clustered, codes1, cb1,
      queries1, "vec_id", "embedding", 4, 6, nCentroids = 16, nProbe = 4))
    def macroRecall(approx: org.apache.spark.sql.DataFrame) =
      Similarity.recallAtK(truth, approx.select("query_id", "item_id"))
        .filter(col("query_id").isNull).select("recall").head().getDouble(0)
    val rawR = macroRecall(raw5)
    val refR = macroRecall(refined)
    assert(refR >= rawR,
      s"refine must not lose recall: refined $refR vs raw ADC $rawR")
    assert(refR >= 0.9, s"refined recall@5 vs exact = $refR")
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("prefix-filtered jaccard pairs == inverted-index jaccard pairs (3 thresholds)") {
    // same semantics, different candidate generation: PPJoin prefix filter
    // must lose NO pair and admit no extra, at loose and tight thresholds
    for (t <- Seq(0.3, 0.5, 0.8)) {
      TestSpark.assertSameRows(
        Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3,
          threshold = t),
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
          threshold = t))
    }
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("prefix filter indexes a strict subset of the shingle table") {
    import spark.implicits._
    // structural: at t=0.8 the prefix index must be well under half the
    // full inverted index (the scale point of the technique); count the
    // candidate pairs each formulation feeds verification
    val texts = (0 until 60).map { i =>
      val base = (0 until 40).map(j => s"w${(i + j) % 50}").mkString(" ")
      (i.toLong, base)
    }.toDF("doc_id", "text")
    val full = Dedup.ngramJaccardPairs(texts, "doc_id", "text", 3, 0.8)
    val pref = Dedup.ngramJaccardPairsPrefix(texts, "doc_id", "text", 3, 0.8)
    TestSpark.assertSameRows(full, pref)
    graft.ml.Dedup.unpersistIntermediates()
  }

  test("simhash: near-identical texts collide, distinct texts don't") {
    import spark.implicits._
    // simhash discriminates on longer documents: ~100 tokens, 2 changed
    val base = (0 until 100).map(i => s"tok$i").mkString(" ")
    val near = ((0 until 98).map(i => s"tok$i") ++ Seq("zzz", "yyy")).mkString(" ")
    val far = (0 until 100).map(i => s"other$i").mkString(" ")
    val d = Seq((1L, base), (2L, near), (3L, far), (4L, base)).toDF("doc_id", "text")
    val h = Dedup.simhash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 16, s"near pair hamming ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) > ham(h(1L), h(2L)), "far pair should exceed near pair")
    // banding guarantees candidates for distance <= 3 (pigeonhole over 4
    // chunks): the exact duplicate (dist 0) must surface as a pair
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("simhashPairs equals brute-force popcount pairs (pigeonhole exactness)") {
    // with hot-bucket dropping disabled, derived (maxDist+1)-chunk banding
    // guarantees every pair at hamming <= maxDist shares a chunk, and the
    // popcount filter is exact — so the result must EQUAL the n^2 ground
    // truth. Run at maxDist=7 (the q_dedup_simhash configuration).
    val maxDist = 7
    val lsh = Dedup.simhashPairs(docs, "doc_id", "text",
        maxDist = maxDist, maxBucket = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val h = Dedup.simhash(docs, "doc_id", "text")
    val brute = h.as("a").join(h.as("b"), col("a.id") < col("b.id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= maxDist)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "testdata should contain simhash near-dups")
    assert(lsh == brute,
      s"banded ${lsh.size} pairs vs brute ${brute.size}; " +
      s"missed=${(brute -- lsh).take(5)} extra=${(lsh -- brute).take(5)}")
  }

  test("containment finds planted quotes that symmetric Jaccard misses") {
    // 8-word quotes of every %7 doc: containment(quote in source) = 1.0
    // (every quote shingle is a source shingle), while jaccard(quote,
    // source) ~ 6/|source| is far below threshold — the asymmetric
    // resemblance exists precisely for this |B| >> |A| regime
    val quotes = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ")
          .as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(quotes)
    val nQuotes = quotes.count()
    val cont = Dedup.ngramContainmentPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.9).cache()
    val found = cont
      .filter(col("container_id") === col("id") - 1000000L).count()
    assert(found == nQuotes, s"containment found $found of $nQuotes quotes")
    // planted (source, quote) pairs are invisible to symmetric Jaccard at
    // the same threshold
    val jac = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.9)
      .filter(col("id_b") === col("id_a") + 1000000L).count()
    assert(jac == 0L, s"jaccard unexpectedly matched $jac planted pairs")
    cont.unpersist()
    Dedup.unpersistIntermediates()
  }

  test("embedding near-dup LSH finds planted perturbed copies") {
    val perturbed = emb
      .withColumn("vec_id", col("vec_id") + 1000000)
      .withColumn("embedding", transform(col("embedding"), x => x * 1.001 + 0.0001))
    val both = emb.unionByName(perturbed)
    val n = emb.count()
    val found = Dedup.embeddingNearDupPairs(both, "vec_id", "embedding",
      dim = 64, threshold = 0.999, nPlanes = 8).count()
    assert(found >= (n * 0.95).toLong, s"found $found of $n planted pairs")
  }

  test("banded embedding near-dup reaches high recall at a loose threshold") {
    // plant pairs at cosine ~0.90-0.96: deterministic per-dimension noise
    // scaled to the unit-norm embeddings. Amplitude 0.06 over 64 dims gives
    // noise norm ~= 0.06*sqrt(64/2) ~= 0.34, so cos(x, x+n) ~= 1/sqrt(1+0.34^2)
    // ~= 0.95 — above the 0.9 ground-truth threshold (0.25 put the noise norm
    // at ~1.4, swamping the signal: zero ground-truth pairs existed).
    val noisy = emb
      .withColumn("vec_id", col("vec_id") + 1000000)
      .withColumn("embedding",
        zip_with(col("embedding"),
          transform(sequence(lit(1), size(col("embedding"))),
            i => sin(col("vec_id").cast("double") * 3.7 + i.cast("double"))),
          (x, r) => x + lit(0.06) * r))
    val both = emb.unionByName(noisy).cache()
    // ground truth: the planted (orig, perturbed) pairs that really sit
    // above the threshold
    val gt = emb.as("a")
      .join(noisy.as("b"), col("a.vec_id") + 1000000 === col("b.vec_id"))
      .select(graft.ml.Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("c") >= 0.9).count()
    assert(gt > 10, s"planting failed: only $gt ground-truth pairs")
    val found = Dedup.embeddingNearDupPairsBanded(both, "vec_id", "embedding",
      dim = 64, threshold = 0.9)
      .filter(col("id_b") === col("id_a") + 1000000).count()
    assert(found >= (gt * 0.9).toLong, s"banded recall $found of $gt")
    // the all-bits variant exists for tight thresholds; at 0.9 its recall
    // collapses — banded must strictly beat it on the same corpus
    val allBits = Dedup.embeddingNearDupPairs(both, "vec_id", "embedding",
      dim = 64, threshold = 0.9, nPlanes = 56)
      .filter(col("id_b") === col("id_a") + 1000000).count()
    assert(found > allBits, s"banded $found should beat all-bits $allBits")
  }

  test("brute-force topK: perturbed query's nearest neighbor is its source") {
    val queries = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000)
      .withColumn("embedding", transform(col("embedding"), x => x * 1.001))
    val top1 = Similarity.bruteForceTopK(emb, queries, k = 1)
    val rows = top1.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 1000000,
        s"query ${r.getLong(0)} nearest ${r.getLong(1)}")
    }
  }

  test("lsh topK ranks candidates identically to brute force on shared items") {
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 3)
      .select("query_id", "item_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, k = 3, dim = 64, nPlanes = 6, nTables = 10)
      .select("query_id", "item_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: at least a third of true top-3 should surface with these params
    assert(lsh.intersect(bf).size >= bf.size / 3, s"${lsh.intersect(bf).size} of ${bf.size}")
  }

  test("text functions: tokens, fingerprint, langId") {
    import spark.implicits._
    val d = Seq(
      ("  The  quick  brown fox  ", "the quick brown fox"),
      ("der hund und die katze und das haus ist", "x")
    ).toDF("a", "b")
    val r = d.select(
      TextFns.tokenCount(col("a")).as("n"),
      (TextFns.fingerprint(col("a")) === TextFns.fingerprint(col("b"))).as("same"),
      TextFns.langId(col("a")).as("lang")).collect()
    assert(r(0).getInt(0) == 4)
    assert(r(0).getBoolean(1)) // whitespace-insensitive fingerprint
    assert(r(0).getString(2) == "en")
    assert(r(1).getString(2) == "de")
  }

  test("quality score penalizes junk") {
    import spark.implicits._
    val d = Seq(
      "This is a reasonably long and well punctuated sentence, with normal words.",
      "123 456 789 000 111 222 333 444 555 666 777 888 999 000 111 222"
    ).toDF("text")
    val scores = d.select(TextFns.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(scores(0) > scores(1))
  }

  test("multimodal: meta attach, frame sampling, feature extraction shapes") {
    val media = Multimodal.attachMeta(
      docs.withColumn("payload", to_binary(col("text"), lit("utf-8"))),
      "doc_id", "payload")
    assert(media.columns.toSeq == Seq("media_id", "media", "meta"))
    val n = media.count()
    val frames = Multimodal.sampleFrames(media, nFrames = 3)
    assert(frames.count() == n * 3)
    val feats = Multimodal.extractFeaturesBatched(media, dim = 16)
      .select(size(col("features"))).head().getInt(0)
    assert(feats == 16)
    // deterministic: same bytes → same features
    val f2 = Multimodal.extractFeaturesBatched(media, dim = 16)
      .select(col("media_id"), col("features"))
    val j = Multimodal.extractFeaturesBatched(media, dim = 16)
      .select(col("media_id"), col("features").as("f2"))
      .join(f2, "media_id")
      .filter(col("features") =!= col("f2")).count()
    assert(j == 0)
  }

  test("MinHashAgg (custom Catalyst aggregate) equals the composed formulation") {
    val fast = graft.ml.Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val slow = graft.ml.Dedup.minhashSignaturesComposed(docs, "doc_id", "text", n = 3, k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (id, sig) => assert(sig == slow(id), s"doc $id") }
  }

  test("ShingleHash expression preserves the composed formulation's set structure") {
    // values differ by design (different hash chaining); what consumers rely
    // on is the set structure: per-doc distinct counts and cross-doc overlaps
    def pairCommons(shingles: org.apache.spark.sql.Column): Map[(Long, Long), Long] = {
      val sh = docs.select(col("doc_id").as("id"), explode(shingles).as("g"))
      sh.as("a").join(sh.as("b"), Seq("g"))
        .where(col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val fastSz = docs.select(col("doc_id"), size(TextFns.shingleHashes(col("text"), 3)).as("sz"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val slowSz = docs.select(col("doc_id"), size(TextFns.shingleHashesComposed(col("text"), 3)).as("sz"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fastSz == slowSz)
    assert(pairCommons(TextFns.shingleHashes(col("text"), 3))
      == pairCommons(TextFns.shingleHashesComposed(col("text"), 3)))
  }

  test("ShingleHashMd5 / Md5Hash60 / Md5Hash64 equal the composed md5 " +
      "formulations VALUE-FOR-VALUE (the portable leaf is oracle-shared)") {
    import spark.implicits._
    // corpus texts + adversarial edges: empty, whitespace-only, tabs (a
    // leading tab yields a leading "" token), interior multi-space,
    // unicode case-mapping, fewer-than-n tokens, repeats (distinct order)
    val edges = Seq(
      "", " ", "\t", "\t x", "a", "a b", "a b c", "a  b   c", "x x x x",
      "ümlaut Ünïcode İstanbul ẞharp", "tab\tsep mixed \n newline",
      "a b c a b c a b c", "  leading and trailing  ", "trail\t",
      "punct, punct. punct!"
    ).zipWithIndex.map { case (t, i) => (100000L + i, t) }
    val df = docs.select(col("doc_id"), col("text"))
      .unionByName(edges.toDF("doc_id", "text"))
    for (n <- Seq(1, 3, 5)) {
      val diff = df.select(
          TextFns.shingleHashesPortable(col("text"), n).as("fast"),
          TextFns.shingleHashesPortableComposed(col("text"), n).as("slow"))
        .filter(!(col("fast") <=> col("slow"))).count()
      assert(diff == 0, s"shingleHashesPortable n=$n diverges from composed")
    }
    val h60 = df.select(
        graft.ops.Sketch.portableHash(col("text")).as("fast"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
          .as("slow"))
      .filter(!(col("fast") <=> col("slow"))).count()
    assert(h60 == 0, "Md5Hash60 diverges from conv∘substring∘md5")
    val h64 = df.select(
        TextFns.portableHash64(col("text")).as("fast"),
        TextFns.portableHash64Composed(col("text")).as("slow"))
      .filter(!(col("fast") <=> col("slow"))).count()
    assert(h64 == 0, "Md5Hash64 diverges from the composed two-half form")
    // NULL text: all three return NULL, like the composed chains
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = nulls.select(
      TextFns.shingleHashesPortable(col("text"), 3),
      graft.ops.Sketch.portableHash(col("text")),
      TextFns.portableHash64(col("text"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("DotProduct expression equals the composed zip_with/aggregate formulation") {
    import spark.implicits._
    val diff = emb.select(
        Similarity.dot(col("embedding"), col("embedding")).as("fast"),
        Similarity.dotComposed(col("embedding"), col("embedding")).as("slow"))
      .filter(abs(col("fast") - col("slow")) > 1e-9).count()
    assert(diff == 0)
    // null semantics: mismatched lengths and null elements yield NULL
    val odd = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(odd.select(Similarity.dot(col("a"), col("b"))).head().isNullAt(0))
    val withNull = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
    assert(withNull.select(Similarity.dot(col("a"), col("b"))).head().isNullAt(0))
    // decimal element arrays evaluate (regression: Decimal is not a Number)
    val dec = Seq((Seq(BigDecimal(2), BigDecimal(3)), Seq(BigDecimal(4), BigDecimal(5))))
      .toDF("a", "b")
    assert(dec.select(Similarity.dot(col("a"), col("b"))).head().getDouble(0) == 23.0)
  }

  test("ShingleHash matches composed on adversarial texts (whitespace, unicode, repeats)") {
    import spark.implicits._
    val texts = Seq(
      "", " ", "\t", "a", "a b", "a b c", "a  b   c", "x x x x",
      "ümlaut Ünïcode ümlaut deja vu déjà vu", "tab\tsep mixed \n newline",
      "a b c a b c a b c", "UPPER lower MiXeD upper LOWER mixed",
      "  leading and trailing  ", "one-token", "punct, punct. punct!"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    def structure(sh: org.apache.spark.sql.Column): (Map[Long, Int], Map[(Long, Long), Long]) = {
      val sizes = df.select(col("doc_id"), size(sh).as("sz"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val ex = df.select(col("doc_id").as("id"), explode(sh).as("g"))
      val overlaps = ex.as("a").join(ex.as("b"), Seq("g"))
        .where(col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      (sizes, overlaps)
    }
    val fast = structure(TextFns.shingleHashes(col("text"), 3))
    val slow = structure(TextFns.shingleHashesComposed(col("text"), 3))
    assert(fast._1 == slow._1, "per-doc distinct shingle counts diverge")
    assert(fast._2 == slow._2, "cross-doc overlap structure diverges")
  }

  test("ArrayEqCount equals the composed zip_with/aggregate agreement count") {
    import spark.implicits._
    def eqCount(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftshim.Shim.columnOf(graft.plans.ArrayEqCount(
        org.apache.spark.sql.graftshim.Shim.exprOf(a),
        org.apache.spark.sql.graftshim.Shim.exprOf(b)))
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", n = 3, k = 16)
    val pairs = sigs.as("a").crossJoin(sigs.as("b")).limit(500)
    val diff = pairs.select(
        eqCount(col("a.sig"), col("b.sig")).as("fast"),
        aggregate(zip_with(col("a.sig"), col("b.sig"), (x, y) => (x === y).cast("int")),
          lit(0), (acc, v) => acc + v).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0)
    // length mismatch -> NULL, like the poisoned interpreted sum
    val odd = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
    assert(odd.select(eqCount(col("a"), col("b"))).head().isNullAt(0))
  }

  test("minhashSignatureRow (elementwise) equals the composed aggregate formulation") {
    val row = docs.select(col("doc_id"),
        Dedup.minhashSignatureRow(col("text"), n = 3, k = 16, seed = 42L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = Dedup.minhashSignaturesComposed(docs, "doc_id", "text", n = 3, k = 16, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(row.keySet == agg.keySet)
    row.foreach { case (id, sig) => assert(sig == agg(id), s"doc $id") }
  }

  test("connectedComponents: transitive closure, keepCanonical drops dupes") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (7L, 9L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
                     7L -> 7L, 8L -> 7L, 9L -> 7L))
    val d = (1L to 10L).toDF("doc_id")
    val kept = Dedup.keepCanonical(d, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 7L, 10L))
  }

  test("end-to-end dedup: LSH pairs -> clusters -> canonical corpus") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 16, rows = 2, threshold = 0.5)
    val before = docs.count()
    val after = Dedup.keepCanonical(docs, "doc_id", pairs).count()
    val clusters = Dedup.connectedComponents(pairs)
    val nonCanon = clusters.filter(col("id") =!= col("label")).count()
    assert(after == before - nonCanon)
    assert(after < before, "testdata has near-dups; some rows must drop")
  }

  test("chunkTokens: coverage, overlap, and edge cases") {
    import spark.implicits._
    val mk = (n: Int) => (0 until n).map(i => s"t$i").mkString(" ")
    val d = Seq((1L, mk(10)), (2L, mk(3)), (3L, ""), (4L, mk(4))).toDF("doc_id", "text")
    val chunks = d.select(col("doc_id"),
        TextFns.chunkTokens(col("text"), chunkSize = 4, overlap = 1).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // n=10, size 4, step 3: starts 0,3,6 -> full coverage, 1-token overlap
    assert(chunks(1L) == Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"))
    assert(chunks(2L) == Seq("t0 t1 t2"))   // shorter than chunkSize: one chunk
    assert(chunks(3L) == Seq(""))           // empty text: one empty chunk
    assert(chunks(4L) == Seq("t0 t1 t2 t3")) // exactly chunkSize: one chunk
    // row form: ids and positions line up
    val rows = TextFns.chunkDocs(d, "doc_id", "text", 4, 1)
    assert(rows.columns.toSeq == Seq("doc_id", "chunk_id", "chunk"))
    assert(rows.count() == 3 + 1 + 1 + 1)
    assert(rows.filter(col("doc_id") === 1 && col("chunk_id") === 2)
      .head().getString(2) == "t6 t7 t8 t9")
  }

  test("sampleByHash: deterministic, nested, and close to the target fraction") {
    val n = docs.count().toDouble
    val s20 = Tbl(docs).sampleByHash("doc_id", 0.2, seed = 7)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    val s20again = Tbl(docs).sampleByHash("doc_id", 0.2, seed = 7)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s20 == s20again, "same seed+frac must reproduce exactly")
    // nested: the 0.1 sample is a subset of the 0.2 sample at the same seed
    val s10 = Tbl(docs).sampleByHash("doc_id", 0.1, seed = 7)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s20))
    // tolerance: binomial std dev ~ sqrt(p(1-p)/n) ~ 1.8% at n=500
    assert(math.abs(s20.size / n - 0.2) < 0.08, s"got ${s20.size / n}")
    // different seed -> different sample
    val other = Tbl(docs).sampleByHash("doc_id", 0.2, seed = 8)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != s20)
  }

  test("HyperplaneSigs expression equals the composed per-plane formulation bit-for-bit") {
    import TestSpark.assertSameRows
    val sub = emb.limit(50)
    val viaExpr = sub.select(col("vec_id"),
      Similarity.hyperplaneSigsCol(col("embedding"), 64, 12, 4, seed = 7).as("sigs"))
    val viaComposed = sub.select(col("vec_id"),
      array((0 until 4).map(t =>
        Similarity.hyperplaneSigColComposed(col("embedding"), 64, 12, 7 + t)): _*)
        .as("sigs"))
    assertSameRows(viaExpr, viaComposed, clue = "expr vs composed planes")
    // malformed input: wrong dim -> NULL signature (drops out of bucket join)
    val bad = sub.select(Similarity.hyperplaneSigsCol(
      slice(col("embedding"), 1, 10), 64, 12, 4).as("s"))
    assert(bad.where(col("s").isNotNull).count() == 0)
  }

  test("knnJoin: corpus-to-corpus recall >= 0.9 vs brute force") {
    // disjoint halves: odd ids query the even-id corpus. Brute force with
    // the same (query, corpus) split is the exact ground truth.
    val odd = emb.filter(col("vec_id") % 2 === 1).limit(60)
    val even = emb.filter(col("vec_id") % 2 === 0)
    val truth = Similarity.bruteForceTopK(even, odd, k = 3)
    val approx = Similarity.knnJoin(odd, even, k = 3, dim = 64,
      nPlanes = 6, nTables = 12)
    val macroR = Similarity.recallAtK(truth, approx)
      .filter(col("query_id").isNull).head().getDouble(1)
    assert(macroR >= 0.9, s"knnJoin recall@3 $macroR < 0.9")
  }

  test("knnJoin: excludeSelf drops id-equal pairs, k bound holds per query") {
    val sub = emb.limit(40)
    val r = Similarity.knnJoin(sub, sub, k = 2, dim = 64,
      nPlanes = 6, nTables = 8, excludeSelf = true)
    assert(r.filter(col("query_id") === col("item_id")).count() == 0)
    val maxPer = r.groupBy("query_id").count().agg(max("count")).head().getLong(0)
    assert(maxPer <= 2)
  }

  test("incremental ingest dedup: new batch deduped against persisted corpus signatures") {
    // standing corpus: the documents fixture, signatures computed once
    val existingSigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    // new batch: 5 copies of existing docs (shifted ids) + 3 novel docs
    import spark.implicits._
    val copies = docs.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .select("doc_id", "text")
    val novel = Seq(
      (2000001L, "completely novel content about quasar spectroscopy drift"),
      (2000002L, "unrelated recipe for fermented barley porridge at altitude"),
      (2000003L, "maintenance log turbine seven bearing temperature anomaly"))
      .toDF("doc_id", "text")
    val batch = copies.unionByName(novel)
    val pairs = Dedup.lshPairsBetween(
      Dedup.minhashSignatures(batch, "doc_id", "text"), existingSigs,
      threshold = 0.9)
    val flagged = pairs.select("new_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // every copy is flagged against its source; novel docs are not
    assert((0L until 5L).map(_ + 1000000).toSet.subsetOf(flagged))
    assert(flagged.intersect(Set(2000001L, 2000002L, 2000003L)).isEmpty)
    // exact-copy pairs estimate jaccard 1.0 against their own source id
    val self = pairs.filter(col("existing_id") === col("new_id") - 1000000)
    assert(self.count() == 5 &&
      self.filter(col("est_jaccard") < 1.0).count() == 0)
    val kept = Dedup.dedupeAgainstCorpus(batch, "doc_id", "text",
      existingSigs, threshold = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2000001L, 2000002L, 2000003L))
  }

  test("persisted minhash index: build, probe, ingest with growth") {
    import spark.implicits._
    val dirP = java.nio.file.Files.createTempDirectory("graft-mhidx")
    val idx = dirP.toString
    try {
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idx)
      val meta = spark.read.parquet(s"$idx/meta").collect()
      assert(meta.length == 1 && meta(0).getAs[Int]("bands") == 8 &&
        !meta(0).getAs[Boolean]("portable"))
      // batch 1: a byte copy of an indexed doc, an identical novel twin
      // pair, a unique novel doc, and a 2-token doc (signed via the
      // default leaf's whole-text fallback shingle)
      val batch1 = docs.filter(col("doc_id") === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .select("doc_id", "text")
        .unionByName(Seq(
          (2000001L, "completely novel content about quasar spectroscopy drift"),
          (2000002L, "completely novel content about quasar spectroscopy drift"),
          (2000003L, "maintenance log turbine seven bearing temperature anomaly"),
          (2000004L, "tiny doc")).toDF("doc_id", "text"))
      val kept1 = Dedup.ingestDedup(spark, idx, batch1, "doc_id", "text",
          threshold = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // copy dropped vs index; smaller twin admitted, larger dropped
      // in-batch; unique admitted; the short doc is novel so admitted
      assert(kept1 == Set(2000001L, 2000003L, 2000004L), kept1.toString)
      // the index grew by exactly the admitted signatures — including the
      // short doc's whole-text fallback shingle under the default leaf
      val b1 = spark.read.parquet(s"$idx/sigs")
        .filter(col("batch_seq") === 1).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(b1 == Set(2000001L, 2000003L, 2000004L), b1.toString)
      // batch 2: a copy of a batch-1 SURVIVOR is now dropped — the growth
      // point; probe-only dedupeAgainstIndex agrees and does not grow it
      val batch2 = Seq(
        (3000001L, "completely novel content about quasar spectroscopy drift"),
        (3000002L, "fresh second batch subject matter entirely its own"))
        .toDF("doc_id", "text")
      val probe = Dedup.dedupeAgainstIndex(spark, idx, batch2, "doc_id",
          "text", threshold = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(probe == Set(3000002L), probe.toString)
      val kept2 = Dedup.ingestDedup(spark, idx, batch2, "doc_id", "text",
          threshold = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept2 == Set(3000002L), kept2.toString)
      val b2 = spark.read.parquet(s"$idx/sigs")
        .filter(col("batch_seq") === 2).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(b2 == Set(3000002L), b2.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("ingestDedup replay: a re-delivered batch re-emits its survivors " +
      "instead of colliding with its own signatures") {
    import spark.implicits._
    val dirP = java.nio.file.Files.createTempDirectory("graft-mhreplay")
    val idx = dirP.toString
    try {
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idx)
      val batch = docs.filter(col("doc_id") === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .select("doc_id", "text")
        .unionByName(Seq(
          (2000001L, "completely novel content about quasar spectroscopy drift"),
          (2000002L, "maintenance log turbine seven bearing temperature anomaly"))
          .toDF("doc_id", "text"))
      val kept = Dedup.ingestDedup(spark, idx, batch, "doc_id", "text",
          threshold = 0.9, batchId = 7L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(2000001L, 2000002L), kept.toString)
      val seqAfter = spark.read.parquet(s"$idx/sigs")
        .agg(max(col("batch_seq").cast("long"))).head().getLong(0)
      // at-least-once delivery: the SAME batch arrives again (crash after
      // the append, before the checkpoint commit) — without evidence the
      // batch's own standing signatures would drop everything
      val replay = Dedup.ingestDedup(spark, idx, batch, "doc_id", "text",
          threshold = 0.9, batchId = 7L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(replay == kept, s"replay must re-emit $kept, got $replay")
      // and the index did NOT grow a duplicate partition
      assert(spark.read.parquet(s"$idx/sigs")
        .agg(max(col("batch_seq").cast("long"))).head().getLong(0) == seqAfter)
      // content-fingerprint replay detection for callers without batch ids
      val replayNoId = Dedup.ingestDedup(spark, idx, batch, "doc_id",
          "text", threshold = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(replayNoId == kept)
      // a recorded batchId delivered with DIFFERENT content is a bug, not
      // a replay — fail loudly (one batch id names one batch)
      val mutated = Seq((4000001L, "entirely different replacement content"))
        .toDF("doc_id", "text")
      val ex = intercept[IllegalArgumentException] {
        Dedup.ingestDedup(spark, idx, mutated, "doc_id", "text",
          threshold = 0.9, batchId = 7L)
      }
      assert(ex.getMessage.contains("DIFFERENT"))
      // same ids and count but MUTATED TEXT: the evidence fingerprint
      // covers (id, text), so this too is a loud failure — not a silent
      // "replay" re-emitting the stale survivor set
      val mutatedText = batch.withColumn("text",
        concat(col("text"), lit(" v2")))
      val exText = intercept[IllegalArgumentException] {
        Dedup.ingestDedup(spark, idx, mutatedText, "doc_id", "text",
          threshold = 0.9, batchId = 7L)
      }
      assert(exText.getMessage.contains("DIFFERENT"))
      // the NEXT batch applies fresh and still dedups against batch 7
      val next = Seq(
        (5000001L, "completely novel content about quasar spectroscopy drift"),
        (5000002L, "fresh second batch subject matter entirely its own"))
        .toDF("doc_id", "text")
      val kept2 = Dedup.ingestDedup(spark, idx, next, "doc_id", "text",
          threshold = 0.9, batchId = 8L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept2 == Set(5000002L), kept2.toString)
      // STALE redelivery: batch 7 arrives again AFTER batch 8 applied —
      // outside the replay window (1), so it fails loudly instead of
      // colliding with its own standing signatures and emitting empty
      val exStale = intercept[IllegalArgumentException] {
        Dedup.ingestDedup(spark, idx, batch, "doc_id", "text",
          threshold = 0.9, batchId = 7L)
      }
      assert(exStale.getMessage.contains("STALE"), exStale.getMessage)
      // and the immediate replay of the LATEST batch still re-emits
      val replay8 = Dedup.ingestDedup(spark, idx, next, "doc_id", "text",
          threshold = 0.9, batchId = 8L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(replay8 == kept2)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  // three deterministic ingest batches over the standing corpus index:
  // each has one near-dup of an indexed doc, one novel doc, and one
  // in-batch twin pair — exercising all three drop paths per batch
  private def mhBatch(k: Int) = {
    import spark.implicits._
    docs.filter(col("doc_id") === (k * 3))
      .withColumn("doc_id", col("doc_id") + 1000000L * k)
      .select("doc_id", "text")
      .unionByName(Seq(
        (2000000L * k + 1, s"novel content batch $k about stellar nucleosynthesis run $k"),
        (2000000L * k + 2, s"twin text of batch $k repeated verbatim for the sibling rule"),
        (2000000L * k + 3, s"twin text of batch $k repeated verbatim for the sibling rule"))
        .toDF("doc_id", "text"))
  }

  private def ingestSeq(idx: String, upTo: Int): Seq[Set[Long]] =
    (1 to upTo).map { k =>
      Dedup.ingestDedup(spark, idx, mhBatch(k), "doc_id", "text",
          threshold = 0.9, batchId = k.toLong)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }

  test("compactMinhashIndex: partitions collapse, fresh AND replayed " +
      "ingest stay bit-identical across the compaction boundary") {
    val dirA = java.nio.file.Files.createTempDirectory("graft-mhcompA")
    val dirB = java.nio.file.Files.createTempDirectory("graft-mhcompB")
    val (idxA, idxB) = (dirA.toString, dirB.toString)
    try {
      // two identical indexes, three ingest batches each; A compacts
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idxA)
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idxB)
      val keptA = ingestSeq(idxA, 3)
      val keptB = ingestSeq(idxB, 3)
      assert(keptA == keptB && keptA.forall(_.nonEmpty))
      val idsBefore = spark.read.parquet(s"$idxA/sigs")
        .select("id").collect().map(_.getLong(0)).toSet
      Dedup.compactMinhashIndex(spark, idxA, targetFiles = 2)
      // bounded layout: exactly the base partition + the last partition
      val seqs = spark.read.parquet(s"$idxA/sigs")
        .select(col("batch_seq").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(seqs == Set(0L, 3L), seqs.toString)
      // ids byte-identical through the rewrite
      assert(spark.read.parquet(s"$idxA/sigs")
        .select("id").collect().map(_.getLong(0)).toSet == idsBefore)
      // the LAST batch's replay evidence survived: an immediate retry
      // re-emits its survivor set bit-identically on both indexes
      val replayA = Dedup.ingestDedup(spark, idxA, mhBatch(3), "doc_id",
          "text", threshold = 0.9, batchId = 3L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(replayA == keptA(2), s"$replayA vs ${keptA(2)}")
      // and a FRESH batch lands identically on compacted vs uncompacted
      val freshA = Dedup.ingestDedup(spark, idxA, mhBatch(4), "doc_id",
          "text", threshold = 0.9, batchId = 4L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val freshB = Dedup.ingestDedup(spark, idxB, mhBatch(4), "doc_id",
          "text", threshold = 0.9, batchId = 4L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(freshA == freshB && freshA.nonEmpty)
      // fresh append after compaction landed at max+1
      assert(spark.read.parquet(s"$idxA/sigs")
        .agg(max(col("batch_seq").cast("long"))).head().getLong(0) == 4L)
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dirA, dirB).foreach(d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p)))
    }
  }

  test("maintenance lease: ingest and probe during a compaction fail " +
      "loudly; a crashed compactor's stale lease is cleared on open") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mhlease")
    val idx = dir.toString
    try {
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idx)
      ingestSeq(idx, 1)
      // simulate an in-flight compaction: hold the lease as the compactor
      // does for its whole critical section
      Dedup.takeMaintenanceLease(spark, idx)
      val e1 = intercept[IllegalStateException] {
        Dedup.ingestDedup(spark, idx, mhBatch(2), "doc_id", "text",
          threshold = 0.9, batchId = 2L)
      }
      assert(e1.getMessage.contains("MAINTENANCE"), e1.getMessage)
      val e2 = intercept[IllegalStateException] {
        Dedup.dedupeAgainstIndex(spark, idx, mhBatch(2), "doc_id", "text")
      }
      assert(e2.getMessage.contains("MAINTENANCE"), e2.getMessage)
      // a second concurrent compactor is refused too
      intercept[IllegalStateException] {
        Dedup.takeMaintenanceLease(spark, idx)
      }
      Dedup.releaseMaintenanceLease(spark, idx)
      // crashed compactor: the lease outlives its owner. Model staleness
      // by shrinking the TTL to zero — the next open clears it and
      // proceeds (the staged swap already guarantees the index is intact)
      Dedup.takeMaintenanceLease(spark, idx)
      val savedTtl = Dedup.staleLeaseMs
      try {
        Dedup.staleLeaseMs = 0L
        val out = Dedup.ingestDedup(spark, idx, mhBatch(2), "doc_id",
          "text", threshold = 0.9, batchId = 2L)
        assert(out.count() > 0)
        assert(!java.nio.file.Files.exists(dir.resolve("_MAINTENANCE")),
          "stale lease must be cleared on open")
      } finally Dedup.staleLeaseMs = savedTtl
      // a completed compaction leaves no lease behind
      Dedup.compactMinhashIndex(spark, idx)
      assert(!java.nio.file.Files.exists(dir.resolve("_MAINTENANCE")))
      // and the index still ingests normally afterwards
      assert(Dedup.ingestDedup(spark, idx, mhBatch(3), "doc_id", "text",
        threshold = 0.9, batchId = 3L).count() > 0)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("band-keyed signature layout: outputs identical to the flat scan, " +
      "probe prunes partitions, crash self-heals, compaction preserved") {
    val dirA = java.nio.file.Files.createTempDirectory("graft-mhbandA")
    val dirB = java.nio.file.Files.createTempDirectory("graft-mhbandB")
    val (idxBand, idxFlat) = (dirA.toString, dirB.toString)
    try {
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idxBand,
        bandParts = 8)
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idxFlat)
      // ingest sequence: banded admissions == flat admissions, batch by
      // batch (identical dedup semantics, different physical plan)
      assert(ingestSeq(idxBand, 3) == ingestSeq(idxFlat, 3))
      // probe-only parity too
      val probeBand = Dedup.dedupeAgainstIndex(spark, idxBand, mhBatch(4),
        "doc_id", "text", threshold = 0.9)
      val probeFlat = Dedup.dedupeAgainstIndex(spark, idxFlat, mhBatch(4),
        "doc_id", "text", threshold = 0.9)
      assert(probeBand.select("doc_id").collect().map(_.getLong(0)).toSet ==
        probeFlat.select("doc_id").collect().map(_.getLong(0)).toSet)
      // the banded probe's standing-side scan carries a bkt_part
      // partition filter — the pruning claim, asserted on the plan
      val plan = probeBand.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("bkt_part"),
        plan.take(4000))
      // crash self-heal: drop the latest band partition (simulating a
      // crash between the sigs append and the bands write) — the next
      // open rebuilds it from sigs and parity holds
      val maxSeq = spark.read.parquet(s"$idxBand/sigs")
        .agg(max(col("batch_seq").cast("long"))).head().getLong(0)
      val bandDir = java.nio.file.Paths.get(idxBand, "bands",
        s"batch_seq=$maxSeq")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(bandDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      assert(!java.nio.file.Files.exists(bandDir))
      val healed = Dedup.dedupeAgainstIndex(spark, idxBand, mhBatch(4),
        "doc_id", "text", threshold = 0.9)
      assert(healed.select("doc_id").collect().map(_.getLong(0)).toSet ==
        probeFlat.select("doc_id").collect().map(_.getLong(0)).toSet)
      assert(java.nio.file.Files.exists(bandDir), "layout not repaired")
      // compaction rebuilds the band layout and parity still holds
      Dedup.compactMinhashIndex(spark, idxBand)
      Dedup.compactMinhashIndex(spark, idxFlat)
      val fresh = Dedup.ingestDedup(spark, idxBand, mhBatch(5), "doc_id",
          "text", threshold = 0.9, batchId = 5L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val freshFlat = Dedup.ingestDedup(spark, idxFlat, mhBatch(5),
          "doc_id", "text", threshold = 0.9, batchId = 5L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(fresh == freshFlat && fresh.nonEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dirA, dirB).foreach(d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p)))
    }
  }

  test("banded probe reads ONLY its touched bkt_part partitions — " +
      "quantitative scan-metric evidence, default-on (no wall clock)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = java.nio.file.Files.createTempDirectory("graft-mhprune")
    val idx = dir.toString
    try {
      // 64 bucket partitions; a 1-doc probe emits 16 band rows, touching
      // AT MOST 16 of them — the scan metric must show the other ≥48
      // were never opened
      Dedup.buildMinhashIndex(docs, "doc_id", "text", idx, bandParts = 64)
      ingestSeq(idx, 2)
      // the probe is an INDEXED doc: its band buckets collide, so AQE's
      // empty-relation propagation cannot delete the pruned scan from
      // the final plan (a non-colliding probe made this pin vacuous)
      val oneDoc = docs.filter(col("doc_id") === 42)
        .select("doc_id", "text").localCheckpoint(true)
      val probe = Dedup.dedupeAgainstIndex(spark, idx, oneDoc,
        "doc_id", "text", threshold = 0.9)
      // collect(), not count(): metrics populate only on THIS dataset's
      // own QueryExecution
      probe.collect()
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scans(i.relation.cachedPlan)
        case f: FileSourceScanExec    => Seq(f)
        case other => (other.children ++ other.subqueries).flatMap(scans)
      }
      val bandScans = scans(probe.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.exists(
          _.toString.contains("/bands")))
      assert(bandScans.nonEmpty, "probe must read the band layout")
      val filesRead = bandScans.map(_.metrics("numFiles").value).sum
      // total files on disk: one per (batch_seq, bkt_part) dir written
      import scala.jdk.CollectionConverters._
      val totalFiles = java.nio.file.Files
        .walk(java.nio.file.Paths.get(idx, "bands"))
        .iterator().asScala
        .count(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
      // ≤ 16 touched keys × 3 seq partitions (build + 2 ingests), and
      // strictly fewer than the full layout — pruning is REAL, not
      // just a filter string in the plan. filesRead > 0 keeps the pin
      // non-vacuous (an unpopulated metric reads 0 and would "pass")
      assert(filesRead > 0 && filesRead <= 16L * 3 &&
        filesRead < totalFiles,
        s"bands scan read $filesRead of $totalFiles files — not pruned")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("appendToDecontamIndex: append(half) o build(half) == build(whole); " +
      "re-append is idempotent") {
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val dirA = java.nio.file.Files.createTempDirectory("graft-decapA")
    val dirW = java.nio.file.Files.createTempDirectory("graft-decapW")
    val (idxApp, idxWhole) = (dirA.toString, dirW.toString)
    try {
      Dedup.buildDecontamIndex(spark,
        bench.filter(col("doc_id") % 2 === 0), "text", idxApp, n = 5)
      // fingerprint the build slice's files: the append must write ONLY
      // its own slice_seq partition, never rewrite the standing one
      import scala.jdk.CollectionConverters._
      def sliceFiles(seq: Long) = java.nio.file.Files
        .walk(java.nio.file.Paths.get(idxApp, "grams", s"slice_seq=$seq"))
        .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.getFileName.toString ->
          (java.nio.file.Files.size(p),
           java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
      val slice0Before = sliceFiles(0L)
      Dedup.appendToDecontamIndex(spark, idxApp,
        bench.filter(col("doc_id") % 2 =!= 0), "text")
      assert(sliceFiles(0L) == slice0Before,
        "append must not rewrite the standing gram slice")
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(idxApp, "grams", "slice_seq=1")),
        "append must land as its own slice_seq partition")
      Dedup.buildDecontamIndex(spark, bench, "text", idxWhole, n = 5)
      def kept(p: String) = Dedup.decontaminateFromIndex(spark, p, docs,
          "doc_id", "text", maxContaminatedFrac = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val (a, w) = (kept(idxApp), kept(idxWhole))
      assert(a == w && a.nonEmpty, s"append ${a.size} vs whole ${w.size}")
      // grams and recorded item counts agree with the from-scratch build
      def grams(p: String) = spark.read.parquet(s"$p/grams")
        .collect().map(_.getLong(0)).toSet
      assert(grams(idxApp) == grams(idxWhole))
      assert(spark.read.parquet(s"$idxApp/meta").head().getAs[Long]("items")
        == spark.read.parquet(s"$idxWhole/meta").head().getAs[Long]("items"))
      // re-appending the same slice changes nothing (distinct union) —
      // including NO duplicate rows (a stale-cache replay once re-landed
      // the slice as a duplicate partition; probes count rows, so
      // duplicates would silently inflate contamination counts)
      Dedup.appendToDecontamIndex(spark, idxApp,
        bench.filter(col("doc_id") % 2 =!= 0), "text")
      assert(kept(idxApp) == w && grams(idxApp) == grams(idxWhole))
      val gAll = spark.read.parquet(s"$idxApp/grams")
      assert(gAll.count() == gAll.select("g").distinct().count(),
        "re-append must not land duplicate gram rows")
      // legacy flat gram table (pre-r17, no slice_seq): the first append
      // self-upgrades to the partitioned layout, probe output unchanged
      val gramsP = java.nio.file.Paths.get(idxApp, "grams")
      val flatP = java.nio.file.Paths.get(idxApp, "grams_legacy")
      spark.read.parquet(gramsP.toString).select("g")
        .write.mode("overwrite").parquet(flatP.toString)
      java.nio.file.Files.walk(gramsP).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      java.nio.file.Files.move(flatP, gramsP)
      Dedup.appendToDecontamIndex(spark, idxApp,
        bench.filter(col("doc_id") % 2 =!= 0), "text")
      assert(java.nio.file.Files.isDirectory(gramsP.resolve("slice_seq=0")),
        "legacy flat grams must upgrade to the slice_seq layout")
      assert(kept(idxApp) == w && grams(idxApp) == grams(idxWhole))
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dirA, dirW).foreach(d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p)))
    }
  }

  test("minhash LSH hot-bucket guard drops degenerate band buckets") {
    import spark.implicits._
    // 40 byte-identical docs: every band bucket holds all 40 — the
    // quadratic failure mode the guard exists for
    val texts = (1 to 40).map(i =>
      (i.toLong, "the same exact boilerplate text repeated again and again"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(texts, "doc_id", "text",
      threshold = 0.9, maxBucket = 0)
    assert(uncapped.count() == 40L * 39 / 2)
    val capped = Dedup.minhashLshPairs(texts, "doc_id", "text",
      threshold = 0.9, maxBucket = 10)
    assert(capped.count() == 0)
  }

  test("knnJoin is invariant to input partitioning") {
    import TestSpark.assertSameRows
    val odd = emb.filter(col("vec_id") % 2 === 1).limit(40)
    val even = emb.filter(col("vec_id") % 2 === 0)
    val r1 = Similarity.knnJoin(odd.repartition(1), even.repartition(3),
      k = 2, dim = 64, nPlanes = 6, nTables = 6)
    val r2 = Similarity.knnJoin(odd.repartition(7), even.repartition(13),
      k = 2, dim = 64, nPlanes = 6, nTables = 6)
    assertSameRows(r1, r2, clue = "partitioning must not change results")
  }

  test("knnJoin hot-bucket guard bounds degenerate corpus buckets") {
    val queries = emb.limit(5)
    // corpus of 60 copies of ONE vector: every table's bucket holds all 60
    val dupCorpus = spark.range(1, 61)
      .crossJoin(emb.limit(1).select(col("embedding")))
      .select(col("id").as("vec_id"), col("embedding"))
    val uncapped = Similarity.knnJoin(queries, dupCorpus, k = 2, dim = 64,
      nPlanes = 6, nTables = 4, maxBucket = 0)
    assert(uncapped.count() > 0)
    val capped = Similarity.knnJoin(queries, dupCorpus, k = 2, dim = 64,
      nPlanes = 6, nTables = 4, maxBucket = 20)
    assert(capped.count() == 0)
  }

  test("recallAtK: per-query and macro rows, hand-checked") {
    import spark.implicits._
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "item_id")
    val approx = Seq((1L, 10L), (1L, 99L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "item_id")
    val r = Similarity.recallAtK(truth, approx).collect()
      .map(x => (if (x.isNullAt(0)) -1L else x.getLong(0)) -> x.getDouble(1)).toMap
    assert(r(1L) == 0.5 && r(2L) == 1.0 && r(-1L) == 0.75)
    // and on real data: LSH against brute force is within [0, 1], macro > 0
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, q, k = 3)
    val lsh = Similarity.lshTopK(emb, q, k = 3, dim = 64)
    val macroR = Similarity.recallAtK(exact, lsh)
      .filter(col("query_id").isNull).head().getDouble(1)
    assert(macroR >= 0.0 && macroR <= 1.0)
  }

  test("contamination: bench docs report frac 1.0, decontaminate drops them, hashed==string") {
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val nBench = bench.count()
    assert(nBench > 0)
    val rep = Dedup.contaminationReport(docs, "doc_id", "text", bench, "text",
      n = 5, hashed = false)
    // every bench doc is in train, so its gram set is fully covered
    val self = rep.filter(col("doc_id") % 17 === 0)
    assert(self.count() == nBench)
    assert(self.filter(col("contaminated_frac") < 1.0).count() == 0,
      "a bench doc's own grams must all be contaminated")
    // hashed path produces the same report (no collisions at this scale)
    val repH = Dedup.contaminationReport(docs, "doc_id", "text", bench, "text",
      n = 5, hashed = true)
    assert(rep.exceptAll(repH).isEmpty && repH.exceptAll(rep).isEmpty,
      "hashed and string gram reports must agree")
    // decontaminate at threshold 0: every reported doc is gone, others stay
    val clean = Dedup.decontaminate(docs, "doc_id", "text", bench, "text",
      n = 5, maxContaminatedFrac = 0.0)
    val reported = rep.select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(reported).isEmpty)
    assert(kept.size + reported.size == docs.count())
    // column pass-through
    assert(clean.columns.toSeq == docs.columns.toSeq)
    // Bloom-prefiltered path: identical report and identical survivors
    // (no false negatives; the exact join rejects bloom false positives)
    val repB = Dedup.contaminationReportBloomAgainst(docs, "doc_id", "text",
      Dedup.benchmarkGrams(bench, "text", n = 5), n = 5)
    assert(repH.exceptAll(repB).isEmpty && repB.exceptAll(repH).isEmpty,
      "bloom-prefiltered report must equal the exact hashed report")
    val cleanB = Dedup.decontaminateBloom(docs, "doc_id", "text", bench,
      "text", n = 5, maxContaminatedFrac = 0.0)
    assert(cleanB.select("doc_id").collect().map(_.getLong(0)).toSet == kept)
  }

  test("lmScore: hand-checked counts; junk text scores below in-distribution text") {
    import spark.implicits._
    // corpus: "a b" x3 and "a c" x1 -> U(a)=4, U(b)=3, U(c)=1 over pairs;
    // V=3; B("a b")=3, B("a c")=1
    val corpus = Seq("a b", "a b", "a b", "a c").toDF("text")
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "z q")).toDF("doc_id", "text")
    val out = TextFns.lmScore(docs, "doc_id", "text", corpus, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 1L)
    val exp1 = math.log((3 + 1) / (4 + 3).toDouble)
    val exp2 = math.log((1 + 1) / (4 + 3).toDouble)
    val exp3 = math.log((0 + 1) / (0 + 3).toDouble)
    assert(math.abs(out(1L)._2 - BigDecimal(exp1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(1L)._2 > out(2L)._2, "frequent bigram must outscore rare")
    assert(math.abs(out(2L)._2 - BigDecimal(exp2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(3L)._2 - BigDecimal(exp3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // corpus self-scoring at sf0.001: natural docs outscore shuffled junk
    val junk = spark.range(1).select(lit(900001L).as("doc_id"),
      lit((1 to 60).map(i => s"xq$i").mkString(" ")).as("text"))
    val scored = TextFns.lmScore(
      docs.select("doc_id", "text").unionByName(junk),
      "doc_id", "text", docs, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val naturalAvg = scored.filter(_._1 != 900001L).values.sum / (scored.size - 1)
    assert(scored(900001L) < naturalAvg,
      s"junk ${scored(900001L)} should be below natural mean $naturalAvg")
  }

  test("cleanText strips tags and urls, collapses whitespace; addTally windows") {
    import spark.implicits._
    val d = Seq(
      (1L, "<p>Hello <b>world</b></p> visit https://a.example/x?q=1 now"),
      (2L, "no markup   just   spaces"),
      (3L, "ftp://host/file and <br/>")).toDF("id", "t")
    val out = d.select(col("id"), TextFns.cleanText(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Hello world visit now")
    assert(out(2L) == "no markup just spaces")
    assert(out(3L) == "and")
    val tallied = Tbl(d.withColumn("g", col("id") % 2)).groupBy("g")
      .addTally().df
    assert(tallied.where(col("g") === 1).head().getLong(3) == 2L)
  }

  test("curation op properties: idempotence, counts==replacements, guards") {
    import spark.implicits._
    // seeded adversarial-ish corpus: pii fragments glued in random contexts
    val rnd = new scala.util.Random(7)
    val frags = Seq("x@y.zz", "123-45-6789", "+1 (555) 123-4567", "9.8.7.6",
      "<b>t</b>", "https://u.v/w?a=1", "plain", "  sp  aces ", "2021-01-02")
    val rows = (1 to 60).map { i =>
      (i.toLong, Seq.fill(5)(frags(rnd.nextInt(frags.size))).mkString(" "))
    }.toDF("id", "t")
    val once = rows.select(col("id"), TextFns.redactPii(col("t")).as("r"),
      TextFns.cleanText(col("t")).as("c"),
      TextFns.piiCounts(col("t")).as("pc"))
    val twice = once.select(col("id"), TextFns.redactPii(col("r")).as("r2"),
      TextFns.cleanText(col("c")).as("c2"), col("r"), col("c"), col("pc"))
    // idempotence: a second pass changes nothing
    assert(twice.filter(col("r") =!= col("r2")).count() == 0)
    assert(twice.filter(col("c") =!= col("c2")).count() == 0)
    // sum(piiCounts) == number of [TOKEN]s inserted by redactPii
    val mism = once.withColumn("n_tok",
        size(split(col("r"), "\\[(EMAIL|SSN|PHONE|IPV4)\\]")) - 1)
      .filter(col("n_tok") =!=
        col("pc.email") + col("pc.ssn") + col("pc.phone") + col("pc.ipv4"))
    assert(mism.count() == 0)
    // argument guards
    intercept[IllegalArgumentException] {
      Tbl(rows).sampleQuota(Seq("id"), Seq(col("id")), 0) }
    intercept[IllegalArgumentException] {
      graft.ops.Scale.packByBudget(rows, Seq(col("id")), col("id"), 0) }
    intercept[IllegalArgumentException] {
      graft.ops.Scale.interleaveWeighted(Seq(("a", rows, -1.0)), d => Seq(d("id"))) }
  }

  test("redactPii scrubs emails/ssn/phones/ips and piiCounts counts them") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail a.b+c@ex-ample.org then ssn 123-45-6789 done"),
      (2L, "call +1 (555) 123-4567 or 555.123.4567 from 10.0.0.1"),
      (3L, "clean text with numbers 12345 and a date 2021-01-02"),
      (4L, "x@y.io x@y.io 1.2.3.4"),
      // anchored phone + real-octet ipv4: digit windows inside longer runs
      // and >255 octets must survive unredacted
      (5L, "order 123456789012345 ts 1699999999999999 ip 999.999.999.999 ok"))
      .toDF("id", "t")
    val out = rows.select(col("id"), TextFns.redactPii(col("t")).as("r"),
        TextFns.piiCounts(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getStruct(2))).toMap
    assert(out(1L)._1 == "mail [EMAIL] then ssn [SSN] done")
    assert(out(2L)._1 == "call [PHONE] or [PHONE] from [IPV4]")
    assert(out(3L)._1 == "clean text with numbers 12345 and a date 2021-01-02")
    assert(out(4L)._1 == "[EMAIL] [EMAIL] [IPV4]")
    assert(out(1L)._2.getLong(0) == 1 && out(1L)._2.getLong(1) == 1)
    assert(out(2L)._2.getLong(2) == 2 && out(2L)._2.getLong(3) == 1)
    assert((0 to 3).map(out(3L)._2.getLong(_)).sum == 0)
    assert(out(4L)._2.getLong(0) == 2 && out(4L)._2.getLong(3) == 1)
    assert(out(5L)._1 == "order 123456789012345 ts 1699999999999999 ip 999.999.999.999 ok")
    assert((0 to 3).map(out(5L)._2.getLong(_)).sum == 0)
  }

  test("unpersistIntermediates releases every block the dedup pipeline pinned") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, bands = 16, rows = 2, threshold = 0.5)
    val kept = Dedup.keepCanonical(docs, "doc_id", pairs).count()
    assert(kept > 0)
    val pinned = sc.getPersistentRDDs.keySet.toSet -- before
    assert(pinned.nonEmpty, "pipeline should pin intermediates while running")
    Dedup.unpersistIntermediates()
    val leaked = sc.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"leaked pinned RDD ids: $leaked")
  }

  test("cdcChunks: exact cover, boundary rule, shift resistance") {
    import spark.implicits._
    def chunksOf(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("__w", TextFns.tokens(col("text")))
        .select(col("doc_id"),
          posexplode(TextFns.cdcChunks(col("__w"), n = 5, divisor = 4))
            .as(Seq("ci", "c")))
        .select(col("doc_id"), col("ci"), col("c.tok_start"), col("c.n_tok"),
          col("c.chunk_md5"))
    val real = docs.limit(60)
    val rows = chunksOf(real).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    val toks = real.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.split("\\s+").length).toMap
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunks tile the doc exactly: starts chain and lengths sum to n_tok
      assert(sorted.head._3 == 0)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4, s"doc $id gap")
        case _ =>
      }
      assert(sorted.map(_._4).sum == toks(id), s"doc $id cover")
      assert(sorted.forall(_._4 > 0))
    }
    // shift resistance: prepending one token re-chunks only the prefix —
    // the chunk fingerprint MULTISET tail is shared
    val base = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt uu vv ww xx yy zz"
    val two = Seq((1L, base), (2L, "zz9 " + base)).toDF("doc_id", "text")
    val cs = chunksOf(two).collect()
      .map(r => r.getLong(0) -> r.getString(4))
    val a = cs.filter(_._1 == 1L).map(_._2).toSet
    val b = cs.filter(_._1 == 2L).map(_._2).toSet
    assert(a.intersect(b).nonEmpty,
      s"a one-token shift must preserve later chunk fingerprints: $a vs $b")
  }

  test("persisted winnow index: probe == flat distinct-fp join, probe " +
      "plan prunes fp_part partitions, maxDf drops stop-fps, crashed " +
      "build (no meta) fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-widx")
    val idx = dir.toString
    try {
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val probe = docs.filter(col("doc_id") % 2 === 1).limit(40)
      Dedup.buildWinnowIndex(spark, corpus, "doc_id", "text", idx,
        n = 5, w = 4, parts = 16)
      val indexed = Dedup.winnowCandidatesAgainstIndex(spark, idx, probe,
          "doc_id", "text", minShared = 1)
      // flat form: the streamingWinnowCandidates join shape
      val cfps = Dedup.winnowFingerprints(corpus, "doc_id", "text", 5, 4)
        .select(col("doc_id").as("id_corpus"), col("fp")).distinct()
      val pfps = Dedup.winnowFingerprints(probe, "doc_id", "text", 5, 4)
        .select(col("doc_id").as("id_new"), col("fp")).distinct()
      val flat = pfps.join(cfps, "fp").groupBy("id_new", "id_corpus")
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 1)
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val (gi, gf) = (rows(indexed), rows(flat))
      assert(gi == gf && gi.nonEmpty, s"indexed $gi vs flat $gf")
      // the probe plan carries the fp_part pruning filter, and the scan
      // metric proves partitions were actually SKIPPED (quantitative,
      // wall-clock-free — the default-on scaling evidence)
      indexed.count()
      val plan = indexed.queryExecution.executedPlan.toString
      assert(plan.contains("fp_part"),
        s"probe plan must prune on fp_part:\n$plan")
      locally {
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
        def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: QueryStageExec        => scans(q.plan)
          case i: InMemoryTableScanExec => scans(i.relation.cachedPlan)
          case f: FileSourceScanExec    => Seq(f)
          case other => (other.children ++ other.subqueries).flatMap(scans)
        }
        // quantitative pruning: a 64-partition index probed by ONE doc
        // (a handful of fps) must open only its touched fp_part dirs.
        // The probe is an INDEXED doc — collisions keep the pruned scan
        // in the executed plan (AQE's empty-relation propagation deletes
        // it otherwise) — and collect() executes THIS dataset's own
        // QueryExecution so the metric actually populates (a count()
        // left it 0 and the pin vacuous; round-18 hardening).
        val idxP = dir.resolve("pruned").toString
        Dedup.buildWinnowIndex(spark, corpus, "doc_id", "text", idxP,
          n = 5, w = 4, parts = 64)
        val tiny = corpus.filter(col("doc_id") === 42)
          .select("doc_id", "text").localCheckpoint(true)
        val probeP = Dedup.winnowCandidatesAgainstIndex(spark, idxP, tiny,
          "doc_id", "text", minShared = 1)
        probeP.collect()
        val fpScans = scans(probeP.queryExecution.executedPlan)
          .filter(_.relation.location.rootPaths.exists(
            _.toString.contains("/fps")))
        assert(fpScans.nonEmpty, "probe must read the fp layout")
        import scala.jdk.CollectionConverters._
        val totalFiles = java.nio.file.Files
          .walk(java.nio.file.Paths.get(idxP, "fps"))
          .iterator().asScala
          .count(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
        val filesRead = fpScans.map(_.metrics("numFiles").value).sum
        assert(filesRead > 0 && filesRead < totalFiles,
          s"fps scan read $filesRead of $totalFiles files — not pruned")
      }
      // APPEND: build(half of corpus) + append(other half) probes
      // identically to build(whole), writes ONLY its own batch_seq
      // partition, and a replayed append is a no-op
      val idxApp = dir.resolve("appended").toString
      Dedup.buildWinnowIndex(spark, corpus.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", idxApp, n = 5, w = 4, parts = 16)
      def slice0Files() = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files
          .walk(java.nio.file.Paths.get(idxApp, "fps", "batch_seq=0"))
          .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => p.toString ->
            (java.nio.file.Files.size(p),
             java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
      }
      val s0 = slice0Files()
      Dedup.appendToWinnowIndex(spark, idxApp,
        corpus.filter(col("doc_id") % 4 === 2), "doc_id", "text")
      assert(slice0Files() == s0,
        "append must not rewrite the standing fp partition")
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(idxApp, "fps", "batch_seq=1")))
      val appended = rows(Dedup.winnowCandidatesAgainstIndex(spark, idxApp,
        probe, "doc_id", "text", minShared = 1))
      assert(appended == gi, s"append ${appended.size} vs whole ${gi.size}")
      // replayed append: anti-join makes it a no-op
      Dedup.appendToWinnowIndex(spark, idxApp,
        corpus.filter(col("doc_id") % 4 === 2), "doc_id", "text")
      assert(rows(Dedup.winnowCandidatesAgainstIndex(spark, idxApp,
        probe, "doc_id", "text", minShared = 1)) == gi)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(idxApp, "fps", "batch_seq=2")),
        "replayed append must not land a partition")
      // maxDf-guarded indexes refuse appends loudly (dropped stop-fps
      // could not be re-counted — rebuild instead)
      val idxG = dir.resolve("guarded2").toString
      Dedup.buildWinnowIndex(spark, corpus, "doc_id", "text", idxG,
        n = 5, w = 4, parts = 4, maxDf = 5L)
      val eG = intercept[IllegalArgumentException](
        Dedup.appendToWinnowIndex(spark, idxG, probe, "doc_id", "text"))
      assert(eG.getMessage.contains("maxDf"), eG.getMessage)
      // maxDf applies at build time: a boilerplate fp shared by every
      // corpus doc disappears from the index
      import spark.implicits._
      val boiler = (1L to 30L).map(i =>
        (i * 2, s"shared boilerplate header tail one two three unique$i " +
          s"marker$i word$i end$i close$i fin$i"))
        .toDF("doc_id", "text")
      val idx2 = dir.resolve("guarded").toString
      Dedup.buildWinnowIndex(spark, boiler, "doc_id", "text", idx2,
        n = 5, w = 4, parts = 4, maxDf = 5L)
      val guarded = spark.read.parquet(s"$idx2/fps")
      val dfMax = guarded.groupBy("fp").agg(count(lit(1)).as("c"))
        .agg(max("c")).head().getLong(0)
      assert(dfMax <= 5L, s"stop-fps must be dropped at build: $dfMax")
      // crashed build: fps written, meta (the commit point) missing
      val idx3 = dir.resolve("crashed").toString
      spark.read.parquet(s"$idx/fps").write.parquet(s"$idx3/fps")
      assertThrows[org.apache.spark.sql.AnalysisException](
        Dedup.winnowCandidatesAgainstIndex(spark, idx3, probe,
          "doc_id", "text").count())
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      Dedup.unpersistIntermediates()
    }
  }

  test("compactWinnowIndex: partitions collapse to the base, probe parity " +
      "and fp_part pruning survive, replayed append stays a no-op; " +
      "REBUILD over an existing index honors new parameters and its crash " +
      "window (meta retracted first) fails loudly, never prunes wrong") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wcmp")
    val idx = dir.toString
    import scala.jdk.CollectionConverters._
    try {
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val probe = docs.filter(col("doc_id") % 2 === 1).limit(40)
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      Dedup.buildWinnowIndex(spark, corpus.filter(col("doc_id") % 4 === 0),
        "doc_id", "text", idx, n = 5, w = 4, parts = 16)
      Dedup.appendToWinnowIndex(spark, idx,
        corpus.filter(col("doc_id") % 4 === 2), "doc_id", "text")
      val before = rows(Dedup.winnowCandidatesAgainstIndex(spark, idx,
        probe, "doc_id", "text", minShared = 1))
      def seqDirs() = java.nio.file.Files
        .list(java.nio.file.Paths.get(idx, "fps")).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("batch_seq="))
        .toSet
      assert(seqDirs() == Set("batch_seq=0", "batch_seq=1"))
      Dedup.compactWinnowIndex(spark, idx)
      assert(seqDirs() == Set("batch_seq=0"),
        s"compaction must collapse to the base: ${seqDirs()}")
      val afterC = Dedup.winnowCandidatesAgainstIndex(spark, idx, probe,
        "doc_id", "text", minShared = 1)
      assert(rows(afterC) == before && before.nonEmpty,
        "probe output must survive compaction exactly")
      afterC.count()
      assert(afterC.queryExecution.executedPlan.toString.contains("fp_part"),
        "fp_part pruning must survive compaction")
      // no lease left behind; a replayed append is still a no-op (the
      // anti-join sees the compacted rows)
      assert(!java.nio.file.Files.exists(dir.resolve("_MAINTENANCE")))
      Dedup.appendToWinnowIndex(spark, idx,
        corpus.filter(col("doc_id") % 4 === 2), "doc_id", "text")
      assert(seqDirs() == Set("batch_seq=0"),
        "replayed append after compaction must not land a partition")
      // REBUILD over the existing index with different parameters: the
      // new meta governs (parts 16 -> 4, portable hash), and the probe
      // still equals the flat join under the NEW convention
      val ph = (c: org.apache.spark.sql.Column) =>
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      Dedup.buildWinnowIndex(spark, corpus, "doc_id", "text", idx,
        n = 5, w = 4, parts = 4, portable = true)
      val rebuilt = rows(Dedup.winnowCandidatesAgainstIndex(spark, idx,
        probe, "doc_id", "text", minShared = 1))
      val cfps = Dedup.winnowFingerprints(corpus, "doc_id", "text", 5, 4,
          ph).select(col("doc_id").as("id_corpus"), col("fp")).distinct()
      val pfps = Dedup.winnowFingerprints(probe, "doc_id", "text", 5, 4,
          ph).select(col("doc_id").as("id_new"), col("fp")).distinct()
      val flat = rows(pfps.join(cfps, "fp").groupBy("id_new", "id_corpus")
        .agg(count(lit(1)).as("n_shared")).where(col("n_shared") >= 1))
      assert(rebuilt == flat && rebuilt.nonEmpty,
        s"rebuild must serve the new convention: $rebuilt vs $flat")
      // the rebuild crash window: meta is RETRACTED before the fps
      // overwrite, so a crash mid-rebuild leaves a meta-less index that
      // fails loudly on open — never an old-parameter meta silently
      // mis-pruning new-layout fps. Reconstruct that state exactly.
      val fsj = java.nio.file.Paths.get(idx, "meta")
      java.nio.file.Files.walk(fsj).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      assertThrows[org.apache.spark.sql.AnalysisException](
        Dedup.winnowCandidatesAgainstIndex(spark, idx, probe,
          "doc_id", "text").count())
    } finally {
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      Dedup.unpersistIntermediates()
    }
  }

  test("winnowIngest: admission vs standing corpus with index growth; " +
      "replay re-derives the identical emission with a no-op append " +
      "(batch-id exclusion, no recorded evidence); intra-batch dups " +
      "admit together; guarded index refuses; lease released") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wing")
    val idx = dir.toString
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    try {
      val corpus = docs.filter(col("doc_id") % 4 === 0)
      Dedup.buildWinnowIndex(spark, corpus, "doc_id", "text", idx,
        n = 5, w = 4, parts = 8)
      // batch 1: one planted copy of an indexed doc + one novel doc
      val copied = docs.filter(col("doc_id") === 8)
        .select(lit(900001L).as("doc_id"), col("text"))
      val novel = docs.filter(col("doc_id") === 3)
        .select(lit(900002L).as("doc_id"), col("text"))
      val b1 = copied.unionByName(novel)
      val a1 = Dedup.winnowIngest(spark, idx, b1, "doc_id", "text",
          minShared = 2).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a1 == Set(900002L),
        s"copy must drop vs standing, novel must admit: $a1")
      // growth: a copy of the ADMITTED novel doc arriving later drops
      val b2 = docs.filter(col("doc_id") === 3)
        .select(lit(900003L).as("doc_id"), col("text"))
      val a2 = Dedup.winnowIngest(spark, idx, b2, "doc_id", "text",
          minShared = 2).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a2.isEmpty, s"copy of an admitted doc must drop: $a2")
      // REPLAY of batch 1: the admitted doc's own standing fps must not
      // block it (batch-id exclusion) — identical emission, and the
      // append lands no new ROWS (an empty partition dir is fine)
      def fpRows() = spark.read.parquet(s"$idx/fps")
        .select("id", "fp").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val before = fpRows()
      val r1 = Dedup.winnowIngest(spark, idx, b1, "doc_id", "text",
          minShared = 2).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(r1 == a1, s"replay must re-derive identically: $r1 vs $a1")
      assert(fpRows() == before, "replayed append must land no new rows")
      // ... and the re-derivation survives compaction (fold keeps rows)
      Dedup.compactWinnowIndex(spark, idx)
      val r2 = Dedup.winnowIngest(spark, idx, b1, "doc_id", "text",
          minShared = 2).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(r2 == a1 && fpRows() == before,
        s"replay across compaction must re-derive identically: $r2")
      // intra-batch near-dups admit TOGETHER (documented: compose
      // resolveWinnow upstream for within-batch precision) — fresh text
      // so neither collides with anything standing
      val twinFresh = Seq(
        (910001L, "completely unprecedented prose about volcanic glass " +
          "formations and their crystalline cooling behavior patterns"),
        (910002L, "completely unprecedented prose about volcanic glass " +
          "formations and their crystalline cooling behavior patterns"))
        .toDF("doc_id", "text")
      val a3 = Dedup.winnowIngest(spark, idx, twinFresh, "doc_id", "text",
          minShared = 2).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a3 == Set(910001L, 910002L),
        s"intra-batch dups admit together by contract: $a3")
      // no lease left behind; guarded index refuses
      assert(!java.nio.file.Files.exists(dir.resolve("_MAINTENANCE")))
      val guarded = java.nio.file.Files
        .createTempDirectory("graft-wing-g").toString
      Dedup.buildWinnowIndex(spark, corpus, "doc_id", "text", guarded,
        n = 5, w = 4, parts = 8, maxDf = 5L)
      val e = intercept[IllegalArgumentException](
        Dedup.winnowIngest(spark, guarded, b1, "doc_id", "text"))
      assert(e.getMessage.contains("maxDf"), e.getMessage)
      java.nio.file.Files.walk(java.nio.file.Paths.get(guarded))
        .iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } finally {
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      Dedup.unpersistIntermediates()
    }
  }

  test("probe scan cost is FLAT in corpus depth (default-on, wall-clock-" +
      "free): the same 1-doc probe opens the same file count against a " +
      "2x corpus for BOTH index families, and compaction collapses " +
      "append-accumulated partition growth back to the base cost") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case i: InMemoryTableScanExec => scans(i.relation.cachedPlan)
      case f: FileSourceScanExec    => Seq(f)
      case other => (other.children ++ other.subqueries).flatMap(scans)
    }
    // collect(), NOT count(): count() wraps the frame in a NEW
    // QueryExecution, so the captured plan's metrics never populate and
    // a scan assertion passes vacuously at 0 — collect() executes THIS
    // dataset's own plan. The probe must also COLLIDE with the corpus:
    // AQE's empty-relation propagation otherwise deletes the pruned scan
    // from the final plan entirely (round-18 finding; the r17 pins were
    // hardened the same way).
    def filesReadFrom(d: org.apache.spark.sql.DataFrame,
                      sub: String): Long = {
      d.collect()
      val got = scans(d.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.exists(
          _.toString.contains(sub)))
        .map(_.metrics("numFiles").value).sum
      assert(got > 0, s"no executed scan under $sub — vacuous metric")
      got
    }
    // a probe that EXISTS in both corpora (even id): its fps/bands are
    // identical against either index, and its collisions keep the scan
    // in the executed plan
    val tiny = docs.filter(col("doc_id") === 42).select("doc_id", "text")
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft-depth")
    try {
      // WINNOW: half-corpus vs full-corpus index, same layout — the
      // probe touches the SAME fp_part dirs (its own fps decide), so
      // depth cannot move the file count
      val (wH, wF) = (s"$dir/winH", s"$dir/winF")
      Dedup.buildWinnowIndex(spark, docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", wH, n = 5, w = 4, parts = 32)
      Dedup.buildWinnowIndex(spark, docs, "doc_id", "text", wF,
        n = 5, w = 4, parts = 32)
      val fH = filesReadFrom(Dedup.winnowCandidatesAgainstIndex(spark, wH,
        tiny, "doc_id", "text", minShared = 1), "/fps")
      val fF = filesReadFrom(Dedup.winnowCandidatesAgainstIndex(spark, wF,
        tiny, "doc_id", "text", minShared = 1), "/fps")
      assert(fF == fH && fF > 0,
        s"winnow probe cost moved with corpus depth: $fH -> $fF")
      // append growth adds one partition set; compaction collapses the
      // probe cost back to the base
      Dedup.appendToWinnowIndex(spark, wF,
        docs.select(col("doc_id") + 1000000L as "doc_id", col("text")),
        "doc_id", "text")
      val fApp = filesReadFrom(Dedup.winnowCandidatesAgainstIndex(spark,
        wF, tiny, "doc_id", "text", minShared = 1), "/fps")
      assert(fApp > fF, s"append must add a partition set: $fF -> $fApp")
      Dedup.compactWinnowIndex(spark, wF)
      val fCmp = filesReadFrom(Dedup.winnowCandidatesAgainstIndex(spark,
        wF, tiny, "doc_id", "text", minShared = 1), "/fps")
      assert(fCmp == fF,
        s"compaction must restore the base probe cost: $fCmp vs $fF")
      // MINHASH (banded): the 1-doc probe emits 16 band keys — the band
      // scan opens at most those buckets' dirs on EITHER corpus depth
      val (mH, mF) = (s"$dir/mhH", s"$dir/mhF")
      Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", mH, bandParts = 64)
      Dedup.buildMinhashIndex(docs, "doc_id", "text", mF, bandParts = 64)
      val bH = filesReadFrom(Dedup.dedupeAgainstIndex(spark, mH, tiny,
        "doc_id", "text", threshold = 0.9), "/bands")
      val bF = filesReadFrom(Dedup.dedupeAgainstIndex(spark, mF, tiny,
        "doc_id", "text", threshold = 0.9), "/bands")
      assert(bH <= 16 && bF <= 16 && bF > 0,
        s"banded probe must stay within its touched buckets: $bH, $bF")
      assert(bF <= bH + 2,
        s"minhash probe cost moved with corpus depth: $bH -> $bF")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      Dedup.unpersistIntermediates()
    }
  }

  test("persisted-index writer leases: concurrent winnow/decontam appends, " +
      "probes, and compactions are refused loudly while a maintenance " +
      "writer holds the lease; appends leave no lease behind") {
    val dirW = java.nio.file.Files.createTempDirectory("graft-wlease")
    val dirD = java.nio.file.Files.createTempDirectory("graft-dlease")
    val (idxW, idxD) = (dirW.toString, dirD.toString)
    import scala.jdk.CollectionConverters._
    try {
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val extra = docs.filter(col("doc_id") % 2 === 1).limit(20)
      Dedup.buildWinnowIndex(spark, corpus, "doc_id", "text", idxW,
        n = 5, w = 4, parts = 8)
      // simulate an in-flight maintenance writer (append/compactor) on
      // the winnow index: every other writer AND prober refuses loudly
      graft.ops.Lease.take(spark, idxW, "in-flight-append")
      val e1 = intercept[IllegalStateException](
        Dedup.appendToWinnowIndex(spark, idxW, extra, "doc_id", "text"))
      assert(e1.getMessage.contains("MAINTENANCE"), e1.getMessage)
      val e2 = intercept[IllegalStateException](
        Dedup.compactWinnowIndex(spark, idxW))
      assert(e2.getMessage.contains("MAINTENANCE"), e2.getMessage)
      val e3 = intercept[IllegalStateException](
        Dedup.winnowCandidatesAgainstIndex(spark, idxW, extra,
          "doc_id", "text").count())
      assert(e3.getMessage.contains("MAINTENANCE"), e3.getMessage)
      graft.ops.Lease.release(spark, idxW)
      // single-writer paths unaffected: the append works and releases
      Dedup.appendToWinnowIndex(spark, idxW, extra, "doc_id", "text")
      assert(!java.nio.file.Files.exists(dirW.resolve("_MAINTENANCE")),
        "append must release its lease")
      // same contract on the decontam index
      Dedup.buildDecontamIndex(spark, corpus.limit(40), "text", idxD, n = 3)
      graft.ops.Lease.take(spark, idxD, "in-flight-append")
      val e4 = intercept[IllegalStateException](
        Dedup.appendToDecontamIndex(spark, idxD, extra, "text"))
      assert(e4.getMessage.contains("MAINTENANCE"), e4.getMessage)
      val e5 = intercept[IllegalStateException](
        Dedup.contaminationReportFromIndex(spark, idxD, extra,
          "doc_id", "text").count())
      assert(e5.getMessage.contains("MAINTENANCE"), e5.getMessage)
      graft.ops.Lease.release(spark, idxD)
      Dedup.appendToDecontamIndex(spark, idxD, extra, "text")
      assert(!java.nio.file.Files.exists(dirD.resolve("_MAINTENANCE")),
        "decontam append must release its lease")
      assert(Dedup.contaminationReportFromIndex(spark, idxD, extra,
        "doc_id", "text").count() > 0)
    } finally {
      Seq(dirW, dirD).foreach(d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p)))
      Dedup.unpersistIntermediates()
    }
  }

  test("winnowing: brute-force replay, shared-substring guarantee, pairs") {
    import spark.implicits._
    val real = docs.limit(80)
    val got = Dedup.winnowFingerprints(real, "doc_id", "text", n = 5, w = 4)
      .collect().map(r => (r.getLong(0),
        r.getLong(r.fieldIndex("pos")).toInt,
        r.getLong(r.fieldIndex("fp")))).toSet
    // brute force with the same xxhash leaf computed via Spark (leaf parity)
    val hashed = real.select(col("doc_id"),
        expr("transform(sequence(1, greatest(size(split(trim(lower(text)), '\\\\s+')) - 4, 0)), " +
          "i -> xxhash64(concat_ws(' ', slice(split(trim(lower(text)), '\\\\s+'), i, 5))))").as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expect = hashed.flatMap { case (id, h) =>
      val sels = scala.collection.mutable.Set[Int]()
      if (h.size >= 4) {
        for (i <- 0 to h.size - 4) {
          val win = h.slice(i, i + 4)
          val mn = win.min
          sels += i + win.lastIndexOf(mn)
        }
      } else if (h.nonEmpty) sels += h.lastIndexOf(h.min)
      sels.map(p => (id, p, h(p)))
    }.toSet
    assert(got == expect, s"got ${got.size} vs expect ${expect.size}")

    // guarantee: two docs sharing a (w+n-1)=8-token run share a fingerprint
    val planted = Seq(
      (900L, "aa bb cc dd ee ff gg hh xx yy zz qq ww rr tt uu"),
      (901L, "one two three aa bb cc dd ee ff gg hh four five six seven eight")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(planted, "doc_id", "text", n = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("fp")))
    val shared = fps.filter(_._1 == 900L).map(_._2).toSet
      .intersect(fps.filter(_._1 == 901L).map(_._2).toSet)
    assert(shared.nonEmpty, "8-token shared run must yield a shared fp")

    val pairs = Dedup.winnowPairs(planted, "doc_id", "text", n = 5, w = 4,
      minShared = 1).collect()
    assert(pairs.exists(r => r.getLong(0) == 900L && r.getLong(1) == 901L))
  }

  test("winnowVerifyPairs: longest shared token run, exact on planted spans") {
    import spark.implicits._
    // 910/911 share exactly tokens "aa..hh" (8 tokens); 912 shares the same
    // 8 tokens with 910 but SPLIT 4+4 at different offsets (runs of 4 < n=5
    // never even form a shared gram); 913 shares a long 12-token passage
    val planted = Seq(
      (910L, "aa bb cc dd ee ff gg hh xx yy zz qq ww rr tt uu"),
      (911L, "one two three aa bb cc dd ee ff gg hh four five six seven eight"),
      (912L, "aa bb cc dd p1 p2 p3 ee ff gg hh p4 p5 p6 p7 p8"),
      (913L, "pre1 aa bb cc dd ee ff gg hh xx yy zz qq post1 post2 post3")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(planted, "doc_id", "text", n = 5, w = 4,
      minShared = 1)
    val graded = Dedup.winnowVerifyPairs(planted, "doc_id", "text", pairs,
        n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getLong(r.fieldIndex("run_tokens"))).toMap
    // 910~911: the 8-token copy = 4 consecutive 5-gram matches -> 4+5-1 = 8
    assert(graded((910L, 911L)) == 8L, graded.toString)
    // 910~913: 12 consecutive shared tokens -> run_tokens = 12
    assert(graded((910L, 913L)) == 12L, graded.toString)
    // 912's fragmented overlap has no 5-token run with 910: if fingerprint
    // hash-collisions ever paired them, the grade must stay 0 — and with
    // no shared gram the pair must simply be absent
    assert(!graded.contains((910L, 912L)) || graded((910L, 912L)) == 0L)
    // every winnowPairs candidate row survives with its n_shared intact
    assert(graded.keySet ==
      pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("fleschKincaid: hand-computed grade on a pinned sentence") {
    import spark.implicits._
    // 5 words, 2 sentences, vowel groups: he-llo(2)+world(1)+this(1)+is(1)+fun(1)=6
    val d = Seq((1L, "Hello world. This is fun!")).toDF("id", "text")
    val fk = d.select(TextFns.fleschKincaid(col("text"))).collect()(0).getDouble(0)
    val expect = 0.39 * (5.0 / 2) + 11.8 * (6.0 / 5) - 15.59
    assert(math.abs(fk - expect) < 1e-12, s"$fk vs $expect")
  }

  test("spanCorrupt: sentinel numbering, target pairing, exact reconstruction, determinism") {
    val sel = docs.limit(60).withColumn("sc",
        TextFns.spanCorrupt(col("text"), col("doc_id"), rateBp = 1500))
      .select(col("doc_id"), col("text"), col("sc.input").as("i"),
        col("sc.target").as("t"))
    val out = sel.collect()
    var masked = 0L; var total = 0L
    out.foreach { r =>
      val toks = r.getString(1).trim.toLowerCase.split("\\s+").toSeq
      val inp = r.getString(2).split(" ").toSeq.filter(_.nonEmpty)
      val tgtToks = r.getString(3).split(" ").toSeq.filter(_.nonEmpty)
      val inpSents = inp.filter(_.startsWith("<extra_id_"))
      inpSents.zipWithIndex.foreach { case (s, k) =>
        assert(s == s"<extra_id_$k>", s"sentinels must number in order: $inp")
      }
      assert(tgtToks.filter(_.startsWith("<extra_id_")) == inpSents,
        "target sentinels must mirror input's")
      // split target into spans keyed by sentinel
      val spans = scala.collection.mutable.Map[String, Vector[String]]()
      var cur: String = null
      tgtToks.foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Vector() }
        else spans(cur) = spans(cur) :+ t
      }
      spans.values.foreach(s => assert(s.nonEmpty, "every span holds >=1 token"))
      val rebuilt = inp.flatMap(t =>
        if (t.startsWith("<extra_id_")) spans(t) else Seq(t))
      assert(rebuilt == toks, s"doc ${r.getLong(0)} must reconstruct")
      masked += toks.size - (inp.size - inpSents.size); total += toks.size
    }
    // coin rate ~15%
    assert(masked.toDouble / total > 0.08 && masked.toDouble / total < 0.25,
      s"mask rate ${masked.toDouble / total}")
    TestSpark.assertSameRows(sel, sel, "deterministic replay")
  }

  test("duplicateSpanStats/maskDuplicateSpans: hand-checked spans, brute-force parity") {
    import spark.implicits._
    // doc 1 and 2 share tokens 0-5 ("a b c d e f"); doc 3 repeats its own
    // 0-3 at 4-7; doc 4 is clean; doc 5 is shorter than n
    val d = Seq(
      (1L, "a b c d e f p q r s"),
      (2L, "a b c d e f x y z w"),
      (3L, "k l m n k l m n t u"),
      (4L, "one two three four five six seven eight nine ten"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
    val n = 4
    val st = Dedup.duplicateSpanStats(d, "doc_id", "text", n = n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // docs 1/2: grams at 0,1,2 shared -> covered 0..5 = 6 tokens, 1 span
    assert(st(1L) == (10L, 6L, 1L, 6000L), s"doc1 $st")
    assert(st(2L) == (10L, 6L, 1L, 6000L))
    // doc 3: gram "k l m n" at 0 and 4 -> covered 0..7 = 8 tokens, 1 span
    assert(st(3L) == (10L, 8L, 1L, 8000L))
    assert(st(4L) == (10L, 0L, 0L, 0L))
    assert(st(5L) == (2L, 0L, 0L, 0L))

    val masked = Dedup.maskDuplicateSpans(d, "doc_id", "text", n = n)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    assert(masked(1L) == "p q r s")
    assert(masked(2L) == "x y z w")
    assert(masked(3L) == "t u")
    assert(masked(4L) == "one two three four five six seven eight nine ten")
    assert(masked(5L) == "tiny doc")

    // brute-force parity on real data: covered tokens via per-position scan
    val real = docs.limit(120)
    val stats = Dedup.duplicateSpanStats(real, "doc_id", "text", n = 5)
    val toks = real.collect().map(r =>
      r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text")).trim.toLowerCase
          .split("\\s+").toSeq).toMap
    val gramCount = scala.collection.mutable.Map[Seq[String], Int]()
    toks.values.foreach(ws => ws.sliding(5).filter(_.size == 5)
      .foreach(g => gramCount(g.toVector) = gramCount.getOrElse(g.toVector, 0) + 1))
    stats.collect().foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val ws = toks(id)
      val covered = scala.collection.mutable.Set[Int]()
      ws.sliding(5).zipWithIndex.filter(_._1.size == 5).foreach { case (g, i) =>
        if (gramCount(g.toVector) >= 2) covered ++= (i until i + 5)
      }
      assert(r.getLong(r.fieldIndex("dup_tok")) == covered.size.toLong,
        s"doc $id dup_tok")
      val spans = covered.toSeq.sorted
        .foldLeft((0, -2)) { case ((c, prev), p) =>
          (if (p == prev + 1) c else c + 1, p) }._1
      assert(r.getLong(r.fieldIndex("dup_spans")) == spans.toLong, s"doc $id spans")
    }
  }

  test("leakSafeSplit: no near-dup pair straddles the train/heldout boundary") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5)
    assert(pairs.count() > 0, "testdata should contain near-dup documents")
    val split = Dedup.leakSafeSplit(docs, "doc_id", pairs,
      trainParts = 8, denom = 10).select("doc_id", "split").cache()
    // both sides of every pair share a split
    val s1 = split.withColumnRenamed("doc_id", "id_a")
      .withColumnRenamed("split", "sa")
    val s2 = split.withColumnRenamed("doc_id", "id_b")
      .withColumnRenamed("split", "sb")
    val straddling = pairs.join(s1, "id_a").join(s2, "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling == 0L)
    // every row is assigned, and both splits are nonempty at 8/10
    val byS = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.values.sum == docs.count())
    assert(byS.getOrElse("train", 0L) > 0L && byS.getOrElse("heldout", 0L) > 0L)
    // deterministic: a re-run assigns identically
    val again = Dedup.leakSafeSplit(docs.repartition(7), "doc_id", pairs,
      trainParts = 8, denom = 10).select("doc_id", "split")
    TestSpark.assertSameRows(split, again)
    split.unpersist()
    Dedup.unpersistIntermediates()
  }

  test("semanticDedup: planted near-identical copies resolve to min-id survivors") {
    val pert = emb
      .withColumn("vec_id", col("vec_id") + 1000000)
      .withColumn("embedding",
        transform(col("embedding"), x => x * 1.001 + 0.0001))
    val both = emb.unionByName(pert)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x * 1000000.0).cast("double")).as("qv"))
    val n = emb.count()
    val survivors = Dedup.semanticDedup(both, "vec_id", "qv",
        k = 16, iters = 1, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every (v, v+1e6) pair is same-cluster (near-identical vectors share an
    // argmin) and far above the cosine bar -> exactly the originals survive
    assert(survivors.size.toLong == n, s"${survivors.size} of ${2 * n}")
    assert(survivors.forall(_ < 1000000), "canonical = min id of each pair")
    // partition invariance: the sample is a pure function of the data
    val repart = Dedup.semanticDedup(both.repartition(13), "vec_id", "qv",
        k = 16, iters = 1, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(repart == survivors)
    // hot-cluster guard: a cap below every cluster size excludes all
    // clusters from pair generation -> nothing is identified as duplicate
    val guarded = Dedup.semanticDedup(both, "vec_id", "qv",
      k = 16, iters = 1, threshold = 0.999, maxCluster = 1)
    assert(guarded.count() == 2 * n)
    Dedup.unpersistIntermediates()
  }

  test("semanticDedup pathological corpus: DEFAULT guard bounds candidates; drops reported") {
    import spark.implicits._
    // embedding collapse: every vector identical -> k-means puts ALL rows in
    // one cluster. The default maxCluster must protect a default-args call:
    // the degenerate cluster is excluded (no size^2 pair blowup — nothing
    // is deduped, nothing hangs), and semanticDedupDropped reports it
    // instead of the loss staying silent.
    val n = 20001L  // one over the 10k default cap, kept cheap
    val collapsed = spark.range(n).select(col("id").as("vec_id"),
      array(lit(1.0), lit(2.0), lit(3.0), lit(4.0)).as("qv"))
    val survivors = Dedup.semanticDedup(collapsed, "vec_id", "qv",
      k = 4, iters = 1, threshold = 0.999)
    assert(survivors.count() === n,
      "the guarded cluster must be excluded wholesale, not paired")
    val dropped = Dedup.semanticDedupDropped(collapsed, "vec_id", "qv",
      k = 4, iters = 1).collect()
    assert(dropped.length === 1 &&
      dropped(0).getAs[Long]("n_rows") === n,
      s"expected one dropped cluster of $n rows: ${dropped.toSeq}")
    // below the cap the same corpus pairs normally: all dupes resolve to
    // the min id (maxCluster raised above n)
    val small = collapsed.filter(col("vec_id") < 50)
    val resolved = Dedup.semanticDedup(small, "vec_id", "qv",
      k = 1, iters = 1, threshold = 0.999)
    assert(resolved.count() === 1L)
    assert(Dedup.semanticDedupDropped(small, "vec_id", "qv",
      k = 1, iters = 1).isEmpty)
    Dedup.unpersistIntermediates()
  }

  test("winnowFingerprints one-pass expression == composed reference form, " +
      "both leaves, adversarial texts") {
    import spark.implicits._
    // the fast path fires on the two standard leaves; wrapping the leaf in
    // concat(c, '') defeats detection WITHOUT changing any hash value, so
    // the same call runs the composed transform chain — the differential
    val md5Fast = (c: org.apache.spark.sql.Column) =>
      graft.ops.Sketch.portableHash(c)
    val md5Slow = (c: org.apache.spark.sql.Column) =>
      graft.ops.Sketch.portableHash(concat(c, lit("")))
    val xxFast = (c: org.apache.spark.sql.Column) => xxhash64(c)
    val xxSlow = (c: org.apache.spark.sql.Column) => xxhash64(concat(c, lit("")))
    val adversarial = Seq(
      (1001L, ""), (1002L, "   "), (1003L, "\t\n  \t"),
      (1004L, "one"), (1005L, "one two three four"),
      (1006L, "one two three four five"),
      (1007L, "one two three four five six"),
      (1008L, "x x x x x x x x x x x x"),          // all-equal gram hashes
      (1009L, "a  b\tc   d\ne f g h i j"),          // mixed whitespace
      (1010L, "Zürich CAFÉ Straße MIXED case Tokens emoji 🙂 ok fine"),
      (1011L, "a b a b a b a b a b a b a b")        // periodic ties
    ).toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").unionByName(adversarial)
    for ((n, w) <- Seq((5, 4), (3, 2), (2, 5));
         (fast, slow) <- Seq((md5Fast, md5Slow), (xxFast, xxSlow))) {
      val f = Dedup.winnowFingerprints(corpus, "doc_id", "text", n, w, fast)
      val g = Dedup.winnowFingerprints(corpus, "doc_id", "text", n, w, slow)
      // fast path must actually plan the one-pass expression
      assert(f.queryExecution.executedPlan.toString.contains("winnow_fps"),
        s"n=$n w=$w: expected the WinnowFps expression in the fast plan")
      assert(!g.queryExecution.executedPlan.toString.contains("winnow_fps"),
        s"n=$n w=$w: the wrapped leaf must keep the composed path")
      TestSpark.assertSameRows(f, g)
    }
  }
}
