package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DYNAMIC half of the scale gate — the complement to PlanAuditSpec's
  * static plan-shape lint. PlanAudit proves a plan has no cartesian /
  * nested-loop / global-window SHAPE; it cannot see a candidate generator
  * that is linear in plan shape but quadratic under the DATA (the class of
  * bug the hot-bucket guards exist for). This spec measures each
  * pair-generating family's CANDIDATE VOLUME — the exact number of pair
  * comparisons its bucket join performs, computed from bucket sizes
  * (Σ C(size, 2)), never by enumerating pairs — at sf0.001 / sf0.01 /
  * sf0.1, and fails if growth between adjacent SFs exceeds the family's
  * DECLARED complexity in the measured base-table growth. Row counts are
  * deterministic: no bench noise, no timing flake.
  *
  * Exemption discipline (PlanAuditSpec-style): every family carries an
  * explicit expected-growth exponent with a justification. Exponent 1.0 is
  * the default contract — candidates ∝ corpus size. The two exponent-2.0
  * entries are techniques whose candidate mass is HONESTLY quadratic on
  * shared-key-heavy data (each with the guard that operationally bounds
  * it); for those the gate still catches a WORSE-than-design regression
  * (e.g. the guard silently disabled), and a separate test proves the
  * guard is live by tightening it.
  */
class ScalingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfs = Seq("0.001", "0.01", "0.1")
  private def docs(sf: String): DataFrame =
    spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
  private def emb(sf: String): DataFrame =
    spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000.0).cast("double")).as("qv"))
  private def ph = ops.Sketch.portableHash(col("vec_id").cast("string"))

  /** A gated family: its candidate volume at one SF, the base relation's
    * row count at that SF, the declared growth exponent, and why.
    */
  private case class Family(
      name: String,
      exponent: Double,
      justification: String,
      baseRows: String => Long,
      volume: String => Long)

  // growth slack on top of the declared exponent: absorbs constant-factor
  // effects (doc-length mix, band collision luck) without admitting a
  // jump in complexity class — a linear family gone quadratic over the
  // 10× docs step would show 10× the allowed growth, far past any slack
  private val SLACK = 3.0

  private def vol(df: DataFrame): Long = df.head().getLong(0)
  private val nDocs: String => Long = sf => docs(sf).count()
  private val nEmb: String => Long = sf => emb(sf).count()

  private val families = Seq(
    Family("minhash-lsh-bands", 1.0,
      "near-dups collide in a band bucket, unrelated docs spread over " +
        "2^64 keys: bucket sizes track dup-cluster sizes, not corpus size",
      nDocs,
      sf => vol(ml.Dedup.lshCandidateVolume(
        ml.Dedup.minhashSignatures(docs(sf), "doc_id", "text")))),
    Family("winnow-fingerprints", 1.0,
      "winnowed fps are a ~2/(w+1) gram sample; the maxDf guard drops " +
        "boilerplate fps, so shared-fp mass tracks real shared spans",
      nDocs,
      sf => vol(ml.Dedup.winnowCandidateVolume(docs(sf), "doc_id", "text"))),
    Family("ivf-pq-routing", 1.0,
      "a FIXED query set probes nProbe/nCentroids of the corpus: " +
        "candidates = Σ_c items(c)·probes(c) ∝ corpus rows",
      nEmb,
      sf => ml.Pq.routedCandidates(emb(sf), emb(sf).filter(col("vec_id") < 5),
        "vec_id", "qv", nCentroids = 8, nProbe = 4,
        centroidHash = Some(ph)).count()),
    Family("semantic-dedup-clusters", 1.0,
      "the SemDeDup contract: with k ∝ n, within-cluster pairs are " +
        "O(n²/k) = O(n); the gate scales k with the measured corpus size " +
        "exactly as a production run must",
      nEmb,
      sf => {
        val e = emb(sf)
        val k = math.max(8, (e.count() / 32).toInt)
        vol(ml.Dedup.semanticDedupCandidateVolume(e, "vec_id", "qv",
          k = k, iters = 1, initHash = Some(ph)))
      }),
    Family("knn-join-buckets", 1.0,
      "a FIXED query set's probe rows meet guarded corpus bucket rows on " +
        "(table, sig): candidates = Σ_b queries(b)·items(b); with hashed " +
        "12-bit signatures the corpus spreads over 4096 buckets per " +
        "table, so for fixed queries the sum is ∝ corpus rows",
      nEmb,
      sf => vol(ml.Similarity.knnJoinCandidateVolume(
        emb(sf).filter(col("vec_id") < 5), emb(sf), dim = 64,
        vecCol = "qv"))),
    Family("embed-banded-lsh", 2.0,
      "EXEMPT from the linear contract: band keys are rowsPerBand(=7)-bit, " +
        "so an ISOTROPIC corpus collides at rate n²/128 by DESIGN — the " +
        "banding is constant-factor thinning plus a recall knob, and the " +
        "maxBucket guard is the operational bound (proven live below). " +
        "The quadratic ceiling still fails a guard-disabled regression",
      nEmb,
      sf => vol(ml.Dedup.embeddingBandedCandidateVolume(emb(sf),
        "vec_id", "qv", dim = 64))),
    Family("simhash-chunks", 2.0,
      "EXEMPT from the linear contract: chunk keys are (64/(d+1))-bit, so " +
        "unrelated docs collide at rate n²/2^width by DESIGN — the " +
        "maxBucket guard is the operational bound (proven live below). " +
        "The quadratic ceiling still fails a guard-disabled regression",
      nDocs,
      sf => vol(ml.Dedup.simhashCandidateVolume(docs(sf), "doc_id", "text",
        maxDist = 7)))
  )

  test("candidate volume grows within each family's declared complexity " +
      "across sf0.001 -> sf0.01 -> sf0.1") {
    for (fam <- families) {
      val measured = sfs.map(sf => (sf, fam.baseRows(sf), fam.volume(sf)))
      ml.Dedup.unpersistIntermediates()
      // the gate must never pass vacuously on an empty candidate relation
      assert(measured.last._3 > 0,
        s"${fam.name}: zero candidates at sf0.1 — the family under test " +
          "generated nothing; the growth assertion would be vacuous")
      for (Seq((sf1, n1, c1), (sf2, n2, c2)) <- measured.sliding(2)) {
        val dataGrowth = n2.toDouble / n1
        // max(c1, 32) floors tiny baselines so integer noise on a
        // near-empty relation can't fabricate a huge ratio
        val allowed = SLACK * math.pow(dataGrowth, fam.exponent) *
          math.max(c1, 32L)
        assert(c2 <= allowed,
          s"${fam.name}: candidate volume grew SUPER-${if (fam.exponent == 1.0)
            "LINEARLY" else "QUADRATICALLY"} between sf$sf1 and sf$sf2: " +
            s"$c1 -> $c2 candidates while base rows grew $n1 -> $n2 " +
            s"(allowed ≤ ${allowed.toLong}). Justification on file: " +
            fam.justification)
      }
    }
  }

  test("ppjoin prefix filter: candidate volume stays a small fraction of " +
      "the full inverted-index volume, and cannot grow faster than it") {
    // PPJoin's candidate mass is NOT linear in n on a saturating-vocabulary
    // corpus (a fixed vocab makes every 3-gram's df ∝ n, so Σ C(df, 2) is
    // quadratic for the FULL index and the prefix subset alike — true
    // near-dup pairs here grow linearly, the collision mass is the corpus's
    // doing). The scalable claim the technique actually makes is RELATIVE:
    // indexing only the (1−t)-prefix shrinks the same-shingle term by
    // ~(1−t)² (~25× at t=0.8). Gate that ratio, and gate that the prefix
    // term never grows FASTER than the full term (a broken prefix filter
    // degenerates to the full index and fails both).
    val measured = sfs.map { sf =>
      val d = docs(sf)
      val full = vol(ml.Dedup.jaccardInvertedCandidateVolume(d, "doc_id",
        "text", n = 3, maxDf = 1000))
      val pref = vol(ml.Dedup.jaccardPrefixCandidateVolume(d, "doc_id",
        "text", n = 3, threshold = 0.8, maxDf = 1000))
      ml.Dedup.unpersistIntermediates()
      (sf, full, pref)
    }
    assert(measured.last._3 > 0,
      "zero prefix candidates at sf0.1 — vacuous gate")
    // the pruning-power invariant, asserted at EVERY SF big enough for the
    // ratio to be meaningful. A cross-SF growth coupling would be the
    // wrong gate here: at tiny SFs the rare-first prefix ordering picks
    // df=1 shingles (zero pairs each), suppressing the baseline — the
    // prefix volume then "grows faster" than the full index purely by
    // catching up to its asymptotic share, not by losing pruning power.
    for ((sf, full, pref) <- measured if full >= 1000) {
      assert(pref.toDouble / full <= 0.125,
        s"ppjoin prefix volume is no longer a small fraction of the full " +
          s"inverted index at sf$sf: $pref of $full — the prefix filter " +
          "has lost its pruning power")
    }
  }

  test("the quadratic-exempt families' guards are LIVE: tightening the " +
      "guard strictly shrinks sf0.1 candidate volume") {
    val d = docs("0.1")
    // simhash: maxBucket 10000 (default) vs 64 — big chunks must be dropped
    val simLoose = vol(ml.Dedup.simhashCandidateVolume(d, "doc_id", "text",
      maxDist = 7))
    val simTight = vol(ml.Dedup.simhashCandidateVolume(d, "doc_id", "text",
      maxDist = 7, maxBucket = 64))
    assert(simTight < simLoose,
      s"simhash maxBucket guard had no effect at sf0.1 ($simTight vs $simLoose)")
    // a 64-cap bound the volume obeys exactly when the guard works:
    // every surviving bucket contributes ≤ C(64, 2)
    val simBuckets = 8L * (1L << 8) // maxDist=7 -> 8 chunks of 8 bits
    assert(simTight <= simBuckets * (64L * 63 / 2),
      "simhash tight-guard volume exceeds the per-bucket cap arithmetic")
    // ppjoin: the df guard drops saturated shingles — tightening it to a
    // df cap BELOW the corpus's common-phrase frequency must cut volume
    val prefLoose = vol(ml.Dedup.jaccardPrefixCandidateVolume(d, "doc_id",
      "text", n = 3, threshold = 0.8, maxDf = 1000))
    val prefTight = vol(ml.Dedup.jaccardPrefixCandidateVolume(d, "doc_id",
      "text", n = 3, threshold = 0.8, maxDf = 4))
    assert(prefTight < prefLoose,
      s"ppjoin maxDf guard had no effect at sf0.1 ($prefTight vs $prefLoose)")
    // banded embedding LSH: 7-bit band keys hold ~n/128 isotropic vectors
    // each — a maxBucket below that mean must drop buckets, and the
    // surviving volume obeys the per-bucket cap arithmetic exactly
    val e = emb("0.1")
    val bandLoose = vol(ml.Dedup.embeddingBandedCandidateVolume(e,
      "vec_id", "qv", dim = 64))
    val bandTight = vol(ml.Dedup.embeddingBandedCandidateVolume(e,
      "vec_id", "qv", dim = 64, maxBucket = 32))
    assert(bandTight < bandLoose,
      s"banded-LSH maxBucket guard had no effect at sf0.1 " +
        s"($bandTight vs $bandLoose)")
    val bandBuckets = 8L * (1L << 7) // 8 bands x 7-bit keys
    assert(bandTight <= bandBuckets * (32L * 31 / 2),
      "banded-LSH tight-guard volume exceeds the per-bucket cap arithmetic")
    ml.Dedup.unpersistIntermediates()
  }
}
