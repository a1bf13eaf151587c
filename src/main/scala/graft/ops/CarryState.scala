package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-consistent, replay-aware carry-state plumbing shared by the
  * ingest verbs ([[Scale.contextWindowsIngest]],
  * [[Scale.lengthBatchesIngest]], [[Scale.shardManifestIngest]],
  * [[graft.ml.Eval.eceMonitorIngest]]) — one implementation of the two
  * invariants every standing-state verb needs, so they cannot drift
  * apart:
  *
  *   1. ATOMIC SWAP WITH RECOVERY: state lives under
  *      `<statePath>/carry`, replaced by writing a full
  *      `<statePath>/carry.staging`, creating a `_COMMITTED` marker
  *      inside it, deleting the old carry, and renaming staging into
  *      place. On open, a leftover staging WITH the marker and NO carry
  *      is a completed-but-unpromoted swap (the crash window between
  *      delete and rename) and is promoted; a marker-less or shadowed
  *      staging is an incomplete write and is discarded — the intact
  *      carry (or absence of any state) stays authoritative.
  *
  *   2. REPLAY DETECTION: each commit's meta records the applied
  *      batch's id and content evidence (`last_batch_id`, `last_fp`,
  *      `last_n`). A batch arriving with the recorded id (the
  *      foreachBatch at-least-once recipe) — or, for callers without
  *      ids, with the recorded fingerprint and count — is a REPLAY:
  *      the verb re-emits its output instead of applying the batch
  *      twice. A recorded id presented with DIFFERENT content fails
  *      loudly (one batch id must name one batch).
  *
  * The verb owns everything else: its state relations, its meta schema
  * (which must include the three replay columns), and what "re-emit"
  * means (cumulative verbs report the current state; prefix-emitting
  * verbs retain the previous state to recompute the replayed output).
  */
private[graft] object CarryState {

  final class Handle(val fs: FileSystem, statePath: String) {
    val carry = new Path(s"$statePath/carry")
    val staging = new Path(s"$statePath/carry.staging")
    val marker = new Path(s"$statePath/carry.staging/_COMMITTED")
    val stagingDir: String = s"$statePath/carry.staging"
    def exists: Boolean = fs.exists(carry)
  }

  /** Open the state at `statePath`, running swap recovery first. */
  def open(spark: SparkSession, statePath: String): Handle = {
    val fs = new Path(statePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val h = new Handle(fs, statePath)
    if (fs.exists(h.staging)) {
      if (fs.exists(h.marker) && !fs.exists(h.carry))
        require(fs.rename(h.staging, h.carry), "carry-state recovery failed")
      else fs.delete(h.staging, true)
    }
    h
  }

  /** The last applied batch's (id, fingerprint, count) from a meta row
    * — (-1, 0, -1) when no state exists yet. */
  def lastApplied(meta: Option[org.apache.spark.sql.Row]): (Long, Long, Long) =
    meta match {
      case Some(m) => (m.getAs[Long]("last_batch_id"),
        m.getAs[Long]("last_fp"), m.getAs[Long]("last_n"))
      case None => (-1L, 0L, -1L)
    }

  /** Replay decision for the arriving batch (`verb` names the caller in
    * the failure message). Throws when a recorded batch id is presented
    * with different content. */
  def isReplay(verb: String, batchId: Long, fp: Long, n: Long,
               meta: Option[org.apache.spark.sql.Row]): Boolean =
    isReplay(verb, batchId, fp, n, lastApplied(meta))

  /** [[isReplay]] against an explicit (last_batch_id, last_fp, last_n)
    * triple — for verbs whose replay evidence is not a carry meta row
    * (e.g. [[graft.ml.Dedup.ingestDedup]] rides it in the appended index
    * partition itself, so evidence and state commit atomically). */
  def isReplay(verb: String, batchId: Long, fp: Long, n: Long,
               last: (Long, Long, Long)): Boolean = {
    val (lastBatchId, lastFp, lastN) = last
    if (batchId >= 0L && lastBatchId >= 0L) {
      if (batchId == lastBatchId) {
        require(fp == lastFp && n == lastN,
          if ((fp >>> 60) != (lastFp >>> 60))
            s"$verb: batchId $batchId was already applied, but its " +
              "recorded fingerprint was written under a DIFFERENT " +
              s"encoding version (${lastFp >>> 60} vs ${fp >>> 60}) — a " +
              "replay spanning a fingerprint-encoding upgrade cannot be " +
              "verified. Rebuild the state (or re-deliver the next fresh " +
              "batch) to re-arm after the upgrade."
          else
            s"$verb: batchId $batchId was already applied with DIFFERENT " +
              "content (fingerprint/count mismatch) — a batch id must " +
              "name one batch")
        true
      } else false
    } else {
      // CROSS-VERSION AMBIGUITY GUARD for id-less callers: tagged
      // fingerprints ([[Scale.tagContentFp]]) carry their encoding
      // version in the top nibble (pre-tag evidence reads back as
      // version 0 — the leaves are 60-bit, so aggregated fps never set
      // those bits). The one batch a version upgrade puts at risk is
      // the LAST pre-upgrade batch redelivered immediately after: its
      // re-encoded fp mismatches the recorded one while its row count
      // MATCHES, and treating it as fresh would silently collide it
      // with its own standing state (near-empty output). The version
      // nibble makes that case diagnosable without false positives: a
      // count match with a SAME-version fp mismatch is a genuinely
      // fresh batch (uniform chunk sizes are the NORM, not a
      // coincidence) and passes as fresh, while a count match across
      // DIFFERENT versions is the undecidable replay shape and fails
      // loudly. (An id-less MUTATED redelivery with an unchanged row
      // count remains indistinguishable from a fresh batch by design —
      // callers needing that guarantee pass an explicit batchId, the
      // documented foreachBatch recipe.)
      if (batchId < 0L && lastBatchId < 0L && lastN >= 0L &&
          n == lastN && (fp >>> 60) != (lastFp >>> 60))
        throw new IllegalArgumentException(
          s"$verb: an id-less batch arrived with the same row count " +
            s"($n) as the last applied batch, but the recorded " +
            s"fingerprint was written under a different encoding " +
            s"version (${lastFp >>> 60} vs ${fp >>> 60}) — replay " +
            "detection is blind across a fingerprint-encoding upgrade, " +
            "and if this batch is the last pre-upgrade batch redelivered, " +
            "applying it would silently collide it with its own standing " +
            "state. Pass an explicit batchId if this is genuinely a new " +
            "batch, or rebuild the state to re-arm after the upgrade.")
      batchId < 0L && lastN >= 0L && n == lastN && fp == lastFp
    }
  }

  /** Commit new state: clear staging, run `write` against the staging
    * directory (the caller writes ALL its relations there), mark it
    * committed, and swap it into place. */
  def commit(h: Handle)(write: String => Unit): Unit = {
    h.fs.delete(h.staging, true)
    write(h.stagingDir)
    h.fs.create(h.marker, true).close()
    h.fs.delete(h.carry, true)
    require(h.fs.rename(h.staging, h.carry), "carry-state swap failed")
  }

  /** Recovery for an arbitrary staged-replace target (the [[Handle]]
    * discipline applied to a directory that is not a carry root — e.g. a
    * persisted index's `sigs` relation under maintenance): a leftover
    * `<dir>.staging` WITH the marker and NO `<dir>` is a
    * completed-but-unpromoted [[replaceDir]] (the crash window between
    * delete and rename) and is promoted; a marker-less or shadowed
    * staging is an incomplete write and is discarded — the intact target
    * stays authoritative. Idempotent; call before every read of a
    * [[replaceDir]]-maintained directory. */
  def recoverDir(spark: SparkSession, dir: String): Unit = {
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir + ".staging")
    val marker = new Path(dir + ".staging/_COMMITTED")
    if (fs.exists(staging)) {
      if (fs.exists(marker) && !fs.exists(target))
        require(fs.rename(staging, target),
          "staged-replace recovery failed")
      else fs.delete(staging, true)
    }
  }

  /** Atomically replace `dir` with freshly written content: `write`
    * lands everything in `<dir>.staging`, the `_COMMITTED` marker seals
    * it, the old directory is deleted, and staging renames into place.
    * A crash anywhere leaves either the old directory intact or a
    * marker-sealed staging that [[recoverDir]] promotes — never a
    * half-written target. SINGLE-WRITER maintenance (an offline compactor
    * next to a paused ingest); not safe under concurrent writers. */
  def replaceDir(spark: SparkSession, dir: String)
                (write: String => Unit): Unit = {
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir + ".staging")
    val marker = new Path(dir + ".staging/_COMMITTED")
    fs.delete(staging, true)
    write(dir + ".staging")
    fs.create(marker, true).close()
    fs.delete(target, true)
    require(fs.rename(staging, target), "staged replace failed")
  }
}
