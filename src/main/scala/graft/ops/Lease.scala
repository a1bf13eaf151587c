package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The single-writer MAINTENANCE LEASE shared by every persisted-index
  * writer — one implementation of the "run maintenance next to a paused
  * ingest" contract so the guarded artifacts cannot drift apart:
  * `<root>/_MAINTENANCE` is taken by a maintenance writer (index
  * compaction, slice append, shard resync) for its whole critical
  * section and checked by every other writer/prober on open, turning a
  * concurrent-writer race (an append landing in a directory the
  * maintenance swap is about to delete, or two appends computing the
  * same next partition seq and silently replacing each other's landed
  * data) into a LOUD refusal naming the holder.
  *
  * LIVENESS IS HEARTBEAT-BASED, not taken-at-based: [[withLease]] renews
  * the lease file on a daemon schedule (every `staleLeaseMs / 6`,
  * clamped to [1s, 60s]), and staleness is judged from the LAST RENEWAL
  * — a maintenance job legitimately running longer than the TTL keeps
  * its lease alive for as long as its JVM does, while a CRASHED holder
  * stops renewing and its lease is cleared on the next open after
  * `staleLeaseMs` of silence (the staged-swap discipline guarantees the
  * guarded artifact itself is intact after a crash, so clearing is
  * safe). The lease file records owner (pid@host), last-renewal and
  * taken-at epoch millis; files written by pre-heartbeat versions carry
  * only (owner, takenAt) and are judged from takenAt — strictly more
  * conservative.
  */
private[graft] object Lease {

  val LeaseFile = "_MAINTENANCE"

  /** Silence (no renewal) after which a lease is a crashed holder's
    * leftover. Mutable for tests (modeling a crashed holder without
    * waiting). A live [[withLease]] holder renews every ttl/6 (100s at
    * the default), so 10 minutes of silence means six consecutive missed
    * renewals — a dead or hopelessly stalled holder, not a long job:
    * heartbeating is what lets the TTL be minutes (bounded crash
    * recovery) instead of the pre-heartbeat 60 (a crashed holder used to
    * block the artifact for the whole worst-case-job bound). */
  @volatile var staleLeaseMs: Long = 10L * 60 * 1000

  private def leasePath(root: String) = new Path(s"$root/$LeaseFile")

  private def fsOf(spark: SparkSession, root: String) =
    leasePath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def owner: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName

  private def writeLease(spark: SparkSession, root: String,
                         takenAt: Long, overwrite: Boolean): Unit = {
    val out = fsOf(spark, root).create(leasePath(root), overwrite)
    try out.write(
      s"$owner\n${System.currentTimeMillis()}\n$takenAt\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Take the lease for `who`, failing loudly (via [[check]]) if a live
    * holder has it. A simultaneous-take race (two takers both passing the
    * check, one losing the create) re-raises the FRIENDLY lease message,
    * not the raw FileAlreadyExistsException. */
  def take(spark: SparkSession, root: String, who: String): Unit = {
    check(spark, root, who)
    try writeLease(spark, root, System.currentTimeMillis(),
      overwrite = false)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.PathExistsException =>
        // lost the check-then-create race to a concurrent taker: re-check
        // so the refusal names the winner (or, if the winner already
        // released/went stale, clear and retry once)
        check(spark, root, who)
        writeLease(spark, root, System.currentTimeMillis(),
          overwrite = false)
    }
  }

  /** Renew (heartbeat) a held lease: rewrite with a fresh last-renewal
    * stamp, preserving the original taken-at when readable. */
  def renew(spark: SparkSession, root: String): Unit = {
    val takenAt = readLease(spark, root).map(_._3)
      .getOrElse(System.currentTimeMillis())
    writeLease(spark, root, takenAt, overwrite = true)
  }

  def release(spark: SparkSession, root: String): Unit =
    fsOf(spark, root).delete(leasePath(root), false)

  /** (owner, renewedAt, takenAt) of the lease at `root`, if present.
    * Two-line files from pre-heartbeat versions use takenAt for both
    * stamps. `renewedAt` is the MAX of the embedded stamp and the file's
    * modification time: a renewal truncates-then-rewrites the file, so a
    * concurrent reader can catch it torn (empty/partial content) — the
    * mtime, updated atomically with the write, still proves the holder
    * renewed just now, and a LIVE lease is never misjudged stale off a
    * torn read (which would re-open exactly the clear-a-live-lease race
    * the heartbeat closes). */
  private def readLease(spark: SparkSession,
                        root: String): Option[(String, Long, Long)] = {
    val fs = fsOf(spark, root)
    val p = leasePath(root)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val mtime = scala.util.Try(fs.getFileStatus(p).getModificationTime)
      .getOrElse(0L)
    val lines = txt.linesIterator.toVector
    def num(i: Int): Option[Long] =
      lines.lift(i).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    val renewed = math.max(num(1).getOrElse(0L), mtime)
    Some((lines.headOption.getOrElse("?"), renewed,
      num(2).getOrElse(renewed)))
  }

  /** Fail loudly if a LIVE maintenance lease is present (renewed within
    * `staleLeaseMs`); silently clear a stale one (crashed holder — it
    * stopped heartbeating). Called by every guarded open. */
  def check(spark: SparkSession, root: String, who: String): Unit =
    readLease(spark, root).foreach { case (holder, renewedAt, takenAt) =>
      val silence = System.currentTimeMillis() - renewedAt
      if (silence < staleLeaseMs)
        throw new IllegalStateException(
          s"$who: artifact at $root is under MAINTENANCE (lease held by " +
            s"$holder for ${(System.currentTimeMillis() - takenAt) / 1000}s," +
            s" last renewed ${silence / 1000}s ago) — a maintenance " +
            "writer is replacing or appending partitions; a concurrent " +
            "write could land in a directory the swap deletes, or " +
            "collide on the same next partition seq. Retry after the " +
            "maintenance completes, or delete " +
            s"$root/$LeaseFile if the holder is known dead (a live " +
            s"holder renews at least every ${staleLeaseMs / 6 / 1000 + 1}s).")
      // stale: the holder crashed. The staged-swap / staging+rename
      // discipline left the artifact intact; clear and proceed.
      fsOf(spark, root).delete(leasePath(root), false)
    }

  /** ONE shared daemon scheduler for every lease heartbeat in the JVM —
    * [[withLease]] used to create and tear down a single-thread executor
    * per call, a thread spawn on every guarded ingest/append/compaction
    * (dozens per composite query). Heartbeats are tiny scheduled fs
    * writes; one thread serves them all. */
  private lazy val hbExec = {
    val e = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val t = new Thread(r, "graft-lease-heartbeat")
        t.setDaemon(true)
        t
      })
    // cancelled renewals must not linger in the queue until fire time
    e.setRemoveOnCancelPolicy(true)
    e
  }

  /** Run `body` holding the lease, with a daemon heartbeat renewing it
    * every `staleLeaseMs / 6` (clamped to [1s, 60s]) so a long-running
    * maintenance job is never mistaken for a crashed one, while a real
    * crash stops the renewals and the lease goes stale on schedule. */
  def withLease[T](spark: SparkSession, root: String, who: String)
                  (body: => T): T = {
    take(spark, root, who)
    val interval = math.min(math.max(staleLeaseMs / 6, 1000L), 60000L)
    val hb = hbExec.scheduleAtFixedRate(
      () => try renew(spark, root) catch { case _: Throwable => () },
      interval, interval, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      hb.cancel(false)
      release(spark, root)
    }
  }
}
