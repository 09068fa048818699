package graft.sinks

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.ConcurrentModificationException

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.internal.Logging

/** Cross-driver write exclusion for a block store root.
  *
  * The in-JVM commit lock ([[GraftBlocksLog.lockFor]]) serializes commits
  * within ONE driver; nothing stopped a second Spark application pointed
  * at the same store from interleaving commits and double-committing keys
  * (the reference's DynamoDB conditional puts serialize any writer —
  * store_notion_blocks.py:128-150). This closes that gap with an
  * atomic-create lease file:
  *
  * {{{ _graft_log/_lease   line 1: owner id, line 2: heartbeat millis }}}
  *
  *  - First `fs.create(..., overwrite = false)` wins — Hadoop's exclusive
  *    create is atomic on every filesystem this project targets.
  *  - The owning driver renews at every commit by REWRITING the lease
  *    with a fresh body timestamp. `FileSystem.setTimes` is deliberately
  *    not used: its Hadoop base-class default is a silent no-op and
  *    object-store implementations (e.g. S3A) don't override it, so an
  *    mtime-touch heartbeat would never advance there and a live lease
  *    would look abandoned after expiry. The rewrite produces a new file
  *    object (mtime advances everywhere) AND carries the explicit
  *    timestamp for filesystems with coarse or unreliable mtime; liveness
  *    is judged on `max(mtime, body timestamp)`.
  *  - A renewal first checks the lease's own age: if the owner failed to
  *    heartbeat within the expiry (GC pause, network partition), its
  *    lease may have been legitimately stolen, so it must fail loudly
  *    rather than overwrite a potential new owner's lease.
  *  - A different live owner → `ConcurrentModificationException`, loudly,
  *    before any store mutation.
  *  - A lease older than the expiry is considered abandoned (crashed
  *    driver) and is stolen; the exclusive create arbitrates racing
  *    stealers, the loser re-reads and fails on the winner's live lease.
  *
  * Ownership persists across commits (a driver owns a store for its
  * lifetime, matching the documented single-driver model); `release` is
  * for deliberate hand-off, and a driver that shuts down cleanly SHOULD
  * call it — one that exits without releasing leaves the store locked to
  * other drivers for up to `expiryMs`. The steal path assumes expiry >>
  * the gap between a reader's staleness check and its delete — with the
  * default 10-minute expiry against per-commit heartbeats this holds by
  * orders of magnitude.
  */
object GraftStoreLease extends Logging {
  val DefaultExpiryMs: Long = 10 * 60 * 1000L
  /** This JVM's writer identity — one per driver process. */
  lazy val jvmOwnerId: String = java.util.UUID.randomUUID().toString

  def leaseFile(root: Path): Path =
    new Path(GraftBlocksLog.logDir(root), "_lease")

  /** (ownerId, heartbeatMillis) of the current lease, if any, where the
    * heartbeat is `max(mtime, body timestamp)`. A just-created lease
    * whose owner id is not yet written reads as a live foreign owner ""
    * (refusing is correct: someone IS mid-acquire/mid-renewal); a lease
    * deleted by a racing stealer between the exists check and the open
    * reads as None (the caller's retry loop re-arbitrates). */
  def currentOwner(fs: FileSystem, root: Path): Option[(String, Long)] = {
    val f = leaseFile(root)
    if (!fs.exists(f)) return None
    try {
      val st = fs.getFileStatus(f)
      val in = new BufferedReader(new InputStreamReader(fs.open(f), UTF_8))
      try {
        val owner = Option(in.readLine()).getOrElse("").trim
        val bodyTs = Option(in.readLine()).map(_.trim)
          .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
        Some((owner, math.max(st.getModificationTime, bodyTs)))
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  private def writeLease(fs: FileSystem, f: Path, ownerId: String,
      overwrite: Boolean): Unit = {
    val out = fs.create(f, overwrite)
    try {
      try out.write(s"$ownerId\n${System.currentTimeMillis()}".getBytes(UTF_8))
      finally out.close() // buffered streams surface IO failures at close
    } catch {
      case e: Throwable =>
        // a half-written lease (created but body lost — including a
        // close()-time flush failure) would read as a live foreign
        // owner "" and lock EVERY driver out until expiry: remove the
        // husk before surfacing the failure
        try fs.delete(f, false)
        catch { case t: Throwable => e.addSuppressed(t) }
        throw e
    }
  }

  /** Steal guard: re-read immediately before deleting, and delete only
    * if the lease still shows the (owner, heartbeat) the caller decided
    * on — narrows the read→delete ABA window (a thief completing its
    * exclusive create in between) to a single round-trip. The residual
    * window is the documented expiry >> check-to-delete-gap assumption. */
  private def deleteIfUnchanged(fs: FileSystem, root: Path,
      owner: String, hb: Long): Unit =
    currentOwner(fs, root) match {
      case Some((o, h)) if o == owner && h == hb =>
        fs.delete(leaseFile(root), false)
      case _ => () // changed under us — the retry loop re-arbitrates
    }

  /** Acquire or renew the store lease for `ownerId`. Throws
    * [[ConcurrentModificationException]] when a different owner holds a
    * live (unexpired) lease, or when this owner's own lease has expired
    * (it may have been stolen; overwriting would clobber the thief). */
  def acquire(fs: FileSystem, root: Path,
      ownerId: String = jvmOwnerId,
      expiryMs: Long = DefaultExpiryMs): Unit = {
    val f = leaseFile(root)
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      currentOwner(fs, root) match {
        case Some((owner, hb)) if owner == ownerId =>
          if (System.currentTimeMillis() - hb > expiryMs) {
            // our own lease expired (commit gap, GC pause). The read
            // above shows it STILL bears our id, so nobody has stolen it
            // yet — but a thief may be mid-steal, so do NOT renew in
            // place: go through the same delete + exclusive-create
            // arbitration as a foreign steal. A permanent refusal here
            // would wedge an idle-but-healthy driver forever.
            logWarning(s"graft-blocks: own lease on $root expired " +
              s"${System.currentTimeMillis() - hb} ms ago; re-acquiring " +
              "via steal arbitration")
            deleteIfUnchanged(fs, root, owner, hb)
          } else {
            // heartbeat: rewrite-in-place. A concurrent foreign reader
            // that catches a partial body sees a fresh mtime and refuses
            // — the unsafe direction (live lease judged expired) cannot
            // happen.
            writeLease(fs, f, ownerId, overwrite = true)
            return
          }
        case Some((owner, hb))
            if System.currentTimeMillis() - hb <= expiryMs =>
          throw new ConcurrentModificationException(
            s"graft-blocks: store $root is lease-held by writer $owner " +
              s"(heartbeat ${System.currentTimeMillis() - hb} ms ago); " +
              "a store accepts one driver at a time — release the lease " +
              "or wait for expiry")
        case Some((owner, hb)) =>
          logWarning(s"graft-blocks: stealing expired lease of $owner on $root")
          deleteIfUnchanged(fs, root, owner, hb) // create below arbitrates
        case None => ()
      }
      fs.mkdirs(f.getParent)
      try {
        writeLease(fs, f, ownerId, overwrite = false) // atomic exclusive create
        return
      } catch {
        case _: java.io.IOException => () // lost the create race; re-read
      }
    }
    throw new ConcurrentModificationException(
      s"graft-blocks: could not acquire lease on $root after $attempts attempts")
  }

  /** Deliberate hand-off; no-op if `ownerId` does not hold the lease. */
  def release(fs: FileSystem, root: Path,
      ownerId: String = jvmOwnerId): Unit =
    currentOwner(fs, root) match {
      case Some((owner, _)) if owner == ownerId =>
        fs.delete(leaseFile(root), false)
      case _ => ()
    }
}
