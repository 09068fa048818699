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
  * {{{ _graft_log/_lease   owner id in the body, heartbeat = mtime }}}
  *
  *  - First `fs.create(..., overwrite = false)` wins — Hadoop's exclusive
  *    create is atomic on every filesystem this project targets.
  *  - The owning driver renews by touching the mtime at every commit.
  *  - A different live owner → `ConcurrentModificationException`, loudly,
  *    before any store mutation.
  *  - A lease whose mtime is older than the expiry is considered
  *    abandoned (crashed driver) and is stolen; the exclusive create
  *    arbitrates racing stealers, the loser re-reads and fails on the
  *    winner's live lease.
  *
  * Ownership persists across commits (a driver owns a store for its
  * lifetime, matching the documented single-driver model); `release` is
  * for deliberate hand-off. The steal path assumes expiry >> the gap
  * between a reader's staleness check and its delete — with the default
  * 10-minute expiry against per-commit heartbeats this holds by orders
  * of magnitude.
  */
object GraftStoreLease extends Logging {
  val DefaultExpiryMs: Long = 10 * 60 * 1000L
  /** This JVM's writer identity — one per driver process. */
  lazy val jvmOwnerId: String = java.util.UUID.randomUUID().toString

  def leaseFile(root: Path): Path =
    new Path(GraftBlocksLog.logDir(root), "_lease")

  /** (ownerId, mtime) of the current lease, if any. A just-created
    * lease whose owner id is not yet written reads as a live foreign
    * owner "" (refusing is correct: someone IS mid-acquire); a lease
    * deleted by a racing stealer between the exists check and the open
    * reads as None (the caller's retry loop re-arbitrates). */
  def currentOwner(fs: FileSystem, root: Path): Option[(String, Long)] = {
    val f = leaseFile(root)
    if (!fs.exists(f)) return None
    try {
      val st = fs.getFileStatus(f)
      val in = new BufferedReader(new InputStreamReader(fs.open(f), UTF_8))
      try Some((Option(in.readLine()).getOrElse("").trim,
        st.getModificationTime)) finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Acquire or renew the store lease for `ownerId`. Throws
    * [[ConcurrentModificationException]] when a different owner holds a
    * live (unexpired) lease. */
  def acquire(fs: FileSystem, root: Path,
      ownerId: String = jvmOwnerId,
      expiryMs: Long = DefaultExpiryMs): Unit = {
    val f = leaseFile(root)
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      currentOwner(fs, root) match {
        case Some((owner, _)) if owner == ownerId =>
          fs.setTimes(f, System.currentTimeMillis(), -1) // heartbeat
          return
        case Some((owner, mtime))
            if System.currentTimeMillis() - mtime <= expiryMs =>
          throw new ConcurrentModificationException(
            s"graft-blocks: store $root is lease-held by writer $owner " +
              s"(heartbeat ${System.currentTimeMillis() - mtime} ms ago); " +
              "a store accepts one driver at a time — release the lease " +
              "or wait for expiry")
        case Some((owner, _)) =>
          logWarning(s"graft-blocks: stealing expired lease of $owner on $root")
          fs.delete(f, false) // expired — steal; create below arbitrates
        case None => ()
      }
      fs.mkdirs(f.getParent)
      try {
        val out = fs.create(f, false) // atomic exclusive create
        try out.write(ownerId.getBytes(UTF_8)) finally out.close()
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
