package graft.scale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The missing half of the compaction discipline (round-15 verdict
  * item 4): [[IndexIo.compactionStats]] made compaction-need a
  * computable probe, but nothing OPERATED it — every layout's story
  * ended at "pause and fold by hand". This is the shared operator: a
  * periodic check ([[maybeCompact]]) the streaming twins call at the
  * end of a micro-batch, and a crash-safe in-place fold
  * ([[compactInPlace]]) built from the layout's own copy-compaction
  * verb plus the [[IvfIndex.rebuild]] retire-rename-vacuum swap.
  *
  * Single-writer rule: the fold runs INSIDE the foreachBatch body —
  * between batches of the one writer the family permits per dir — so
  * no reader/writer races with the ingest loop itself. Crash windows
  * all heal on the next batch ([[healSwap]], called before every
  * probe): dying mid-fold leaves a `.__compact` residue that is
  * discarded (the next fold rebuilds it); dying between retire and
  * publish leaves the completed fold at `.__compact` and the previous
  * index at `.__retired` — publish finishes; dying after publish
  * leaves a `.__retired` leak — vacuumed. The fold is the history
  * VACUUM: as-of epochs re-base to 0 at the swap (emit change feeds
  * before compacting if history consumers need them — the documented
  * feed contract). */
object Maintenance {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def vacuum(spark: SparkSession, p: Path): Unit = {
    val f = fs(spark, p)
    if (f.exists(p) && !f.delete(p, true))
      throw new java.io.IOException(s"maintenance: failed to vacuum $p")
  }

  private def tmpOf(dir: String) = {
    val t = new Path(dir)
    new Path(t.getParent, t.getName + ".__compact")
  }
  private def retiredOf(dir: String) = {
    val t = new Path(dir)
    new Path(t.getParent, t.getName + ".__retired")
  }

  /** Heal a crashed earlier [[compactInPlace]] swap — call before
    * serving or mutating `dir` in a loop that compacts in place. */
  def healSwap(spark: SparkSession, dir: String): Unit = {
    val target = new Path(dir)
    val f = fs(spark, target)
    val tmp = tmpOf(dir)
    val retired = retiredOf(dir)
    if (!f.exists(target)) {
      if (f.exists(tmp)) {
        // died between retire and publish: the fold completed (the
        // retire rename only runs after compactTo returned) — finish it
        if (!f.rename(tmp, target))
          throw new java.io.IOException(
            s"maintenance: failed to heal-publish $tmp")
        vacuum(spark, retired)
      } else if (f.exists(retired)) {
        // no completed fold — roll the retired copy back
        if (!f.rename(retired, target))
          throw new java.io.IOException(
            s"maintenance: failed to restore $retired")
      }
      // neither: a cold dir the caller is about to build — nothing to do
    } else {
      // died after publish: the retired copy is a leak — vacuum it so
      // the next retire rename cannot nest into it
      vacuum(spark, retired)
    }
  }

  /** Crash-safe in-place fold: run the layout's copy-compaction into a
    * sibling temp dir, then retire-rename-vacuum. `compactTo` is the
    * layout's own verb, e.g. `LshIndex.compactTo(spark, _, _)`. */
  def compactInPlace(spark: SparkSession, dir: String,
      compactTo: (String, String) => Unit): Unit = {
    healSwap(spark, dir)
    val target = new Path(dir)
    val f = fs(spark, target)
    val tmp = tmpOf(dir)
    val retired = retiredOf(dir)
    vacuum(spark, tmp) // residue of a fold that died mid-write
    compactTo(dir, tmp.toString)
    if (!f.rename(target, retired))
      throw new java.io.IOException(s"maintenance: failed to retire $target")
    if (!f.rename(tmp, target)) {
      f.rename(retired, target) // roll back; the old layout stays live
      throw new java.io.IOException(s"maintenance: failed to publish $tmp")
    }
    f.delete(retired, true)
  }

  /** The periodic hook: on every `every`-th epoch (0-based — fires at
    * epochs every−1, 2·every−1, …), consult the layout's
    * compaction-need probe and fold in place when it says so. Returns
    * true iff a fold ran (the specs observe it). Listing-only cost on
    * the epochs that only probe; nothing at all on the ones that
    * don't. */
  def maybeCompact(spark: SparkSession, dir: String, epochId: Long,
      every: Long, needs: => Boolean,
      compactTo: (String, String) => Unit): Boolean =
    if (every > 0L && epochId % every == every - 1L && needs) {
      compactInPlace(spark, dir, compactTo)
      true
    } else false
}
