package graft

import org.scalatest.funsuite.AnyFunSuite

/** The adjudicator, adjudicated (round-19 verdict item 7): every
  * clean/contended call in the scale artifact leans on the user-space
  * attribution (machine user+nice+steal minus our own utime over the
  * entry's window), which until now was pinned only by live
  * observation — one threshold regression and the artifacts would
  * silently mislabel runs. This spec drives both directions
  * end-to-end through [[BenchScale.Adjudicator.one]]:
  *  - a window beside genuinely external user-space load (spinning
  *    CHILD processes — a different pid, exactly what a concurrent
  *    sbt/test session is) must land in `contended_entries` with its
  *    measured cores;
  *  - a window whose load is all OURS — in-JVM spin threads (our
  *    utime, subtracted) plus fsync'd writes (kernel work on our
  *    behalf, which lands in system time and is invisible to the
  *    user-space counter by construction) — must stay clean.
  * The negative case retries: this host's hypervisor steal arrives in
  * bursts (0.8–6 cores) and steal is DELIBERATELY counted as external
  * (a stolen window did measure something other than the query), so a
  * single burst-hit window flagging is correct behavior, not a
  * failure — only all-of-three flagging would falsify the
  * attribution. */
class BenchAdjudicationSpec extends AnyFunSuite {

  private def spinChildren(n: Int): Seq[Process] =
    (0 until n).map { _ =>
      new ProcessBuilder("sh", "-c", "while :; do :; done").start()
    }

  test("external user-space load (spinning child processes) lands the " +
      "entry in contended_entries with its measured cores") {
    val adj = new BenchScale.Adjudicator
    val hogs = spinChildren(4)
    try {
      Thread.sleep(300L) // let the hogs saturate before the window opens
      adj.one("x10", "fake_build")(() => Thread.sleep(1500L))
    } finally hogs.foreach(_.destroyForcibly())
    assert(adj.contendedEntries.exists(_.startsWith("fake_build@x10:")),
      s"4 spinning child processes must flag the window; got " +
        s"${adj.contendedEntries}")
  }

  test("own-process load does NOT flag: our user time is subtracted " +
      "and our kernel I/O never enters the user-space counter") {
    val adj = new BenchScale.Adjudicator
    var clean = false
    var attempt = 0
    while (!clean && attempt < 3) {
      attempt += 1
      adj.contendedEntries.clear()
      adj.one("x10", "own_work")(() => {
        val threads = (0 until 4).map { _ =>
          val t = new Thread(() => {
            val stop = System.nanoTime() + 1200L * 1000L * 1000L
            var x = 0L
            while (System.nanoTime() < stop) x += 1
            if (x == -1L) println(x) // keep the loop un-eliminable
          })
          t.start()
          t
        }
        // kernel work on our own behalf: 64 MiB written and fsync'd —
        // the writeback shape that false-flagged the r19 big builds
        // under total-busy attribution
        val f = java.nio.file.Files.createTempFile("graft-adj", ".bin")
        val ch = java.nio.channels.FileChannel.open(f,
          java.nio.file.StandardOpenOption.WRITE)
        val buf = new Array[Byte](1 << 20)
        (0 until 64).foreach(_ =>
          ch.write(java.nio.ByteBuffer.wrap(buf)))
        ch.force(true)
        ch.close()
        java.nio.file.Files.deleteIfExists(f)
        threads.foreach(_.join())
      })
      clean = !adj.contendedEntries.exists(_.startsWith("own_work@"))
    }
    assert(clean,
      s"own-process window flagged in all $attempt attempts: " +
        s"${adj.contendedEntries}")
  }
}
