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
    // this is a CALIBRATION test: it asserts a clean window stays
    // unflagged, which requires the box to actually be clean. Under
    // the r21 parallel test groups the sibling JVMs are genuine
    // external user-space load (exactly what the attribution exists to
    // flag), so probe first and cancel — not fail — on a busy box; the
    // idle single-group protocol (SPARK_GRAFT_TEST_GROUPS=1) still
    // exercises it.
    val p0 = Bench.userLoadSampleNow()
    Thread.sleep(400L)
    val ext = Bench.externalUserCores(p0, Bench.userLoadSampleNow())
    assume(ext.isNaN || ext < 1.0,
      s"box not idle (external user cores $ext) — calibration test " +
        "needs an idle window; run with SPARK_GRAFT_TEST_GROUPS=1")
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

  // ---- I/O-contention attribution (round-20 verdict item 2): the r20
  // 32-core run-of-record was disk-contaminated 15-100× in its
  // I/O-heavy band yet CPU-clean, and signed itself contended:false.
  // The window observables are pure functions over /proc samples —
  // drive both directions with synthetic samples (deterministic; the
  // live /proc readers are smoke-checked for monotonicity only). ----

  test("a synthetic I/O-loaded window flags io-contended; an idle one " +
      "does not") {
    import Bench.{IoSample, ioWaitCores, diskUtil, isIoContended}
    def s(iowait: Long, ticks: Long, atSec: Double) =
      IoSample(iowait, Map("vda" -> ticks), (atSec * 1e9).toLong)
    // 10 s window, 4 cores parked in iowait (4000 jiffies), disk busy
    // 9.5 of 10 s — the r20 contamination shape
    val t0 = s(100000L, 500000L, 0.0)
    val bad = s(100000L + 4000L, 500000L + 9500L, 10.0)
    assert(math.abs(ioWaitCores(t0, bad) - 4.0) < 0.01)
    assert(math.abs(diskUtil(t0, bad) - 0.95) < 0.001)
    assert(isIoContended(ioWaitCores(t0, bad), diskUtil(t0, bad)))
    // idle window calibrated live 2026-08-18 (this suite's own warm
    // phase): iowait 0.01 cores, util 0.008 — far under both thresholds
    val idle = s(100000L + 10L, 500000L + 80L, 10.0)
    assert(!isIoContended(ioWaitCores(t0, idle), diskUtil(t0, idle)))
    // unavailable /proc degrades to NaN, never to a flag
    val noProc = IoSample(-1L, Map.empty, (10 * 1e9).toLong)
    assert(ioWaitCores(t0, noProc).isNaN)
    assert(diskUtil(noProc, noProc).isNaN)
    assert(!isIoContended(Double.NaN, Double.NaN))
  }

  test("live /proc I/O samplers are monotone and parse") {
    val a = Bench.ioSampleNow()
    Thread.sleep(50L)
    val b = Bench.ioSampleNow()
    assert(a.iowaitJiffies >= 0L, "/proc/stat iowait must parse here")
    assert(b.iowaitJiffies >= a.iowaitJiffies)
    assert(a.diskTicks.nonEmpty, "/proc/diskstats must parse here")
    val u = Bench.diskUtil(a, b)
    assert(u.isNaN || (u >= 0.0 && u <= 1.0))
  }

  test("canary-referenced rerun policy: suspects are entries past " +
      "factor x their canary-history median, with a 50 ms floor") {
    val canaryLines = Seq(
      // two history lines; per-query reference = median across lines
      """{"metric":"canary","value":10.0,"queries":{"q69_x":0.40,""" +
        """"q01_agg":0.100,"q18_tiny":0.010,"q96_pr":"err"}}""",
      """{"metric":"canary","value":11.0,"queries":{"q69_x":0.38,""" +
        """"q01_agg":0.120}}""",
      "not json at all")
    val refs = Bench.canaryQueryMedians(canaryLines)
    assert(math.abs(refs("q69_x") - 0.40) < 1e-9) // upper-middle median
    assert(math.abs(refs("q01_agg") - 0.120) < 1e-9)
    assert(!refs.contains("q96_pr")) // err entries never become refs
    val measured: Seq[(String, Seq[Either[String, Double]])] = Seq(
      "q69_x" -> Seq(Right(41.0), Right(40.5), Right(41.2)), // 100x: rerun
      "q01_agg" -> Seq(Right(0.15), Right(0.16), Right(0.14)), // 1.4x: keep
      "q18_tiny" -> Seq(Right(0.2), Right(0.2), Right(0.2)), // ref<50ms: skip
      "q96_pr" -> Seq(Right(5.0)), // no ref: untouched
      "q69_err" -> Seq(Left("boom"))) // errors never rerun here
    assert(Bench.policySuspects(measured, refs) === Seq("q69_x"))
  }

  test("the artifact's contended verdict ORs the CPU and I/O " +
      "attributions") {
    val line = Bench.formatTotalOnlyJson(
      Seq("q1" -> Seq(Right(1.0))), "/sf", cpus = 32,
      extCores = Some(0.5), rerunN = 0,
      ioWait = 6.0, dUtil = 0.99)
    assert(line.contains(""""contended":true"""), line)
    assert(line.contains(""""io_wait_cores":6.00"""), line)
    val clean = Bench.formatTotalOnlyJson(
      Seq("q1" -> Seq(Right(1.0))), "/sf", cpus = 32,
      extCores = Some(0.5), rerunN = 0,
      ioWait = 0.01, dUtil = 0.01)
    assert(clean.contains(""""contended":false"""), clean)
  }
}
