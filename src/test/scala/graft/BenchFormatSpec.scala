package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact contract (round-5 verdict items 1–3): parseable
  * JSON, medians as the LAST key so a tail-truncated capture keeps
  * them, failing queries as "err" (excluded from the total), never a
  * flattering near-zero time. */
class BenchFormatSpec extends AnyFunSuite {
  implicit val fmts: Formats = DefaultFormats

  private val all: Seq[(String, Seq[Either[String, Double]])] = Seq(
    "q01_fast" -> Seq(Right(0.100), Right(0.120), Right(0.110)),
    "q02_slow" -> Seq(Right(1.000), Right(1.200), Right(1.100)),
    "q99_broken" -> Seq(Right(0.001),
      Left("""java.lang.RuntimeException: boom "quoted" path\with\slashes""")))

  private val line = Bench.formatJson(3, "/root/testdata/sf0.1", all,
    Seq("dump_scan_xml_splits" -> "13", "dump_scan_xml_file_mbps" -> "340.1"),
    cpus = 32)

  test("the line is valid JSON") {
    assert(JsonMethods.parse(line) != JNothing)
  }

  test("both lines record the core count (cross-artifact comparability)") {
    // the r12 'dump_scan_bz2 regression' was two artifacts compared
    // across an unrecorded local[32]-vs-local[4] config delta — the
    // core count must be on the face of every artifact
    assert((JsonMethods.parse(line) \ "cpus").extract[Int] == 32)
    val compact = Bench.formatCompactJson(all, rerunN = 0, cpus = 32)
    assert((JsonMethods.parse(compact) \ "cpus").extract[Int] == 32)
  }

  test("per-query medians are the LAST key in the object") {
    val keys = JsonMethods.parse(line).asInstanceOf[JObject].obj.map(_._1)
    assert(keys.last == "queries",
      s"queries must be last so a tail capture retains medians; got $keys")
  }

  test("a failing query reports err and is excluded from the total") {
    val json = JsonMethods.parse(line)
    assert((json \ "queries" \ "q99_broken").extract[String] == "err")
    assert((json \ "errors" \ "q99_broken").extract[String]
      .contains("RuntimeException"))
    val total = (json \ "value").extract[Double]
    assert(math.abs(total - (0.110 + 1.100)) < 1e-9,
      s"total $total must be the sum of SUCCESSFUL medians only")
  }

  test("healthy queries carry their median; spread covers them only") {
    val json = JsonMethods.parse(line)
    assert((json \ "queries" \ "q01_fast").extract[Double] == 0.110)
    assert((json \ "spread" \ "q02_slow").extract[Double] == 0.182)
    assert((json \ "spread" \ "q99_broken") == JNothing)
  }

  test("numbers render with dot decimals regardless of JVM locale") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val l = Bench.formatJson(3, "/sf", Seq(
        "q1" -> Seq(Right(0.1), Right(0.2), Right(0.3))), Nil)
      val json = JsonMethods.parse(l) // throws on "0,200"
      assert((json \ "queries" \ "q1").extract[Double] == 0.2)
      assert(Bench.num(1234.5678) == "1234.568")
    } finally java.util.Locale.setDefault(saved)
  }

  test("control characters in error messages stay valid JSON") {
    val l = Bench.formatJson(1, "/sf", Seq(
      "qbad" -> Seq(Left("boom\u0000with\u001bcontrol\nchars\t\"quoted\""))), Nil)
    val json = JsonMethods.parse(l)
    assert((json \ "errors" \ "qbad").extract[String].contains("boom"))
    assert((json \ "queries" \ "qbad").extract[String] == "err")
  }

  test("compact line parses, keeps medians/err, and fits a 2 KB tail window") {
    val compact = Bench.formatCompactJson(all)
    val json = JsonMethods.parse(compact)
    assert((json \ "queries" \ "q01").extract[Double] == 0.110)
    assert((json \ "queries" \ "q99").extract[String] == "err")
    assert((json \ "value").extract[Double] == 1.210)
    // noisiest-first absolute rep deltas (max-min seconds), healthy
    // queries only, medians still the LAST key
    assert((json \ "noise_top5" \ "q02").extract[Double] == 0.2)
    assert((json \ "noise_top5" \ "q99") == JNothing)
    val ckeys = json.asInstanceOf[JObject].obj.map(_._1)
    assert(ckeys.last == "queries")
    // worst case: a full catalogue of long names + both dump scans must
    // stay under the driver's ~2 KB stdout tail window
    val catalogue = (1 to 120).map(i =>
      f"q$i%02d_span_excision_keep_first" ->
        Seq[Either[String, Double]](Right(123.456))) ++ Seq(
      "dump_scan_xml" -> Seq[Either[String, Double]](Right(1.0)),
      "dump_scan_bz2" -> Seq[Either[String, Double]](Right(2.0)))
    val big = Bench.formatCompactJson(catalogue, rerunN = 7)
    assert(big.getBytes("UTF-8").length < 2000,
      s"compact line is ${big.length} bytes; must fit a 2 KB tail capture")
    val keys = (JsonMethods.parse(big) \ "queries").asInstanceOf[JObject]
      .obj.map(_._1)
    assert(keys.distinct.size == 122, "shortened keys must stay unique")
    assert((JsonMethods.parse(big) \ "rerun_n").extract[Int] == 7)
  }

  test("total-only final line: O(1)-sized in catalogue count, parses, sums successes") {
    // round-13: even the compact line's queries map outgrew the driver's
    // ~2 KB tail at 153 entries (BENCH_r13 parsed:null). The FINAL line
    // must carry no per-query map and stay tiny at any catalogue size.
    val t = Bench.formatTotalOnlyJson(all, "/root/testdata/sf0.1", cpus = 32)
    val json = JsonMethods.parse(t)
    assert((json \ "value").extract[Double] == 1.210)
    assert((json \ "n").extract[Int] == 3)
    assert((json \ "errors").extract[Int] == 1)
    assert((json \ "cpus").extract[Int] == 32)
    assert((json \ "sf").extract[String] == "/root/testdata/sf0.1")
    val catalogue = (1 to 500).map(i =>
      f"q$i%03d_span_excision_keep_first" ->
        Seq[Either[String, Double]](Right(123.456)))
    val big = Bench.formatTotalOnlyJson(catalogue, "/root/testdata/sf0.1", 32)
    assert(big.getBytes("UTF-8").length < 200,
      s"total-only line is ${big.length} bytes; must be O(1) in catalogue size")
    assert(JsonMethods.parse(big) != JNothing)
  }

  test("suspect detection: >2x-median spread above the 50 ms floor") {
    // clean reps: spread well under 2x median
    assert(!Bench.isSuspect(Seq(0.100, 0.120, 0.110)))
    // contended: one 5x outlier rep
    assert(Bench.isSuspect(Seq(0.400, 2.000, 0.420)))
    // micro-query: huge RELATIVE spread but under the floor — one
    // scheduler hiccup is not contention
    assert(!Bench.isSuspect(Seq(0.010, 0.045, 0.012)))
    assert(!Bench.isSuspect(Nil))
    // SUSTAINED contention: median inflated, spread/median ratio looks
    // ordinary, but the fast rep proves the query can run 10x faster
    assert(Bench.isSuspect(Seq(0.700, 6.800, 7.100)))
    // healthy heavy query: tight reps, no trigger
    assert(!Bench.isSuspect(Seq(5.000, 5.100, 5.300)))
  }

  test("re-run annotation: healed median in queries, contended numbers in rerun") {
    val healed = Seq(
      "q67_dedup_clusters" -> Seq[Either[String, Double]](
        Right(1.200), Right(1.250), Right(1.220), Right(1.210), Right(1.240)))
    val l = Bench.formatJson(3, "/sf", healed, Nil,
      reruns = Seq("q67_dedup_clusters" -> (5.770, 5.100)))
    val json = JsonMethods.parse(l)
    // queries carry the RE-RUN median, not the contended one
    assert((json \ "queries" \ "q67_dedup_clusters").extract[Double] == 1.22)
    assert((json \ "rerun" \ "q67_dedup_clusters" \ "orig")
      .extract[Double] == 5.77)
    assert((json \ "rerun" \ "q67_dedup_clusters" \ "spread")
      .extract[Double] == 5.1)
    // medians still the LAST key
    val keys = json.asInstanceOf[JObject].obj.map(_._1)
    assert(keys.last == "queries")
  }

  test("canary line parses, totals successes, and embeds whole into the full line") {
    // round-14 verdict item 1: the canary's fresh-JVM medians are the
    // cross-round comparison basis, so they must live IN the artifact
    val canary = Bench.formatCanaryJson(5, "/root/testdata/sf0.1", all,
      cpus = 32, gcMs = 1234L, wallSec = 98.5)
    val cj = JsonMethods.parse(canary)
    assert((cj \ "metric").extract[String] == "canary")
    assert((cj \ "reps").extract[Int] == 5)
    assert((cj \ "value").extract[Double] == 1.210)
    assert((cj \ "gc_ms").extract[Long] == 1234L)
    assert((cj \ "queries" \ "q01_fast").extract[Double] == 0.110)
    assert((cj \ "queries" \ "q99_broken").extract[String] == "err")
    // the full line splices it verbatim under "canary", still valid
    // JSON, medians still LAST
    val full = Bench.formatJson(3, "/sf", all, Nil, cpus = 32,
      canary = Some(canary), gcMs = 5678L)
    val fj = JsonMethods.parse(full)
    assert((fj \ "canary" \ "value").extract[Double] == 1.210)
    assert((fj \ "canary" \ "queries" \ "q01_fast").extract[Double] == 0.110)
    assert((fj \ "gc_ms").extract[Long] == 5678L)
    assert(fj.asInstanceOf[JObject].obj.map(_._1).last == "queries")
    // absent canary: no key, line unchanged in shape
    val bare = JsonMethods.parse(Bench.formatJson(3, "/sf", all, Nil))
    assert((bare \ "canary") == JNothing && (bare \ "gc_ms") == JNothing)
    // the fixed canary subset is append-only and starts from the
    // round-15 list — a reshuffle would break cross-round comparability
    assert(Bench.CanaryPrefixes.take(19) == Seq(
      "q01_", "q07_", "q31_", "q32_", "q67_", "q92_", "q93_", "q96_",
      "q100_", "q105_", "q108_", "q110_", "q113_", "q129_", "q135_",
      "q139_", "q150_", "q161_", "q166_"))
  }

  test("total-only line carries the canary total when present, stays O(1)") {
    val t = Bench.formatTotalOnlyJson(all, "/sf", cpus = 32,
      canaryTotal = Some(42.125))
    val json = JsonMethods.parse(t)
    assert((json \ "canary_total").extract[Double] == 42.125)
    assert(t.getBytes("UTF-8").length < 200)
  }

  test("contention self-identification: external cores, verdict, and " +
      "artifact fields (round-17 verdict item 4)") {
    val t0 = Bench.LoadSample(0L, 0L, 0L)
    def at(busySec: Double, jvmSec: Double, wallSec: Double) =
      Bench.LoadSample((busySec * 100).toLong, (jvmSec * 1e9).toLong,
        (wallSec * 1e9).toLong)
    // idle box: over 60 s wall the machine did 31 cpu-sec, 30 of them
    // ours → 1/60 external core
    val idle = Bench.externalCores(t0, at(31.0, 30.0, 60.0))
    assert(math.abs(idle - 1.0 / 60) < 1e-6 && !Bench.isContended(idle))
    // a concurrent suite: 600 external cpu-sec over 60 s = 10 cores —
    // the uniform-1.3x inflation class the r17 driver artifact carried
    val busy = Bench.externalCores(t0, at(630.0, 30.0, 60.0))
    assert(math.abs(busy - 10.0) < 1e-6 && Bench.isContended(busy))
    // an unavailable probe degrades to NaN, never to a false verdict
    val nan = Bench.externalCores(Bench.LoadSample(-1L, 0L, 0L),
      at(1.0, 1.0, 1.0))
    assert(nan.isNaN && !Bench.isContended(nan))
    // clock skew can make ours > machine: clamp at 0, not negative
    assert(Bench.externalCores(t0, at(10.0, 20.0, 60.0)) == 0.0)
    // the FINAL total-only line (the one the driver tail always parses)
    // carries the verdict
    val t = Bench.formatTotalOnlyJson(all, "/sf", cpus = 32,
      extCores = Some(10.55))
    val j = JsonMethods.parse(t)
    assert((j \ "ext_cores").extract[Double] == 10.55)
    assert((j \ "contended").extract[Boolean])
    val tIdle = Bench.formatTotalOnlyJson(all, "/sf", 32,
      extCores = Some(0.03))
    assert(!(JsonMethods.parse(tIdle) \ "contended").extract[Boolean])
    // NaN (probe unavailable) → fields absent, line still parses
    val tNan = Bench.formatTotalOnlyJson(all, "/sf", 32,
      extCores = Some(Double.NaN))
    assert((JsonMethods.parse(tNan) \ "contended") == JNothing)
    // full-line "load" context fragment
    val lf = Bench.formatLoadJson(0.52, 31.9, 0.03)
    val full = JsonMethods.parse(
      Bench.formatJson(3, "/sf", all, Nil, load = Some(lf)))
    assert((full \ "load" \ "load1_start").extract[Double] == 0.52)
    assert((full \ "load" \ "external_cpu_cores").extract[Double] == 0.03)
    assert(!(full \ "load" \ "contended").extract[Boolean])
    assert(full.asInstanceOf[JObject].obj.map(_._1).last == "queries")
    // NaN loads render as null, fragment still valid JSON
    assert(JsonMethods.parse(
      Bench.formatLoadJson(Double.NaN, Double.NaN, Double.NaN)) != JNothing)
    // canary line variant
    val c = Bench.formatCanaryJson(5, "/sf", all, 32, 1L, 9.9,
      extCores = 5.0)
    assert((JsonMethods.parse(c) \ "contended").extract[Boolean])
    assert((JsonMethods.parse(c) \ "ext_cores").extract[Double] == 5.0)
    // live probes on this machine return usable values (Linux /proc)
    assert(Bench.machineBusyJiffies() > 0L)
    assert(Bench.jvmCpuNanos() > 0L)
    assert(!Bench.loadAvg1().isNaN)
  }

  test("stability verdict: the total-only line names the run of record " +
      "(round-18 verdict item 3)") {
    // the two same-day idle r18 artifacts: rerun_n 3/198 (clean) vs
    // 16/198 (degraded) — the verdict must split them
    assert(!Bench.isNoisy(3, 198))
    assert(Bench.isNoisy(16, 198))
    assert(!Bench.isNoisy(0, 0)) // empty run: no verdict, not noisy
    val clean = Bench.formatTotalOnlyJson(all, "/sf", cpus = 32,
      rerunN = 0)
    val cj = JsonMethods.parse(clean)
    assert((cj \ "rerun_n").extract[Int] == 0)
    assert(!(cj \ "noisy").extract[Boolean])
    val degraded = Bench.formatTotalOnlyJson(all, "/sf", cpus = 32,
      rerunN = 2) // 2 of 3 entries re-ran
    assert((JsonMethods.parse(degraded) \ "noisy").extract[Boolean])
    // default (no rerun count supplied) keeps the legacy shape
    val legacy = Bench.formatTotalOnlyJson(all, "/sf", cpus = 32)
    assert((JsonMethods.parse(legacy) \ "noisy") == JNothing)
    // the line stays O(1)-sized with every optional field present
    val full = Bench.formatTotalOnlyJson(all, "/sf", 32,
      canaryTotal = Some(42.1), extCores = Some(0.5), rerunN = 3)
    assert(full.getBytes("UTF-8").length < 250)
    assert(JsonMethods.parse(full) != JNothing)
  }

  test("scale-artifact inversion detector: flags x-low slower than " +
      "x-high past both floors (round-18 verdict item 1)") {
    // the r18 committed artifact's actual anomaly: ivf_append x10
    // 8.16 s > x100 6.85 s (19%, 1.31 s absolute) — must flag
    assert(BenchScale.inversions(Seq(
      "ivf_append" -> Seq(1 -> 0.97, 10 -> 8.16, 100 -> 6.85)))
      == Seq("ivf_append"))
    // honest monotone series: clean
    assert(BenchScale.inversions(Seq(
      "ivf_build" -> Seq(1 -> 1.0, 10 -> 8.0, 100 -> 84.0))).isEmpty)
    // flat probe with sub-second jitter downward: under the absolute
    // floor — not an inversion
    assert(BenchScale.inversions(Seq(
      "lsh_probe" -> Seq(1 -> 0.50, 10 -> 0.39, 100 -> 0.45))).isEmpty)
    // large but <15% dip: under the ratio floor
    assert(BenchScale.inversions(Seq(
      "bm_build" -> Seq(1 -> 1.0, 10 -> 10.0, 100 -> 9.1))).isEmpty)
    // base (1x) slower than x10 counts too — the other r18 shape
    assert(BenchScale.inversions(Seq(
      "ivf_asof" -> Seq(1 -> 7.30, 10 -> 2.10, 100 -> 9.0)))
      == Seq("ivf_asof"))
    // millisecond-unit series carry no verdict: the absolute floor is
    // calibrated in seconds (gen_check_ms wobbling 1.7 -> 0.4 ms must
    // not read as a half-second internal inconsistency)
    assert(BenchScale.inversions(Seq(
      "gen_check_ms" -> Seq(1 -> 1.663, 10 -> 0.371, 100 -> 0.361)))
      .isEmpty)
  }

  test("partial progress line: complete JSON, names its phase, carries " +
      "the running total — what a budget-killed run's tail parses") {
    val l = Bench.formatPartialJson("measure", 42, 198, 61.25, "/sf/0.1")
    val parsed = org.json4s.jackson.JsonMethods.parse(l)
    import org.json4s.DefaultFormats
    implicit val fmts: org.json4s.Formats = DefaultFormats
    assert((parsed \ "partial").extract[Boolean])
    assert((parsed \ "phase").extract[String] == "measure")
    assert((parsed \ "n").extract[Int] == 42)
    assert((parsed \ "of").extract[Int] == 198)
    assert((parsed \ "value").extract[Double] == 61.25)
    assert(l.length < 200, "partial lines must always fit a tail window")
  }

  test("budget reps ladder: full reps until the reduced-reps rung, " +
      "1 rep after") {
    assert(Bench.budgetReps(1.0, 3) == 3)
    assert(Bench.budgetReps(Bench.ReducedRepsFrac + 0.01, 3) == 3)
    assert(Bench.budgetReps(Bench.ReducedRepsFrac - 0.01, 3) == 1)
    assert(Bench.budgetReps(0.0, 5) == 1)
  }

  test("total-only line carries the budget record when present") {
    val all = Seq("q1" -> Seq[Either[String, Double]](Right(1.0)))
    val l = Bench.formatTotalOnlyJson(all, "/sf", 32,
      budget = Some("""{"min":50.0,"reduced_reps":2,"warm_skipped":0,""" +
        """"late_recheck_skipped":true}"""))
    val parsed = org.json4s.jackson.JsonMethods.parse(l)
    import org.json4s.DefaultFormats
    implicit val fmts: org.json4s.Formats = DefaultFormats
    assert((parsed \ "budget" \ "reduced_reps").extract[Int] == 2)
    assert((parsed \ "budget" \ "late_recheck_skipped").extract[Boolean])
    assert(l.length < 400)
  }

  test("a throwing rep is a Left, not a near-zero Right") {
    val r = Bench.time(() => throw new IllegalStateException("deliberate"))
    assert(r.isLeft)
    assert(r.left.toOption.get.contains("deliberate"))
    assert(Bench.time(() => ()).isRight)
  }
}
