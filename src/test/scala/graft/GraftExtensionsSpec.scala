package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.SparkTestSession

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("functions callable from pure SQL after registration") {
    GraftFunctions.register(spark)
    Seq(("the quick fox", 1)).toDF("t", "i").createOrReplaceTempView("ext_docs")
    val row = spark.sql(
      """SELECT rolling_hash(t) AS rh,
        |  simhash64(split(t, ' ')) AS sh,
        |  minhash_sig(split(t, ' '), 8) AS mh
        |FROM ext_docs""".stripMargin).collect()(0)
    assert(row.getLong(0) == graft.functions.RollingHash.hash("the quick fox"))
    assert(row.getSeq[Long](2).size == 8)
    // simhash of a singleton token list = that token's hash bits exactly
    val rows2 = spark.sql(
      "SELECT simhash64(array('x')) = xxhash64('x') AS same").collect()
    assert(rows2(0).getBoolean(0) ===
      // every vote is the single token's bit -> fingerprint == token hash
      // only when all 64 bits agree with sign rule; verify via direct eval
      {
        val h = spark.sql("SELECT xxhash64('x')").collect()(0).getLong(0)
        val fp = spark.sql("SELECT simhash64(array('x'))").collect()(0).getLong(0)
        fp == h
      })
  }

  test("native aggregates and md5_64 callable from pure SQL") {
    GraftFunctions.register(spark)
    Seq((1L, "a b"), (1L, "c"), (2L, "a")).toDF("doc_id", "t")
      .createOrReplaceTempView("agg_docs")
    val rows = spark.sql(
      """SELECT doc_id,
        |  simhash_bits(xxhash64(t)) AS fp,
        |  minhash_portable(md5_64(t), 4) AS sig
        |FROM agg_docs GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Long](2).size == 4)
    // int-typed arguments implicitly cast (ExpectsInputTypes) instead
    // of crashing tasks with ClassCastException
    val intW = spark.sql(
      """SELECT simhash_bits(xxhash64(t), 2) AS fp
        |FROM agg_docs GROUP BY doc_id""".stripMargin).collect()
    assert(intW.length == 2)
    // md5_64 in SQL equals the composable chain
    val m = spark.sql(
      """SELECT md5_64('abc') =
        |  CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT) AS ok
        |""".stripMargin).collect()(0)
    assert(m.getBoolean(0))
  }

  test("extensions class injects without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext) // must not throw
  }

  test("minhash_sig rejects non-literal numHashes") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), length('xx'))").collect()
    }
  }

  test("minhash_portable rejects out-of-range numHashes at analysis time") {
    GraftFunctions.register(spark)
    Seq((1L, "a")).toDF("doc_id", "t").createOrReplaceTempView("mh_bounds")
    // beyond 4096 the universal-hash products can overflow Long (JVM
    // wraps where DuckDB errors) — must fail before any task runs
    for (bad <- Seq(0, -1, 4097, 8600)) {
      val e = intercept[Exception] {
        spark.sql(
          s"SELECT minhash_portable(md5_64(t), $bad) FROM mh_bounds GROUP BY doc_id")
          .collect()
      }
      assert(e.getMessage.contains("4096") || e.getMessage.contains("numHashes"),
        s"numHashes=$bad: ${e.getMessage.take(200)}")
    }
    // the max legal width still evaluates
    val ok = spark.sql(
      "SELECT minhash_portable(md5_64(t), 4096) AS s FROM mh_bounds GROUP BY doc_id")
      .collect()
    assert(ok(0).getSeq[Long](0).size == 4096)
  }

  test("minhash_portable masks full-range Long input into the 60-bit domain") {
    GraftFunctions.register(spark)
    // a full-range input (here: negative) and its 60-bit-masked twin
    // must produce the identical signature — the numHashes overflow
    // bound is only valid on the documented md5_64 domain, so the
    // aggregate masks rather than silently wrapping
    val full = -1234567890123456789L
    val masked = full & ((1L << 60) - 1)
    Seq((1L, full)).toDF("doc_id", "h").createOrReplaceTempView("mh_full")
    Seq((1L, masked)).toDF("doc_id", "h").createOrReplaceTempView("mh_masked")
    val a = spark.sql(
      "SELECT minhash_portable(h, 8) AS s FROM mh_full GROUP BY doc_id")
      .collect()(0).getSeq[Long](0)
    val b = spark.sql(
      "SELECT minhash_portable(h, 8) AS s FROM mh_masked GROUP BY doc_id")
      .collect()(0).getSeq[Long](0)
    assert(a == b)
    // and every signature slot is canonical (< 2^61 − 1, never negative)
    assert(a.forall(x => x >= 0 && x < 2305843009213693951L))
  }
}

class CleanupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("onQueryTerminated fires the registered handler") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    @volatile var cleaned: Option[Option[String]] = None
    val mem = MemoryStream[Int]
    val q = mem.toDS().writeStream.format("memory")
      .queryName("cleanup_probe").outputMode(OutputMode.Append()).start()
    graft.streaming.Cleanup.onTerminated(spark, "cleanup_probe") { ex =>
      cleaned = Some(ex)
    }
    mem.addData(1, 2, 3)
    q.processAllAvailable()
    q.stop()
    var tries = 0
    while (cleaned.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
    assert(cleaned.contains(None)) // graceful stop: no exception payload
  }
}
