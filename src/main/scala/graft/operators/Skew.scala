package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * The drain key (blockBatch) is the reference pipeline's natural hot
  * key: one giant page can dominate a partition (FAQ.md:66-68 allows
  * ~500k blocks per page). Classic mitigation: salt the key into
  * `saltBuckets` sub-keys, aggregate partially per (key, salt), then
  * merge — two small shuffles instead of one skewed one. AQE's skew-join
  * handling covers the join case at runtime; this covers aggregation.
  *
  * The salt is always derived deterministically from row content
  * (xxhash64 over the salting columns). A nondeterministic salt such as
  * `monotonically_increasing_id()` or `rand()` feeding a shuffle key is
  * the classic correctness hazard: if a map task is recomputed after a
  * fetch failure, the retried partition assigns different salts than the
  * original run and downstream reducers that already fetched the old
  * output double-count or drop rows. Content-derived salts are identical
  * on every recompute. The trade-off: duplicate rows share a salt, so
  * salting degrades on corpora dominated by bit-identical rows — pass
  * a unique id column via `saltOn` in that case.
  */
object Skew {

  private def contentSalt(cols: Seq[Column], saltBuckets: Int): Column =
    pmod(xxhash64(cols: _*), lit(saltBuckets.toLong))

  private def requireNoSaltCol(df: DataFrame, who: String): Unit =
    require(!df.columns.contains("__salt"),
      s"$who: input already has a __salt column; rename it first")

  /** Two-phase salted aggregation: count + long-sum per key, result
    * identical to a direct groupBy (proven by the q29 oracle).
    * Salt defaults to a hash of every input column; pass `saltOn`
    * (e.g. a unique event id) when rows may be bit-identical. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int = 16, saltOn: Seq[Column] = Nil): DataFrame = {
    requireNoSaltCol(df, "saltedCountSum")
    val saltCols = if (saltOn.nonEmpty) saltOn else df.columns.toSeq.map(col)
    val salted = df.withColumn("__salt", contentSalt(saltCols, saltBuckets))
      .select(key.as("k"), value.as("v"), col("__salt"))
    val partial = salted.groupBy(col("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
    partial.groupBy(col("k"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("sum_v"))
  }

  /** Salted equi-join for a skewed fact side: each fact row gets a
    * content-derived salt in [0, saltBuckets); the dimension side is
    * replicated once per salt value; the join key becomes (key, salt),
    * splitting a hot key across saltBuckets partitions. Result is
    * row-identical to the plain join (every fact row still meets every
    * matching dim row exactly once — in its salt bucket). Use when a key
    * is too hot for AQE's runtime skew splitting, at the price of
    * `saltBuckets`× dimension replication. Both inputs must expose
    * `joinKey`; neither may already have a `__salt` column. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, joinKey: String,
      saltBuckets: Int = 16, saltOn: Seq[Column] = Nil): DataFrame = {
    requireNoSaltCol(fact, "saltedJoin")
    requireNoSaltCol(dim, "saltedJoin")
    val saltCols = if (saltOn.nonEmpty) saltOn else fact.columns.toSeq.map(col)
    val saltedFact = fact.withColumn("__salt",
      contentSalt(saltCols, saltBuckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(joinKey, "__salt")).drop("__salt")
  }
}
