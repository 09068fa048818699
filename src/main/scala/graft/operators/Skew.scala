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
  */
object Skew {

  /** Two-phase salted aggregation: count + long-sum per key, result
    * identical to a direct groupBy (proven by the q29 oracle). */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(xxhash64(monotonically_increasing_id()),
        lit(saltBuckets.toLong)))
    val partial = salted.groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
    partial.groupBy(col("k"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("sum_v"))
  }

  /** Salted equi-join for a skewed fact side: the fact rows get a
    * random salt in [0, saltBuckets); the dimension side is replicated
    * once per salt value; the join key becomes (key, salt), splitting a
    * hot key across saltBuckets partitions. Result is row-identical to
    * the plain join (every fact row still meets every matching dim row
    * exactly once — in its salt bucket). Use when a key is too hot for
    * AQE's runtime skew splitting, at the price of `saltBuckets`×
    * dimension replication. Both inputs must expose `joinKey`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, joinKey: String,
      saltBuckets: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(monotonically_increasing_id()),
      lit(saltBuckets.toLong))
    val saltedFact = fact.withColumn("__salt", salt)
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(joinKey, "__salt")).drop("__salt")
  }
}
