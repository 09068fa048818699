package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Portable MinHash signature as a native one-pass aggregate: folds a
  * group of 60-bit hashes into the `numHashes`-element signature array.
  *
  * Hash family — identical, bit for bit, to the composable form the
  * DuckDB oracle replays (universal hashing over the split halves of
  * the md5-derived hash):
  * `sig[i] = min over h of (A_i·(h>>30) + B_i·(h & 2^30−1) + i) mod (2^61−1)`
  * with `A_i = 1000003·(i+1)`, `B_i = 999983·(i+1) + 12345`. Every
  * product stays below 2^55, so the arithmetic is overflow-free in any
  * engine (DuckDB errors on BIGINT overflow where the JVM wraps —
  * wraparound must never happen).
  *
  * Replaces a numHashes× row explosion + per-(doc, i) min aggregation +
  * per-(doc, band) collect with ONE grouped pass whose buffer is
  * `numHashes` longs, mergeable for map-side combine; banding and
  * verification then run on the signature ARRAY with per-row algebra.
  */
case class MinHashPortableAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  // Overflow headroom gates numHashes: the accumulator is
  // A_i·hi + B_i·lo + i with hi, lo < 2^30 and A_i, B_i < 1000003·numHashes,
  // so the sum is < 2·1000003·numHashes·2^30. At numHashes = 4096 that is
  // ~2^62.9 — still under Long.MaxValue; at ~8590 it wraps on the JVM
  // (where DuckDB would raise), silently breaking cross-engine
  // bit-identity. Enforced here so the SQL surface (minhash_portable)
  // rejects bad literals at analysis time, not with wrong answers.
  require(numHashes > 0 && numHashes <= 4096,
    s"minhash_portable numHashes must be in [1, 4096], got $numHashes " +
      "(beyond 4096 the universal-hash products overflow Long)")

  // analysis-time typing: int arguments get implicit casts instead of a
  // runtime ClassCastException in every task
  override def inputTypes: Seq[DataType] = Seq(LongType)

  private val P = 2305843009213693951L // 2^61 - 1

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // the hash family (and the numHashes overflow bound above) is
      // defined on the 60-bit md5_64 domain — mask full-range Long
      // inputs (xxhash64, negatives) into it so hi, lo < 2^30 always
      // holds and the products can never wrap
      val h = v.asInstanceOf[Long] & 1152921504606846975L // 2^60 - 1
      val hi = h >> 30
      val lo = h & 1073741823L
      var i = 0
      while (i < numHashes) {
        val h2 = ((1000003L * (i + 1)) * hi +
          (999983L * (i + 1) + 12345L) * lo + i) % P
        if (h2 < b(i)) b(i) = h2
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashPortableAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashPortableAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashPortableAgg =
    copy(child = newChild)
  override def prettyName: String = "minhash_portable_agg"
}

object MinHashAgg {
  /** Aggregate a column of 60-bit hashes into the portable MinHash
    * signature array (use inside groupBy(...).agg(...)). */
  def minhash_portable(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashPortableAgg(ColumnBridge.expression(hashes), numHashes)
        .toAggregateExpression())
}
