package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fold as a native aggregate: collapses a group of 64-bit
  * token hashes (with per-row weights, normally the token's in-document
  * frequency) into the 60-bit fingerprint in ONE pass over the rows.
  *
  * The composable-SQL formulation explodes every (doc, token) row into
  * 60 (doc, bit) rows before aggregating — a 60× row blowup. This
  * aggregate keeps the 60 signed counters in a fixed 480-byte buffer
  * per group, does the per-row work in registers, and is mergeable
  * (partial aggregation / map-side combine works as usual), so the
  * shuffle carries one buffer per doc instead of 60 combined rows.
  *
  * Weights matter: an UNWEIGHTED (distinct-token) SimHash degenerates
  * on low-vocabulary corpora — documents' distinct-token sets coincide,
  * fingerprints collapse, and banding floods the verifier with
  * candidates (measured 271k candidate pairs vs 525 for the weighted
  * form on the sf0.1 corpus). Charikar's construction weights each
  * feature; term frequency is the standard choice.
  *
  * Bit semantics (pinned by DedupSpec and the q72 oracle): counter i
  * accumulates +weight when hash bit i is set else −weight; fingerprint
  * bit i is set iff the counter is strictly positive.
  */
case class SimHashBitsAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression]
  with ImplicitCastInputTypes {

  // analysis-time typing: int arguments get implicit casts instead of a
  // runtime ClassCastException in every task
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  private val bits = 60

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    val wv = right.eval(input)
    if (v != null && wv != null) {
      val h = v.asInstanceOf[Long]
      val w = wv.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        b(i) += (if (((h >> i) & 1L) == 1L) w else -w)
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any = {
    var fp = 0L
    var i = 0
    while (i < bits) { if (b(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashBitsAgg =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "simhash_bits_agg"
}

object SimHashAgg {
  /** Aggregate a column of 64-bit hashes, weighted per row, into the
    * 60-bit SimHash fingerprint (use inside groupBy(...).agg(...)). */
  def simhash_bits(hashes: Column, weight: Column = lit(1L)): Column =
    ColumnBridge.column(
      SimHashBitsAgg(ColumnBridge.expression(hashes),
        ColumnBridge.expression(weight)).toAggregateExpression())
}
