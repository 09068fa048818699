package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Mergeable per-group vector sum over an `array<float>` column — the
  * [[SimHashBitsAgg]] buffer pattern applied to k-means centroid
  * updates (round-13 review item 5): the composable form of "mean
  * embedding per cluster" is `posexplode(embedding)` →
  * `groupBy(cid, pos)` → `avg`, which shuffles n·dim exploded rows per
  * Lloyd round. This aggregate keeps one `dim+1` double buffer per
  * group (component sums + row count in the last slot), does the
  * per-row work in a tight loop, and is mergeable — partial
  * aggregation / map-side combine applies as usual — so the shuffle
  * carries one buffer per (task, cid) instead of dim combined rows per
  * cid: a ×dim shuffle reduction at any corpus size.
  *
  * Output: `array<double>` of length dim+1 — `[sum_0 … sum_{dim-1},
  * count]`; the caller divides. Dimension is inferred from the first
  * non-null row (empty groups return an empty array); mixed dimensions
  * in one group are a caller bug and fail loudly rather than silently
  * mis-summing. */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression]
  with ImplicitCastInputTypes {

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(b: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (b.isEmpty) new Array[Double](n + 1) else b
    require(buf.length == n + 1,
      s"vector_sum: mixed dimensions in one group (${buf.length - 1} vs $n)")
    var i = 0
    while (i < n) { buf(i) += arr.getFloat(i); i += 1 }
    buf(n) += 1.0
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"vector_sum: merging mixed dimensions (${a.length - 1} vs ${b.length - 1})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(b: Array[Double]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.length * 8)
    bb.putInt(b.length)
    b.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt())(bb.getDouble)
  }

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
  override def prettyName: String = "vector_sum"
}

object VectorSumAgg {
  /** Sum an `array<float>` column per group into `[sums…, count]`
    * (use inside `groupBy(...).agg(...)`). */
  def vector_sum(vec: Column): Column =
    ColumnBridge.column(
      VectorSumAgg(ColumnBridge.expression(vec)).toAggregateExpression())
}
