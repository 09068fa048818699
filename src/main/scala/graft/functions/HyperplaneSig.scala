package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature of an `array<float>` embedding as a
  * native expression: bit p of the result is the sign of the projection
  * onto pseudo-random hyperplane p.
  *
  * Matches the declarative formulation bit-for-bit (see the differential
  * spec): component (p, j) is derived from Spark's two-argument
  * `xxhash64(p*dim + j, 42)` mapped into [-1, 1). The component matrix
  * depends only on (planes, dim), so it is computed once per JVM and
  * cached — the per-row cost is a pure planes×dim multiply-add loop,
  * versus the HOF form's interpreted lambda + two hashes per component
  * per ROW. This is the candidate-generation primitive for embedding
  * near-dup at 100 TB (bucket = join key), so the per-row constant matters.
  */
case class HyperplaneSig(child: Expression, planes: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1 && planes <= 64, "planes must be in [1, 64]")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig requires array<float>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val comp = HyperplaneSig.components(planes, dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val row = comp(p)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += arr.getFloat(j).toDouble * row(j)
        j += 1
      }
      if (acc > 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSig {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** Pseudo-random component (p, j) ∈ [-1, 1): Spark's two-column
    * `xxhash64(p*dim + j, 42)` (int fold then int fold, seed 42), pmod
    * 1e6, scaled — identical arithmetic to the Column formulation. */
  private[functions] def component(idx: Int): Double = {
    val h1 = XXH64.hashInt(idx, 42L)
    val h = XXH64.hashInt(42, h1)
    val m = h % 1000000L
    val pm = if (m < 0) m + 1000000L else m
    pm.toDouble / 500000.0 - 1.0
  }

  private[functions] def components(planes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((planes, dim), { case (p0, d0) =>
      Array.tabulate(p0, d0)((p, j) => component(p * d0 + j))
    })

  def hyperplane_sig(embedding: Column, planes: Int): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(embedding), planes))
}
