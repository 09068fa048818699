package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two `array<float>` columns as a native Catalyst
  * expression with full codegen.
  *
  * Replaces the `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)`
  * higher-order-function form: HOF lambdas are interpreted per element
  * (no whole-stage codegen, boxed doubles), which dominates the pairwise
  * loops of the ANN / embedding-near-dup operators — at 100 TB the dot
  * product runs O(pairs·dim) times, so it must be a tight primitive loop.
  *
  * Semantics match the HOF form bit-exactly, including its null cases:
  * a sequential left-to-right double-precision fold `acc += a[i]·b[i]`
  * from index 0; NULL when the array lengths differ (zip_with pads the
  * shorter side with nulls, which poisons the fold) or when any element
  * is null. The per-element null check is skipped entirely when both
  * input types declare `containsNull = false` (the usual embedding
  * schema), keeping the hot loop branch-free.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f requires two array<float> arguments, got ${l.sql}, ${r.sql}")
    }

  private lazy val checkElems: Boolean = Seq(left, right).exists {
    e => e.dataType.asInstanceOf[ArrayType].containsNull
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotChecked(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], checkElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double ${ev.value}_r =
      |  graft.functions.VectorOps.dotChecked($a, $b, $checkElems);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f"
}

/** Squared L2 distance of two `array<float>` columns — same native-fold
  * rationale and null semantics as [[DotProductF]]; used by the IVF
  * coarse quantizer where the assignment loop runs O(rows·centroids)
  * times. Fold is `acc += (a[i]-b[i])²` from index 0, bit-matching the
  * HOF form; NULL on length mismatch or null elements. */
case class L2Dist2F(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dist2_f requires two array<float> arguments, got ${l.sql}, ${r.sql}")
    }

  private lazy val checkElems: Boolean = Seq(left, right).exists {
    e => e.dataType.asInstanceOf[ArrayType].containsNull
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dist2Checked(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], checkElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double ${ev.value}_r =
      |  graft.functions.VectorOps.dist2Checked($a, $b, $checkElems);
      |if (${ev.value}_r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Dist2F =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dist2_f"
}

object VectorOps {
  /** Shared by interpreted eval and generated code. NULL (boxed) on
    * length mismatch, and — when `checkElems` — on any null element;
    * otherwise a branch-free primitive fold. */
  def dotChecked(a: ArrayData, b: ArrayData,
      checkElems: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    if (checkElems) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
    }
    acc
  }

  /** Shared by interpreted eval and generated code. Same null contract
    * as [[dotChecked]]. */
  def dist2Checked(a: ArrayData, b: ArrayData,
      checkElems: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    if (checkElems) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
        acc += d * d
        i += 1
      }
    } else {
      while (i < n) {
        val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
        acc += d * d
        i += 1
      }
    }
    acc
  }

  /** Column-level entry points (Spark 4 Column↔Expression bridge). */
  def dot_f(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DotProductF(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def dist2_f(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(L2Dist2F(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
