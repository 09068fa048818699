package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a native Catalyst
  * expression with full codegen (`doGenCode`), so it runs inside
  * whole-stage codegen rather than through UDF boxing.
  *
  * h = fold over code points: h' = (h * 31 + cp) mod (2^31 - 1)
  *
  * The modulus keeps every intermediate below 2^36, so 64-bit arithmetic
  * is exact and the same fold is reproducible in any engine (the DuckDB
  * oracle uses list_reduce with identical arithmetic). Role: document
  * fingerprinting for the training-data pipeline (cheap content identity
  * robust to storage layout, cf. exact-dedup by hash).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    RollingHash.hash(s)
  }

  // NOTE: the helper must not be named `eval` — the case class inherits
  // UnaryExpression.eval(InternalRow), and a same-named companion member
  // suppresses the static forwarder, so the generated Java would only see
  // the instance method and Janino would fail to compile (falling back to
  // interpreted projections). CodegenCompileSpec guards this.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Mod = 2147483647L // 2^31 - 1

  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-level entry point (Spark 4 Column↔Expression bridge). */
  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  }
}
