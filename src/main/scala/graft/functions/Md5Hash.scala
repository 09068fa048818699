package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit md5 hash as one native expression:
  * digest → first 60 bits as a non-negative long.
  *
  * Value-identical to `conv(substring(md5(s), 1, 15), 16, 10)` (and to
  * DuckDB's `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`) — the
  * first 15 hex characters of the digest are its first 7.5 bytes, i.e.
  * the big-endian long of bytes 0–7 shifted right by 4, unsigned.
  * Going digest→long directly avoids the hex string, the substring
  * copy, and conv's base-16 parse, but the MD5 digest itself dominates
  * either way: measured ≈ parity with the composable chain at sf0.1.
  * Kept as the single named expression the portable sketch family
  * shares (one definition to keep in sync with the oracle SQL's form).
  */
case class Md5_64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val md = Md5_64.digests.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  override protected def withNewChildInternal(newChild: Expression): Md5_64 =
    copy(child = newChild)
  override def prettyName: String = "md5_64"
}

object Md5_64 {
  // MessageDigest is not thread-safe and per-row allocation is hot-path
  // garbage; one instance per executor thread
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def md5_64(c: Column): Column = ColumnBridge.column(Md5_64(
    ColumnBridge.expression(c)))

  /** Driver-side twin of the expression (same top-60-bits-of-md5), for
    * control-plane math like index bucket ids — never per-row data. */
  def hash60(s: String): Long = {
    val d = digests.get(); d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
    v >>> 4
  }
}
