package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword token count against an ARBITRARY vocab —
  * the trained-vocab form of `TextAnalysis.wordpieceCount`, whose
  * per-position `isin` literal chains are right for a frozen 22-entry
  * demo vocab but degenerate to O(vocab) comparisons per position. Here
  * the vocab is one hash set shipped with the expression (task-binary
  * distribution, the broadcast-closure pattern), so each position costs
  * at most `maxLen - 1` O(1) set probes regardless of vocab size: a
  * 30k-entry trained WordPiece/BPE vocabulary prices the same as a toy
  * one.
  *
  * Semantics (identical to wordpieceCount's fold, generalized to any
  * entry lengths): at each position take the LONGEST vocab entry
  * matching (ties impossible — lengths differ), advance by its length,
  * count one token; no entry → advance 1 (the single-char fallback is
  * implicit, as in WordPiece inference). A candidate window is only
  * probed when it fits entirely (substring truncation must not let a
  * short entry masquerade as a longer match). Empty/absent vocab
  * degrades to plain character count.
  *
  * Per-row work is a simple scan, evaluated via CodegenFallback (the
  * Md5_64 precedent): the JVM loop with hash probes beats what inline
  * codegen over a literal collection could emit, and the expression
  * still pipelines inside whole-stage-generated parents.
  */
case class SubwordCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(v => if (v.length >= 2) s.add(v))
    s
  }
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else math.max(1, vocab.map(_.length).max)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var pos = 0
    var cnt = 0
    while (pos < n) {
      var jump = 1
      var l = math.min(maxLen, n - pos)
      while (l >= 2 && jump == 1) {
        if (set.contains(s.substring(pos, pos + l))) jump = l
        l -= 1
      }
      pos += jump
      cnt += 1
    }
    cnt
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
  override def prettyName: String = "subword_count"
}

object SubwordCount {
  def subword_count(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(SubwordCount(ColumnBridge.expression(c), vocab))
}
