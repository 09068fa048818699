package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.convert.MarkdownBlocks

/** Markdown → ordered blocks as a native Catalyst Generator (the T11
  * document→blocks generator, store_notion_blocks.py:115-119, in its
  * SQL-callable form — SURVEY §2.10's "custom Generator" goal).
  *
  * One markdown document row yields (pos, block_type, title) rows in
  * document order — the ordinal IS T12's BlockIndex, so
  * `SELECT doc_id, b.* FROM docs LATERAL VIEW explode_blocks(text) b`
  * replaces the flatMap + zipWithIndex path wherever SQL is the surface.
  * Pure per-row generation: parallelizes per document, no shuffle.
  */
case class ExplodeBlocks(child: Expression)
    extends UnaryExpression with CodegenFallback with Generator {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("block_type", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("language", StringType, nullable = false),
    StructField("caption", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"explode_blocks requires a string argument, got ${other.sql}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val md = child.eval(input)
    if (md == null) Nil
    else MarkdownBlocks.parseRich(md.asInstanceOf[UTF8String].toString)
      .zipWithIndex.map { case (b, i) =>
        InternalRow(i, UTF8String.fromString(b.blockType),
          UTF8String.fromString(b.title), UTF8String.fromString(b.language),
          UTF8String.fromString(b.caption))
      }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeBlocks =
    copy(child = newChild)
  override def prettyName: String = "explode_blocks"
}

object ExplodeBlocks {
  def explode_blocks(markdown: Column): Column =
    ColumnBridge.column(ExplodeBlocks(ColumnBridge.expression(markdown)))
}
