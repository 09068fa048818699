package graft.convert

/** Markdown → ordered Notion-style blocks generator (the md2notion
  * `convert` role, store_notion_blocks.py:115-119). One document becomes
  * an ordered sequence of typed blocks; ordinals are assigned by the
  * caller (posexplode / enumerate — T12).
  *
  * Block types mirror the md2notion output shape the reference filters
  * on (`type is TextBlock and title == "<!-- -->"`,
  * store_notion_blocks.py:119-127): here `text` blocks with title
  * `<!-- -->` are produced verbatim so the downstream F8 filter has the
  * same job.
  */
object MarkdownBlocks {

  /** (blockType, title) — title carries the block's text content, like
    * md2notion's block title attribute. */
  type Block = (String, String)

  private val headingRe = "^(#{1,6}) +(.*)$".r
  private val bulletRe = "^( *)- +(.*)$".r
  private val numberedRe = "^( *)\\d+\\. +(.*)$".r
  private val imageRe = "^!\\[([^\\]]*)\\]\\(([^)]+)\\)\\s*$".r

  /** Parse one markdown document into its ordered block list. Pure and
    * total. Contiguous non-empty plain lines merge into one paragraph
    * (text block); fenced code becomes a single code block; list items
    * are one block each (matching md2notion's block-per-item shape). */
  def parse(markdown: String): Seq[Block] = {
    if (markdown == null || markdown.isEmpty) return Seq.empty
    val out = Vector.newBuilder[Block]
    val para = new StringBuilder
    var inCode = false
    val code = new StringBuilder

    def flushPara(): Unit = if (para.nonEmpty) {
      out += (("text", para.toString))
      para.clear()
    }

    markdown.split("\n", -1).foreach { line =>
      if (inCode) {
        if (line.startsWith("```")) { out += (("code", code.toString)); code.clear(); inCode = false }
        else { if (code.nonEmpty) code.append('\n'); code.append(line) }
      } else line match {
        case l if l.startsWith("```") =>
          flushPara(); inCode = true
        case headingRe(hashes, title) =>
          flushPara()
          out += ((s"heading_${hashes.length}", title))
        case imageRe(_, path) =>
          flushPara(); out += (("image", path))
        case bulletRe(_, item) =>
          flushPara(); out += (("bulleted_list_item", item))
        case numberedRe(_, item) =>
          flushPara(); out += (("numbered_list_item", item))
        case "" => flushPara()
        case l if l.trim == "---" =>
          flushPara(); out += (("divider", ""))
        case l =>
          if (para.nonEmpty) para.append(' ')
          para.append(l)
      }
    }
    if (inCode) out += (("code", code.toString))
    flushPara()
    out.result()
  }

  /** The F8 filter predicate (store_notion_blocks.py:119-127): pandoc's
    * list-break comment artifacts must not become blocks. */
  def isPandocCommentArtifact(blockType: String, title: String): Boolean =
    blockType == "text" && title == "<!-- -->"
}
