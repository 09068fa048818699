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

  /** A block with its full payload (T14 parity: the reference pickles
    * the whole md2notion block object, store_notion_blocks.py:134 —
    * here the rich attributes are typed, prunable columns instead of an
    * opaque blob). `language` is the code-fence info string (code
    * blocks), `caption` the image alt text (image blocks); empty
    * elsewhere. */
  final case class RichBlock(
      blockType: String, title: String, language: String, caption: String)

  private val headingRe = "^(#{1,6}) +(.*)$".r
  private val bulletRe = "^( *)- +(.*)$".r
  private val numberedRe = "^( *)\\d+\\. +(.*)$".r
  private val imageRe = "^!\\[([^\\]]*)\\]\\(([^)]+)\\)\\s*$".r

  /** Parse one markdown document into its ordered block list. Pure and
    * total. Contiguous non-empty plain lines merge into one paragraph
    * (text block); fenced code becomes a single code block (keeping the
    * fence's language tag); list items are one block each (matching
    * md2notion's block-per-item shape); images keep their alt text as
    * the caption. */
  def parseRich(markdown: String): Seq[RichBlock] = {
    if (markdown == null || markdown.isEmpty) return Seq.empty
    val out = Vector.newBuilder[RichBlock]
    val para = new StringBuilder
    var inCode = false
    var codeLang = ""
    val code = new StringBuilder

    def flushPara(): Unit = if (para.nonEmpty) {
      out += RichBlock("text", para.toString, "", "")
      para.clear()
    }

    markdown.split("\n", -1).foreach { line =>
      if (inCode) {
        if (line.startsWith("```")) {
          out += RichBlock("code", code.toString, codeLang, "")
          code.clear(); inCode = false; codeLang = ""
        } else { if (code.nonEmpty) code.append('\n'); code.append(line) }
      } else line match {
        case l if l.startsWith("```") =>
          flushPara(); inCode = true; codeLang = l.substring(3).trim
        case headingRe(hashes, title) =>
          flushPara()
          out += RichBlock(s"heading_${hashes.length}", title, "", "")
        case imageRe(alt, path) =>
          flushPara(); out += RichBlock("image", path, "", alt)
        case bulletRe(_, item) =>
          flushPara(); out += RichBlock("bulleted_list_item", item, "", "")
        case numberedRe(_, item) =>
          flushPara(); out += RichBlock("numbered_list_item", item, "", "")
        case "" => flushPara()
        case l if l.trim == "---" =>
          flushPara(); out += RichBlock("divider", "", "", "")
        case l =>
          if (para.nonEmpty) para.append(' ')
          para.append(l)
      }
    }
    if (inCode) out += RichBlock("code", code.toString, codeLang, "")
    flushPara()
    out.result()
  }

  /** The (blockType, title) projection of [[parseRich]]. */
  def parse(markdown: String): Seq[Block] =
    parseRich(markdown).map(b => (b.blockType, b.title))

  /** The F8 filter predicate (store_notion_blocks.py:119-127): pandoc's
    * list-break comment artifacts must not become blocks. */
  def isPandocCommentArtifact(blockType: String, title: String): Boolean =
    blockType == "text" && title == "<!-- -->"
}
