package graft.model

/** Typed core records (SURVEY §1.1), with fixed explicit schemas where
  * the reference's stores were schemaless-by-convention. */

/** One wiki page from the dump (process-mw-dump.py:107-144). */
case class WikiPage(ns: Int, nsName: String, title: String, text: String)

/** Embedded upload from a File: page (process-mw-dump.py:147-155). */
case class EmbeddedFile(filename: String, encoding: String, contents: String)

/** One Notion block row (store_notion_blocks.py:116-137). The full
  * block payload is typed columns — not a pickle (SURVEY T14): `title`
  * is the text content, `language` the code-fence tag, `caption` the
  * image alt text (empty where not applicable), so rich blocks survive
  * the store→upload round trip losslessly. */
case class NotionBlock(
    blockBatch: String,
    blockIndex: Int,
    bucket: String,
    key: String,
    blockType: String,
    title: String,
    language: String = "",
    caption: String = "")

/** Page status record (store_notion_blocks.py:140-150;
  * upload_notion_blocks.py:129-149). */
case class PageRecord(
    blockBatch: String,
    key: String,
    status: String,
    statusTime: Long,
    pageUrl: Option[String])

object PageStatus {
  val New = "NEW"
  val Uploading = "UPLOADING"
  val Success = "SUCCESS"
  val Fail = "FAIL"
  val Aborted = "ABORTED"
  val all: Set[String] = Set(New, Uploading, Success, Fail, Aborted)
}

/** Failure record (store_notion_page_fails.py:61-67). */
case class FailureRecord(key: String, eventTime: Long, bucket: String)
