package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The streaming form of the [[graft.scale.CitationIndex]] maintenance
  * loop — the graph family's input kept current AS documents arrive,
  * in the [[IncrementalNearDup]] foreachBatch shape: every micro-batch
  * appends into the persisted citation index (O(batch) postings,
  * band-transition classification, dead-term accrual), so any graph
  * query ([[graft.scale.Graph.pageRankDirectedResumeQ]] included —
  * warm ranks + fresh edges compose into the fully-incremental graph
  * pipeline) reads edges that are exactly the from-scratch derivation
  * over everything streamed.
  *
  * Delivery contract: the index append is exactly-once-EFFECTIVE under
  * epoch replay — [[graft.scale.CitationIndex.append]] anti-joins the
  * committed-doc table, heals its own torn prefixes, and never
  * double-inserts postings; replayed edge-support rows are benign
  * (distinct-counted at read, folded at compaction). Batch ≡ stream is
  * therefore EXACT (the CitationIndexSpec append≡rebuild pin carries
  * over verbatim), not approximate. */
object IncrementalCitations {

  /** The foreachBatch body, usable directly in batch replays/tests. */
  def appendBatch(indexDir: String)(batch: DataFrame, epochId: Long): Unit =
    graft.scale.CitationIndex.append(batch, indexDir)

  /** Run the loop over a streaming `docs` source (doc_id, text).
    * `indexDir` must hold a built [[graft.scale.CitationIndex]] (build
    * over an empty frame for a cold start). */
  def run(docs: DataFrame, indexDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch(appendBatch(indexDir) _)
      .option("checkpointLocation", checkpoint)
      .start()
}
