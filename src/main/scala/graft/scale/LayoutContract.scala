package graft.scale

import org.apache.spark.sql.SparkSession

/** THE BOUNDED-LISTING RULE (round-17 verdict item 8) — the one
  * geometry decision every persisted serving layout must make
  * DELIBERATELY, because it fixes who pays partition discovery at
  * 100 TB:
  *
  *  - **Bounded listing** (partition-dir count is a FIXED constant,
  *    corpus-independent): [[LshIndex]] and [[BmIndex]] hash into
  *    `Buckets = 64` dirs, [[CitationIndex]]'s postings into its own
  *    fixed 64. A per-read `spark.read.parquet` lists O(64) dirs no
  *    matter how large the corpus grows — no serving handle is NEEDED
  *    (file counts inside each bucket still grow; compaction bounds
  *    them, not the listing). The price is that one bucket holds
  *    1/64th of the corpus, so probe cost is governed by the pruned
  *    FRACTION, not the dir count — fine for df-bounded and
  *    band-bucket probes whose selectivity comes from the join, not
  *    the directory tree.
  *
  *  - **Corpus-proportional listing** (dir count grows with the
  *    data): [[IvfIndex]] and [[IvfPqIndex]] write one dir per
  *    cluster and nlist ∝ corpus is the recall rule, so per-read
  *    discovery cost GROWS with the corpus — measured at 11× probe
  *    inflation at 100× corpus from the listing alone
  *    (bench_scale.json r17). [[Layout]]'s z buckets likewise scale
  *    with the table (~fixed bytes per bucket). These layouts richly
  *    prune (a probe reads nProbe of nlist dirs — the POINT of the
  *    geometry), but every read must amortize discovery: the serving
  *    handle ([[IvfIndex.openHandle]]/[[IvfPqIndex.openHandle]]) lists
  *    once and probes many, generation-checked so a fold under it
  *    refuses instead of FNF-looping.
  *
  *  - **History-proportional listing**: [[ClusterStore]]'s per-epoch
  *    trees (`posts/e=E/hb=H`) list O(fixed buckets × committed
  *    epochs); the compaction fold is the bound on the epoch factor.
  *
  * A new layout must pick a side: fixed buckets (cheap discovery,
  * fraction-governed probes, no handle) or data-proportional dirs
  * (rich pruning, handle REQUIRED at scale). LayoutContractSpec
  * machine-checks the table below against the dirs each family
  * actually writes, so the classification cannot silently drift. */
object LayoutContract {

  /** Listing-cost class per layout family (the
    * [[SnapshotManifest.committedEpochOf]] family names). */
  sealed trait ListingClass
  /** Partition-dir count is a fixed constant — corpus-independent. */
  case object Bounded extends ListingClass
  /** Partition-dir count grows with the corpus — serving reads must
    * amortize discovery through a handle. */
  case object CorpusProportional extends ListingClass
  /** Dir count grows with committed history; compaction is the bound. */
  case object HistoryProportional extends ListingClass

  val classOf: Map[String, ListingClass] = Map(
    "lsh" -> Bounded,
    "bm" -> Bounded,
    "citation" -> Bounded,
    "clusters" -> HistoryProportional,
    "zorder" -> CorpusProportional,
    "ivf" -> CorpusProportional,
    "ivfpq" -> CorpusProportional)

  /** The fixed bucket constants the Bounded classification rests on —
    * checked here so a change to any of them re-raises the question
    * instead of silently breaking the rule. */
  require(LshIndex.Buckets == 64L && BmIndex.Buckets == 64L &&
    CitationIndex.Buckets == 64L,
    "a Bounded layout changed its fixed bucket constant — re-confirm " +
      "its listing class in LayoutContract before shipping")

  /** First-level partition-dir count under `dir` — the quantity the
    * listing classes bound. Test/diagnostic surface. */
  def partitionDirCount(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).count(st => st.isDirectory &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
  }
}
