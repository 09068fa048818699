package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.scale.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data-pipeline operator catalogue (dedup, similarity search,
  * text analysis, multimodal) exercised over the `documents` and
  * `embeddings` tables. Float-valued outputs are quantized (`floor(x*1e9)`
  * etc.) and every float fold is sequential, so DuckDB oracles compare
  * bit-exactly where SQL can express the op; hash-based ops (MinHash,
  * SimHash, LSH) are rows-only checked and pinned by ScalaTest instead.
  */
object ScaleCatalogue {

  private def q(c: Column, scale: Double = 1e9): Column =
    floor(c * lit(scale)).cast("long")

  /** Construct independent serving branches CONCURRENTLY (optimization
    * guide §2.6 — overlap independent jobs): the as-of/indexed serving
    * paths each run several EAGER driver-side control-plane actions
    * (committed-epoch requires, probe-bucket collects, registry
    * localCheckpoints), and composing the branches on one thread
    * serializes those actions even though Spark's scheduler would
    * happily overlap them. Running the CONSTRUCTION of each branch on
    * its own thread lets branch B's control-plane jobs back-fill the
    * cores branch A's leave idle. Results are unchanged — the returned
    * frames are the same lazily-composed plans; only the eager setup
    * work overlaps (measured at sf0.1, 5 idle reps: q189 4.97 → 2.52 s,
    * q191 7.51 → 1.71 s — OPTIMIZATION_r20.md change 1). One shared
    * implementation since r21 (round-20 advice item 3): these are
    * [[graft.scale.IndexIo.concurrently]]'s all-branches-awaited
    * semantics, not local copies. */
  private def inParallel[A, B](a: => A, b: => B): (A, B) =
    graft.scale.IndexIo.concurrently(a, b)
  private def inParallel3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) =
    graft.scale.IndexIo.concurrently3(a, b, c)

  /** DuckDB fragment: sequential double fold of a[i]*b[i]. */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1,65), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x,y) -> x+y)"
  private def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  // ---------------------------------------------------------------------
  // q30 — exact dedup groups (hash-groupBy family)
  // ---------------------------------------------------------------------
  def q30DedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exactGroups(documents(s, d)).orderBy(col("keep_id"))
  val q30Sql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS dup_count
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------------
  // q31 — n-gram Jaccard near-dup pairs via inverted shingle index
  // ---------------------------------------------------------------------
  def q31NgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(documents(s, d), n = 5, threshold = 0.8)
      .select(col("d1"), col("d2"), col("common"), col("n1"), col("n2"),
        q(col("jaccard"), 1e6).as("jaccard_q"))
      .orderBy(col("d1"), col("d2"))
  val q31Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |sh0 AS (SELECT DISTINCT doc_id, sh FROM (
      |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) t)),
      |tot AS (SELECT count(*) AS n_docs FROM documents),
      |sh AS (
      |  SELECT s.doc_id, s.sh FROM sh0 s
      |  JOIN (SELECT sh, count(*) AS df FROM sh0 GROUP BY sh) d ON s.sh = d.sh, tot
      |  WHERE d.df <= greatest(100, CAST(ceil(tot.n_docs * 0.01) AS BIGINT))),
      |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT d1, d2, common, ca.n_sh AS n1, cb.n_sh AS n2,
      |  CAST(floor(common::DOUBLE / (ca.n_sh + cb.n_sh - common) * 1000000.0) AS BIGINT) AS jaccard_q
      |FROM pairs JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id
      |WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= 0.8
      |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------------
  // q67 — dedup cluster resolution: near-dup pairs (q31's candidates) →
  // connected components via min-label propagation; every document is
  // labeled with its component's minimum doc id (the canonical keeper).
  // Oracle: DuckDB recursive-CTE transitive closure over the same pairs.
  // ---------------------------------------------------------------------
  def q67DedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(documents(s, d), n = 5, threshold = 0.8)
      .select(col("d1"), col("d2"))
    Dedup.connectedComponents(pairs)
      .withColumn("is_canonical", (col("doc_id") === col("cluster")).cast("int"))
      .orderBy(col("cluster"), col("doc_id"))
  }
  val q67Sql: String =
    """WITH RECURSIVE tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |sh0 AS (SELECT DISTINCT doc_id, sh FROM (
      |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) t)),
      |tot AS (SELECT count(*) AS n_docs FROM documents),
      |sh AS (
      |  SELECT s.doc_id, s.sh FROM sh0 s
      |  JOIN (SELECT sh, count(*) AS df FROM sh0 GROUP BY sh) d ON s.sh = d.sh, tot
      |  WHERE d.df <= greatest(100, CAST(ceil(tot.n_docs * 0.01) AS BIGINT))),
      |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |np AS (
      |  SELECT d1, d2 FROM pairs
      |  JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id
      |  WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= 0.8),
      |sym AS (SELECT d1 AS a, d2 AS b FROM np UNION SELECT d2, d1 FROM np),
      |reach AS (
      |  SELECT a AS v, a AS r FROM sym
      |  UNION
      |  SELECT s.a, t.r FROM sym s JOIN reach t ON s.b = t.v)
      |SELECT v AS doc_id, min(r) AS cluster,
      |  CASE WHEN v = min(r) THEN 1 ELSE 0 END AS is_canonical
      |FROM reach GROUP BY v ORDER BY cluster, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q32/q33 — MinHash-LSH and SimHash near-dup pairs (hash-based: no SQL
  // oracle; pinned by DedupSpec against the Jaccard ground truth)
  // ---------------------------------------------------------------------
  def q32MinhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(documents(s, d), n = 5, numHashes = 32, bands = 8,
        threshold = 0.5)
      .select(col("d1"), col("d2"), col("matches"))
      .orderBy(col("d1"), col("d2"))

  def q33SimhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(documents(s, d), maxHamming = 3)
      .orderBy(col("d1"), col("d2"))

  // ---------------------------------------------------------------------
  // q71/q72 — the portable sketch companions: the SAME MinHash-LSH /
  // SimHash pipelines as q32/q33, but with md5-derived hash families
  // that DuckDB reproduces bit-for-bit (md5_64 = first 15 hex chars of
  // md5 as BIGINT). This moves the sketch family out of the rows-only
  // bucket: signatures, banding, candidate generation AND verification
  // are all hash-checked by an external engine. q32/q33 stay as the
  // xxhash64 production paths (same shapes, ~20× cheaper hashing).
  // ---------------------------------------------------------------------
  def q71MinhashPortable(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairsPortable(documents(s, d), n = 5, numHashes = 16,
        bands = 4, minMatches = 8)
      .orderBy(col("d1"), col("d2"))
  val q71Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |sh AS (SELECT DISTINCT doc_id, sh FROM (
      |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) t)),
      |h0 AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
      |  FROM sh),
      |hx AS (
      |  SELECT doc_id, i,
      |    min(((1000003 * (i + 1)) * (h >> 30) +
      |         (999983 * (i + 1) + 12345) * (h & 1073741823) + i)
      |        % 2305843009213693951) AS mh
      |  FROM h0, LATERAL (SELECT unnest(range(0, 16)) AS i) r
      |  GROUP BY doc_id, i),
      |bk AS (
      |  SELECT doc_id, CAST(i // 4 AS INT) AS band,
      |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bk
      |  FROM hx GROUP BY doc_id, i // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bk a JOIN bk b
      |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
      |m AS (
      |  SELECT c.d1, c.d2,
      |    CAST(sum(CASE WHEN ha.mh = hb.mh THEN 1 ELSE 0 END) AS BIGINT) AS matches
      |  FROM cand c
      |  JOIN hx ha ON ha.doc_id = c.d1
      |  JOIN hx hb ON hb.doc_id = c.d2 AND hb.i = ha.i
      |  GROUP BY c.d1, c.d2)
      |SELECT d1, d2, matches FROM m WHERE matches >= 8
      |ORDER BY d1, d2""".stripMargin

  def q72SimhashPortable(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairsPortable(documents(s, d), maxHamming = 3)
      .orderBy(col("d1"), col("d2"))
  val q72Sql: String =
    """WITH tk AS (
      |  SELECT doc_id, tk, count(*) AS cnt FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents) t
      |  GROUP BY doc_id, tk),
      |th AS (
      |  SELECT doc_id, cnt,
      |    CAST('0x' || substr(md5(tk), 1, 15) AS BIGINT) AS h FROM tk),
      |bits AS (
      |  SELECT doc_id, i,
      |    sum(CASE WHEN (h >> i) & 1 = 1 THEN cnt ELSE -cnt END) AS s
      |  FROM th, LATERAL (SELECT unnest(range(0, 60)) AS i) r
      |  GROUP BY doc_id, i),
      |fp AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS fp
      |  FROM bits GROUP BY doc_id),
      |ch AS (
      |  SELECT doc_id, fp, c AS ci, (fp >> (c * 15)) & 32767 AS cv
      |  FROM fp, LATERAL (SELECT unnest(range(0, 4)) AS c) cc),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM ch a JOIN ch b
      |    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
      |SELECT c.d1, c.d2, bit_count(xor(fa.fp, fb.fp)) AS hamming
      |FROM cand c
      |JOIN fp fa ON fa.doc_id = c.d1
      |JOIN fp fb ON fb.doc_id = c.d2
      |WHERE bit_count(xor(fa.fp, fb.fp)) <= 3
      |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------------
  // q34 — brute-force cosine top-k ANN (the correctness baseline)
  // ---------------------------------------------------------------------
  def q34AnnBrute(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }
  val q34Sql: String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    ${duckCos("q.embedding", "c.embedding")} AS sim
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, CAST(floor(sim * 1000000000.0) AS BIGINT) AS sim_q
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q35 — IVF ANN: coarse quantizer + probed clusters (the scale path)
  // ---------------------------------------------------------------------
  /** Centroid count of the stride quantizer over a dataset's embeddings,
    * memoized per (dir, stride, source fingerprint): threading a KNOWN
    * count into Similarity.assign makes its flat-vs-two-level dispatch
    * run ZERO extra Spark jobs in steady state (round 8 paid one count
    * job per q35/q86 run — verdict item 2; the first call per dataset
    * still pays one tiny count over the pruned centroid scan, and the
    * fingerprint keys out in-place regeneration like q85's marker). */
  private val strideCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
  private def strideCentroidCount(s: SparkSession, d: String,
      stride: Int): Long = {
    val key = s"$d#$stride#${
      datasetFingerprint(new java.io.File(d, "embeddings.parquet"))}"
    strideCountCache.computeIfAbsent(key, _ =>
      graft.scale.Similarity.strideCentroids(embeddings(s, d), stride).count())
  }

  def q35AnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        stride = 97, nProbe = 3,
        centroidCount = Some(strideCentroidCount(s, d, 97)))
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }
  // ---------------------------------------------------------------------
  // q85 — IVF ANN over the MATERIALIZED bucketed layout (scale/IvfIndex):
  // same coarse quantizer and scoring as q35, but the corpus is read
  // from a parquet layout partitioned by cluster_id and the probe set
  // becomes a partition filter, so only probed buckets are scanned
  // (IvfIndexSpec proves the pruned scan from the executed plan). The
  // oracle is q35's SQL verbatim — the two paths are result-identical
  // by construction. The index is built once per dataset (marker file)
  // and reused, mirroring the build-once/query-many production shape.
  // ---------------------------------------------------------------------
  /** Identity fingerprint of a parquet dataset (single file or
    * directory of part files): file count, total bytes, max mtime.
    * Regenerating the dataset in place (same path, new contents)
    * changes it, so a cached derived layout keyed on it can never
    * silently serve stale data. */
  private def datasetFingerprint(path: java.io.File): String = {
    val fs =
      if (path.isFile) Array(path)
      else Option(path.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
    s"n=${fs.length};bytes=${fs.map(_.length).sum};mtime=${
      (0L +: fs.map(_.lastModified)).max}"
  }

  /** Build-once/query-many cache of a derived index layout under
    * `target/<family>/<dataset-basename>`. The marker file carries a
    * format VERSION plus the source-dataset fingerprint, so a format
    * bump (bump the version at the call site) or a regenerated dataset
    * rebuilds the layout instead of silently serving stale results —
    * ONE staleness definition for every cached index family. Returns
    * the index dir. */
  private def cachedIndexDir(family: String, d: String, version: String,
      datasets: Seq[String] = Seq("embeddings.parquet"))(
      buildFn: String => Unit): String = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val dir = new java.io.File(
      s"target/$family", new java.io.File(d).getName).getPath
    val marker = new java.io.File(dir, "_graft_built")
    // fingerprint EVERY input dataset the build derives from — an
    // index built from a join must go stale when either side changes
    val fp = version + ";" + datasets.map(ds =>
      datasetFingerprint(new java.io.File(d, ds))).mkString("|")
    def stale = !marker.exists() ||
      new String(java.nio.file.Files.readAllBytes(marker.toPath), utf8) != fp
    if (stale) {
      // CROSS-PROCESS BUILD LOCK (r21): `sbt test` now runs suites in
      // parallel forked JVMs, and two of them racing a cold fixture
      // into the same target/<family> dir would tear it. A file lock
      // serializes first-builds per family dir (warm reads never take
      // it — the fast path above stays lock-free); the in-JVM monitor
      // guards the same race between threads of ONE JVM, where a
      // second FileChannel.lock would throw Overlapping instead of
      // blocking. Stale is re-checked under the lock: the loser of
      // the race finds the winner's marker and skips its build.
      cachedBuildMonitor.synchronized {
        new java.io.File(dir).getParentFile.mkdirs()
        val lockPath = new java.io.File(
          new java.io.File(dir).getParent, s".${new java.io.File(dir).getName}.buildlock")
        val raf = new java.io.RandomAccessFile(lockPath, "rw")
        try {
          val lock = raf.getChannel.lock()
          try if (stale) {
            buildFn(dir)
            java.nio.file.Files.write(marker.toPath, fp.getBytes(utf8))
          } finally lock.release()
        } finally raf.close()
      }
    }
    dir
  }
  private val cachedBuildMonitor = new Object

  def q85AnnIvfIndexed(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    // "v2": index format version (dist2 column + _ivf_meta.json) — a
    // round-8 cached index predates both and must rebuild once
    val dir = cachedIndexDir("ivf-index", d, "v2") { p =>
      graft.scale.IvfIndex.build(emb, centroids, p,
        centroidCount = Some(strideCentroidCount(s, d, 97)))
    }
    graft.scale.IvfIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 5, nProbe = 3)
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------------
  // q86 — SemDeDup-style semantic dedup: k-means-blocked exact cosine
  // (Abbas et al. 2023). The coarse quantizer that serves q35/q85 as an
  // ANN index doubles as the dedup blocking key — pair cost is
  // Σ(cluster²), never corpus², and the join key is the small cluster
  // id. The catalogue form keeps each cluster's top-2 most similar
  // pairs (rank-based, SF-robust) rather than a fixed threshold.
  // ---------------------------------------------------------------------
  def q86SemanticDedup(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    // NegativeInfinity: the oracle keeps ALL within-cluster pairs, so
    // the Spark side must too — a 0.0 threshold would silently drop
    // negative-cosine pairs the DuckDB ranking still sees
    val pairs = graft.scale.Similarity
      .semanticDedupPairs(emb, centroids, threshold = Double.NegativeInfinity,
        centroidCount = Some(strideCentroidCount(s, d, 97)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("sim").desc, col("d1").asc, col("d2").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select(col("cluster_id"), col("rank"), col("d1"), col("d2"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("cluster_id"), col("rank"))
  }
  val q86Sql: String =
    s"""WITH cent AS (
       |  SELECT vec_id AS centroid_id, embedding AS c_emb
       |  FROM embeddings WHERE vec_id % 97 = 0),
       |corpus_d AS (
       |  SELECT a.vec_id, a.embedding, c.centroid_id,
       |    ${duckDist2("a.embedding", "c.c_emb")} AS dist2
       |  FROM embeddings a, cent c),
       |assigned AS (
       |  SELECT vec_id, embedding, centroid_id AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, centroid_id ASC) AS rk
       |    FROM corpus_d) t WHERE rk = 1),
       |p AS (
       |  SELECT a.cluster_id, a.vec_id AS d1, b.vec_id AS d2,
       |    ${duckCos("a.embedding", "b.embedding")} AS sim
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id),
       |ranked AS (
       |  SELECT cluster_id, d1, d2, sim,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY sim DESC, d1 ASC, d2 ASC) AS rank
       |  FROM p)
       |SELECT cluster_id, rank, d1, d2,
       |  CAST(floor(sim * 1000000000.0) AS BIGINT) AS sim_q
       |FROM ranked WHERE rank <= 2 ORDER BY cluster_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q87 — two-level (hierarchical) coarse-quantizer assignment, FORCED
  // down the O(n·√k) super-cluster path regardless of centroid count:
  // the oracle replays the FLAT n×k argmin relationally, so a hash-exact
  // pass is a machine-checked proof that the triangle-inequality-pruned
  // hierarchical assignment is bit-identical to the brute-force one on
  // this corpus — the equivalence the 1e8-doc scale design rests on
  // (Similarity.assignTwoLevel). Stride 23 (not 97) so the centroid set
  // is dense enough that pruning actually discards supers at sf gate
  // scales.
  // ---------------------------------------------------------------------
  def q87TwoLevelAssign(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    // the centroid plan is a pruned parquet filter — cheap to
    // re-evaluate, so no persist (CacheHygieneSpec: catalogue queries
    // must leave the block store untouched)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 23)
    graft.scale.Similarity.assignTwoLevel(emb, centroids, "vec_id",
      knownK = Some(strideCentroidCount(s, d, 23)))
      .select(col("vec_id"), col("centroid_id").as("cluster_id"))
      .orderBy(col("vec_id"))
  }
  val q87Sql: String =
    s"""WITH cent AS (
       |  SELECT vec_id AS centroid_id, embedding AS c_emb
       |  FROM embeddings WHERE vec_id % 23 = 0),
       |corpus_d AS (
       |  SELECT a.vec_id, c.centroid_id,
       |    ${duckDist2("a.embedding", "c.c_emb")} AS dist2
       |  FROM embeddings a, cent c)
       |SELECT vec_id, centroid_id AS cluster_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY dist2 ASC, centroid_id ASC) AS rk
       |  FROM corpus_d) t WHERE rk = 1
       |ORDER BY vec_id""".stripMargin

  private def duckDist2(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1,65), " +
      s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE)))," +
      s" (x,y) -> x+y)"
  /** The q35 IVF replay (frozen stride centroids, assignment, probe,
    * cosine ranking) over a parameterized corpus-embedding table —
    * q35/q85 read `embeddings` as stored; q158's upsert oracle
    * substitutes a table whose revised slice carries the new vectors
    * while centroids stay FROZEN on the originals (the upsert
    * contract), so hash equality proves upsert ≡ rebuilt-from-revised.
    * `prelude` defines the corpus CTE when it isn't the raw table. */
  private def ivfProbeSqlOver(corpusTable: String,
      prelude: String = ""): String =
    s"""WITH ${prelude}cent AS (
       |  SELECT vec_id AS centroid_id, embedding AS c_emb
       |  FROM embeddings WHERE vec_id % 97 = 0),
       |corpus_d AS (
       |  SELECT a.vec_id, a.embedding, c.centroid_id,
       |    ${duckDist2("a.embedding", "c.c_emb")} AS dist2
       |  FROM $corpusTable a, cent c),
       |assigned AS (
       |  SELECT vec_id, embedding, centroid_id AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, centroid_id ASC) AS rk
       |    FROM corpus_d) t WHERE rk = 1),
       |probe_d AS (
       |  SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.centroid_id,
       |    ${duckDist2("q.embedding", "c.c_emb")} AS dist2
       |  FROM embeddings q, cent c WHERE q.vec_id < 10),
       |probes AS (
       |  SELECT query_id, q_emb, centroid_id AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, centroid_id ASC) AS rk
       |    FROM probe_d) t WHERE rk <= 3),
       |scored AS (
       |  SELECT p.query_id, a.vec_id, ${duckCos("p.q_emb", "a.embedding")} AS sim
       |  FROM probes p JOIN assigned a USING (cluster_id)
       |  WHERE p.query_id <> a.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, CAST(floor(sim * 1000000000.0) AS BIGINT) AS sim_q
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val q35Sql: String = ivfProbeSqlOver("embeddings")

  // ---------------------------------------------------------------------
  // q52 — embedding-cosine near-dup: the fifth dedup family (exact,
  // n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine). Blocked
  // pairwise: candidates are generated only within a blocking key
  // (`label` here — at 100 TB the block key is the hyperplane-LSH bucket
  // from Similarity.cosineNearDupPairs, and the corpus is bucketed by it
  // so the quadratic term is bounded per block and raw vectors never
  // shuffle twice). Per block the top-3 most-similar pairs are the
  // near-dup candidates; keep_id < dup_id is the survivorship rule.
  // ---------------------------------------------------------------------
  def q52EmbedNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    // norms once per row (O(n)), not per pair (O(n²)) — bit-identical fold
    val a = emb.select(col("label"), col("vec_id").as("keep_id"),
      col("embedding").as("e1"), Similarity.norm(col("embedding")).as("n1"))
    val b = emb.select(col("label"), col("vec_id").as("dup_id"),
      col("embedding").as("e2"), Similarity.norm(col("embedding")).as("n2"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
      .orderBy(col("sim").desc, col("keep_id").asc, col("dup_id").asc)
    a.join(b, Seq("label")).filter(col("keep_id") < col("dup_id"))
      .withColumn("sim",
        Similarity.dot(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("label"), col("rank"), col("keep_id"), col("dup_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("label"), col("rank"))
  }
  val q52Sql: String =
    s"""WITH p AS (
       |  SELECT a.label, a.vec_id AS keep_id, b.vec_id AS dup_id,
       |    ${duckCos("a.embedding", "b.embedding")} AS sim
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id < b.vec_id),
       |ranked AS (
       |  SELECT label, keep_id, dup_id, sim,
       |    row_number() OVER (PARTITION BY label
       |      ORDER BY sim DESC, keep_id ASC, dup_id ASC) AS rank
       |  FROM p)
       |SELECT label, rank, keep_id, dup_id,
       |  CAST(floor(sim * 1000000000.0) AS BIGINT) AS sim_q
       |FROM ranked WHERE rank <= 3 ORDER BY label, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q36 — language ID (marker-based heuristic, argmax with det. ties)
  // ---------------------------------------------------------------------
  def q36LangId(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("predicted"))
      .orderBy(col("doc_id"))
  val q36Sql: String = {
    val langs = TextAnalysis.markers.keys.toSeq.sorted
    val scores = langs.map { l =>
      val words = TextAnalysis.markers(l).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($words))) AS s_$l"
    }.mkString(",\n  ")
    val g = langs.map(l => s"s_$l").mkString(", ")
    val cases = langs.map(l => s"WHEN s_$l = g THEN '$l'").mkString(" ")
    s"""SELECT doc_id, lang, predicted FROM (
       |  SELECT doc_id, lang, greatest($g) AS g,
       |    CASE WHEN greatest($g) <= 0 THEN 'und' $cases END AS predicted
       |  FROM (SELECT doc_id, lang, $scores FROM documents) t) t2
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q37 — quality scoring features
  // ---------------------------------------------------------------------
  def q37Quality(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), TextAnalysis.qualityFeatures(col("text")).as("f"))
      .select(col("doc_id"), col("f.n_chars").as("n_chars"),
        col("f.n_words").as("n_words"),
        col("f.avg_word_len_q").as("avg_word_len_q"),
        col("f.punct_count").as("punct_count"),
        col("f.stopword_hits").as("stopword_hits"),
        col("f.stopword_ratio_q").as("stopword_ratio_q"))
      .orderBy(col("doc_id"))
  val q37Sql: String = {
    val stop = TextAnalysis.markers("en").map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  length(text) AS n_chars,
       |  len(string_split(text, ' ')) AS n_words,
       |  CAST(floor((length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
       |    / len(string_split(text, ' ')) * 1000000.0) AS BIGINT) AS avg_word_len_q,
       |  len(list_filter(string_split(text, ''), c -> c IN ('.', ',', '!', '?', ';', ':'))) AS punct_count,
       |  len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS stopword_hits,
       |  CAST(floor(len(list_filter(string_split(text, ' '), t -> t IN ($stop)))::DOUBLE
       |    / len(string_split(text, ' ')) * 1000000.0) AS BIGINT) AS stopword_ratio_q
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q38 — token counting (whitespace + BPE-ish regex)
  // ---------------------------------------------------------------------
  def q38Tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokenCounts(col("text")).as("t"))
      .select(col("doc_id"), col("t.ws_tokens").as("ws_tokens"),
        col("t.bpe_tokens").as("bpe_tokens"))
      .orderBy(col("doc_id"))
  val q38Sql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q39 — document fingerprint via the native RollingHash expression
  // ---------------------------------------------------------------------
  def q39Fingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  val q39Sql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(0::BIGINT, list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
      |    (h, c) -> (h * 31 + c) % 2147483647) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q40 — embedding L2 norms (vector math sanity + fold parity)
  // ---------------------------------------------------------------------
  def q40EmbedNorm(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), col("label"),
        q(Similarity.norm(col("embedding"))).as("norm_q"),
        size(col("embedding")).as("dim"))
      .orderBy(col("vec_id"))
  val q40Sql: String =
    s"""SELECT vec_id, label,
       |  CAST(floor(sqrt(${duckDot("embedding", "embedding")}) * 1000000000.0) AS BIGINT) AS norm_q,
       |  len(embedding) AS dim
       |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q41 — multimodal decode plumbing (stub codec). Builds GFT0-framed
  // bytes from document text, runs the batched mapPartitions decode,
  // projects meta. Oracle-checked since round 3: the media is
  // SYNTHESIZED from (doc_id, text) by a known rule, so the oracle
  // derives every output analytically (width = id%640+1, payload_len =
  // utf8 length, every 97th row malformed, ...) WITHOUT parsing bytes —
  // the Spark side must reproduce those values through the real
  // encode→decode byte round-trip, which pins the header layout,
  // byte order, and failure routing end to end.
  // ---------------------------------------------------------------------
  def q41MediaDecode(s: SparkSession, d: String): DataFrame = {
    val mkBytes = udf { (id: Long, text: String) =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      Multimodal.MediaCodec.encode(kind, (id % 640).toInt + 1,
        (id % 480).toInt + 1, id * 40L, text.getBytes("UTF-8"))
    }
    val media = documents(s, d).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      // every 97th row gets malformed bytes: exercises the failure path
      when(col("doc_id") % 97 === 0, lit(Array[Byte](1, 2, 3)))
        .otherwise(mkBytes(col("doc_id"), col("text"))).as("bytes"))
    Multimodal.decode(media)
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("format"), col("duration_ms"), col("payload_len"), col("decode_ok"))
      .orderBy(col("media_id"))
  }
  val q41Sql: String =
    """WITH k AS (
      |  SELECT doc_id, text,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    doc_id % 97 = 0 AS bad
      |  FROM documents)
      |SELECT doc_id AS media_id, kind,
      |  CASE WHEN bad THEN NULL
      |    ELSE CAST(doc_id % 640 + 1 AS INTEGER) END AS width,
      |  CASE WHEN bad THEN NULL
      |    ELSE CAST(doc_id % 480 + 1 AS INTEGER) END AS height,
      |  CASE WHEN bad THEN NULL ELSE kind END AS format,
      |  CASE WHEN bad THEN NULL ELSE CAST(doc_id * 40 AS BIGINT) END AS duration_ms,
      |  CASE WHEN bad THEN CAST(3 AS INTEGER)
      |    ELSE CAST(octet_length(encode(text)) AS INTEGER) END AS payload_len,
      |  NOT bad AS decode_ok
      |FROM k ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------
  // q53 — multimodal frame sampling: binary payload → every 4th 64-byte
  // frame (the video-frame-extraction shape: a 1→N generator over the
  // bytes column, zero shuffle). The projection (frame ordinal + length)
  // is arithmetic on the payload size, so DuckDB can oracle it even
  // though the frame bytes themselves come from the stub codec.
  // ---------------------------------------------------------------------
  def q53MediaFrames(s: SparkSession, d: String): DataFrame = {
    val mkBytes = udf { (id: Long, text: String) =>
      Multimodal.MediaCodec.encode("video", (id % 640).toInt + 1,
        (id % 480).toInt + 1, id * 40L, text.getBytes("UTF-8"))
    }
    val media = documents(s, d).select(col("doc_id").as("media_id"),
      mkBytes(col("doc_id"), col("text")).as("bytes"))
    Multimodal.sampleFrames(media, frameSize = 64, stride = 4)
      .select(col("media_id"), col("frame_index").cast("long").as("frame_index"),
        length(col("frame")).cast("long").as("frame_len"))
      .orderBy(col("media_id"), col("frame_index"))
  }
  val q53Sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, octet_length(encode(text)) AS plen
      |  FROM documents),
      |f AS (
      |  SELECT media_id, unnest(range(0, (plen + 63) // 64)) AS frame_index, plen
      |  FROM m WHERE plen > 0)
      |SELECT media_id, frame_index,
      |  least(64, plen - 64 * frame_index)::BIGINT AS frame_len
      |FROM f WHERE frame_index % 4 = 0
      |ORDER BY media_id, frame_index""".stripMargin

  // ---------------------------------------------------------------------
  // q42 — text normalization for dedup preprocessing: NFC + lowercase +
  // punctuation strip + whitespace collapse (the canonicalization step
  // upstream of exact/fuzzy dedup in training-data pipelines)
  // ---------------------------------------------------------------------
  def q42Normalize(s: SparkSession, d: String): DataFrame = {
    val nfc = udf { (t: String) =>
      if (t == null) null
      else java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
    }
    documents(s, d)
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(nfc(col("text"))), "[^\\p{L}\\p{N} ]", ""),
          " +", " ")).as("norm_text"))
      .withColumn("norm_hash", graft.functions.RollingHash.rolling_hash(col("norm_text")))
      .orderBy(col("doc_id"))
  }
  val q42Sql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)), '[^\p{L}\p{N} ]', '', 'g'), ' +', ' ', 'g')) AS norm_text,
      |  list_reduce(
      |    list_prepend(0::BIGINT, list_transform(string_split(
      |      trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)), '[^\p{L}\p{N} ]', '', 'g'), ' +', ' ', 'g')), ''), c -> ascii(c)::BIGINT)),
      |    (h, c) -> (h * 31 + c) % 2147483647) AS norm_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q44 — corpus profile: the summary-statistics sweep a training-data
  // pipeline runs before/after every filtering stage
  // ---------------------------------------------------------------------
  def q44CorpusProfile(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        countDistinct(col("source")).as("sources"),
        floor(avg(col("n_chars")) * 1000).cast("long").as("avg_chars_q"))
      .orderBy(col("lang"))
  val q44Sql: String =
    """SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  count(DISTINCT source) AS sources,
      |  CAST(floor(avg(n_chars) * 1000) AS BIGINT) AS avg_chars_q
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q57 — deterministic train/val/test split: bucket = content hash mod
  // 100 (rolling_hash so the oracle can reproduce the fold exactly);
  // 0-79 train, 80-89 val, 90-99 test. Content-hash splitting is the
  // standard leak-proof assignment: stable under re-partitioning,
  // re-ordering, and incremental corpus growth. Zero-shuffle per row;
  // the per-split tally shuffles only (lang, split) keys.
  // ---------------------------------------------------------------------
  def q57Split(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(graft.functions.RollingHash.rolling_hash(col("text")), lit(100L))
    documents(s, d)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .orderBy(col("lang"), col("split"))
  }
  private val duckRollingHash =
    """list_reduce(
      |    list_prepend(0::BIGINT, list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
      |    (h, c) -> (h * 31 + c) % 2147483647)""".stripMargin
  val q57Sql: String =
    s"""WITH b AS (
       |  SELECT lang, n_chars, $duckRollingHash % 100 AS bucket
       |  FROM documents),
       |sp AS (
       |  SELECT lang, n_chars,
       |    CASE WHEN bucket < 80 THEN 'train'
       |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM b)
       |SELECT lang, split, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
       |FROM sp GROUP BY lang, split ORDER BY lang, split""".stripMargin

  // ---------------------------------------------------------------------
  // q58 — weighted mixture sampling: per-source keep rates (the dataset
  // mixing step when assembling a training corpus from sources of
  // different quality). Deterministic: keep iff content-hash bucket
  // falls under the source's rate — reproducible across runs/engines,
  // no RNG state, rate precision 1/1000. Per-row filter, zero shuffle.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // q79 — token-budgeted mixture sampling (the corpus-mixing step of an
  // LLM data recipe): per-source mixture weights + a global token budget
  // → per-source keep fractions B·w_s/M (M = Σ w_j·T_j), applied by
  // deterministic content-hash bucketing. Every scalar (budget, weighted
  // mass, per-source cut) is derived IN-PLAN from broadcast one-row
  // aggregates — no driver arithmetic — and the cut compare is integer
  // vs integer, so the sample is stable under re-partitioning and
  // engine choice. Two tiny aggregates + one broadcast join at any
  // corpus size.
  // ---------------------------------------------------------------------
  def q79BudgetMix(s: SparkSession, d: String): DataFrame =
    q79BudgetMixOn(documents(s, d))

  /** q79 over an arbitrary documents-shaped frame (property tests). */
  def q79BudgetMixOn(input: DataFrame): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val docs = input.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("tokens"),
        pmod(graft.functions.RollingHash.rolling_hash(col("text")),
          lit(1000000L)).as("bucket"))
      .withColumn("w", when(srcNum % 2 === 0, 3L).otherwise(1L))
    val per = docs.groupBy(col("source"), col("w"))
      .agg(sum(col("tokens")).as("t_s"))
    val tot = per.agg(sum(col("w") * col("t_s")).as("m"),
      sum(col("t_s")).as("t_all"))
    val thr = per.crossJoin(broadcast(tot))
      .withColumn("b_total", floor(col("t_all") * 0.4).cast("long"))
      .withColumn("cut",
        floor(lit(1000000.0) * col("b_total") * col("w") / col("m"))
          .cast("long"))
      .select(col("source"), col("cut"))
    docs.join(broadcast(thr), "source")
      .withColumn("kept", (col("bucket") < col("cut")).cast("int"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_docs"),
        sum(col("kept")).as("kept_docs"),
        sum(when(col("kept") === 1, col("tokens")).otherwise(0L))
          .as("kept_tokens"),
        min(col("cut")).as("cut_q"))
      .orderBy(col("source"))
  }
  val q79Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    len(string_split(text, ' '))::BIGINT AS tokens,
       |    $duckRollingHash % 1000000 AS bucket,
       |    CASE WHEN substr(source, 4)::INT % 2 = 0 THEN 3 ELSE 1 END AS w
       |  FROM documents),
       |per AS (
       |  SELECT source, w, CAST(sum(tokens) AS BIGINT) AS t_s
       |  FROM t GROUP BY 1, 2),
       |tot AS (
       |  SELECT CAST(sum(w * t_s) AS BIGINT) AS m,
       |    CAST(sum(t_s) AS BIGINT) AS t_all FROM per),
       |thr AS (
       |  SELECT source,
       |    CAST(floor(1000000.0 * CAST(floor(t_all * 0.4) AS BIGINT) * w / m)
       |      AS BIGINT) AS cut
       |  FROM per, tot),
       |k AS (
       |  SELECT t.source, tokens, cut,
       |    CASE WHEN bucket < cut THEN 1 ELSE 0 END AS kept
       |  FROM t JOIN thr ON t.source = thr.source)
       |SELECT source, count(*) AS total_docs,
       |  CAST(sum(kept) AS BIGINT) AS kept_docs,
       |  CAST(sum(CASE WHEN kept = 1 THEN tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       |  min(cut) AS cut_q
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  def q58WeightedSample(s: SparkSession, d: String): DataFrame = {
    // rates keyed by source-number parity: even kept at 90%, odd at 25%
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val rate = when(srcNum % 2 === 0, lit(900L)).otherwise(lit(250L))
    val bucket = pmod(graft.functions.RollingHash.rolling_hash(col("text")), lit(1000L))
    documents(s, d)
      .withColumn("kept", (bucket < rate).cast("int"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total"), sum(col("kept")).as("kept"),
        floor(sum(col("kept")).cast("double") / count(lit(1)) * 1000000L)
          .cast("long").as("rate_q"))
      .orderBy(col("source"))
  }
  val q58Sql: String =
    s"""WITH b AS (
       |  SELECT source, $duckRollingHash % 1000 AS bucket FROM documents),
       |k AS (
       |  SELECT source,
       |    CASE WHEN bucket < (CASE WHEN substr(source, 4)::INT % 2 = 0 THEN 900 ELSE 250 END)
       |      THEN 1 ELSE 0 END AS kept
       |  FROM b)
       |SELECT source, count(*) AS total, CAST(sum(kept) AS BIGINT) AS kept,
       |  CAST(floor(sum(kept)::DOUBLE / count(*) * 1000000.0) AS BIGINT) AS rate_q
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q59 — sequence packing: assign documents (in stable doc_id order,
  // per language) to fixed token-budget bins via running cumulative sum
  // — the contiguous-packing pass that turns a filtered corpus into
  // fixed-length training sequences. One shuffle on the partition key;
  // the running sum is a single window scan.
  // ---------------------------------------------------------------------
  def q59Packing(s: SparkSession, d: String): DataFrame = {
    val budget = 512L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val toks = size(split(col("text"), " ")).cast("long")
    documents(s, d)
      .select(col("lang"), col("doc_id"), toks.as("tokens"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .withColumn("bin", floor((col("cum_tokens") - col("tokens")) / budget).cast("long"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("docs"), sum(col("tokens")).as("bin_tokens"))
      .orderBy(col("lang"), col("bin"))
  }
  val q59Sql: String =
    """WITH t AS (
      |  SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS tokens
      |  FROM documents),
      |c AS (
      |  SELECT lang, doc_id, tokens,
      |    sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM t)
      |SELECT lang, CAST(floor((cum_tokens - tokens) / 512.0) AS BIGINT) AS bin,
      |  count(*) AS docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens
      |FROM c GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin

  // ---------------------------------------------------------------------
  // q55 — PII scrub-and-audit: redact emails/phones/IPv4s, count per
  // class. The corpus is synthetic word-soup, so deterministic PII is
  // injected from (doc_id, suffix) first — same derive-then-operate
  // shape as q41's media bytes — making the scrub observable and the
  // oracle exact. Patterns avoid backrefs/lookaround so Java regex and
  // RE2 agree. Pure per-row Column algebra: zero shuffle at any scale.
  // ---------------------------------------------------------------------
  def q55PiiScrub(s: SparkSession, d: String): DataFrame = {
    val injected = concat(col("text"),
      lit(" user"), col("doc_id").cast("string"),
      lit("@mail.example.org +1 555-010-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))
    documents(s, d)
      .select(col("doc_id"), TextAnalysis.piiScrub(injected).as("p"))
      .select(col("doc_id"), col("p.scrubbed").as("scrubbed"),
        col("p.n_email").as("n_email"), col("p.n_phone").as("n_phone"),
        col("p.n_ipv4").as("n_ipv4"))
      .orderBy(col("doc_id"))
  }
  val q55Sql: String = {
    def esc(p: String) = p.replace("'", "''")
    val inj = "text || ' user' || doc_id || '@mail.example.org +1 555-010-' || " +
      "lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' ip 10.0.' || " +
      "(doc_id % 256) || '.7'"
    val Seq(em, ph, ip) = TextAnalysis.piiPatterns.map(p => esc(p._2))
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace($inj,
       |    '$em', '<EMAIL>', 'g'), '$ph', '<PHONE>', 'g'), '$ip', '<IP>', 'g')
       |    AS scrubbed,
       |  len(regexp_extract_all($inj, '$em')) AS n_email,
       |  len(regexp_extract_all($inj, '$ph')) AS n_phone,
       |  len(regexp_extract_all($inj, '$ip')) AS n_ipv4
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q56 — repetition features (Gopher-style boilerplate/spam filters):
  // duplicate-word and duplicate-bigram fractions per document
  // ---------------------------------------------------------------------
  def q56Repetition(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), TextAnalysis.repetitionFeatures(col("w")).as("r"))
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.dup_word_ratio_q").as("dup_word_ratio_q"),
        col("r.dup_bigram_ratio_q").as("dup_bigram_ratio_q"))
      .orderBy(col("doc_id"))
  val q56Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |f AS (
      |  SELECT doc_id, len(w) AS nw, len(list_distinct(w)) AS ndw,
      |    len(list_distinct(list_transform(range(1, len(w)),
      |      i -> array_to_string(w[i:i+1], ' ')))) AS ndb
      |  FROM tok)
      |SELECT doc_id, nw AS n_words,
      |  CAST(floor((nw - ndw)::DOUBLE / nw * 1000000.0) AS BIGINT)
      |    AS dup_word_ratio_q,
      |  CAST(floor((nw - 1 - ndb)::DOUBLE / (nw - 1) * 1000000.0) AS BIGINT)
      |    AS dup_bigram_ratio_q
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q54 — corpus length quantiles per language: the distribution sweep a
  // training-data pipeline runs to set length-filter cutoffs. Exact
  // `percentile` (linear interpolation) matches DuckDB quantile_cont;
  // values quantized for bit-stable compare. At scale exact percentiles
  // shuffle only (lang, n_chars) pairs; the approx_percentile variant
  // (one pass, mergeable sketches) drops in when exactness can go.
  // ---------------------------------------------------------------------
  def q54LenQuantiles(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        q(expr("percentile(n_chars, 0.25)"), 1e6).as("p25_q"),
        q(expr("percentile(n_chars, 0.5)"), 1e6).as("p50_q"),
        q(expr("percentile(n_chars, 0.75)"), 1e6).as("p75_q"),
        q(expr("percentile(n_chars, 0.95)"), 1e6).as("p95_q"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))
  val q54Sql: String =
    """SELECT lang, count(*) AS docs,
      |  CAST(floor(quantile_cont(n_chars, 0.25) * 1000000.0) AS BIGINT) AS p25_q,
      |  CAST(floor(quantile_cont(n_chars, 0.5)  * 1000000.0) AS BIGINT) AS p50_q,
      |  CAST(floor(quantile_cont(n_chars, 0.75) * 1000000.0) AS BIGINT) AS p75_q,
      |  CAST(floor(quantile_cont(n_chars, 0.95) * 1000000.0) AS BIGINT) AS p95_q,
      |  max(n_chars) AS max_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q70 — character entropy (gibberish / binary-noise filter signal):
  // zero-shuffle per-row fold, deterministic summation order
  // ---------------------------------------------------------------------
  def q70CharEntropy(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.charEntropyQ(col("text")).as("entropy_q"))
      .orderBy(col("doc_id"))
  val q70Sql: String =
    """SELECT doc_id,
      |  CAST(floor(list_reduce(
      |    list_prepend(0.0, list_transform(
      |      list_sort(list_distinct(string_split(text, ''))),
      |      c -> (length(text) - length(replace(text, c, '')))::DOUBLE / length(text))),
      |    (acc, p) -> acc - p * ln(p)) * 1000000.0) AS BIGINT) AS entropy_q
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q69 — decontamination: training docs sharing any 3-gram with the
  // held-out eval slice (doc_id % 50 == 0 stands in for a benchmark
  // set). Eval postings broadcast; the training side never shuffles.
  // ---------------------------------------------------------------------
  def q69Decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    Dedup.contaminationOverlap(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), n = 3)
      .orderBy(col("doc_id"))
  }
  val q69Sql: String =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(string_split(text, ' ')) - 1),
      |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shs
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |cand AS (
      |  SELECT doc_id, unnest(shs) AS sh FROM sh WHERE doc_id % 50 <> 0),
      |ev AS (
      |  SELECT DISTINCT unnest(shs) AS sh FROM sh WHERE doc_id % 50 = 0)
      |SELECT doc_id, count(DISTINCT sh) AS overlap_shingles
      |FROM cand JOIN ev USING (sh)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q77 — semantic decontamination: training vectors whose max cosine
  // against the held-out eval slice crosses a threshold (the
  // embedding-space complement of q69's n-gram decontamination — catches
  // paraphrased eval leakage that lexical overlap misses). Eval side is
  // broadcast; norms are hoisted per row, not per pair; max is
  // order-free so the float compare is exact. At 100 TB the eval set is
  // the small side by construction — the training side never shuffles.
  // ---------------------------------------------------------------------
  def q77EmbedDecontam(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorOps.dot_f
    val emb = embeddings(s, d)
    val ev = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("eid"),
        col("embedding").as("evec"))
    val tr = emb.filter(col("vec_id") % 50 =!= 0)
    tr.select(col("vec_id"), col("embedding"),
        sqrt(dot_f(col("embedding"), col("embedding"))).as("tn"))
      .crossJoin(broadcast(
        ev.select(col("evec"), sqrt(dot_f(col("evec"), col("evec"))).as("en"))))
      .select(col("vec_id"),
        (dot_f(col("embedding"), col("evec")) / (col("tn") * col("en")))
          .as("cos"))
      .groupBy(col("vec_id")).agg(max(col("cos")).as("mc"))
      .filter(col("mc") >= 0.3)
      .select(col("vec_id"), q(col("mc"), 1e6).as("max_cos_q"))
      .orderBy(col("vec_id"))
  }
  val q77Sql: String =
    s"""WITH ev AS (SELECT * FROM embeddings WHERE vec_id % 50 = 0),
       |tr AS (SELECT * FROM embeddings WHERE vec_id % 50 <> 0),
       |m AS (
       |  SELECT t.vec_id, max(${duckCos("t.embedding", "e.embedding")}) AS mc
       |  FROM tr t CROSS JOIN ev e GROUP BY 1)
       |SELECT vec_id, CAST(floor(mc * 1000000.0) AS BIGINT) AS max_cos_q
       |FROM m WHERE mc >= 0.3 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q78 — composed cleaning pipeline (the C4-style pass): length,
  // token-count, character-entropy, and exact-dedup-survivor filters
  // evaluated as independent flags plus the conjunction, so every
  // rejection is attributable — the observability a production cleaning
  // stage needs. Flags are per-row Column algebra (zero shuffle); the
  // dedup survivor flag is one window keyed on xxhash64(text) (q30's
  // pattern — the shuffle carries 8-byte keys, never documents).
  // ---------------------------------------------------------------------
  def q78CleanPipeline(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
    docs
      .withColumn("len_ok",
        (col("n_chars") >= 100 && col("n_chars") <= 100000).cast("int"))
      .withColumn("tok_ok",
        (size(split(col("text"), " ")) >= 20).cast("int"))
      .withColumn("ent_ok",
        (TextAnalysis.charEntropyQ(col("text")) >= 2800000L).cast("int"))
      .withColumn("dup_keep",
        // 8-byte hash window key, not full documents (q30 discipline;
        // collision honesty per Dedup.exactByHash — oracle uses text)
        (col("doc_id") ===
          min(col("doc_id")).over(
            Window.partitionBy(xxhash64(col("text"))))).cast("int"))
      .withColumn("kept",
        (col("len_ok") === 1 && col("tok_ok") === 1 &&
          col("ent_ok") === 1 && col("dup_keep") === 1).cast("int"))
      .select(col("doc_id"), col("len_ok"), col("tok_ok"), col("ent_ok"),
        col("dup_keep"), col("kept"))
      .orderBy(col("doc_id"))
  }
  val q78Sql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE WHEN n_chars >= 100 AND n_chars <= 100000 THEN 1 ELSE 0 END AS len_ok,
      |    CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END AS tok_ok,
      |    CASE WHEN CAST(floor(list_reduce(
      |        list_prepend(0.0, list_transform(
      |          list_sort(list_distinct(string_split(text, ''))),
      |          c -> (length(text) - length(replace(text, c, '')))::DOUBLE / length(text))),
      |        (acc, p) -> acc - p * ln(p)) * 1000000.0) AS BIGINT) >= 2800000
      |      THEN 1 ELSE 0 END AS ent_ok,
      |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY text)
      |      THEN 1 ELSE 0 END AS dup_keep
      |  FROM documents)
      |SELECT doc_id, len_ok, tok_ok, ent_ok, dup_keep,
      |  CASE WHEN len_ok = 1 AND tok_ok = 1 AND ent_ok = 1 AND dup_keep = 1
      |    THEN 1 ELSE 0 END AS kept
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q80 — cross-document duplication profile (the decision metric for
  // span-level dedup, complementing q56's WITHIN-document repetition):
  // for each document, how many of its 8-token shingles occur in at
  // least one OTHER document, as a fraction of its shingles. Inverted
  // index on 8-byte hashed shingles (q31's machinery); df computed once
  // per shingle, joined back to postings — shuffles carry hashes only.
  // Documents with high cross-dup fractions are the candidates for
  // passage excision or downweighting in a training-data pipeline.
  // ---------------------------------------------------------------------
  def q80DupProfile(s: SparkSession, d: String): DataFrame = {
    val n = 8
    val tok = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
    val sh = tok.select(col("doc_id"),
      explode(Dedup.shingleHashes(col("w"), n)).as("sh"))
    // (doc, shingle) pairs are distinct by construction (shingleHashes
    // array_distincts per doc), so plain count IS the document
    // frequency — no expand-based countDistinct pass needed
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("dup_shingles"))
      .withColumn("dup_frac_q",
        floor(col("dup_shingles").cast("double") / col("n_shingles") * 1e6)
          .cast("long"))
      .filter(col("dup_shingles") > 0)
      .orderBy(col("doc_id"))
  }
  val q80Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 8),
      |sh AS (SELECT DISTINCT doc_id, sh FROM (
      |  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w)-6)) AS i) t)),
      |df AS (SELECT sh, count(DISTINCT doc_id) AS df FROM sh GROUP BY sh)
      |SELECT doc_id, count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_shingles,
      |  CAST(floor(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::DOUBLE
      |    / count(*) * 1000000.0) AS BIGINT) AS dup_frac_q
      |FROM sh JOIN df USING (sh)
      |GROUP BY doc_id
      |HAVING sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) > 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q81 — repeated-passage span excision (the rewrite q80's profile
  // motivates): excise every 8-token window occurring in ≥2 distinct
  // documents, merge overlaps, reassemble the survivors. Spark side
  // works on an inverted POSITIONAL shingle-hash index (16-byte shuffle
  // rows, text only moves in the final doc-keyed join); the oracle
  // replays the same semantics relationally on shingle strings. See
  // Dedup.spanExcision for the scale notes.
  // ---------------------------------------------------------------------
  def q81SpanExcision(s: SparkSession, d: String): DataFrame =
    Dedup.spanExcision(documents(s, d), n = 8)
      .orderBy(col("doc_id"))
  val q81Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i) r
      |  WHERE len(w) >= 8),
      |dup AS (SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (
      |  SELECT DISTINCT s.doc_id, s.i + o AS p
      |  FROM sh s JOIN dup USING (sh),
      |       LATERAL (SELECT unnest(range(0, 8)) AS o) t),
      |covn AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id),
      |tokpos AS (
      |  SELECT doc_id, w[i] AS tk, i
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) r),
      |kept AS (
      |  SELECT tp.doc_id, tp.tk, tp.i FROM tokpos tp
      |  WHERE NOT EXISTS (SELECT 1 FROM cov c
      |                    WHERE c.doc_id = tp.doc_id AND c.p = tp.i)),
      |agg AS (
      |  SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS cleaned_text
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(len(t.w) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(cn.n_removed, 0) AS BIGINT) AS n_removed,
      |  coalesce(a.cleaned_text, '') AS cleaned_text
      |FROM tok t
      |LEFT JOIN covn cn USING (doc_id)
      |LEFT JOIN agg a ON a.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q84 — keep-first span excision: q81's rewrite with Lee et al.'s
  // actual dedup policy — the globally FIRST occurrence of each
  // repeated 8-token window (by doc_id, then position) survives, every
  // other occurrence (cross-doc or within-doc) is excised, so exactly
  // one copy of each passage remains in the corpus. Per-shingle window
  // rank replaces q81's df aggregation; same one-shuffle shape.
  // ---------------------------------------------------------------------
  def q84SpanExcisionKeepFirst(s: SparkSession, d: String): DataFrame =
    Dedup.spanExcision(documents(s, d), n = 8, keepFirst = true)
      .orderBy(col("doc_id"))
  val q84Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i) r
      |  WHERE len(w) >= 8),
      |exc AS (
      |  SELECT doc_id, i FROM (
      |    SELECT doc_id, i,
      |      row_number() OVER (PARTITION BY sh ORDER BY doc_id, i) AS rn
      |    FROM sh) t WHERE rn >= 2),
      |cov AS (
      |  SELECT DISTINCT e.doc_id, e.i + o AS p
      |  FROM exc e, LATERAL (SELECT unnest(range(0, 8)) AS o) t),
      |covn AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id),
      |tokpos AS (
      |  SELECT doc_id, w[i] AS tk, i
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) r),
      |kept AS (
      |  SELECT tp.doc_id, tp.tk, tp.i FROM tokpos tp
      |  WHERE NOT EXISTS (SELECT 1 FROM cov c
      |                    WHERE c.doc_id = tp.doc_id AND c.p = tp.i)),
      |agg AS (
      |  SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS cleaned_text
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(len(t.w) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(cn.n_removed, 0) AS BIGINT) AS n_removed,
      |  coalesce(a.cleaned_text, '') AS cleaned_text
      |FROM tok t
      |LEFT JOIN covn cn USING (doc_id)
      |LEFT JOIN agg a ON a.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q74 — bigram language-model document scoring (perplexity-style
  // quality signal): train bigram/context counts over the corpus, score
  // each document by the sum of quantized conditional log-probs
  // ln(C(w1,w2)/C(w1·)). Per-bigram quantization BEFORE summation makes
  // the float fold order-free (sum of longs), so the oracle is
  // hash-exact. Shuffles carry (w1,w2) count keys, never documents; the
  // count tables are vocabulary-sized, orders smaller than the corpus.
  // ---------------------------------------------------------------------
  def q74BigramLmScore(s: SparkSession, d: String): DataFrame =
    q74BigramLmScoreOn(documents(s, d))

  /** q74 over an arbitrary documents-shaped frame (property tests).
    *
    * Plan shape: the exploded corpus is reduced to per-document bigram
    * COUNTS first (one shuffle, map-side combine collapses repeats), the
    * corpus bigram table derives from that reduced frame, and the
    * context (unigram) table derives from the bigram table — C(w1·) =
    * Σ_w2 C(w1,w2) — so the corpus is tokenized exactly once and every
    * join after the first aggregation runs on vocabulary-sized, not
    * corpus-sized, inputs. Per-occurrence totals are recovered as
    * Σ dc and Σ dc·logq.
    */
  def q74BigramLmScoreOn(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - 2),
          i => struct(element_at(col("w"), i + 1).as("w1"),
            element_at(col("w"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val docBg = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("dc"))
    val big = docBg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("dc")).as("c2"))
    val uni = big.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    docBg.join(big, Seq("w1", "w2")).join(uni, Seq("w1"))
      .withColumn("logq",
        floor(log(col("c2").cast("double") / col("c1")) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("dc")).as("n_bigrams"),
        sum(col("dc") * col("logq")).as("sum_logq"))
      .orderBy(col("doc_id"))
  }
  val q74Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (
      |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
      |big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
      |uni AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(CAST(floor(ln(c2::DOUBLE / c1) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_logq
      |FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q75 — BPE merge-pair counting (one tokenizer-training step):
  // word-frequency table → adjacent character-pair counts weighted by
  // word frequency → top merge candidates. The heavy reduction happens
  // on the VOCABULARY (distinct words), not the corpus — the shape that
  // makes BPE training tractable at 100 TB (corpus → word counts is one
  // shuffle of word keys; everything after is vocabulary-sized).
  // ---------------------------------------------------------------------
  def q75BpePairs(s: SparkSession, d: String): DataFrame =
    q75BpePairsOn(documents(s, d))
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(20)

  /** All BPE pair counts (no top-k) over an arbitrary documents-shaped
    * frame (property tests). */
  def q75BpePairsOn(docs: DataFrame): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    words
      .select(col("freq"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"),
        col("word"))
      .select(call_function("substr", col("word"), col("i"), lit(2)).as("pair"),
        col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("pair_count"))
  }
  val q75Sql: String =
    """WITH wf AS (
      |  SELECT word, count(*) AS freq FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      |  WHERE len(word) >= 2 GROUP BY word),
      |pr AS (
      |  SELECT substr(word, i, 2) AS pair, freq
      |  FROM wf, LATERAL (SELECT unnest(range(1, len(word))) AS i) r)
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count FROM pr
      |GROUP BY pair ORDER BY pair_count DESC, pair ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q76 — k-means Lloyd iteration on embeddings (IVF centroid training):
  // broadcast the k current centroids, assign each vector to its nearest
  // (exact dist2, ties to the lowest centroid id via a min-struct
  // aggregate — 16-byte rows through the argmin shuffle, never vectors),
  // then recompute per-dimension sums. Element quantization BEFORE the
  // sum keeps the float reduction order-free, so the DuckDB oracle
  // (same fold, QUALIFY argmin) is hash-exact. One Lloyd step is THE
  // iterated unit of distributed k-means; at 100 TB each step is one
  // broadcast + one narrow argmin shuffle + one (k×dim)-cell aggregate.
  // ---------------------------------------------------------------------
  def q76KmeansStep(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val k = 4
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val dists = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(
          graft.functions.VectorOps.dist2_f(col("embedding"), col("cvec"))
            .as("d2"),
          col("cid")).as("dc"))
    val assign = dists.groupBy(col("vec_id"))
      .agg(min(col("dc")).getField("cid").as("cid"))
    assign.join(emb, "vec_id")
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "e")))
      .withColumn("eq", floor(col("e").cast("double") * 1e6).cast("long"))
      .groupBy(col("cid"), col("pos"))
      .agg(count(lit(1)).as("n_vec"), sum(col("eq")).as("sum_q"))
      .select(col("cid").as("cluster"), col("pos"), col("n_vec"), col("sum_q"))
      .orderBy(col("cluster"), col("pos"))
  }
  val q76Sql: String = {
    val dist2 = "list_reduce(list_prepend(0.0, list_transform(range(1,65), " +
      "j -> (e.embedding[j]::DOUBLE - c.cvec[j]::DOUBLE) * " +
      "(e.embedding[j]::DOUBLE - c.cvec[j]::DOUBLE))), (x,y) -> x+y)"
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 4),
       |a AS (
       |  SELECT e.vec_id, c.cid FROM embeddings e CROSS JOIN cents c
       |  QUALIFY row_number() OVER (
       |    PARTITION BY e.vec_id ORDER BY $dist2 ASC, c.cid ASC) = 1),
       |x AS (
       |  SELECT a.cid, i - 1 AS pos,
       |    CAST(floor(e.embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS eq
       |  FROM a JOIN embeddings e USING (vec_id),
       |    LATERAL (SELECT unnest(range(1, 65)) AS i) r)
       |SELECT cid AS cluster, pos, count(*) AS n_vec,
       |  CAST(sum(eq) AS BIGINT) AS sum_q
       |FROM x GROUP BY 1, 2 ORDER BY cluster, pos""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q82 — TWO chained Lloyd rounds, hash-exact across engines: the
  // multi-round extension of q76. The cross-engine hazard in iterating
  // k-means is float drift — round 2's assignment depends on round 1's
  // centroids, so any nondeterminism compounds. Eliminated by running
  // the whole loop in quantized integer space: vectors quantize ONCE to
  // long (floor(x·1e6)), distances are exact integer sums (≤ 64 dims ×
  // (2e6)² ≈ 2.6e14, no overflow in either engine), and the centroid
  // update floor(Σeq / n) is a single IEEE double division + floor —
  // bit-identical in Spark and DuckDB. Scale shape per round is q76's:
  // broadcast k quantized centroids, argmin via min-struct (16-byte
  // shuffle rows), (k×dim)-cell update aggregate. Output: round-1
  // centroid coordinate + round-2 membership stats per (cluster, pos).
  // ---------------------------------------------------------------------
  def q82KmeansTwoRounds(s: SparkSession, d: String): DataFrame = {
    val k = 4
    val qemb = embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"),
        e => floor(e.cast("double") * 1e6).cast("long")).as("qv"))
    val c0 = qemb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    // integer-exact argmin assignment against broadcast centroids —
    // the ONE shared integer-distance definition (Similarity.quantDist2)
    def assign(cents: DataFrame): DataFrame = {
      val d2 = Similarity.quantDist2(col("qv"), col("cv"))
      qemb.crossJoin(broadcast(cents))
        .select(col("vec_id"), struct(d2.as("d2"), col("cid")).as("dc"))
        .groupBy(col("vec_id"))
        .agg(min(col("dc")).getField("cid").as("cid"))
    }
    val a1 = assign(c0)
    // round-1 update in exploded form (the k×dim aggregate), kept both
    // exploded (for the output join) and re-packed to arrays (for the
    // round-2 broadcast)
    val c1e = a1.join(qemb, "vec_id")
      .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "eq")))
      .groupBy(col("cid"), col("pos"))
      .agg(floor(sum(col("eq")).cast("double") / count(lit(1)))
        .cast("long").as("cq"))
    val c1 = c1e.groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cq")))),
        x => x.getField("cq")).as("cv"))
    val a2 = assign(c1)
    val stats = a2.join(qemb, "vec_id")
      .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "eq")))
      .groupBy(col("cid"), col("pos"))
      .agg(count(lit(1)).as("n_vec2"), sum(col("eq")).as("sum_q2"))
    stats.join(c1e, Seq("cid", "pos"))
      .select(col("cid").as("cluster"), col("pos"), col("cq").as("cq1"),
        col("n_vec2"), col("sum_q2"))
      .orderBy(col("cluster"), col("pos"))
  }
  val q82Sql: String =
    """WITH q AS (
      |  SELECT vec_id, i - 1 AS pos,
      |    CAST(floor(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS eq
      |  FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) r),
      |c0 AS (SELECT vec_id AS cid, pos, eq AS cq FROM q WHERE vec_id < 4),
      |d1 AS (
      |  SELECT q.vec_id, c.cid, sum((q.eq - c.cq) * (q.eq - c.cq)) AS d2
      |  FROM q JOIN c0 c USING (pos) GROUP BY 1, 2),
      |a1 AS (
      |  SELECT vec_id, cid FROM d1
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1),
      |c1 AS (
      |  SELECT a1.cid, q.pos,
      |    CAST(floor(sum(q.eq)::DOUBLE / count(*)) AS BIGINT) AS cq
      |  FROM a1 JOIN q USING (vec_id) GROUP BY 1, 2),
      |d2r AS (
      |  SELECT q.vec_id, c.cid, sum((q.eq - c.cq) * (q.eq - c.cq)) AS d2
      |  FROM q JOIN c1 c USING (pos) GROUP BY 1, 2),
      |a2 AS (
      |  SELECT vec_id, cid FROM d2r
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1),
      |st AS (
      |  SELECT a2.cid, q.pos, count(*) AS n_vec2,
      |    CAST(sum(q.eq) AS BIGINT) AS sum_q2
      |  FROM a2 JOIN q USING (vec_id) GROUP BY 1, 2)
      |SELECT st.cid AS cluster, st.pos AS pos, c1.cq AS cq1,
      |  st.n_vec2, st.sum_q2
      |FROM st JOIN c1 ON c1.cid = st.cid AND c1.pos = st.pos
      |ORDER BY cluster, st.pos""".stripMargin

  // ---------------------------------------------------------------------
  // q83 — product-quantization ANN (encode → ADC scan): corpus vectors
  // compress to 8 one-byte subspace codes against broadcast codebooks;
  // each query scans the CODES via a broadcast m×kc lookup table — the
  // memory-bound ANN path past IVF (8 B/vector of scan state at any
  // corpus size). Whole pipeline in quantized integer space, so the
  // approximate index is still bit-reproducible by DuckDB. See
  // Similarity.pqTopK.
  // ---------------------------------------------------------------------
  def q83AnnPq(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb, k = 10)
      .orderBy(col("query_id"), col("rank"))
  }
  val q83Sql: String =
    """WITH q AS (
      |  SELECT vec_id, (i - 1) // 8 AS s, (i - 1) % 8 AS j,
      |    CAST(floor(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS eq
      |  FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) r),
      |cent AS (SELECT vec_id AS cid, s, j, eq AS cq FROM q WHERE vec_id < 16),
      |enc AS (
      |  SELECT d.vec_id, d.s, c.cid, sum((d.eq - c.cq) * (d.eq - c.cq)) AS dd
      |  FROM q d JOIN cent c ON c.s = d.s AND c.j = d.j
      |  GROUP BY 1, 2, 3),
      |codes AS (
      |  SELECT vec_id, s, cid AS code FROM enc
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id, s ORDER BY dd ASC, cid ASC) = 1),
      |lut AS (
      |  SELECT d.vec_id AS query_id, d.s, c.cid,
      |    sum((d.eq - c.cq) * (d.eq - c.cq)) AS dd
      |  FROM q d JOIN cent c ON c.s = d.s AND c.j = d.j
      |  WHERE d.vec_id < 10
      |  GROUP BY 1, 2, 3),
      |adc AS (
      |  SELECT l.query_id, x.vec_id, CAST(sum(l.dd) AS BIGINT) AS adc_d2
      |  FROM codes x JOIN lut l ON l.s = x.s AND l.cid = x.code
      |  WHERE x.vec_id <> l.query_id
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT query_id, vec_id, adc_d2,
      |    row_number() OVER (
      |      PARTITION BY query_id ORDER BY adc_d2 ASC, vec_id ASC) AS rank
      |  FROM adc)
      |SELECT query_id, rank, vec_id, adc_d2 FROM r WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q90 — IVF+PQ composed ANN (the FAISS IVFPQ shape): q35's coarse
  // quantizer prunes WHICH vectors are candidates (probed clusters
  // only), q83's product quantizer compresses HOW each candidate is
  // scored (8 one-byte codes via a broadcast ADC table). The corpus-side
  // state is a cluster id + 8 code bytes per vector; at 100 TB the codes
  // are bucketed by cluster_id like IvfIndex so the probe set becomes a
  // partition filter over an already-8-byte-per-vector table — the two
  // prunings multiply. IVF half in float space (= q35), PQ half in
  // quantized integer space (= q83), so DuckDB replays the composition
  // end to end. See Similarity.ivfPqTopK.
  // ---------------------------------------------------------------------
  def q90AnnIvfPq(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb,
      Similarity.strideCentroids(emb, 97), k = 10, nProbe = 3,
      centroidCount = Some(strideCentroidCount(s, d, 97)))
      .orderBy(col("query_id"), col("rank"))
  }
  val q90Sql: String =
    s"""WITH cent AS (
       |  SELECT vec_id AS centroid_id, embedding AS c_emb
       |  FROM embeddings WHERE vec_id % 97 = 0),
       |corpus_d AS (
       |  SELECT a.vec_id, c.centroid_id,
       |    ${duckDist2("a.embedding", "c.c_emb")} AS dist2
       |  FROM embeddings a, cent c),
       |assigned AS (
       |  SELECT vec_id, centroid_id AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY dist2 ASC, centroid_id ASC) AS rk
       |    FROM corpus_d) t WHERE rk = 1),
       |probe_d AS (
       |  SELECT q.vec_id AS query_id, c.centroid_id,
       |    ${duckDist2("q.embedding", "c.c_emb")} AS dist2
       |  FROM embeddings q, cent c WHERE q.vec_id < 10),
       |probes AS (
       |  SELECT query_id, centroid_id AS cluster_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist2 ASC, centroid_id ASC) AS rk
       |    FROM probe_d) t WHERE rk <= 3),
       |q AS (
       |  SELECT vec_id, (i - 1) // 8 AS s, (i - 1) % 8 AS j,
       |    CAST(floor(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS eq
       |  FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) r),
       |pqc AS (SELECT vec_id AS cid, s, j, eq AS cq FROM q WHERE vec_id < 16),
       |enc AS (
       |  SELECT d.vec_id, d.s, c.cid, sum((d.eq - c.cq) * (d.eq - c.cq)) AS dd
       |  FROM q d JOIN pqc c ON c.s = d.s AND c.j = d.j
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, s, cid AS code FROM enc
       |  QUALIFY row_number() OVER (
       |    PARTITION BY vec_id, s ORDER BY dd ASC, cid ASC) = 1),
       |lut AS (
       |  SELECT d.vec_id AS query_id, d.s, c.cid,
       |    sum((d.eq - c.cq) * (d.eq - c.cq)) AS dd
       |  FROM q d JOIN pqc c ON c.s = d.s AND c.j = d.j
       |  WHERE d.vec_id < 10
       |  GROUP BY 1, 2, 3),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN assigned a USING (cluster_id)
       |  WHERE a.vec_id <> p.query_id),
       |adc AS (
       |  SELECT n.query_id, n.vec_id, CAST(sum(l.dd) AS BIGINT) AS adc_d2
       |  FROM cand n JOIN codes x ON x.vec_id = n.vec_id
       |  JOIN lut l ON l.query_id = n.query_id
       |    AND l.s = x.s AND l.cid = x.code
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, vec_id, adc_d2,
       |    row_number() OVER (
       |      PARTITION BY query_id ORDER BY adc_d2 ASC, vec_id ASC) AS rank
       |  FROM adc)
       |SELECT query_id, rank, vec_id, adc_d2 FROM r WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q91 — IVF+PQ over the MATERIALIZED bucketed code layout
  // (scale/IvfPqIndex): same quantizers and ADC scoring as q90, but the
  // corpus was PQ-encoded once at build time into parquet partitioned by
  // cluster_id (one m-byte code row per vector, codebooks stored with
  // the index), and the probe set becomes a partition filter — the ANN
  // serving read at 100 TB lists nProbe/k of the partitions and scans
  // codes, never embeddings. Oracle is q90's SQL verbatim: the two
  // paths are result-identical by construction (IvfPqIndexSpec proves
  // the pruned scan and the equality). Built once per dataset (marker
  // file), reused — the build-once/query-many production shape.
  // ---------------------------------------------------------------------
  def q91AnnIvfPqIndexed(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val dir = cachedIndexDir("ivfpq-index", d, "v1") { p =>
      graft.scale.IvfPqIndex.build(emb, centroids, p,
        centroidCount = Some(strideCentroidCount(s, d, 97)))
    }
    graft.scale.IvfPqIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 10, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------------
  // q88 — hashed linear quality classifier (fastText family, Joulin et
  // al. 2017): the model class behind CCNet/LLaMA-style corpus quality
  // filters. Unigram+bigram features → hashing trick into 4096 weight
  // slots → per-doc integer score, all as a zero-shuffle per-row fold;
  // the frozen md5-derived weight table makes the whole model
  // bit-replayable in DuckDB (a trained model swaps in a broadcast
  // lookup at the same spot). See TextAnalysis.classifierScore.
  // ---------------------------------------------------------------------
  def q88QualityClassifier(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        TextAnalysis.classifierScore(col("w")).as("c"))
      .select(col("doc_id"), col("c.n_feat").as("n_feat"),
        col("c.score").as("score"),
        (col("c.score") > 0).cast("int").as("keep"))
      .orderBy(col("doc_id"))
  val q88Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |feat AS (
      |  SELECT doc_id, unnest(w) AS f FROM tok
      |  UNION ALL
      |  SELECT doc_id, w[i] || ' ' || w[i+1] AS f
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
      |scored AS (
      |  SELECT doc_id, count(*) AS n_feat,
      |    sum(CAST('0x' || substr(md5(CAST(
      |          CAST('0x' || substr(md5(f), 1, 15) AS BIGINT) % 4096
      |        AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000) AS score
      |  FROM feat GROUP BY doc_id)
      |SELECT doc_id, n_feat, CAST(score AS BIGINT) AS score,
      |  CASE WHEN score > 0 THEN 1 ELSE 0 END AS keep
      |FROM scored ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q89 — deterministic shuffle-shard export: the LAST step of a
  // training-data pipeline, turning the filtered corpus into S balanced
  // shards in a pseudo-random but fully reproducible global order
  // (content-hash as the permutation key — re-running the pipeline, on
  // any engine, at any partitioning, yields byte-identical shards).
  // shard = md5_64(text) mod S balances in expectation; the in-shard
  // ordinal is a per-shard sort — exactly how a distributed shard
  // writer works at 100 TB: one shuffle on the shard id, each writer
  // task sorts and streams out its own shard, no global sort anywhere.
  // ---------------------------------------------------------------------
  def q89ShardExport(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h").asc, col("doc_id").asc)
    documents(s, d)
      .select(col("doc_id"),
        graft.functions.Md5_64.md5_64(col("text")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(8L)))
      .withColumn("ordinal", row_number().over(w))
      .select(col("shard"), col("ordinal"), col("doc_id"), col("h"))
      .orderBy(col("shard"), col("ordinal"))
  }
  val q89Sql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
      |  FROM documents)
      |SELECT h % 8 AS shard,
      |  row_number() OVER (PARTITION BY h % 8
      |    ORDER BY h ASC, doc_id ASC) AS ordinal,
      |  doc_id, h
      |FROM h ORDER BY shard, ordinal""".stripMargin

  // ---------------------------------------------------------------------
  // q68 — stratified sampling: exactly k documents per language, chosen
  // by content-hash order (deterministic "random": stable under
  // re-partitioning and engine choice, leak-free like q57). One window
  // shuffle on the stratum key; Spark pushes rank<=k down as
  // WindowGroupLimit so each partition keeps only k candidates.
  // ---------------------------------------------------------------------
  def q68StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val h = graft.functions.RollingHash.rolling_hash(col("text"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    documents(s, d)
      .withColumn("h", h)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rk"))
  }
  val q68Sql: String =
    s"""WITH h AS (
       |  SELECT lang, doc_id, n_chars, $duckRollingHash AS h FROM documents),
       |r AS (
       |  SELECT lang, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS rk
       |  FROM h)
       |SELECT lang, rk, doc_id, n_chars FROM r WHERE rk <= 20
       |ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------------
  // q65 — approximate distinct profile: per-language vocabulary size via
  // HLL++ (approx_count_distinct). At 100 TB the exact distinct is a
  // full-vocabulary shuffle; the sketch is mergeable map-side state of a
  // few KB per group. The sketch VALUE is engine-specific, so the oracle
  // compare is on (a) the exact distinct, hash-exact vs DuckDB, and
  // (b) `approx_ok` — the sketch landing within 5·rsd of exact — which
  // the oracle predicts as constant true. A broken sketch flips the
  // boolean and fails the hash; the tighter ±3·rsd bound stays pinned by
  // ScalaTest. The exact distinct here is verification apparatus: the
  // production operator is the sketch alone.
  // ---------------------------------------------------------------------
  def q65ApproxProfile(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("lang"))
      .agg(approx_count_distinct(col("term"), rsd = 0.02).as("approx_vocab"),
        countDistinct(col("term")).as("exact_vocab"),
        count(lit(1)).as("tokens"))
      .select(col("lang"), col("exact_vocab"), col("tokens"),
        (abs(col("approx_vocab") - col("exact_vocab")) <=
          lit(5 * 0.02) * col("exact_vocab")).as("approx_ok"))
      .orderBy(col("lang"))
  val q65Sql: String =
    """SELECT lang,
      |  CAST(count(DISTINCT term) AS BIGINT) AS exact_vocab,
      |  CAST(count(*) AS BIGINT) AS tokens,
      |  true AS approx_ok
      |FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
      |      FROM documents) t
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** q65's PRODUCTION form: the sketch alone — no exact distinct, so the
    * plan never pays the full-vocabulary shuffle (the HLL++ buffer is a
    * few KB of mergeable map-side state per group). `q65ApproxProfile`
    * above is the verification apparatus (exact + `approx_ok` predicate)
    * and stays the oracle-compared query; THIS is what Bench times
    * (round-5 verdict item 5). */
  def q65SketchProfile(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("lang"))
      .agg(approx_count_distinct(col("term"), rsd = 0.02).as("approx_vocab"),
        count(lit(1)).as("tokens"))
      .orderBy(col("lang"))

  // ---------------------------------------------------------------------
  // q49 — corpus vocabulary: global term frequencies, top-k with
  // deterministic ties (vocab building for tokenizer training)
  // ---------------------------------------------------------------------
  def q49Vocab(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(20)
  val q49Sql: String =
    """SELECT term, count(*) AS freq
      |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
      |GROUP BY term ORDER BY freq DESC, term ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q50 — bigram DOCUMENT frequency (co-occurrence statistics): counts
  // documents containing each bigram, not total occurrences —
  // Dedup.shingles array_distincts per doc, and the oracle's
  // DISTINCT (doc_id, bigram) mirrors that exactly.
  // Bench-noise attribution (round-8 verdict item 7, measured round 9
  // at sf0.1 reps=7): median 0.565 s with an ABSOLUTE rep spread of
  // 0.616 s in one session — the r7→r8 drift (0.46→0.615) sits well
  // inside single-session rep noise; no code on this path changed in
  // either round. The shuffle (explode → groupBy on ~1e5 distinct
  // bigrams) is the noise source, same class as q31/q32's spreads.
  // ---------------------------------------------------------------------
  def q50Bigrams(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(Dedup.shingles(col("w"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("bigram").asc)
      .limit(25)
  val q50Sql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (SELECT DISTINCT doc_id, bigram FROM (
      |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bigram
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w))) AS i) t))
      |SELECT bigram, count(*) AS doc_freq FROM bg
      |GROUP BY bigram ORDER BY doc_freq DESC, bigram ASC LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q51 — TF-IDF scores: the standard importance weighting; tf and df are
  // exact ints, idf = ln(N/df) quantized for cross-engine compare
  // ---------------------------------------------------------------------
  def q51TfIdf(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val terms = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // corpus size as a broadcast scalar INSIDE the plan — a driver-side
    // count() here would be a second full scan at 100 TB
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf_q",
        floor(col("tf") * log(col("n_docs") / col("df")) * 1000000L).cast("long"))
      .filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf_q"))
      .orderBy(col("doc_id"), col("term"))
  }
  val q51Sql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) t
      |  GROUP BY term),
      |n AS (SELECT count(*)::DOUBLE AS n FROM documents)
      |SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |  CAST(floor(tf.tf * ln(n.n / df.df) * 1000000.0) AS BIGINT) AS tfidf_q
      |FROM tf JOIN df USING (term), n
      |WHERE tf.doc_id % 25 = 0
      |ORDER BY tf.doc_id, tf.term""".stripMargin

  // ---------------------------------------------------------------------
  // q92 — BM25 top-k retrieval (Okapi BM25, Lucene idf variant): the
  // lexical-retrieval half of a RAG/retrieval pipeline, via an
  // inverted-postings probe — the broadcast query-term join means only
  // docs containing a query term are ever scored. Per-term scores are
  // quantized to longs BEFORE the per-doc sum so the fold is integer and
  // order-independent; DuckDB replays the identical arithmetic. The
  // query is data-derived (the distinct terms of doc 1, first 8 by term
  // order) so the probe is deterministic at every SF.
  // ---------------------------------------------------------------------
  def q92Bm25TopK(s: SparkSession, d: String): DataFrame =
    graft.scale.Bm25.topK(documents(s, d), doc1Terms(s, d), k = 15)
  /** Shared BM25 CTE chain (→ `lexranked(doc_id, score_q, n_hit,
    * rank)`): q92 slices its top 15, q94 reuses the identical ranking
    * as the lexical half of the fusion. */
  /** `docPred` restricts the scored corpus (toks/stats) — the q145
    * take-down oracle; the query-term source (doc 1) is external
    * input and stays unfiltered. */
  private def bm25CtesOver(docPred: String,
      textExpr: String = "text"): String =
    s"""toks AS (
       |  SELECT doc_id, len(string_split($textExpr, ' ')) AS dl,
       |    unnest(string_split($textExpr, ' ')) AS term FROM documents
       |  WHERE ($docPred)),
       |tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
       |  FROM toks GROUP BY 1, 2),
       |qt AS (SELECT DISTINCT term FROM (
       |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
       |  WHERE doc_id = 1) ORDER BY term ASC LIMIT 8),
       |probed AS (SELECT tf.* FROM tf JOIN qt USING (term)),
       |df AS (SELECT term, count(*) AS df FROM probed GROUP BY term),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs,
       |  avg(len(string_split($textExpr, ' '))) AS avgdl FROM documents
       |  WHERE ($docPred)),
      |scored AS (
      |  SELECT p.doc_id, CAST(floor(
      |    ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
      |    ((p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))) *
      |    1000000.0) AS BIGINT) AS sc
      |  FROM probed p JOIN df USING (term), stats s),
      |agg AS (SELECT doc_id, sum(sc)::BIGINT AS score_q, count(*) AS n_hit
      |  FROM scored GROUP BY doc_id),
      |lexranked AS (SELECT doc_id, score_q, n_hit,
      |  row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
      |  FROM agg)""".stripMargin

  private val bm25Ctes: String = bm25CtesOver("TRUE")

  val q92Sql: String =
    s"""WITH $bm25Ctes
       |SELECT rank, doc_id, n_hit, score_q FROM lexranked
       |WHERE rank <= 15 ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------------
  // q93 — SQ8 scalar-quantized ANN (FAISS QT_8bit shape): per-dimension
  // corpus (min, max) maps every float to an 8-bit code (4× scan-bytes
  // reduction on the serving read); serving is ADC — the query stays
  // full-precision and each corpus code decodes to lo + code·(hi−lo)/255
  // at score time, ranked by cosine. Third point on the compression
  // ladder: q34 float32 / q93 SQ8 / q83 PQ. The oracle replays code,
  // decode, and the sequential cosine fold token for token; recall@5 vs
  // the float baseline is pinned in RetrievalSpec.
  // ---------------------------------------------------------------------
  def q93AnnSq8(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    graft.scale.Sq8.topK(emb.filter(col("vec_id") < 10), emb, k = 5)
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }
  val q93Sql: String =
    s"""WITH dims AS (
       |  SELECT i AS dim, min(embedding[i]::DOUBLE) AS lo,
       |    max(embedding[i]::DOUBLE) AS hi
       |  FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) r
       |  GROUP BY i),
       |dec AS (
       |  SELECT vec_id, list(val ORDER BY dim) AS dec FROM (
       |    SELECT e.vec_id, d.dim,
       |      d.lo + ((CASE WHEN d.hi = d.lo THEN 0 ELSE
       |        least(255, greatest(0, CAST(floor(
       |          (e.embedding[d.dim]::DOUBLE - d.lo) / (d.hi - d.lo)
       |          * 255.0 + 0.5) AS INT))) END)::DOUBLE * (d.hi - d.lo))
       |        / 255.0 AS val
       |    FROM embeddings e, dims d) t GROUP BY vec_id),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    ${duckDot("q.embedding", "c.dec")} /
       |      (sqrt(${duckDot("q.embedding", "q.embedding")}) *
       |       sqrt(${duckDot("c.dec", "c.dec")})) AS sim
       |  FROM embeddings q, dec c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim, row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id,
       |  CAST(floor(sim * 1000000000.0) AS BIGINT) AS sim_q
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // q94 — hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.
  // 2009): q92's BM25 ranking (lexical) fused with a cosine ANN ranking
  // (semantic) for the SAME query document — rrf(d) = Σ 1/(60+rank),
  // absent lists contribute 0, so no cross-retriever score calibration
  // is ever needed. Only the two top-20 lists reach the fusion (O(k)
  // rows per query at any corpus size); the fused sum is a fixed-order
  // two-term double add, replayed term for term by the oracle. Rank 0
  // in the output = "not surfaced by that retriever".
  // ---------------------------------------------------------------------
  /** q94/q103 shared query-term derivation: doc 1's first 8 distinct
    * terms (deterministic at every SF). */
  private def doc1Terms(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("doc_id") === 1)
      .select(explode(split(col("text"), " ")).as("term"))
      .distinct().orderBy(col("term").asc).limit(8)

  /** Test hook: the shared query-term derivation (RetrievalSpec's
    * cascade containment check needs the exact recall input). */
  def doc1TermsFor(s: SparkSession, d: String): DataFrame = doc1Terms(s, d)

  /** The fusion half shared by q94 (in-memory lexical) and q103
    * (materialized-index lexical): any `(id, rank)` lexical top-20
    * fuses with the brute cosine top-20 for query doc 1. */
  private def hybridRrfWith(lex: DataFrame, s: SparkSession,
      d: String): DataFrame = {
    val emb = embeddings(s, d)
    val sem = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === 1), emb, k = 20)
      .select(col("vec_id").as("id"), col("rank"))
    val fused = graft.scale.Hybrid.rrf(Seq(lex, sem))
      .filter(col("id") =!= 1) // the query document itself
      .select(col("id").as("doc_id"),
        coalesce(col("rank_0"), lit(0)).as("lex_rank"),
        coalesce(col("rank_1"), lit(0)).as("sem_rank"),
        floor(col("rrf") * lit(1e9)).cast("long").as("rrf_q"))
    val top = fused.orderBy(col("rrf_q").desc, col("doc_id").asc).limit(10)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_q").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf_q"))
  }

  def q94HybridRrf(s: SparkSession, d: String): DataFrame = {
    val lex = graft.scale.Bm25.topK(documents(s, d), doc1Terms(s, d), k = 20)
      .select(col("doc_id").as("id"), col("rank"))
    hybridRrfWith(lex, s, d)
  }
  val q94Sql: String =
    s"""WITH $bm25Ctes,
       |sem0 AS (
       |  SELECT c.vec_id AS id, ${duckCos("q.embedding", "c.embedding")} AS sim
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id = 1 AND c.vec_id <> 1),
       |sem AS (SELECT id, row_number() OVER (
       |  ORDER BY sim DESC, id ASC) AS sem_rank FROM sem0),
       |fused AS (
       |  SELECT coalesce(l.doc_id, s.id) AS doc_id,
       |    coalesce(l.rank, 0) AS lex_rank,
       |    coalesce(s.sem_rank, 0) AS sem_rank,
       |    CAST(floor((
       |      (CASE WHEN l.rank IS NULL THEN 0.0
       |            ELSE 1.0 / (60 + l.rank) END) +
       |      (CASE WHEN s.sem_rank IS NULL THEN 0.0
       |            ELSE 1.0 / (60 + s.sem_rank) END)) * 1000000000.0)
       |      AS BIGINT) AS rrf_q
       |  FROM (SELECT doc_id, rank FROM lexranked WHERE rank <= 20) l
       |  FULL OUTER JOIN (SELECT id, sem_rank FROM sem
       |    WHERE sem_rank <= 20) s ON l.doc_id = s.id
       |  WHERE coalesce(l.doc_id, s.id) <> 1)
       |SELECT row_number() OVER (ORDER BY rrf_q DESC, doc_id ASC) AS rank,
       |  doc_id, lex_rank, sem_rank, rrf_q
       |FROM fused ORDER BY rank LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // q95 — link-graph degree profile: the bipartite co-purchase graph
  // (customer ↔ part via orders⨝lineitem, distinct pairs) profiled by
  // node degree — the hub/authority sweep run before any graph-aware
  // sampling or dedup decision. Edge derivation shuffles 16-byte pairs,
  // never full rows; top-100 is limit-then-rank so the window sorts
  // 100 rows, not the node set.
  // ---------------------------------------------------------------------
  private def withRankKind(top: DataFrame, order: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
    top.withColumn("rank", row_number().over(w))
      .withColumn("kind",
        when(col("node") >= lit(graft.scale.Graph.PartBase), lit("part"))
          .otherwise(lit("customer")))
  }
  /** The co-purchase edge table, materialized once per dataset
    * (build-once/query-many — the q85/q91/q102 index pattern): all
    * four graph queries (q95/q96/q100/q105) consume the same derived
    * edges, and a real deployment derives a graph's edge table once,
    * not per query. Written src-repartitioned; correctness is
    * unaffected (every oracle re-derives edges relationally). */
  private def purchaseEdgesCached(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("purchase-edges", d, "v1",
      datasets = Seq("lineitem.parquet", "orders.parquet")) { p =>
      graft.scale.Graph.purchaseEdges(orders(s, d), lineitem(s, d))
        .repartition(col("src"))
        .write.mode("overwrite").parquet(s"$p/edges")
    }
    s.read.parquet(s"$dir/edges")
  }

  def q95LinkGraph(s: SparkSession, d: String): DataFrame = {
    val deg = graft.scale.Graph.degrees(purchaseEdgesCached(s, d))
    val top = deg.orderBy(col("degree").desc, col("node").asc).limit(100)
    withRankKind(top, Seq(col("degree").desc, col("node").asc))
      .select(col("rank"), col("node"), col("kind"), col("degree"))
      .orderBy(col("rank"))
  }
  /** Shared edge/degree CTEs (node encoding: part = 10000000 + key). */
  private val graphCtes: String =
    """cp AS (
      |  SELECT DISTINCT o_custkey AS c, l_partkey + 10000000 AS p
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |edges AS (SELECT c AS src, p AS dst FROM cp
      |  UNION ALL SELECT p AS src, c AS dst FROM cp),
      |deg AS (SELECT src AS node, count(*) AS degree FROM edges
      |  GROUP BY src)""".stripMargin
  private val kindSql =
    "CASE WHEN node >= 10000000 THEN 'part' ELSE 'customer' END AS kind"
  val q95Sql: String =
    s"""WITH $graphCtes
       |SELECT row_number() OVER (ORDER BY degree DESC, node ASC) AS rank,
       |  node, $kindSql, degree
       |FROM deg ORDER BY rank LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // q96 — PageRank over the co-purchase graph: 3 join-iterated rounds
  // of the integer-space recurrence (scale/Graph.pageRankQ — damping
  // 85/100, all divisions integer, so every per-node sum is an exact
  // long fold and the DuckDB oracle unrolls the identical recurrence
  // round for round). The edge table is shuffled once and reused by
  // all three iterations (ReusedExchange, spec-asserted); each round's
  // only new shuffle carries 16-byte (dst, contrib) rows.
  // Bench attribution (measured r11, local[32], warm): ~2.2 s of the
  // wall time is FIXED multi-stage scheduling/codegen overhead —
  // sf0.001 and sf0.1 cost 2.2 s vs ~4 s despite 100x the data — so
  // the only term that scales with |E| is the O(E) contribution
  // shuffle, exactly the term that matters at 100 TB. An eager
  // per-round localCheckpoint variant measured SLOWER (3.9 s) than
  // this declarative plan; AQE on/off is within noise.
  // ---------------------------------------------------------------------
  def q96PageRank(s: SparkSession, d: String): DataFrame = {
    val pr = graft.scale.Graph.pageRankQ(purchaseEdgesCached(s, d),
      iterations = 3)
    val top = pr.orderBy(col("pr_q").desc, col("node").asc).limit(100)
    withRankKind(top, Seq(col("pr_q").desc, col("node").asc))
      .select(col("rank"), col("node"), col("kind"), col("degree"),
        col("pr_q"))
      .orderBy(col("rank"))
  }
  val q96Sql: String = {
    // unrolled integer recurrence; r_i kept BIGINT (sums are HUGEINT in
    // DuckDB — cast back each round so 85*s stays in int64 range)
    val rounds = (1 to 3).map { i =>
      s"""s$i AS (SELECT e.dst AS node, sum(r.r // r.degree) AS s
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst),
         |r$i AS (SELECT d.node, d.degree, CAST(
         |    (150000000000 // n.n) + (85 * coalesce(s$i.s, 0)) // 100
         |    AS BIGINT) AS r
         |  FROM deg d LEFT JOIN s$i ON d.node = s$i.node, n)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |n AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT node, degree, 1000000000000 // n.n AS r FROM deg, n),
       |$rounds
       |SELECT row_number() OVER (ORDER BY r DESC, node ASC) AS rank,
       |  node, $kindSql, degree, r AS pr_q
       |FROM r3 ORDER BY rank LIMIT 100""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q97 — priority sampling (Duffield-Lund-Thorup): weighted sampling
  // without replacement with priority w/u — u the content-hash uniform
  // (md5_64 + 1) / 2^60, so the sample is a pure function of the data
  // (leak-free and re-runnable like q57/q68, but WEIGHTED: longer docs
  // proportionally likelier). Both factors of w·2^60/(h+1) are exactly
  // representable and IEEE ops are exactly rounded, so the double
  // priorities — and hence the top-k — are bit-identical cross-engine;
  // the output carries only integer columns. Top-k is limit-then-rank:
  // TakeOrderedAndProject, never a global-window sort.
  // ---------------------------------------------------------------------
  /** Priority sample of `docs` weighted by `n_chars`: top-k by
    * w·2^60/(md5_64(text)+1). Public so specs can vary k (the top-k'
    * sample is a prefix of top-k for k' < k — the property that lets a
    * 100 TB pipeline cut a smaller sample out of a bigger one without
    * recomputing). */
  def prioritySample(docs: DataFrame, k: Int): DataFrame = {
    val pr = docs
      .select(col("doc_id"), col("n_chars"),
        graft.functions.Md5_64.md5_64(col("text")).as("h"))
      .withColumn("priority",
        col("n_chars").cast("double") * lit(1152921504606846976L).cast("double")
          / (col("h") + lit(1L)).cast("double"))
    val top = pr.orderBy(col("priority").desc, col("doc_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("n_chars"), col("h"))
      .orderBy(col("rank"))
  }
  def q97PrioritySample(s: SparkSession, d: String): DataFrame =
    prioritySample(documents(s, d), 100)
  val q97Sql: String =
    """WITH h AS (
      |  SELECT doc_id, n_chars,
      |    CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
      |  FROM documents),
      |p AS (SELECT doc_id, n_chars, h,
      |  (n_chars::DOUBLE * 1152921504606846976.0) / ((h + 1)::DOUBLE)
      |    AS priority FROM h)
      |SELECT row_number() OVER (ORDER BY priority DESC, doc_id ASC) AS rank,
      |  doc_id, n_chars, h
      |FROM p ORDER BY rank LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // q98 — Z-order (Morton) box read: events bucketed to (user_id mod
  // 256, epoch-minute mod 256), bit-interleaved to a z-value (pure
  // codegen'd bit algebra, scale/Layout.zValue), filtered to an
  // axis-aligned box. The oracle replays the interleave bit for bit.
  // The LAYOUT half — z-sorted files whose min/max stats prune the box
  // read to a file subset — is ZOrderSpec's measured claim; this query
  // pins the z arithmetic the layout and its serving reads share.
  // ---------------------------------------------------------------------
  def q98ZOrderBox(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
      .withColumn("z", graft.scale.Layout.zValue(col("xb"), col("yb")))
      .filter(col("xb").between(16, 31) && col("yb").between(32, 63))
      .orderBy(col("event_id"))
  val q98Sql: String = {
    val zExpr = (0 until 8).map { i =>
      s"(((xb >> $i) & 1) << ${2 * i}) | (((yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH b AS (
       |  SELECT event_id, user_id % 256 AS xb,
       |    (epoch_ms(ts) // 60000) % 256 AS yb
       |  FROM events)
       |SELECT event_id, xb, yb, CAST($zExpr AS BIGINT) AS z
       |FROM b WHERE xb BETWEEN 16 AND 31 AND yb BETWEEN 32 AND 63
       |ORDER BY event_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q99 — tight z-interval cover, cross-engine: the Spark side selects
  // the box PURELY through Layout.zIntervals' quadtree decomposition
  // (an OR of z ranges — NO per-dimension predicates anywhere), while
  // the oracle states the plain box predicate. Hash-equality is
  // therefore a data-level proof that the interval cover is EXACT —
  // the property that lets boxScanTight drop residual filters and
  // turn the whole box read into range predicates that parquet
  // min/max stats and partition dirs can prune on.
  // ---------------------------------------------------------------------
  def q99ZOrderTight(s: SparkSession, d: String): DataFrame = {
    val ivs = graft.scale.Layout.zIntervals(16, 31, 32, 63)
    events(s, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
      .withColumn("z", graft.scale.Layout.zValue(col("xb"), col("yb")))
      // loop-shaped cover predicate, NOT an OR of betweens: over a
      // COMPUTED z, filter codegen re-inlines the whole interleave
      // into every OR branch (no CSE across short-circuits) — the
      // round-17 janino hazard q176 actually hit
      .filter(graft.functions.InIntervals(col("z"), ivs))
      .orderBy(col("event_id"))
  }
  val q99Sql: String = {
    val zExpr = (0 until 8).map { i =>
      s"(((xb >> $i) & 1) << ${2 * i}) | (((yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH b AS (
       |  SELECT event_id, user_id % 256 AS xb,
       |    (epoch_ms(ts) // 60000) % 256 AS yb
       |  FROM events)
       |SELECT event_id, xb, yb, CAST($zExpr AS BIGINT) AS z
       |FROM b WHERE xb BETWEEN 16 AND 31 AND yb BETWEEN 32 AND 63
       |ORDER BY event_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q100 — deterministic random walks (node2vec-style graph-to-sequence
  // corpus generation): 3 hops from every 100th customer node, the
  // next hop = the neighbor minimizing md5_64("t:u:v") — the
  // content-hash uniform applied to edges, so the walks are a pure
  // function of the graph and DuckDB replays every hop (row_number
  // over the identical hash). Spark picks the argmin via min-struct
  // aggregation (map-side combinable: a hot node's candidates collapse
  // BEFORE the shuffle — deliberately not a window rank, which would
  // sort a hot frontier key in one partition); the frontier joins the
  // src-keyed edge exchange each hop (materialized once, reused).
  // ---------------------------------------------------------------------
  def q100RandomWalks(s: SparkSession, d: String): DataFrame = {
    val e = purchaseEdgesCached(s, d)
    val starts = e
      .filter(col("src") < lit(graft.scale.Graph.PartBase) &&
        col("src") % 100 === 0)
      .select(col("src").as("walk_id"), col("src").as("node")).distinct()
    graft.scale.Graph.randomWalks(e, starts, steps = 3)
      .orderBy(col("walk_id"), col("step"))
  }
  val q100Sql: String = {
    val hop = (t: Int) =>
      s"""w$t AS (SELECT walk_id, node FROM (
         |  SELECT s.walk_id, e.dst AS node, row_number() OVER (
         |    PARTITION BY s.walk_id
         |    ORDER BY CAST('0x' || substr(md5(
         |      concat_ws(':', $t, s.node, e.dst)), 1, 15) AS BIGINT) ASC,
         |      e.dst ASC) AS rk
         |  FROM w${t - 1} s JOIN edges e ON s.node = e.src) WHERE rk = 1)""".stripMargin
    s"""WITH $graphCtes,
       |w0 AS (SELECT c AS walk_id, c AS node
       |  FROM (SELECT DISTINCT c FROM cp) WHERE c % 100 = 0),
       |${hop(1)},
       |${hop(2)},
       |${hop(3)}
       |SELECT walk_id, 0 AS step, node FROM w0
       |UNION ALL SELECT walk_id, 1 AS step, node FROM w1
       |UNION ALL SELECT walk_id, 2 AS step, node FROM w2
       |UNION ALL SELECT walk_id, 3 AS step, node FROM w3
       |ORDER BY walk_id, step""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q101 — Count-Min heavy hitters (Cormode & Muthukrishnan 2005): the
  // corpus token stream folds into a 4×1024-cell sketch (state size
  // independent of corpus size; map-side partial agg means the shuffle
  // carries at most tasks·d·w cell updates, never tokens; per-shard
  // sketches merge by cell-wise add), then the 15 highest-true-count
  // terms are point-queried — est = min over the term's 4 cells. The
  // md5-derived row hashes make the whole sketch bit-reproducible in
  // DuckDB, so the oracle checks the ESTIMATES exactly, not just the
  // est ≥ true one-sided guarantee (which SketchSpec pins corpus-wide).
  // ---------------------------------------------------------------------
  def q101CountMin(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
    val cms = graft.scale.Sketch.countMin(toks)
    val trueCnt = toks.groupBy(col("term")).agg(count(lit(1)).as("true_cnt"))
    val probes = trueCnt
      .orderBy(col("true_cnt").desc, col("term").asc).limit(15)
    graft.scale.Sketch.estimate(cms, probes.select(col("term")))
      .join(probes, "term")
      .select(col("term"), col("true_cnt"), col("est_cnt"))
      .orderBy(col("true_cnt").desc, col("term").asc)
  }
  val q101Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |truec AS (SELECT term, count(*) AS true_cnt FROM toks GROUP BY term),
      |probes AS (SELECT term, true_cnt FROM truec
      |  ORDER BY true_cnt DESC, term ASC LIMIT 15),
      |cells AS (
      |  SELECT r, CAST('0x' || substr(md5(concat_ws(':', r, term)), 1, 15)
      |      AS BIGINT) % 1024 AS b, count(*) AS cnt
      |  FROM toks, LATERAL (SELECT unnest(range(0, 4)) AS r) d
      |  GROUP BY 1, 2),
      |pb AS (
      |  SELECT p.term, d.r,
      |    CAST('0x' || substr(md5(concat_ws(':', d.r, p.term)), 1, 15)
      |      AS BIGINT) % 1024 AS b
      |  FROM probes p, LATERAL (SELECT unnest(range(0, 4)) AS r) d),
      |est AS (
      |  SELECT pb.term, min(coalesce(c.cnt, 0)) AS est_cnt
      |  FROM pb LEFT JOIN cells c ON c.r = pb.r AND c.b = pb.b
      |  GROUP BY pb.term)
      |SELECT p.term, p.true_cnt, e.est_cnt
      |FROM probes p JOIN est e USING (term)
      |ORDER BY p.true_cnt DESC, p.term ASC""".stripMargin

  // ---------------------------------------------------------------------
  // q102 — BM25 over the MATERIALIZED inverted-index layout
  // (`scale/BmIndex`): postings bucketed by md5(term) mod 64 into
  // partition dirs, probe terms' buckets driver-computed and listed as
  // a partition filter — the serving read scans only the probed
  // buckets' postings, never the corpus (BmIndexSpec proves the pruned
  // scan from the executed plan). Stats (N, Σdl) stored with the
  // index; scoring reuses Bm25.rank verbatim, so this is
  // result-identical to q92 by construction and rides its oracle —
  // same pattern as q85 (IVF) and q91 (IVF+PQ).
  // ---------------------------------------------------------------------
  def q102Bm25Indexed(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    // "v2": index format gains the _bm_docs committed-id table (the
    // append dedup gate) — a round-11 cached index must rebuild once
    val dir = cachedIndexDir("bm-index", d, "v2",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.BmIndex.build(docs, p)
    }
    graft.scale.BmIndex.topK(s, dir, doc1Terms(s, d), k = 15)
  }

  // ---------------------------------------------------------------------
  // q103 — the materialized serving stack end to end: hybrid RRF where
  // the LEXICAL leg is served from the bucketed postings index
  // (scale/BmIndex — partition-pruned probe) instead of re-deriving
  // postings from the corpus, fused with the ANN leg exactly as q94.
  // BmIndex.topK is result-identical to Bm25.topK by construction, so
  // the fusion output is q94's bit for bit and rides its oracle — the
  // composition a 100 TB RAG serving read actually runs (index probe +
  // ANN + rank-only fusion), with zero corpus scans on the lexical
  // side.
  // ---------------------------------------------------------------------
  def q103HybridIndexed(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("bm-index", d, "v2",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.BmIndex.build(documents(s, d), p)
    }
    val lex = graft.scale.BmIndex.topK(s, dir, doc1Terms(s, d), k = 20)
      .select(col("doc_id").as("id"), col("rank"))
    hybridRrfWith(lex, s, d)
  }

  // ---------------------------------------------------------------------
  // q104 — sliding-window chunking (the RAG-ingestion step between
  // documents and embeddings): 64-token windows at stride 32, per-doc
  // chunk ordinals, each chunk content-addressed by md5_64 so the
  // output stays narrow and downstream dedup/embedding stages key on
  // the hash. Pure per-row generation (sequence + explode + slice —
  // zero shuffle, stays in codegen); chunk count ~n/stride per doc.
  // DuckDB replays the window arithmetic and the hash bit for bit.
  // ---------------------------------------------------------------------
  /** The 64/32 sliding-window chunk table (shared by q104 and q106). */
  private def chunksOf(s: SparkSession, d: String): DataFrame =
    chunksOfDocs(documents(s, d))

  /** The q104 chunking rule over an arbitrary (doc_id, text) frame —
    * q161 feeds it revised texts. */
  private def chunksOfDocs(docs: DataFrame): DataFrame = {
    val (win, stride) = (64, 32)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_ix"),
        col("start").cast("long").as("start"),
        least(lit(win), col("n") - col("start")).cast("long").as("n_tok"),
        graft.functions.Md5_64.md5_64(
          array_join(slice(col("w"), col("start") + 1, lit(win)), " "))
          .as("chunk_hash"))
  }
  def q104Chunking(s: SparkSession, d: String): DataFrame =
    chunksOf(s, d).orderBy(col("doc_id"), col("chunk_ix"))
  val q104Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |st AS (
      |  SELECT doc_id, w, n, unnest(range(0, n, 32)) AS start FROM tok)
      |SELECT doc_id,
      |  start // 32 AS chunk_ix,
      |  start AS start,
      |  least(64, n - start) AS n_tok,
      |  CAST('0x' || substr(md5(
      |    array_to_string(w[start + 1 : start + 64], ' ')), 1, 15)
      |    AS BIGINT) AS chunk_hash
      |FROM st ORDER BY doc_id, chunk_ix""".stripMargin

  // ---------------------------------------------------------------------
  // q105 — personalized PageRank (seeded teleport): rank = proximity to
  // the seed set (every 100th customer — q100's walk seeds), the
  // recommendation/retrieval-expansion form of q96. Same integer
  // recurrence with the teleport mass restricted to seeds; nodes
  // unreachable within 3 hops hold exactly 0 (integer arithmetic — no
  // float dust), which the oracle reproduces term for term. Output
  // keeps pr_q > 0 rows only (the reachable neighborhood), top-100.
  // ---------------------------------------------------------------------
  def q105PersonalizedPr(s: SparkSession, d: String): DataFrame = {
    val edges = purchaseEdgesCached(s, d)
    val seeds = graft.scale.Graph.degrees(edges)
      .filter(col("node") < lit(graft.scale.Graph.PartBase) &&
        col("node") % 100 === 0)
      .select(col("node"))
    val pr = graft.scale.Graph.personalizedPageRankQ(edges, seeds,
        iterations = 3)
      .filter(col("pr_q") > 0)
    val top = pr.orderBy(col("pr_q").desc, col("node").asc).limit(100)
    withRankKind(top, Seq(col("pr_q").desc, col("node").asc))
      .select(col("rank"), col("node"), col("kind"), col("degree"),
        col("pr_q"))
      .orderBy(col("rank"))
  }
  val q105Sql: String = {
    val rounds = (1 to 3).map { i =>
      s"""s$i AS (SELECT e.dst AS node, sum(r.r // r.degree) AS s
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst),
         |r$i AS (SELECT d.node, d.degree, CAST(
         |    (CASE WHEN sd.node IS NOT NULL
         |          THEN 150000000000 // ns.n ELSE 0 END) +
         |    (85 * coalesce(s$i.s, 0)) // 100 AS BIGINT) AS r
         |  FROM deg d LEFT JOIN s$i ON d.node = s$i.node
         |  LEFT JOIN seeds sd ON d.node = sd.node, ns)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |seeds AS (SELECT node FROM deg
       |  WHERE node < 10000000 AND node % 100 = 0),
       |ns AS (SELECT count(*) AS n FROM seeds),
       |r0 AS (SELECT d.node, d.degree,
       |    CASE WHEN sd.node IS NOT NULL
       |         THEN 1000000000000 // ns.n ELSE 0 END AS r
       |  FROM deg d LEFT JOIN seeds sd ON d.node = sd.node, ns),
       |$rounds
       |SELECT row_number() OVER (ORDER BY r DESC, node ASC) AS rank,
       |  node, $kindSql, degree, r AS pr_q
       |FROM r3 WHERE r > 0 ORDER BY rank LIMIT 100""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q106 — chunk-level cross-document dup profile: q80's decision
  // metric at q104's chunk granularity (the dedup gate a RAG/embedding
  // pipeline runs BEFORE paying for embeddings — identical chunks
  // embed identically). A chunk is dup iff its content hash occurs in
  // ≥2 DISTINCT documents; per-doc output = chunk counts + the dup
  // fraction, quantized. Shuffles carry (hash, doc) pairs — 16 bytes —
  // never chunk text; the hash doc-frequency join is the same inverted
  // shape as q80's shingle index.
  // ---------------------------------------------------------------------
  def q106ChunkDedup(s: SparkSession, d: String): DataFrame = {
    val ch = chunksOf(s, d).select(col("doc_id"), col("chunk_hash"))
    val hdf = ch.distinct()
      .groupBy(col("chunk_hash")).agg(count(lit(1)).as("hdf"))
    ch.join(hdf, "chunk_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("hdf") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        floor(col("n_dup").cast("double") * lit(1000000.0)
          / col("n_chunks").cast("double")).cast("long").as("dup_frac_q"))
      .orderBy(col("doc_id"))
  }
  val q106Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |st AS (
      |  SELECT doc_id, w, n, unnest(range(0, n, 32)) AS start FROM tok),
      |ch AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(
      |    array_to_string(w[start + 1 : start + 64], ' ')), 1, 15)
      |    AS BIGINT) AS chunk_hash FROM st),
      |hdf AS (
      |  SELECT chunk_hash, count(*) AS hdf FROM (
      |    SELECT DISTINCT doc_id, chunk_hash FROM ch) GROUP BY chunk_hash)
      |SELECT ch.doc_id, count(*) AS n_chunks,
      |  sum(CASE WHEN hdf.hdf >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
      |  CAST(floor((sum(CASE WHEN hdf.hdf >= 2 THEN 1 ELSE 0 END)::DOUBLE
      |    * 1000000.0) / count(*)::DOUBLE) AS BIGINT) AS dup_frac_q
      |FROM ch JOIN hdf USING (chunk_hash)
      |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q107 — greedy subword tokenization (WordPiece/BPE INFERENCE — the
  // encode step complementing q75's merge-pair training): per word,
  // longest-match against a frozen vocab (3-char > 2-char > single
  // char), implemented as a fold over character positions with the
  // `aggregate` HOF — whole-stage codegen, zero shuffle; per-doc
  // totals + the subword/whitespace compression ratio. The oracle
  // replays the IDENTICAL fold via list_reduce (the duckDot
  // prepend-initial trick), so greedy choices match position for
  // position. A trained vocab swaps in for the frozen lists (q88
  // frozen-model pattern).
  // ---------------------------------------------------------------------
  private val WpThrees = Seq("the", "ing", "ion", "ent", "and", "for",
    "ter", "ate", "tio", "est")
  private val WpTwos = Seq("th", "er", "on", "an", "re", "en", "at",
    "es", "or", "te", "in", "ed")
  def q107Wordpiece(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    val wp = aggregate(
      transform(words, w =>
        TextAnalysis.wordpieceCount(w, WpThrees, WpTwos).cast("long")),
      lit(0L), (acc, x) => acc + x)
    documents(s, d)
      .select(col("doc_id"), size(words).cast("long").as("ws_tokens"),
        wp.as("wp_tokens"))
      .withColumn("ratio_q",
        floor(col("wp_tokens").cast("double") * lit(1000000.0)
          / col("ws_tokens").cast("double")).cast("long"))
      .orderBy(col("doc_id"))
  }
  val q107Sql: String = {
    val threes = WpThrees.map(v => s"'$v'").mkString(", ")
    val twos = WpTwos.map(v => s"'$v'").mkString(", ")
    // DuckDB 1.0 list_reduce mis-vectorizes correlated multi-row folds
    // (verified: correct per-row, wrong across rows of differing list
    // lengths), so the oracle walks the identical greedy chain with a
    // recursive CTE over precomputed per-position jumps — per DISTINCT
    // word, joined back to token instances.
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |dw AS (SELECT DISTINCT word FROM toks WHERE len(word) > 0),
       |jumps AS (
       |  SELECT word, i AS pos,
       |    CASE WHEN substr(word, i::INT, 3) IN ($threes) THEN 3
       |         WHEN substr(word, i::INT, 2) IN ($twos) THEN 2
       |         ELSE 1 END AS jump
       |  FROM dw, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) p),
       |walk AS (
       |  SELECT word, 1 AS pos, 0 AS n FROM dw
       |  UNION ALL
       |  SELECT w.word, w.pos + j.jump, w.n + 1
       |  FROM walk w JOIN jumps j ON j.word = w.word AND j.pos = w.pos),
       |wp AS (SELECT word, n AS wp FROM walk WHERE pos > len(word)),
       |perdoc AS (
       |  SELECT t.doc_id, count(*) AS ws_tokens,
       |    sum(coalesce(wp.wp, 0))::BIGINT AS wp_tokens
       |  FROM toks t LEFT JOIN wp ON t.word = wp.word
       |  GROUP BY t.doc_id)
       |SELECT doc_id, ws_tokens, wp_tokens,
       |  CAST(floor((wp_tokens::DOUBLE * 1000000.0) / ws_tokens::DOUBLE)
       |    AS BIGINT) AS ratio_q
       |FROM perdoc ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q108 — DIRECTED PageRank with dangling-mass redistribution
  // (scale/Graph.pageRankDirectedQ): the customer→part purchase graph
  // taken as-is — parts are pure sinks (no out-edges), exactly the
  // wiki-link-graph shape (pages that are only linked TO) the symmetric
  // q96 form refuses. The node set comes from BOTH endpoints, sink mass
  // is redistributed uniformly each round, and the whole recurrence
  // stays in integer space, so the oracle unrolls it round for round
  // including the per-round dangling scalar. Directed edges are the
  // first half of the cached symmetric edge table (src < PartBase ⟺
  // the customer→part direction) — a pushed-down partition-friendly
  // filter, no re-derivation.
  // ---------------------------------------------------------------------
  def q108PagerankDirected(s: SparkSession, d: String): DataFrame = {
    val e = purchaseEdgesCached(s, d)
      .filter(col("src") < lit(graft.scale.Graph.PartBase))
    val pr = graft.scale.Graph.pageRankDirectedQ(e, iterations = 3)
    val top = pr.orderBy(col("pr_q").desc, col("node").asc).limit(100)
    withRankKind(top, Seq(col("pr_q").desc, col("node").asc))
      .select(col("rank"), col("node"), col("kind"), col("outdeg"),
        col("pr_q"))
      .orderBy(col("rank"))
  }
  /** Shared oracle fragment: one round of the dangling-corrected
    * directed PageRank recurrence over `dedges`/`dn`/`n` — consumed
    * verbatim by q108 and q112 (ONE definition to keep the recurrence
    * replay in sync with Graph.pageRankDirectedQ; was inlined twice
    * before the round-12 dedup, with q120's weighted variant the only
    * legitimately different copy). */
  private def directedPrRoundsSql(iterations: Int): String =
    (1 to iterations).map { i =>
      s"""s$i AS MATERIALIZED (SELECT e.dst AS node, sum(r.r // r.outdeg) AS s
         |  FROM dedges e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst),
         |d$i AS MATERIALIZED (SELECT coalesce(sum(r), 0) AS dm FROM r${i - 1}
         |  WHERE outdeg = 0),
         |r$i AS MATERIALIZED (SELECT dg.node, dg.outdeg, CAST(
         |    (150000000000 // n.n) +
         |    (85 * (coalesce(s$i.s, 0) + (d$i.dm // n.n))) // 100
         |    AS BIGINT) AS r
         |  FROM dn dg LEFT JOIN s$i ON dg.node = s$i.node, n, d$i)""".stripMargin
    }.mkString(",\n")

  val q108Sql: String = {
    val rounds = directedPrRoundsSql(3)
    s"""WITH cp AS (
       |  SELECT DISTINCT o_custkey AS c, l_partkey + 10000000 AS p
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |dedges AS (SELECT c AS src, p AS dst FROM cp),
       |outd AS (SELECT src AS node, count(*) AS outdeg FROM dedges
       |  GROUP BY src),
       |dn AS (
       |  SELECT nd.node, coalesce(o.outdeg, 0) AS outdeg
       |  FROM (SELECT src AS node FROM dedges
       |        UNION SELECT dst AS node FROM dedges) nd
       |  LEFT JOIN outd o ON nd.node = o.node),
       |n AS (SELECT count(*) AS n FROM dn),
       |r0 AS (SELECT node, outdeg, 1000000000000 // n.n AS r FROM dn, n),
       |$rounds
       |SELECT row_number() OVER (ORDER BY r DESC, node ASC) AS rank,
       |  node, $kindSql, outdeg, r AS pr_q
       |FROM r3 ORDER BY rank LIMIT 100""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q109 — heavy hitters with NO candidate list (the discovery half
  // q101's point queries lack): CMS + threshold second pass
  // (scale/Sketch.heavyHitters). The sketch (fixed d×w cells) is built
  // in one pass and collected (control-plane, ≤4096 cells); the second
  // pass evaluates every occurrence's estimate inline against the d
  // array-literal rows and filters BEFORE any shuffle, so the only
  // aggregation carries surviving heavy-term occurrences. est ≥ true
  // is one-sided: every term with true count ≥ N/1000 is guaranteed
  // present (SketchSpec pins completeness against exact counts); the
  // md5 row hashes make the candidate set bit-reproducible, so the
  // oracle replays the exact emitted set, not just the guarantee. On
  // this corpus N/1000 is the threshold that splits the ~900-count
  // head from the tail term.
  // ---------------------------------------------------------------------
  def q109HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
    graft.scale.Sketch.heavyHitters(toks, phi = 1000L)
      .orderBy(col("est_cnt").desc, col("term").asc)
  }
  val q109Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |n AS (SELECT count(*) AS n FROM toks),
      |cells AS (
      |  SELECT r, CAST('0x' || substr(md5(concat_ws(':', r, term)), 1, 15)
      |      AS BIGINT) % 1024 AS b, count(*) AS cnt
      |  FROM toks, LATERAL (SELECT unnest(range(0, 4)) AS r) d
      |  GROUP BY 1, 2),
      |dt AS (SELECT DISTINCT term FROM toks),
      |pb AS (
      |  SELECT dt.term, d.r,
      |    CAST('0x' || substr(md5(concat_ws(':', d.r, dt.term)), 1, 15)
      |      AS BIGINT) % 1024 AS b
      |  FROM dt, LATERAL (SELECT unnest(range(0, 4)) AS r) d),
      |est AS (
      |  SELECT pb.term, min(coalesce(c.cnt, 0)) AS est_cnt
      |  FROM pb LEFT JOIN cells c ON c.r = pb.r AND c.b = pb.b
      |  GROUP BY pb.term)
      |SELECT term, est_cnt FROM est, n
      |WHERE est_cnt >= n.n // 1000
      |ORDER BY est_cnt DESC, term ASC""".stripMargin

  // ---------------------------------------------------------------------
  // q110 — LONG random walks (node2vec-length): 16 hops with the
  // frontier materialized every 8 (Graph.randomWalks materializeEvery),
  // so the final plan carries at most 8 hop-joins no matter the walk
  // length — the plan-depth bound a 40-80-hop walker needs
  // (GraphSpec asserts the bound from the executed plan with its own
  // cadences). Hop algebra identical to q100 (content-hash argmin,
  // map-side combinable), so the oracle unrolls the same recurrence 16
  // deep; hash-equality proves the checkpoint cadence changes nothing
  // about the data. Cadence 4 → 8 adjudicated r21 (round-20 verdict
  // item 7, two independent idle 7-rep fresh-JVM pairs: 7.58/7.28 s at
  // 4 vs 6.90/5.23 s at 8 — every 8-run beat every 4-run; 16 steps at
  // cadence 8 = one mid-walk checkpoint instead of three, trading two
  // eager materializations for a deeper-but-bounded segment plan).
  // ---------------------------------------------------------------------
  private val LongWalkSteps = 16
  def q110LongWalks(s: SparkSession, d: String): DataFrame = {
    val e = purchaseEdgesCached(s, d)
    val starts = e
      .filter(col("src") < lit(graft.scale.Graph.PartBase) &&
        col("src") % 100 === 0)
      .select(col("src").as("walk_id"), col("src").as("node")).distinct()
    graft.scale.Graph.randomWalks(e, starts, steps = LongWalkSteps,
        materializeEvery = 8)
      .orderBy(col("walk_id"), col("step"))
  }
  val q110Sql: String = {
    val hop = (t: Int) =>
      s"""w$t AS (SELECT walk_id, node FROM (
         |  SELECT s.walk_id, e.dst AS node, row_number() OVER (
         |    PARTITION BY s.walk_id
         |    ORDER BY CAST('0x' || substr(md5(
         |      concat_ws(':', $t, s.node, e.dst)), 1, 15) AS BIGINT) ASC,
         |      e.dst ASC) AS rk
         |  FROM w${t - 1} s JOIN edges e ON s.node = e.src) WHERE rk = 1)""".stripMargin
    val hops = (1 to LongWalkSteps).map(hop).mkString(",\n")
    val unions = (1 to LongWalkSteps).map(t =>
      s"UNION ALL SELECT walk_id, $t AS step, node FROM w$t").mkString("\n")
    s"""WITH $graphCtes,
       |w0 AS (SELECT c AS walk_id, c AS node
       |  FROM (SELECT DISTINCT c FROM cp) WHERE c % 100 = 0),
       |$hops
       |SELECT walk_id, 0 AS step, node FROM w0
       |$unions
       |ORDER BY walk_id, step""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q111 — TRAINED-vocab subword tokenization (closing the q75→q107
  // loop at realistic vocab size): the vocab is LEARNED from the corpus
  // — the top-1000 character n-grams (len 2-4, spaces included: real
  // BPE vocabs carry space-prefixed tokens) by occurrence, tie-broken
  // (count desc, gram asc) so the cut is deterministic — then each
  // document's FULL text is greedily longest-match tokenized by the
  // hash-set expression (functions.SubwordCount: O(maxLen) set probes
  // per position, priced the same at 30k entries as at 22). The vocab
  // fit is one aggregation, trained ONCE per dataset and cached
  // (trainedSubwordVocab — the frozen-model/index-cache pattern; the
  // 1000-row read-back is control-plane, the KMeans-centroid
  // precedent); tokenization is per-row, zero shuffle.
  // The oracle re-derives the identical vocab in SQL and replays the
  // greedy chain with the q107 recursive-CTE walk, so hash-equality
  // proves training cut + greedy choices position for position. 1471
  // distinct grams exist at the gate SF — the 1000 cut genuinely
  // excludes tail grams.
  // ---------------------------------------------------------------------
  /** The trained subword vocab, fitted ONCE per dataset and cached
    * (the citation-edges / frozen-model pattern — a real pipeline
    * trains its tokenizer once and encodes forever): top-1000 char
    * n-grams by (count desc, gram asc). Gram generation is a flat
    * two-explode pipeline (positions, then the 3 lengths) — narrow
    * rows through codegen, no per-row array-of-arrays allocation. */
  private def trainedSubwordVocab(s: SparkSession, d: String): Seq[String] = {
    val dir = cachedIndexDir("subword-vocab", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val pos = documents(s, d)
        .select(col("text"),
          explode(sequence(lit(1), length(col("text")))).as("i"))
      val grams = pos.select(explode(array((2 to 4).map(l =>
          when(col("i") + lit(l - 1) <= length(col("text")),
            col("text").substr(col("i"), lit(l)))): _*)).as("gram"))
        .filter(col("gram").isNotNull)
      grams.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("gram").asc).limit(1000)
        .select(col("gram"), col("cnt"))
        .coalesce(1).write.mode("overwrite").parquet(s"$p/vocab")
    }
    s.read.parquet(s"$dir/vocab")
      .orderBy(col("cnt").desc, col("gram").asc)
      .select(col("gram")).collect().map(_.getString(0)).toSeq
  }

  def q111SubwordTrained(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val vocab = trainedSubwordVocab(s, d)
    docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        TextAnalysis.subwordCount(col("text"), vocab).cast("long")
          .as("sw_tokens"))
      .withColumn("ratio_q",
        when(col("n_chars") > 0,
          floor(col("sw_tokens").cast("double") * lit(1000000.0)
            / col("n_chars").cast("double")).cast("long")).otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }
  val q111Sql: String =
    """WITH RECURSIVE grams AS MATERIALIZED (
      |  SELECT substr(text, i::INT, l::INT) AS gram
      |  FROM documents,
      |    LATERAL (SELECT unnest(range(1, len(text) + 1)) AS i) p,
      |    LATERAL (SELECT unnest([2, 3, 4]) AS l) q
      |  WHERE i + l - 1 <= len(text)),
      |vocab AS MATERIALIZED (SELECT gram FROM (
      |  SELECT gram, count(*) AS cnt FROM grams GROUP BY gram
      |  ORDER BY cnt DESC, gram ASC LIMIT 1000)),
      |posg AS MATERIALIZED (
      |  SELECT d.doc_id, p.i AS pos, len(d.text) AS tlen,
      |    substr(d.text, p.i::INT, 4) AS s4,
      |    substr(d.text, p.i::INT, 3) AS s3,
      |    substr(d.text, p.i::INT, 2) AS s2
      |  FROM documents d,
      |    LATERAL (SELECT unnest(range(1, len(d.text) + 1)) AS i) p),
      |jumps AS MATERIALIZED (
      |  SELECT g.doc_id, g.pos,
      |    CASE WHEN g.pos + 3 <= g.tlen AND v4.gram IS NOT NULL THEN 4
      |         WHEN g.pos + 2 <= g.tlen AND v3.gram IS NOT NULL THEN 3
      |         WHEN g.pos + 1 <= g.tlen AND v2.gram IS NOT NULL THEN 2
      |         ELSE 1 END AS jump
      |  FROM posg g
      |  LEFT JOIN vocab v4 ON g.s4 = v4.gram
      |  LEFT JOIN vocab v3 ON g.s3 = v3.gram
      |  LEFT JOIN vocab v2 ON g.s2 = v2.gram),
      |walk AS (
      |  SELECT doc_id, 1 AS pos, 0 AS n FROM documents
      |  UNION ALL
      |  SELECT w.doc_id, w.pos + j.jump, w.n + 1
      |  FROM walk w JOIN jumps j ON j.doc_id = w.doc_id AND j.pos = w.pos),
      |sw AS (
      |  SELECT w.doc_id, w.n AS sw_tokens FROM walk w
      |  JOIN documents d ON w.doc_id = d.doc_id WHERE w.pos > len(d.text))
      |SELECT d.doc_id, len(d.text)::BIGINT AS n_chars,
      |  sw.sw_tokens::BIGINT AS sw_tokens,
      |  CASE WHEN len(d.text) > 0 THEN CAST(floor(
      |    (sw.sw_tokens::DOUBLE * 1000000.0) / len(d.text)::DOUBLE) AS BIGINT)
      |    ELSE 0 END AS ratio_q
      |FROM documents d JOIN sw ON d.doc_id = sw.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Shared oracle fragment: the content-derived citation derivation
    * (tok → tg → rare → post) every citation-graph oracle replays —
    * ONE definition to keep in sync with `Graph.citationEdges`
    * (n = 3, df ∈ [2, 4]); was inlined 9× before round 12's dedup.
    *
    * Every CTE here and in the multi-round consumers is
    * `AS MATERIALIZED`: DuckDB 1.0 inlines each CTE REFERENCE, so a
    * 3-round recurrence that mentions `l(t-1)` four times re-derives
    * the whole shingle index 4^3 times — q135 measured 188.7 s at
    * 500 docs and blew the round-13 driver gate to an empty
    * CORRECTNESS file; materialized, the same oracle is 0.1 s.
    * `tools/oracle_budget.py` now gates every oracle's DuckDB cost. */
  private def citationPostCtesOver(docPred: String, pfx: String = "",
      table: String = "documents"): String =
    s"""${pfx}tok AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM $table
       |  WHERE len(string_split(text, ' ')) >= 3 AND ($docPred)),
       |${pfx}tg AS MATERIALIZED (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS term
       |  FROM ${pfx}tok, LATERAL (SELECT unnest(range(1, len(w)-1)) AS i) t),
       |${pfx}rare AS MATERIALIZED (SELECT term FROM (
       |  SELECT term, count(*) AS df FROM ${pfx}tg GROUP BY term)
       |  WHERE df BETWEEN 2 AND 4),
       |${pfx}post AS MATERIALIZED (SELECT t.doc_id, t.term FROM ${pfx}tg t
       |  JOIN ${pfx}rare USING(term))"""
      .stripMargin

  private val citationPostCtes: String = citationPostCtesOver("TRUE")

  /** The unweighted distinct edge step on top of [[citationPostCtes]]. */
  private val citationDedgesCte: String =
    """dedges AS MATERIALIZED (
      |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      |  FROM post a JOIN post b
      |    ON a.term = b.term AND a.doc_id > b.doc_id)""".stripMargin

  // ---------------------------------------------------------------------
  // q112 — corpus-native directed PageRank (round-11 verdict stretch
  // item): the citation graph is DERIVED FROM DOCUMENT CONTENT
  // (Graph.citationEdges — docs sharing a rare trigram, newer cites
  // older) instead of the TPC-H co-purchase proxy, then ranked with
  // the dangling-corrected directed recurrence (q108's machinery).
  // Low-id docs are structural sinks — doc 0 can never be a src — so
  // the dangling-mass term is live on every round; the oracle replays
  // edge derivation AND the 3-round recurrence including the per-round
  // dangling scalar. Scale: posting df-cap bounds the self-join (see
  // citationEdges scaladoc); everything after edges is q108's shape.
  // ---------------------------------------------------------------------
  /** The content-derived citation edge table, materialized once per
    * dataset (the purchaseEdgesCached pattern): the shingle-index
    * derivation would otherwise re-run for every consumer — q112's
    * round-iterated recurrence (degrees, node set, each round's
    * contribution join), q115's community resolution, q118's triangle
    * closure, and q120's weighted recurrence. Stored WEIGHTED ("v2" —
    * shared-rare-term multiplicity rides along); unweighted consumers
    * project it away, so one table serves both graph semantics. */
  private def citationEdgesCached(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("citation-edges", d, "v2",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.Graph.citationEdgesWeighted(documents(s, d), n = 3,
        dfMin = 2, dfMax = 4)
        .repartition(col("src"))
        .write.mode("overwrite").parquet(s"$p/edges")
    }
    s.read.parquet(s"$dir/edges")
  }

  def q112CitationPagerank(s: SparkSession, d: String): DataFrame = {
    val e = citationEdgesCached(s, d).select(col("src"), col("dst"))
    val pr = graft.scale.Graph.pageRankDirectedQ(e, iterations = 3)
    val top = pr.orderBy(col("pr_q").desc, col("node").asc).limit(100)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pr_q").desc, col("node").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("node"), col("outdeg"), col("pr_q"))
      .orderBy(col("rank"))
  }
  val q112Sql: String = {
    val rounds = directedPrRoundsSql(3)
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |outd AS (SELECT src AS node, count(*) AS outdeg FROM dedges
       |  GROUP BY src),
       |dn AS (
       |  SELECT nd.node, coalesce(o.outdeg, 0) AS outdeg
       |  FROM (SELECT src AS node FROM dedges
       |        UNION SELECT dst AS node FROM dedges) nd
       |  LEFT JOIN outd o ON nd.node = o.node),
       |n AS (SELECT count(*) AS n FROM dn),
       |r0 AS (SELECT node, outdeg, 1000000000000 // n.n AS r FROM dn, n),
       |$rounds
       |SELECT row_number() OVER (ORDER BY r DESC, node ASC) AS rank,
       |  node, outdeg, r AS pr_q
       |FROM r3 ORDER BY rank LIMIT 100""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q113 — INCREMENTAL dedup against the materialized LSH signature
  // index (scale/LshIndex): the corpus (doc_id < 400) is shingled,
  // minhashed, and banded ONCE into a persisted layout; the "new
  // crawl" batch (doc_id >= 400) probes it — batch-side signatures are
  // computed O(batch), the batch's ≤64 distinct band buckets become a
  // partition filter on the stored band dirs, and verification joins
  // only the candidates' stored signatures. This is the dedup question
  // a production pipeline actually asks per ingest ("which of today's
  // docs already exist in my 100 TB corpus") with ZERO corpus-side
  // recompute. Same portable md5 hash family as q71, so the oracle
  // replays signatures, banding, candidates, and verification
  // bit-for-bit, restricted to cross (corpus × batch) pairs.
  // ---------------------------------------------------------------------
  def q113LshIncremental(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = cachedIndexDir("lsh-index", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.LshIndex.build(docs.filter(col("doc_id") < 400), p)
    }
    graft.scale.LshIndex
      .dedupBatch(s, dir, docs.filter(col("doc_id") >= 400), minMatches = 8)
      .orderBy(col("new_doc"), col("corpus_doc"))
  }
  /** The full q113 LSH probe replay (signatures, banding, cross
    * candidates, verification) over a parameterized corpus-text
    * expression — q113 reads `text` as stored; q156's upsert oracle
    * substitutes the revised text for the revised slice, proving
    * `upsert ≡ built-from-revised-texts` by hash equality. */
  private def lshProbeSqlOver(textExpr: String): String =
    s"""WITH tok AS (
      |  SELECT doc_id, string_split($textExpr, ' ') AS w FROM documents
      |  WHERE len(string_split($textExpr, ' ')) >= 5),
      |sh AS (SELECT DISTINCT doc_id, sh FROM (
      |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) t)),
      |h0 AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
      |  FROM sh),
      |hx AS (
      |  SELECT doc_id, i,
      |    min(((1000003 * (i + 1)) * (h >> 30) +
      |         (999983 * (i + 1) + 12345) * (h & 1073741823) + i)
      |        % 2305843009213693951) AS mh
      |  FROM h0, LATERAL (SELECT unnest(range(0, 16)) AS i) r
      |  GROUP BY doc_id, i),
      |bk AS (
      |  SELECT doc_id, CAST(i // 4 AS INT) AS band,
      |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bk
      |  FROM hx GROUP BY doc_id, i // 4),
      |cand AS (
      |  SELECT DISTINCT b.doc_id AS new_doc, a.doc_id AS corpus_doc
      |  FROM bk a JOIN bk b
      |    ON a.band = b.band AND a.bk = b.bk
      |   AND a.doc_id < 400 AND b.doc_id >= 400),
      |m AS (
      |  SELECT c.new_doc, c.corpus_doc,
      |    CAST(sum(CASE WHEN ha.mh = hb.mh THEN 1 ELSE 0 END) AS BIGINT)
      |      AS matches
      |  FROM cand c
      |  JOIN hx ha ON ha.doc_id = c.corpus_doc
      |  JOIN hx hb ON hb.doc_id = c.new_doc AND hb.i = ha.i
      |  GROUP BY 1, 2)
      |SELECT new_doc, corpus_doc, matches FROM m WHERE matches >= 8
      |ORDER BY new_doc, corpus_doc""".stripMargin

  val q113Sql: String = lshProbeSqlOver("text")

  // ---------------------------------------------------------------------
  // q114 — fixed-memory quantile sketch (scale/Sketch.histQuantiles):
  // the third sketch pillar next to frequency (q101/q109 Count-Min)
  // and distinct (q65 HLL++). q54's exact percentiles shuffle every
  // (lang, n_chars) pair and sort per group; at 100 TB the
  // length-distribution sweep runs on this instead — per-group state
  // is ≤64 histogram cells whatever the corpus size, map-side
  // combined, shard histograms merge by cell-wise add, and the
  // quantile pick walks the HISTOGRAM (≤64 rows/group), never the
  // data. All-integer algebra, so the oracle replays binning, cumsum,
  // and rank pick bit for bit; SketchSpec pins the one-bin error
  // bound against q54's exact values and partitioning-invariance.
  // ---------------------------------------------------------------------
  def q114HistQuantiles(s: SparkSession, d: String): DataFrame =
    graft.scale.Sketch
      .histQuantiles(documents(s, d), "lang", "n_chars")
      .withColumnRenamed("g", "lang")
      .orderBy(col("lang"), col("pq"))
  val q114Sql: String =
    """WITH ext AS (
      |  SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
      |bins AS (
      |  SELECT lang,
      |    least(CAST(((n_chars - ext.lo) * 64) // (ext.hi - ext.lo + 1)
      |      AS BIGINT), 63) AS bin, count(*) AS cnt
      |  FROM documents, ext GROUP BY 1, 2),
      |tot AS (SELECT lang, sum(cnt) AS n FROM bins GROUP BY lang),
      |cum AS (
      |  SELECT b.lang, b.bin, b.cnt,
      |    sum(b.cnt) OVER (PARTITION BY b.lang ORDER BY b.bin) AS cs
      |  FROM bins b),
      |qs AS (SELECT unnest([25, 50, 75, 95]) AS pq),
      |pick AS (
      |  SELECT c.lang, q.pq, min(c.bin) AS qbin
      |  FROM cum c JOIN tot t ON c.lang = t.lang, qs q
      |  WHERE c.cs * 100 >= q.pq * t.n
      |  GROUP BY 1, 2)
      |SELECT p.lang, p.pq, p.qbin,
      |  ext.lo + (p.qbin * (ext.hi - ext.lo + 1)) // 64 AS est
      |FROM pick p, ext ORDER BY lang, pq""".stripMargin

  // ---------------------------------------------------------------------
  // q115 — citation communities: connected components over the SAME
  // cached content-derived edge table q112 ranks (derive-once/
  // query-many), labeling each linked document with its component's
  // min id + component size — the "template family" sweep a dedup
  // pipeline runs on link structure (docs chained by shared rare
  // phrasing dedup as a family even when pairwise similarity is below
  // the LSH cut). Resolution is Dedup.connectedComponents: the hybrid
  // pointer-jumping/union-find resolver (distributed path
  // spec-exercised; at this edge count the bounded driver fast path) —
  // the oracle replays min-label reachability as a recursive CTE.
  // ---------------------------------------------------------------------
  def q115CitationCommunities(s: SparkSession, d: String): DataFrame = {
    val pairs = citationEdgesCached(s, d)
      .select(col("src").as("d1"), col("dst").as("d2"))
    val lab = Dedup.connectedComponents(pairs)
      .select(col("doc_id"), col("cluster").as("community"))
    val sizes = lab.groupBy(col("community"))
      .agg(count(lit(1)).as("csize"))
    lab.join(sizes, "community")
      .select(col("doc_id"), col("community"), col("csize"))
      .orderBy(col("doc_id"))
  }
  val q115Sql: String =
    s"""WITH RECURSIVE $citationPostCtes,
      |$citationDedgesCte,
      |sym AS (SELECT src AS a, dst AS b FROM dedges
      |  UNION SELECT dst, src FROM dedges),
      |reach AS (
      |  SELECT a AS v, a AS r FROM sym
      |  UNION
      |  SELECT s.a, t.r FROM sym s JOIN reach t ON s.b = t.v),
      |lab AS (SELECT v AS doc_id, min(r) AS community FROM reach GROUP BY v),
      |sizes AS (SELECT community, count(*) AS csize FROM lab GROUP BY 1)
      |SELECT l.doc_id, l.community, s.csize
      |FROM lab l JOIN sizes s USING (community)
      |ORDER BY l.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q116 — corpus version diff: the ingest-delta sweep run between two
  // corpus snapshots ("what did today's crawl add or change") without
  // ever comparing text to text — a full-outer join on doc_id with
  // 60-bit content-hash comparison, so the shuffle carries (id, hash)
  // pairs and the verdict is hash equality, never byte equality over
  // documents. The "old" snapshot is derived in-query by a known rule
  // (docs with id % 7 == 0 absent — "new since yesterday"; id % 11
  // == 0 truncated to half length — "edited"), so the oracle states
  // every verdict analytically while Spark must reproduce it through
  // the real join + hash compare.
  // ---------------------------------------------------------------------
  def q116CorpusDiff(s: SparkSession, d: String): DataFrame = {
    val h = graft.functions.Md5_64.md5_64 _
    val newSnap = documents(s, d)
      .select(col("doc_id"), h(col("text")).as("h_new"))
    val oldSnap = documents(s, d)
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        h(when(col("doc_id") % 11 === 0,
            expr("substring(text, 1, cast(n_chars div 2 as int))"))
          .otherwise(col("text"))).as("h_old"))
    newSnap.join(oldSnap, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_new") =!= col("h_old"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))
  }
  val q116Sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 0 THEN 'added' ELSE 'changed' END AS status
      |FROM documents
      |WHERE doc_id % 7 = 0
      |   OR (doc_id % 11 = 0 AND
      |       md5(substr(text, 1, CAST(n_chars // 2 AS INT))) <> md5(text))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q117 — shard integrity checksums: the manifest a shard export
  // (q89's layout) ships with — per shard, row count and an
  // ORDER-INDEPENDENT content checksum (bit_xor of the 60-bit content
  // hashes), so a re-export on any partitioning, any engine, any row
  // order produces the same manifest, and a single flipped/missing
  // document flips the checksum. XOR-fold beats a sum (no overflow
  // games) and beats a concat-hash (no order dependence); verification
  // cost is one scan + a 16-byte-row shuffle to S cells.
  // ---------------------------------------------------------------------
  def q117ShardChecksums(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(graft.functions.Md5_64.md5_64(col("text")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(8L)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("checksum"))
      .orderBy(col("shard"))
  val q117Sql: String =
    """WITH h AS (
      |  SELECT CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
      |  FROM documents)
      |SELECT h % 8 AS shard, count(*) AS n_rows, bit_xor(h) AS checksum
      |FROM h GROUP BY 1 ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------------
  // q118 — triangle counting over the cached citation graph
  // (Graph.triangleCounts): the clustering-structure profile
  // (communities vs star hubs) completing the graph family's
  // structural sweep (q95 degrees → q115 components → q118 closure).
  // Degree-ordered orientation is the scale discipline: each triangle
  // counted once at its lowest-(degree, id) corner, wedge generation
  // O(E^1.5) total regardless of hub skew — a star's center is
  // rank-max and generates zero wedges. The oracle replays edge
  // derivation, orientation, wedge join, and closure with the
  // identical (degree, id) tuple comparisons.
  // ---------------------------------------------------------------------
  def q118Triangles(s: SparkSession, d: String): DataFrame = {
    val tri = graft.scale.Graph.triangleCounts(citationEdgesCached(s, d))
    val top = tri.orderBy(col("tri_cnt").desc, col("node").asc).limit(100)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tri_cnt").desc, col("node").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("node"), col("tri_cnt"))
      .orderBy(col("rank"))
  }
  val q118Sql: String =
    s"""WITH $citationPostCtes,
      |$citationDedgesCte,
      |und AS (SELECT src AS u, dst AS v FROM dedges
      |  UNION ALL SELECT dst, src FROM dedges),
      |deg AS (SELECT u AS node, count(*) AS dg FROM und GROUP BY u),
      |g AS (
      |  SELECT un.u AS a, un.v AS b, d2.dg AS db
      |  FROM und un JOIN deg d1 ON un.u = d1.node
      |    JOIN deg d2 ON un.v = d2.node
      |  WHERE d1.dg < d2.dg OR (d1.dg = d2.dg AND un.u < un.v)),
      |tri AS (
      |  SELECT x.a AS ta, x.b AS tb, y.b AS tc
      |  FROM g x JOIN g y ON x.a = y.a AND (x.db, x.b) < (y.db, y.b)
      |  JOIN g z ON z.a = x.b AND z.b = y.b),
      |pern AS (
      |  SELECT node, count(*) AS tri_cnt FROM (
      |    SELECT ta AS node FROM tri
      |    UNION ALL SELECT tb FROM tri
      |    UNION ALL SELECT tc FROM tri)
      |  GROUP BY node)
      |SELECT row_number() OVER (ORDER BY tri_cnt DESC, node ASC) AS rank,
      |  node, tri_cnt
      |FROM pern ORDER BY rank LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // q119 — n-gram CONTAINMENT pairs (Dedup.ngramContainmentPairs): the
  // asymmetric complement to q31's Jaccard — containment = common /
  // min(n1, n2), so a short document wholly quoted inside a longer one
  // scores 1.0 where Jaccard stays low: excerpt/quotation detection,
  // the dedup-policy direction symmetric near-dup misses. Identical
  // inverted-index plan to q31 (one postings shuffle, df cut); only
  // the final per-pair metric differs.
  // ---------------------------------------------------------------------
  def q119Containment(s: SparkSession, d: String): DataFrame =
    Dedup.ngramContainmentPairs(documents(s, d), n = 5, threshold = 0.9)
      .select(col("contained"), col("container"), col("common"),
        col("n_contained"), col("n_container"),
        q(col("containment"), 1e6).as("containment_q"))
      .orderBy(col("contained"), col("container"))
  val q119Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |sh0 AS (SELECT DISTINCT doc_id, sh FROM (
      |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) t)),
      |tot AS (SELECT count(*) AS n_docs FROM documents),
      |sh AS (
      |  SELECT s.doc_id, s.sh FROM sh0 s
      |  JOIN (SELECT sh, count(*) AS df FROM sh0 GROUP BY sh) d ON s.sh = d.sh, tot
      |  WHERE d.df <= greatest(100, CAST(ceil(tot.n_docs * 0.01) AS BIGINT))),
      |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT
      |    CASE WHEN ca.n_sh < cb.n_sh
      |      OR (ca.n_sh = cb.n_sh AND p.d1 < p.d2)
      |      THEN p.d1 ELSE p.d2 END AS contained,
      |    CASE WHEN ca.n_sh < cb.n_sh
      |      OR (ca.n_sh = cb.n_sh AND p.d1 < p.d2)
      |      THEN p.d2 ELSE p.d1 END AS container,
      |    p.common, least(ca.n_sh, cb.n_sh) AS n_contained,
      |    greatest(ca.n_sh, cb.n_sh) AS n_container,
      |    p.common::DOUBLE / least(ca.n_sh, cb.n_sh)::DOUBLE AS c
      |  FROM pairs p
      |  JOIN cnt ca ON p.d1 = ca.doc_id
      |  JOIN cnt cb ON p.d2 = cb.doc_id)
      |SELECT contained, container, common, n_contained, n_container,
      |  CAST(floor(c * 1000000.0) AS BIGINT) AS containment_q
      |FROM m WHERE c >= 0.9
      |ORDER BY contained, container""".stripMargin

  // ---------------------------------------------------------------------
  // q120 — WEIGHTED directed PageRank (Graph.pageRankWeightedQ) over
  // the same cached citation table: rank mass splits proportionally to
  // link multiplicity (w = shared rare trigrams per pair) instead of
  // uniformly — a doc cited through 12 shared phrasings draws 12× the
  // mass of a single-phrase link. Same dangling-corrected integer
  // recurrence as q112 with per-EDGE floors ((r·w) div sw), which the
  // oracle replays sum-for-sum; contrast with q112's uniform split is
  // the point of keeping both in the catalogue.
  // ---------------------------------------------------------------------
  def q120WeightedPagerank(s: SparkSession, d: String): DataFrame = {
    val e = citationEdgesCached(s, d)
    val pr = graft.scale.Graph.pageRankWeightedQ(e, iterations = 3)
    val top = pr.orderBy(col("pr_q").desc, col("node").asc).limit(100)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pr_q").desc, col("node").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("node"), col("sw"), col("pr_q"))
      .orderBy(col("rank"))
  }
  val q120Sql: String = {
    val rounds = (1 to 3).map { i =>
      s"""s$i AS (SELECT e.dst AS node, sum((r.r * e.w) // r.sw) AS s
         |  FROM wedges e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst),
         |d$i AS (SELECT coalesce(sum(r), 0) AS dm FROM r${i - 1}
         |  WHERE sw = 0),
         |r$i AS (SELECT dg.node, dg.sw, CAST(
         |    (150000000000 // n.n) +
         |    (85 * (coalesce(s$i.s, 0) + (d$i.dm // n.n))) // 100
         |    AS BIGINT) AS r
         |  FROM dn dg LEFT JOIN s$i ON dg.node = s$i.node, n, d$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $citationPostCtes,
       |wedges AS (
       |  SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS w
       |  FROM post a JOIN post b
       |    ON a.term = b.term AND a.doc_id > b.doc_id
       |  GROUP BY 1, 2),
       |outw AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS sw
       |  FROM wedges GROUP BY src),
       |dn AS (
       |  SELECT nd.node, coalesce(o.sw, 0) AS sw
       |  FROM (SELECT src AS node FROM wedges
       |        UNION SELECT dst AS node FROM wedges) nd
       |  LEFT JOIN outw o ON nd.node = o.node),
       |n AS (SELECT count(*) AS n FROM dn),
       |r0 AS (SELECT node, sw, 1000000000000 // n.n AS r FROM dn, n),
       |$rounds
       |SELECT row_number() OVER (ORDER BY r DESC, node ASC) AS rank,
       |  node, sw, r AS pr_q
       |FROM r3 ORDER BY rank LIMIT 100""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q121 — HITS hubs & authorities (Graph.hitsQ) over the cached
  // citation graph: the complementary ranking to q112's PageRank —
  // authorities are cited by good hubs, hubs cite good authorities —
  // and on THIS graph the two roles are structurally forced apart
  // (low-id docs can only be cited → pure authorities; high-id docs
  // mostly cite → hubs), so the two score columns genuinely diverge.
  // Integer recurrence with per-half-round max normalization as an
  // in-plan broadcast scalar; the oracle unrolls both half-rounds of
  // both iterations max-for-max.
  // ---------------------------------------------------------------------
  def q121Hits(s: SparkSession, d: String): DataFrame = {
    val e = citationEdgesCached(s, d).select(col("src"), col("dst"))
    val hits = graft.scale.Graph.hitsQ(e, iterations = 2)
    val top = hits.orderBy(col("auth_q").desc, col("node").asc).limit(100)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("auth_q").desc, col("node").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("node"), col("auth_q"), col("hub_q"))
      .orderBy(col("rank"))
  }
  val q121Sql: String = {
    val rounds = (1 to 2).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.dst AS node, CAST(sum(r.h) AS BIGINT) AS ar
         |  FROM dedges e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst),
         |am$i AS (SELECT max(ar) AS am FROM ar$i),
         |a$i AS MATERIALIZED (SELECT r.node,
         |    CAST((coalesce(s.ar, 0) * 1000000) // m.am AS BIGINT) AS a, r.h
         |  FROM r${i - 1} r LEFT JOIN ar$i s ON r.node = s.node, am$i m),
         |hr$i AS MATERIALIZED (SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS hr
         |  FROM dedges e JOIN a$i a ON e.dst = a.node GROUP BY e.src),
         |hm$i AS (SELECT max(hr) AS hm FROM hr$i),
         |r$i AS MATERIALIZED (SELECT a.node, a.a,
         |    CAST((coalesce(s.hr, 0) * 1000000) // m.hm AS BIGINT) AS h
         |  FROM a$i a LEFT JOIN hr$i s ON a.node = s.node, hm$i m)""".stripMargin
    }.mkString(",\n")
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |dn AS MATERIALIZED (SELECT src AS node FROM dedges
       |  UNION SELECT dst AS node FROM dedges),
       |r0 AS MATERIALIZED (SELECT node, 1000000 AS a, 1000000 AS h FROM dn),
       |$rounds
       |SELECT row_number() OVER (ORDER BY a DESC, node ASC) AS rank,
       |  node, a AS auth_q, h AS hub_q
       |FROM r2 ORDER BY rank LIMIT 100""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q122 — k-core extraction (Graph.kCoreQ) over the cached citation
  // graph: 6 peeling rounds at k=25 — the densest-region cut run
  // before expensive per-community work (the gate corpus converges in
  // 4 rounds, so the 6-round output IS the exact 25-core; GraphSpec
  // pins the fixpoint). The oracle replays all 6 rounds of
  // degree-recompute + threshold drop on the shrinking subgraph.
  // ---------------------------------------------------------------------
  def q122KCore(s: SparkSession, d: String): DataFrame = {
    val e = citationEdgesCached(s, d).select(col("src"), col("dst"))
    graft.scale.Graph.kCoreQ(e, k = 25L, rounds = 6)
      .orderBy(col("node"))
  }
  val q122Sql: String = {
    val rounds = (1 to 6).map { i =>
      s"""a$i AS (
         |  SELECT e.u AS node, count(*) AS core_deg
         |  FROM und e
         |  JOIN a${i - 1} x ON e.u = x.node
         |  JOIN a${i - 1} y ON e.v = y.node
         |  GROUP BY e.u HAVING count(*) >= 25)""".stripMargin
    }.mkString(",\n")
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |und AS (SELECT src AS u, dst AS v FROM dedges
       |  UNION ALL SELECT dst, src FROM dedges),
       |a0 AS (SELECT DISTINCT u AS node FROM und),
       |$rounds
       |SELECT node, core_deg FROM a6 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q123 — multi-source BFS distance (Graph.bfsDistancesQ) over the
  // symmetrized cached citation graph: exact hop distance from a seed
  // set (doc_id % 10 == 0), bounded at 4 hops — the seed-proximity
  // feature quality-propagation pipelines consume ("how many hops from
  // a trusted doc"), and the reachability primitive the rank family
  // (q112/q120/q121) doesn't give. Frontier discipline is the scale
  // property: each round joins only the NEWLY settled frontier against
  // the pinned edge exchange, never the full settled set. The oracle
  // replays it as a depth-bounded recursive CTE + min-distance rollup.
  // Isolated seeds (docs off the citation graph) settle at distance 0
  // and propagate nothing — both engines state them identically.
  // ---------------------------------------------------------------------
  def q123BfsDistances(s: SparkSession, d: String): DataFrame = {
    val e = citationEdgesCached(s, d)
    val sym = e.select(col("src"), col("dst"))
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = documents(s, d).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("node"))
    graft.scale.Graph.bfsDistancesQ(sym, seeds, rounds = 4)
      .orderBy(col("node"))
  }
  val q123Sql: String =
    s"""WITH RECURSIVE $citationPostCtes,
      |$citationDedgesCte,
      |sym AS (SELECT src AS a, dst AS b FROM dedges
      |  UNION SELECT dst, src FROM dedges),
      |reach AS (
      |  SELECT doc_id AS v, 0 AS dist FROM documents WHERE doc_id % 10 = 0
      |  UNION
      |  SELECT s.b, r.dist + 1 FROM sym s JOIN reach r ON s.a = r.v
      |  WHERE r.dist < 4)
      |SELECT v AS node, CAST(min(dist) AS BIGINT) AS dist
      |FROM reach GROUP BY v ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q124 — exact-cut sequence packing (scale/Packing.packStats): the
  // concat-then-chunk layout pretraining actually uses — within each
  // shard (doc_id % 8) documents lie end-to-end and the token stream is
  // cut every 512 tokens, a document crossing a cut contributing a SPAN
  // to each bin it touches. The complement to q59, which bins whole
  // documents by start offset (bins overflow); here every bin holds
  // exactly 512 tokens except the shard tail — the invariant a training
  // loader relies on (PackingSpec pins it). One per-shard window cumsum
  // + a bounded explode; all-integer span algebra the oracle replays.
  // ---------------------------------------------------------------------
  def q124SeqPacking(s: SparkSession, d: String): DataFrame =
    graft.scale.Packing.packStats(documents(s, d),
        col("doc_id") % 8, seqLen = 512L)
      .orderBy(col("shard"), col("bin"))
  val q124Sql: String =
    """WITH t AS (
      |  SELECT doc_id, doc_id % 8 AS shard,
      |    len(string_split(text, ' '))::BIGINT AS tk
      |  FROM documents),
      |c AS (
      |  SELECT shard, doc_id, tk,
      |    CAST(sum(tk) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tk
      |      AS BIGINT) AS cstart
      |  FROM t),
      |b AS (
      |  SELECT shard, doc_id, cstart, tk,
      |    unnest(range(cstart // 512, (cstart + tk - 1) // 512 + 1)) AS bin
      |  FROM c)
      |SELECT shard, bin, count(*) AS n_docs,
      |  CAST(sum(least((bin + 1) * 512, cstart + tk)
      |    - greatest(bin * 512, cstart)) AS BIGINT) AS n_tokens
      |FROM b GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin

  // ---------------------------------------------------------------------
  // q125 — collocation mining (scale/Colloc.bigramLift): top adjacent
  // bigrams by integer LIFT (c12·N·10^6) div (c1·c2) — floor-quantized
  // PMI ordering, the multiword-unit sweep run before tokenizer
  // training or phrase-aware indexing. Contrast within the catalogue:
  // q50 counts bigrams, q74 scores DOCUMENTS with bigram conditionals;
  // this ranks the PHRASES themselves by association strength. One
  // map-combinable bigram shuffle + vocabulary-sized unigram joins +
  // an in-plan N scalar; the oracle replays counts, joins, and the
  // integer division bit for bit.
  // ---------------------------------------------------------------------
  def q125Collocations(s: SparkSession, d: String): DataFrame = {
    val lift = graft.scale.Colloc.bigramLift(documents(s, d), minCount = 3L)
    val top = lift.orderBy(col("lift_q").desc, col("w1").asc, col("w2").asc)
      .limit(100)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift_q").desc, col("w1").asc, col("w2").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("w1"), col("w2"), col("c12"), col("c1"),
        col("c2"), col("lift_q"))
      .orderBy(col("rank"))
  }
  val q125Sql: String =
    """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
      |uni AS (SELECT unnest(w) AS term FROM w),
      |ucnt AS (SELECT term, count(*) AS c FROM uni GROUP BY term),
      |n AS (SELECT count(*) AS n FROM uni),
      |bi AS (
      |  SELECT w[i] AS w1, w[i + 1] AS w2
      |  FROM w, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
      |  WHERE len(w) >= 2),
      |bcnt AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
      |lift AS (
      |  SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
      |    (b.c12 * n.n * 1000000) // (u1.c * u2.c) AS lift_q
      |  FROM bcnt b
      |  JOIN ucnt u1 ON b.w1 = u1.term
      |  JOIN ucnt u2 ON b.w2 = u2.term, n
      |  WHERE b.c12 >= 3)
      |SELECT row_number() OVER (ORDER BY lift_q DESC, w1 ASC, w2 ASC)
      |    AS rank, w1, w2, c12, c1, c2, lift_q
      |FROM lift ORDER BY rank LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // q126 — sqrt-temperature corpus mixing (scale/Mixture.sample): the
  // rebalancing step q58/q79 DON'T do — those apply GIVEN mixture
  // weights; this DERIVES them from the data (quota_s = isq_s·k div
  // Σ isq, isq = floor(sqrt(n_s)) — α=0.5 temperature, the standard
  // "don't let the biggest source drown the curated ones" move) and
  // draws each source's quota in content-hash order. floor(sqrt(n)) is
  // IEEE-exact below 2^52, so the whole quota algebra is
  // engine-portable integer arithmetic; candidate ranking keeps the
  // constant bound rk ≤ k pushed as WindowGroupLimit.
  // ---------------------------------------------------------------------
  def q126TempMixture(s: SparkSession, d: String): DataFrame =
    graft.scale.Mixture.sample(documents(s, d), "source", k = 100L)
      .orderBy(col("source"), col("rk"))
  val q126Sql: String =
    """WITH cnt AS (SELECT source, count(*) AS n FROM documents
      |  GROUP BY source),
      |q0 AS (SELECT source, n,
      |  CAST(floor(sqrt(n::DOUBLE)) AS BIGINT) AS isq FROM cnt),
      |t AS (SELECT CAST(sum(isq) AS BIGINT) AS t FROM q0),
      |qt AS (SELECT source, n, isq, (isq * 100) // t.t AS quota
      |  FROM q0, t),
      |h AS (SELECT source, doc_id,
      |  CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
      |    AS BIGINT) AS h
      |  FROM documents),
      |r AS (SELECT source, doc_id, h,
      |  row_number() OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC)
      |    AS rk
      |  FROM h)
      |SELECT r.source, qt.n, qt.quota, r.rk, r.doc_id
      |FROM r JOIN qt USING (source) WHERE r.rk <= qt.quota
      |ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------------
  // q127 — anchor-term profiles (Graph.anchorTerms): for every CITED
  // document, the top-3 rare terms its citers reached it through, with
  // citer counts — the link-graph analog of web anchor-text
  // aggregation ("what do documents that link here say about this
  // page"), the retrieval-enrichment signal the reference's wiki link
  // graph implies. Same df-capped derivation as the citation edges but
  // keeping the TERM; materialized once per dataset (the
  // citationEdgesCached pattern — bench reps and the catalogue share
  // one build). Top-3 per dst is the q68 window head-N shape with the
  // constant rank bound pushed as WindowGroupLimit.
  // ---------------------------------------------------------------------
  def q127AnchorTerms(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("citation-anchors", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.Graph.anchorTerms(documents(s, d), n = 3,
          dfMin = 2, dfMax = 4)
        .repartition(col("dst"))
        .write.mode("overwrite").parquet(s"$p/anchors")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst")).orderBy(col("n_src").desc, col("term").asc)
    s.read.parquet(s"$dir/anchors")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("dst"), col("rk"), col("term"), col("n_src"))
      .orderBy(col("dst"), col("rk"))
  }
  val q127Sql: String =
    s"""WITH $citationPostCtes,
      |an AS (
      |  SELECT b.doc_id AS dst, a.term, count(*) AS n_src
      |  FROM post a JOIN post b
      |    ON a.term = b.term AND a.doc_id > b.doc_id
      |  GROUP BY 1, 2),
      |r AS (SELECT dst, term, n_src,
      |  row_number() OVER (PARTITION BY dst
      |    ORDER BY n_src DESC, term ASC) AS rk
      |  FROM an)
      |SELECT dst, rk, term, n_src FROM r WHERE rk <= 3
      |ORDER BY dst, rk""".stripMargin

  // ---------------------------------------------------------------------
  // q128 — seeded label propagation (Graph.labelPropagationQ) over the
  // symmetrized cached citation graph: seeds (doc_id % 10 == 0) carry
  // pinned labels; 3 rounds of majority-vote adoption (ties → smallest
  // label) refine q115's coarse connected components into
  // seed-anchored territories — the semi-supervised sweep run when a
  // few trusted exemplars should claim their neighborhoods. The label
  // monotonicity argument (a labeled neighbor stays labeled) keeps the
  // recurrence carry-forward-free, and the oracle replays all 3 rounds
  // vote-for-vote with the identical (count desc, label asc) argmax.
  // ---------------------------------------------------------------------
  def q128LabelProp(s: SparkSession, d: String): DataFrame = {
    val e = citationEdgesCached(s, d)
    val sym = e.select(col("src"), col("dst"))
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = documents(s, d).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("node"), col("doc_id").as("label"))
    graft.scale.Graph.labelPropagationQ(sym, seeds, rounds = 3)
      .orderBy(col("node"))
  }
  val q128Sql: String = {
    val rounds = (1 to 3).map { i =>
      s"""v$i AS (SELECT e.b AS node, l.label, count(*) AS c
         |  FROM sym e JOIN l${i - 1} l ON e.a = l.node GROUP BY 1, 2),
         |p$i AS (SELECT node, label FROM (
         |  SELECT node, label, row_number() OVER (PARTITION BY node
         |    ORDER BY c DESC, label ASC) AS rn FROM v$i) WHERE rn = 1),
         |l$i AS (SELECT node, label FROM l0
         |  UNION ALL SELECT node, label FROM p$i WHERE node % 10 <> 0)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |sym AS (SELECT src AS a, dst AS b FROM dedges
       |  UNION SELECT dst, src FROM dedges),
       |l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents
       |  WHERE doc_id % 10 = 0),
       |$rounds
       |SELECT node, label FROM l3 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q129 — the COMPOSED training-data recipe, end to end in one query:
  // clean (length + token-count + exact-dup keep-first, q78's flags) →
  // decontaminate (drop docs sharing any 3-gram with the held-out eval
  // slice, q69's broadcast-postings rule) → sqrt-temperature mixing
  // (q126's derived quotas, k=200) → exact-cut packing (q124's
  // concat-then-chunk at seqLen=256, shard = source). Output is the
  // per-source FUNNEL — raw → clean → decontaminated → quota →
  // selected → bins/tokens — the attributability a production recipe
  // run reports. Every stage reuses the already-verified operator
  // (q78/q69/q126/q124 machinery), so the composition is the novelty:
  // the oracle chains the same four stages as one CTE pipeline and the
  // hash compare proves the stages compose without drift. Scale shape
  // inherits from the parts: flags are per-row algebra + one text-key
  // window, eval postings broadcast, quotas broadcast, packing windows
  // per source.
  // ---------------------------------------------------------------------
  def q129TrainingRecipe(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
    val tr = docs.filter(col("doc_id") % 50 =!= 0)
    val ev = docs.filter(col("doc_id") % 50 === 0)
    // dedup window keyed on xxhash64(text), NOT the raw text: the
    // window exchange + sort comparator carry an 8-byte key instead of
    // full documents (q30's exactByHash discipline; 64-bit collisions
    // sit below the corpus birthday bound the repo already accepts for
    // _lsh_docs keys — the oracle partitions by text and hash-matches)
    val flagged = tr
      .withColumn("tk", size(split(col("text"), " ")).cast("long"))
      .withColumn("clean",
        (col("n_chars").between(100, 100000) && col("tk") >= 20 &&
          col("doc_id") ===
            min(col("doc_id")).over(
              Window.partitionBy(xxhash64(col("text")))))
          .cast("long"))
    val cleanDocs = flagged.filter(col("clean") === 1)
    val contam = Dedup.contaminationOverlap(cleanDocs, ev, n = 3)
      .select(col("doc_id"))
    val kept = cleanDocs.join(contam, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false) // consumed by quotas AND ranking
    val quotas = graft.scale.Mixture.temperatureQuotas(kept, "source", 200L)
    val sel = graft.scale.Mixture.sample(kept, "source", k = 200L,
        precomputedQuotas = Some(quotas))
      .select(col("doc_id"), col("quota"))
    val selDocs = kept.join(sel.select(col("doc_id")), "doc_id")
    val packed = graft.scale.Packing
      .packStats(selDocs, col("source"), seqLen = 256L)
      .groupBy(col("shard").as("source"))
      .agg(count(lit(1)).as("n_bins"), sum(col("n_tokens")).as("n_tokens"))
    val funnel = tr.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
      .join(flagged.groupBy(col("source"))
        .agg(sum(col("clean")).as("n_clean")), "source")
      .join(kept.groupBy(col("source")).agg(count(lit(1)).as("n_kept")),
        "source")
      .join(quotas.select(col("source"), col("quota")), "source")
      .join(selDocs.groupBy(col("source")).agg(count(lit(1)).as("n_sel")),
        "source")
      .join(packed, "source")
    funnel.select(col("source"), col("n_raw"), col("n_clean"),
        col("n_kept"), col("quota"), col("n_sel"), col("n_bins"),
        col("n_tokens"))
      .orderBy(col("source"))
  }
  val q129Sql: String =
    """WITH tr AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
      |fl AS (
      |  SELECT doc_id, source, text,
      |    len(string_split(text, ' '))::BIGINT AS tk,
      |    CASE WHEN n_chars BETWEEN 100 AND 100000
      |      AND len(string_split(text, ' ')) >= 20
      |      AND doc_id = min(doc_id) OVER (PARTITION BY text)
      |      THEN 1 ELSE 0 END AS clean
      |  FROM tr),
      |cl AS (SELECT * FROM fl WHERE clean = 1),
      |csh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(string_split(text, ' ')) - 1),
      |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS sh
      |  FROM cl WHERE len(string_split(text, ' ')) >= 3),
      |ev AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(
      |    range(1, len(string_split(text, ' ')) - 1),
      |    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS sh
      |  FROM documents
      |  WHERE doc_id % 50 = 0 AND len(string_split(text, ' ')) >= 3),
      |contam AS (SELECT DISTINCT doc_id FROM csh JOIN ev USING (sh)),
      |kept AS (SELECT * FROM cl
      |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      |cnt AS (SELECT source, count(*) AS n FROM kept GROUP BY source),
      |q0 AS (SELECT source, n,
      |  CAST(floor(sqrt(n::DOUBLE)) AS BIGINT) AS isq FROM cnt),
      |tq AS (SELECT CAST(sum(isq) AS BIGINT) AS t FROM q0),
      |qt AS (SELECT source, n, isq, (isq * 200) // tq.t AS quota
      |  FROM q0, tq),
      |rk AS (SELECT source, doc_id, tk,
      |  row_number() OVER (PARTITION BY source ORDER BY
      |    CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) ASC, doc_id ASC) AS rk
      |  FROM kept),
      |sel AS (SELECT r.source, r.doc_id, r.tk
      |  FROM rk r JOIN qt USING (source) WHERE r.rk <= qt.quota),
      |cum AS (
      |  SELECT source, doc_id, tk,
      |    CAST(sum(tk) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tk
      |      AS BIGINT) AS cstart
      |  FROM sel),
      |bins AS (
      |  SELECT source, doc_id,
      |    unnest(range(cstart // 256, (cstart + tk - 1) // 256 + 1)) AS bin
      |  FROM cum),
      |pk AS (SELECT source, count(DISTINCT bin) AS n_bins FROM bins
      |  GROUP BY source),
      |tok AS (SELECT source, CAST(sum(tk) AS BIGINT) AS n_tokens
      |  FROM sel GROUP BY source),
      |raw AS (SELECT source, count(*) AS n_raw FROM tr GROUP BY source),
      |cln AS (SELECT source, CAST(sum(clean) AS BIGINT) AS n_clean
      |  FROM fl GROUP BY source),
      |kpt AS (SELECT source, count(*) AS n_kept FROM kept GROUP BY source),
      |slc AS (SELECT source, count(*) AS n_sel FROM sel GROUP BY source)
      |SELECT raw.source, raw.n_raw, cln.n_clean, kpt.n_kept, qt.quota,
      |  slc.n_sel, pk.n_bins, tok.n_tokens
      |FROM raw
      |JOIN cln USING (source) JOIN kpt USING (source)
      |JOIN qt USING (source) JOIN slc USING (source)
      |JOIN pk USING (source) JOIN tok USING (source)
      |ORDER BY raw.source""".stripMargin

  // ---------------------------------------------------------------------
  // q130 — perceptual-hash image dedup (Multimodal.averageHash +
  // phashNearDupPairs): the multimodal complement to q30/q33 — near-
  // identical IMAGES found via aHash over the decoded payload, banded
  // 16-bit chunks (the q33 pigeonhole, recall guaranteed to hamming 3),
  // and a bit_count(xor) verify. The media is synthesized with
  // near-dup structure by construction: every image row's payload is
  // its GROUP LEADER's text (groups of 30 doc ids), then one
  // hash-bit of per-image noise (bit doc_id % 63) simulates sensor/
  // re-encode jitter — so within-group pairs sit at hamming 0 or 2 and
  // cross-group pairs are chance collisions the verify rejects. The
  // oracle derives every byte analytically (ascii codepoints of the
  // leader text — the q41 synthesized-media discipline) while Spark
  // must reproduce the hash through the real encode→decode byte path.
  // ---------------------------------------------------------------------
  def q130MediaPhashDedup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val leaders = docs.select(col("doc_id").as("leader"),
      col("text").as("ltext"))
    val imgs = docs
      .filter(col("doc_id") % 3 === 0 && col("doc_id") % 97 =!= 0)
      .withColumn("leader", col("doc_id") - col("doc_id") % 30)
      .join(leaders, "leader")
      .filter(length(col("ltext")) >= 64)
    val mkBytes = udf { (id: Long, text: String) =>
      Multimodal.MediaCodec.encode("image", (id % 640).toInt + 1,
        (id % 480).toInt + 1, 0L, text.getBytes("UTF-8"))
    }
    val media = imgs.select(col("doc_id").as("media_id"),
      lit("image").as("kind"),
      mkBytes(col("doc_id"), col("ltext")).as("bytes"))
    val hashed = Multimodal.averageHash(media)
      // simulated per-image noise: one flipped hash bit per image
      .withColumn("ahash",
        expr("ahash ^ (cast(1 as bigint) << cast(media_id % 63 as int))"))
    Multimodal.phashNearDupPairs(hashed, maxHamming = 3)
      .orderBy(col("d1"), col("d2"))
  }
  val q130Sql: String =
    """WITH imgs AS (
      |  SELECT d.doc_id, l.text AS ltext
      |  FROM documents d
      |  JOIN documents l ON l.doc_id = d.doc_id - (d.doc_id % 30)
      |  WHERE d.doc_id % 3 = 0 AND d.doc_id % 97 <> 0
      |    AND len(l.text) >= 64),
      |px AS (
      |  SELECT doc_id,
      |    list_transform(range(1, 64),
      |      i -> ascii(substr(ltext, CAST(i AS INT), 1))) AS b
      |  FROM imgs),
      |m AS (SELECT doc_id, b,
      |  CAST(list_sum(b) AS BIGINT) // 63 AS mean FROM px),
      |h0 AS (
      |  SELECT doc_id, CAST(list_sum(list_transform(range(1, 64),
      |    i -> CASE WHEN b[CAST(i AS INT)] > mean
      |      THEN (1::BIGINT << CAST(i - 1 AS INT)) ELSE 0::BIGINT END))
      |    AS BIGINT) AS h
      |  FROM m),
      |hs AS (
      |  SELECT doc_id,
      |    xor(h, 1::BIGINT << CAST(doc_id % 63 AS INT)) AS h
      |  FROM h0),
      |bands AS (
      |  SELECT doc_id, h, (h >> CAST(16 * k AS INT)) & 65535 AS chunk, k
      |  FROM hs, LATERAL (SELECT unnest(range(0, 4)) AS k) t),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |    a.h AS h1, b.h AS h2
      |  FROM bands a JOIN bands b
      |    ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
      |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
      |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
      |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------------
  // q131 — token-balanced shard export (Packing.tokenBalancedShards):
  // q89 shards by hash mod S — document COUNTS balance in expectation,
  // token mass doesn't when lengths vary; the exporter a training
  // pipeline actually runs cuts the content-hash-ordered token stream
  // every ⌈total/S⌉ tokens so every shard carries ≈ equal TOKENS. The
  // global cumsum runs on q61's two-level recipe (per-bucket sums →
  // control-plane offsets → bucket-partitioned window — no
  // single-partition sort anywhere; PlanShapeSpec-asserted), while the
  // oracle states the same layout with one plain global window.
  // ---------------------------------------------------------------------
  def q131TokenShards(s: SparkSession, d: String): DataFrame =
    graft.scale.Packing.tokenBalancedShards(documents(s, d), nShards = 16)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tokens"))
      .orderBy(col("shard"))
  val q131Sql: String =
    s"""WITH hsrc AS (
       |  SELECT doc_id, $duckRollingHash AS h,
       |    len(string_split(text, ' '))::BIGINT AS tk
       |  FROM documents),
       |b AS (SELECT doc_id, h, tk, h % 32 AS bucket FROM hsrc),
       |c AS (SELECT doc_id, tk,
       |  CAST(sum(tk) OVER (ORDER BY bucket, h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tk
       |    AS BIGINT) AS cstart
       |  FROM b),
       |t AS (SELECT CAST(sum(tk) AS BIGINT) AS total FROM b),
       |sh AS (SELECT c.doc_id, c.tk,
       |  c.cstart // greatest(1, (t.total + 15) // 16) AS shard
       |  FROM c, t)
       |SELECT shard, count(*) AS n_docs, CAST(sum(tk) AS BIGINT) AS n_tokens
       |FROM sh GROUP BY shard ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------------
  // q132 — language segmentation (TextAnalysis.chunkLangProfile): the
  // code-switching detector q36's doc-level argmax cannot be — a
  // half-English half-German page votes "en" at the doc level and
  // poisons both language buckets; the per-32-token-window profile
  // says "mixed" and names the majority. The corpus is monolingual, so
  // code-switched docs are SYNTHESIZED by a known rule (every 4th doc
  // gains a 65-token German-marker block — the q41/q130 discipline:
  // the oracle injects the same suffix analytically and replays window
  // boundaries, per-chunk argmax, majority, and the mixed flag
  // verbatim). Zero-shuffle chunk explode + per-row scoring; only
  // (doc, lang) pairs shuffle.
  // ---------------------------------------------------------------------
  def q132LangSegments(s: SparkSession, d: String): DataFrame = {
    val german = " der die und ist das" * 13
    val injected = documents(s, d).withColumn("text",
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(german)))
        .otherwise(col("text")))
    TextAnalysis.chunkLangProfile(injected, window = 32)
      .orderBy(col("doc_id"))
  }
  val q132Sql: String = {
    val langs = TextAnalysis.markers.keys.toSeq.sorted
    val scores = langs.map { l =>
      val words = TextAnalysis.markers(l).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(chunk, ' '), t -> t IN ($words))) AS s_$l"
    }.mkString(",\n  ")
    val g = langs.map(l => s"s_$l").mkString(", ")
    val cases = langs.map(l => s"WHEN s_$l = g THEN '$l'").mkString(" ")
    s"""WITH tokw AS (SELECT doc_id, string_split(
       |    CASE WHEN doc_id % 4 = 0
       |      THEN text || repeat(' der die und ist das', 13)
       |    ELSE text END, ' ') AS w FROM documents),
       |ch AS (
       |  SELECT doc_id, array_to_string(
       |    w[CAST(i*32+1 AS INT) : CAST(i*32+32 AS INT)], ' ') AS chunk
       |  FROM tokw,
       |    LATERAL (SELECT unnest(range(0, (len(w)-1)//32 + 1)) AS i) t),
       |sc AS (SELECT doc_id, $scores FROM ch),
       |cl AS (SELECT doc_id,
       |  CASE WHEN g <= 0 THEN 'und' $cases END AS clang
       |  FROM (SELECT doc_id, greatest($g) AS g, $g FROM sc) t),
       |tot AS (SELECT doc_id, count(*) AS n_chunks FROM cl GROUP BY doc_id),
       |cnt AS (SELECT doc_id, clang, count(*) AS c FROM cl
       |  WHERE clang <> 'und' GROUP BY 1, 2),
       |mj AS (SELECT doc_id, clang AS major_lang FROM (
       |  SELECT doc_id, clang, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY c DESC, clang ASC) AS rn FROM cnt) WHERE rn = 1),
       |nl AS (SELECT doc_id, CAST(count(DISTINCT clang) AS BIGINT) AS n_langs
       |  FROM cnt GROUP BY doc_id)
       |SELECT t.doc_id, t.n_chunks,
       |  coalesce(mj.major_lang, 'und') AS major_lang,
       |  CAST(coalesce(nl.n_langs, 0) AS BIGINT) AS n_langs,
       |  CAST(coalesce(nl.n_langs, 0) AS BIGINT) >= 2 AS mixed
       |FROM tot t LEFT JOIN mj USING (doc_id) LEFT JOIN nl USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q133 — quality-aware canonical selection: the dedup POLICY step
  // q67 leaves open. q67's min-id canonical is arbitrary; a production
  // pipeline keeps the BEST member of each near-dup cluster (here:
  // longest text, ties to the smallest id — any quality scalar slots
  // into the same argmax). Clusters are q67's (Jaccard pairs →
  // connected components); the keep decision is one max-struct per
  // cluster over (quality, -id) — map-side combinable, 16-byte rows.
  // Only multi-member clusters surface (singletons keep themselves
  // trivially). The oracle replays pairs, components, and the argmax
  // with a (quality desc, id asc) window.
  // ---------------------------------------------------------------------
  def q133KeepBest(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = Dedup.ngramJaccardPairs(docs, n = 5, threshold = 0.8)
      .select(col("d1"), col("d2"))
    Dedup.connectedComponents(pairs)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_chars").as("q"), (-col("doc_id")).as("nid")))
          .as("m"))
      .filter(col("n_members") >= 2)
      .select(col("cluster"), col("n_members"),
        (-col("m.nid")).as("keep_id"), col("m.q").as("keep_chars"))
      .orderBy(col("cluster"))
  }
  val q133Sql: String =
    """WITH RECURSIVE tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |sh0 AS (SELECT DISTINCT doc_id, sh FROM (
      |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w)-3)) AS i) t)),
      |tot AS (SELECT count(*) AS n_docs FROM documents),
      |sh AS (
      |  SELECT s.doc_id, s.sh FROM sh0 s
      |  JOIN (SELECT sh, count(*) AS df FROM sh0 GROUP BY sh) d ON s.sh = d.sh, tot
      |  WHERE d.df <= greatest(100, CAST(ceil(tot.n_docs * 0.01) AS BIGINT))),
      |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |np AS (
      |  SELECT d1, d2 FROM pairs
      |  JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id
      |  WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= 0.8),
      |sym AS (SELECT d1 AS a, d2 AS b FROM np UNION SELECT d2, d1 FROM np),
      |reach AS (
      |  SELECT a AS v, a AS r FROM sym
      |  UNION
      |  SELECT s.a, t.r FROM sym s JOIN reach t ON s.b = t.v),
      |lab AS (SELECT v AS doc_id, min(r) AS cluster FROM reach GROUP BY v),
      |q AS (SELECT l.cluster, l.doc_id, d.n_chars
      |  FROM lab l JOIN documents d USING (doc_id)),
      |rk AS (SELECT cluster, doc_id, n_chars, row_number() OVER (
      |    PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC) AS rn
      |  FROM q),
      |sz AS (SELECT cluster, count(*) AS n_members FROM q GROUP BY cluster)
      |SELECT s.cluster, s.n_members, r.doc_id AS keep_id,
      |  r.n_chars AS keep_chars
      |FROM sz s JOIN rk r ON s.cluster = r.cluster AND r.rn = 1
      |WHERE s.n_members >= 2
      |ORDER BY s.cluster""".stripMargin

  // ---------------------------------------------------------------------
  // q134 — RANK-error quantile sketch (scale/Sketch.rankQuantiles): the
  // skew-robust successor to q114. histQuantiles' one-bin bound is in
  // VALUE space — one 2^40 outlier stretches its global extent until
  // all real mass bins at 0 and the p50 estimate is useless exactly on
  // the heavy-tailed length/token distributions it replaces q54 for.
  // This sketch bounds RANK error instead: per-group state is the k
  // rows with smallest md5_64(group:id) (a deterministic uniform
  // sample — the derandomized-KLL trade: coin-flip compaction would
  // make a distributed result partitioning-dependent and break oracle
  // replay), estimate = sample order statistic. WindowGroupLimit
  // k-selects map-side before the group exchange; merge is KMV union
  // (bottomK(bottomK(A) ∪ bottomK(B)) = bottomK(A ∪ B)). Groups ≤ k
  // degrade to EXACT quantiles (all of sf0.01 does — the planted
  // heavy-tail rank-error bound is RankQuantileSpec's job).
  // ---------------------------------------------------------------------
  def q134RankQuantiles(s: SparkSession, d: String): DataFrame =
    graft.scale.Sketch
      .rankQuantiles(documents(s, d), "lang", "n_chars", "doc_id")
      .withColumnRenamed("g", "lang")
      .orderBy(col("lang"), col("pq"))
  val q134Sql: String =
    """WITH s AS (
      |  SELECT lang, n_chars, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY CAST('0x' || substr(md5(lang || ':' ||
      |        CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT), doc_id) AS srn
      |  FROM documents),
      |samp AS (SELECT lang, n_chars, doc_id FROM s WHERE srn <= 256),
      |m AS (SELECT lang, count(*) AS mm FROM samp GROUP BY 1),
      |ord AS (SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
      |      AS rnk FROM samp),
      |qs AS (SELECT unnest([25, 50, 75, 95]) AS pq)
      |SELECT o.lang, q.pq::BIGINT AS pq, o.n_chars::BIGINT AS est
      |FROM ord o JOIN m ON o.lang = m.lang, qs q
      |WHERE o.rnk = (q.pq * m.mm + 99) // 100
      |ORDER BY o.lang, pq""".stripMargin

  // ---------------------------------------------------------------------
  // q135 — UNSEEDED modularity communities (Graph.
  // modularityCommunitiesQ): the missing third of the community
  // family — q115 gives connected components (one blob per region),
  // q128 needs a seed set; this is the unsupervised Louvain-style
  // sweep ("topic islands") over the SAME cached citation edges.
  // Fixed-round synchronous local moves in exact integer
  // modularity-gain space (gain = 2m·k_ic − k_i·Σ'_c), deterministic
  // argmax (gain desc, community asc), LABEL-MONOTONE descent (moves
  // only to ≤-labeled communities) so oscillation is impossible by
  // construction — the oracle replays every round's votes, gains, and
  // moves verbatim. GraphSpec pins planted-dense-block separation,
  // the independent integer replay, and fixpoint stability.
  // ---------------------------------------------------------------------
  def q135ModularityCommunities(s: SparkSession, d: String): DataFrame =
    graft.scale.Graph.modularityCommunitiesQ(
        citationEdgesCached(s, d).select(col("src"), col("dst")), rounds = 3)
      .orderBy(col("node"))
  /** Per-round CTEs of the q135 unweighted local-move recurrence,
    * prefix-parameterized so the q153 two-phase warm-start oracle can
    * replay a cold phase ("a") and a warm phase ("w") in one query —
    * the dirPrRoundsSql sharing pattern. Caller defines
    * `${pfx}sym/${pfx}degs/${pfx}tm/${pfx}l0`. */
  private def louvainRoundsSql(iters: Int, pfx: String): String =
    (1 to iters).map { t =>
      val p = t - 1
      s"""${pfx}s$t AS MATERIALIZED (SELECT l.comm AS cand, sum(d.k) AS sigma
         |  FROM ${pfx}l$p l JOIN ${pfx}degs d USING (node) GROUP BY 1),
         |${pfx}k$t AS MATERIALIZED (SELECT s.u AS node, l.comm AS cand, count(*) AS kic
         |  FROM ${pfx}sym s JOIN ${pfx}l$p l ON s.v = l.node GROUP BY 1, 2),
         |${pfx}c$t AS MATERIALIZED (SELECT node, cand, max(kic) AS kic FROM (
         |  SELECT k.node, k.cand, k.kic FROM ${pfx}k$t k
         |    JOIN ${pfx}l$p l USING (node) WHERE k.cand <= l.comm
         |  UNION ALL SELECT node, comm AS cand, 0 AS kic FROM ${pfx}l$p)
         |  GROUP BY 1, 2),
         |${pfx}l$t AS MATERIALIZED (SELECT node, cand AS comm FROM (
         |  SELECT c.node, c.cand, row_number() OVER (PARTITION BY c.node
         |    ORDER BY (tm.m2 * c.kic - d.k * (g.sigma -
         |      CASE WHEN c.cand = l.comm THEN d.k ELSE 0 END)) DESC,
         |      c.cand ASC) AS rn
         |  FROM ${pfx}c$t c JOIN ${pfx}degs d USING (node)
         |    JOIN ${pfx}l$p l USING (node)
         |    JOIN ${pfx}s$t g ON g.cand = c.cand, ${pfx}tm tm)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  val q135Sql: String =
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |sym AS MATERIALIZED (SELECT src AS u, dst AS v FROM dedges
       |  UNION ALL SELECT dst, src FROM dedges),
       |degs AS MATERIALIZED (SELECT u AS node, count(*) AS k FROM sym GROUP BY 1),
       |tm AS (SELECT count(*) AS m2 FROM sym),
       |l0 AS MATERIALIZED (SELECT node, node AS comm FROM degs),
       |${louvainRoundsSql(3, "")}
       |SELECT node, comm FROM l3 ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q137 — WARM-START directed PageRank (Graph.pageRankDirectedResumeQ):
  // the graph family's "index, don't recompute" move. Phase 1 ranks
  // YESTERDAY'S corpus (citation edges among doc_id % 10 != 9, 3
  // rounds) ONCE into a fingerprinted rank cache beside the cached
  // edge table (the q113/q102 build-once discipline). Phase 2 — the
  // per-ingest query — resumes the recurrence on the FULL graph from
  // the stored ranks for 2 rounds: known nodes continue where they
  // stood, the appended docs enter at the uniform share, and the round
  // budget closes the delta the new edges opened instead of re-deriving
  // the fixed point from r0. The oracle replays BOTH phases (cold
  // rounds on the old subgraph, warm rounds on the full graph,
  // dangling correction in each) verbatim. GraphSpec pins the exact
  // continuation property and the convergence advantage bound.
  // ---------------------------------------------------------------------
  def q137PagerankWarm(s: SparkSession, d: String): DataFrame = {
    val eAll = citationEdgesCached(s, d).select(col("src"), col("dst"))
    val eOld = eAll.filter(col("src") % 10 =!= 9 && col("dst") % 10 =!= 9)
    val priorDir = cachedIndexDir("citation-ranks", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.Graph.pageRankDirectedQ(eOld, 3)
        .select(col("node"), col("pr_q"))
        .coalesce(1).write.mode("overwrite").parquet(s"$p/ranks")
    }
    val prior = s.read.parquet(s"$priorDir/ranks")
    graft.scale.Graph.pageRankDirectedResumeQ(eAll, 2, prior)
      .select(col("node"), col("outdeg"), col("pr_q"))
      .orderBy(col("node"))
  }
  /** Per-round CTEs of the dangling-corrected integer directed-PageRank
    * recurrence, shared by the q137/q141/q143 two-phase oracles:
    * `pfx`r0/`pfx`dn/`pfx`n must be defined by the caller. */
  private def dirPrRoundsSql(iters: Int, pfx: String, edges: String): String =
    (1 to iters).map { i =>
      s"""${pfx}s$i AS MATERIALIZED (SELECT e.dst AS node, sum(r.r // r.outdeg) AS s
         |  FROM $edges e JOIN ${pfx}r${i - 1} r ON e.src = r.node
         |  GROUP BY e.dst),
         |${pfx}d$i AS MATERIALIZED (SELECT coalesce(sum(r), 0) AS dm
         |  FROM ${pfx}r${i - 1} WHERE outdeg = 0),
         |${pfx}r$i AS MATERIALIZED (SELECT dg.node, dg.outdeg, CAST(
         |    (150000000000 // ${pfx}n.n) +
         |    (85 * (coalesce(${pfx}s$i.s, 0) + (${pfx}d$i.dm // ${pfx}n.n))) // 100
         |    AS BIGINT) AS r
         |  FROM ${pfx}dn dg LEFT JOIN ${pfx}s$i ON dg.node = ${pfx}s$i.node,
         |    ${pfx}n, ${pfx}d$i)""".stripMargin
    }.mkString(",\n")

  val q137Sql: String = {
    def rounds(iters: Int, pfx: String, edges: String): String =
      dirPrRoundsSql(iters, pfx, edges)
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |aedges AS MATERIALIZED (SELECT src, dst FROM dedges
       |  WHERE src % 10 <> 9 AND dst % 10 <> 9),
       |aoutd AS MATERIALIZED (SELECT src AS node, count(*) AS outdeg FROM aedges
       |  GROUP BY src),
       |adn AS MATERIALIZED (
       |  SELECT nd.node, coalesce(o.outdeg, 0) AS outdeg
       |  FROM (SELECT src AS node FROM aedges
       |        UNION SELECT dst AS node FROM aedges) nd
       |  LEFT JOIN aoutd o ON nd.node = o.node),
       |an AS (SELECT count(*) AS n FROM adn),
       |ar0 AS MATERIALIZED (SELECT node, outdeg, 1000000000000 // an.n AS r FROM adn, an),
       |${rounds(3, "a", "aedges")},
       |outd AS MATERIALIZED (SELECT src AS node, count(*) AS outdeg FROM dedges
       |  GROUP BY src),
       |dn AS MATERIALIZED (
       |  SELECT nd.node, coalesce(o.outdeg, 0) AS outdeg
       |  FROM (SELECT src AS node FROM dedges
       |        UNION SELECT dst AS node FROM dedges) nd
       |  LEFT JOIN outd o ON nd.node = o.node),
       |wn AS (SELECT count(*) AS n FROM dn),
       |wdn AS (SELECT node, outdeg FROM dn),
       |wr0 AS MATERIALIZED (SELECT d.node, d.outdeg,
       |    coalesce(p.r, 1000000000000 // wn.n) AS r
       |  FROM dn d LEFT JOIN ar3 p ON d.node = p.node, wn),
       |${rounds(2, "w", "dedges")}
       |SELECT node, outdeg, r AS pr_q FROM wr2 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q138 — GENERAL-temperature mixture at dyadic α = 5/16 ≈ 0.3
  // (Mixture.temperatureQuotasAlpha): the low-temperature published-mix
  // path q126's fixed α = 0.5 lacked. The weight is the exact-integer
  // dyadic power w(n) = floor(n^(1/4)) · floor(n^(1/16)) via iterated
  // floor-sqrt chains (isqrt is IEEE-exact below 2^52; α's binary
  // expansion 0101 selects chain elements 2 and 4) — no pow(), no
  // overflowing n^p intermediate, replayable by any engine with exact
  // double sqrt. Selection reuses the q126 machinery (content-hash
  // order, WindowGroupLimit-bounded). MixtureSpec pins the chain
  // against BigInt rational powers and the monotone/64-bit contracts.
  // ---------------------------------------------------------------------
  def q138AlphaMixture(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val q = graft.scale.Mixture
      .temperatureQuotasAlpha(docs, "source", 100L, alphaNum = 5,
        alphaDen = 16)
    graft.scale.Mixture.sample(docs, "source", 100L,
        precomputedQuotas = Some(q))
      .orderBy(col("source"), col("rk"))
  }
  val q138Sql: String =
    """WITH cnt AS (SELECT source, count(*) AS n FROM documents
      |  GROUP BY source),
      |c1 AS (SELECT source, n,
      |  CAST(floor(sqrt(n::DOUBLE)) AS BIGINT) AS s1 FROM cnt),
      |c2 AS (SELECT *, CAST(floor(sqrt(s1::DOUBLE)) AS BIGINT) AS s2 FROM c1),
      |c3 AS (SELECT *, CAST(floor(sqrt(s2::DOUBLE)) AS BIGINT) AS s3 FROM c2),
      |c4 AS (SELECT *, CAST(floor(sqrt(s3::DOUBLE)) AS BIGINT) AS s4 FROM c3),
      |w AS (SELECT source, n, s2 * s4 AS w FROM c4),
      |t AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM w),
      |qt AS (SELECT source, n, (w.w * 100) // t.t AS quota FROM w, t),
      |h AS (SELECT source, doc_id,
      |  CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
      |    AS BIGINT) AS h
      |  FROM documents),
      |r AS (SELECT source, doc_id, h,
      |  row_number() OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC)
      |    AS rk
      |  FROM h)
      |SELECT r.source, qt.n, qt.quota, r.rk, r.doc_id
      |FROM r JOIN qt USING (source) WHERE r.rk <= qt.quota
      |ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------------
  // q139 — MULTILEVEL modularity communities (Graph.
  // modularityCommunitiesMultilevelQ): the full Louvain loop q135's
  // single local-move phase begins — local moves, contract communities
  // to weighted supernodes (internal edges become doubled self-loops
  // automatically in the symmetric representation, preserving every
  // degree and the global 2m), repeat on the coarsened graph, compose
  // the level maps. Level 2 can merge CORES a node-level pass cannot
  // reach (its candidate set is one supernode hop). Same integer-gain
  // + monotone-descent determinism per level; the oracle replays both
  // levels' weighted votes, the contraction, and the composition
  // verbatim. GraphSpec pins the weighted multilevel pure-Scala
  // replay and the levels=1 ≡ q135 identity.
  // ---------------------------------------------------------------------
  def q139LouvainMultilevel(s: SparkSession, d: String): DataFrame =
    graft.scale.Graph.modularityCommunitiesMultilevelQ(
        citationEdgesCached(s, d).select(col("src"), col("dst")),
        rounds = 2, levels = 2)
      .orderBy(col("node"))
  val q139Sql: String = {
    // weighted local-move rounds: prefix L distinguishes the level's
    // sym/degs/label namespaces; tm (2m) is level-invariant
    def wrounds(iters: Int, p: String): String =
      (1 to iters).map { t =>
        val q = t - 1
        s"""${p}s$t AS (SELECT l.comm AS cand, sum(d.k) AS sigma
           |  FROM ${p}l$q l JOIN ${p}degs d USING (node) GROUP BY 1),
           |${p}k$t AS (SELECT s.u AS node, l.comm AS cand, sum(s.wt) AS kic
           |  FROM ${p}sym s JOIN ${p}l$q l ON s.v = l.node
           |  WHERE s.u <> s.v GROUP BY 1, 2),
           |${p}c$t AS (SELECT node, cand, max(kic) AS kic FROM (
           |  SELECT k.node, k.cand, k.kic FROM ${p}k$t k
           |    JOIN ${p}l$q l USING (node) WHERE k.cand <= l.comm
           |  UNION ALL SELECT node, comm AS cand, 0 AS kic FROM ${p}l$q)
           |  GROUP BY 1, 2),
           |${p}l$t AS MATERIALIZED (SELECT node, cand AS comm FROM (
           |  SELECT c.node, c.cand, row_number() OVER (PARTITION BY c.node
           |    ORDER BY (tm.m2 * c.kic - d.k * (g.sigma -
           |      CASE WHEN c.cand = l.comm THEN d.k ELSE 0 END)) DESC,
           |      c.cand ASC) AS rn
           |  FROM ${p}c$t c JOIN ${p}degs d USING (node)
           |    JOIN ${p}l$q l USING (node)
           |    JOIN ${p}s$t g ON g.cand = c.cand, tm) WHERE rn = 1)"""
          .stripMargin
      }.mkString(",\n")
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |asym AS MATERIALIZED (
       |  SELECT src AS u, dst AS v, CAST(1 AS BIGINT) AS wt FROM dedges
       |  UNION ALL SELECT dst, src, CAST(1 AS BIGINT) FROM dedges),
       |adegs AS MATERIALIZED (
       |  SELECT u AS node, sum(wt) AS k FROM asym GROUP BY 1),
       |tm AS MATERIALIZED (SELECT sum(wt) AS m2 FROM asym),
       |al0 AS MATERIALIZED (SELECT node, node AS comm FROM adegs),
       |${wrounds(2, "a")},
       |bsym AS MATERIALIZED (
       |  SELECT la.comm AS u, lb.comm AS v, sum(s.wt) AS wt
       |  FROM asym s JOIN al2 la ON s.u = la.node
       |    JOIN al2 lb ON s.v = lb.node GROUP BY 1, 2),
       |bdegs AS MATERIALIZED (
       |  SELECT u AS node, sum(wt) AS k FROM bsym GROUP BY 1),
       |bl0 AS MATERIALIZED (SELECT node, node AS comm FROM bdegs),
       |${wrounds(2, "b")}
       |SELECT a.node, b.comm FROM al2 a JOIN bl2 b ON a.comm = b.node
       |ORDER BY a.node""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q140 — INCREMENTALLY-MAINTAINED citation edges (scale/
  // CitationIndex): the "index, don't recompute" move for the graph
  // family's INPUT. The whole graph family reads citation edges; until
  // now they rebuilt from scratch per corpus change. This index
  // persists postings + per-term edge-support rows, grows O(batch) on
  // append, and handles the df-band transitions that make incremental
  // maintenance nontrivial: a term entering [dfMin, dfMax] reaches
  // BACK (edges appear among its old docs too), and a term exceeding
  // dfMax dies FOREVER (df is monotone under append-only corpora, so
  // dead_terms is append-only and its edges vanish via one anti-join).
  // The query builds on 90% of the corpus and appends the rest; the
  // oracle derives the full-corpus weighted edges from scratch — the
  // hash match IS the append≡rebuild proof under the driver's gate.
  // CitationIndexSpec additionally pins band transitions, torn-append
  // healing, death permanence, and compaction.
  // ---------------------------------------------------------------------
  def q140CitationIndexEdges(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val dir = cachedIndexDir("citation-incr", d, "v2",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.CitationIndex.build(
        docs.filter(col("doc_id") % 10 =!= 9), p)
      graft.scale.CitationIndex.append(
        docs.filter(col("doc_id") % 10 === 9), p)
    }
    graft.scale.CitationIndex.edgesWeighted(s, dir)
      .orderBy(col("src"), col("dst"))
  }
  val q140Sql: String =
    s"""WITH $citationPostCtes
       |SELECT a.doc_id AS src, b.doc_id AS dst,
       |  count(*)::BIGINT AS w
       |FROM post a JOIN post b
       |  ON a.term = b.term AND a.doc_id > b.doc_id
       |GROUP BY 1, 2 ORDER BY src, dst""".stripMargin

  // ---------------------------------------------------------------------
  // q141 — the FULLY-INCREMENTAL graph pipeline, composed: q140's
  // maintained citation index supplies the edges (built on 90%,
  // appended 10% — never re-derived) and q137's warm-start recurrence
  // supplies the ranks (3 cold rounds on the old slice, resumed 2
  // rounds on the maintained full edge set). This is what a per-ingest
  // graph refresh actually runs: O(batch) edge maintenance + a fixed
  // round budget closing the rank delta — no corpus-wide recompute in
  // either half. The oracle is the same two-phase replay as q137 over
  // from-scratch edges; the hash match therefore ALSO proves the
  // maintained index's edges are interchangeable with derivation
  // inside a downstream fixed-point consumer.
  // ---------------------------------------------------------------------
  def q141IncrementalGraphPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val dir = cachedIndexDir("citation-incr", d, "v2",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.CitationIndex.build(
        docs.filter(col("doc_id") % 10 =!= 9), p)
      graft.scale.CitationIndex.append(
        docs.filter(col("doc_id") % 10 === 9), p)
    }
    val eAll = graft.scale.CitationIndex.edges(s, dir)
    val eOld = eAll.filter(col("src") % 10 =!= 9 && col("dst") % 10 =!= 9)
    val prior = graft.scale.Graph.pageRankDirectedQ(eOld, 3)
      .select(col("node"), col("pr_q"))
    graft.scale.Graph.pageRankDirectedResumeQ(eAll, 2, prior)
      .select(col("node"), col("outdeg"), col("pr_q"))
      .orderBy(col("node"))
  }
  // same replay as q137 — the equality of maintained and derived edges
  // is exactly the point
  def q141Sql: String = q137Sql

  // ---------------------------------------------------------------------
  // q142 — TOMBSTONE DELETES for the citation index (CitationIndex.
  // delete): the take-down path of the "index, don't recompute" story.
  // Deletion breaks the df monotonicity that made append-only band
  // maintenance sound — a band term can fall below dfMin (its edges
  // must vanish while support rows persist) and a dead term can fall
  // BACK into the band (its edges must appear among survivors). The
  // index handles both exactly: postings are retained up to
  // dfMax + slack (the purgatory tier = the revival budget, paid in
  // storage), revival regenerates surviving pairs from retained
  // postings, sub-band falls are one signed mark, and terms past the
  // tier refuse loudly instead of silently missing edges. The query
  // builds on the full corpus with slack = the delete size, deletes
  // the 10% slice, and reads the weighted edges; the oracle derives
  // from-scratch weighted edges over the SURVIVORS — the hash match
  // IS the delete≡rebuild proof.
  // ---------------------------------------------------------------------
  /** ONE definition of the tombstoned citation index q142/q143/q148
    * share: full corpus built with slack = the delete size, the 10%
    * slice tombstoned. Cache key and builder must not drift between
    * the three consumers or the shared cache would silently serve a
    * mismatched index. */
  private def citationDelIndexDir(s: SparkSession, d: String): String = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val victims = docs.filter(col("doc_id") % 10 === 9)
    cachedIndexDir("citation-del", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.CitationIndex.build(docs, p, slack = victims.count())
      graft.scale.CitationIndex.delete(victims, p)
    }
  }

  def q142CitationDeletes(s: SparkSession, d: String): DataFrame =
    graft.scale.CitationIndex.edgesWeighted(s, citationDelIndexDir(s, d))
      .orderBy(col("src"), col("dst"))
  val q142Sql: String =
    s"""WITH ${citationPostCtesOver("doc_id % 10 <> 9")}
       |SELECT a.doc_id AS src, b.doc_id AS dst,
       |  count(*)::BIGINT AS w
       |FROM post a JOIN post b
       |  ON a.term = b.term AND a.doc_id > b.doc_id
       |GROUP BY 1, 2 ORDER BY src, dst""".stripMargin

  // ---------------------------------------------------------------------
  // q143 — warm-start PageRank ACROSS A DELETE (the q141 composition's
  // take-down mirror, closing the CRUD square): yesterday's ranks were
  // computed on the FULL corpus (3 cold rounds over derived edges); a
  // take-down wave removes the 10% slice through CitationIndex.delete
  // (q142's O(batch) tombstoning with exact band revival); the
  // per-ingest query resumes the recurrence on the MAINTAINED SURVIVOR
  // edge set for 2 rounds — deleted nodes drop out of the node set,
  // surviving nodes continue from their stored ranks, and the round
  // budget closes the delta the removals opened. NOTE the survivor
  // edge set is NOT a filter of the full one (df recomputes: terms
  // fall below dfMin, dead terms revive) — the oracle re-derives it
  // from the survivor corpus, so the hash match proves the deleted
  // index's edges are interchangeable with survivor-corpus derivation
  // inside a fixed-point consumer.
  // ---------------------------------------------------------------------
  def q143DeleteWarmPagerank(s: SparkSession, d: String): DataFrame = {
    // the q142 cache: built on the full corpus, 10% slice tombstoned
    val dir = citationDelIndexDir(s, d)
    val eFull = citationEdgesCached(s, d).select(col("src"), col("dst"))
    val prior = graft.scale.Graph.pageRankDirectedQ(eFull, 3)
      .select(col("node"), col("pr_q"))
    val eSurv = graft.scale.CitationIndex.edges(s, dir)
    graft.scale.Graph.pageRankDirectedResumeQ(eSurv, 2, prior)
      .select(col("node"), col("outdeg"), col("pr_q"))
      .orderBy(col("node"))
  }
  val q143Sql: String =
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |${citationPostCtesOver("doc_id % 10 <> 9", "s")},
       |sdedges AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM spost a JOIN spost b
       |    ON a.term = b.term AND a.doc_id > b.doc_id),
       |aoutd AS MATERIALIZED (SELECT src AS node, count(*) AS outdeg FROM dedges
       |  GROUP BY src),
       |adn AS MATERIALIZED (
       |  SELECT nd.node, coalesce(o.outdeg, 0) AS outdeg
       |  FROM (SELECT src AS node FROM dedges
       |        UNION SELECT dst AS node FROM dedges) nd
       |  LEFT JOIN aoutd o ON nd.node = o.node),
       |an AS (SELECT count(*) AS n FROM adn),
       |ar0 AS MATERIALIZED (SELECT node, outdeg, 1000000000000 // an.n AS r FROM adn, an),
       |${dirPrRoundsSql(3, "a", "dedges")},
       |outd AS MATERIALIZED (SELECT src AS node, count(*) AS outdeg FROM sdedges
       |  GROUP BY src),
       |dn AS MATERIALIZED (
       |  SELECT nd.node, coalesce(o.outdeg, 0) AS outdeg
       |  FROM (SELECT src AS node FROM sdedges
       |        UNION SELECT dst AS node FROM sdedges) nd
       |  LEFT JOIN outd o ON nd.node = o.node),
       |wn AS (SELECT count(*) AS n FROM dn),
       |wdn AS (SELECT node, outdeg FROM dn),
       |wr0 AS MATERIALIZED (SELECT d.node, d.outdeg,
       |    coalesce(p.r, 1000000000000 // wn.n) AS r
       |  FROM dn d LEFT JOIN ar3 p ON d.node = p.node, wn),
       |${dirPrRoundsSql(2, "w", "sdedges")}
       |SELECT node, outdeg, r AS pr_q FROM wr2 ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q144 — LSH dedup probe AFTER TAKE-DOWNS: q113's per-ingest question
  // ("which of today's docs already exist in my corpus") asked against
  // an index that has tombstoned a slice of that corpus. The probe's
  // anti-join excludes tombstoned ids NOW — before any compaction — so
  // a removed document stops matching as a near-dup candidate the
  // moment delete() commits; the oracle replays q113's full signature/
  // band/verify pipeline with the tombstoned slice excluded from the
  // corpus side, making delete-then-probe ≡ never-indexed an ORACLE
  // fact (LshIndexSpec pins the same equivalence structurally). Still
  // zero corpus-side recompute: the tombstone set is an O(deleted)
  // anti-join, folded away at compaction.
  // ---------------------------------------------------------------------
  def q144LshDeleteProbe(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = cachedIndexDir("lsh-index-del", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.LshIndex.build(docs.filter(col("doc_id") < 400), p)
      graft.scale.LshIndex.delete(
        docs.filter(col("doc_id") < 400 && col("doc_id") % 7 === 0)
          .select(col("doc_id")), p)
    }
    graft.scale.LshIndex
      .dedupBatch(s, dir, docs.filter(col("doc_id") >= 400), minMatches = 8)
      .orderBy(col("new_doc"), col("corpus_doc"))
  }
  // q113's replay with the tombstoned slice excluded from the corpus
  // side of the candidate join
  val q144Sql: String = q113Sql.replace(
    "AND a.doc_id < 400 AND b.doc_id >= 400",
    "AND a.doc_id < 400 AND a.doc_id % 7 <> 0 AND b.doc_id >= 400")

  // ---------------------------------------------------------------------
  // q145 — BM25 serving AFTER TAKE-DOWNS: q102's materialized-postings
  // probe against an index that has tombstoned a corpus slice. BM25 is
  // the interesting delete case among the serving indexes because the
  // SCORES of the surviving docs change, not just the result set — N,
  // avgdl, and every query term's df shift when docs leave, so a
  // tombstone anti-join alone would rank with stale statistics.
  // BmIndex records each victim's dl in the tombstone row and topK
  // serves with stats NET of tombstones (adjustedStats) while df
  // re-derives from the tombstone-filtered probe rows; the oracle
  // scores the survivor corpus from scratch — the hash match proves
  // delete-then-serve ≡ never-indexed INCLUDING the statistics, before
  // any compaction. Query terms stay sourced from doc 1 (external
  // input; doc 1 survives the slice).
  // ---------------------------------------------------------------------
  def q145Bm25DeleteProbe(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = cachedIndexDir("bm-index-del", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.BmIndex.build(docs, p)
      graft.scale.BmIndex.delete(
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")), p)
    }
    graft.scale.BmIndex.topK(s, dir, doc1Terms(s, d), k = 15)
  }
  val q145Sql: String =
    s"""WITH ${bm25CtesOver("doc_id % 7 <> 3")}
       |SELECT rank, doc_id, n_hit, score_q FROM lexranked
       |WHERE rank <= 15 ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------------
  // q146/q147 — the vector side of delete-then-serve, completing the
  // oracle-proven take-down story across ALL FIVE serving indexes
  // (LSH q144, BM25 q145, citation q142, IVF here, IVF+PQ next).
  // Deleting vectors does NOT retrain the coarse quantizer or the PQ
  // codebooks (both stay as built — the production contract: codebook
  // drift is a rebuild decision, not a delete side-effect), so the
  // oracle filters ONLY the scanned corpus: tombstoned ids leave the
  // candidate set the moment delete() commits, queries and codewords
  // stay intact even when the deleted slice contains them. The
  // replace() is surgical — corpus_d's scan side is the one place the
  // corpus enters either oracle.
  // ---------------------------------------------------------------------
  def q146IvfDeleteProbe(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val dir = cachedIndexDir("ivf-index-del", d, "v1") { p =>
      graft.scale.IvfIndex.build(emb, centroids, p,
        centroidCount = Some(strideCentroidCount(s, d, 97)))
      graft.scale.IvfIndex.delete(
        emb.filter(col("vec_id") % 7 === 2).select(col("vec_id")), p)
    }
    graft.scale.IvfIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 5, nProbe = 3)
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }
  val q146Sql: String = q35Sql.replace(
    "FROM embeddings a, cent c)",
    "FROM embeddings a, cent c WHERE a.vec_id % 7 <> 2)")

  def q147IvfPqDeleteProbe(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val dir = cachedIndexDir("ivfpq-index-del", d, "v1") { p =>
      graft.scale.IvfPqIndex.build(emb, centroids, p,
        centroidCount = Some(strideCentroidCount(s, d, 97)))
      graft.scale.IvfPqIndex.delete(
        emb.filter(col("vec_id") % 7 === 2).select(col("vec_id")), p)
    }
    graft.scale.IvfPqIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 10, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }
  val q147Sql: String = q90Sql.replace(
    "FROM embeddings a, cent c)",
    "FROM embeddings a, cent c WHERE a.vec_id % 7 <> 2)")

  // ---------------------------------------------------------------------
  // q148 — COMPACT-then-serve: q142's tombstoned citation index folded
  // by CitationIndex.compactTo (the repo's richest compaction —
  // tombstoned postings/pairs/doc-ids physically drop, dead/sub stale
  // pair rows drop, the signed delta tables fold to their current
  // sums, the tombstone set empties) and served from the COMPACTED
  // layout. Same oracle as q142: the hash match proves the fold
  // changed the physical layout without moving a single edge — the
  // maintenance operation a 100 TB index runs on a schedule, verified
  // end-to-end rather than only structurally (CitationDeleteSpec
  // keeps the physical-drop and re-appendability pins).
  // ---------------------------------------------------------------------
  def q148CitationCompactServe(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("citation-del-compact", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.CitationIndex.compactTo(s, citationDelIndexDir(s, d), p)
      require(graft.scale.CitationIndex.consistent(s, p),
        "compacted citation index failed its consistency probes")
    }
    graft.scale.CitationIndex.edgesWeighted(s, dir)
      .orderBy(col("src"), col("dst"))
  }
  // the fold must not move an edge — q142's oracle verbatim
  def q148Sql: String = q142Sql

  // ---------------------------------------------------------------------
  // q136 — REAL image codec in the dedup loop (Multimodal.
  // imageAverageHash): q130 proved the aHash algebra over the synthetic
  // header rule; this proves the same algebra over ACTUAL PNG BYTES
  // through javax.imageio. Fixture = one real 16×16 grayscale PNG per
  // document, built from an oracle-known rule — each 2×2 block is the
  // constant gray (doc_id·131 + i·17) mod 256 for block index i — so
  // the real decode → integer 8×8 average-pool recovers the rule's
  // values EXACTLY (lossless PNG, constant blocks → exact integer
  // means) and the oracle predicts every hash analytically while Spark
  // derives it through encode→PNG→ImageIO→pool→hash. The q41/q130
  // synthesized-media discipline with a production codec in the loop.
  // Scale shape: encode+decode+hash all inside one batched
  // mapPartitions chain — bytes never shuffle; only (doc_id, ahash)
  // leaves the partition.
  // ---------------------------------------------------------------------
  def q136ImageCodecHash(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val media = documents(s, d).select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val px = Array.tabulate(256) { p =>
            val bx = (p % 16) / 2
            val by = (p / 16) / 2
            val i = by * 8 + bx
            ((id * 131L + i * 17L) % 256L).toInt
          }
          Row(id, Multimodal.encodePngGray(16, 16, px))
        }
      }(enc)
    Multimodal.imageAverageHash(media)
      .select(col("media_id").as("doc_id"), col("ahash"))
      .orderBy(col("doc_id"))
  }
  val q136Sql: String =
    """WITH px AS (
      |  SELECT doc_id, i, (doc_id * 131 + i * 17) % 256 AS g
      |  FROM documents, LATERAL (SELECT unnest(range(0, 63)) AS i) t),
      |m AS (SELECT doc_id, sum(g) // 63 AS mean FROM px GROUP BY 1),
      |bits AS (
      |  SELECT p.doc_id,
      |    sum(CASE WHEN p.g > m.mean THEN (1::BIGINT << p.i::INT)
      |      ELSE 0 END)::BIGINT AS ahash
      |  FROM px p JOIN m USING (doc_id) GROUP BY 1)
      |SELECT doc_id, ahash FROM bits ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q149 — incrementally-maintained dedup clusters (scale/ClusterStore):
  // connected components as an INDEX, not a recompute. Docs are
  // connected iff they share any q104 content chunk; the store
  // persists a union-find forest whose appends cost O(batch) — one
  // pointer row per new connected doc, ONE row per absorbed root on a
  // merge, never a member rewrite. Built here as four sequential
  // doc_id%4 batches (the df-4 shared chunk's docs span three of them,
  // so cross-batch merges and root relabels genuinely happen); served
  // as the full (doc_id, rep) assignment. The oracle derives the SAME
  // labels from scratch — chunk-share star edges to each chunk's
  // global min owner, transitive closure, min per component — so the
  // hash match proves the maintained forest equals a from-scratch
  // clustering REGARDLESS of batch order (hub choice differs per
  // batching; component minima cannot).
  // ---------------------------------------------------------------------
  private def clusterChunksOf(s: SparkSession, d: String): DataFrame =
    chunksOf(s, d).select(col("doc_id"), col("chunk_hash"))

  def q149ClusterStore(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("cluster-store", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val ch = clusterChunksOf(s, d)
      graft.scale.ClusterStore.build(ch.filter(col("doc_id") % 4 === 0), p)
      (1 to 3).foreach { i =>
        graft.scale.ClusterStore.append(ch.filter(col("doc_id") % 4 === i), p)
      }
      require(graft.scale.ClusterStore.consistent(s, p),
        "cluster store failed its consistency probes after build")
    }
    graft.scale.ClusterStore.assignments(s, dir)
      .withColumn("is_canonical",
        (col("doc_id") === col("rep")).cast("int"))
      .orderBy(col("doc_id"))
  }
  private def clusterStoreSqlOver(docFilter: String,
      liveBody: String = "SELECT * FROM documents"): String =
    s"""WITH RECURSIVE live AS MATERIALIZED (
       |  $liveBody WHERE $docFilter),
       |tok AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    len(string_split(text, ' ')) AS n FROM live),
       |st AS (SELECT doc_id, w, n, unnest(range(0, n, 32)) AS start FROM tok),
       |ch AS MATERIALIZED (SELECT DISTINCT doc_id,
       |  CAST('0x' || substr(md5(
       |    array_to_string(w[start + 1 : start + 64], ' ')), 1, 15)
       |    AS BIGINT) AS chunk_hash FROM st),
       |own AS MATERIALIZED (
       |  SELECT chunk_hash, min(doc_id) AS owner FROM ch GROUP BY chunk_hash),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT c.doc_id AS a, o.owner AS b
       |  FROM ch c JOIN own o USING (chunk_hash) WHERE c.doc_id <> o.owner),
       |sym AS MATERIALIZED (SELECT a, b FROM e UNION SELECT b, a FROM e),
       |reach AS (SELECT doc_id AS v, doc_id AS r FROM live
       |  UNION SELECT s.a, t.r FROM sym s JOIN reach t ON s.b = t.v)
       |SELECT v AS doc_id, min(r) AS rep,
       |  CASE WHEN v = min(r) THEN 1 ELSE 0 END AS is_canonical
       |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin
  val q149Sql: String = clusterStoreSqlOver("TRUE")

  // ---------------------------------------------------------------------
  // q150 — delete-then-serve on the cluster store: components SPLIT.
  // Victims are the %10==9 slice PLUS doc 54 — the corpus's largest
  // component's minimum (and the hub of its df-4 shared chunk), so the
  // delete exercises the hard transitions: the {54,68,135,352}
  // component must re-hang its star edges on the minimum survivor and
  // relabel to rep=68, and a two-doc component loses one end and
  // collapses to a singleton. The oracle rebuilds from scratch over
  // the survivors — the hash match is the delete≡rebuild proof at the
  // component level (stale chains through the deleted root must not
  // serve).
  // ---------------------------------------------------------------------
  private def clusterDelDir(s: SparkSession, d: String): String =
    cachedIndexDir("cluster-store-del", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val ch = clusterChunksOf(s, d)
      graft.scale.ClusterStore.build(ch.filter(col("doc_id") % 4 === 0), p)
      (1 to 3).foreach { i =>
        graft.scale.ClusterStore.append(ch.filter(col("doc_id") % 4 === i), p)
      }
      graft.scale.ClusterStore.delete(
        documents(s, d).filter(col("doc_id") % 10 === 9 ||
          col("doc_id") === 54).select(col("doc_id")), p)
    }

  def q150ClusterDeletes(s: SparkSession, d: String): DataFrame =
    graft.scale.ClusterStore.assignments(s, clusterDelDir(s, d))
      .withColumn("is_canonical",
        (col("doc_id") === col("rep")).cast("int"))
      .orderBy(col("doc_id"))
  val q150Sql: String =
    clusterStoreSqlOver("doc_id % 10 <> 9 AND doc_id <> 54")

  // ---------------------------------------------------------------------
  // q151 — compact-then-serve on the cluster store: fold the epoch
  // history (tombstones out, every pointer chain flattened to depth 1)
  // and serve from the compacted layout. Same oracle as q150 — the
  // hash match proves the fold changed the physical layout without
  // moving a single assignment, completing the maintain→delete→compact
  // lifecycle the citation/LSH/BM/IVF families already verify.
  // ---------------------------------------------------------------------
  def q151ClusterCompactServe(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("cluster-store-compact", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.ClusterStore.compactTo(s, clusterDelDir(s, d), p)
      require(graft.scale.ClusterStore.consistent(s, p),
        "compacted cluster store failed its consistency probes")
    }
    graft.scale.ClusterStore.assignments(s, dir)
      .withColumn("is_canonical",
        (col("doc_id") === col("rep")).cast("int"))
      .orderBy(col("doc_id"))
  }
  def q151Sql: String = q150Sql

  // ---------------------------------------------------------------------
  // q152 — z-order layout LIFECYCLE (build → append ×2 → compact →
  // tight serve): the seventh serving layout gets the same
  // maintain-then-prove treatment as the citation/LSH/BM/IVF/PQ/
  // cluster families. A third of the events table is z-written, two
  // more thirds APPEND into the live bucket dirs
  // (Layout.appendZOrdered — O(batch), no resident-file rewrite), the
  // decayed geometry folds to one file per bucket
  // (Layout.compactZOrderedTo — stored z reused, never recomputed),
  // and the serve is boxScanTight over the COMPACTED layout: z-range
  // predicates only, no per-dimension residuals. The oracle states the
  // plain box over ALL events (the q99 analytic oracle) — the hash
  // match proves build+append+compact+tight-read ≡ whole-corpus box
  // semantics end to end. ZOrderSpec pins the physical claims (file
  // counts, per-file z sort, bucket set).
  // ---------------------------------------------------------------------
  def q152ZOrderLifecycle(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("zorder-lifecycle", d, "v1",
      datasets = Seq("events.parquet")) { p =>
      val ev = events(s, d)
        .select(col("event_id"),
          pmod(col("user_id"), lit(256L)).as("xb"),
          pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
      graft.scale.Layout.writeZOrdered(
        ev.filter(col("event_id") % 3 === 0), col("xb"), col("yb"),
        s"$p/base")
      graft.scale.Layout.appendZOrdered(
        ev.filter(col("event_id") % 3 === 1), col("xb"), col("yb"),
        s"$p/base")
      graft.scale.Layout.appendZOrdered(
        ev.filter(col("event_id") % 3 === 2), col("xb"), col("yb"),
        s"$p/base")
      graft.scale.Layout.compactZOrderedTo(s, s"$p/base", s"$p/compact")
    }
    graft.scale.Layout
      .boxScanTight(s.read.parquet(s"$dir/compact"), 16, 31, 32, 63)
      .select(col("event_id"), col("xb"), col("yb"), col("z"))
      .orderBy(col("event_id"))
  }
  def q152Sql: String = q99Sql

  // ---------------------------------------------------------------------
  // q153 — WARM-START modularity communities (Graph.
  // modularityCommunitiesResumeQ): the community-sweep twin of q137's
  // rank cache, closing the "PageRank warm-starts but Louvain always
  // recomputes" asymmetry. Phase 1 sweeps YESTERDAY'S subgraph
  // (citation edges among doc_id % 10 != 9, 3 rounds) ONCE into a
  // fingerprinted label cache beside the cached edge table; phase 2 —
  // the per-ingest query — resumes the monotone descent on the FULL
  // graph from the stored labels for 2 rounds: known nodes re-enter
  // the vote at their settled community, appended docs enter at self,
  // and every gain is re-evaluated against TODAY'S degrees and 2m (the
  // prior shortens the descent, never freezes stale merges). The
  // oracle replays BOTH phases verbatim (cold rounds on the old
  // subgraph, warm rounds on the full graph, per-phase 2m). GraphSpec
  // pins the convergence advantage: on this small-delta append the
  // warm sweep lands on the cold fixed point in fewer rounds.
  // ---------------------------------------------------------------------
  def q153LouvainWarm(s: SparkSession, d: String): DataFrame = {
    val eAll = citationEdgesCached(s, d).select(col("src"), col("dst"))
    val eOld = eAll.filter(col("src") % 10 =!= 9 && col("dst") % 10 =!= 9)
    val priorDir = cachedIndexDir("citation-labels", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.Graph.modularityCommunitiesQ(eOld, 3)
        .coalesce(1).write.mode("overwrite").parquet(s"$p/labels")
    }
    val prior = s.read.parquet(s"$priorDir/labels")
    graft.scale.Graph.modularityCommunitiesResumeQ(eAll, 2, prior)
      .orderBy(col("node"))
  }
  def q153Sql: String =
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |aedges AS MATERIALIZED (SELECT src, dst FROM dedges
       |  WHERE src % 10 <> 9 AND dst % 10 <> 9),
       |asym AS MATERIALIZED (SELECT src AS u, dst AS v FROM aedges
       |  UNION ALL SELECT dst, src FROM aedges),
       |adegs AS MATERIALIZED (SELECT u AS node, count(*) AS k FROM asym
       |  GROUP BY 1),
       |atm AS (SELECT count(*) AS m2 FROM asym),
       |al0 AS MATERIALIZED (SELECT node, node AS comm FROM adegs),
       |${louvainRoundsSql(3, "a")},
       |wsym AS MATERIALIZED (SELECT src AS u, dst AS v FROM dedges
       |  UNION ALL SELECT dst, src FROM dedges),
       |wdegs AS MATERIALIZED (SELECT u AS node, count(*) AS k FROM wsym
       |  GROUP BY 1),
       |wtm AS (SELECT count(*) AS m2 FROM wsym),
       |wl0 AS MATERIALIZED (SELECT d.node, coalesce(p.comm, d.node) AS comm
       |  FROM wdegs d LEFT JOIN al3 p ON d.node = p.node),
       |${louvainRoundsSql(2, "w")}
       |SELECT node, comm FROM wl2 ORDER BY node""".stripMargin

  // ---------------------------------------------------------------------
  // q154 — KMV theta-sketch OVERLAP estimate (Beyer et al. 2007; the
  // DataSketches theta intersection): the ESTIMATE form of q69's
  // decontamination question. q69 joins the corpora exactly; at 100 TB
  // the pipeline first asks "is train∩eval ~0 or ~10%?" from two k-row
  // bottom-k hash sketches each corpus computes once (distinct →
  // TakeOrderedAndProject — per-partition top-k then a k·tasks driver
  // merge, nothing corpus-sized moves) and ships anywhere. Union
  // sketch's θ is ≤ both input θs (the KMV merge property), so every
  // union member below θ present in a set IS in that set's sketch —
  // the intersection count is exact within the sample, scaled by 2^60/
  // h_k. Portable md5_64 end to end: the oracle replays sketches,
  // union, membership, and the floor-scaled estimators bit-for-bit.
  // SketchSpec pins the estimator against exact overlap (relative
  // error at saturation) and the sub-saturation exactness.
  // ---------------------------------------------------------------------
  def q154ThetaOverlap(s: SparkSession, d: String): DataFrame = {
    val k = 512
    val tok = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
    def grams(pred: org.apache.spark.sql.Column) = tok.filter(pred)
      .select(explode(array_distinct(transform(
        sequence(lit(0), size(col("w")) - 3),
        i => concat_ws(" ", element_at(col("w"), i + 1),
          element_at(col("w"), i + 2), element_at(col("w"), i + 3)))))
        .as("sh"))
    val train = graft.scale.Sketch.kmvDistinctSketch(
      grams(col("doc_id") % 50 =!= 0), col("sh"), k)
    val eval = graft.scale.Sketch.kmvDistinctSketch(
      grams(col("doc_id") % 50 === 0), col("sh"), k)
    graft.scale.Sketch.kmvOverlapEstimate(train, eval, k)
  }
  val q154Sql: String =
    """WITH tok AS MATERIALIZED (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |g AS MATERIALIZED (
      |  SELECT DISTINCT (doc_id % 50 = 0) AS is_eval,
      |    array_to_string(w[i:i+2], ' ') AS sh
      |  FROM tok, LATERAL (SELECT unnest(range(1, len(w)-1)) AS i) t),
      |ska AS MATERIALIZED (SELECT h FROM (
      |  SELECT DISTINCT CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
      |  FROM g WHERE NOT is_eval) ORDER BY h LIMIT 512),
      |skb AS MATERIALIZED (SELECT h FROM (
      |  SELECT DISTINCT CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
      |  FROM g WHERE is_eval) ORDER BY h LIMIT 512),
      |u AS MATERIALIZED (SELECT h FROM (
      |  SELECT h FROM ska UNION SELECT h FROM skb) ORDER BY h LIMIT 512),
      |agg AS (SELECT count(*) AS n_union_sample, max(h) AS h_k,
      |  CAST(sum(CASE WHEN h IN (SELECT h FROM ska)
      |    AND h IN (SELECT h FROM skb) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_both FROM u)
      |SELECT CAST(n_union_sample AS BIGINT) AS n_union_sample, h_k, n_both,
      |  CASE WHEN n_union_sample < 512 THEN n_union_sample
      |    ELSE CAST(floor((n_union_sample - 1)::DOUBLE *
      |      1152921504606846976.0 / h_k::DOUBLE) AS BIGINT) END AS est_union,
      |  CASE WHEN n_union_sample < 512 THEN n_both
      |    ELSE CAST(floor(n_both::DOUBLE *
      |      1152921504606846976.0 / h_k::DOUBLE) AS BIGINT) END AS est_common
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------------
  // q155 — CASCADE retrieval (recall → rerank): the two-stage serving
  // shape q94's fusion doesn't cover — stage 1 recalls a wide lexical
  // candidate set (BM25 top-100, the q92 machinery: probe = the query
  // terms' postings, O(Σ df) not corpus), stage 2 re-scores ONLY those
  // candidates with the expensive exact-cosine model and emits the top
  // 10. The 100 TB property is the cascade itself: the costly scorer
  // touches ≤ 100 rows regardless of corpus size (candidates
  // broadcast into the embeddings join — no shuffle), which is exactly
  // how production retrieval deploys a cross-encoder behind a cheap
  // recaller. Oracle replays both stages (shared bm25Ctes + the q34
  // cosine fold) bit-for-bit.
  // ---------------------------------------------------------------------
  def q155CascadeRerank(s: SparkSession, d: String): DataFrame = {
    val lex = graft.scale.Bm25.topK(documents(s, d), doc1Terms(s, d), k = 100)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val emb = embeddings(s, d)
    val candEmb = emb
      .join(broadcast(lex.filter(col("doc_id") =!= 1)),
        emb("vec_id") === col("doc_id"))
      .select(emb("vec_id"), emb("embedding"))
    val rr = graft.scale.Similarity
      .bruteForceTopK(emb.filter(col("vec_id") === 1), candEmb, k = 10)
      .select(col("rank"), col("vec_id").as("doc_id"),
        q(col("sim")).as("sim_q"))
    rr.join(broadcast(lex), Seq("doc_id"))
      .select(col("rank"), col("doc_id"), col("lex_rank"), col("sim_q"))
      .orderBy(col("rank"))
  }
  val q155Sql: String =
    s"""WITH $bm25Ctes,
       |cand AS MATERIALIZED (SELECT doc_id, rank AS lex_rank
       |  FROM lexranked WHERE rank <= 100 AND doc_id <> 1),
       |cscored AS (
       |  SELECT c.doc_id, c.lex_rank,
       |    ${duckCos("q.embedding", "e.embedding")} AS sim
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id,
       |    embeddings q WHERE q.vec_id = 1),
       |rr AS (SELECT doc_id, lex_rank, sim, row_number() OVER (
       |  ORDER BY sim DESC, doc_id ASC) AS rank FROM cscored)
       |SELECT rank, doc_id, lex_rank,
       |  CAST(floor(sim * 1000000000.0) AS BIGINT) AS sim_q
       |FROM rr WHERE rank <= 10 ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------------
  // q156 — DOCUMENT REVISION on the LSH index (LshIndex.upsert): the
  // CDC verb the serving lifecycle lacked — build/append/delete/
  // compact all treat content as immutable, yet crawls re-fetch and
  // documents change. A slice of the committed corpus (doc_id % 9 ==
  // 0) is re-signatured IN PLACE against revised text (token order
  // reversed — a deterministic, oracle-replayable rewrite that changes
  // every shingle), rev-stamped rows land beside the originals, and
  // the probe serves each doc's CURRENT generation via one broadcast
  // join against the O(revised docs) registry — stale bands stop
  // generating candidates and stale signatures stop verifying the
  // moment the registry row commits. The oracle replays the ENTIRE
  // q113 pipeline over a corpus whose revised slice carries the new
  // text, so the hash match IS the proof that upsert ≡ an index built
  // from the revised corpus. LshIndexSpec pins replay idempotence,
  // monotone-rev refusal, compaction folding, and the
  // delete/upsert interaction.
  // ---------------------------------------------------------------------
  def q156LshUpsertProbe(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = cachedIndexDir("lsh-index-upsert", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.LshIndex.build(docs.filter(col("doc_id") < 400), p)
      val revised = docs
        .filter(col("doc_id") < 400 && col("doc_id") % 9 === 0)
        .withColumn("text", concat_ws(" ", reverse(split(col("text"), " "))))
      graft.scale.LshIndex.upsert(revised, p, rev = 1L)
    }
    graft.scale.LshIndex
      .dedupBatch(s, dir, docs.filter(col("doc_id") >= 400), minMatches = 8)
      .orderBy(col("new_doc"), col("corpus_doc"))
  }
  val q156Sql: String = lshProbeSqlOver(
    """CASE WHEN doc_id < 400 AND doc_id % 9 = 0
      | THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
      | ELSE text END""".stripMargin.replace("\n", ""))

  // ---------------------------------------------------------------------
  // q157 — DOCUMENT REVISION on the BM25 index (BmIndex.upsert): the
  // q156 CDC verb on the postings index, which carries the obligation
  // LSH doesn't — scores depend on CORPUS statistics, and a revised
  // document changes its own length, so sum_dl (hence avgdl, hence
  // every probed score) must shift by exactly (new_dl − old_dl). A
  // slice of the committed corpus (doc_id % 9 == 0) is re-posted in
  // place against revised text (every second token dropped — dl
  // halves, so the stats shift is large and a stale avgdl is loudly
  // wrong); rev-stamped postings land inside the live term-bucket
  // dirs, the registry row (with both lengths) is the visibility
  // point, probes filter to current generations via one broadcast
  // join, and adjustedStats folds the latest delta per doc — the
  // corpus is never re-scanned. The oracle replays the whole q92
  // scoring chain over the corpus WITH revised texts: hash equality
  // proves upsert ≡ rebuild-from-revised, scores included. BmIndexSpec
  // additionally pins replay idempotence, monotone refusal, the
  // delete-after-revision stats ledger, and compaction folding.
  // ---------------------------------------------------------------------
  def q157Bm25UpsertProbe(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = cachedIndexDir("bm-index-upsert", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.BmIndex.build(docs, p)
      val revised = docs.filter(col("doc_id") % 9 === 0)
        .withColumn("text", concat_ws(" ",
          filter(split(col("text"), " "), (_, i) => i % 2 === 0)))
      graft.scale.BmIndex.upsert(revised, p, rev = 1L)
    }
    graft.scale.BmIndex.topK(s, dir, doc1Terms(s, d), k = 15)
  }
  val q157Sql: String = {
    val revisedText =
      """CASE WHEN doc_id % 9 = 0 THEN array_to_string(
        | list_filter(string_split(text, ' '), (x, i) -> (i-1) % 2 = 0),
        | ' ') ELSE text END""".stripMargin.replace("\n", "")
    s"""WITH ${bm25CtesOver("TRUE", revisedText)}
       |SELECT rank, doc_id, n_hit, score_q FROM lexranked
       |WHERE rank <= 15 ORDER BY rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q158 — VECTOR REVISION on the IVF index (IvfIndex.upsert): the
  // q156/q157 CDC verb on the vector side, with the complication
  // neither text index has — a revised embedding can change its
  // nearest centroid, so the current row must be free to land in a
  // DIFFERENT cluster directory than the stale one. Revision rows
  // live in their own bucketed subdir (`_ivf_rev_rows/cluster_id=N/`
  // — the main layout's files never grow a rev column, no mixed-
  // schema hazard), the registry is the visibility point, and probes
  // read both trees under the same partition filter: a registered
  // id's main row is dropped, its max-rev row serves (one broadcast
  // join against the O(revised) registry). Centroids stay FROZEN (the
  // append contract — re-clustering is rebuild's job; rebuild reads
  // corpus(), which is current-generation aware, so revisions fold on
  // the next re-cluster). Revision rule: embedding reversed — the
  // vector moves in cosine space deterministically, so the oracle
  // replays assignment and scoring over the revised corpus with the
  // ORIGINAL centroid set, and hash equality proves upsert ≡
  // rebuilt-from-revised. IvfIndexSpec pins cluster migration, replay
  // healing, monotone refusal, and rebuild folding.
  // ---------------------------------------------------------------------
  def q158IvfUpsertProbe(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    val dir = cachedIndexDir("ivf-index-upsert", d, "v1") { p =>
      graft.scale.IvfIndex.build(emb, centroids, p, centroidCount = cc)
      val revised = emb.filter(col("vec_id") % 9 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      graft.scale.IvfIndex.upsert(revised, centroids, p, rev = 1L,
        centroidCount = cc)
    }
    graft.scale.IvfIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 5, nProbe = 3)
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }
  val q158Sql: String = ivfProbeSqlOver("emb2",
    prelude = """emb2 AS MATERIALIZED (
      |  SELECT vec_id,
      |    CASE WHEN vec_id % 9 = 0 THEN list_reverse(embedding)
      |      ELSE embedding END AS embedding
      |  FROM embeddings),
      |""".stripMargin)

  // ---------------------------------------------------------------------
  // q168 — the FULL CDC LIFECYCLE on the VECTOR side (IvfIndex):
  // build(80%) → append(20%) → re-embed(%9, reversed vectors) →
  // delete(%7) → probe, composing the verbs q146/q158 proved one at a
  // time. The compositions under test: append under frozen centroids
  // feeding rows a later upsert supersedes; upsert's rev rows and
  // registry under a later delete's tombstones (a tombstoned id must
  // vanish from BOTH trees — main and _ivf_rev_rows — at probe time);
  // cluster migration surviving the whole chain. Centroids stay
  // frozen throughout (re-clustering is rebuild's job). The oracle
  // replays flat assignment + probe scoring over ((corpus with %9
  // re-embedded) minus %7) against the ORIGINAL centroid set — one
  // hash match proving the vector verb algebra closes end to end.
  // ---------------------------------------------------------------------
  def q168IvfCdcLifecycle(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    val dir = cachedIndexDir("ivf-cdc", d, "v1") { p =>
      graft.scale.IvfIndex.build(
        emb.filter(col("vec_id") % 5 =!= 4), centroids, p,
        centroidCount = cc)
      graft.scale.IvfIndex.append(
        emb.filter(col("vec_id") % 5 === 4), centroids, p,
        centroidCount = cc)
      val revised = emb.filter(col("vec_id") % 9 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      graft.scale.IvfIndex.upsert(revised, centroids, p, rev = 1L,
        centroidCount = cc)
      graft.scale.IvfIndex.delete(
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), p)
    }
    graft.scale.IvfIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 5, nProbe = 3)
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }
  val q168Sql: String = ivfProbeSqlOver("emb3",
    prelude = """emb3 AS MATERIALIZED (
      |  SELECT vec_id,
      |    CASE WHEN vec_id % 9 = 0 THEN list_reverse(embedding)
      |      ELSE embedding END AS embedding
      |  FROM embeddings WHERE vec_id % 7 <> 0),
      |""".stripMargin)

  // ---------------------------------------------------------------------
  // q170 — the FULL CDC LIFECYCLE on the LSH dedup index, where the
  // composition is about CANDIDATE GENERATION across generations:
  // append's bands feeding buckets a later upsert's generations
  // supersede (stale bands must stop producing candidates, not just
  // stop verifying), the upsert registry under a later delete's
  // tombstones (a tombstoned id must vanish whether its last
  // generation was build, append, or rev rows), and signature
  // verification joining only CURRENT-generation sigs. Oracle replays
  // the whole portable-MinHash chain over the revised survivor corpus
  // — one hash match proves probe ≡ probe-of-never-differed index.
  // ---------------------------------------------------------------------
  def q170LshCdcLifecycle(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = cachedIndexDir("lsh-index-cdc", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val corpus = docs.filter(col("doc_id") < 400)
      graft.scale.LshIndex.build(corpus.filter(col("doc_id") % 5 =!= 4), p)
      graft.scale.LshIndex.append(corpus.filter(col("doc_id") % 5 === 4), p)
      val revised = corpus.filter(col("doc_id") % 9 === 0)
        .withColumn("text",
          concat_ws(" ", reverse(split(col("text"), " "))))
      graft.scale.LshIndex.upsert(revised, p, rev = 1L)
      graft.scale.LshIndex.delete(
        corpus.filter(col("doc_id") % 7 === 0).select(col("doc_id")), p)
      require(graft.scale.LshIndex.consistent(s, p),
        "LSH index failed its consistency probes after the CDC cycle")
    }
    graft.scale.LshIndex
      .dedupBatch(s, dir, docs.filter(col("doc_id") >= 400), minMatches = 8)
      .orderBy(col("new_doc"), col("corpus_doc"))
  }
  val q170Sql: String = {
    val revText =
      """CASE WHEN doc_id < 400 AND doc_id % 9 = 0
        | THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
        | ELSE text END""".stripMargin.replace("\n", "")
    val base = lshProbeSqlOver(revText)
    val out = base.replace(
      "AND a.doc_id < 400 AND b.doc_id >= 400",
      "AND a.doc_id < 400 AND a.doc_id % 7 <> 0 AND b.doc_id >= 400")
    require(out != base, "q170Sql corpus-side rewrite target not found")
    out
  }

  // ---------------------------------------------------------------------
  // q171 — the FULL CDC LIFECYCLE on the IVF+PQ index: q168's verb
  // composition with the second frozen artifact in play — appended
  // and revised vectors re-encode under the codebooks STORED at
  // build (pinned to the full-table derivation so the oracle's
  // replay agrees), while the coarse centroids gate which partition
  // dirs exist; the tombstone must reach code rows in both the main
  // and _pq_rev_rows trees. Oracle = q159's replay with the %7 slice
  // excluded from the assigned corpus — serving still scans m-byte
  // codes only, and one hash match closes the verb algebra on the
  // compressed-vector side.
  // ---------------------------------------------------------------------
  def q171IvfPqCdcLifecycle(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    val dir = cachedIndexDir("ivfpq-cdc", d, "v1") { p =>
      graft.scale.IvfPqIndex.build(
        emb.filter(col("vec_id") % 5 =!= 4), centroids, p,
        centroidCount = cc,
        codebooks = Some(graft.scale.Similarity.pqInitCodebooks(emb)))
      graft.scale.IvfPqIndex.append(
        emb.filter(col("vec_id") % 5 === 4), centroids, p,
        centroidCount = cc)
      val revised = emb.filter(col("vec_id") % 9 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      graft.scale.IvfPqIndex.upsert(revised, centroids, p, rev = 1L,
        centroidCount = cc)
      graft.scale.IvfPqIndex.delete(
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), p)
    }
    graft.scale.IvfPqIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 10, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }
  // lazy: derives from q159Sql, which initializes later in this object
  lazy val q171Sql: String = {
    val out = q159Sql.replace("FROM emb2 a, cent c)",
      "FROM emb2 a, cent c WHERE a.vec_id % 7 <> 0)")
    require(out != q159Sql, "q171Sql corpus-side rewrite target not found")
    out
  }

  // ---------------------------------------------------------------------
  // q173 — PER-SOURCE BOILERPLATE EXCISION (Dedup.boilerplateExcision,
  // the CCNet/RefinedWeb pre-dedup pass): a fixed-width token segment
  // occurring in ≥ half of one source's documents is site chrome and
  // every document of that source drops it — the dedup family's
  // domain-keyed member (span dedup hunts copies BETWEEN documents
  // corpus-wide; this hunts repeats WITHIN a source at
  // document-fraction scale, so a quoted passage survives while a
  // footer dies). The synthetic corpus has no site chrome, so the
  // fixture injects it by an oracle-replayable rule (the q41/q130/
  // q132/q136 discipline): three 16-token front blocks per doc —
  // header (100% of the source → excised), footer (80% → excised),
  // promo (33% → BELOW threshold, must survive) — so both threshold
  // directions are load-bearing in the hash. Scale: segments generate
  // per row, df counts shuffle 16-byte keys map-side-combined, the
  // flagged set is docs/minFrac-bounded and broadcasts; documents
  // never move.
  // ---------------------------------------------------------------------
  def q173BoilerplateExcision(s: SparkSession, d: String): DataFrame = {
    def blk(tag: String) = concat_ws(" ",
      transform(sequence(lit(0), lit(15)),
        j => concat(lit("h"), col("source"), lit(tag), j)))
    val synth = documents(s, d).select(col("doc_id"), col("source"),
      concat_ws(" ",
        blk("x"),
        when(col("doc_id") % 5 =!= 0, blk("f")),
        when(col("doc_id") % 3 === 0, blk("p")),
        col("text")).as("text"))
    graft.scale.Dedup.boilerplateExcision(synth, win = 16, minFrac = 0.5)
      .orderBy(col("doc_id"))
  }
  val q173Sql: String = {
    def blk(tag: String) =
      s"array_to_string(list_transform(range(0, 16), j -> 'h' || source || '$tag' || j), ' ')"
    s"""WITH d2 AS MATERIALIZED (
       |  SELECT doc_id, source,
       |    concat_ws(' ', ${blk("x")},
       |      CASE WHEN doc_id % 5 <> 0 THEN ${blk("f")} END,
       |      CASE WHEN doc_id % 3 = 0 THEN ${blk("p")} END,
       |      text) AS text
       |  FROM documents),
       |tok AS MATERIALIZED (SELECT doc_id, source, string_split(text, ' ') AS w,
       |  len(string_split(text, ' ')) AS n FROM d2),
       |st AS (SELECT doc_id, source, w, unnest(range(0, n, 16)) AS s FROM tok),
       |seg AS MATERIALIZED (SELECT doc_id, source, s // 16 AS seg_ix,
       |  CAST('0x' || substr(md5(array_to_string(w[s+1:s+16], ' ')), 1, 15)
       |    AS BIGINT) AS seg_hash FROM st),
       |srcn AS (SELECT source, count(DISTINCT doc_id) AS nd
       |  FROM documents GROUP BY 1),
       |bdf AS (SELECT source, seg_hash, count(DISTINCT doc_id) AS df
       |  FROM seg GROUP BY 1, 2),
       |boiler AS (SELECT source, seg_hash FROM bdf JOIN srcn USING (source)
       |  WHERE df >= greatest(2, ceil(0.5 * nd))),
       |bix AS (SELECT s.doc_id, list(DISTINCT s.seg_ix) AS ixs
       |  FROM seg s JOIN boiler b USING (source, seg_hash) GROUP BY 1)
       |SELECT t.doc_id,
       |  CAST(ceil(t.n / 16.0) AS BIGINT) AS n_segs,
       |  CAST(coalesce(len(x.ixs), 0) AS BIGINT) AS n_boiler,
       |  array_to_string(list_filter(t.w,
       |    (tk, i) -> NOT list_contains(coalesce(x.ixs, []), (i - 1) // 16)),
       |    ' ') AS cleaned_text
       |FROM tok t LEFT JOIN bix x USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q172 — the FULL CDC LIFECYCLE on the z-order layout, closing the
  // verb matrix at 7/7: write(⅓) → append(⅔) → upsert(%9, yb+128 —
  // rows cross the box boundary both ways AND change bucket) →
  // delete(%7, Layout.deleteZOrdered — the layout's new take-down
  // verb: tombstoned ids drop from BOTH trees at read time) →
  // compactZOrderedTo(fold) → tight box read over the COMPACTED
  // layout. The fold is the composition-sensitive step: it must drop
  // superseded generations AND tombstoned ids while folding current
  // rev rows into their migrated buckets (a geometry-only compaction
  // of a CDC-carrying layout is refused loudly). Oracle filters the
  // revised survivor table by the plain box predicate — hash equality
  // proves the five-verb chain ≡ a layout written once over the
  // revised survivors, z recompute included.
  // ---------------------------------------------------------------------
  def q172ZOrderCdcLifecycle(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("zorder-cdc", d, "v1",
      datasets = Seq("events.parquet")) { p =>
      val ev = events(s, d)
        .select(col("event_id"),
          pmod(col("user_id"), lit(256L)).as("xb"),
          pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
      graft.scale.Layout.writeZOrdered(
        ev.filter(col("event_id") % 3 === 0), col("xb"), col("yb"),
        s"$p/base")
      (1 to 2).foreach { i =>
        graft.scale.Layout.appendZOrdered(
          ev.filter(col("event_id") % 3 === i), col("xb"), col("yb"),
          s"$p/base")
      }
      val revised = ev.filter(col("event_id") % 9 === 0)
        .withColumn("yb", pmod(col("yb") + lit(128L), lit(256L)))
      graft.scale.Layout.upsertZOrdered(revised, "event_id",
        col("xb"), col("yb"), s"$p/base", rev = 1L)
      graft.scale.Layout.deleteZOrdered(
        ev.filter(col("event_id") % 7 === 0).select(col("event_id")),
        "event_id", s"$p/base")
      graft.scale.Layout.compactZOrderedTo(s, s"$p/base", s"$p/compact",
        foldRevisionsBy = Some("event_id"))
    }
    graft.scale.Layout
      .boxScanTight(s.read.parquet(s"$dir/compact"), 16, 31, 32, 63)
      .select(col("event_id"), col("xb"), col("yb"), col("z"))
      .orderBy(col("event_id"))
  }
  val q172Sql: String = {
    val zExpr = (0 until 8).map { i =>
      s"(((xb >> $i) & 1) << ${2 * i}) | (((yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH b0 AS (
       |  SELECT event_id, user_id % 256 AS xb,
       |    (epoch_ms(ts) // 60000) % 256 AS yb
       |  FROM events),
       |b AS (
       |  SELECT event_id, xb,
       |    CASE WHEN event_id % 9 = 0 THEN (yb + 128) % 256 ELSE yb END AS yb
       |  FROM b0 WHERE event_id % 7 <> 0)
       |SELECT event_id, xb, yb, CAST($zExpr AS BIGINT) AS z
       |FROM b WHERE xb BETWEEN 16 AND 31 AND yb BETWEEN 32 AND 63
       |ORDER BY event_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q169 — the FULL CDC LIFECYCLE on the BM25 index, where the
  // composition is about CORPUS STATISTICS: every verb moves
  // n_docs/sum_dl/df, and a probed score is only right if the ledger
  // nets build(80%) + append(20%) + revise(%9, every-2nd-token — dl
  // halves) + delete(%7, including docs whose CURRENT generation is
  // the revised one, so the tombstone must subtract the revised dl
  // while the revision delta stays counted) to exactly the
  // revised-survivor corpus's stats. One oracle hash over the q92
  // scoring chain proves scores, df, and avgdl all close.
  // ---------------------------------------------------------------------
  def q169Bm25CdcLifecycle(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dir = cachedIndexDir("bm-index-cdc", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.BmIndex.build(docs.filter(col("doc_id") % 5 =!= 4), p)
      graft.scale.BmIndex.append(docs.filter(col("doc_id") % 5 === 4), p)
      val revised = docs.filter(col("doc_id") % 9 === 0)
        .withColumn("text", concat_ws(" ",
          filter(split(col("text"), " "), (_, i) => i % 2 === 0)))
      graft.scale.BmIndex.upsert(revised, p, rev = 1L)
      graft.scale.BmIndex.delete(
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")), p)
      require(graft.scale.BmIndex.consistent(s, p),
        "BM25 index failed its consistency probes after the CDC cycle")
    }
    graft.scale.BmIndex.topK(s, dir, doc1Terms(s, d), k = 15)
  }
  val q169Sql: String = {
    val revisedText =
      """CASE WHEN doc_id % 9 = 0 THEN array_to_string(
        | list_filter(string_split(text, ' '), (x, i) -> (i-1) % 2 = 0),
        | ' ') ELSE text END""".stripMargin.replace("\n", "")
    s"""WITH ${bm25CtesOver("doc_id % 7 <> 0", revisedText)}
       |SELECT rank, doc_id, n_hit, score_q FROM lexranked
       |WHERE rank <= 15 ORDER BY rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q163 — the FULL CDC LIFECYCLE composed on one index: build(80%) →
  // append(20%) → revise(doc%9, token-reversed) → delete(doc%7) →
  // serve, all four verbs against the citation index — the subtlest
  // maintenance surface in the family, where each verb moves term df
  // and band membership and the four must COMPOSE exactly (append's
  // reach-back over rows a later upsert supersedes, upsert's
  // registry under a later delete's recount, delete's revival over
  // mixed-generation postings). The oracle derives from-scratch
  // weighted edges over ((corpus with %9 revised) minus %7) — one
  // hash match proving the whole verb algebra closes. This is the
  // shape a production crawl actually runs per day: new docs land,
  // re-fetched docs change, takedowns arrive, and the served graph
  // must equal a rebuild nobody can afford.
  // ---------------------------------------------------------------------
  def q163CitationCdcLifecycle(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val dir = cachedIndexDir("citation-cdc", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val revised = docs.filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text"),
          col("text").as("prev_text"))
      val victims = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 0,
            concat_ws(" ", reverse(split(col("text"), " "))))
            .otherwise(col("text")).as("text"))
      graft.scale.CitationIndex.build(
        docs.filter(col("doc_id") % 5 =!= 4), p,
        slack = revised.count() + victims.count())
      graft.scale.CitationIndex.append(docs.filter(col("doc_id") % 5 === 4), p)
      graft.scale.CitationIndex.upsert(revised, p, rev = 1L)
      // delete AFTER revision: victims pass their CURRENT text (the
      // revised generation for %9 ∩ %7 docs — the delete contract)
      graft.scale.CitationIndex.delete(victims, p)
      require(graft.scale.CitationIndex.consistent(s, p),
        "citation index failed its consistency probes after the CDC cycle")
    }
    graft.scale.CitationIndex.edgesWeighted(s, dir)
      .orderBy(col("src"), col("dst"))
  }
  val q163Sql: String =
    s"""WITH docs2 AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 9 = 0
       |      THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
       |      ELSE text END AS text
       |  FROM documents WHERE doc_id % 7 <> 0),
       |${citationPostCtesOver("TRUE", table = "docs2")}
       |SELECT a.doc_id AS src, b.doc_id AS dst,
       |  count(*)::BIGINT AS w
       |FROM post a JOIN post b
       |  ON a.term = b.term AND a.doc_id > b.doc_id
       |GROUP BY 1, 2 ORDER BY src, dst""".stripMargin

  // ---------------------------------------------------------------------
  // q164/q165 — SNAPSHOT READS (time travel) + the CDC lifecycle on
  // the cluster store. One store lives through every maintenance verb
  // (build → append ×3 → upsert(%9 revised) → delete(%7); epochs
  // 0..5), then serves TWO truths from the same files:
  //   q164 reads AS OF epoch 3 — the full corpus as it stood before
  //        the revision and the takedown ever happened. The oracle is
  //        the from-scratch clustering of the ORIGINAL corpus, so the
  //        hash match proves epochs 4-5 are invisible to the snapshot
  //        even though their dirs sit in the same tree. This is the
  //        read a reproducible training run pins: "train X used dedup
  //        state E" stays answerable after the corpus moves on.
  //   q165 reads the CURRENT state — upsert-then-delete composed, the
  //        cluster-store face of q163's verb-algebra closure; oracle
  //        re-clusters the revised survivors from scratch.
  // Storage is epoch-scoped (e=N partition dirs + one meta pointer),
  // so time travel costs a partition filter, not a copy; compactTo is
  // the explicit vacuum that trades history for geometry.
  // ---------------------------------------------------------------------
  /** The full-history store q164/q165 serve from (six epochs, all
    * four verbs in production order). */
  private def clusterCdcDir(s: SparkSession, d: String): String =
    cachedIndexDir("cluster-store-cdc", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val ch = clusterChunksOf(s, d)
      graft.scale.ClusterStore.build(ch.filter(col("doc_id") % 4 === 0), p)
      (1 to 3).foreach { i =>
        graft.scale.ClusterStore.append(ch.filter(col("doc_id") % 4 === i), p)
      }
      val revisedDocs = documents(s, d).filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
      graft.scale.ClusterStore.upsert(
        chunksOfDocs(revisedDocs).select(col("doc_id"), col("chunk_hash")), p)
      graft.scale.ClusterStore.delete(
        documents(s, d).filter(col("doc_id") % 7 === 0)
          .select(col("doc_id")), p)
      require(graft.scale.ClusterStore.consistent(s, p),
        "cluster store failed its consistency probes after the CDC cycle")
      require(graft.scale.ClusterStore.committedEpoch(s, p) == 5L,
        "CDC fixture must commit exactly epochs 0..5 (q164 pins asOf=3)")
    }

  def q164ClusterAsOf(s: SparkSession, d: String): DataFrame =
    graft.scale.ClusterStore.assignmentsAsOf(s, clusterCdcDir(s, d), asOf = 3L)
      .withColumn("is_canonical",
        (col("doc_id") === col("rep")).cast("int"))
      .orderBy(col("doc_id"))
  val q164Sql: String = clusterStoreSqlOver("TRUE")

  def q165ClusterCdcServe(s: SparkSession, d: String): DataFrame =
    graft.scale.ClusterStore.assignments(s, clusterCdcDir(s, d))
      .withColumn("is_canonical",
        (col("doc_id") === col("rep")).cast("int"))
      .orderBy(col("doc_id"))
  val q165Sql: String = clusterStoreSqlOver("doc_id % 7 <> 0",
    liveBody = """SELECT doc_id,
      |    CASE WHEN doc_id % 9 = 0
      |      THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
      |      ELSE text END AS text
      |  FROM documents""".stripMargin)

  // ---------------------------------------------------------------------
  // q166 — CROSS-SNAPSHOT DIFF (ClusterStore.diffAsOf): the read that
  // makes time travel operational. Between two training runs nobody
  // re-exports 100 TB — they ask "which docs entered, left, or
  // changed cluster since snapshot E" and refresh only those slices.
  // One full-outer join of two epoch-filtered assignment maps over
  // the q164/q165 store (as-of 3 = original corpus, as-of 5 = revised
  // survivors): %7 docs come out `deleted`, docs whose component the
  // %9 revision rewired come out `relabeled`, the rest `kept`
  // (`inserted` is spec-covered — this fixture admits none). The
  // oracle runs BOTH from-scratch clusterings as prefixed recursive
  // chains and joins them — hash match proves the maintained diff
  // equals the truth diff row for row, change labels included.
  // ---------------------------------------------------------------------
  def q166ClusterDiff(s: SparkSession, d: String): DataFrame =
    graft.scale.ClusterStore.diffAsOf(s, clusterCdcDir(s, d),
        from = 3L, to = 5L)
      .select(col("doc_id"),
        coalesce(col("old_rep"), lit(-1L)).as("old_rep"),
        coalesce(col("new_rep"), lit(-1L)).as("new_rep"),
        col("change"))
      .orderBy(col("doc_id"))
  /** One prefixed from-scratch clustering chain (the
    * [[clusterStoreSqlOver]] body without its final SELECT) — q166
    * runs two side by side. */
  private def clusterAsgChain(p: String, docFilter: String,
      liveBody: String = "SELECT * FROM documents"): String =
    s"""${p}live AS MATERIALIZED (
       |  $liveBody WHERE $docFilter),
       |${p}tok AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    len(string_split(text, ' ')) AS n FROM ${p}live),
       |${p}st AS (SELECT doc_id, w, n, unnest(range(0, n, 32)) AS start FROM ${p}tok),
       |${p}ch AS MATERIALIZED (SELECT DISTINCT doc_id,
       |  CAST('0x' || substr(md5(
       |    array_to_string(w[start + 1 : start + 64], ' ')), 1, 15)
       |    AS BIGINT) AS chunk_hash FROM ${p}st),
       |${p}own AS MATERIALIZED (
       |  SELECT chunk_hash, min(doc_id) AS owner FROM ${p}ch GROUP BY chunk_hash),
       |${p}e AS MATERIALIZED (
       |  SELECT DISTINCT c.doc_id AS a, o.owner AS b
       |  FROM ${p}ch c JOIN ${p}own o USING (chunk_hash) WHERE c.doc_id <> o.owner),
       |${p}sym AS MATERIALIZED (SELECT a, b FROM ${p}e UNION SELECT b, a FROM ${p}e),
       |${p}reach AS (SELECT doc_id AS v, doc_id AS r FROM ${p}live
       |  UNION SELECT s.a, t.r FROM ${p}sym s JOIN ${p}reach t ON s.b = t.v),
       |${p}asg AS MATERIALIZED (
       |  SELECT v AS doc_id, min(r) AS rep FROM ${p}reach GROUP BY v)"""
      .stripMargin
  val q166Sql: String =
    s"""WITH RECURSIVE ${clusterAsgChain("a_", "TRUE")},
       |${clusterAsgChain("b_", "doc_id % 7 <> 0",
           liveBody = """SELECT doc_id,
             |    CASE WHEN doc_id % 9 = 0
             |      THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
             |      ELSE text END AS text
             |  FROM documents""".stripMargin)}
       |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |  coalesce(a.rep, -1)::BIGINT AS old_rep,
       |  coalesce(b.rep, -1)::BIGINT AS new_rep,
       |  CASE WHEN a.doc_id IS NULL THEN 'inserted'
       |       WHEN b.doc_id IS NULL THEN 'deleted'
       |       WHEN a.rep = b.rep THEN 'kept'
       |       ELSE 'relabeled' END AS change
       |FROM a_asg a FULL OUTER JOIN b_asg b ON a.doc_id = b.doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q167 — CHANGE DATA FEED (ClusterStore.emitChangeFeed): the
  // writer-side CDC primitive. q166's diffAsOf resolves the whole
  // live corpus on both sides — right for rare snapshot-to-snapshot
  // reads, wrong per epoch at 100 TB. The feed derives each epoch's
  // delta at O(affected) cost from what that epoch actually wrote
  // (a rep can only change if the chain passes a stars-e=N src, or
  // the doc entered fwd e=N / left via tombs e=N; reverse closure
  // over those seeds, resolve candidates at N−1 and N, keep non-kept)
  // and persists it under feedDir/e=N. Emission is derived, not
  // captured, so it self-heals any crash between a store commit and
  // its feed write. The oracle runs SIX from-scratch clusterings (one
  // per epoch state) and unions the five truth diffs — hash match
  // proves every epoch's O(affected) delta is COMPLETE (no changed
  // doc escapes the candidate set) and exact, labels included.
  // ---------------------------------------------------------------------
  def q167ClusterChangeFeed(s: SparkSession, d: String): DataFrame = {
    val store = clusterCdcDir(s, d)
    val feed = cachedIndexDir("cluster-feed", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.ClusterStore.emitChangeFeed(s, store, p, baseline = 0L)
    }
    graft.scale.ClusterStore.changeFeed(s, feed)
      .select(col("e"), col("doc_id"),
        coalesce(col("old_rep"), lit(-1L)).as("old_rep"),
        coalesce(col("new_rep"), lit(-1L)).as("new_rep"),
        col("change"))
      .orderBy(col("e"), col("doc_id"))
  }
  val q167Sql: String = {
    val rev = """SELECT doc_id,
      |    CASE WHEN doc_id % 9 = 0
      |      THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
      |      ELSE text END AS text
      |  FROM documents""".stripMargin
    val chains = Seq(
      clusterAsgChain("c0_", "doc_id % 4 = 0"),
      clusterAsgChain("c1_", "doc_id % 4 IN (0, 1)"),
      clusterAsgChain("c2_", "doc_id % 4 IN (0, 1, 2)"),
      clusterAsgChain("c3_", "TRUE"),
      clusterAsgChain("c4_", "TRUE", rev),
      clusterAsgChain("c5_", "doc_id % 7 <> 0", rev)).mkString(",\n")
    val diffs = (1 to 5).map { n =>
      s"""SELECT $n::BIGINT AS e, coalesce(a.doc_id, b.doc_id) AS doc_id,
         |  coalesce(a.rep, -1)::BIGINT AS old_rep,
         |  coalesce(b.rep, -1)::BIGINT AS new_rep,
         |  CASE WHEN a.doc_id IS NULL THEN 'inserted'
         |       WHEN b.doc_id IS NULL THEN 'deleted'
         |       ELSE 'relabeled' END AS change
         |FROM c${n - 1}_asg a FULL OUTER JOIN c${n}_asg b
         |  ON a.doc_id = b.doc_id
         |WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.rep <> b.rep"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH RECURSIVE $chains\nSELECT * FROM (\n$diffs\n) ORDER BY e, doc_id"
  }

  // ---------------------------------------------------------------------
  // q162 — ROW REVISION on the z-order layout (Layout.upsertZOrdered /
  // readCurrent): the seventh serving layout gains the CDC verb, with
  // the IVF complication in key-space — a revised row's (x, y) move
  // changes its z-value, so its current generation must be free to
  // land in a DIFFERENT z-bucket directory than the stale one. Rev
  // rows live in `_z_rev_rows/z_bucket=N/` (underscore-hidden from
  // main reads), the `_z_rev` registry is the visibility point, and
  // readCurrent composes both trees so a box read's partition filter
  // pushes into each side of the union — serving stays bucket-pruned.
  // The query builds the layout over events, upserts the
  // event_id%9==0 slice with yb shifted by +128 mod 256 (rows cross
  // the box boundary both ways), and box-reads through readCurrent;
  // the oracle filters the REVISED table by the plain box predicate —
  // hash equality proves upsert ≡ rewritten-from-revised, including
  // the z recompute. ZOrderSpec pins bucket migration, replay
  // healing, monotone refusal, and revision-folding compaction.
  // ---------------------------------------------------------------------
  def q162ZOrderUpsert(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("zorder-upsert", d, "v1",
      datasets = Seq("events.parquet")) { p =>
      val ev = events(s, d)
        .select(col("event_id"),
          pmod(col("user_id"), lit(256L)).as("xb"),
          pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
      graft.scale.Layout.writeZOrdered(ev, col("xb"), col("yb"), s"$p/base")
      val revised = ev.filter(col("event_id") % 9 === 0)
        .withColumn("yb", pmod(col("yb") + lit(128L), lit(256L)))
      graft.scale.Layout.upsertZOrdered(revised, "event_id",
        col("xb"), col("yb"), s"$p/base", rev = 1L)
    }
    graft.scale.Layout
      .boxScanTight(
        graft.scale.Layout.readCurrent(s, s"$dir/base", "event_id"),
        16, 31, 32, 63)
      .select(col("event_id"), col("xb"), col("yb"), col("z"))
      .orderBy(col("event_id"))
  }
  val q162Sql: String = {
    val zExpr = (0 until 8).map { i =>
      s"(((xb >> $i) & 1) << ${2 * i}) | (((yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH b0 AS (
       |  SELECT event_id, user_id % 256 AS xb,
       |    (epoch_ms(ts) // 60000) % 256 AS yb
       |  FROM events),
       |b AS (
       |  SELECT event_id, xb,
       |    CASE WHEN event_id % 9 = 0 THEN (yb + 128) % 256 ELSE yb END AS yb
       |  FROM b0)
       |SELECT event_id, xb, yb, CAST($zExpr AS BIGINT) AS z
       |FROM b WHERE xb BETWEEN 16 AND 31 AND yb BETWEEN 32 AND 63
       |ORDER BY event_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q161 — DOCUMENT REVISION on the cluster store (ClusterStore.
  // upsert): re-chunked content replaces a doc's memberships in ONE
  // epoch that may both SPLIT and MERGE components — the only index
  // verb in the family where a revision can rewire arbitrary
  // cross-component topology. Old chunks' links sever via delete's
  // machinery (affected components expand by reverse closure and
  // re-cluster over surviving memberships); new chunks merge via
  // append's (external hubs absorbed by ROOT pointer rows — one row
  // per absorbed root, never a member rewrite). The rev/e=E registry
  // flips the doc's membership generation so old posts/fwd rows stop
  // counting unrewritten; compaction folds them physically. The query
  // builds the store in four batches (q149's shape), upserts the
  // doc_id%9==0 slice's chunks recomputed from token-order-reversed
  // text, and serves assignments; the oracle clusters from scratch
  // over the REVISED corpus — hash match proves upsert ≡
  // rebuild-from-revised at the component level. ClusterStoreSpec
  // pins split+merge in one epoch, external-hub root absorption,
  // committed-replay no-op, insert admission, tombstone permanence,
  // and compaction folding.
  // ---------------------------------------------------------------------
  def q161ClusterUpsert(s: SparkSession, d: String): DataFrame = {
    val dir = cachedIndexDir("cluster-store-upsert", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val ch = clusterChunksOf(s, d)
      graft.scale.ClusterStore.build(ch.filter(col("doc_id") % 4 === 0), p)
      (1 to 3).foreach { i =>
        graft.scale.ClusterStore.append(ch.filter(col("doc_id") % 4 === i), p)
      }
      val revisedDocs = documents(s, d).filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
      graft.scale.ClusterStore.upsert(
        chunksOfDocs(revisedDocs).select(col("doc_id"), col("chunk_hash")), p)
      require(graft.scale.ClusterStore.consistent(s, p),
        "cluster store failed its consistency probes after upsert")
    }
    graft.scale.ClusterStore.assignments(s, dir)
      .withColumn("is_canonical",
        (col("doc_id") === col("rep")).cast("int"))
      .orderBy(col("doc_id"))
  }
  val q161Sql: String = clusterStoreSqlOver("TRUE",
    liveBody = """SELECT doc_id,
      |    CASE WHEN doc_id % 9 = 0
      |      THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
      |      ELSE text END AS text
      |  FROM documents""".stripMargin)

  // ---------------------------------------------------------------------
  // q160 — DOCUMENT REVISION on the citation index (CitationIndex.
  // upsert): the hardest revision verb in the index family, because a
  // revised text moves term df in BOTH directions in one batch —
  // every old-generation term loses a doc, every new-generation term
  // gains one, and each touched term must take exactly the right band
  // transition (enter with reach-back, die, fall sub-band, revive
  // from purgatory, go deep) under the same signed-delta algebra
  // append and delete maintain one direction at a time. Rev-stamped
  // postings/pairs + the _cit_rev registry (written LAST) flip reads
  // to the new generation by stamp equality; superseded rows die
  // unrewritten and fold at compaction. The query builds on the full
  // corpus, upserts the doc_id%9==0 slice with token-order-reversed
  // text (every shingle changes), and reads weighted edges; the
  // oracle derives from-scratch edges over the REVISED corpus — the
  // hash match IS the upsert ≡ rebuild-from-revised proof.
  // CitationUpsertSpec additionally pins the four band transitions in
  // one batch, the deep guard, torn-upsert healing, and compaction
  // folding superseded generations.
  // ---------------------------------------------------------------------
  def q160CitationUpsertEdges(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val dir = cachedIndexDir("citation-upsert", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val revised = docs.filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text"),
          col("text").as("prev_text"))
      graft.scale.CitationIndex.build(docs, p, slack = revised.count())
      graft.scale.CitationIndex.upsert(revised, p, rev = 1L)
    }
    graft.scale.CitationIndex.edgesWeighted(s, dir)
      .orderBy(col("src"), col("dst"))
  }
  val q160Sql: String =
    s"""WITH docs2 AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 9 = 0
       |      THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
       |      ELSE text END AS text
       |  FROM documents),
       |${citationPostCtesOver("TRUE", table = "docs2")}
       |SELECT a.doc_id AS src, b.doc_id AS dst,
       |  count(*)::BIGINT AS w
       |FROM post a JOIN post b
       |  ON a.term = b.term AND a.doc_id > b.doc_id
       |GROUP BY 1, 2 ORDER BY src, dst""".stripMargin

  // ---------------------------------------------------------------------
  // q159 — VECTOR REVISION on the IVF+PQ index (IvfPqIndex.upsert):
  // q158's CDC verb on the compressed layout, under BOTH frozen
  // artifacts at once — revised vectors re-assign against the original
  // coarse centroids AND re-encode under the STORED codebooks (revised
  // codes under any other codebook would be garbage next to the main
  // layout's). Rev code rows land in `_pq_rev_rows/cluster_id=N/`
  // (cluster migration allowed), the `_pq_rev` registry flips probes to
  // the new generation, and the serving read still scans m-byte codes
  // only — the revision path never fattens the layout back to
  // embeddings. Oracle replays q90's composition with the corpus-side
  // CTEs (assignment + encode cells) over the revised table while
  // codebooks/queries/centroids stay original — hash equality proves
  // upsert ≡ rebuilt-from-revised-under-original-codebooks.
  // IvfPqIndexSpec pins migration, replay healing, monotone refusal,
  // and build-over reset.
  // ---------------------------------------------------------------------
  def q159IvfPqUpsertProbe(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    val dir = cachedIndexDir("ivfpq-index-upsert", d, "v1") { p =>
      graft.scale.IvfPqIndex.build(emb, centroids, p, centroidCount = cc)
      val revised = emb.filter(col("vec_id") % 9 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      graft.scale.IvfPqIndex.upsert(revised, centroids, p, rev = 1L,
        centroidCount = cc)
    }
    graft.scale.IvfPqIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 10, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }
  val q159Sql: String = {
    // each rewrite must actually fire — a drifted q90Sql would
    // otherwise silently leave this oracle testing the UNrevised corpus
    def rw(s: String, from: String, to: String): String = {
      val out = s.replace(from, to)
      require(out != s, s"q159Sql rewrite target not found: $from")
      out
    }
    val withPrelude = rw(q90Sql, "WITH cent AS (",
      """WITH emb2 AS MATERIALIZED (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 9 = 0 THEN list_reverse(embedding)
        |      ELSE embedding END AS embedding
        |  FROM embeddings),
        |q2 AS (
        |  SELECT vec_id, (i - 1) // 8 AS s, (i - 1) % 8 AS j,
        |    CAST(floor(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS eq
        |  FROM emb2, LATERAL (SELECT unnest(range(1, 65)) AS i) r),
        |cent AS (""".stripMargin)
    val withCorpus =
      rw(withPrelude, "FROM embeddings a, cent c)", "FROM emb2 a, cent c)")
    rw(withCorpus,
      """  FROM q d JOIN pqc c ON c.s = d.s AND c.j = d.j
        |  GROUP BY 1, 2, 3),
        |codes AS (""".stripMargin,
      """  FROM q2 d JOIN pqc c ON c.s = d.s AND c.j = d.j
        |  GROUP BY 1, 2, 3),
        |codes AS (""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // q174 — SNAPSHOT READS on the citation index (CitationIndex
  // .edgesWeightedAsOf): the q164 story extended beyond the cluster
  // store — a reproducible-training pipeline pins ALL its index state,
  // not just dedup clusters. One index lives through the full verb
  // history (build 80% → append 20% → upsert %9 → delete %7; epochs
  // 0..3), then q174 reads the edge set AS OF epoch 1 — the full
  // corpus exactly as it stood before the revision and the takedown
  // ever happened. Every non-commit row is batch-keyed and gates
  // through its batch's commit epoch, so the snapshot costs two
  // narrow filters + one key semi-join, never a copy; torn residue is
  // invisible at its own epoch by construction (its commit row never
  // landed there — CitationAsOfSpec pins this plus the compactTo
  // vacuum). The oracle derives from-scratch weighted edges over the
  // ORIGINAL full corpus; the hash match proves epochs 2-3 are
  // invisible to the snapshot even though their rows sit in the same
  // files. Downstream composes freely: warm PageRank over
  // edgesAsOf(E) is "rank the citation graph as of snapshot E".
  // ---------------------------------------------------------------------
  /** The full-history citation index q174/q175 serve from (epochs
    * 0..3, all four verbs in production order). */
  private def citationAsOfDir(s: SparkSession, d: String): String = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    cachedIndexDir("citation-asof", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val revised = docs.filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text"),
          col("text").as("prev_text"))
      val victims = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 0,
            concat_ws(" ", reverse(split(col("text"), " "))))
            .otherwise(col("text")).as("text"))
      graft.scale.CitationIndex.build(
        docs.filter(col("doc_id") % 5 =!= 4), p,
        slack = revised.count() + victims.count())          // epoch 0
      graft.scale.CitationIndex.append(
        docs.filter(col("doc_id") % 5 === 4), p)            // epoch 1
      graft.scale.CitationIndex.upsert(revised, p, rev = 1L) // epoch 2
      graft.scale.CitationIndex.delete(victims, p)          // epoch 3
      require(graft.scale.CitationIndex.consistent(s, p),
        "citation index failed its consistency probes after the CDC cycle")
      require(graft.scale.CitationIndex.committedEpoch(s, p) == 3L,
        "as-of fixture must commit exactly epochs 0..3 (q174 pins asOf=1)")
    }
  }

  def q174CitationAsOf(s: SparkSession, d: String): DataFrame =
    graft.scale.CitationIndex.edgesWeightedAsOf(s, citationAsOfDir(s, d),
        asOf = 1L)
      .orderBy(col("src"), col("dst"))
  val q174Sql: String =
    s"""WITH $citationPostCtes
       |SELECT a.doc_id AS src, b.doc_id AS dst,
       |  count(*)::BIGINT AS w
       |FROM post a JOIN post b
       |  ON a.term = b.term AND a.doc_id > b.doc_id
       |GROUP BY 1, 2 ORDER BY src, dst""".stripMargin

  // ---------------------------------------------------------------------
  // q175 — CHANGE DATA FEED on the citation index (CitationIndex
  // .emitChangeFeed): q167's writer-side CDC primitive on the edge
  // graph. Each committed epoch's edge delta derives post-hoc at
  // O(affected) — the candidate set seeds from exactly the rows that
  // epoch committed (new pair rows, flipped dead/sub terms,
  // tombstoned or revised endpoints) and both diff sides resolve
  // RESTRICTED to those (src, dst) — and persists under feedDir/e=N,
  // self-healing across crashes. The oracle runs FOUR from-scratch
  // edge derivations (one per epoch state) and unions the three truth
  // diffs; the hash match proves every epoch's O(affected) delta is
  // COMPLETE (no changed edge escapes the candidate set) and exact,
  // weights and labels included. CitationAsOfSpec additionally pins
  // the restore contract: baseline snapshot + replayed deltas ≡ the
  // final edge set.
  // ---------------------------------------------------------------------
  def q175CitationChangeFeed(s: SparkSession, d: String): DataFrame = {
    val store = citationAsOfDir(s, d)
    val feed = cachedIndexDir("citation-feed", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.CitationIndex.emitChangeFeed(s, store, p, baseline = 0L)
    }
    graft.scale.CitationIndex.changeFeed(s, feed)
      .select(col("e"), col("src"), col("dst"),
        coalesce(col("old_w"), lit(-1L)).as("old_w"),
        coalesce(col("new_w"), lit(-1L)).as("new_w"),
        col("change"))
      .orderBy(col("e"), col("src"), col("dst"))
  }
  val q175Sql: String = {
    def edgesCte(p: String) =
      s"""${p}edges AS MATERIALIZED (
         |  SELECT a.doc_id AS src, b.doc_id AS dst, count(*)::BIGINT AS w
         |  FROM ${p}post a JOIN ${p}post b
         |    ON a.term = b.term AND a.doc_id > b.doc_id
         |  GROUP BY 1, 2)""".stripMargin
    val states = Seq(
      citationPostCtesOver("doc_id % 5 <> 4", "c0_"),
      citationPostCtesOver("TRUE", "c1_"),
      citationPostCtesOver("TRUE", "c2_", table = "docs2"),
      citationPostCtesOver("doc_id % 7 <> 0", "c3_", table = "docs2"))
      .zipWithIndex
      .map { case (ctes, i) => s"$ctes,\n${edgesCte(s"c${i}_")}" }
      .mkString(",\n")
    val diffs = (1 to 3).map { n =>
      s"""SELECT $n::BIGINT AS e,
         |  coalesce(a.src, b.src) AS src, coalesce(a.dst, b.dst) AS dst,
         |  coalesce(a.w, -1)::BIGINT AS old_w,
         |  coalesce(b.w, -1)::BIGINT AS new_w,
         |  CASE WHEN a.src IS NULL THEN 'added'
         |       WHEN b.src IS NULL THEN 'removed'
         |       ELSE 'reweighted' END AS change
         |FROM c${n - 1}_edges a FULL OUTER JOIN c${n}_edges b
         |  ON a.src = b.src AND a.dst = b.dst
         |WHERE a.src IS NULL OR b.src IS NULL OR a.w <> b.w"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH docs2 AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 9 = 0
       |      THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
       |      ELSE text END AS text
       |  FROM documents),
       |$states
       |SELECT * FROM (
       |$diffs
       |) ORDER BY e, src, dst""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q176 — k-D Z-ORDER (Layout.zValueK / zIntervalsK at k = 3): the
  // production lakehouse ask is rarely 2-D — time × user × shard is
  // the common three-column clustering — and q99's exactness proof
  // must survive the generalization. Events bucket to (user mod 256,
  // epoch-minute mod 256, event mod 256), interleave to a 24-bit
  // 3-D Morton value, and the Spark side selects an axis-aligned BOX
  // purely through the 2^k-tree interval cover (an OR of 26 z ranges
  // — NO per-dimension predicates anywhere), while the oracle states
  // the plain 3-D box predicate over a bit-for-bit z replay. Hash
  // equality = data-level proof the k-D cover is EXACT, so
  // boxScanTightK's serving reads can drop residual filters at any
  // k. The 2-D API is the k = 2 case of the same engine
  // (bit-identical — ZOrderSpec pins it), so existing layouts cannot
  // drift; ZOrderSpec also pins the k = 3 exactness property on
  // randomized boxes and the CDC verbs composing on a k = 3 layout.
  // ---------------------------------------------------------------------
  def q176ZOrder3d(s: SparkSession, d: String): DataFrame = {
    val ivs = graft.scale.Layout.zIntervalsK(
      Seq(16L, 32L, 8L), Seq(31L, 63L, 199L))
    events(s, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(256L)).as("xb"),
        pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"),
        pmod(col("event_id"), lit(256L)).as("wb"))
      .withColumn("z", graft.scale.Layout.zValueK(
        Seq(col("xb"), col("yb"), col("wb"))))
      // the round-17 janino fallback lived HERE: 26 cover intervals ×
      // the inline 24-bit interleave re-generated per OR branch grew
      // the fused global count past 64 KB and the stage silently ran
      // interpreted. One loop-shaped predicate keeps the generated
      // bytes O(1) in the interval count — CacheHygieneSpec now
      // asserts zero CodeGenerator errors over the full catalogue.
      .filter(graft.functions.InIntervals(col("z"), ivs))
      .orderBy(col("event_id"))
  }
  val q176Sql: String = {
    val zExpr = (0 until 8).flatMap { i =>
      Seq(s"(((xb >> $i) & 1) << ${3 * i})",
        s"(((yb >> $i) & 1) << ${3 * i + 1})",
        s"(((wb >> $i) & 1) << ${3 * i + 2})")
    }.mkString(" | ")
    s"""WITH b AS (
       |  SELECT event_id, user_id % 256 AS xb,
       |    (epoch_ms(ts) // 60000) % 256 AS yb,
       |    event_id % 256 AS wb
       |  FROM events)
       |SELECT event_id, xb, yb, wb, CAST($zExpr AS BIGINT) AS z
       |FROM b WHERE xb BETWEEN 16 AND 31 AND yb BETWEEN 32 AND 63
       |  AND wb BETWEEN 8 AND 199
       |ORDER BY event_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q177 — CENTROID-DRIFT METRIC on the IVF index (IvfIndex
  // .quantErrors / driftRatio / needsRebuild): the frozen-centroids
  // contract's docstrings promised "drift = a rebuild decision" —
  // this is the machinery that MAKES the decision measurable. The
  // fixture builds over the full embeddings table (centroids = the
  // first 16 vectors, frozen) and appends a PLANTED-DRIFT batch:
  // 4x-scaled copies under fresh ids — scaling by a power of two is
  // EXACT in float arithmetic, so the oracle replays the plant
  // bit-for-bit. The query serves the metric's defining aggregate per
  // segment: own-centroid quantization error in exact integer space
  // (embeddings quantize once to floor(x·1e6) longs, distances are
  // exact integer sums — the q76/q82 recipe), read through the
  // index's CURRENT-GENERATION corpus. The hash match proves (1) the
  // CDC corpus read is exact and (2) the drift observable is
  // bit-reproducible cross-engine — a drift signal that wobbles with
  // reduction order would manufacture phantom rebuilds. The appended
  // segment's mean error is many multiples of the build segment's
  // (the ratio driftRatio reports and needsRebuild thresholds —
  // IvfDriftSpec pins monotone response to planted drift, baseline
  // reset at rebuild, and the PQ-codebook twin IvfPqIndex.driftRatio).
  // ---------------------------------------------------------------------
  private def ivfDriftCents(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))

  private def ivfDriftDir(s: SparkSession, d: String): String = {
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    // "v2": quantization-error baseline switched to the own-centroid
    // definition — a v1 meta carries min-over-all-k sums and must
    // rebuild once
    cachedIndexDir("ivf-drift", d, "v2",
      datasets = Seq("embeddings.parquet")) { p =>
      graft.scale.IvfIndex.build(emb, ivfDriftCents(s, d), p)
      // the plant: 4x-scaled copies (exact float op) under fresh ids
      graft.scale.IvfIndex.append(
        emb.select((col("vec_id") + lit(10000000L)).as("vec_id"),
          transform(col("embedding"),
            e => (e * lit(4.0f)).cast("float")).as("embedding")),
        ivfDriftCents(s, d), p)
    }
  }

  def q177IvfDrift(s: SparkSession, d: String): DataFrame =
    graft.scale.IvfIndex.quantErrors(s, ivfDriftDir(s, d),
        ivfDriftCents(s, d))
      .select(
        when(col("vec_id") >= 10000000L, lit("appended"))
          .otherwise(lit("build")).as("segment"),
        col("d2"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_vec"), sum(col("d2")).as("qerr_sum"))
      .orderBy(col("segment"))
  val q177Sql: String = {
    val d2 = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(range(1, 65), " +
      "j -> (v.qv[j] - c.cv[j]) * (v.qv[j] - c.cv[j]))), (a, b) -> a + b)"
    // own-centroid definition (round-16 verdict item 2): replay the
    // float argmin ASSIGNMENT (duckDist2, tie-broken by centroid id —
    // exactly Similarity.assign's min-struct), then the exact integer
    // error against the ASSIGNED centroid only
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, embedding AS c_emb,
       |    list_transform(embedding,
       |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS cv
       |  FROM embeddings WHERE vec_id < 16),
       |corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000000,
       |    list_transform(embedding, x -> CAST(x * 4 AS FLOAT))
       |  FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, c.cid, row_number() OVER (
       |      PARTITION BY v.vec_id
       |      ORDER BY ${duckDist2("v.embedding", "c.c_emb")} ASC,
       |        c.cid ASC) AS rk
       |    FROM corpus v, cents c) t WHERE rk = 1),
       |qv AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)) AS qv
       |  FROM corpus),
       |errs AS (
       |  SELECT v.vec_id, $d2 AS d2
       |  FROM qv v JOIN assigned a USING (vec_id)
       |  JOIN cents c ON c.cid = a.cid)
       |SELECT CASE WHEN vec_id >= 10000000 THEN 'appended'
       |  ELSE 'build' END AS segment,
       |  count(*) AS n_vec, CAST(sum(d2) AS BIGINT) AS qerr_sum
       |FROM errs GROUP BY 1 ORDER BY segment""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q178 — WARM-START MULTILEVEL Louvain (Graph.
  // modularityCommunitiesMultilevelResumeQ): q153 closed the
  // "PageRank warm-starts but Louvain recomputes" asymmetry for the
  // single-level sweep; the MULTILEVEL loop still restarted every
  // level from identity labels. Now each level resumes from the
  // cached label map of yesterday's sweep AT THAT LEVEL: level-l node
  // ids are level-(l−1) community ids (min-member labels — stable for
  // unchanged communities), so stored labels apply verbatim where the
  // structure held and drift to self exactly where it moved; degrees
  // and 2m re-derive from today's (coarsened) graphs per level, so
  // the priors shorten each level's descent without freezing stale
  // merges. Phase 1 caches BOTH level maps of yesterday's subgraph
  // (doc %10 != 9, 2 rounds × 2 levels) beside the edge table;
  // phase 2 — the per-ingest query — resumes the full graph for ONE
  // round per level. The oracle replays all four sweeps verbatim
  // (cold level 1+2 on the old slice, warm level 1+2 on the full
  // graph, per-graph 2m, weighted coarsening with doubled
  // self-loops). GraphSpec pins rounds=0 ≡ cached answer, the
  // prior-seeded integer replay, and strictly fewer warm rounds to
  // the cold fixed point on a small-delta append.
  // ---------------------------------------------------------------------
  def q178LouvainMultilevelWarm(s: SparkSession, d: String): DataFrame = {
    val eAll = citationEdgesCached(s, d).select(col("src"), col("dst"))
    val eOld = eAll.filter(col("src") % 10 =!= 9 && col("dst") % 10 =!= 9)
    val priorDir = cachedIndexDir("citation-mlabels", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val (_, levels) = graft.scale.Graph
        .modularityCommunitiesMultilevelLevelsQ(eOld, rounds = 2, levels = 2)
      levels(0).coalesce(1).write.mode("overwrite").parquet(s"$p/l1")
      levels(1).coalesce(1).write.mode("overwrite").parquet(s"$p/l2")
    }
    graft.scale.Graph.modularityCommunitiesMultilevelResumeQ(
        eAll, rounds = 1, levels = 2,
        priors = Seq(s.read.parquet(s"$priorDir/l1"),
          s.read.parquet(s"$priorDir/l2")))
      .orderBy(col("node"))
  }
  val q178Sql: String = {
    // q139's weighted local-move rounds with the 2m name parameterized
    // (two GRAPHS are in play here — old slice and full — so 2m is
    // per-graph, not global)
    def wroundsT(iters: Int, p: String, tm: String): String =
      (1 to iters).map { t =>
        val q = t - 1
        s"""${p}s$t AS (SELECT l.comm AS cand, sum(d.k) AS sigma
           |  FROM ${p}l$q l JOIN ${p}degs d USING (node) GROUP BY 1),
           |${p}k$t AS (SELECT s.u AS node, l.comm AS cand, sum(s.wt) AS kic
           |  FROM ${p}sym s JOIN ${p}l$q l ON s.v = l.node
           |  WHERE s.u <> s.v GROUP BY 1, 2),
           |${p}c$t AS (SELECT node, cand, max(kic) AS kic FROM (
           |  SELECT k.node, k.cand, k.kic FROM ${p}k$t k
           |    JOIN ${p}l$q l USING (node) WHERE k.cand <= l.comm
           |  UNION ALL SELECT node, comm AS cand, 0 AS kic FROM ${p}l$q)
           |  GROUP BY 1, 2),
           |${p}l$t AS MATERIALIZED (SELECT node, cand AS comm FROM (
           |  SELECT c.node, c.cand, row_number() OVER (PARTITION BY c.node
           |    ORDER BY ($tm.m2 * c.kic - d.k * (g.sigma -
           |      CASE WHEN c.cand = l.comm THEN d.k ELSE 0 END)) DESC,
           |      c.cand ASC) AS rn
           |  FROM ${p}c$t c JOIN ${p}degs d USING (node)
           |    JOIN ${p}l$q l USING (node)
           |    JOIN ${p}s$t g ON g.cand = c.cand, $tm) WHERE rn = 1)"""
          .stripMargin
      }.mkString(",\n")
    s"""WITH $citationPostCtes,
       |$citationDedgesCte,
       |aedges AS MATERIALIZED (SELECT src, dst FROM dedges
       |  WHERE src % 10 <> 9 AND dst % 10 <> 9),
       |asym AS MATERIALIZED (
       |  SELECT src AS u, dst AS v, CAST(1 AS BIGINT) AS wt FROM aedges
       |  UNION ALL SELECT dst, src, CAST(1 AS BIGINT) FROM aedges),
       |adegs AS MATERIALIZED (
       |  SELECT u AS node, sum(wt) AS k FROM asym GROUP BY 1),
       |atm AS MATERIALIZED (SELECT sum(wt) AS m2 FROM asym),
       |al0 AS MATERIALIZED (SELECT node, node AS comm FROM adegs),
       |${wroundsT(2, "a", "atm")},
       |bsym AS MATERIALIZED (
       |  SELECT la.comm AS u, lb.comm AS v, sum(s.wt) AS wt
       |  FROM asym s JOIN al2 la ON s.u = la.node
       |    JOIN al2 lb ON s.v = lb.node GROUP BY 1, 2),
       |bdegs AS MATERIALIZED (
       |  SELECT u AS node, sum(wt) AS k FROM bsym GROUP BY 1),
       |bl0 AS MATERIALIZED (SELECT node, node AS comm FROM bdegs),
       |${wroundsT(2, "b", "atm")},
       |wsym AS MATERIALIZED (
       |  SELECT src AS u, dst AS v, CAST(1 AS BIGINT) AS wt FROM dedges
       |  UNION ALL SELECT dst, src, CAST(1 AS BIGINT) FROM dedges),
       |wdegs AS MATERIALIZED (
       |  SELECT u AS node, sum(wt) AS k FROM wsym GROUP BY 1),
       |wtm AS MATERIALIZED (SELECT sum(wt) AS m2 FROM wsym),
       |wl0 AS MATERIALIZED (SELECT d.node, coalesce(p.comm, d.node) AS comm
       |  FROM wdegs d LEFT JOIN al2 p ON d.node = p.node),
       |${wroundsT(1, "w", "wtm")},
       |xsym AS MATERIALIZED (
       |  SELECT la.comm AS u, lb.comm AS v, sum(s.wt) AS wt
       |  FROM wsym s JOIN wl1 la ON s.u = la.node
       |    JOIN wl1 lb ON s.v = lb.node GROUP BY 1, 2),
       |xdegs AS MATERIALIZED (
       |  SELECT u AS node, sum(wt) AS k FROM xsym GROUP BY 1),
       |xl0 AS MATERIALIZED (SELECT d.node, coalesce(p.comm, d.node) AS comm
       |  FROM xdegs d LEFT JOIN bl2 p ON d.node = p.node),
       |${wroundsT(1, "x", "wtm")}
       |SELECT w.node, x.comm FROM wl1 w JOIN xl1 x ON w.comm = x.node
       |ORDER BY w.node""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q179 — SNAPSHOT READS on the LSH dedup index (LshIndex
  // .dedupBatchAsOf): the q164/q174 reproducible-training pin on the
  // THIRD index family. One index lives through q170's full verb
  // history (build 80% → append 20% → upsert %9 → delete %7; epochs
  // 0..3) and q179 probes it AS OF epoch 1 — the full original corpus
  // before the revision and the take-down ever happened. Machinery:
  // the three epoch tables (docs/tombstones/registry) carry commit
  // epochs, and a doc's per-snapshot commit point is its SIG ROW
  // (append's last data write) — so torn-append id residue is
  // invisible to snapshots until the replay completes it
  // (LshAsOfSpec stages the tear and pins both invisibility and the
  // forward heal, plus every epoch's probe ≡ a fresh index built over
  // that epoch's corpus, and compactTo as the history vacuum). The
  // oracle is q113's full portable-MinHash replay over the ORIGINAL
  // corpus — the hash match proves epochs 2-3 are invisible to the
  // snapshot even though their rows share the files.
  // ---------------------------------------------------------------------
  private def lshAsOfFixture(s: SparkSession, d: String): String = {
    val docs = documents(s, d)
    cachedIndexDir("lsh-asof", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      val corpus = docs.filter(col("doc_id") < 400)
      graft.scale.LshIndex.build(
        corpus.filter(col("doc_id") % 5 =!= 4), p)         // epoch 0
      graft.scale.LshIndex.append(
        corpus.filter(col("doc_id") % 5 === 4), p)         // epoch 1
      val revised = corpus.filter(col("doc_id") % 9 === 0)
        .withColumn("text",
          concat_ws(" ", reverse(split(col("text"), " "))))
      graft.scale.LshIndex.upsert(revised, p, rev = 1L)    // epoch 2
      graft.scale.LshIndex.delete(
        corpus.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id")), p)                       // epoch 3
      require(graft.scale.LshIndex.consistent(s, p),
        "LSH index failed its consistency probes after the CDC cycle")
      require(graft.scale.LshIndex.committedEpoch(s, p) == 3L,
        "as-of fixture must commit exactly epochs 0..3 (q179 pins asOf=1)")
    }
  }

  def q179LshAsOf(s: SparkSession, d: String): DataFrame = {
    val dir = lshAsOfFixture(s, d)
    graft.scale.LshIndex
      .dedupBatchAsOf(s, dir,
        documents(s, d).filter(col("doc_id") >= 400),
        minMatches = 8, asOf = 1L)
      .orderBy(col("new_doc"), col("corpus_doc"))
  }
  val q179Sql: String = q113Sql

  // ---------------------------------------------------------------------
  // q180 — SNAPSHOT READS on the BM25 index (BmIndex.topKAsOf): the
  // fourth index family gains time travel, and this one carries the
  // obligation the others don't — SCORES depend on corpus statistics
  // (idf on n_docs, length normalization on avgdl), so a snapshot
  // read must reproduce the HISTORICAL statistics exactly, not just
  // the historical posting set. Machinery: a `_bm_epochs` ledger row
  // (e, n_docs, sum_dl) is each verb's LAST write — one tiny row per
  // epoch records the exact post-verb statistics, so historical
  // idf/avgdl are a one-row read, never a re-aggregation, and a torn
  // verb never advances the snapshot counter. Postings gate by their
  // doc's commit epoch + the registry rows at ≤ asOf; tombstones at
  // ≤ asOf. One index lives through q169's lifecycle (build 80% →
  // append 20% → upsert %9 → delete %7; epochs 0..3) and q180 serves
  // top-15 AS OF epoch 1 — the full original corpus — hash-matching
  // q92's plain full-corpus oracle, scores included: epochs 2-3
  // invisible, statistics bit-exact. BmAsOfSpec pins every epoch ≡ a
  // fresh index built over that epoch's corpus, the staged tear, and
  // compactTo as the vacuum.
  // ---------------------------------------------------------------------
  private def bmAsOfFixture(s: SparkSession, d: String): String = {
    val docs = documents(s, d)
    cachedIndexDir("bm-asof", d, "v1",
      datasets = Seq("documents.parquet")) { p =>
      graft.scale.BmIndex.build(docs.filter(col("doc_id") % 5 =!= 4), p)
      graft.scale.BmIndex.append(docs.filter(col("doc_id") % 5 === 4), p)
      val revised = docs.filter(col("doc_id") % 9 === 0)
        .withColumn("text", concat_ws(" ",
          filter(split(col("text"), " "), (_, i) => i % 2 === 0)))
      graft.scale.BmIndex.upsert(revised, p, rev = 1L)
      graft.scale.BmIndex.delete(
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")), p)
      require(graft.scale.BmIndex.consistent(s, p),
        "BM25 index failed its consistency probes after the CDC cycle")
      require(graft.scale.BmIndex.committedEpoch(s, p) == 3L,
        "as-of fixture must commit exactly epochs 0..3 (q180 pins asOf=1)")
    }
  }

  def q180Bm25AsOf(s: SparkSession, d: String): DataFrame = {
    val dir = bmAsOfFixture(s, d)
    graft.scale.BmIndex.topKAsOf(s, dir, doc1Terms(s, d), k = 15, asOf = 1L)
  }
  val q180Sql: String = q92Sql

  // ---------------------------------------------------------------------
  // q181 — SNAPSHOT READS on the IVF vector index (IvfIndex.topKAsOf):
  // the FIFTH index family gains time travel, closing the gap round-15
  // called out ("the embedding index is precisely the one a 'run X
  // used ANN state E' audit asks about"). Machinery: an id→epoch
  // registry (`_ivf_docs`, written FIRST by append so a tear leaves
  // phantom rows that gate in nothing), epoch stamps on tombstones and
  // the revision registry, all gated under the probe's partition
  // filter; legacy rows read as epoch 0; rebuild is the vacuum. One
  // index lives through q168's lifecycle (build 80% → append 20% →
  // re-embed %9 → delete %7; epochs 0..3) and q181 serves top-5 AS OF
  // epoch 1 — the full original corpus before the revision and the
  // take-down — hash-matching q35's plain full-corpus oracle.
  // IvfAsOfSpec pins every epoch ≡ a fresh index over that epoch's
  // corpus under the frozen centroids, the staged tear + heal, and
  // rebuild as the history vacuum.
  // ---------------------------------------------------------------------
  private def ivfAsOfFixture(s: SparkSession, d: String): String = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    cachedIndexDir("ivf-asof", d, "v1") { p =>
      graft.scale.IvfIndex.build(
        emb.filter(col("vec_id") % 5 =!= 4), centroids, p,
        centroidCount = cc)                                // epoch 0
      graft.scale.IvfIndex.append(
        emb.filter(col("vec_id") % 5 === 4), centroids, p,
        centroidCount = cc)                                // epoch 1
      val revised = emb.filter(col("vec_id") % 9 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      graft.scale.IvfIndex.upsert(revised, centroids, p, rev = 1L,
        centroidCount = cc)                                // epoch 2
      graft.scale.IvfIndex.delete(
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), p)
      require(graft.scale.IvfIndex.committedEpoch(s, p) == 3L,
        "as-of fixture must commit exactly epochs 0..3 (q181 pins asOf=1)")
    }
  }

  def q181IvfAsOf(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val dir = ivfAsOfFixture(s, d)
    graft.scale.IvfIndex
      .topKAsOf(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 5, asOf = 1L, nProbe = 3)
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }
  val q181Sql: String = q35Sql

  // ---------------------------------------------------------------------
  // q182 — SNAPSHOT READS on the IVF+PQ code index
  // (IvfPqIndex.topKAsOf): the SIXTH family, under BOTH frozen
  // artifacts at once — history shares the coarse centroids AND the
  // stored codebooks trivially (codes are meaningless under any
  // others), so a snapshot is purely a membership/generation gate over
  // m-byte code rows: `_pq_docs` commit epochs for appends, the
  // registry at ≤ asOf for revisions, tombstones at ≤ asOf for
  // take-downs. One index lives through q171's lifecycle (epochs
  // 0..3); q182 serves ADC top-10 AS OF epoch 1 — the full original
  // corpus — hash-matching q90's plain full-corpus oracle.
  // IvfPqAsOfSpec pins every epoch ≡ a fresh build over that epoch's
  // corpus under identical artifacts, the staged tear + heal, and
  // build-from-source as the vacuum.
  // ---------------------------------------------------------------------
  private def ivfPqAsOfFixture(s: SparkSession, d: String): String = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    cachedIndexDir("ivfpq-asof", d, "v1") { p =>
      graft.scale.IvfPqIndex.build(
        emb.filter(col("vec_id") % 5 =!= 4), centroids, p,
        centroidCount = cc,
        codebooks = Some(graft.scale.Similarity.pqInitCodebooks(emb)))
      graft.scale.IvfPqIndex.append(
        emb.filter(col("vec_id") % 5 === 4), centroids, p,
        centroidCount = cc)                                // epoch 1
      val revised = emb.filter(col("vec_id") % 9 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      graft.scale.IvfPqIndex.upsert(revised, centroids, p, rev = 1L,
        centroidCount = cc)                                // epoch 2
      graft.scale.IvfPqIndex.delete(
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), p)
      require(graft.scale.IvfPqIndex.committedEpoch(s, p) == 3L,
        "as-of fixture must commit exactly epochs 0..3 (q182 pins asOf=1)")
    }
  }

  def q182IvfPqAsOf(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val dir = ivfPqAsOfFixture(s, d)
    graft.scale.IvfPqIndex
      .topKAsOf(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 10, asOf = 1L, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }
  val q182Sql: String = q90Sql

  // ---------------------------------------------------------------------
  // q187/q188 — CHANGE DATA FEEDS on the IVF and IVF+PQ indexes,
  // closing the feed matrix at 7/7 serving layouts: with the round-16
  // id→epoch registries in place, "which vec ids' ANN state changed
  // this epoch" derives post-hoc exactly like q185/q186 — inserts
  // confirmed against landed data rows (a torn append's phantom epoch
  // emits empty), revisions from the registry, deletions from the
  // tombstones. Both ride the q181/q182 lifecycle fixtures and
  // hash-match the slice algebra directly. The fold here is rebuild /
  // build-from-source (directory replacement) — emit before it.
  // ---------------------------------------------------------------------
  def q187IvfChangeFeed(s: SparkSession, d: String): DataFrame = {
    val dir = ivfAsOfFixture(s, d)
    graft.scale.IvfIndex.emitChangeFeed(s, dir, s"$dir/_cdc_feed")
    graft.scale.IvfIndex.changeFeed(s, s"$dir/_cdc_feed")
      .orderBy(col("e"), col("vec_id"))
  }
  val q187Sql: String =
    """SELECT vec_id, 'inserted' AS change, CAST(NULL AS BIGINT) AS rev,
      |  CAST(1 AS BIGINT) AS e FROM embeddings WHERE vec_id % 5 = 4
      |UNION ALL
      |SELECT vec_id, 'revised', CAST(1 AS BIGINT), CAST(2 AS BIGINT)
      |  FROM embeddings WHERE vec_id % 9 = 0
      |UNION ALL
      |SELECT vec_id, 'deleted', CAST(NULL AS BIGINT), CAST(3 AS BIGINT)
      |  FROM embeddings WHERE vec_id % 7 = 0
      |ORDER BY e, vec_id""".stripMargin

  def q188IvfPqChangeFeed(s: SparkSession, d: String): DataFrame = {
    val dir = ivfPqAsOfFixture(s, d)
    graft.scale.IvfPqIndex.emitChangeFeed(s, dir, s"$dir/_cdc_feed")
    graft.scale.IvfPqIndex.changeFeed(s, s"$dir/_cdc_feed")
      .orderBy(col("e"), col("vec_id"))
  }
  val q188Sql: String = q187Sql

  // ---------------------------------------------------------------------
  // q183/q184 — SNAPSHOT READS + CHANGE DATA FEED on the z-order
  // layout, closing the time-travel matrix at 7/7 families. Fixture:
  // one layout lives through build(%3=0) → idempotent-append(%3=1) →
  // idempotent-append(%3=2) → upsert(%9=0, yb shifted 128) →
  // delete(%7=0) — epochs 0..4, every verb epoch-stamped (`_z_docs`
  // id→epoch registry written FIRST by the append, `_z_rev`/`_z_tombs`
  // stamps). q183 serves the q99 tight box read AS OF epoch 2 — the
  // full original corpus before the revision and the take-down —
  // hash-matching q99's plain full-table oracle (epochs 3-4 invisible
  // even though their rows share the bucket dirs). q184 emits the
  // layout's change feed and hash-matches the slice algebra directly:
  // per-epoch id-level deltas derived post-hoc from the epoch stamps
  // at O(affected). ZAsOfSpec pins every epoch ≡ model, the restore
  // contract, feed idempotence, the staged tear (phantom epoch serves
  // nothing, emits nothing), and compaction as the history vacuum.
  // ---------------------------------------------------------------------
  private def zAsOfFixture(s: SparkSession, d: String): String =
    cachedIndexDir("zorder-asof", d, "v1",
      datasets = Seq("events.parquet")) { p =>
      val ev = events(s, d)
        .select(col("event_id"),
          pmod(col("user_id"), lit(256L)).as("xb"),
          pmod(expr("unix_millis(ts) div 60000"), lit(256L)).as("yb"))
      graft.scale.Layout.writeZOrdered(
        ev.filter(col("event_id") % 3 === 0), col("xb"), col("yb"),
        s"$p/base")                                        // epoch 0
      (1 to 2).foreach { i =>                              // epochs 1, 2
        graft.scale.Layout.appendZOrderedIdempotentK(
          ev.filter(col("event_id") % 3 === i), "event_id",
          Seq(col("xb"), col("yb")), s"$p/base")
      }
      val revised = ev.filter(col("event_id") % 9 === 0)
        .withColumn("yb", pmod(col("yb") + lit(128L), lit(256L)))
      graft.scale.Layout.upsertZOrdered(revised, "event_id",
        col("xb"), col("yb"), s"$p/base", rev = 1L)        // epoch 3
      graft.scale.Layout.deleteZOrdered(
        ev.filter(col("event_id") % 7 === 0).select(col("event_id")),
        "event_id", s"$p/base")                            // epoch 4
      require(graft.scale.Layout
          .committedEpoch(s, s"$p/base", "event_id") == 4L,
        "as-of fixture must commit exactly epochs 0..4 (q183 pins asOf=2)")
    }

  def q183ZOrderAsOf(s: SparkSession, d: String): DataFrame = {
    val dir = zAsOfFixture(s, d)
    graft.scale.Layout.boxScanTight(
        graft.scale.Layout.readCurrentAsOf(s, s"$dir/base", "event_id",
          asOf = 2L),
        16, 31, 32, 63)
      .select(col("event_id"), col("xb"), col("yb"), col("z"))
      .orderBy(col("event_id"))
  }
  val q183Sql: String = q99Sql

  def q184ZOrderChangeFeed(s: SparkSession, d: String): DataFrame = {
    val dir = zAsOfFixture(s, d)
    // derived + idempotent: emitting on every call writes exactly the
    // missing epochs (none, once the fixture's feed is complete)
    graft.scale.Layout.emitChangeFeed(s, s"$dir/base", "event_id",
      s"$dir/feed")
    graft.scale.Layout.changeFeed(s, s"$dir/feed")
      .select(col("event_id"), col("change"), col("rev"),
        col("e").cast("long").as("e"))
      .orderBy(col("e"), col("event_id"))
  }
  val q184Sql: String =
    """SELECT event_id, 'inserted' AS change, CAST(NULL AS BIGINT) AS rev,
      |  CAST(1 AS BIGINT) AS e FROM events WHERE event_id % 3 = 1
      |UNION ALL
      |SELECT event_id, 'inserted', CAST(NULL AS BIGINT), CAST(2 AS BIGINT)
      |  FROM events WHERE event_id % 3 = 2
      |UNION ALL
      |SELECT event_id, 'revised', CAST(1 AS BIGINT), CAST(3 AS BIGINT)
      |  FROM events WHERE event_id % 9 = 0
      |UNION ALL
      |SELECT event_id, 'deleted', CAST(NULL AS BIGINT), CAST(4 AS BIGINT)
      |  FROM events WHERE event_id % 7 = 0
      |ORDER BY e, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q185/q186 — CHANGE DATA FEEDS on the LSH and BM25 indexes
  // (round-15 verdict item 3): the incremental re-export read "which
  // doc ids' dedup/retrieval state changed this epoch", derived
  // POST-HOC from the epoch stamps at O(affected) per epoch —
  // `_SUCCESS`-gated idempotent per-epoch dirs, inserts confirmed on
  // the per-doc commit point (LSH: the sig row; BM25: the epoch's
  // ledger row), so torn residue emits nothing. Both ride the
  // q179/q180 lifecycle fixtures (epochs 0..3) and hash-match the
  // slice algebra directly: epoch 1 inserted the appended 20%, epoch
  // 2 revised the %9 slice at rev 1, epoch 3 deleted the %7 slice.
  // IndexChangeFeedSpec pins the restore contract (baseline
  // membership/revision state + replayed deltas ≡ the as-of state)
  // and re-emission idempotence on both.
  // ---------------------------------------------------------------------
  def q185LshChangeFeed(s: SparkSession, d: String): DataFrame = {
    val dir = lshAsOfFixture(s, d)
    graft.scale.LshIndex.emitChangeFeed(s, dir, s"$dir/_cdc_feed")
    graft.scale.LshIndex.changeFeed(s, s"$dir/_cdc_feed")
      .orderBy(col("e"), col("doc_id"))
  }
  val q185Sql: String =
    """SELECT doc_id, 'inserted' AS change, CAST(NULL AS BIGINT) AS rev,
      |  CAST(1 AS BIGINT) AS e
      |  FROM documents WHERE doc_id < 400 AND doc_id % 5 = 4
      |UNION ALL
      |SELECT doc_id, 'revised', CAST(1 AS BIGINT), CAST(2 AS BIGINT)
      |  FROM documents WHERE doc_id < 400 AND doc_id % 9 = 0
      |UNION ALL
      |SELECT doc_id, 'deleted', CAST(NULL AS BIGINT), CAST(3 AS BIGINT)
      |  FROM documents WHERE doc_id < 400 AND doc_id % 7 = 0
      |ORDER BY e, doc_id""".stripMargin

  def q186BmChangeFeed(s: SparkSession, d: String): DataFrame = {
    val dir = bmAsOfFixture(s, d)
    graft.scale.BmIndex.emitChangeFeed(s, dir, s"$dir/_cdc_feed")
    graft.scale.BmIndex.changeFeed(s, s"$dir/_cdc_feed")
      .orderBy(col("e"), col("doc_id"))
  }
  val q186Sql: String =
    """SELECT doc_id, 'inserted' AS change, CAST(NULL AS BIGINT) AS rev,
      |  CAST(1 AS BIGINT) AS e FROM documents WHERE doc_id % 5 = 4
      |UNION ALL
      |SELECT doc_id, 'revised', CAST(1 AS BIGINT), CAST(2 AS BIGINT)
      |  FROM documents WHERE doc_id % 9 = 0
      |UNION ALL
      |SELECT doc_id, 'deleted', CAST(NULL AS BIGINT), CAST(3 AS BIGINT)
      |  FROM documents WHERE doc_id % 7 = 0
      |ORDER BY e, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q189 — MANIFEST-PINNED HYBRID RETRIEVAL (`SnapshotManifest` +
  // `BmIndex.topKAsOf` + `IvfIndex.topKAsOf` + `Hybrid.rrf`): the
  // run-level reproducibility pin, composed. A training run reads
  // through SEVERAL indexes at once, and "run X used ANN state E" is
  // only half an audit — the full question is "run X used THESE
  // epochs of ALL its indexes". Fixture: a BM25 index and an IVF
  // index each live build(80%) → append(20%), ONE manifest captures
  // both committed epochs (the run's pin — one tiny parquet row per
  // layout), then history moves on (revisions %9 + take-downs %7 on
  // BOTH sides, epochs 2..3). The query re-reads the manifest and
  // serves q94's reciprocal-rank fusion with each side AS OF its
  // pinned epoch — lexical ranks from the historical BM25 statistics
  // (the `_bm_epochs` ledger row), semantic ranks from the historical
  // IVF posting set under the frozen centroids — hash-matching a
  // from-scratch oracle over the ORIGINAL corpus (bm25 scoring chain
  // + the IVF-probed ranking + the same integer RRF fold). Epochs 2-3
  // are invisible on both sides simultaneously: the pinned hybrid
  // read is bit-stable under any amount of later ingest (modulo heals
  // of PRE-capture tears — a torn verb's residue healed at its
  // original stamp appears retroactively, so capture consistent
  // indexes when strict bit-stability matters; the SnapshotManifest
  // scaladoc carries the same qualification).
  // ---------------------------------------------------------------------
  def q189HybridAsOfManifest(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    val dir = cachedIndexDir("hybrid-asof", d, "v1",
      datasets = Seq("documents.parquet", "embeddings.parquet")) { p =>
      val docs = documents(s, d)
      graft.scale.BmIndex.build(
        docs.filter(col("doc_id") % 5 =!= 4), s"$p/bm")
      graft.scale.BmIndex.append(
        docs.filter(col("doc_id") % 5 === 4), s"$p/bm")   // bm epoch 1
      graft.scale.IvfIndex.build(
        emb.filter(col("vec_id") % 5 =!= 4), centroids, s"$p/ivf",
        centroidCount = cc)
      graft.scale.IvfIndex.append(
        emb.filter(col("vec_id") % 5 === 4), centroids, s"$p/ivf",
        centroidCount = cc)                               // ivf epoch 1
      // THE PIN: one manifest captures the run's whole serving state
      graft.scale.SnapshotManifest.write(s,
        graft.scale.SnapshotManifest.capture(s,
          Seq(("lex", "bm", s"$p/bm"), ("sem", "ivf", s"$p/ivf"))),
        s"$p/manifest")
      // history moves on — the pinned run must never see any of it
      val revisedD = docs.filter(col("doc_id") % 9 === 0)
        .withColumn("text", concat_ws(" ",
          filter(split(col("text"), " "), (_, i) => i % 2 === 0)))
      graft.scale.BmIndex.upsert(revisedD, s"$p/bm", rev = 1L)
      graft.scale.BmIndex.delete(
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")),
        s"$p/bm")
      val revisedV = emb.filter(col("vec_id") % 9 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      graft.scale.IvfIndex.upsert(revisedV, centroids, s"$p/ivf",
        rev = 1L, centroidCount = cc)
      graft.scale.IvfIndex.delete(
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")),
        s"$p/ivf")
      require(graft.scale.BmIndex.committedEpoch(s, s"$p/bm") == 3L &&
        graft.scale.IvfIndex.committedEpoch(s, s"$p/ivf") == 3L,
        "hybrid fixture must commit epochs 0..3 on both sides")
    }
    val pins = graft.scale.SnapshotManifest.read(s, s"$dir/manifest")
    // the two pinned probes are independent until the RRF fold — build
    // them concurrently so their eager control-plane actions overlap
    // (inParallel scaladoc; r20 optimization round, guide §2.6)
    val (lex, sem) = inParallel(
      graft.scale.BmIndex.topKAsOf(s, s"$dir/bm",
          doc1Terms(s, d), k = 20,
          asOf = graft.scale.SnapshotManifest.epochOf(pins, "lex"))
        .select(col("doc_id").as("id"), col("rank")),
      graft.scale.IvfIndex.topKAsOf(s, s"$dir/ivf",
          emb.filter(col("vec_id") === 1), centroids, k = 20,
          asOf = graft.scale.SnapshotManifest.epochOf(pins, "sem"))
        .select(col("vec_id").as("id"), col("rank")))
    val fused = graft.scale.Hybrid.rrf(Seq(lex, sem))
      .filter(col("id") =!= 1) // the query document itself
      .select(col("id").as("doc_id"),
        coalesce(col("rank_0"), lit(0)).as("lex_rank"),
        coalesce(col("rank_1"), lit(0)).as("sem_rank"),
        floor(col("rrf") * lit(1e9)).cast("long").as("rrf_q"))
    val top = fused.orderBy(col("rrf_q").desc, col("doc_id").asc).limit(10)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_q").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf_q"))
  }
  val q189Sql: String = {
    val ivfCtes =
      s"""ivcent AS (
         |  SELECT vec_id AS centroid_id, embedding AS c_emb
         |  FROM embeddings WHERE vec_id % 97 = 0),
         |ivcorp AS (
         |  SELECT a.vec_id, a.embedding, c.centroid_id,
         |    ${duckDist2("a.embedding", "c.c_emb")} AS dist2
         |  FROM embeddings a, ivcent c),
         |ivassigned AS (
         |  SELECT vec_id, embedding, centroid_id AS cluster_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, centroid_id ASC) AS rk
         |    FROM ivcorp) t WHERE rk = 1),
         |ivprobe AS (
         |  SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.centroid_id,
         |    ${duckDist2("q.embedding", "c.c_emb")} AS dist2
         |  FROM embeddings q, ivcent c WHERE q.vec_id = 1),
         |ivprobes AS (
         |  SELECT query_id, q_emb, centroid_id AS cluster_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, centroid_id ASC) AS rk
         |    FROM ivprobe) t WHERE rk <= 3),
         |ivscored AS (
         |  SELECT p.query_id, a.vec_id, ${duckCos("p.q_emb", "a.embedding")} AS sim
         |  FROM ivprobes p JOIN ivassigned a USING (cluster_id)
         |  WHERE p.query_id <> a.vec_id),
         |sem AS (
         |  SELECT vec_id AS id, row_number() OVER (
         |    ORDER BY sim DESC, vec_id ASC) AS sem_rank FROM ivscored)""".stripMargin
    s"""WITH $bm25Ctes,
       |$ivfCtes,
       |fused AS (
       |  SELECT coalesce(l.doc_id, s.id) AS doc_id,
       |    coalesce(l.rank, 0) AS lex_rank,
       |    coalesce(s.sem_rank, 0) AS sem_rank,
       |    CAST(floor((
       |      (CASE WHEN l.rank IS NULL THEN 0.0
       |            ELSE 1.0 / (60 + l.rank) END) +
       |      (CASE WHEN s.sem_rank IS NULL THEN 0.0
       |            ELSE 1.0 / (60 + s.sem_rank) END)) * 1000000000.0)
       |      AS BIGINT) AS rrf_q
       |  FROM (SELECT doc_id, rank FROM lexranked WHERE rank <= 20) l
       |  FULL OUTER JOIN (SELECT id, sem_rank FROM sem
       |    WHERE sem_rank <= 20) s ON l.doc_id = s.id
       |  WHERE coalesce(l.doc_id, s.id) <> 1)
       |SELECT row_number() OVER (ORDER BY rrf_q DESC, doc_id ASC) AS rank,
       |  doc_id, lex_rank, sem_rank, rrf_q
       |FROM fused ORDER BY rank LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q190 — PIN-AWARE MAINTENANCE, composed (round-16 verdict item 1):
  // the as-of matrix and the auto-compaction loops must not compose
  // UNSAFELY — a maintained twin's compactEvery firing would silently
  // vacuum the history a pinned training run still reads. Fixture: a
  // BM25 index lives build(80%) → append(20%) (epoch 1 = the FULL
  // corpus), a SnapshotManifest pin is REGISTERED at the layout
  // (`_pins/q190run.json`), then history and file geometry decay past
  // the pin (a take-down epoch + 8 O(batch) streaming appends of
  // remapped synthetic docs) until the REAL needsCompaction probe
  // fires — and the maintained foreachBatch body runs with
  // compactEvery=1. The live pin BLOCKS the fold (require()d in the
  // fixture: the epoch counter keeps growing instead of re-basing to
  // 0), so the query's as-of read at the pinned epoch still serves —
  // hash-matching q92's plain full-corpus oracle. Without the pin
  // gate the fold would vacuum the ledger and this very read would
  // throw. MaintenancePinSpec pins the block/release/feed-bridge
  // mechanics; this entry pins the composition end to end.
  // ---------------------------------------------------------------------
  private def bmPinnedFixture(s: SparkSession, d: String): String =
    cachedIndexDir("bm-pinned", d, "v1",
        datasets = Seq("documents.parquet")) { p =>
      val docs = documents(s, d)
      graft.scale.BmIndex.build(
        docs.filter(col("doc_id") % 5 =!= 4), p)             // epoch 0
      graft.scale.BmIndex.append(
        docs.filter(col("doc_id") % 5 === 4), p)             // epoch 1
      val pins = graft.scale.SnapshotManifest.capture(s,
        Seq(("lex", "bm", p)))
      require(pins.head.epoch == 1L,
        "q190 fixture pins epoch 1 (the full corpus)")
      graft.scale.SnapshotManifest.register(s, pins, "q190run")
      // history + geometry decay past the pin: a take-down the fold
      // would physically fold away, then remapped synthetic appends
      // (one posting file per touched term bucket each)
      graft.scale.BmIndex.delete(
        docs.filter(col("doc_id") % 7 === 0).select(col("doc_id")), p)
      (0 until 7).foreach { i =>
        graft.streaming.IncrementalRetrieval.appendBatch(p)(
          docs.filter(col("doc_id") % 11 === i)
            .select((col("doc_id") + 1000000L * (i + 1L)).as("doc_id"),
              col("text")), i.toLong)
      }
      require(graft.scale.BmIndex.needsCompaction(s, p),
        "q190 fixture must decay the geometry enough to trigger the probe")
      val before = graft.scale.BmIndex.committedEpoch(s, p)
      // the maintained loop fires its fold — the live pin must block it
      graft.streaming.IncrementalRetrieval.appendBatchMaintained(
        p, compactEvery = 1L)(
        docs.filter(col("doc_id") % 11 === 8)
          .select((col("doc_id") + 9000000L).as("doc_id"), col("text")),
        0L)
      require(graft.scale.BmIndex.committedEpoch(s, p) == before + 1L,
        "live pin must block the maintained fold — history was vacuumed")
    }

  def q190PinnedMaintenance(s: SparkSession, d: String): DataFrame = {
    val dir = bmPinnedFixture(s, d)
    graft.scale.BmIndex.topKAsOf(s, dir, doc1Terms(s, d), k = 15, asOf = 1L)
  }
  val q190Sql: String = q92Sql

  // ---------------------------------------------------------------------
  // q191 — COMPOSED RUN-RESTORE PROOF (round-16 verdict item 6): the
  // final mile of the audit story. Each family's feed restore contract
  // is spec-pinned in isolation; this entry proves they COMPOSE across
  // a whole run. Fixture: THREE families (BM25, IVF, z-order) each
  // live build(80%) → append(20%); one SnapshotManifest captures all
  // three at epoch 1 (= the full corpus) and records the pre-fold
  // pinned reads; history then moves past the pin (a take-down on
  // every family), ALL change feeds are emitted, and EVERYTHING is
  // compacted — ledgers, registries, and epochs vacuumed to 0
  // (require()d). Reconstruction: per family, baseline (epoch-0
  // membership) + replayed feed deltas ≤ pin → rebuild a fresh layout
  // over the restored membership (content from the source-of-truth
  // tables, the documented restore pattern) — and the fixture
  // require()s each restored serve COLLECT-EQUAL to the pre-fold
  // pinned read (scores included). The query unions the three restored
  // serves (family, rank, id, score_q); the oracle replays all three
  // from scratch over the pinned corpus, so the driver's hash check
  // independently confirms the reconstruction — a pinned run outlives
  // the vacuum of every index it read through.
  // ---------------------------------------------------------------------
  private def runRestoreFixture(s: SparkSession, d: String): String = {
    val embAll = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(embAll, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    cachedIndexDir("run-restore", d, "v1",
        datasets = Seq("documents.parquet", "embeddings.parquet")) { p =>
      import graft.scale._
      val docs = documents(s, d)
      val emb = embAll
      BmIndex.build(docs.filter(col("doc_id") % 5 =!= 4), s"$p/bm")
      BmIndex.append(docs.filter(col("doc_id") % 5 === 4), s"$p/bm")
      IvfIndex.build(emb.filter(col("vec_id") % 5 =!= 4), centroids,
        s"$p/ivf", centroidCount = cc)
      IvfIndex.append(emb.filter(col("vec_id") % 5 === 4), centroids,
        s"$p/ivf", centroidCount = cc)
      def zsrc = docs.select(col("doc_id").as("id"),
        pmod(col("doc_id"), lit(97L)).as("x"),
        pmod(col("doc_id"), lit(89L)).as("y"))
      Layout.writeZOrderedK(zsrc.filter(col("id") % 5 =!= 4),
        Seq(col("x"), col("y")), s"$p/z")
      Layout.appendZOrderedIdempotentK(zsrc.filter(col("id") % 5 === 4),
        "id", Seq(col("x"), col("y")), s"$p/z")
      // THE PIN: one manifest over all three families
      val pins = SnapshotManifest.capture(s, Seq(
        ("lex", "bm", s"$p/bm"), ("sem", "ivf", s"$p/ivf"),
        ("slice", "zorder", s"$p/z")))
      require(pins.forall(_.epoch == 1L),
        "q191 fixture pins epoch 1 on every family")
      SnapshotManifest.write(s, pins, s"$p/manifest")
      // the pinned reads, recorded BEFORE the vacuum (the equality
      // proof's left side)
      val lex0 = BmIndex.topKAsOf(s, s"$p/bm", doc1Terms(s, d),
        k = 15, asOf = 1L).orderBy(col("rank")).collect().toSeq
      val sem0 = IvfIndex.topKAsOf(s, s"$p/ivf",
          emb.filter(col("vec_id") === 1), centroids, k = 10, asOf = 1L,
          nProbe = 3)
        .orderBy(col("query_id"), col("rank")).collect().toSeq
      val slice0 = Layout.readCurrentAsOf(s, s"$p/z", "id", 1L)
        .filter(col("x").between(10, 40) && col("y").between(20, 60))
        .select(col("id"), col("x"), col("y"))
        .orderBy(col("id")).collect().toSeq
      // history moves past the pin — state the folds will vacuum
      BmIndex.delete(docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id")), s"$p/bm")
      IvfIndex.delete(emb.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id")), s"$p/ivf")
      Layout.deleteZOrdered(docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("id")), "id", s"$p/z")
      // EMIT EVERY FEED, then COMPACT EVERYTHING
      BmIndex.emitChangeFeed(s, s"$p/bm", s"$p/feed_bm")
      IvfIndex.emitChangeFeed(s, s"$p/ivf", s"$p/feed_ivf")
      Layout.emitChangeFeed(s, s"$p/z", "id", s"$p/feed_z")
      Maintenance.compactInPlace(s, s"$p/bm", BmIndex.compactTo(s, _, _))
      IvfIndex.rebuild(s, s"$p/ivf", centroids, centroidCount = cc)
      Maintenance.compactInPlace(s, s"$p/z",
        Layout.compactZOrderedTo(s, _, _, foldRevisionsBy = Some("id")))
      require(BmIndex.committedEpoch(s, s"$p/bm") == 0L &&
        IvfIndex.committedEpoch(s, s"$p/ivf") == 0L &&
        Layout.committedEpoch(s, s"$p/z", "id") == 0L,
        "q191 folds must vacuum every family's history")
      // RECONSTRUCT: baseline (epoch-0 membership) + feed deltas ≤ pin
      def restoredIds(feed: DataFrame, idCol: String,
          base: DataFrame): DataFrame = {
        val f = feed.filter(col("e") <= 1L)
        base.select(col(idCol))
          .unionByName(f.filter(col("change") === "inserted")
            .select(col(idCol)))
          .distinct()
          .join(f.filter(col("change") === "deleted").select(col(idCol)),
            Seq(idCol), "left_anti")
      }
      val bmLive = restoredIds(BmIndex.changeFeed(s, s"$p/feed_bm"),
        "doc_id", docs.filter(col("doc_id") % 5 =!= 4))
      BmIndex.build(docs.join(bmLive, Seq("doc_id"), "left_semi"),
        s"$p/bm_restored")
      val ivfLive = restoredIds(IvfIndex.changeFeed(s, s"$p/feed_ivf"),
        "vec_id", emb.filter(col("vec_id") % 5 =!= 4))
      IvfIndex.build(emb.join(ivfLive, Seq("vec_id"), "left_semi"),
        centroids, s"$p/ivf_restored", centroidCount = cc)
      val zLive = restoredIds(Layout.changeFeed(s, s"$p/feed_z"),
        "id", zsrc.filter(col("id") % 5 =!= 4))
      Layout.writeZOrderedK(zsrc.join(zLive, Seq("id"), "left_semi"),
        Seq(col("x"), col("y")), s"$p/z_restored")
      // the equality proof: restored serve ≡ the recorded pinned read
      val lex1 = BmIndex.topK(s, s"$p/bm_restored", doc1Terms(s, d),
        k = 15).orderBy(col("rank")).collect().toSeq
      val sem1 = IvfIndex.topK(s, s"$p/ivf_restored",
          emb.filter(col("vec_id") === 1), centroids, k = 10, nProbe = 3)
        .orderBy(col("query_id"), col("rank")).collect().toSeq
      val slice1 = Layout.readCurrent(s, s"$p/z_restored", "id")
        .filter(col("x").between(10, 40) && col("y").between(20, 60))
        .select(col("id"), col("x"), col("y"))
        .orderBy(col("id")).collect().toSeq
      require(lex1 == lex0,
        "restored BM25 serve diverged from the pre-fold pinned read")
      require(sem1 == sem0,
        "restored IVF serve diverged from the pre-fold pinned read")
      require(slice1 == slice0,
        "restored z-layout slice diverged from the pre-fold pinned read")
    }
  }

  def q191RunRestore(s: SparkSession, d: String): DataFrame = {
    val dir = runRestoreFixture(s, d)
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val zw = org.apache.spark.sql.expressions.Window
      .orderBy(col("id").asc)
    // three independent restored serves — construct concurrently so
    // each family's probe-collect/registry actions overlap (guide §2.6)
    val (lex, sem, slice) = inParallel3(
      graft.scale.BmIndex.topK(s, s"$dir/bm_restored",
          doc1Terms(s, d), k = 15)
        .select(lit("bm").as("family"), col("rank"),
          col("doc_id").as("id"), col("score_q")),
      graft.scale.IvfIndex.topK(s, s"$dir/ivf_restored",
          emb.filter(col("vec_id") === 1), centroids, k = 10, nProbe = 3)
        .select(lit("ivf").as("family"), col("rank"),
          col("vec_id").as("id"), q(col("sim")).as("score_q")),
      graft.scale.Layout
        .readCurrent(s, s"$dir/z_restored", "id")
        .filter(col("x").between(10, 40) && col("y").between(20, 60))
        .select(col("id"),
          (col("x") * lit(1000L) + col("y")).cast("long").as("score_q"))
        .withColumn("rank", row_number().over(zw))
        .select(lit("z").as("family"), col("rank"), col("id"),
          col("score_q")))
    lex.unionByName(sem).unionByName(slice)
      .orderBy(col("family"), col("rank"))
  }
  val q191Sql: String = {
    val ivfCtes =
      s"""ivcent AS (
         |  SELECT vec_id AS centroid_id, embedding AS c_emb
         |  FROM embeddings WHERE vec_id % 97 = 0),
         |ivcorp AS (
         |  SELECT a.vec_id, a.embedding, c.centroid_id,
         |    ${duckDist2("a.embedding", "c.c_emb")} AS dist2
         |  FROM embeddings a, ivcent c),
         |ivassigned AS (
         |  SELECT vec_id, embedding, centroid_id AS cluster_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, centroid_id ASC) AS rk
         |    FROM ivcorp) t WHERE rk = 1),
         |ivprobe AS (
         |  SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.centroid_id,
         |    ${duckDist2("q.embedding", "c.c_emb")} AS dist2
         |  FROM embeddings q, ivcent c WHERE q.vec_id = 1),
         |ivprobes AS (
         |  SELECT query_id, q_emb, centroid_id AS cluster_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, centroid_id ASC) AS rk
         |    FROM ivprobe) t WHERE rk <= 3),
         |ivscored AS (
         |  SELECT p.query_id, a.vec_id, ${duckCos("p.q_emb", "a.embedding")} AS sim
         |  FROM ivprobes p JOIN ivassigned a USING (cluster_id)
         |  WHERE p.query_id <> a.vec_id),
         |semranked AS (
         |  SELECT vec_id AS id,
         |    CAST(floor(sim * 1000000000.0) AS BIGINT) AS sim_q,
         |    row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS sem_rank
         |  FROM ivscored)""".stripMargin
    s"""WITH $bm25Ctes,
       |$ivfCtes,
       |zbox AS (
       |  SELECT doc_id AS id,
       |    (doc_id % 97) * 1000 + (doc_id % 89) AS score_q
       |  FROM documents
       |  WHERE (doc_id % 97) BETWEEN 10 AND 40
       |    AND (doc_id % 89) BETWEEN 20 AND 60)
       |SELECT family, rank, id, score_q FROM (
       |  SELECT 'bm' AS family, rank, doc_id AS id, score_q
       |  FROM lexranked WHERE rank <= 15
       |  UNION ALL
       |  SELECT 'ivf' AS family, sem_rank AS rank, id, sim_q AS score_q
       |  FROM semranked WHERE sem_rank <= 10
       |  UNION ALL
       |  SELECT 'z' AS family,
       |    row_number() OVER (ORDER BY id ASC) AS rank, id, score_q
       |  FROM zbox) u
       |ORDER BY family, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q192 — SAMPLED k-means training (KMeans.fitSampled's shape, round-16
  // verdict item 2): the re-cluster event bounded. Lloyd runs over a
  // CONTENT-HASH DETERMINISTIC sample (the 64 lowest md5_64(vec_id)
  // rows — q97's priority machinery on the id, so DuckDB replays the
  // exact member set), initialized from the sample's 4 lowest ids, and
  // the FULL corpus is assigned exactly ONCE under the sample-trained
  // centroids — training cost scales with the sample, not the corpus
  // (FAISS trains IVF coarse quantizers on a bounded sample for the
  // same reason). Everything in exact integer space (floor(x·1e6)
  // longs, integer distances, argmin tie-broken by centroid id — the
  // q76/q82 recipe), so the oracle replays sample selection, the
  // training round, and the full-corpus assignment bit for bit. Output:
  // per-cluster per-dimension (trained centroid, assigned count, sum).
  // ---------------------------------------------------------------------
  def q192KmeansSampled(s: SparkSession, d: String): DataFrame = {
    val k = 4
    val sampleN = 64
    val qemb = embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"),
        e => floor(e.cast("double") * 1e6).cast("long")).as("qv"))
    val sample = qemb
      .withColumn("h",
        graft.functions.Md5_64.md5_64(col("vec_id").cast("string")))
      .orderBy(col("h").asc, col("vec_id").asc).limit(sampleN).drop("h")
      .localCheckpoint()
    val c0 = sample.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
    def assign(src: DataFrame, cents: DataFrame): DataFrame = {
      val d2 = Similarity.quantDist2(col("qv"), col("cv"))
      src.crossJoin(broadcast(cents))
        .select(col("vec_id"), struct(d2.as("d2"), col("cid")).as("dc"))
        .groupBy(col("vec_id"))
        .agg(min(col("dc")).getField("cid").as("cid"))
    }
    // the training round runs on the SAMPLE only
    val a1 = assign(sample, c0)
    val c1e = a1.join(sample, "vec_id")
      .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "eq")))
      .groupBy(col("cid"), col("pos"))
      .agg(floor(sum(col("eq")).cast("double") / count(lit(1)))
        .cast("long").as("cq"))
    val c1 = c1e.groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cq")))),
        x => x.getField("cq")).as("cv"))
    // ONE full-corpus assignment under the sample-trained centroids
    val aFull = assign(qemb, c1)
    val stats = aFull.join(qemb, "vec_id")
      .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "eq")))
      .groupBy(col("cid"), col("pos"))
      .agg(count(lit(1)).as("n_vec"), sum(col("eq")).as("sum_q"))
    stats.join(c1e, Seq("cid", "pos"))
      .select(col("cid").as("cluster"), col("pos"), col("cq").as("cq1"),
        col("n_vec"), col("sum_q"))
      .orderBy(col("cluster"), col("pos"))
  }
  val q192Sql: String =
    """WITH q AS (
      |  SELECT vec_id, i - 1 AS pos,
      |    CAST(floor(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS eq
      |  FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) r),
      |sampids AS (
      |  SELECT vec_id FROM (
      |    SELECT DISTINCT vec_id,
      |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
      |        AS BIGINT) AS h
      |    FROM q) t
      |  ORDER BY h ASC, vec_id ASC LIMIT 64),
      |samp AS (SELECT q.* FROM q JOIN sampids USING (vec_id)),
      |c0ids AS (SELECT vec_id FROM sampids ORDER BY vec_id ASC LIMIT 4),
      |c0 AS (
      |  SELECT s.vec_id AS cid, s.pos, s.eq AS cq
      |  FROM samp s JOIN c0ids USING (vec_id)),
      |d1 AS (
      |  SELECT s.vec_id, c.cid, sum((s.eq - c.cq) * (s.eq - c.cq)) AS d2
      |  FROM samp s JOIN c0 c USING (pos) GROUP BY 1, 2),
      |a1 AS (
      |  SELECT vec_id, cid FROM d1
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1),
      |c1 AS (
      |  SELECT a1.cid, s.pos,
      |    CAST(floor(sum(s.eq)::DOUBLE / count(*)) AS BIGINT) AS cq
      |  FROM a1 JOIN samp s USING (vec_id) GROUP BY 1, 2),
      |dfull AS (
      |  SELECT q.vec_id, c.cid, sum((q.eq - c.cq) * (q.eq - c.cq)) AS d2
      |  FROM q JOIN c1 c USING (pos) GROUP BY 1, 2),
      |afull AS (
      |  SELECT vec_id, cid FROM dfull
      |  QUALIFY row_number() OVER (
      |    PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1),
      |st AS (
      |  SELECT afull.cid, q.pos, count(*) AS n_vec,
      |    CAST(sum(q.eq) AS BIGINT) AS sum_q
      |  FROM afull JOIN q USING (vec_id) GROUP BY 1, 2)
      |SELECT st.cid AS cluster, st.pos AS pos, c1.cq AS cq1,
      |  st.n_vec, st.sum_q
      |FROM st JOIN c1 ON c1.cid = st.cid AND c1.pos = st.pos
      |ORDER BY cluster, st.pos""".stripMargin

  // ---------------------------------------------------------------------
  // q193 — the IVF+PQ SERVING HANDLE (IvfPqIndex.openHandle /
  // topKAsOfWith, round-17 verdict item 1): the compressed layout
  // writes the same nlist ∝ corpus cluster_id dir geometry as IVF, so
  // its per-read partition discovery pays the same listing tax the
  // r17 scale artifact measured at 11× on the uncompressed twin — the
  // handle lists once and every probe plans against the cached file
  // index, generation-checked per probe (one tiny driver-side read)
  // so a fold under it refuses instead of FNF-looping. q193 serves
  // q182's exact snapshot read THROUGH the handle and hash-matches the
  // same full-corpus oracle — data-level proof the cached-listing path
  // is result-identical through the whole CDC lifecycle.
  // ---------------------------------------------------------------------
  def q193IvfPqHandleAsOf(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val dir = ivfPqAsOfFixture(s, d)
    val handle = graft.scale.IvfPqIndex.openHandle(s, dir)
    graft.scale.IvfPqIndex
      .topKAsOfWith(s, handle, emb.filter(col("vec_id") < 10), centroids,
        k = 10, asOf = 1L, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }
  val q193Sql: String = q90Sql

  // ---------------------------------------------------------------------
  // q194 — MECHANICAL HANDLE INVALIDATION (round-17 verdict item 2),
  // the whole lifecycle as one proof: a serving handle's cached
  // listing is stranded when a rebuild/fold replaces the directory,
  // and before r18 the failure mode was a permanent FileNotFound that
  // even withReaderRetry could not heal (the retry re-plans against
  // the same cached listing). Generation stamps make it a DETECTED
  // state. The fixture: build → open handle → probe → rebuild under
  // the SAME centroids → require the stale handle REFUSES (typed
  // StaleHandleException, not an FNF loop) on both current and as-of
  // probes → reopen → require the reopened serve collect-equals the
  // pre-rebuild serve (same centroids ⇒ same results). The query then
  // serves top-5 through a fresh handle over the rebuilt index and
  // hash-matches q35's plain full-corpus oracle — the proof's
  // require()s gate inside the fixture, the oracle gates the data.
  // ---------------------------------------------------------------------
  private def handleGenFixture(s: SparkSession, d: String): String = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    cachedIndexDir("gen-handle", d, "v1") { p =>
      graft.scale.IvfIndex.build(emb, centroids, p, centroidCount = cc)
      val h0 = graft.scale.IvfIndex.openHandle(s, p)
      require(h0.generation.nonEmpty, "build must stamp a generation")
      def serve(h: graft.scale.IvfIndex.Handle) =
        graft.scale.IvfIndex
          .topKWith(s, h, emb.filter(col("vec_id") < 10), centroids,
            k = 5, nProbe = 3)
          .orderBy(col("query_id"), col("rank")).collect().toSeq
      val pre = serve(h0)
      graft.scale.IvfIndex.rebuild(s, p, centroids, centroidCount = cc)
      require(graft.scale.IvfIndex.isStale(s, h0),
        "rebuild must move the generation stamp")
      val refusedCur =
        try { serve(h0); false }
        catch { case _: graft.scale.StaleHandleException => true }
      require(refusedCur,
        "stale handle must refuse the current-serve probe")
      val refusedAsOf =
        try {
          graft.scale.IvfIndex.topKAsOfWith(s, h0,
            emb.filter(col("vec_id") < 10), centroids, k = 5,
            asOf = 0L, nProbe = 3).collect(); false
        } catch { case _: graft.scale.StaleHandleException => true }
      require(refusedAsOf, "stale handle must refuse the as-of probe")
      val h1 = graft.scale.IvfIndex.reopen(s, h0)
      require(serve(h1) == pre,
        "same-centroid rebuild must serve identically through the " +
          "reopened handle")
    }
  }

  def q194HandleRefuseReopen(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val dir = handleGenFixture(s, d)
    val handle = graft.scale.IvfIndex.openHandle(s, dir)
    graft.scale.IvfIndex
      .topKWith(s, handle, emb.filter(col("vec_id") < 10), centroids,
        k = 5, nProbe = 3)
      .select(col("query_id"), col("rank"), col("vec_id"),
        q(col("sim")).as("sim_q"))
      .orderBy(col("query_id"), col("rank"))
  }
  val q194Sql: String = q35Sql

  // ---------------------------------------------------------------------
  // q195 — CODE-LEVEL COMPACTION on the IVF+PQ index
  // (IvfPqIndex.compactTo, round 18): the compressed layout's missing
  // fold. Its documented history vacuum was "the next build from
  // source" — but raw embeddings are exactly what a PQ index exists
  // to NOT keep, so an operator without them had no fold and
  // append-file decay + CDC residue grew forever. The current
  // generation is fully determined by stored codes alone (main rows ∖
  // revised ids ∪ current-rev rows ∖ tombstones), so the fold needs
  // no re-encode. Fixture: q171's full CDC lifecycle (build 80% →
  // append 20% → re-embed %9 → delete %7), then
  // Maintenance.compactInPlace over compactTo with require()s pinning
  // the vacuum (epochs re-base 0→, geometry back to one file per
  // cluster, needsCompaction false). The query serves current top-10
  // AFTER the fold and hash-matches q171's oracle — data-level proof
  // the fold changed bytes, never answers, cross-engine.
  // ---------------------------------------------------------------------
  private def pqCompactFixture(s: SparkSession, d: String): String = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val cc = Some(strideCentroidCount(s, d, 97))
    cachedIndexDir("ivfpq-compact", d, "v1") { p =>
      graft.scale.IvfPqIndex.build(
        emb.filter(col("vec_id") % 5 =!= 4), centroids, p,
        centroidCount = cc,
        codebooks = Some(graft.scale.Similarity.pqInitCodebooks(emb)))
      graft.scale.IvfPqIndex.append(
        emb.filter(col("vec_id") % 5 === 4), centroids, p,
        centroidCount = cc)
      val revised = emb.filter(col("vec_id") % 9 === 0)
        .withColumn("embedding", reverse(col("embedding")))
      graft.scale.IvfPqIndex.upsert(revised, centroids, p, rev = 1L,
        centroidCount = cc)
      graft.scale.IvfPqIndex.delete(
        emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")), p)
      require(graft.scale.IvfPqIndex.committedEpoch(s, p) == 3L,
        "q195 fixture must commit epochs 0..3 before the fold")
      graft.scale.Maintenance.compactInPlace(s, p,
        graft.scale.IvfPqIndex.compactTo(s, _, _))
      require(graft.scale.IvfPqIndex.committedEpoch(s, p) == 0L,
        "the fold is the history vacuum — epochs must re-base to 0")
      require(!graft.scale.IvfPqIndex.needsCompaction(s, p),
        "the fold must restore one-file-per-cluster geometry")
    }
  }

  def q195IvfPqCompacted(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val centroids = graft.scale.Similarity.strideCentroids(emb, 97)
    val dir = pqCompactFixture(s, d)
    graft.scale.IvfPqIndex
      .topK(s, dir, emb.filter(col("vec_id") < 10), centroids,
        k = 10, nProbe = 3)
      .orderBy(col("query_id"), col("rank"))
  }
  lazy val q195Sql: String = q171Sql

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_dedup_exact" -> q30DedupExact _,
    "q31_ngram_jaccard" -> q31NgramJaccard _,
    "q67_dedup_clusters" -> q67DedupClusters _,
    "q32_minhash_lsh" -> q32MinhashLsh _,
    "q33_simhash_pairs" -> q33SimhashPairs _,
    "q71_minhash_portable" -> q71MinhashPortable _,
    "q72_simhash_portable" -> q72SimhashPortable _,
    "q74_bigram_lm_score" -> q74BigramLmScore _,
    "q75_bpe_pairs" -> q75BpePairs _,
    "q76_kmeans_step" -> q76KmeansStep _,
    "q82_kmeans_train" -> q82KmeansTwoRounds _,
    "q77_embed_decontam" -> q77EmbedDecontam _,
    "q78_clean_pipeline" -> q78CleanPipeline _,
    "q79_budget_mix" -> q79BudgetMix _,
    "q80_dup_profile" -> q80DupProfile _,
    "q81_span_excision" -> q81SpanExcision _,
    "q84_span_excision_keep_first" -> q84SpanExcisionKeepFirst _,
    "q34_ann_brute" -> q34AnnBrute _,
    "q35_ann_ivf" -> q35AnnIvf _,
    "q85_ann_ivf_indexed" -> q85AnnIvfIndexed _,
    "q86_semantic_dedup" -> q86SemanticDedup _,
    "q87_two_level_assign" -> q87TwoLevelAssign _,
    "q83_ann_pq" -> q83AnnPq _,
    "q90_ann_ivfpq" -> q90AnnIvfPq _,
    "q91_ann_ivfpq_indexed" -> q91AnnIvfPqIndexed _,
    "q88_quality_classifier" -> q88QualityClassifier _,
    "q89_shard_export" -> q89ShardExport _,
    "q52_embed_neardup" -> q52EmbedNearDup _,
    "q36_langid" -> q36LangId _,
    "q37_quality" -> q37Quality _,
    "q38_tokens" -> q38Tokens _,
    "q39_fingerprint" -> q39Fingerprint _,
    "q40_embed_norm" -> q40EmbedNorm _,
    "q41_media_decode" -> q41MediaDecode _,
    "q53_media_frames" -> q53MediaFrames _,
    "q42_normalize" -> q42Normalize _,
    "q44_corpus_profile" -> q44CorpusProfile _,
    "q54_len_quantiles" -> q54LenQuantiles _,
    "q55_pii_scrub" -> q55PiiScrub _,
    "q56_repetition" -> q56Repetition _,
    "q57_split" -> q57Split _,
    "q58_weighted_sample" -> q58WeightedSample _,
    "q59_packing" -> q59Packing _,
    "q65_approx_profile" -> q65ApproxProfile _,
    "q68_stratified_sample" -> q68StratifiedSample _,
    "q69_decontaminate" -> q69Decontaminate _,
    "q70_char_entropy" -> q70CharEntropy _,
    "q49_vocab" -> q49Vocab _,
    "q50_bigrams" -> q50Bigrams _,
    "q51_tfidf" -> q51TfIdf _,
    "q92_bm25_topk" -> q92Bm25TopK _,
    "q93_ann_sq8" -> q93AnnSq8 _,
    "q94_hybrid_rrf" -> q94HybridRrf _,
    "q95_link_graph" -> q95LinkGraph _,
    "q96_pagerank" -> q96PageRank _,
    "q97_priority_sample" -> q97PrioritySample _,
    "q98_zorder_box" -> q98ZOrderBox _,
    "q99_zorder_tight" -> q99ZOrderTight _,
    "q100_random_walks" -> q100RandomWalks _,
    "q101_countmin" -> q101CountMin _,
    "q102_bm25_indexed" -> q102Bm25Indexed _,
    "q103_hybrid_indexed" -> q103HybridIndexed _,
    "q104_chunking" -> q104Chunking _,
    "q105_personalized_pr" -> q105PersonalizedPr _,
    "q106_chunk_dedup" -> q106ChunkDedup _,
    "q107_wordpiece" -> q107Wordpiece _,
    "q108_pagerank_directed" -> q108PagerankDirected _,
    "q109_heavy_hitters" -> q109HeavyHitters _,
    "q110_long_walks" -> q110LongWalks _,
    "q111_subword_trained" -> q111SubwordTrained _,
    "q112_citation_pagerank" -> q112CitationPagerank _,
    "q113_lsh_incremental" -> q113LshIncremental _,
    "q114_hist_quantiles" -> q114HistQuantiles _,
    "q115_citation_communities" -> q115CitationCommunities _,
    "q116_corpus_diff" -> q116CorpusDiff _,
    "q117_shard_checksums" -> q117ShardChecksums _,
    "q118_triangles" -> q118Triangles _,
    "q119_containment" -> q119Containment _,
    "q120_weighted_pagerank" -> q120WeightedPagerank _,
    "q121_hits" -> q121Hits _,
    "q122_kcore" -> q122KCore _,
    "q123_bfs_distances" -> q123BfsDistances _,
    "q124_seq_packing" -> q124SeqPacking _,
    "q125_collocations" -> q125Collocations _,
    "q126_temp_mixture" -> q126TempMixture _,
    "q127_anchor_terms" -> q127AnchorTerms _,
    "q128_label_prop" -> q128LabelProp _,
    "q129_training_recipe" -> q129TrainingRecipe _,
    "q130_media_phash_dedup" -> q130MediaPhashDedup _,
    "q131_token_shards" -> q131TokenShards _,
    "q132_lang_segments" -> q132LangSegments _,
    "q133_keep_best" -> q133KeepBest _,
    "q134_rank_quantiles" -> q134RankQuantiles _,
    "q135_modularity_communities" -> q135ModularityCommunities _,
    "q136_image_codec_hash" -> q136ImageCodecHash _,
    "q137_pagerank_warm" -> q137PagerankWarm _,
    "q138_alpha_mixture" -> q138AlphaMixture _,
    "q139_louvain_multilevel" -> q139LouvainMultilevel _,
    "q140_citation_index_edges" -> q140CitationIndexEdges _,
    "q141_incr_graph_pipeline" -> q141IncrementalGraphPipeline _,
    "q142_citation_deletes" -> q142CitationDeletes _,
    "q143_delete_warm_pagerank" -> q143DeleteWarmPagerank _,
    "q144_lsh_delete_probe" -> q144LshDeleteProbe _,
    "q145_bm25_delete_probe" -> q145Bm25DeleteProbe _,
    "q146_ivf_delete_probe" -> q146IvfDeleteProbe _,
    "q147_ivfpq_delete_probe" -> q147IvfPqDeleteProbe _,
    "q148_citation_compact_serve" -> q148CitationCompactServe _,
    "q149_cluster_store" -> q149ClusterStore _,
    "q150_cluster_deletes" -> q150ClusterDeletes _,
    "q151_cluster_compact_serve" -> q151ClusterCompactServe _,
    "q152_zorder_lifecycle" -> q152ZOrderLifecycle _,
    "q153_louvain_warm" -> q153LouvainWarm _,
    "q154_theta_overlap" -> q154ThetaOverlap _,
    "q155_cascade_rerank" -> q155CascadeRerank _,
    "q156_lsh_upsert_probe" -> q156LshUpsertProbe _,
    "q157_bm25_upsert_probe" -> q157Bm25UpsertProbe _,
    "q158_ivf_upsert_probe" -> q158IvfUpsertProbe _,
    "q159_ivfpq_upsert_probe" -> q159IvfPqUpsertProbe _,
    "q160_citation_upsert_edges" -> q160CitationUpsertEdges _,
    "q161_cluster_upsert" -> q161ClusterUpsert _,
    "q162_zorder_upsert" -> q162ZOrderUpsert _,
    "q163_citation_cdc_lifecycle" -> q163CitationCdcLifecycle _,
    "q164_cluster_asof" -> q164ClusterAsOf _,
    "q165_cluster_cdc_serve" -> q165ClusterCdcServe _,
    "q166_cluster_diff" -> q166ClusterDiff _,
    "q167_cluster_change_feed" -> q167ClusterChangeFeed _,
    "q168_ivf_cdc_lifecycle" -> q168IvfCdcLifecycle _,
    "q181_ivf_asof" -> q181IvfAsOf _,
    "q182_ivfpq_asof" -> q182IvfPqAsOf _,
    "q183_zorder_asof" -> q183ZOrderAsOf _,
    "q184_zorder_change_feed" -> q184ZOrderChangeFeed _,
    "q185_lsh_change_feed" -> q185LshChangeFeed _,
    "q186_bm_change_feed" -> q186BmChangeFeed _,
    "q187_ivf_change_feed" -> q187IvfChangeFeed _,
    "q188_ivfpq_change_feed" -> q188IvfPqChangeFeed _,
    "q189_hybrid_asof_manifest" -> q189HybridAsOfManifest _,
    "q190_pinned_maintenance" -> q190PinnedMaintenance _,
    "q191_run_restore" -> q191RunRestore _,
    "q192_kmeans_sampled" -> q192KmeansSampled _,
    "q193_ivfpq_handle_asof" -> q193IvfPqHandleAsOf _,
    "q194_handle_refuse_reopen" -> q194HandleRefuseReopen _,
    "q195_ivfpq_compacted" -> q195IvfPqCompacted _,
    "q169_bm25_cdc_lifecycle" -> q169Bm25CdcLifecycle _,
    "q170_lsh_cdc_lifecycle" -> q170LshCdcLifecycle _,
    "q171_ivfpq_cdc_lifecycle" -> q171IvfPqCdcLifecycle _,
    "q172_zorder_cdc_lifecycle" -> q172ZOrderCdcLifecycle _,
    "q173_boilerplate_excision" -> q173BoilerplateExcision _,
    "q174_citation_asof" -> q174CitationAsOf _,
    "q175_citation_change_feed" -> q175CitationChangeFeed _,
    "q176_zorder_3d" -> q176ZOrder3d _,
    "q177_ivf_drift" -> q177IvfDrift _,
    "q178_louvain_multilevel_warm" -> q178LouvainMultilevelWarm _,
    "q179_lsh_asof" -> q179LshAsOf _,
    "q180_bm25_asof" -> q180Bm25AsOf _,
  )

  val oracles: Map[String, String] = Map(
    "q30_dedup_exact" -> q30Sql,
    "q31_ngram_jaccard" -> q31Sql,
    "q67_dedup_clusters" -> q67Sql,
    // q32/q33: xxhash64-based fast paths, rows-only; q71/q72 are the
    // same pipelines on portable md5-derived hashes, fully oracle-checked
    "q71_minhash_portable" -> q71Sql,
    "q72_simhash_portable" -> q72Sql,
    "q74_bigram_lm_score" -> q74Sql,
    "q75_bpe_pairs" -> q75Sql,
    "q76_kmeans_step" -> q76Sql,
    "q82_kmeans_train" -> q82Sql,
    "q77_embed_decontam" -> q77Sql,
    "q78_clean_pipeline" -> q78Sql,
    "q79_budget_mix" -> q79Sql,
    "q80_dup_profile" -> q80Sql,
    "q81_span_excision" -> q81Sql,
    "q84_span_excision_keep_first" -> q84Sql,
    "q34_ann_brute" -> q34Sql,
    "q35_ann_ivf" -> q35Sql,
    // q85 is q35 over the bucketed layout — result-identical, same oracle
    "q85_ann_ivf_indexed" -> q35Sql,
    "q86_semantic_dedup" -> q86Sql,
    // q87's oracle is the FLAT argmin: hash-exact == proof that the
    // forced two-level path reproduces it bit-for-bit
    "q87_two_level_assign" -> q87Sql,
    "q83_ann_pq" -> q83Sql,
    "q90_ann_ivfpq" -> q90Sql,
    // q91 is q90 over the bucketed code layout — result-identical, same oracle
    "q91_ann_ivfpq_indexed" -> q90Sql,
    "q88_quality_classifier" -> q88Sql,
    "q89_shard_export" -> q89Sql,
    "q52_embed_neardup" -> q52Sql,
    "q36_langid" -> q36Sql,
    "q37_quality" -> q37Sql,
    "q38_tokens" -> q38Sql,
    "q39_fingerprint" -> q39Sql,
    "q40_embed_norm" -> q40Sql,
    "q41_media_decode" -> q41Sql,
    "q53_media_frames" -> q53Sql,
    "q42_normalize" -> q42Sql,
    "q44_corpus_profile" -> q44Sql,
    "q54_len_quantiles" -> q54Sql,
    "q55_pii_scrub" -> q55Sql,
    "q56_repetition" -> q56Sql,
    "q57_split" -> q57Sql,
    "q58_weighted_sample" -> q58Sql,
    "q59_packing" -> q59Sql,
    "q65_approx_profile" -> q65Sql,
    "q68_stratified_sample" -> q68Sql,
    "q69_decontaminate" -> q69Sql,
    "q70_char_entropy" -> q70Sql,
    "q49_vocab" -> q49Sql,
    "q50_bigrams" -> q50Sql,
    "q51_tfidf" -> q51Sql,
    "q92_bm25_topk" -> q92Sql,
    "q93_ann_sq8" -> q93Sql,
    "q94_hybrid_rrf" -> q94Sql,
    "q95_link_graph" -> q95Sql,
    "q96_pagerank" -> q96Sql,
    "q97_priority_sample" -> q97Sql,
    "q98_zorder_box" -> q98Sql,
    "q99_zorder_tight" -> q99Sql,
    "q100_random_walks" -> q100Sql,
    "q101_countmin" -> q101Sql,
    // q102 is q92 over the bucketed postings layout — result-identical, same oracle
    "q102_bm25_indexed" -> q92Sql,
    // q103 is q94 with the lexical leg served from the postings index —
    // result-identical, same oracle
    "q103_hybrid_indexed" -> q94Sql,
    "q104_chunking" -> q104Sql,
    "q105_personalized_pr" -> q105Sql,
    "q106_chunk_dedup" -> q106Sql,
    "q107_wordpiece" -> q107Sql,
    "q108_pagerank_directed" -> q108Sql,
    "q109_heavy_hitters" -> q109Sql,
    "q110_long_walks" -> q110Sql,
    "q111_subword_trained" -> q111Sql,
    "q112_citation_pagerank" -> q112Sql,
    "q113_lsh_incremental" -> q113Sql,
    "q114_hist_quantiles" -> q114Sql,
    "q115_citation_communities" -> q115Sql,
    "q116_corpus_diff" -> q116Sql,
    "q117_shard_checksums" -> q117Sql,
    "q118_triangles" -> q118Sql,
    "q119_containment" -> q119Sql,
    "q120_weighted_pagerank" -> q120Sql,
    "q121_hits" -> q121Sql,
    "q122_kcore" -> q122Sql,
    "q123_bfs_distances" -> q123Sql,
    "q124_seq_packing" -> q124Sql,
    "q125_collocations" -> q125Sql,
    "q126_temp_mixture" -> q126Sql,
    "q127_anchor_terms" -> q127Sql,
    "q128_label_prop" -> q128Sql,
    "q129_training_recipe" -> q129Sql,
    "q130_media_phash_dedup" -> q130Sql,
    "q131_token_shards" -> q131Sql,
    "q132_lang_segments" -> q132Sql,
    "q133_keep_best" -> q133Sql,
    "q134_rank_quantiles" -> q134Sql,
    "q135_modularity_communities" -> q135Sql,
    "q136_image_codec_hash" -> q136Sql,
    "q137_pagerank_warm" -> q137Sql,
    "q138_alpha_mixture" -> q138Sql,
    "q139_louvain_multilevel" -> q139Sql,
    "q140_citation_index_edges" -> q140Sql,
    "q141_incr_graph_pipeline" -> q141Sql,
    "q142_citation_deletes" -> q142Sql,
    "q143_delete_warm_pagerank" -> q143Sql,
    "q144_lsh_delete_probe" -> q144Sql,
    "q145_bm25_delete_probe" -> q145Sql,
    "q146_ivf_delete_probe" -> q146Sql,
    "q147_ivfpq_delete_probe" -> q147Sql,
    "q148_citation_compact_serve" -> q148Sql,
    "q149_cluster_store" -> q149Sql,
    "q150_cluster_deletes" -> q150Sql,
    "q151_cluster_compact_serve" -> q151Sql,
    "q152_zorder_lifecycle" -> q152Sql,
    "q153_louvain_warm" -> q153Sql,
    "q154_theta_overlap" -> q154Sql,
    "q155_cascade_rerank" -> q155Sql,
    "q156_lsh_upsert_probe" -> q156Sql,
    "q157_bm25_upsert_probe" -> q157Sql,
    "q158_ivf_upsert_probe" -> q158Sql,
    "q159_ivfpq_upsert_probe" -> q159Sql,
    "q160_citation_upsert_edges" -> q160Sql,
    "q161_cluster_upsert" -> q161Sql,
    "q162_zorder_upsert" -> q162Sql,
    "q163_citation_cdc_lifecycle" -> q163Sql,
    "q164_cluster_asof" -> q164Sql,
    "q165_cluster_cdc_serve" -> q165Sql,
    "q166_cluster_diff" -> q166Sql,
    "q167_cluster_change_feed" -> q167Sql,
    "q168_ivf_cdc_lifecycle" -> q168Sql,
    "q181_ivf_asof" -> q181Sql,
    "q182_ivfpq_asof" -> q182Sql,
    "q183_zorder_asof" -> q183Sql,
    "q184_zorder_change_feed" -> q184Sql,
    "q185_lsh_change_feed" -> q185Sql,
    "q186_bm_change_feed" -> q186Sql,
    "q187_ivf_change_feed" -> q187Sql,
    "q188_ivfpq_change_feed" -> q188Sql,
    "q189_hybrid_asof_manifest" -> q189Sql,
    "q190_pinned_maintenance" -> q190Sql,
    "q191_run_restore" -> q191Sql,
    "q192_kmeans_sampled" -> q192Sql,
    "q193_ivfpq_handle_asof" -> q193Sql,
    "q194_handle_refuse_reopen" -> q194Sql,
    "q195_ivfpq_compacted" -> q195Sql,
    "q169_bm25_cdc_lifecycle" -> q169Sql,
    "q170_lsh_cdc_lifecycle" -> q170Sql,
    "q171_ivfpq_cdc_lifecycle" -> q171Sql,
    "q172_zorder_cdc_lifecycle" -> q172Sql,
    "q173_boilerplate_excision" -> q173Sql,
    "q174_citation_asof" -> q174Sql,
    "q175_citation_change_feed" -> q175Sql,
    "q176_zorder_3d" -> q176Sql,
    "q177_ivf_drift" -> q177Sql,
    "q178_louvain_multilevel_warm" -> q178Sql,
    "q179_lsh_asof" -> q179Sql,
    "q180_bm25_asof" -> q180Sql,
  )
}
