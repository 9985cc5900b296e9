package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (parity
  * surface or mandated extension); [[oracleSql]] holds the DuckDB-equivalent
  * SQL over the same parquet tables. Column names and types are kept
  * identical between the Spark result and the oracle (the driver sorts
  * columns by name and hash-compares values). Hash-based operators (MinHash,
  * SimHash, fingerprints) use the engine-portable integer hash family in
  * [[graft.functions.HashFunctions]] precisely so they remain oracle-exact.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BookQuery.referenceScores(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** The exported one-file-per-document text corpus for this SF — fixture
    * dirs keyed on the source table's file fingerprint, so regenerated
    * testdata gets a fresh export instead of a stale _SUCCESS-marked one,
    * and superseded exports are reclaimed.
    */
  private def wtCorpusDir(s: SparkSession, dir: String): String = {
    val corpus = fingerprintedDir(dir, "graft_wtcorpus", Seq("documents.parquet"))
    Tables.exportTextCorpus(Tables.documents(s, dir), corpus)
    corpus
  }

  /** THE derivation of a fingerprinted artifact directory under the
    * configurable store root ([[Tables.artifactRoot]]) — the one copy
    * of the naming + stale-reclaim scheme every persisted index/export
    * entry routes through:
    * `<root>/<prefix>_<sf>_<fp(file1)>[_<fp(file2)>…]`, superseded
    * fingerprints of the same prefix reclaimed. Multiple files because
    * id-aligned twin tables (documents + embeddings) must BOTH
    * invalidate an artifact built over the pair.
    */
  private[graft] def fingerprintedDir(dir: String, prefix: String,
      files: Seq[String]): String = {
    val sfName = new java.io.File(dir).getName
    val base = s"${prefix}_${sfName}_"
    val keep = base + files.map(f =>
      java.lang.Long.toHexString(Tables.datasetFingerprint(s"$dir/$f"))).mkString("_")
    // the configurable artifact-store root (r16 — GRAFT_ARTIFACT_ROOT /
    // spark.graft.artifactRoot, tmpdir default): every standing artifact
    // derivation routes through here, so one setting moves the whole
    // store onto a shared filesystem
    val root = Tables.artifactRoot
    // block count anchored to files.size: a sibling dataset whose name
    // extends this one with a hex-only segment parses as MORE blocks and
    // is left alone (the sf1-vs-sf1_7a hazard)
    Tables.cleanStaleExports(root, base, keep, blocks = files.size)
    s"$root/$keep"
  }

  /** One BPE training per (dataset, 8 rounds), memoized for the sweep —
    * the four `text_bpe_*` entries all read this model instead of each
    * retraining it (the train-once discipline; training is deterministic,
    * so the memo changes cost, never results). Keyed per DIR with the
    * documents table's file fingerprint validating the cached value, so
    * regenerated testdata invalidates (and replaces) the entry. Value =
    * the collected merge-table rows (≤ 8 — model scale, not data scale).
    */
  private val bpeModelMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Array[org.apache.spark.sql.Row])]()

  private def bpeModelRows(s: SparkSession, dir: String): Array[org.apache.spark.sql.Row] = {
    // ONE entry per dir (the cleanStaleExports discipline for the in-memory
    // memo): a regenerated dataset REPLACES the dir's entry instead of
    // accumulating a stale fingerprint key per generation in a long JVM
    val fp = java.lang.Long.toHexString(
      Tables.datasetFingerprint(s"$dir/documents.parquet"))
    bpeModelMemo.compute(dir, (_, prev) =>
      if (prev != null && prev._1 == fp) prev
      else (fp, TextAnalysis.bpeMerges(Tables.documents(s, dir))
        .orderBy("merge_round").collect()))._2
  }

  /** The memoized trained merge table as a DataFrame (the
    * `text_bpe_merges` entry surface). */
  private def bpeModelFor(s: SparkSession, dir: String): DataFrame =
    s.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(bpeModelRows(s, dir): _*)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("merge_round",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("lhs",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("rhs",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("merged",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("pair_count",
          org.apache.spark.sql.types.LongType, nullable = false))))

  /** The memoized merge list in training order (serve-side model input). */
  private def bpeMergesFor(s: SparkSession, dir: String): Seq[(String, String)] =
    bpeModelRows(s, dir)
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toIndexedSeq

  /** One quality-classifier GD training per (dataset, trainer mechanism),
    * memoized for the entry family — the [[bpeModelMemo]] discipline
    * applied to the classifier (r16 opt: each of the four registered
    * entries was re-running the eager 3-round training per call, ~1.1–2.8 s
    * of construct time each at sf0.1). Training is deterministic (fixed
    * fold orders, decimal-summed gradients), so the memo changes cost,
    * never results; the value is the dims+1 weight array — model scale.
    * The literal and wide trainers memoize SEPARATELY: the wide entry
    * exists to exercise the table-weight mechanism, so it still trains
    * through it (once per dataset), spec-pinned bit-identical at 16 dims.
    */
  private val classifierModelMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (String, Array[Double])]()

  private def classifierWeightsArrFor(s: SparkSession, dir: String,
      wide: Boolean): Array[Double] = {
    val fp = java.lang.Long.toHexString(
      Tables.datasetFingerprint(s"$dir/documents.parquet"))
    // the multi-second eager training runs OUTSIDE the map lock (r17,
    // ADVICE r16 — the Tables.table get/validate/put pattern): compute()
    // would hold the bin lock for the training's duration, serializing
    // concurrent constructions whose keys share a bin. Training is
    // deterministic, so the worst a lost race costs is one redundant
    // training; the put still swaps atomically.
    val key = (dir, if (wide) "wide" else "lit")
    val cached = classifierModelMemo.get(key)
    if (cached != null && cached._1 == fp) cached._2
    else {
      val w =
        if (wide) TextAnalysis.trainClassifierWide(Tables.documents(s, dir), 16, 3, 4.0)
        else TextAnalysis.trainClassifier(Tables.documents(s, dir), 16, 3, 4.0)
      classifierModelMemo.put(key, (fp, w))
      w
    }
  }

  /** The ONE derivation of a persisted k-means quantizer's directory:
    * training params + dataset fingerprint in the name (an index trained
    * under different params or data can never be served), stale
    * fingerprints reclaimed. Every quantizer-backed entry MUST route
    * through this — two hand-maintained copies drifting apart would
    * silently split the shared index into per-entry retrains
    * (spec-asserted: running `embed_cluster_balance` after
    * `embed_knn_kmeans` adds zero trainings).
    */
  private[graft] def kmeansIndexDirFor(dir: String, nClusters: Int, iters: Int,
      samplePct: Option[Int] = None): String = {
    val sp = samplePct.map(p => s"sp$p").getOrElse("")
    fingerprintedDir(dir, s"graft_kmidx_c${nClusters}i$iters$sp", Seq("embeddings.parquet"))
  }

  /** The sized family's quantizer dir — ONE derivation shared by the
    * sized kNN serve, the IVF-cell graph, and both recall twins, so the
    * whole family trains once per dataset (spec-pinned zero extra
    * trainings). The cell count is deliberately NOT in the name: it
    * derives deterministically from the fingerprinted data (⌈√N⌉ inside
    * the persisted fns — one count, one derivation, nothing to drift),
    * and a dataset regenerated at a different N keeps the same prefix so
    * the stale fingerprint IS reclaimed (a c<K>-named prefix would
    * orphan the old K's dir forever).
    */
  private[graft] def sizedKmeansIndexDirFor(dir: String): String =
    fingerprintedDir(dir, "graft_kmidx_sized_i2", Seq("embeddings.parquet"))

  /** THE standing vector-store artifact's dir (r14): the full-corpus
    * sized payload-carrying IVF index every registered vector default
    * serves from ([[graft.operators.EmbeddingSearch.ensureStandingIvfIndex]]
    * — kNN, filtered, MIPS, and sound range share the one build). Keeps
    * the r13 filtered-serve prefix, so existing cached indexes keep
    * serving and the promotion costs zero extra trainings.
    */
  private[graft] def standingIvfIndexDirFor(dir: String): String =
    fingerprintedDir(dir, "graft_ivfmeta_szi2", Seq("embeddings.parquet"))

  /** The PQ family's shared codebook dir (m=4, ksub=4, iters=2, full
    * training set) — `embed_knn_pq`, `embed_knn_pq_refine`, and
    * `embed_pq_recall` all serve from this ONE persisted training (the
    * [[sizedKmeansIndexDirFor]] discipline applied to the PQ artifact).
    */
  private[graft] def pqIndexDirFor(dir: String): String =
    fingerprintedDir(dir, "graft_pqidx_m4k4i2", Seq("embeddings.parquet"))

  /** The composed IVF-PQ index's directory (coarse quantizer + PQ
    * codebooks under one `_DONE` token) — r16 opt: `embed_knn_ivfpq` and
    * `embed_ivfpq_recall` were the last quantizer-backed entries still
    * re-TRAINING per call (~2.5 s construct each at sf0.1, two coarse +
    * two PQ trainings per bench pass); they now route through
    * [[graft.operators.EmbeddingSearch.ivfPqTopKPersisted]], spec-pinned
    * row-identical to fresh training. Params in the name, stale
    * fingerprints reclaimed — the [[pqIndexDirFor]] discipline.
    */
  private[graft] def ivfPqIndexDirFor(dir: String): String =
    fingerprintedDir(dir, "graft_ivfpqidx_c8i2m4k4", Seq("embeddings.parquet"))

  /** The ONE derivation of the persisted BM25 index's directory (the
    * [[kmeansIndexDirFor]] discipline): dataset fingerprint in the name,
    * stale fingerprints reclaimed, every lexical-serve entry routes
    * through it so the tokenize pass runs once per dataset. `suffix`
    * separates the full-corpus serve index from the incremental entry's
    * build-then-extend index (different construction histories must not
    * share a dir).
    */
  private[graft] def bm25IndexDirFor(dir: String, suffix: String = ""): String =
    fingerprintedDir(dir, s"graft_bm25idx$suffix", Seq("documents.parquet"))

  /** The forget-then-serve entry's index-PAIR root: both retrieval
    * artifacts (BM25 postings under `bm/`, IVF vectors under `ivf/`) live
    * under one dir whose name carries BOTH dataset fingerprints — the
    * tables are id-aligned twins, but a regenerated embeddings file with
    * an unchanged documents file must still invalidate the pair.
    */
  private[graft] def hybridForgetDirFor(dir: String): String =
    // v2: the r12 forget rewrite PRESERVES partition layouts — a cached
    // pre-r12 pair (flattened by the old forget) would serve rows
    // identically but measure the un-pruned plan forever; the version
    // bump retires those dirs
    fingerprintedDir(dir, "graft_hybfgt_v2", Seq("documents.parquet", "embeddings.parquet"))

  /** The ONE derivation of the persisted FULL-corpus IVF index's
    * directory — the vector-store artifact the hybrid serves read
    * (distinct from `graft_ivfinc_*`, which indexes the 4/5 split for
    * the incremental-kNN entry).
    */
  private[graft] def ivfFullIndexDirFor(dir: String, nClusters: Int = 8,
      iters: Int = 2): String =
    fingerprintedDir(dir, s"graft_ivffull_c${nClusters}i$iters", Seq("embeddings.parquet"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity (SURVEY.md §2.1) —
    "book_query_ref" -> ((s, dir) =>
      BookQuery.referenceScores(Tables.documents(s, dir))),
    // the flagship generalized to a query SET: one corpus scan scores all
    // queries with per-query reference semantics
    "book_query_batch" -> ((s, dir) =>
      BookQuery.referenceScoresBatch(Tables.documents(s, dir))),
    "book_query_jaccard" -> ((s, dir) =>
      BookQuery.jaccardScores(Tables.documents(s, dir))),
    "book_query_topk" -> ((s, dir) =>
      BookQuery.topK(BookQuery.referenceScores(Tables.documents(s, dir)), "score", 10)),
    "book_query_wholetext" -> ((s, dir) => {
      // The reference's REAL user entry: a directory of one-doc text files
      // (BookQuery.java:44-61,216-226). The corpus dir is materialized once
      // per SF from the documents table (fixture export), re-ingested
      // through the wholetext source, and scored by the same pipeline — so
      // the ingestion path is oracle-checked end-to-end against the same
      // SQL as book_query_ref.
      import org.apache.spark.sql.functions.col
      val corpus = wtCorpusDir(s, dir)
      // Ingest ONCE as a MATERIALIZED parquet job — the reference's own
      // ingest-then-query shape (BookQuery.java:216-226). The scoring
      // pipeline reads the corpus from several plan branches (n-count,
      // query row, corpus side); re-opening thousands of small text files
      // per branch is the one cost a file-per-doc source should pay a
      // single time, and a parquet materialization pays it WITHOUT pinning
      // the corpus in executor block-manager storage the way a full-corpus
      // localCheckpoint did (VERDICT r2 item 2) — at 100 TB the ingest is
      // just another distributed job, fault-tolerant and restartable.
      // Rides the custom DSv2 source (doc_id in the source schema, pruning
      // to the reader); the v1 wholetext path is equivalence-tested in
      // SourceSinkSpec.
      val ingested = s"$corpus.ingest.parquet"
      if (!Tables.markerExists(ingested, "_SUCCESS"))
        Tables.wholeTextDocumentsV2(s, corpus)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .write.mode("overwrite").parquet(ingested)
      BookQuery.referenceScores(s.read.parquet(ingested))
    }),
    // — generalized similarity join (SURVEY.md §7.3) —
    "simjoin_allpairs" -> ((s, dir) =>
      SimilarityJoin.allPairsJaccard(Tables.documents(s, dir), tau = 0.7)),
    // directed containment join: subset-duplicates (excerpts/truncations)
    // that Jaccard dedup structurally misses
    "simjoin_containment" -> ((s, dir) =>
      SimilarityJoin.containmentPairs(Tables.documents(s, dir), tau = 0.8)),
    // Ed-Join: catalog-reconciliation shape — distinct part names within
    // edit distance 2, q-gram prefix candidates, no cartesian product
    "simjoin_edit_distance" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val counts = Tables.part(s, dir).groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_parts"))
      SimilarityJoin.editDistancePairs(counts.select(col("name")), maxDist = 2)
        .join(broadcast(counts.select(col("name").as("name_a"), col("n_parts").as("n_a"))), "name_a")
        .join(broadcast(counts.select(col("name").as("name_b"), col("n_parts").as("n_b"))), "name_b")
        .select(col("name_a"), col("name_b"), col("edit_dist"), col("n_a"), col("n_b"))
    }),
    // — dedup surface (SURVEY.md §7.4) —
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir))),
    // SURVEY §7.4's sha2(normalized_text) form: whitespace/case-insensitive
    // exact dedup (normalization rules documented at Dedup.normalizeText)
    "dedup_exact_normalized" -> ((s, dir) =>
      Dedup.exactGroupsNormalized(Tables.documents(s, dir))),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), tau = 0.7)),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), maxDist = 3)),
    // sketch-accuracy measurement loop: signature-agreement estimate (ppm
    // integer) vs true Jaccard, over exactly the LSH candidate population
    "dedup_minhash_accuracy" -> ((s, dir) =>
      Dedup.minhashAccuracy(Tables.documents(s, dir))),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), tau = 0.8, n = 2)),
    // tau is data-dependent: the synthetic embeddings carry no true
    // near-dups (max candidate cosine ≈ 0.48), so the entry runs at 0.4 to
    // exercise the full bucket→verify path with non-trivial output.
    // DEFAULT = the COUNT-GATED auto (r16, the r15 verdict's top item):
    // the pairs-recall eval measured NO inversion — the cells arm wins
    // recall at every point (0.91-0.99 vs the banded 0.16-0.35, the
    // sign-LSH moderate-angle ceiling) and the wall past 32k-128k — so
    // the measured gate is 0 and the auto serves the cells arm from the
    // first vector; the oracle is the count-gated UNION ALL of both
    // arm replays (the knnJoinAuto discipline)
    "dedup_embedding" -> ((s, dir) =>
      EmbeddingSearch.cosineNearDupPairsAuto(s, dir, tau = 0.4,
        sizedKmeansIndexDirFor(dir))),
    // the demoted occupancy-sized BANDED arm (8 bands × rpb bits, rpb =
    // min r with 32·2^r ≥ N): linear candidate volume, but probe-pair
    // recall ≤ 0.35 measured at τ=0.4 — kept as an explicit arm for
    // high-τ corpora where sign bands do hold
    "dedup_embedding_banded" -> ((s, dir) =>
      EmbeddingSearch.cosineNearDupPairsScaled(s, dir, tau = 0.4)),
    // the fixed 16-value band config, kept as an explicitly-named variant:
    // fine for a known-small static corpus, carries the measured x16 cliff
    "dedup_embedding_fixed" -> ((s, dir) =>
      EmbeddingSearch.cosineNearDupPairs(s, dir, tau = 0.4)),
    // the IVF-CELL candidate arm (r15, the x64 slope diagnosis's remedy:
    // banded candidates measured 15.5x on 4x data on the clustered
    // corpus — cluster mass the occupancy rule cannot hold — while the
    // cells bound is nprobe*N/cells ~ 2sqrt(N)/vector, 45x fewer at
    // 128k). Since r16 also the auto default's selected arm at every N.
    "dedup_embedding_cells" -> ((s, dir) =>
      EmbeddingSearch.cosineNearDupPairsCells(s, dir, tau = 0.4,
        sizedKmeansIndexDirFor(dir))),
    // the gated evidence for the default flip: probe-pair recall of the
    // auto against the exact τ-set on 100 probe vectors (the
    // embed_*_recall discipline applied to PAIR retrieval)
    "dedup_embedding_pairs_recall" -> ((s, dir) =>
      EmbeddingSearch.cosineNearDupPairsAutoRecall(s, dir, tau = 0.4,
        sizedKmeansIndexDirFor(dir))),
    // both arms' recall twins under their explicit names (the
    // embed_knn_join_banded/_cells discipline): the no-inversion
    // evidence is itself a hash-gated registered surface, not just a
    // ScaleBench row
    "dedup_embedding_banded_recall" -> ((s, dir) =>
      EmbeddingSearch.nearDupPairsRecall(s, dir,
        EmbeddingSearch.cosineNearDupPairsScaled(s, dir, tau = 0.4), 0.4)),
    "dedup_embedding_cells_recall" -> ((s, dir) =>
      EmbeddingSearch.nearDupPairsRecall(s, dir,
        EmbeddingSearch.cosineNearDupPairsCells(s, dir, tau = 0.4,
          sizedKmeansIndexDirFor(dir)), 0.4)),
    // SemDeDup (Abbas et al. '23): EXACT within-cell cosine pruning over
    // the trained partition itself — recall inside a cell is 1 by
    // construction (contrast dedup_embedding's LSH-candidate mining) and
    // the keep-earliest verdict is part of the operator. Served from the
    // sized family's ONE persisted ⌈√N⌉-cell quantizer (E[cluster] ≈ √N
    // holds the exact pair term at N^1.5; zero extra trainings
    // spec-pinned); tau 0.35 for the same no-true-near-dups reason as
    // dedup_embedding above. Oracle replays the sized Lloyd + pair scan.
    "dedup_semantic" -> ((s, dir) =>
      EmbeddingSearch.semDedupPersisted(s, dir, sizedKmeansIndexDirFor(dir))),
    // the CC loop consumes the pairs EAGERLY at construction, so the
    // shingle-set frame the pair pipeline reads 3-5× is shared through a
    // scope-bounded persist (Dedup.withSharedShingleSets, r17) — one
    // tokenize+shingle pass instead of several, cache dropped on return
    "dedup_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.withSharedShingleSets(docs) { sets =>
        Dedup.dedupClusters(docs,
          SimilarityJoin.pairsFromSets(sets, tau = 0.7, hashPrefilter = true)) }
    }),
    // SOFT dedup: every doc kept at training weight 1/|near-dup cluster| —
    // one expected document of loss per duplicate family instead of
    // dropping (the data-constrained-scaling discipline)
    "dedup_soft_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.withSharedShingleSets(docs) { sets =>
        Dedup.softDedupWeights(docs,
          SimilarityJoin.pairsFromSets(sets, tau = 0.7, hashPrefilter = true)) }
    }),
    // same clustering over the SUB-QUADRATIC candidate path (MinHash-LSH
    // pairs instead of the exact all-pairs join) — the composition a 100 TB
    // dedup actually runs; oracle replays LSH banding + closure
    "dedup_clusters_lsh" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.withSharedShingleSets(docs) { sets =>
        Dedup.dedupClusters(docs, Dedup.minhashLshPairsFromSets(sets, tau = 0.7)) }
    }),
    // SimHash-fed clusters: the always-on cheap near-dup tier composed with
    // the same connected-components keeper pass
    "dedup_clusters_simhash" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.dedupClusters(docs, Dedup.simhashPairs(docs))
    }),
    // keep-policy surface: survive the LONGEST member of each dup cluster
    // (curation keeps the full doc, not whichever truncation came first)
    "dedup_clusters_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.withSharedShingleSets(docs) { sets =>
        Dedup.dedupClustersKeepLongest(docs,
          Dedup.minhashLshPairsFromSets(sets, tau = 0.7)) }
    }),
    // incremental dedup — new-batch-vs-corpus, the production ingest shape:
    // the first 4/5 of documents play the already-indexed corpus (index
    // persisted once, fingerprint-keyed, reused across JVMs), the last 1/5
    // plays today's batch; oracle recomputes both tiers from the two splits
    "dedup_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val split = docs.count() * 4 / 5
      val sfName = new java.io.File(dir).getName
      // s3 = index-format tag (sets/ carries hs31+hs62 AND the index
      // self-describes via _PARAMS): an index written under an older
      // format must never be served, so the tag is part of the prefix and
      // legacy-prefix dirs are reclaimed like any stale export
      val idx = fingerprintedDir(dir, "graft_dedupidx_s3h64b16k3", Seq("documents.parquet"))
      for (legacy <- Seq(s"graft_dedupidx_h64b16k3_${sfName}_", s"graft_dedupidx_s2h64b16k3_${sfName}_"))
        Tables.cleanStaleExports(Tables.artifactRoot, legacy, legacy + "-")
      if (!Dedup.dedupIndexExists(s, idx))
        Dedup.buildDedupIndex(docs.where(col("doc_id") < split), idx)
      Dedup.dedupAgainst(idx, docs.where(col("doc_id") >= split), tau = 0.7)
    }),
    // right-to-be-forgotten: build the corpus index, FORGET ids ≡ 0 mod 7,
    // then serve the batch — forgotten docs must never surface as keepers;
    // the _FORGOTTEN marker makes the cached build+forget pair atomic as a
    // unit (a crash between the steps rebuilds from scratch)
    "dedup_forget_serve" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val split = docs.count() * 4 / 5
      val idx = fingerprintedDir(dir, "graft_dedupfgt_s3h64b16k3", Seq("documents.parquet"))
      val marker = new org.apache.hadoop.fs.Path(idx, "_FORGOTTEN")
      val fs = marker.getFileSystem(org.apache.spark.sql.GraftShim.sessionHadoopConf())
      if (!Dedup.dedupIndexExists(s, idx) || !fs.exists(marker)) {
        fs.delete(new org.apache.hadoop.fs.Path(idx), true)
        Dedup.buildDedupIndex(docs.where(col("doc_id") < split), idx)
        Dedup.forgetFromDedupIndex(s, idx,
          docs.where(col("doc_id") < split && col("doc_id") % 7 === 0)
            .select(col("doc_id")))
        fs.create(marker, true).close()
      }
      Dedup.dedupAgainst(idx, docs.where(col("doc_id") >= split), tau = 0.7)
    }),
    // — text analysis (SURVEY.md §7.6) —
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityStats(Tables.documents(s, dir))),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.languageId(Tables.documents(s, dir))),
    // classifier evaluation: labeled-vs-predicted confusion with ppm shares
    "text_lang_confusion" -> ((s, dir) =>
      TextAnalysis.langConfusion(Tables.documents(s, dir))),
    // vocabulary rank-frequency shape, log2-bucketed
    "text_zipf" -> ((s, dir) =>
      TextAnalysis.zipfProfile(Tables.documents(s, dir))),
    "text_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.documents(s, dir))),
    "text_fingerprints" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir))),
    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), kTop = 3)),
    "text_ngram_freq" -> ((s, dir) =>
      TextAnalysis.ngramFrequencies(Tables.documents(s, dir), n = 3, kTop = 20)),
    "text_gram_df_salted" -> ((s, dir) =>
      TextAnalysis.saltedGramCounts(Tables.documents(s, dir), n = 3, minDf = 5)),
    "text_lang_minhash" -> ((s, dir) =>
      TextAnalysis.langMinhash(Tables.documents(s, dir))),
    "text_source_stats" -> ((s, dir) =>
      TextAnalysis.sourceStats(Tables.documents(s, dir))),
    "text_quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(Tables.documents(s, dir))),
    // CCNet-style line-level boilerplate removal: lines (10-token chunks
    // here; \n-split in real corpora) appearing in 2+ docs drop everywhere
    "text_line_dedup" -> ((s, dir) =>
      TextAnalysis.lineDedup(Tables.documents(s, dir))),
    // PII redaction: the fixture corpus is PII-free, so the entry splices
    // deterministic doc_id-derived emails/phones/URLs in first (the
    // multimodal family's synthesize-in-query discipline), then scrubs
    "text_pii_scrub" -> ((s, dir) =>
      TextAnalysis.piiScrub(TextAnalysis.piiInject(Tables.documents(s, dir)))),
    // — LLM-pipeline hygiene (round-3 widening): repetition rules,
    //   benchmark decontamination, exact-substring sharing —
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(Tables.documents(s, dir))),
    "text_decontaminate" -> ((s, dir) =>
      TextAnalysis.decontaminate(Tables.documents(s, dir))),
    // the transitive tier: flagged set closed over near-dup edges via a
    // Spark 4 recursive CTE (bounded hops; min-hop distance per doc).
    // nEval=50 so the flagged set is benchmark-sized on this fixture; the
    // multi-hop chain itself is pinned by the spec's paraphrase-chain corpus
    "text_decontaminate_spread" -> ((s, dir) =>
      TextAnalysis.contaminationSpread(Tables.documents(s, dir), nEval = 50)),
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringShared(Tables.documents(s, dir))),
    // — non-parquet sources under the driver's hash gate (the same
    //   export-once / re-ingest / must-match-the-parquet-oracle shape as
    //   book_query_wholetext, for the CSV and JSON readers) —
    "source_csv_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val sfName = new java.io.File(dir).getName
      val out = Tables.exportOnce(s"$dir/customer.parquet", s"graft_csvfix_${sfName}_",
        p => Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
          .write.mode("overwrite").option("header", "true").csv(p))
      // explicit schema: inference would re-scan and could widen types
      s.read.option("header", "true")
        .schema("c_custkey LONG, c_nationkey INT, c_acctbal DOUBLE")
        .csv(out)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
    }),
    "source_json_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val sfName = new java.io.File(dir).getName
      val out = Tables.exportOnce(s"$dir/orders.parquet", s"graft_jsonfix_${sfName}_",
        p => Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .write.mode("overwrite").json(p))
      s.read.schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
        .json(out)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }),
    // PERMISSIVE-mode malformed-record tolerance: every 7th order's JSON
    // line is deterministically TRUNCATED mid-object at export; the read
    // must route those rows to _corrupt_record (not fail the scan, not
    // silently drop) and keep every well-formed row bit-intact — the
    // oracle replays the corruption rule from the parquet table
    "source_json_corrupt" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val sfName = new java.io.File(dir).getName
      val out = Tables.exportOnce(s"$dir/orders.parquet", s"graft_jsoncorr_${sfName}_",
        p => {
          val j = to_json(struct(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
          Tables.orders(s, dir)
            .select(when(col("o_orderkey") % 7 === 0,
                substring(j, lit(1), length(j) - 2)).otherwise(j).as("value"))
            .write.mode("overwrite").text(p)
        })
      s.read
        .schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
        .select(when(col("_corrupt_record").isNotNull, lit("corrupt"))
          .otherwise(col("o_orderstatus")).as("status_bucket"), col("o_totalprice"))
        .groupBy(col("status_bucket"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }),
    "source_orc_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val sfName = new java.io.File(dir).getName
      val out = Tables.exportOnce(s"$dir/part.parquet", s"graft_orcfix_${sfName}_",
        p => Tables.part(s, dir).select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
          .write.mode("overwrite").orc(p))
      s.read.schema("p_partkey LONG, p_brand STRING, p_retailprice DOUBLE")
        .orc(out)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    }),
    // point lookups through the custom DSv2 source's doc_id filter
    // pushdown: the predicate prunes the FILE LISTING at planning time
    // (3 files opened out of the corpus; SourceSinkSpec asserts counts),
    // and the oracle hash-checks the looked-up content byte-for-byte
    "source_v2_point_lookup" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Tables.wholeTextDocumentsV2(s, wtCorpusDir(s, dir))
        .where(col("doc_id").isin("7", "11", "42"))
        .select(col("doc_id").cast("long").as("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          md5(col("text")).as("text_hash"))
    }),
    // the DSv2 WRITE path: publish the documents table as a doc-per-file
    // corpus through the graft-text sink (two-phase staged commit), then
    // read it back through the graft-text source — write+read both
    // optimizer-visible; export-once keyed on the source fingerprint
    "source_v2_write_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val out = Tables.exportOnce(s"$dir/documents.parquet", "graft_v2write_", p =>
        Tables.documents(s, dir)
          .selectExpr("CAST(doc_id AS STRING) AS doc_id", "text")
          .write.format("graft-text").mode("overwrite").save(p))
      s.read.format("graft-text").load(out)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    }),
    // — corpus assembly: source mixing + token budgeting —
    "corpus_mix" -> ((s, dir) =>
      TextAnalysis.sourceMix(Tables.documents(s, dir),
        Map("src0" -> 1.0, "src1" -> 0.6, "src2" -> 0.3, "src3" -> 0.1))),
    "corpus_budget" -> ((s, dir) =>
      TextAnalysis.tokenBudget(Tables.documents(s, dir), budgetTokens = 800L)),
    // the hot-partition-free deployment shape: per-(source, hash-bucket)
    // windows, so a giant source spreads over nBuckets window partitions
    "corpus_budget_bucketed" -> ((s, dir) =>
      TextAnalysis.tokenBudgetBucketed(Tables.documents(s, dir),
        budgetPerBucket = 300L, nBuckets = 8)),
    // C4-style per-source doc cap with quality-ranked (TTR) retention;
    // grouped top-k runs skew-safe via the lossless two-stage bucket prune
    "corpus_source_cap" -> ((s, dir) =>
      TextAnalysis.sourceCap(Tables.documents(s, dir), cap = 40, nBuckets = 8)),
    "events_transitions" -> ((s, dir) => Events.transitions(s, dir)),
    // — relational surface (SURVEY.md §2.2 checklist) —
    "rel_pricing_summary" -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "rel_shipping_priority" -> ((s, dir) => Relational.shippingPriority(s, dir)),
    "rel_local_supplier" -> ((s, dir) => Relational.localSupplierVolume(s, dir)),
    "rel_top_orders" -> ((s, dir) => Relational.topOrders(s, dir)),
    "rel_bucketed_join" -> ((s, dir) => Relational.bucketedOrderRevenue(s, dir)),
    "rel_salted_join" -> ((s, dir) => Relational.saltedSupplierRevenue(s, dir)),
    // runtime row-level filtering: fact scan pruned by the dim key-set
    // bloom BEFORE the join shuffle; bloom-invariant, oracle = plain join
    "rel_bloom_join" -> ((s, dir) => Relational.bloomPartRevenue(s, dir)),
    // inequality (|a-b|<=eps) join executed as an eps-band equi-join —
    // one hash shuffle instead of the cartesian BNLJ; banding is
    // result-invariant, oracle = plain inequality join
    "rel_band_join" -> ((s, dir) => Relational.acctbalBandPairs(s, dir)),
    // TPC-H Q21 shape, decorrelated by aggregation (ONE lineitem scan
    // replaces the EXISTS/NOT-EXISTS self-joins); the oracle keeps the
    // correlated form, putting the decorrelation under the hash gate
    "rel_waiting_suppliers" -> ((s, dir) => Relational.waitingSuppliers(s, dir)),
    "rel_customer_windows" -> ((s, dir) => Relational.customerOrderWindows(s, dir)),
    "rel_window_funcs" -> ((s, dir) => Relational.windowFunctionSuite(s, dir)),
    "rel_order_stats" -> ((s, dir) => Relational.orderStats(s, dir)),
    "rel_histogram" -> ((s, dir) => Relational.orderValueHistogram(s, dir)),
    "rel_equidepth" -> ((s, dir) => Relational.orderValueEquidepth(s, dir)),
    "rel_null_semantics" -> ((s, dir) => Relational.nullSemantics(s, dir)),
    // the pre-join skew diagnostic: log2-bucketed group-size histogram
    "rel_key_skew" -> ((s, dir) => Relational.joinKeySkew(s, dir)),
    // SLA shape: exact integer day deltas across a fact-fact join
    "rel_ship_delay" -> ((s, dir) => Relational.shippingDelay(s, dir)),
    // operational pass: fragment -> compact -> aggregate the compacted copy;
    // oracle aggregates the original, so the rewrites are hash-gated
    "source_compaction_roundtrip" -> ((s, dir) => Maintenance.compactionRoundtrip(s, dir)),
    // Spark's built-in blob source over the file-per-doc corpus export:
    // the media/whole-doc ingestion front door; every blob's bytes are
    // oracle-replayed from the documents table
    "source_binaryfile_ingest" -> ((s, dir) =>
      Maintenance.binaryFileIngest(s, wtCorpusDir(s, dir))),
    // writers upgrade mid-stream: two on-disk schemas reconciled by one
    // mergeSchema scan; oracle replays the split from the original table
    "source_schema_evolution" -> ((s, dir) => Maintenance.schemaEvolutionRoundtrip(s, dir)),
    // partition expiry as directory deletes (metadata-cost retention);
    // oracle replays the day cutoff as a WHERE over the flat table
    "source_retention_roundtrip" -> ((s, dir) => Maintenance.retentionRoundtrip(s, dir)),
    // read-around-damage: one garbage parquet member rejected at planning,
    // intact files aggregated; oracle aggregates the original table
    "source_corruption_tolerance" -> ((s, dir) => Maintenance.corruptionToleranceRoundtrip(s, dir)),
    // multi-column data-skipping layout: bit-interleaved z-value, range
    // partitioned; layout-invariant aggregate under the hash gate
    "source_zorder_roundtrip" -> ((s, dir) => Maintenance.zorderRoundtrip(s, dir)),
    // value-RANGE frame: 30-day trailing spend/count per order
    "rel_trailing_spend" -> ((s, dir) => Relational.trailingSpend(s, dir)),
    "rel_setops" -> ((s, dir) => Relational.customerSetOps(s, dir)),
    "rel_rollup" -> ((s, dir) => Relational.returnsRollup(s, dir)),
    "rel_distinct_counts" -> ((s, dir) => Relational.distinctCounts(s, dir)),
    "rel_anti_join" -> ((s, dir) => Relational.customersWithoutOrders(s, dir)),
    "rel_semi_join" -> ((s, dir) => Relational.partsWithBigShipments(s, dir)),
    "rel_quantiles" -> ((s, dir) => Relational.orderValueQuantiles(s, dir)),
    // TPC-H Q18/Q19/Q22 shapes: pre-aggregate-then-join HAVING, disjunctive
    // cross-side predicates, and global-scalar + anti-join composition
    "rel_big_spenders" -> ((s, dir) => Relational.bigSpenderOrders(s, dir)),
    "rel_nation_trade" -> ((s, dir) => Relational.nationTradeVolume(s, dir)),
    "rel_bracket_revenue" -> ((s, dir) => Relational.bracketRevenue(s, dir)),
    "rel_idle_customers" -> ((s, dir) => Relational.idleRichCustomers(s, dir)),
    // TPC-H Q10/Q14/Q6 shapes: returned-item top-k with pushed date range,
    // conditional-aggregation promo share (fixed-point ppm), and the pure
    // scan-predicate aggregate whose cost IS the pushed filters
    "rel_returned_customers" -> ((s, dir) => Relational.returnedItemCustomers(s, dir)),
    "rel_promo_revenue" -> ((s, dir) => Relational.promoRevenueShare(s, dir)),
    "rel_filtered_revenue" -> ((s, dir) => Relational.filteredRevenue(s, dir)),
    // Q15 shape: aggregate → 1-row max → broadcast join-back; fixed-point
    // revenue so the equality against the scalar is bit-portable
    "rel_top_supplier" -> ((s, dir) => Relational.topSupplier(s, dir)),
    // point-in-interval lookup join: variable-width brackets band-replicate,
    // points probe one band, exact range filter re-verifies (IP-range shape)
    "rel_interval_join" -> ((s, dir) => Relational.orderBracketLookup(s, dir)),
    // TPC-H Q2/Q8/Q9/Q11/Q13/Q16/Q17 shapes — the remaining classic
    // disciplines: decorrelated argmin join-back (fixed-point price so the
    // winner can't drift), one-pass conditional-agg market share,
    // computed-cost profit rollup, group-vs-global-scalar HAVING in pure
    // integers, left-outer count distribution (the zero bucket the inner
    // join silently drops), NOT-IN distinct-supplier diversity, and the
    // correlated per-group-avg threshold decorrelated by aggregation
    "rel_min_cost_supplier" -> ((s, dir) => Relational.minCostSupplier(s, dir)),
    "rel_market_share" -> ((s, dir) => Relational.marketShare(s, dir)),
    "rel_nation_profit" -> ((s, dir) => Relational.nationProfit(s, dir)),
    "rel_important_parts" -> ((s, dir) => Relational.importantParts(s, dir)),
    "rel_order_count_dist" -> ((s, dir) => Relational.orderCountDistribution(s, dir)),
    "rel_supplier_diversity" -> ((s, dir) => Relational.supplierDiversity(s, dir)),
    "rel_small_qty_revenue" -> ((s, dir) => Relational.smallQtyRevenue(s, dir)),
    // correlated-subquery SQL front door (same ANSI text as the oracle) —
    // proves Catalyst decorrelation: scalar-agg, EXISTS, NOT EXISTS, and
    // the SELECT-list COUNT ("count bug") forms
    "rel_corr_above_avg" -> ((s, dir) => Relational.corrAboveAvgOrders(s, dir)),
    "rel_corr_exists" -> ((s, dir) => Relational.corrLateShippedOrders(s, dir)),
    "rel_corr_not_exists" -> ((s, dir) => Relational.corrNeverBulkParts(s, dir)),
    "rel_corr_scalar_count" -> ((s, dir) => Relational.corrOrderCounts(s, dir)),
    "rel_cube" -> ((s, dir) => Relational.returnsCube(s, dir)),
    "rel_scalar_funcs" -> ((s, dir) => Relational.scalarFunctions(s, dir)),
    "rel_full_outer" -> ((s, dir) => Relational.customerOrdersFullOuter(s, dir)),
    "rel_grouping_sets" -> ((s, dir) => Relational.returnsGroupingSets(s, dir)),
    "rel_pivot" -> ((s, dir) => Relational.ordersPivot(s, dir)),
    // the inverse reshape: wide matrix back to long form via native unpivot
    "rel_unpivot" -> ((s, dir) => Relational.ordersUnpivot(s, dir)),
    "corpus_clean" -> ((s, dir) =>
      TextAnalysis.cleanedCorpus(Tables.documents(s, dir))),
    // the CAPSTONE composition: quality -> decontaminate -> keep-longest
    // near-dup dedup -> per-source token budget, one lazy DAG
    "corpus_curated" -> ((s, dir) =>
      TextAnalysis.curatedCorpus(Tables.documents(s, dir))),
    // the FULL cleaning composition (Lee et al.'s dedup after quality
    // filtering): quality predicate → MinHash-LSH near-dup pairs among the
    // survivors → connected-components keep-first — quality cuts volume
    // BEFORE any pair machinery runs, and exact dups (J=1) ride the same
    // clusters, so no separate exact pass is needed
    "corpus_clean_near" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val surv = Tables.documents(s, dir)
        .where(TextAnalysis.qualityPredicate(col("text")))
      Dedup.withSharedShingleSets(surv) { sets =>
        Dedup.dedupClusters(surv, Dedup.minhashLshPairsFromSets(sets, tau = 0.7)) }
    }),
    "text_sample" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(Tables.documents(s, dir))),
    // the flagship's query shape under Okapi BM25 ranking; fixed-order
    // score folds keep the doubles hash-gated
    // HYBRID retrieval (the RAG serving capstone of the reference's query
    // capability): BM25 lexical ranks + exact-cosine semantic ranks fused
    // by reciprocal-rank — pure integer-rank arithmetic after the two
    // retrievals, fully oracle-replayable
    "text_hybrid_topk" -> ((s, dir) =>
      TextAnalysis.hybridTopK(Tables.documents(s, dir), Tables.embeddings(s, dir))),
    "text_bm25_topk" -> ((s, dir) =>
      TextAnalysis.bm25TopDocs(Tables.documents(s, dir))),
    // the SAME ranking served from the persisted inverted index (postings
    // built once per dataset fingerprint, zero corpus re-tokenization) —
    // identical plan tail, so the oracle is shared verbatim
    "text_bm25_serve" -> ((s, dir) => {
      val p = bm25IndexDirFor(dir)
      TextAnalysis.ensureBm25Index(s, dir, p)
      TextAnalysis.bm25TopDocsWithIndex(s, p)
    }),
    // incremental lexical index maintenance: first 4/5 of doc_ids play the
    // indexed corpus, the rest today's batch APPENDED without touching
    // indexed postings; serve over the union ≡ the full-corpus ranking
    "text_bm25_incremental" -> ((s, dir) =>
      TextAnalysis.bm25Incremental(s, dir, bm25IndexDirFor(dir, suffix = "inc"))),
    // hybrid retrieval served from ARTIFACTS ONLY: persisted postings
    // (lexical) + the persisted IVF index's vector table (semantic).
    // r14 (the r13 verdict's item 4): the DEFAULT is the count-gated
    // auto branch — the exact flat semantic scan below the measured
    // wall inversion (TextAnalysis.hybridProbeCrossover = 65536; full
    // recall, broadcast-scale table), the partition-pruned nprobe=2
    // tier past it (its fused-rank recall
    // measured at 0.83–0.93 by text_hybrid_probed_recall), so the
    // default never reads the vector table corpus-wide at scale. Oracle
    // = count-gated UNION ALL of the two replays; the probed tier keeps
    // its explicit entry below
    "text_hybrid_serve" -> ((s, dir) => {
      val bp = bm25IndexDirFor(dir)
      val ip = ivfFullIndexDirFor(dir)
      TextAnalysis.ensureBm25Index(s, dir, bp)
      EmbeddingSearch.ensureIvfIndex(s, dir, ip)
      TextAnalysis.hybridTopKServedAuto(s, dir, bp, ip)
    }),
    // the PROBED artifact-only serve — the 100 TB configuration of the RAG
    // query path: the semantic tier partition-prunes the cl-partitioned
    // ivf table to the query's nprobe=2 trained cells instead of flat-
    // scanning the corpus vectors; the oracle replays training + probing +
    // probed-cell cosine, and text_hybrid_probed_recall measures what the
    // knob costs the FUSED ranking (1.0 on this fixture — see SCALING.md)
    "text_hybrid_serve_probed" -> ((s, dir) => {
      val bp = bm25IndexDirFor(dir)
      val ip = ivfFullIndexDirFor(dir)
      TextAnalysis.ensureBm25Index(s, dir, bp)
      EmbeddingSearch.ensureIvfIndex(s, dir, ip)
      TextAnalysis.hybridTopKServed(s, bp, ip, nprobe = 2)
    }),
    // the MULTI-QUERY hybrid serve — the retrieval twin of
    // book_query_batch: one pass over the persisted artifacts ranks a
    // whole query SET (the reference's driver re-runs per query,
    // BookQuery.java:176-208 — this is the amortization it never got);
    // external-query semantics, so a query's own doc legitimately ranks #1
    "text_hybrid_batch" -> ((s, dir) => {
      val bp = bm25IndexDirFor(dir)
      val ip = ivfFullIndexDirFor(dir)
      TextAnalysis.ensureBm25Index(s, dir, bp)
      EmbeddingSearch.ensureIvfIndex(s, dir, ip)
      TextAnalysis.hybridServeBatch(TextAnalysis.hybridQuerySet(s, dir, 5), bp, ip)
    }),
    // fused-rank recall of the probed serve vs the exact serve on a
    // 20-query probe set — the measurement that justifies the nprobe=2
    // default (the r9 lesson: never ship an approximation knob without
    // its ground-truth entry); both engines replay BOTH serves end-to-end
    "text_hybrid_probed_recall" -> ((s, dir) => {
      val bp = bm25IndexDirFor(dir)
      val ip = ivfFullIndexDirFor(dir)
      TextAnalysis.ensureBm25Index(s, dir, bp)
      EmbeddingSearch.ensureIvfIndex(s, dir, ip)
      TextAnalysis.hybridProbedRecall(s, dir, bp, ip, nQueries = 20, nprobe = 2)
    }),
    // right-to-be-forgotten across the RAG serving PAIR: build both
    // retrieval artifacts, forget doc_id ≡ 3 mod 7 from postings+doclens
    // AND the IVF vector table in ONE forgetEverywhere manifest, then run
    // the hybrid serve — a forgotten doc must vanish from BOTH fused rank
    // lists and stop contributing to df/N/avgdl (the oracle replays the
    // fusion over the filtered corpus). The quantizer is untouched — the
    // index-vs-model GDPR distinction. _FORGOTTEN makes build+forget
    // atomic as a unit (the dedup_forget_serve discipline).
    "text_hybrid_forget_serve" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, transform}
      // pre-v2 cached pairs were flattened by the old forget rewrite —
      // reclaim them (the keep marker "-" matches no fingerprint)
      val sfName = new java.io.File(dir).getName
      Tables.cleanStaleExports(Tables.artifactRoot,
        s"graft_hybfgt_${sfName}_", s"graft_hybfgt_${sfName}_-")
      val root = hybridForgetDirFor(dir)
      val marker = new org.apache.hadoop.fs.Path(root, "_FORGOTTEN")
      val fs = marker.getFileSystem(org.apache.spark.sql.GraftShim.sessionHadoopConf())
      // layout-version checks ride along (fwd/idmap joined their indexes
      // after the first release): a cached pre-upgrade pair must rebuild,
      // not crash on a missing table mid-serve
      val built = Seq("bm", "ivf").forall(t => fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/$t", "_DONE"))) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$root/bm", "fwd/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(s"$root/ivf", "idmap/_SUCCESS"))
      if (!built || !fs.exists(marker)) {
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        TextAnalysis.buildBm25Index(Tables.documents(s, dir), s"$root/bm")
        EmbeddingSearch.buildIvfIndex(Tables.embeddings(s, dir)
          .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")),
          s"$root/ivf")
        val ids = Tables.documents(s, dir).where(col("doc_id") % 7 === 3)
          .select(col("doc_id")).withColumn("vec_id", col("doc_id"))
        graft.operators.Forget.forgetEverywhere(s, s"$root/_MANIFEST", ids,
          Seq(graft.operators.Forget.bm25Target(s"$root/bm"),
            graft.operators.Forget.ivfTarget(s"$root/ivf")))
        fs.create(marker, true).close()
      }
      TextAnalysis.hybridTopKServed(s, s"$root/bm", s"$root/ivf")
    }),
    // concat-and-chunk sequence packing: per-source prefix sums place every
    // doc into fixed 512-token training sequences (spans included)
    "corpus_pack" -> ((s, dir) =>
      TextAnalysis.packSequences(Tables.documents(s, dir))),
    // content-hash train/val/test assignment: identical texts can never
    // straddle splits; zero-shuffle map projection
    "corpus_split" -> ((s, dir) =>
      TextAnalysis.trainValTestSplit(Tables.documents(s, dir))),
    // cluster-aware split: the fold is the near-dup cluster keeper's
    // bucket, so near-duplicates can never straddle train/test either
    "corpus_split_clustered" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.withSharedShingleSets(docs) { sets =>
        TextAnalysis.trainValTestSplitClustered(docs,
          Dedup.dedupClusters(docs,
            SimilarityJoin.pairsFromSets(sets, tau = 0.7, hashPrefilter = true))) }
    }),
    // packing's hot-partition fix: per-(source, content-hash-bucket)
    // windows, parallelism scales with nBuckets
    "corpus_pack_bucketed" -> ((s, dir) =>
      TextAnalysis.packSequencesBucketed(Tables.documents(s, dir))),
    // RAG chunking: overlapping 64-token windows (16 shared) — the
    // retrieval-corpus build step; zero-shuffle map explode
    "corpus_chunks" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, dir))),
    // content-defined chunking: anchor-token boundaries (hash % target = 0)
    // + anchor-relative max-cap sub-splits — edits shift only chunks up to
    // the next anchor (CDC stability, spec-pinned); one doc-keyed shuffle
    "corpus_chunks_cdc" -> ((s, dir) =>
      TextAnalysis.chunkDocumentsCdc(Tables.documents(s, dir))),
    // chunk-level cross-doc dedup over the CDC chunks (the storage-dedup
    // payoff of content-defined boundaries): one hash-keyed groupBy
    "corpus_chunks_cdc_dedup" -> ((s, dir) =>
      TextAnalysis.cdcChunkDedup(Tables.documents(s, dir))),
    // epoch-reproducible training order: hash of (doc_id, epoch) as the
    // order key — zero-shuffle, checkpoint-resume safe
    "corpus_shuffle" -> ((s, dir) =>
      TextAnalysis.epochShuffle(Tables.documents(s, dir))),
    // weighted Bernoulli sample (importance sampling by token count) —
    // the token-mass-preserving downsample; zero-shuffle map predicate
    "corpus_weighted_sample" -> ((s, dir) =>
      TextAnalysis.weightedSample(Tables.documents(s, dir))),
    // consecutive global training positions WITHOUT a single-partition
    // window: range-partition + parallel local ranks + metadata-scale
    // offset table (the two-phase global-sort-index pattern)
    "corpus_assign_ids" -> ((s, dir) =>
      TextAnalysis.assignGlobalIds(Tables.documents(s, dir))),
    // temperature mix at alpha=1/2 (XLM-R sampling rule): keep fraction
    // sqrt(c_min/c_s) per source, derived from the data — exact because
    // alpha=1/2 needs only IEEE sqrt, never libm pow
    "corpus_mix_temperature" -> ((s, dir) =>
      TextAnalysis.sourceMixTemperature(Tables.documents(s, dir))),
    // DSIR importance weights (Xie et al. 2023): hashed-unigram target/raw
    // log-likelihood ratios — 64-bucket map-combined distribution aggs, a
    // broadcast ratio table, one doc-keyed scoring shuffle; ln of integers
    // at 6dp + decimal sums keep the scores hash-gated
    "corpus_dsir_scores" -> ((s, dir) =>
      TextAnalysis.dsirScores(Tables.documents(s, dir))),
    // deterministic ranked DSIR selection (TakeOrdered top-100)
    "corpus_dsir_select" -> ((s, dir) =>
      TextAnalysis.dsirSelect(Tables.documents(s, dir))),
    // integer-exact PMI collocations (phrase detection)
    "text_pmi_topk" -> ((s, dir) =>
      TextAnalysis.pmiTopBigrams(Tables.documents(s, dir))),
    // bigram-LM quality score (the perplexity-filter axis): every ln()
    // input is an integer count, so round(ln,6) terms + decimal sums keep
    // the score hash-gated
    "text_lm_score" -> ((s, dir) =>
      TextAnalysis.lmScore(Tables.documents(s, dir))),
    // CCNet head/middle/tail: exact equal-depth tiers over the LM score
    "corpus_lm_tiers" -> ((s, dir) =>
      TextAnalysis.lmTiers(Tables.documents(s, dir))),
    // TRAINED quality classifier (the GPT-3/CCNet filter discipline):
    // hashed-feature logistic regression, 3 full-batch GD rounds from
    // zero — rational sigmoid + fixed fold orders + decimal-summed
    // 6dp gradient contributions make the TRAINING itself bit-replayable
    // by the oracle, not just its outputs
    // all four classifier entries train through the classifierModelMemo
    // (one literal + one wide training per dataset — the bpeModelFor
    // train-once discipline; rows identical to per-entry retraining)
    "text_quality_classifier" -> ((s, dir) =>
      TextAnalysis.classifierWeightsDf(s, classifierWeightsArrFor(s, dir, wide = false))),
    // train-fit confusion matrix of the same model (predicted = z >= 0)
    "text_quality_classifier_eval" -> ((s, dir) =>
      TextAnalysis.qualityClassifierEvalWith(Tables.documents(s, dir),
        classifierWeightsArrFor(s, dir, wide = false))),
    // per-doc serve scores from the trained weights (the filter's output
    // surface; the persisted train-once/serve-many path is spec-pinned
    // row-identical to this fresh-trained form)
    "text_quality_classifier_scores" -> ((s, dir) =>
      TextAnalysis.scoreWithClassifier(Tables.documents(s, dir),
        TextAnalysis.classifierWeightsDf(s, classifierWeightsArrFor(s, dir, wide = false)))),
    // the WIDE mechanism (table-weight GD + join-based serve — the shape
    // that holds at 100k+ hashed dims, spec-pinned bit-identical to the
    // literal path at 16 and 256 dims) gated at oracle width against the
    // SAME oracle: the mechanism changes, the rows must not (the memo
    // keeps the wide TRAINER as the entry's one training per dataset)
    "text_quality_classifier_scores_wide" -> ((s, dir) =>
      TextAnalysis.scoreWithClassifierWide(Tables.documents(s, dir),
        TextAnalysis.classifierWeightsDf(s, classifierWeightsArrFor(s, dir, wide = true)))),
    // TRAINED BPE tokenizer (Sennrich et al. 2016): 8 merge rounds over the
    // cached vocabulary-sized word-frequency table — integer pair counts +
    // total-order argmax + fixed left-to-right replaces make the merge
    // TABLE itself bit-replayable by the oracle (8 unrolled rounds in SQL).
    // All four entries share ONE training per dataset (bpeModelFor memo) —
    // the train-once discipline a sweep must honor; training is
    // deterministic, so results are identical to per-entry retraining
    "text_bpe_merges" -> ((s, dir) => bpeModelFor(s, dir)),
    // the EVOLVING-STATE trainer (one replace + checkpoint per round —
    // O(T) merge applications where chain/kernel re-tokenization is
    // O(T²)); merge-identical by construction, registered so the
    // production-rounds trainer sits under the same replayed oracle
    "text_bpe_merges_evolving" -> ((s, dir) =>
      TextAnalysis.bpeMergesEvolving(Tables.documents(s, dir))),
    // the vocabulary those merges induce, instance-weighted — the table a
    // vocab-size/coverage budget decision reads
    "text_bpe_vocab" -> ((s, dir) =>
      TextAnalysis.bpeVocabWith(Tables.documents(s, dir), bpeMergesFor(s, dir))),
    // per-doc post-BPE token counts (what sequence packing actually
    // budgets); serve = distinct-word tokenization broadcast onto the doc
    // word stream, the persisted train-once path is spec-pinned identical
    "text_bpe_tokens" -> ((s, dir) =>
      TextAnalysis.bpeTokenCountsWith(Tables.documents(s, dir), bpeMergesFor(s, dir))),
    // the same counts through the one-pass merge-table KERNEL (the
    // production mechanism past tens of merges) — registered so the
    // driver's hash gate pins kernel ≡ chain, not just the spec
    "text_bpe_tokens_kernel" -> ((s, dir) =>
      TextAnalysis.bpeTokenCountsWith(Tables.documents(s, dir), bpeMergesFor(s, dir),
        kernel = true)),
    // tokenizer fertility by language (tokens/word, chars/token) — the
    // multilingual-equity table a mix decision reads
    "text_bpe_fertility" -> ((s, dir) =>
      TextAnalysis.bpeFertilityWith(Tables.documents(s, dir), bpeMergesFor(s, dir))),
    // TextRank: iterative damped PageRank over the token co-occurrence
    // graph, integer-exact, 5 unrolled rounds in the oracle
    "text_textrank" -> ((s, dir) =>
      TextAnalysis.textrank(Tables.documents(s, dir))),
    // count-min sketch, structure oracle-replayed cell by cell
    "text_countmin" -> ((s, dir) =>
      TextAnalysis.countMinAccuracy(Tables.documents(s, dir))),
    // corpus-statistics fluency signal: instance-weighted rare-bigram share
    "text_rare_bigrams" -> ((s, dir) =>
      TextAnalysis.rareBigramStats(Tables.documents(s, dir))),
    // MERGE/upsert composed as one full-outer + coalesce over plain parquet
    "rel_upsert" -> ((s, dir) => Relational.upsertOrders(s, dir)),
    // changelog apply: latest-wins U/D replay by sequence — MERGE's other
    // half; the oracle replays the same deterministic changelog
    "rel_cdc_apply" -> ((s, dir) => Relational.cdcApplyOrders(s, dir)),
    // the INVERSE: minimal I/U/D changelog between two snapshots (change-
    // data-feed generation); apply ∘ diff == new is spec-pinned
    "rel_snapshot_diff" -> ((s, dir) => Relational.ordersSnapshotDiff(s, dir)),
    // percent-of-total in exact integer cents (window over the tiny agg)
    "rel_revenue_share" -> ((s, dir) => Relational.revenueShare(s, dir)),
    // dbt-test/Deequ-style validation pass: 5 declared constraints,
    // (n_checked, n_violations, passed) each — ship-after-order fails on
    // this data by design, proving the checks fire
    "rel_constraints" -> ((s, dir) => Relational.constraintReport(s, dir)),
    // single-scan multi-column numeric profile (count/null/distinct/min/
    // max/decimal-exact sum per column, one Expand aggregation)
    "rel_profile" -> ((s, dir) => Audit.lineitemProfile(s, dir)),
    // the FK-STAR audit twin of rel_constraints: every declared FK edge as
    // a lazy anti-join count aggregate + per-table row-local rule scans,
    // one (constraint, n_violations) row per rule — all zeros or no publish
    "rel_audit_constraints" -> ((s, dir) => Audit.constraintViolations(s, dir)),
    // SCD2 temporal-table build: order history -> validity intervals
    "rel_scd2" -> ((s, dir) => Relational.customerOrderHistory(s, dir)),
    // time travel over the SCD2 history: as-of-day midpoint derived by one
    // metadata-scale agg, validity filter applied map-side (prunable at
    // scale when history is laid out by valid_from_day)
    "rel_scd2_asof" -> ((s, dir) => Relational.scd2AsOf(s, dir)),
    // k-anonymous aggregate release: sub-k quasi-identifier cells are
    // suppressed into an auditable residual row; totals reconcile
    "rel_kanon_release" -> ((s, dir) => Relational.kAnonRelease(s, dir)),
    // provenance rollup of the near-dup graph: source x source pair matrix
    "dedup_source_matrix" -> ((s, dir) =>
      Dedup.dupSourceMatrix(Tables.documents(s, dir))),
    // sketch aggregates, via their driver-CHECKABLE accuracy gate: exact
    // values + boolean tolerance verdicts, oracled with literal TRUEs — a
    // sketch regression flips a boolean and fails the hash compare. (The
    // raw-sketch-values twin `Relational.approxStats` stays available as an
    // operator, bounds-gated in RelationalSpec; it is deliberately NOT a
    // registered entry because engine-specific sketch values can never
    // hash-match a DuckDB oracle, and an ungated entry invites drift —
    // every registered query below is hash-gated.)
    "rel_approx_bounds" -> ((s, dir) => Relational.approxBounds(s, dir)),
    // — events / time-series surface (SURVEY.md §7.7) —
    "events_hourly" -> ((s, dir) => Events.hourlyRollup(s, dir)),
    "events_pruned_daily" -> ((s, dir) => Events.prunedDailyRollup(s, dir)),
    "events_sliding" -> ((s, dir) => Events.slidingCounts(s, dir)),
    "events_sessions" -> ((s, dir) => Events.sessionize(s, dir)),
    // the same sessions through Spark's NATIVE session_window aggregation
    "events_sessions_native" -> ((s, dir) => Events.sessionizeNative(s, dir)),
    "events_json" -> ((s, dir) => Events.jsonStats(s, dir)),
    // per-user activity heavy hitters: count-min (portable affine hashes,
    // structure under the hash gate) audited against exact top-k counts
    "events_heavy_hitters" -> ((s, dir) => Events.userHeavyHitters(s, dir)),
    "events_retention" -> ((s, dir) => Events.weeklyRetention(s, dir)),
    // sliding distinct counts via bounded fan-out equi-join
    "events_dau_mau" -> ((s, dir) => Events.dauMau(s, dir)),
    // non-additive reaggregation: daily HLL sketch partials, weekly served
    // via union-merge; exact twin + 5% gate in the result
    "events_distinct_reagg" -> ((s, dir) => Events.distinctReagg(s, dir)),
    // conversion windows: each step within 1 day of the previous
    "events_funnel_windowed" -> ((s, dir) => Events.funnelWindowed(s, dir)),
    "events_funnel" -> ((s, dir) => Events.funnel(s, dir)),
    "events_bursts" -> ((s, dir) => Events.bursts(s, dir)),
    // big-big interval join, binned into an equi-join + residual predicate
    // (the BNLJ-free range-join shape); probes = hourly bin boundaries
    "events_concurrency" -> ((s, dir) => Events.sessionConcurrency(s, dir)),
    // dense-grid resample + forward fill (time-series repair)
    "events_gapfill" -> ((s, dir) => Events.gapFilledHourly(s, dir)),
    // variance-aware spike detection: the z>3 test cross-multiplied into
    // exact integer arithmetic (no float mean, no sqrt)
    "events_anomaly" -> ((s, dir) => Events.anomalies(s, dir)),
    // two-sided gap repair: exact integer-milli linear interpolation
    "events_interpolate" -> ((s, dir) => Events.interpolatedHourly(s, dir)),
    // aggregate-once/re-aggregate-many: weekly rollup MERGED from the
    // persisted daily partials; oracle aggregates raw events directly
    "events_weekly_reagg" -> ((s, dir) => Events.weeklyFromDaily(s, dir)),
    // hour-of-day seasonality baseline (exact interpolated percentiles)
    "events_seasonal" -> ((s, dir) => Events.hourOfDayProfile(s, dir)),
    // as-of join (purchase -> latest preceding click) via tagged union +
    // per-user running-last window — no range join, one user_id shuffle
    "events_asof" -> ((s, dir) => Events.asofLastClick(s, dir)),
    // interval join as a temporal band join: one hash shuffle on
    // (user, band), 2x click replication; banding result-invariant,
    // oracle = plain inequality join
    "events_attribution" -> ((s, dir) => Events.attributionPairs(s, dir)),
    // latest in-window click per purchase (rank over the pair frame)
    "events_attribution_last" -> ((s, dir) => Events.attributionLastTouch(s, dir)),
    // — embedding similarity search (SURVEY.md §7.5) —
    "embed_knn_brute" -> ((s, dir) => EmbeddingSearch.bruteForceTopK(s, dir)),
    // MIPS: retrieval by raw inner product (the trained objective of most
    // embedding models — unnormalized, so norm carries signal cosine drops).
    // DEFAULT = the count-gated auto branch (r14, the r13 verdict's top
    // item — the embed_knn_join discipline on the MIPS family): the exact
    // scan below the MEASURED wall inversion (EmbeddingSearch
    // .mipsCellsCrossover = 2^16 — r15 measured the far side to 1M
    // vectors and the constant moved to the measured crossing; its own
    // family constant, NOT the kNN-graph's 4096), the STANDING IVF-IP
    // serve at or past it (recall@5 0.98+ measured at 128k/256k/512k,
    // where both ALSH band layouts collapse to 0.36→0.08 / 0.52→0.36).
    // Both arms keep explicit names (embed_knn_mips_brute /
    // embed_knn_mips_ivf) and the oracle replays the same count-gated
    // branch as a UNION ALL
    "embed_knn_mips" -> ((s, dir) =>
      EmbeddingSearch.mipsTopKAuto(s, dir, standingIvfIndexDirFor(dir))),
    // the exact inner-product scan under its explicit name — the small-
    // corpus arm of the auto default and every MIPS recall twin's
    // ground truth
    "embed_knn_mips_brute" -> ((s, dir) => EmbeddingSearch.mipsTopK(s, dir)),
    // gated recall of the registered auto default — 1.0 below the
    // crossover by construction, the IVF serve's measured number past it
    "embed_mips_auto_recall" -> ((s, dir) =>
      EmbeddingSearch.mipsAutoRecall(s, dir, standingIvfIndexDirFor(dir))),
    // ALSH (asymmetric transform [x;√(M²−|x|²)] / [q;0]) makes inner
    // product — not a metric, not directly LSH-able — indexable by the
    // existing hyperplane bands; exact dot re-rank of band-mates.
    // DEFAULT = the corpus-adaptive occupancy rule (lshRowsPerBand, the
    // r6/r7 pattern, promoted r13 per the r7 rename discipline): the
    // fixed 4×4 layout's candidates grow LINEARLY with the corpus at
    // fixed query load (O(corpus) per query at 100 TB — the r11
    // verdict's weak entry #2; measured x16/x1 wall 1.35× sized vs 2.0×
    // fixed). Oracle derives the same width from count(*); the fixed
    // form keeps the `_fixed` name below as the measured contrast.
    // KNOW THE TRADE: both ALSH layouts' gated recall collapses on this
    // corpus (sized 0.36→0.08, fixed 0.52→0.36 across x1→x16 — the
    // BENCH_SCALE recalls map); the measured MIPS recommendation is
    // embed_knn_mips_ivf (0.94+ at every curve point at bounded
    // candidates). The ALSH rows stay registered as the banding contrast
    "embed_knn_mips_alsh" -> ((s, dir) => EmbeddingSearch.mipsTopKAlshScaled(s, dir)),
    // the fixed 4×4 band layout, explicitly named — known-small static
    // corpora only (the embed_knn_join_fixed discipline)
    "embed_knn_mips_alsh_fixed" -> ((s, dir) => EmbeddingSearch.mipsTopKAlsh(s, dir)),
    // recall of the DEFAULT (sized) ALSH path vs exact MIPS — the width
    // rule's recall cost, measured beside the fixed layout's twin below
    "embed_mips_recall" -> ((s, dir) => EmbeddingSearch.mipsRecallScaled(s, dir)),
    "embed_mips_fixed_recall" -> ((s, dir) => EmbeddingSearch.mipsRecall(s, dir)),
    // IVF MIPS — the SCALE RECOMMENDATION for inner-product retrieval
    // (r13): cells ranked per query by rounded IP, count-derived probe
    // width, exact-IP re-rank; serves from the sized family's ONE
    // persisted quantizer. Measured recall@5 0.94/0.92/0.96 at x1/x4/x16
    // where the sized ALSH banding reads 0.36/0.10/0.08 and even the
    // fixed layout only 0.52/0.40/0.36 — banding at any bounded width
    // hashes the heavy-norm moderate-angle answers apart (the kNN-graph
    // lesson applied to MIPS), while data-adaptive cells hold recall at
    // sublinear candidates (BENCH_SCALE recalls + SCALING.md r13)
    // r14: the IVF arm serves from the STANDING index's stored cell
    // files (mipsBatchAgainstIvfIndex — plan-time cl= pruning) instead
    // of re-assigning the corpus per call; row-identical (deterministic
    // quantizer + assignments), so the oracle is unchanged
    "embed_knn_mips_ivf" -> ((s, dir) =>
      EmbeddingSearch.mipsStandingServe(s, dir, standingIvfIndexDirFor(dir))),
    // recall twin of the IVF MIPS serve — the gated evidence for the
    // recommendation above
    "embed_mips_ivf_recall" -> ((s, dir) =>
      EmbeddingSearch.mipsRecallStanding(s, dir, standingIvfIndexDirFor(dir))),
    "embed_knn_lsh" -> ((s, dir) => EmbeddingSearch.lshTopK(s, dir)),
    "embed_lsh_recall" -> ((s, dir) => EmbeddingSearch.lshRecall(s, dir)),
    // serves from the SAME persisted codebooks as embed_knn_pq
    "embed_pq_recall" -> ((s, dir) =>
      EmbeddingSearch.pqRecallPersisted(s, dir, pqIndexDirFor(dir))),
    // r16 opt: the recall twin serves from the SAME persisted composed
    // index as embed_knn_ivfpq (zero extra trainings)
    "embed_ivfpq_recall" -> ((s, dir) =>
      EmbeddingSearch.ivfPqRecallPersisted(s, dir, ivfPqIndexDirFor(dir))),
    // multi-probe: Hamming-1 neighbor buckets probed at fixed index layout
    "embed_knn_multiprobe" -> ((s, dir) => EmbeddingSearch.lshTopKMultiProbe(s, dir)),
    "embed_multiprobe_recall" -> ((s, dir) => EmbeddingSearch.multiProbeRecall(s, dir)),
    // two-sided kNN JOIN (kNN-graph): every vector × its band-mates /
    // cell-mates, no broadcastable query side — the corpus-vs-corpus
    // shuffle shape. DEFAULT = DATA-DERIVED method selection (r13, the
    // r12 verdict's top item): count(*) below the measured ~4k-vector
    // crossover serves the BANDED Hamming-1-probed graph (linear total
    // work, wins recall on small corpora — 0.883 at x1), at or past it
    // the IVF-CELL graph from the shared sized quantizer (recall RISES
    // with scale — 0.993 at x16 at LOWER wall than banded's 0.387).
    // Both branches stay registered under explicit names
    // (embed_knn_join_banded / embed_knn_join_cells) and the oracle
    // replays the same count-gated branch as a UNION ALL
    "embed_knn_join" -> ((s, dir) =>
      EmbeddingSearch.knnJoinAuto(s, dir, sizedKmeansIndexDirFor(dir))),
    // the BANDED graph under its explicit name: corpus-adaptive sizing at
    // targetBucket=128 with Hamming-1 MULTIPROBE (Lv et al. VLDB'07 on
    // the symmetric join: every vector also visits its single-bit-flip
    // buckets, probe-probe pairs skipped so candidates are exactly the
    // Hamming<=1 band pairs) — recall@3 0.883 at sf0.1; the pre-r13
    // default, now the small-corpus branch of the auto entry above. The
    // r11 Hamming-2 measurement (SCALING.md) found the wider ring
    // dominates at sf0.1 (0.970, +18% wall) but its r²-growing fan-out
    // flips the recall-per-wall crown back to Hamming-1 by x16 — so
    // Hamming-2 is the registered opt-in (embed_knn_join_h2); the r9
    // config stays as embed_knn_join_unprobed
    "embed_knn_join_banded" -> ((s, dir) => EmbeddingSearch.knnJoinScaled(s, dir)),
    // the Hamming-2 probe ring — the high-recall OPT-IN for bounded
    // corpora (recall 0.970 at sf0.1; cost constant grows ~r²/2 with the
    // corpus-adaptive band width, the measured reason it is not the
    // default) — hash-gated with the Hamming-<=2 probe oracle
    "embed_knn_join_h2" -> ((s, dir) =>
      EmbeddingSearch.knnJoinScaled(s, dir, probeHamming = 2)),
    // the r9 config (tb=32, no probing) — the measured 0-point of the
    // recall curve, kept registered so the cheap-low-recall graph stays
    // hash-gated and the curve stays replayable
    "embed_knn_join_unprobed" -> ((s, dir) =>
      EmbeddingSearch.knnJoinScaled(s, dir, targetBucket = 32, multiProbe = false)),
    // the EXACT degenerate-bucket escape on the driver gate: maxBucket=24
    // is below the fixture's mean bucket size, so the census genuinely
    // tiles (round-robin tile-pair groups, hard memory bound) and the
    // hash must still equal the untiled unprobed oracle — exactness of
    // the escape, gated every round
    "embed_knn_join_tiled" -> ((s, dir) =>
      EmbeddingSearch.knnJoinScaled(s, dir, targetBucket = 32, multiProbe = false,
        maxBucket = 24, tileOversized = true)),
    // fixed-width form, explicitly named — known-small static corpora only
    "embed_knn_join_fixed" -> ((s, dir) => EmbeddingSearch.knnJoin(s, dir)),
    // recall@k of the UNPROBED tb=32 graph vs the exact graph on a
    // 100-probe set — the curve's 0-point (and the measurement that
    // caught the candidate cap halving recall, sending the registered
    // path to the exact bucket-local kernel)
    "embed_knn_join_recall" -> ((s, dir) => EmbeddingSearch.knnJoinRecall(s, dir)),
    // recall@k of the DEFAULT (tb=128, Hamming-1 probed) graph — the
    // other end of the curve that justifies the default
    "embed_knn_join_probed_recall" -> ((s, dir) =>
      EmbeddingSearch.knnJoinRecall(s, dir, targetBucket = 128, multiProbe = true)),
    // recall@k of the Hamming-2 opt-in — the measurement that caught the
    // ring's scale flip (0.970 at x1 but recall-per-wall loses to
    // Hamming-1 by x16), kept gated so the opt-in's recall claim stays
    // replayable
    "embed_knn_join_h2_recall" -> ((s, dir) =>
      EmbeddingSearch.knnJoinRecall(s, dir, targetBucket = 128, multiProbe = true,
        probeHamming = 2)),
    // the explicitly-named CAPPED variant (scramble-sampled candidate
    // side, edges <= N*bands*cap) — the opt-in for corpora whose
    // degenerate buckets trip the bucket-local kernel's memory guard;
    // registered so its deterministic sampling stays hash-gated and its
    // recall trade stays measured (see embed_knn_join_recall)
    "embed_knn_join_capped" -> ((s, dir) =>
      EmbeddingSearch.knnJoinScaled(s, dir, targetBucket = 32, candidateCap = 64)),
    // IVF-CELL kNN graph — the CORPUS-SCALE recommendation for the
    // neighbor graph (r12): the √N-cell quantizer partitions the data
    // adaptively where wide sign-LSH bands hash moderate-angle neighbors
    // apart; per-vector candidates ≈ nprobe·√N (sublinear), and measured
    // recall@3 at x16 is 0.993 at LOWER wall than the banded default's
    // 0.387 (SCALING.md r12). Banded entries stay registered: they are
    // the linear-total-work family and the near-dup (high-cosine) tool
    "embed_knn_join_cells" -> ((s, dir) =>
      EmbeddingSearch.knnJoinCellsPersisted(s, dir, sizedKmeansIndexDirFor(dir))),
    // recall@3 of the cell graph on the 100-probe set — the crossover
    // evidence (0.653 at x1 rising to 0.993 at x16 as cells tighten,
    // while the banded default falls 0.883 -> 0.387); serves from the
    // SAME persisted quantizer as the graph entry
    "embed_knn_join_cells_recall" -> ((s, dir) =>
      EmbeddingSearch.knnJoinCellsRecallPersisted(s, dir,
        sizedKmeansIndexDirFor(dir))),
    // GRAPH-NAVIGATED query serving (r15, the r14 verdict's item 3):
    // greedy beam search over the navigable cells graph, flattened to
    // Spark rounds — the measured LAST-RECALL-POINTS OPT-IN (recall
    // 1.000 at 6 hops × beam 32 where the IVF default reads 0.96 at
    // ~1/3 the wall; SCALING.md r14 frontier). Default stays IVF; this
    // is the priced high-recall tier, deterministic end-to-end so the
    // oracle replays every beam round
    "embed_knn_graph_serve" -> ((s, dir) =>
      EmbeddingSearch.knnGraphServe(s, dir, sizedKmeansIndexDirFor(dir))),
    // the gated evidence for the last-recall-points claim
    "embed_graph_recall" -> ((s, dir) =>
      EmbeddingSearch.knnGraphServeRecall(s, dir, sizedKmeansIndexDirFor(dir))),
    // NN-DESCENT refinement of the probed default (Dong et al. WWW'11):
    // 2 rounds of capped neighbor-of-neighbor expansion at internal
    // width kBuild=10 + exact-cosine re-rank — per-round fan-out
    // <= (2·kBuild)² per vertex, independent of corpus size AND band
    // width. Measured honestly (SCALING.md r12 gated recalls): it
    // DOMINATES its seed everywhere (0.883 -> 0.923 at x1) but cannot
    // recover the seed's x16 collapse (0.387 -> 0.437) — expansion
    // through a bad seed finds little; the corpus-scale graph is
    // embed_knn_join_cells above. Kept registered as the
    // seed-refinement tool; seed + rounds replayed as nested CTEs
    "embed_knn_join_nnd" -> ((s, dir) => EmbeddingSearch.knnJoinDescent(s, dir)),
    // recall@k of the refined graph on the 100-probe set — the
    // measurement that bounds what the refinement buys over the seed
    "embed_knn_join_nnd_recall" -> ((s, dir) =>
      EmbeddingSearch.knnJoinDescentRecall(s, dir)),
    "embed_knn_ivf" -> ((s, dir) => EmbeddingSearch.ivfTopK(s, dir)),
    // train-once/serve-many (VERDICT r2 item 3): the quantizer is persisted
    // keyed on the embeddings fingerprint — the first invocation trains and
    // saves it, every later one (any JVM) loads and serves; results are
    // row-identical either way (EmbeddingSpec asserts it)
    // product quantization: codes + LUT scoring; training, encoding, and
    // the ADC estimate all replayed by the oracle. r13: the codebooks
    // PERSIST (ensurePqIndex, the sizedKmeansIndexDirFor discipline) —
    // one training per dataset serves pq + refine + recall, closing the
    // r12 cold-pass cost center (13.4/9.5/7.0 s first-pass trio)
    "embed_knn_pq" -> ((s, dir) =>
      EmbeddingSearch.pqTopKPersisted(s, dir, pqIndexDirFor(dir))),
    // IVF-PQ: the composed production index — coarse k-means probe bounds
    // candidates to nprobe cells, PQ ADC bounds bytes per candidate to m
    // codes; both trained quantizers + the composition oracle-replayed
    // r16 opt: serves from the persisted composed index (ivfPqIndexDirFor)
    // — both quantizers train once per dataset instead of per call;
    // spec-pinned row-identical to fresh training
    "embed_knn_ivfpq" -> ((s, dir) =>
      EmbeddingSearch.ivfPqTopKPersisted(s, dir, ivfPqIndexDirFor(dir))),
    // PQ codebooks trained on the deterministic 40% affine-hash sample
    // (the 100 TB training shape k-means already has); encoding + LUT
    // serve still cover every vector — oracle replays the sampled rounds;
    // own index dir (the sample is part of the trained artifact's key)
    "embed_knn_pq_sampled" -> ((s, dir) =>
      EmbeddingSearch.pqTopKPersisted(s, dir,
        fingerprintedDir(dir, "graft_pqidx_m4k4i2sp40", Seq("embeddings.parquet")),
        samplePct = 40)),
    // two-stage serve: ADC shortlist (codes only) -> exact cosine re-rank
    // of the |Q|*R survivors — the deployment answer shape; both stages
    // oracle-replayed (shortlist membership AND true-cosine order);
    // shares embed_knn_pq's persisted codebooks (zero extra trainings)
    "embed_knn_pq_refine" -> ((s, dir) =>
      EmbeddingSearch.pqTopKRefinedPersisted(s, dir, pqIndexDirFor(dir))),
    // scalar int8 quantization: per-dim affine codes (min/max train pass),
    // decoded-vector ADC; quantizer, codes, and scores all oracle-replayed
    "embed_knn_sq8" -> ((s, dir) => EmbeddingSearch.sq8TopK(s, dir)),
    // SQ8 min/max trained on the same 40% sample; out-of-sample-range
    // values saturate at the byte edges (the stored-uint8 behavior)
    "embed_knn_sq8_sampled" -> ((s, dir) => EmbeddingSearch.sq8TopK(s, dir, samplePct = 40)),
    "embed_sq8_recall" -> ((s, dir) => EmbeddingSearch.sq8Recall(s, dir)),
    // embedding hygiene: per-label centroid-distance z-score tail — the
    // mislabeled/noise filter; centroids, moments, and z all oracle-replayed
    "embed_outliers" -> ((s, dir) => EmbeddingSearch.labelOutliers(s, dir)),
    // the Matryoshka measurement: recall of prefix-dim search vs full-dim
    // exact, one row per d' — truncated storage's quality price
    "embed_trunc_recall" -> ((s, dir) => EmbeddingSearch.truncRecall(s, dir)),
    // JL random-projection recall: deterministic ±1 projection (the
    // hyperplane sign family as a matrix-free expression), recall per d'
    "embed_rp_recall" -> ((s, dir) => EmbeddingSearch.rpRecall(s, dir)),
    // MMR diversity re-rank at lambda=1/2: greedy relevance-vs-redundancy
    // selection over the checkpointed shortlist, k unrolled lazy rounds
    "embed_mmr_rerank" -> ((s, dir) => EmbeddingSearch.mmrTopK(s, dir)),
    "embed_knn_kmeans" -> ((s, dir) => {
      // pre-params-in-prefix releases used graft_kmidx_<sf>_<hex> — those
      // orphans can never be served again; reclaim them too (the keep
      // marker "-" matches no hex name, so every legacy dir is stale)
      val sfName = new java.io.File(dir).getName
      Tables.cleanStaleExports(Tables.artifactRoot,
        s"graft_kmidx_${sfName}_", s"graft_kmidx_${sfName}_-")
      EmbeddingSearch.kmeansTopKPersisted(s, dir, kmeansIndexDirFor(dir, 8, 2),
        nClusters = 8, iters = 2)
    }),
    // the 100 TB training shape: Lloyd rounds fit on a DETERMINISTIC 40%
    // sample (portable affine hash of vec_id — the oracle replays exactly
    // which vectors trained), serving still assigns/re-ranks the full set
    "embed_knn_kmeans_sampled" -> ((s, dir) =>
      EmbeddingSearch.kmeansTopKPersisted(s, dir,
        kmeansIndexDirFor(dir, 8, 2, samplePct = Some(40)),
        nClusters = 8, iters = 2, samplePct = 40)),
    // CORPUS-ADAPTIVE cell count (k = ⌈√N⌉, clamped): the probed serve's
    // scan fraction (nprobe/k) SHRINKS as the corpus grows instead of
    // being pinned at nprobe/8 — the r11 verdict's missing sizing rule,
    // the lshRowsPerBand discipline applied to the quantizer; the oracle
    // derives the same k from count(*). The fixed-k entries above stay
    // as the measured contrast.
    // r14 (the r13 verdict's item 2): the registered default serves from
    // the STANDING index's stored cl=-partitioned cell files
    // (knnBatchAgainstIvfIndex — probed dirs prune at PLAN time) instead
    // of paying the per-call corpus-to-cell assignment shuffle; stored
    // assignments equal per-call ones (deterministic quantizer), so the
    // sized oracle applies verbatim and the hash gate proves the
    // promotion changed the plan, never the rows. The per-call form
    // keeps its explicit name below
    "embed_knn_kmeans_sized" -> ((s, dir) =>
      EmbeddingSearch.kmeansSizedStandingServe(s, dir, standingIvfIndexDirFor(dir))),
    // the per-call re-assignment form under its explicit name — the
    // pre-r14 default, kept registered (same oracle) so the linear term
    // it pays stays measured beside the standing plan that removes it
    "embed_knn_kmeans_sized_percall" -> ((s, dir) =>
      EmbeddingSearch.kmeansTopKSizedPersisted(s, dir, sizedKmeansIndexDirFor(dir))),
    // recall of the sized serve vs exact — the rule's honest cost (more
    // cells at fixed nprobe probe a smaller corpus fraction); measured
    // through the REGISTERED standing plan
    "embed_kmeans_sized_recall" -> ((s, dir) =>
      EmbeddingSearch.kmeansRecallSizedStanding(s, dir, standingIvfIndexDirFor(dir))),
    // FILTERED kNN (metadata predicate + vector top-k — FAISS IDSelector /
    // vector-store filtered search): the scale path under the DEFAULT name.
    // ONE full-corpus quantizer serves every filter (shared sized index,
    // zero extra trainings); the inverted file is built over the filter's
    // survivors only, and the probe width is cellsNprobeFor fed the
    // FILTERED count — widening by the inverse selectivity so SURVIVING
    // candidates stay at the target instead of post-filtering into the
    // classic filtered-ANN recall cliff. The brute twin is the exact
    // baseline; the recall twin gates the widened width
    // DEFAULT = the count-gated auto branch (the knnJoinAuto discipline on
    // the filter dimension): exact filtered brute when the widened width
    // would clamp past 16 (selective filter ⇒ survivors broadcast, recall
    // 1), the widened IVF serve past matches ≈ 22·√N. Oracle = count-gated
    // UNION ALL of the two replays.
    // r14: the default is the STANDING serve (the r13
    // embed_filtered_index_serve promoted to the family name — payload
    // columns stored in the index, predicate pushed into the cell files,
    // same count-gated branch from the index's own trained cell count);
    // the per-call auto keeps an explicit name below
    "embed_knn_filtered" -> ((s, dir) =>
      EmbeddingSearch.filteredIndexServe(s, dir, standingIvfIndexDirFor(dir))),
    // the per-call count-gated auto under its explicit name — the
    // pre-r14 default (re-assigns the filter's survivors per call); same
    // UNION-ALL oracle, so standing ≡ per-call row identity stays gated
    "embed_knn_filtered_percall" -> ((s, dir) =>
      EmbeddingSearch.filteredTopKAuto(s, dir, sizedKmeansIndexDirFor(dir))),
    // the selectivity-widened IVF serve under its explicit name — the
    // at-scale branch, callable below the branch point for measurement
    "embed_knn_filtered_ivf" -> ((s, dir) =>
      EmbeddingSearch.filteredTopKIvfPersisted(s, dir, sizedKmeansIndexDirFor(dir))),
    "embed_knn_filtered_brute" -> ((s, dir) => EmbeddingSearch.filteredTopK(s, dir)),
    "embed_filtered_recall" -> ((s, dir) =>
      EmbeddingSearch.filteredRecallPersisted(s, dir, sizedKmeansIndexDirFor(dir))),
    // RANGE SEARCH (FAISS range_search): all corpus vectors with cosine ≥ τ
    // of each probe query — radius twin of top-k. DEFAULT = the SOUND
    // triangle-inequality cell pruning (result ≡ the exact τ-set — the
    // oracle IS the brute replay, so the hash gate proves completeness);
    // the rank-probed bounded-cost form keeps an explicit `_probed` name
    // because its recall collapses as the τ-set grows with the corpus
    // (0.91→0.51 across the curve, gated).
    // r14: served from the STANDING index's stored radii table
    // (rangeBatchAgainstIvfIndex) instead of re-assigning the corpus and
    // re-deriving floors per call; still sound, oracle unchanged
    "embed_range_search" -> ((s, dir) =>
      EmbeddingSearch.rangeStandingServe(s, dir, standingIvfIndexDirFor(dir))),
    // the per-call sound pruned form under its explicit name — the
    // pre-r14 default (assignment + floors re-derived per call); same
    // brute-replay oracle
    "embed_range_search_percall" -> ((s, dir) =>
      EmbeddingSearch.rangeSearchPruned(s, dir, sizedKmeansIndexDirFor(dir))),
    "embed_range_search_probed" -> ((s, dir) =>
      EmbeddingSearch.rangeSearchIvfPersisted(s, dir, sizedKmeansIndexDirFor(dir))),
    "embed_range_search_brute" -> ((s, dir) => EmbeddingSearch.rangeSearch(s, dir)),
    // completeness invariant of the sound default (reads 1.0 everywhere)
    // — measured through the REGISTERED standing plan (r14)
    "embed_range_recall" -> ((s, dir) =>
      EmbeddingSearch.rangeStandingRecall(s, dir, standingIvfIndexDirFor(dir))),
    // the probed form's measured τ-set coverage (the honest trade row)
    "embed_range_probed_recall" -> ((s, dir) =>
      EmbeddingSearch.rangeRecallPersisted(s, dir, sizedKmeansIndexDirFor(dir))),
    // FILTERED range search (predicate × radius — "every τ-neighbor within
    // this tenant"): the sound pruned serve over the filter's survivors;
    // filtered radii only tighten the triangle bound, so the result equals
    // the exact filtered τ-set and the oracle is the filtered brute replay
    "embed_range_filtered" -> ((s, dir) =>
      EmbeddingSearch.rangeSearchPrunedWhere(s, dir, sizedKmeansIndexDirFor(dir),
        org.apache.spark.sql.functions.col("label") === 3)),
    // FILTERED MIPS (predicate × inner product — the last filter × score
    // cell): the same count-gated branch as embed_knn_filtered with IP
    // scoring; recall twin reads 1.0 on the brute branch by construction.
    // r14: the default serves STANDING (stored payload columns, pushed
    // predicate, same branch variable for a sized build — one oracle);
    // the per-call form keeps an explicit name
    "embed_knn_mips_filtered" -> ((s, dir) =>
      EmbeddingSearch.mipsFilteredStandingServe(s, dir, standingIvfIndexDirFor(dir))),
    "embed_knn_mips_filtered_percall" -> ((s, dir) =>
      EmbeddingSearch.mipsTopKFiltered(s, dir, sizedKmeansIndexDirFor(dir))),
    // measured through the REGISTERED standing plan (r14)
    "embed_mips_filtered_recall" -> ((s, dir) =>
      EmbeddingSearch.mipsFilteredRecallStanding(s, dir, standingIvfIndexDirFor(dir))),
    // cluster-balanced corpus sampling: cap every semantic cluster at its
    // q most central members — served from the SAME persisted quantizer as
    // embed_knn_kmeans (same kmeansIndexDirFor derivation at the same
    // params => the same index dir, spec-asserted zero extra trainings),
    // so a sweep trains once for both; selection is the bounded top-k
    // aggregator, never a window over corpus/k-row cluster partitions
    "embed_cluster_balance" -> ((s, dir) =>
      EmbeddingSearch.clusterBalancePersisted(s, dir, kmeansIndexDirFor(dir, 8, 2),
        q = 20, nClusters = 8, iters = 2)),
    "embed_label_stats" -> ((s, dir) => EmbeddingSearch.labelStats(s, dir)),
    // SemDeDup-style semantic prune: cell-bounded (label) + band-bounded
    // candidates, exact-cosine verify, deterministic non-transitive keeper
    // (dup_of = smallest qualifying lower id); one verdict row per vector.
    // tau is data-dependent like dedup_embedding's: within-label cosines on
    // the synthetic corpus top out ≈ 0.47, so 0.35 exercises the drop path
    "embed_semantic_prune" -> ((s, dir) => EmbeddingSearch.semanticPrune(s, dir, tau = 0.35)),
    // vector hygiene: zero/near-zero detection + exact norm² moments
    "embed_norm_stats" -> ((s, dir) => EmbeddingSearch.normStats(s, dir)),
    // ANN index-quality report: per-cell size + mean/worst cosine-to-centroid
    "embed_centroid_quality" -> ((s, dir) => EmbeddingSearch.centroidQuality(s, dir)),
    // incremental dedup, embedding modality: first 4/5 of vectors play the
    // indexed corpus (bands + vecs persisted once, fingerprint-keyed), last
    // 1/5 today's embedding batch; same tau as dedup_embedding
    // incremental kNN — the add-without-retrain production pattern: the
    // persisted IVF index (quantizer + corpus cell table, trained on the
    // first 4/5) serves; the last 1/5 is today's batch, routed to cells
    // by the zero-shuffle assignment and searched WITHOUT retraining or
    // rescanning indexed vectors; oracle replays train-on-corpus +
    // assign-everything, which is exactly index ∪ routed batch
    "embed_knn_incremental" -> ((s, dir) => {
      EmbeddingSearch.knnIncremental(s, dir,
        fingerprintedDir(dir, "graft_ivfinc_c8i2", Seq("embeddings.parquet")))
    }),
    // the ON-DISK twin: the 1/5 batch is APPENDED to the persisted index
    // (extendIvfIndex: cell files + idmap buckets grow append-only under
    // the build/extend/forget crash discipline — the third artifact
    // completes the matrix) and the serve reads the union back from
    // disk; the oracle is shared verbatim with embed_knn_incremental, so
    // the hash gate proves disk-append ≡ in-memory union
    "embed_knn_extend_serve" -> ((s, dir) => {
      EmbeddingSearch.knnIncrementalExtend(s, dir,
        fingerprintedDir(dir, "graft_ivfext_c8i2", Seq("embeddings.parquet")))
    }),
    // the radius twin of the extend-serve entry, and the HASH-GATED form
    // of the radii-merge invariant: build 4/5 (with the per-cell
    // angular-floor table), disk-append 1/5 (extendIvfIndex merges the
    // floors), then the SOUND standing range serve — its result equals
    // the exact tau-set, so the oracle is the brute replay verbatim and
    // a dropped/wrong radii merge fails the gate as a row diff
    "embed_range_extend_serve" -> ((s, dir) =>
      EmbeddingSearch.rangeExtendServe(s, dir,
        fingerprintedDir(dir, "graft_ivfrng_szi2", Seq("embeddings.parquet")))),
    // (r14: the r13 `embed_filtered_index_serve` entry was PROMOTED to
    // the family default name `embed_knn_filtered` above — the standing
    // payload-carrying serve is now the registered plan, and the per-call
    // auto keeps `embed_knn_filtered_percall`.)
    "embed_dedup_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, dir)
      val split = emb.count() * 4 / 5
      val idx = fingerprintedDir(dir, "graft_vecidx_v1p16", Seq("embeddings.parquet"))
      if (!Dedup.dedupIndexExists(s, idx)) // generic _DONE-marker check
        EmbeddingSearch.buildVecDedupIndex(emb.where(col("vec_id") < split), idx)
      EmbeddingSearch.vecDedupAgainst(idx, emb.where(col("vec_id") >= split), tau = 0.4)
    }),
    // — multimodal binary-column plumbing (builder mandate; codec stubbed) —
    "multimodal_features" -> ((s, dir) => Multimodal.features(s, dir)),
    "multimodal_frames" -> ((s, dir) => Multimodal.frames(s, dir)),
    "multimodal_resize" -> ((s, dir) => Multimodal.resized(s, dir)),
    // 48-bit block-DIFFERENCE perceptual hash (dHash) off the DECODED
    // raster (adjacent-chunk integer comparisons — both engines replay it
    // exactly; difference bits keep entropy on low-variance rasters where
    // block-mean bits collapse)
    "multimodal_phash" -> ((s, dir) => Multimodal.phashes(s, dir)),
    // image near-dup: phash + the lossless 4x12-bit chunk index + exact
    // Hamming verify — the image twin of SimHash text dedup
    "multimodal_phash_pairs" -> ((s, dir) => Multimodal.phashNearDupPairs(s, dir)),
    // incremental image dedup — new batch vs the PERSISTED 8-byte-per-image
    // fingerprint index (the image twin of dedup_incremental /
    // embed_dedup_incremental): first 4/5 of docs play the indexed corpus,
    // last 1/5 today's batch; serve never touches corpus image bytes
    "multimodal_phash_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val split = docs.count() * 4 / 5
      val idx = fingerprintedDir(dir, "graft_phashidx_d48k4", Seq("documents.parquet"))
      if (!Multimodal.phashIndexExists(idx))
        Multimodal.buildPhashIndex(
          Multimodal.imagePHashesOf(docs.where(col("doc_id") < split)), idx)
      Multimodal.phashDedupAgainst(idx,
        Multimodal.imagePHashesOf(docs.where(col("doc_id") >= split)))
    }),
    // real RIFF/WAVE PCM16 containers, parsed by a real chunk walker; the
    // oracle replays the expected sample stats from the text codes
    "multimodal_audio" -> ((s, dir) => Multimodal.audioFeatures(s, dir)),
    // real RIFF/AVI containers demuxed by the same chunk-walker discipline:
    // header fields, order-sensitive frame checksum, every-5th-frame sample
    "multimodal_video" -> ((s, dir) => Multimodal.videoFeatures(s, dir)),
    // 48-bit audio fingerprint — the shared dhash48 kernel at PCM-sample
    // granularity (adjacent-chunk energy comparisons off the DECODED
    // samples; a container/endianness bug upstream breaks the hash)
    "multimodal_audio_fp" -> ((s, dir) => Multimodal.audioFps(s, dir)),
    // audio near-dup: fingerprints through the sharded pigeonhole index +
    // exact Hamming verify — the audio twin of multimodal_phash_pairs
    "multimodal_audio_pairs" -> ((s, dir) => Multimodal.audioNearDupPairs(s, dir)),
    // incremental audio dedup vs the persisted 8-byte-per-clip index;
    // first 4/5 of docs play the corpus, last 1/5 today's batch
    "multimodal_audio_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val split = docs.count() * 4 / 5
      val idx = fingerprintedDir(dir, "graft_afpidx_d48k4", Seq("documents.parquet"))
      if (!Multimodal.audioFpIndexExists(idx))
        Multimodal.buildAudioFpIndex(
          Multimodal.audioFingerprintsOf(
            Multimodal.audioBlobsOf(docs.where(col("doc_id") < split))), idx)
      Multimodal.audioDedupAgainst(idx,
        Multimodal.audioFingerprintsOf(
          Multimodal.audioBlobsOf(docs.where(col("doc_id") >= split))))
    }),
    // 48-bit video fingerprint — dhash48 at FRAME granularity (per-frame
    // energy sums in demux order; a reordered/dropped frame flips bits)
    "multimodal_video_fp" -> ((s, dir) => Multimodal.videoFps(s, dir)),
    "multimodal_video_pairs" -> ((s, dir) => Multimodal.videoNearDupPairs(s, dir)),
    "multimodal_video_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, dir)
      val split = docs.count() * 4 / 5
      val idx = fingerprintedDir(dir, "graft_vfpidx_d48k4", Seq("documents.parquet"))
      if (!Multimodal.videoFpIndexExists(idx))
        Multimodal.buildVideoFpIndex(
          Multimodal.videoFingerprintsOf(
            Multimodal.videoBlobsOf(docs.where(col("doc_id") < split))), idx)
      Multimodal.videoDedupAgainst(idx,
        Multimodal.videoFingerprintsOf(
          Multimodal.videoBlobsOf(docs.where(col("doc_id") >= split))))
    }),
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB CTEs shared by the text oracles. `tok`: (doc_id, w = token
    * list); `sh`: (doc_id, sh = distinct k-shingle list). `documents.text`
    * is clean single-spaced lowercase (verified), so string_split mirrors
    * the engine's Java-\W+ tokenizer exactly on this data. `src` lets an
    * oracle shingle a FILTERED doc CTE (it must expose doc_id, text)
    * instead of the raw table — one copy of the gram construction for all.
    */
  private def shingleCte(k: Int, src: String = "documents"): String = {
    val gram = (1 to k).map(j => if (j == 1) "w[i]" else s"w[i+${j - 1}]").mkString(" || ' ' || ")
    s"""tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       |sh AS (SELECT doc_id,
       |  list_distinct(list_transform(generate_series(1, greatest(len(w)-${k - 1}, 0)),
       |    i -> $gram)) AS sh FROM tok)""".stripMargin
  }

  /** Portable rolling hash of a string `s` (mirrors HashFunctions.portableHash31). */
  private def duckHash(s: String): String =
    s"list_reduce(list_transform(generate_series(1, len($s)), ci -> ascii($s[ci])::BIGINT), (a, b) -> (a*31 + b) % 2147483647)"

  /** Scramble mirror of HashFunctions.portableScramble: product of the two
    * folds mod P. Both factors < 2^31 so the BIGINT product never overflows.
    */
  private def duckScramble(s: String): String =
    s"((${duckHash(s)} * " +
      s"list_reduce(list_prepend(0, list_transform(generate_series(1, len($s)), ci -> ascii($s[ci])::BIGINT)), (a, b) -> (a*37 + b) % 2147483647)) % 2147483647)"

  /** The base-37 sibling fold; h1·2³¹ + h2 mirrors HashPrimitives.hashSet62's
    * packed 62-bit element hash (h2 < 2³¹, so the add IS the bit-or).
    */
  private def duckHash62(s: String): String =
    s"(${duckHash(s)} * 2147483648 + " +
      s"list_reduce(list_transform(generate_series(1, len($s)), ci -> ascii($s[ci])::BIGINT), (a, b) -> (a*37 + b) % 2147483647))"

  /** MinHash-LSH candidate CTEs (hs → sig → bands → cand) over a `sets`
    * CTE — ONE copy of the banding constants (64 sigs, 16 bands, the
    * 12345/67891 permutation family) mirrored from HashFunctions, shared by
    * every oracle that replays LSH candidate generation.
    */
  private val minhashCandCtes: String =
    s"""hs AS (SELECT doc_id, list_transform(sh, t -> ${duckHash("t")}) AS hset FROM sets),
       |sig AS (SELECT doc_id, list_transform(generate_series(0, 63),
       |  i -> list_min(list_transform(hset, h -> (h*(2*i+1) + (12345 + 67891*i)) % 2147483647))) AS sig
       |  FROM hs),
       |bands AS (SELECT doc_id, unnest(list_transform(generate_series(0, 15),
       |  b -> b::VARCHAR || ':' || array_to_string(list_transform(
       |    list_slice(sig, b*4+1, b*4+4), v -> v::VARCHAR), '_'))) AS band FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)""".stripMargin

  /** Quality-rule CTEs (t → s) and the rule predicate — ONE copy of the
    * C4-style thresholds, shared by text_quality_filter and corpus_clean.
    */
  private val qualityCtes: String =
    """t AS (SELECT doc_id, lang, source, text,
      |  len(string_split(text, ' '))::BIGINT AS n_tokens,
      |  len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct_tokens,
      |  length(text)::BIGINT AS n_chars FROM documents),
      |s AS (SELECT *,
      |  round((n_chars - (n_tokens - 1))::DOUBLE / n_tokens, 6) AS avg_token_len,
      |  round(n_distinct_tokens::DOUBLE / n_tokens, 6) AS type_token_ratio FROM t)""".stripMargin
  private val qualityPred: String =
    "n_tokens >= 30 AND avg_token_len >= 2.0 AND avg_token_len <= 12.0 AND type_token_ratio >= 0.3"

  /** Sessionization CTEs (30-min gap rule) ending in
    * `sess`(user_id, session_idx, n_events, start_us, end_us) — ONE copy of
    * the gap/flag/running-sum construction, shared by the session oracles.
    */
  private val sessionCtes: String =
    """e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |l AS (SELECT *, lag(ts_us) OVER w AS prev_us FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |      THEN 1 ELSE 0 END AS new_session FROM l),
      |s AS (SELECT *, (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx FROM f),
      |sess AS (SELECT user_id, session_idx, count(*) AS n_events,
      |  min(ts_us) AS start_us, max(ts_us) AS end_us FROM s GROUP BY 1, 2)""".stripMargin

  /** Exact-Jaccard pair verification tail shared by the pair-emitting
    * oracles; expects CTEs `sets`(doc_id, sh) and `cand`(doc_a, doc_b).
    */
  private def verifyTail(tau: Double): String =
    s"""SELECT doc_a, doc_b,
       |  len(list_intersect(sa.sh, sb.sh))::BIGINT AS inter_len,
       |  (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::BIGINT AS union_len,
       |  round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
       |    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
       |FROM cand JOIN sets sa ON cand.doc_a = sa.doc_id
       |          JOIN sets sb ON cand.doc_b = sb.doc_id
       |WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
       |    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= $tau""".stripMargin

  /** TextRank oracle: the damped weighted-PageRank iteration UNROLLED into
    * one CTE per round (r1..rN) — fully deterministic integer arithmetic
    * (`//` on positives ≡ the engine's `div`), HUGEINT products mirroring
    * the engine's DECIMAL(38,0).
    */
  private def textrankSql(iters: Int, minCount: Int, kTop: Int): String = {
    val base =
      s"""WITH tok AS (SELECT string_split(text, ' ') AS w FROM documents),
         |bi0 AS (SELECT w[di.i] AS a, w[di.i+1] AS b FROM tok,
         |  LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i) di),
         |bc AS (SELECT a, b, count(*)::BIGINT AS c FROM bi0 WHERE a <> b GROUP BY 1, 2
         |       HAVING count(*) >= $minCount),
         |sym AS (SELECT src, dst, CAST(sum(c) AS BIGINT) AS w FROM (
         |    SELECT a AS src, b AS dst, c FROM bc
         |    UNION ALL SELECT b AS src, a AS dst, c FROM bc)
         |  GROUP BY 1, 2),
         |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS w_out FROM sym GROUP BY 1),
         |e AS (SELECT sym.src, sym.dst, sym.w, ow.w_out FROM sym JOIN ow USING (src)),
         |nn AS (SELECT count(*)::BIGINT AS n_nodes FROM ow),
         |r0 AS (SELECT src AS node, 1000000000000 // n_nodes AS r FROM ow, nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
         |  15 * (1000000000000 // nn.n_nodes) // 100
         |    + 85 * sum(r${i - 1}.r::HUGEINT * e.w // e.w_out) // 100 AS r
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node, nn
         |  GROUP BY 1, nn.n_nodes)""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      s"""
         |SELECT node AS token, CAST(r AS BIGINT) AS rank_e12, w_out
         |FROM r$iters JOIN ow ON node = ow.src
         |ORDER BY rank_e12 DESC, token ASC LIMIT $kTop""".stripMargin
  }

  /** ext·(1−disc) in exact decimal (mirrors Relational.discPrice). */
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))"

  /** Sequential-fold dot product a·b over 1-based list indexes (mirrors
    * EmbeddingSearch.dot: fold order identical, so doubles are bit-equal).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), di -> $a[di] * $b[di]), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(${dotSql(a, a)}) = 0.0 OR sqrt(${dotSql(b, b)}) = 0.0 THEN 0.0
       |  ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END""".stripMargin

  /** Hyperplane-LSH signature + band-key CTEs over an `e`(vec_id, v) CTE —
    * ONE copy of the 16-plane parity pattern and 4×4 banding, shared by the
    * vector near-dup oracles (the k-NN oracle keeps its own variant, whose
    * bands CTE must also carry `v`).
    */
  private val vecBandCtes: String =
    """sig AS (SELECT vec_id, v, list_transform(generate_series(0, 15), p ->
      |  CASE WHEN list_reduce(list_transform(generate_series(1, len(v)),
      |    d -> v[d] * (CASE WHEN (p*2654435761 + d*40503) % 65537 % 2 = 1
      |                 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) > 0.0
      |  THEN 1 ELSE 0 END) AS sig FROM e),
      |vbands AS (SELECT vec_id, unnest(list_transform(generate_series(0, 3), b ->
      |  b::VARCHAR || ':' || array_to_string(list_transform(
      |    list_slice(sig, b*4+1, b*4+4), x -> x::VARCHAR), ','))) AS band FROM sig)""".stripMargin

  /** [[vecBandCtes]] under the CORPUS-ADAPTIVE width: rpb = the smallest
    * r in [4, 16] with 32·2^r ≥ count(*) — the same integer
    * shift-and-compare as `EmbeddingSearch.lshRowsPerBand` (no floating
    * log2, so both engines agree at exact powers of two) — then 8 bands of
    * rpb bits over an 8·rpb-plane signature.
    */
  private def vecBandCtesScaledTb(tb: Int): String =
    s"""cntv AS (SELECT count(*)::BIGINT AS n FROM e),
      |prm AS (SELECT coalesce((SELECT min(r)::INT
      |  FROM (SELECT unnest(generate_series(4, 16)) AS r) t, cntv
      |  WHERE ($tb::BIGINT << r) >= cntv.n), 16) AS rpb),""".stripMargin + "\n" +
    """sig AS (SELECT vec_id, v, list_transform(generate_series(0, 8*prm.rpb - 1), p ->
      |  CASE WHEN list_reduce(list_transform(generate_series(1, len(v)),
      |    d -> v[d] * (CASE WHEN (p*2654435761 + d*40503) % 65537 % 2 = 1
      |                 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) > 0.0
      |  THEN 1 ELSE 0 END) AS sig FROM e, prm),
      |vbands AS (SELECT vec_id, unnest(list_transform(generate_series(0, 7), b ->
      |  b::VARCHAR || ':' || array_to_string(list_transform(
      |    list_slice(sig, b*rpb+1, b*rpb+rpb), x -> x::VARCHAR), ','))) AS band
      |  FROM sig, prm)""".stripMargin

  private val vecBandCtesScaled: String = vecBandCtesScaledTb(32)

  /** Multiprobe memberships under the adaptive width: base band keys plus
    * every Hamming-1 single-bit-flip variant — the b-side of the probed
    * kNN-join oracle (one-sided probing: the a-side stays `vbands`, so
    * candidates are exactly the band pairs at Hamming ≤ 1, mirroring the
    * kernel's probe-probe skip).
    */
  private val vecProbeCte: String =
    """vprobe AS (SELECT vec_id, band FROM vbands
      |  UNION ALL
      |  SELECT vec_id, unnest(flatten(list_transform(generate_series(0, 7), b ->
      |    list_transform(generate_series(0, rpb - 1), j ->
      |      b::VARCHAR || ':' || array_to_string(list_transform(generate_series(0, rpb - 1), i ->
      |        (CASE WHEN i = j THEN 1 - sig[(b*rpb+i+1)::INT]
      |         ELSE sig[(b*rpb+i+1)::INT] END)::VARCHAR), ','))))) AS band
      |  FROM sig, prm)""".stripMargin

  /** The Hamming-≤2 probe membership: vprobe (base + 1-bit flips) plus
    * every 2-bit-flip key — base × vprobe2 band matches are exactly the
    * Hamming ≤ 2 band pairs the probed kernel scores (probe-probe pairs
    * are skipped on the Spark side, and every Hamming ≤ 2 pair IS a
    * base-vs-flip pair by symmetry, so the two formulations coincide).
    */
  private val vecProbe2Cte: String =
    s"""$vecProbeCte,
      |vprobe2 AS (SELECT vec_id, band FROM vprobe
      |  UNION ALL
      |  SELECT vec_id, unnest(flatten(flatten(list_transform(generate_series(0, 7), b ->
      |    list_transform(generate_series(0, rpb - 2), j1 ->
      |      list_transform(generate_series(j1 + 1, rpb - 1), j2 ->
      |        b::VARCHAR || ':' || array_to_string(list_transform(generate_series(0, rpb - 1), i ->
      |          (CASE WHEN i = j1 OR i = j2 THEN 1 - sig[(b*rpb+i+1)::INT]
      |           ELSE sig[(b*rpb+i+1)::INT] END)::VARCHAR), ','))))))) AS band
      |  FROM sig, prm)""".stripMargin

  /** The unprobed corpus-adaptive kNN-graph oracle — shared verbatim by
    * `embed_knn_join_unprobed` and `embed_knn_join_tiled`: the tiled
    * escape is EXACT, so the two entries hash against the same SQL.
    */
  private val knnJoinUnprobedOracle: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |$vecBandCtesScaled,
       |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
       |         FROM vbands a JOIN vbands b ON a.band = b.band AND a.vec_id <> b.vec_id),
       |s AS (SELECT cand.vec_id, cand.nbr_id,
       |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
       |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
       |            JOIN e eb ON cand.nbr_id = eb.vec_id),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC))::BIGINT AS rank FROM s)
       |SELECT vec_id, nbr_id, cosine, rank FROM r WHERE rank <= 3""".stripMargin

  /** NN-descent replay: the probed-default seed graph at the INTERNAL
    * width kBuild (the embed_knn_join oracle's CTEs with top-kBuild)
    * followed by `rounds` UNROLLED refinement rounds, each mirroring the
    * Spark loop exactly — reverse edges capped at kBuild per target
    * (row_number over the same (cosine desc, id asc) order), the
    * undirected union, the neighbors-of-neighbors self-join ∪ current
    * edges (UNION dedups, mirroring distinct()), exact-cosine re-score,
    * per-vertex top-kBuild. Ends at CTE `gd$rounds`(vec_id, nbr_id,
    * cosine) of ≤ kBuild rows per vertex; the entry's final SELECT
    * truncates to the answer k.
    */
  private def knnDescentCtes(rounds: Int, kBuild: Int = 10): String = {
    val seed =
      s"""e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |${vecBandCtesScaledTb(128)},
         |$vecProbeCte,
         |cd0 AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
         |        FROM vbands a JOIN vprobe b ON a.band = b.band AND a.vec_id <> b.vec_id),
         |sd0 AS (SELECT cd0.vec_id, cd0.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cd0 JOIN e ea ON cd0.vec_id = ea.vec_id
         |           JOIN e eb ON cd0.nbr_id = eb.vec_id),
         |gd0 AS (SELECT vec_id, nbr_id, cosine FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rnk FROM sd0)
         |  WHERE rnk <= $kBuild)""".stripMargin
    val refine = (1 to rounds).map { i =>
      val p = i - 1
      s"""rv$i AS (SELECT nbr_id AS vec_id, vec_id AS nbr_id FROM (
         |  SELECT vec_id, nbr_id, row_number() OVER
         |    (PARTITION BY nbr_id ORDER BY cosine DESC, vec_id ASC) AS rr FROM gd$p)
         |  WHERE rr <= $kBuild),
         |ud$i AS (SELECT vec_id, nbr_id FROM gd$p UNION SELECT vec_id, nbr_id FROM rv$i),
         |cd$i AS (SELECT a.vec_id AS vec_id, b.nbr_id AS nbr_id
         |         FROM ud$i a JOIN ud$i b ON a.nbr_id = b.vec_id AND a.vec_id <> b.nbr_id
         |         UNION SELECT vec_id, nbr_id FROM ud$i),
         |sd$i AS (SELECT cd$i.vec_id, cd$i.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cd$i JOIN e ea ON cd$i.vec_id = ea.vec_id
         |            JOIN e eb ON cd$i.nbr_id = eb.vec_id),
         |gd$i AS (SELECT vec_id, nbr_id, cosine FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rnk FROM sd$i)
         |  WHERE rnk <= $kBuild)""".stripMargin
    }
    (seed +: refine).mkString(",\n")
  }

  /** BM25 oracle body, factored so the hybrid-retrieval oracle replays
    * the IDENTICAL lexical ranking it fuses: the CTE chain (tok→sc) and
    * the per-doc rollup, shared verbatim by `text_bm25_topk` and
    * `text_hybrid_topk`.
    */
  /** The corpus-side BM25 base CTEs (tokenize → tf → doc lengths →
    * corpus stats) — the ONE copy both the single-query and the
    * multi-query lexical replays build on.
    */
  private def bm25BaseCtesFrom(docsRel: String): String =
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM $docsRel),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
      |lens AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
      |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS len_sum FROM lens)""".stripMargin

  /** The Okapi BM25 per-(doc, term) score expression (k1=1.2, b=0.75) —
    * the ONE copy of the formula; reads n/df/tf/dl/len_sum columns.
    */
  private val bm25TscoreSql: String =
    """ln((n::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
      |         * (tf::DOUBLE * (1.2 + 1.0))
      |         / (tf::DOUBLE + 1.2 * ((1.0 - 0.75)
      |            + 0.75 * dl::DOUBLE / (len_sum::DOUBLE / n::DOUBLE)))""".stripMargin

  private def bm25CtesSqlFrom(docsRel: String): String =
    s"""${bm25BaseCtesFrom(docsRel)},
      |q AS (SELECT DISTINCT term FROM tf WHERE doc_id = 0),
      |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf
      |        WHERE term IN (SELECT term FROM q) GROUP BY 1),
      |pt AS (SELECT tf.doc_id, tf.term, tf.tf, lens.dl, dft.df, stats.n, stats.len_sum
      |       FROM tf JOIN dft USING (term)
      |       JOIN lens ON tf.doc_id = lens.doc_id, stats
      |       WHERE tf.doc_id <> 0),
      |sc AS (SELECT doc_id, dl, term,
      |       $bm25TscoreSql AS tscore
      |       FROM pt)""".stripMargin

  private val bm25CtesSql: String = bm25CtesSqlFrom("documents")

  private val bm25RollupSql: String =
    """SELECT doc_id, count(*)::BIGINT AS n_shared_terms, dl,
      |  round(list_reduce(
      |    list_prepend(0.0, list_transform(
      |      list_sort(list(struct_pack(term := term, tscore := tscore))),
      |      s2 -> s2.tscore)),
      |    (a, b2) -> a + b2), 6) AS score
      |FROM sc GROUP BY doc_id, dl""".stripMargin

  /** The complete BM25 ranking oracle — shared by the in-DAG entry and
    * both persisted-index serves (`text_bm25_serve`,
    * `text_bm25_incremental`): the serve plans are the SAME oracle-gated
    * ranking over postings that were materialized instead of in-DAG, so
    * the replay is identical by construction.
    */
  private val bm25TopSql: String =
    s"""WITH $bm25CtesSql
       |$bm25RollupSql
       |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin

  /** Hybrid-retrieval oracle: the SAME BM25 rollup (shared CTEs) ranked,
    * the exact cosine top-20 of vec 0 ranked, full-outer fused by RRF —
    * pure integer-rank arithmetic after the two retrievals
    * (1.0/(60+rank) is the same IEEE division of the same integers in
    * both engines, summed lexical-then-semantic, one round(6)). Shared
    * by the in-DAG entry and the artifact-only serve
    * (`text_hybrid_serve`).
    */
  /** The single-query hybrid oracle's shared frame: the ranked lexical
    * CTEs (bm/bmr) and, after the caller's `semall` CTE, the fusion tail
    * (sem top-20 → ranks → RRF full-outer → top-10) — the ONE copy the
    * exact and probed serve oracles both close with.
    */
  private val bm25RankedCtes: String =
    s"""bm AS ($bm25RollupSql ORDER BY score DESC, doc_id ASC LIMIT 20),
       |bmr AS (SELECT doc_id, (row_number() OVER
       |  (ORDER BY score DESC, doc_id ASC))::BIGINT AS lex_rank FROM bm)""".stripMargin

  private val hybridFusionTailSql: String =
    s"""semtop AS (SELECT vec_id, cosine FROM semall
       |           ORDER BY cosine DESC, vec_id ASC LIMIT 20),
       |semr AS (SELECT vec_id, (row_number() OVER
       |  (ORDER BY cosine DESC, vec_id ASC))::BIGINT AS sem_rank FROM semtop),
       |f AS (SELECT coalesce(b.doc_id, s.vec_id) AS doc_id, b.lex_rank, s.sem_rank,
       |  round(coalesce(1.0::DOUBLE / (60 + b.lex_rank)::DOUBLE, 0.0)
       |      + coalesce(1.0::DOUBLE / (60 + s.sem_rank)::DOUBLE, 0.0), 6) AS rrf
       |  FROM bmr b FULL JOIN semr s ON b.doc_id = s.vec_id)
       |SELECT doc_id, lex_rank, sem_rank, rrf, rank FROM (
       |  SELECT *, (row_number() OVER
       |    (ORDER BY rrf DESC, doc_id ASC))::BIGINT AS rank FROM f)
       |WHERE rank <= 10""".stripMargin

  private def hybridTopSqlFrom(docsRel: String, embRel: String): String =
    s"""WITH ${bm25CtesSqlFrom(docsRel)},
       |$bm25RankedCtes,
       |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM $embRel),
       |qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |semall AS (SELECT e.vec_id, round(${cosineSql("e.v", "qv.qv")}, 6) AS cosine
       |           FROM e, qv WHERE e.vec_id <> 0),
       |$hybridFusionTailSql""".stripMargin

  private val hybridTopSql: String = hybridTopSqlFrom("documents", "embeddings")

  /** Forget-then-serve hybrid oracle: the identical fusion replayed over
    * the corpus MINUS the forgotten ids (doc_id ≡ 3 mod 7 — chosen so the
    * query doc 0 survives) — a forgotten doc must vanish from BOTH fused
    * rank lists AND stop contributing to df/N/avgdl, which is exactly
    * what filtering the base relations replays.
    */
  private val hybridForgetSql: String = hybridTopSqlFrom(
    "(SELECT * FROM documents WHERE doc_id % 7 <> 3)",
    "(SELECT * FROM embeddings WHERE vec_id % 7 <> 3)")

  /** The PROBED artifact-only hybrid serve's oracle: the same lexical
    * ranking, but the semantic side replays the IVF scale tier — the
    * trained quantizer (the [[kmTrainedAssignCtes]] Lloyd replay, the
    * exact training `buildIvfIndex` ran), the query's top-`nprobe` cells
    * by round(cosine,6) with lowest-cl ties (the kmeansAssign
    * discipline), and exact cosine over ONLY the probed cells' vectors.
    * Training, probing, candidate membership, and the fused ranking are
    * ALL part of the checked contract.
    */
  private def hybridServeProbedSqlFrom(nprobe: Int, docsRel: String,
      embRel: String): String =
    s"""WITH ${bm25CtesSqlFrom(docsRel)},
       |$bm25RankedCtes,
       |${kmTrainedAssignCtes(None, embRel = embRel)},
       |qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |pdq AS (SELECT c.cl, round(${cosineSql("qv.qv", "c.cv")}, 6) AS csim FROM qv, c2 c),
       |probe AS (SELECT cl FROM (SELECT *, row_number() OVER
       |  (ORDER BY csim DESC, cl ASC) AS rn FROM pdq) WHERE rn <= $nprobe),
       |semall AS (SELECT af.vec_id, round(${cosineSql("af.v", "qv.qv")}, 6) AS cosine
       |           FROM af JOIN probe USING (cl), qv WHERE af.vec_id <> 0),
       |$hybridFusionTailSql""".stripMargin

  private def hybridServeProbedSql(nprobe: Int): String =
    hybridServeProbedSqlFrom(nprobe, "documents", "embeddings")

  /** The AUTO hybrid-serve oracle (the [[knnJoinAutoSql]] discipline on
    * the RAG serve): the SAME vector-corpus count(*) gate the Spark side
    * branches on, pushed into BOTH arms' source relations (documents AND
    * embeddings), so the deselected arm — the Lloyd replay of the probed
    * tier in particular — runs over ZERO rows. Exactly one arm is
    * non-empty for any corpus; the union IS the selected tier's result.
    */
  // defs, not vals (r15): these re-read the family crossover so a
  // test-scoped override (GRAFT_XOVER_*) flows into the dumped oracle
  private def hybridServeAutoSql: String = {
    val xover = graft.operators.TextAnalysis.hybridProbeCrossover
    def gated(rel: String, gate: String) = s"(SELECT * FROM $rel WHERE $gate)"
    val below = s"(SELECT count(*) FROM embeddings) < $xover"
    val atOrAbove = s"(SELECT count(*) FROM embeddings) >= $xover"
    s"""SELECT * FROM (${hybridTopSqlFrom(gated("documents", below), gated("embeddings", below))})
       |UNION ALL
       |SELECT * FROM (${hybridServeProbedSqlFrom(2, gated("documents", atOrAbove), gated("embeddings", atOrAbove))})""".stripMargin
  }

  /** MULTI-QUERY hybrid serve oracle — the [[hybridServeBatch]] kernel
    * replayed end-to-end for the first `nQueries` corpus documents as
    * EXTERNAL queries (no self-exclusion: a query's own doc legitimately
    * ranks #1 for it, the known-item check). `nprobe = None` replays the
    * exact flat semantic tier; `Some(p)` replays the IVF probe (per-query
    * top-p trained cells, candidates from those cells only). The lexical
    * side is identical either way — nprobe is a semantic-tier knob.
    */
  private def hybridBatchSql(nQueries: Int, nprobe: Option[Int]): String = {
    val semCtes = nprobe match {
      case None =>
        s"""e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
           |qe AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries),
           |semsc AS (SELECT qe.query_id, e.vec_id,
           |  round(${cosineSql("e.v", "qe.qv")}, 6) AS cosine FROM e, qe)""".stripMargin
      case Some(p) =>
        s"""${kmTrainedAssignCtes(None)},
           |qe AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries),
           |pdq AS (SELECT qe.query_id, c.cl,
           |  round(${cosineSql("qe.qv", "c.cv")}, 6) AS csim FROM qe, c2 c),
           |probe AS (SELECT query_id, cl FROM (SELECT *, row_number() OVER
           |  (PARTITION BY query_id ORDER BY csim DESC, cl ASC) AS rn FROM pdq)
           |  WHERE rn <= $p),
           |semsc AS (SELECT probe.query_id, af.vec_id,
           |  round(${cosineSql("af.v", "qe.qv")}, 6) AS cosine
           |  FROM probe JOIN af ON af.cl = probe.cl
           |  JOIN qe ON qe.query_id = probe.query_id)""".stripMargin
    }
    s"""WITH ${bm25BaseCtesFrom("documents")},
       |qterms AS (SELECT DISTINCT doc_id AS query_id, term FROM tok
       |           WHERE doc_id < $nQueries),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf
       |        WHERE term IN (SELECT term FROM qterms) GROUP BY 1),
       |pt AS (SELECT qt.query_id, tf.doc_id, tf.term, tf.tf, lens.dl, dft.df,
       |         stats.n, stats.len_sum
       |       FROM tf JOIN qterms qt USING (term) JOIN dft USING (term)
       |       JOIN lens ON tf.doc_id = lens.doc_id, stats),
       |sc AS (SELECT query_id, doc_id, term,
       |       $bm25TscoreSql AS tscore
       |       FROM pt),
       |lexsc AS (SELECT query_id, doc_id,
       |    round(list_reduce(
       |      list_prepend(0.0, list_transform(
       |        list_sort(list(struct_pack(term := term, tscore := tscore))),
       |        s2 -> s2.tscore)),
       |      (a, b2) -> a + b2), 6) AS score
       |  FROM sc GROUP BY 1, 2),
       |lexr AS (SELECT query_id, doc_id AS id, rn::BIGINT AS lex_rank FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
       |  FROM lexsc) WHERE rn <= 20),
       |$semCtes,
       |semr AS (SELECT query_id, vec_id AS id, rn::BIGINT AS sem_rank FROM (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
       |  FROM semsc) WHERE rn <= 20),
       |f AS (SELECT coalesce(l.query_id, s.query_id) AS query_id,
       |  coalesce(l.id, s.id) AS doc_id, l.lex_rank, s.sem_rank,
       |  round(coalesce(1.0::DOUBLE / (60 + l.lex_rank)::DOUBLE, 0.0)
       |      + coalesce(1.0::DOUBLE / (60 + s.sem_rank)::DOUBLE, 0.0), 6) AS rrf
       |  FROM lexr l FULL JOIN semr s ON l.query_id = s.query_id AND l.id = s.id)
       |SELECT query_id, doc_id, lex_rank, sem_rank, rrf, rank FROM (
       |  SELECT *, (row_number() OVER
       |    (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC))::BIGINT AS rank FROM f)
       |WHERE rank <= 10""".stripMargin
  }

  /** Fused-rank recall oracle: the exact and probed batch serves as
    * parenthesized WITH subqueries, left-joined per (query, doc) — the
    * same shape as the kNN-graph recall oracles.
    */
  private def hybridProbedRecallSql(nQueries: Int, nprobe: Int): String =
    s"""WITH ex AS (SELECT query_id, doc_id FROM (${hybridBatchSql(nQueries, None)})),
       |pr AS (SELECT query_id, doc_id FROM (${hybridBatchSql(nQueries, Some(nprobe))}))
       |SELECT ex.query_id, count(*)::BIGINT AS n_exact,
       |  count(pr.doc_id)::BIGINT AS n_hit,
       |  round(count(pr.doc_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
       |FROM ex LEFT JOIN pr ON ex.query_id = pr.query_id AND ex.doc_id = pr.doc_id
       |GROUP BY 1""".stripMargin

  /** Brute-force / LSH k-NN oracles as vals: each is also nested (as a
    * parenthesized WITH subquery) inside the recall-evaluation oracle.
    */
  private val bruteKnnSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |s AS (SELECT q.query_id, e.vec_id, round(${cosineSql("e.v", "q.qv")}, 6) AS cosine
       |      FROM e, q WHERE e.vec_id <> q.query_id),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin

  /** Exact MIPS top-k replay — the brute cosine oracle with the raw dot
    * product as the score (same fold order, so bit-equal before round).
    * `gate` empties the source scan for a discarded UNION arm (the
    * kmSizedTrainCtesGatedBy discipline).
    */
  private def mipsBruteSqlGatedBy(gate: String): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |           FROM embeddings WHERE $gate),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |s AS (SELECT q.query_id, e.vec_id, round(${dotSql("e.v", "q.qv")}, 6) AS ip
       |      FROM e, q WHERE e.vec_id <> q.query_id),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY ip DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, ip, rank FROM r WHERE rank <= 5""".stripMargin

  private val mipsBruteSql: String = mipsBruteSqlGatedBy("TRUE")

  /** ALSH MIPS replay: M² corpus max-norm aggregate, the asymmetric
    * augmentation [x;√(M²−|x|²)] on the index side (17-dim signature sums;
    * the query's augmented 0 contributes nothing, so its signature replays
    * over v directly), the 4×4 banding, and the exact-dot re-rank — every
    * stage the Spark plan runs, in the same double fold order.
    */
  private val mipsAlshSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |m AS (SELECT max(${dotSql("v", "v")}) AS m2 FROM e),
       |a AS (SELECT vec_id, v, list_append(v,
       |  sqrt(greatest(m2 - ${dotSql("v", "v")}, 0.0))) AS va FROM e CROSS JOIN m),
       |sig AS (SELECT vec_id, v, list_transform(generate_series(0, 15), p ->
       |  CASE WHEN list_reduce(list_transform(generate_series(1, len(va)),
       |    d -> va[d] * (CASE WHEN (p*2654435761 + d*40503) % 65537 % 2 = 1
       |                 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) > 0.0
       |  THEN 1 ELSE 0 END) AS sig FROM a),
       |bands AS (SELECT vec_id, v, unnest(list_transform(generate_series(0, 3), b ->
       |  b::VARCHAR || ':' || array_to_string(list_transform(
       |    list_slice(sig, b*4+1, b*4+4), x -> x::VARCHAR), ','))) AS band FROM sig),
       |qsig AS (SELECT vec_id, v, list_transform(generate_series(0, 15), p ->
       |  CASE WHEN list_reduce(list_transform(generate_series(1, len(v)),
       |    d -> v[d] * (CASE WHEN (p*2654435761 + d*40503) % 65537 % 2 = 1
       |                 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) > 0.0
       |  THEN 1 ELSE 0 END) AS sig FROM e WHERE vec_id < 10),
       |qb AS (SELECT vec_id AS query_id, v AS qv, unnest(list_transform(generate_series(0, 3), b ->
       |  b::VARCHAR || ':' || array_to_string(list_transform(
       |    list_slice(sig, b*4+1, b*4+4), x -> x::VARCHAR), ','))) AS band FROM qsig),
       |cand AS (SELECT DISTINCT qb.query_id, c.vec_id, c.v, qb.qv
       |         FROM bands c JOIN qb USING (band) WHERE c.vec_id <> qb.query_id),
       |s AS (SELECT query_id, vec_id, round(${dotSql("v", "qv")}, 6) AS ip FROM cand),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY ip DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, ip, rank FROM r WHERE rank <= 5""".stripMargin

  /** [[mipsAlshSql]] under the CORPUS-ADAPTIVE width: the same
    * shift-and-compare rpb derivation as [[vecBandCtesScaledTb]] (tb=32),
    * then 8 bands of rpb bits over an 8·rpb-plane signature — index side
    * over the augmented va (65 dims), query side over v directly (the
    * augmented 0 contributes nothing). Everything else is the fixed
    * oracle verbatim.
    */
  private val mipsAlshScaledSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |cntv AS (SELECT count(*)::BIGINT AS n FROM e),
       |prm AS (SELECT coalesce((SELECT min(r)::INT
       |  FROM (SELECT unnest(generate_series(4, 16)) AS r) t, cntv
       |  WHERE (32::BIGINT << r) >= cntv.n), 16) AS rpb),
       |m AS (SELECT max(${dotSql("v", "v")}) AS m2 FROM e),
       |a AS (SELECT vec_id, v, list_append(v,
       |  sqrt(greatest(m2 - ${dotSql("v", "v")}, 0.0))) AS va FROM e CROSS JOIN m),
       |sig AS (SELECT vec_id, v, list_transform(generate_series(0, 8*prm.rpb - 1), p ->
       |  CASE WHEN list_reduce(list_transform(generate_series(1, len(va)),
       |    d -> va[d] * (CASE WHEN (p*2654435761 + d*40503) % 65537 % 2 = 1
       |                 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) > 0.0
       |  THEN 1 ELSE 0 END) AS sig FROM a, prm),
       |bands AS (SELECT vec_id, v, unnest(list_transform(generate_series(0, 7), b ->
       |  b::VARCHAR || ':' || array_to_string(list_transform(
       |    list_slice(sig, b*rpb+1, b*rpb+rpb), x -> x::VARCHAR), ','))) AS band
       |  FROM sig, prm),
       |qsig AS (SELECT vec_id, v, list_transform(generate_series(0, 8*prm.rpb - 1), p ->
       |  CASE WHEN list_reduce(list_transform(generate_series(1, len(v)),
       |    d -> v[d] * (CASE WHEN (p*2654435761 + d*40503) % 65537 % 2 = 1
       |                 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) > 0.0
       |  THEN 1 ELSE 0 END) AS sig FROM e, prm WHERE vec_id < 10),
       |qb AS (SELECT vec_id AS query_id, v AS qv, unnest(list_transform(generate_series(0, 7), b ->
       |  b::VARCHAR || ':' || array_to_string(list_transform(
       |    list_slice(sig, b*rpb+1, b*rpb+rpb), x -> x::VARCHAR), ','))) AS band
       |  FROM qsig, prm),
       |cand AS (SELECT DISTINCT qb.query_id, c.vec_id, c.v, qb.qv
       |         FROM bands c JOIN qb USING (band) WHERE c.vec_id <> qb.query_id),
       |s AS (SELECT query_id, vec_id, round(${dotSql("v", "qv")}, 6) AS ip FROM cand),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY ip DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, ip, rank FROM r WHERE rank <= 5""".stripMargin

  /** Add-one bigram LM replay (text_lm_score, and the tier split's input):
    * identical count tables, identical round(ln(integer), 6) terms,
    * decimal-summed — bit-equal by the same argument as the cosine family.
    */
  private val lmScoreSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |uni AS (SELECT t, count(*)::BIGINT AS c1
      |        FROM (SELECT unnest(w) AS t FROM tok) GROUP BY 1),
      |prm AS (SELECT CAST(sum(c1) AS BIGINT) AS tot, count(*)::BIGINT AS voc FROM uni),
      |bi AS (SELECT doc_id, w[di.i] AS a, w[di.i+1] AS b FROM tok,
      |  LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i) di),
      |big AS (SELECT a, b, count(*)::BIGINT AS c2 FROM bi GROUP BY 1, 2),
      |ft AS (SELECT doc_id, round(ln(c1), 6) - round(ln(tot), 6) AS lp
      |       FROM tok JOIN uni ON w[1] = t CROSS JOIN prm),
      |bc AS (SELECT bi.doc_id, round(ln(c2 + 1), 6) - round(ln(c1 + voc), 6) AS lp
      |       FROM bi JOIN big USING (a, b) JOIN uni ON bi.a = uni.t CROSS JOIN prm),
      |al AS (SELECT doc_id, lp FROM ft UNION ALL SELECT doc_id, lp FROM bc)
      |SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |  round(CAST(sum(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_logprob
      |FROM al GROUP BY 1""".stripMargin

  /** DSIR replay (TextAnalysis.dsirScores): hashed-unigram bucket counts
    * for target (lang='en') vs raw, add-one-smoothed log-likelihood ratios
    * as exact 6dp decimals (every ln input an integer), decimal-summed per
    * doc — the lmScore portability discipline.
    */
  private val dsirScoresSql: String =
    s"""WITH tk AS (SELECT doc_id, lang = 'en' AS is_target, ${duckHash("t")} % 64 AS b
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''),
       |bc AS (SELECT b, count(*)::BIGINT AS r_b,
       |  sum(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS t_b FROM tk GROUP BY 1),
       |tt AS (SELECT CAST(sum(r_b) AS BIGINT) AS r_tot,
       |       CAST(sum(t_b) AS BIGINT) AS t_tot FROM bc),
       |w AS (SELECT b,
       |  CAST(round(ln(t_b + 1), 6) AS DECIMAL(18,6))
       |  - CAST(round(ln(t_tot + 64), 6) AS DECIMAL(18,6))
       |  - CAST(round(ln(r_b + 1), 6) AS DECIMAL(18,6))
       |  + CAST(round(ln(r_tot + 64), 6) AS DECIMAL(18,6)) AS w_b
       |  FROM bc CROSS JOIN tt)
       |SELECT tk.doc_id, count(*)::BIGINT AS n_tokens,
       |  round(CAST(sum(w_b) AS DOUBLE), 6) AS dsir_logweight
       |FROM tk JOIN w USING (b) GROUP BY 1""".stripMargin

  /** Connected-components keeper replay (Dedup.dedupClusters over the
    * exact Jaccard≥0.7 pair join): recursive closure to the per-component
    * min id — shared by the clusters entry and the cluster-aware split.
    */
  private lazy val clustersKeeperSql: String =
    s"""WITH RECURSIVE ${shingleCte(3)},
       |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.7),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |mn AS (SELECT src, min(dst) AS m FROM reach GROUP BY 1)
       |SELECT d.doc_id,
       |  least(d.doc_id, coalesce(mn.m, d.doc_id)) AS keeper,
       |  d.doc_id = least(d.doc_id, coalesce(mn.m, d.doc_id)) AS kept
       |FROM documents d LEFT JOIN mn ON d.doc_id = mn.src""".stripMargin

  /** CDC chunking replay (TextAnalysis.chunkDocumentsCdc): anchor rule,
    * running boundary count, anchor-relative sub-split, space-joined chunk
    * hash — shared by the chunks entry and its dedup rollup.
    */
  private val cdcChunksSql: String =
    s"""WITH tk AS (SELECT doc_id, w[u.i] AS t, (u.i - 1)::BIGINT AS pos
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
       |       LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) u
       |  WHERE w[u.i] <> ''),
       |fl AS (SELECT doc_id, t, pos,
       |  CASE WHEN ${duckHash("t")} % 32 = 0 THEN 1 ELSE 0 END AS f FROM tk),
       |cd AS (SELECT doc_id, t, pos, CAST(sum(f) OVER
       |  (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cid
       |  FROM fl),
       |cs AS (SELECT *, min(pos) OVER (PARTITION BY doc_id, cid) AS cstart FROM cd),
       |ch AS (SELECT doc_id, cid AS chunk_seq, (pos - cstart) // 128 AS sub_seq,
       |  count(*)::BIGINT AS n_tokens, min(pos) AS start_pos, max(pos) AS end_pos,
       |  string_agg(t, ' ' ORDER BY pos) AS ct
       |  FROM cs GROUP BY 1, 2, 3)
       |SELECT doc_id, chunk_seq, sub_seq, n_tokens, start_pos, end_pos,
       |  ${duckHash("ct")} AS chunk_hash FROM ch""".stripMargin

  /** Truncation-recall oracle: one branch per d' — the brute top-k replay
    * over list_slice'd prefix vectors, hits counted against the full-dim
    * exact set; UNION ALL of the per-d' aggregates.
    */
  /** Full bit-replay of the trained quality classifier
    * (TextAnalysis.qualityClassifierWeights): hashed-frequency features +
    * bias, then `iters` unrolled full-batch GD rounds — z in fixed
    * ascending-j fold order, the RATIONAL sigmoid (only IEEE-exact ops, no
    * libm), per-row gradient terms rounded to 6dp and decimal-summed,
    * update scaled by the exact η=4.0 / n. Returns the WITH-clause chain
    * ending at CTE `w<iters>` (1-row weight list) + `feat`/`nn`.
    */
  private def classifierCtes(dims: Int = 16, iters: Int = 3): String = {
    val dp = dims + 1
    val base =
      s"""d0 AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM documents),
         |tokc AS (SELECT doc_id, ${duckHash("t")} % $dims AS j, count(*)::BIGINT AS c
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
         |  WHERE t <> '' GROUP BY 1, 2),
         |dense AS (SELECT d.doc_id, js.j, coalesce(tc.c, 0) AS c
         |  FROM d0 d CROSS JOIN (SELECT unnest(generate_series(0, ${dims - 1})) AS j) js
         |  LEFT JOIN tokc tc ON tc.doc_id = d.doc_id AND tc.j = js.j),
         |xt AS (SELECT doc_id, list(c ORDER BY j) AS cs, sum(c)::BIGINT AS ntok
         |  FROM dense GROUP BY doc_id),
         |feat AS (SELECT x.doc_id, d.y,
         |  list_append(list_transform(cs, c ->
         |    CASE WHEN ntok = 0 THEN 0.0 ELSE c::DOUBLE / ntok::DOUBLE END), 1.0) AS x
         |  FROM xt x JOIN d0 d ON d.doc_id = x.doc_id),
         |nn AS (SELECT count(*)::BIGINT AS n FROM documents),
         |w0 AS (SELECT list_transform(generate_series(0, $dims), j -> 0.0) AS w)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""s$t AS (SELECT f.doc_id, f.y, f.x,
         |  list_reduce(list_transform(generate_series(1, $dp), j -> w[j] * x[j]),
         |    (a, b) -> a + b) AS z
         |  FROM feat f CROSS JOIN w${t - 1}),
         |g$t AS (SELECT u.jj - 1 AS j,
         |  sum(CAST(round(x[u.jj] * (0.5 + 0.5*z/(1.0 + abs(z)) - y), 6) AS DECIMAL(18,6))) AS gj
         |  FROM s$t, LATERAL (SELECT unnest(generate_series(1, $dp)) AS jj) u
         |  GROUP BY 1),
         |w$t AS (SELECT list(wv ORDER BY j) AS w FROM (
         |  SELECT g.j, w.w[(g.j + 1)::INT] - 4.0 * (g.gj::DOUBLE / nn.n::DOUBLE) AS wv
         |  FROM g$t g CROSS JOIN w${t - 1} w CROSS JOIN nn))""".stripMargin
    }.mkString(",\n")
    s"WITH $base,\n$steps"
  }

  /** BPE-trainer replay: the word-frequency base (`t0` carries the
    * bracketed char encoding) plus `rounds` unrolled merge rounds — each
    * round counts adjacent pairs from the current tokenization, takes the
    * same (count desc, lhs asc, rhs asc) argmax, and rewrites with the
    * same left-to-right literal replace. `m$t` is round t's merge, `t$t`
    * the tokenization after it — the trainer's cache-recompute loop,
    * flattened into CTEs. `t$t` joins its merge with LEFT JOIN ON true,
    * not CROSS JOIN: when the corpus EXHAUSTS before `rounds` (every word
    * one token — `p$t` empty so `m$t` is empty), the tokenization must
    * pass through unchanged, mirroring the trainer's early stop; a cross
    * join against the empty merge would silently empty every later CTE
    * and fail the hash gate with zero rows.
    */
  /** The trained merge TABLE replayed as SQL — shared verbatim by the
    * chain, kernel, and evolving trainer entries, which are spec-pinned
    * merge-identical (editing one trainer's oracle must edit all). */
  private lazy val bpeMergeTableSql: String =
    s"""${bpeCtes(8)}
       |${(1 to 8).map(t =>
           s"SELECT $t::BIGINT AS merge_round, a AS lhs, b AS rhs, " +
             s"a||b AS merged, cnt AS pair_count FROM m$t")
         .mkString("\nUNION ALL\n")}""".stripMargin

  private def bpeCtes(rounds: Int): String = {
    val base =
      """wrd AS (SELECT w, count(*)::BIGINT AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1),
        |t0 AS (SELECT w, c, regexp_replace(w, '(.)', '<\1>', 'g') AS s FROM wrd)""".stripMargin
    val steps = (1 to rounds).map { t =>
      s"""p$t AS (SELECT l[u.i] AS a, l[u.i+1] AS b, CAST(sum(c) AS BIGINT) AS cnt
         |  FROM (SELECT c, string_split(trim(s, '<>'), '><') AS l FROM t${t - 1}) tt,
         |       LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) u
         |  GROUP BY 1, 2),
         |m$t AS (SELECT a, b, cnt FROM p$t ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |t$t AS (SELECT w, c,
         |    CASE WHEN m.a IS NULL THEN s
         |         ELSE replace(s, '<'||m.a||'><'||m.b||'>', '<'||m.a||m.b||'>') END AS s
         |  FROM t${t - 1} LEFT JOIN m$t m ON true)""".stripMargin
    }.mkString(",\n")
    s"WITH $base,\n$steps"
  }

  private def truncRecallSql(dPrimes: Seq[Int]): String =
    dPrimes.map { dp =>
      s"""(WITH t AS (SELECT vec_id,
         |  list_slice(list_transform(embedding, x -> x::DOUBLE), 1, $dp) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM t WHERE vec_id < 10),
         |s AS (SELECT q.query_id, t.vec_id, round(${cosineSql("t.v", "q.qv")}, 6) AS tcos
         |      FROM t, q WHERE t.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER
         |      (PARTITION BY query_id ORDER BY tcos DESC, vec_id ASC) AS rank FROM s),
         |ap AS (SELECT query_id, vec_id FROM r WHERE rank <= 5),
         |br AS (SELECT query_id, vec_id FROM ($bruteKnnSql))
         |SELECT $dp::BIGINT AS d_prime, count(*)::BIGINT AS n_exact,
         |  count(ap.vec_id)::BIGINT AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap
         |  ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id)""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** JL random-projection recall oracle: the same deterministic ±1 sign
    * family as the engine (j·2654435761 + d·40503 mod 65537 mod 2), the
    * same ascending-d fold per output dim, then the truncation-recall
    * rollup shape per d'.
    */
  private def rpRecallSql(dPrimes: Seq[Int], dims: Int = 64): String =
    dPrimes.map { dp =>
      s"""(WITH t AS (SELECT vec_id,
         |  list_transform(generate_series(1, $dp), j ->
         |    list_reduce(list_transform(generate_series(1, $dims), d ->
         |      (embedding[d]::DOUBLE) * (CASE WHEN (j*2654435761 + d*40503) % 65537 % 2 = 1
         |                                THEN 1.0 ELSE -1.0 END)),
         |      (a, b) -> a + b)) AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM t WHERE vec_id < 10),
         |s AS (SELECT q.query_id, t.vec_id, round(${cosineSql("t.v", "q.qv")}, 6) AS tcos
         |      FROM t, q WHERE t.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER
         |      (PARTITION BY query_id ORDER BY tcos DESC, vec_id ASC) AS rank FROM s),
         |ap AS (SELECT query_id, vec_id FROM r WHERE rank <= 5),
         |br AS (SELECT query_id, vec_id FROM ($bruteKnnSql))
         |SELECT $dp::BIGINT AS d_prime, count(*)::BIGINT AS n_exact,
         |  count(ap.vec_id)::BIGINT AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap
         |  ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id)""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** MMR replay (EmbeddingSearch.mmrTopK): the brute top-nCand shortlist,
    * then k unrolled greedy rounds — anti-join the selected, max-penalty
    * join, per-query (score desc, vec_id asc) argmax — at λ = ½ so every
    * step is exact halving of 6dp cosines.
    */
  private def mmrSql(k: Int = 5, nCand: Int = 20, nQueries: Int = 10): String = {
    val rounds = (2 to k).map { r =>
      s"""p$r AS (SELECT c.query_id, c.vec_id,
         |  max(round(${cosineSql("c.v", "s.v")}, 6)) AS pen
         |  FROM cand c JOIN a${r - 1} s ON c.query_id = s.query_id
         |  LEFT JOIN a${r - 1} x ON x.query_id = c.query_id AND x.vec_id = c.vec_id
         |  WHERE x.vec_id IS NULL GROUP BY 1, 2),
         |sc$r AS (SELECT p.query_id, p.vec_id, c.rel, c.v,
         |  round(0.5*c.rel - 0.5*p.pen, 6) AS mmr_score
         |  FROM p$r p JOIN cand c ON c.query_id = p.query_id AND c.vec_id = p.vec_id),
         |sel$r AS (SELECT query_id, vec_id, v, rel, mmr_score, $r::BIGINT AS pick
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY mmr_score DESC, vec_id ASC) AS rn FROM sc$r) WHERE rn = 1),
         |a$r AS (SELECT * FROM a${r - 1} UNION ALL SELECT * FROM sel$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |           FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries),
       |s0 AS (SELECT q.query_id, e.vec_id, round(${cosineSql("e.v", "q.qv")}, 6) AS rel,
       |       e.v FROM e, q WHERE e.vec_id <> q.query_id),
       |cand AS (SELECT query_id, vec_id, rel, v FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, vec_id ASC) AS rn FROM s0) WHERE rn <= $nCand),
       |a1 AS (SELECT query_id, vec_id, v, rel, mmr_score, 1::BIGINT AS pick
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY mmr_score DESC, vec_id ASC) AS rn
       |        FROM (SELECT *, round(0.5*rel, 6) AS mmr_score FROM cand))
       |  WHERE rn = 1),
       |$rounds
       |SELECT query_id, vec_id, pick, rel AS relevance, mmr_score FROM a$k""".stripMargin
  }

  /** SQ8 k-NN oracle: replays the quantizer training (per-dim min/max →
    * affine step), the rounded affine encode, the decode, and the ADC
    * cosine — every arithmetic step in the same order as sq8TopK, so the
    * scores are bit-equal. round() ties: both engines round half away from
    * zero for the non-negative (x-mn)/sc operand.
    */
  private def sq8KnnSql(samplePct: Option[Int] = None): String = {
    val trainCte = samplePct.map(p =>
      s"smp AS (SELECT * FROM e WHERE (vec_id * 1103515245 + 12345) % 2147483647 % 100 < $p),\n")
      .getOrElse("")
    val trainSrc = if (samplePct.isDefined) "smp" else "e"
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |${trainCte}st AS (SELECT di.i AS d, min(v[di.i]) AS mn, max(v[di.i]) AS mx
       |       FROM $trainSrc, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) di GROUP BY 1),
       |p AS (SELECT list(mn ORDER BY d) AS mn, list((mx - mn) / 255.0 ORDER BY d) AS sc FROM st),
       |dh AS (SELECT e.vec_id, list_transform(generate_series(1, len(e.v)), i ->
       |         p.mn[i] + (CASE WHEN p.sc[i] = 0.0 THEN 0.0
       |                    ELSE least(greatest(round((e.v[i] - p.mn[i]) / p.sc[i], 0), 0), 255)
       |                    END) * p.sc[i]) AS vhat
       |       FROM e, p),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |s AS (SELECT q.query_id, dh.vec_id, round(${cosineSql("dh.vhat", "q.qv")}, 6) AS sq_cosine
       |      FROM dh, q WHERE dh.vec_id <> q.query_id),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY sq_cosine DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, sq_cosine, rank FROM r WHERE rank <= 5""".stripMargin
  }

  private val lshKnnSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |sig AS (SELECT vec_id, v, list_transform(generate_series(0, 15), p ->
       |  CASE WHEN list_reduce(list_transform(generate_series(1, len(v)),
       |    d -> v[d] * (CASE WHEN (p*2654435761 + d*40503) % 65537 % 2 = 1
       |                 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) > 0.0
       |  THEN 1 ELSE 0 END) AS sig FROM e),
       |bands AS (SELECT vec_id, v, unnest(list_transform(generate_series(0, 3), b ->
       |  b::VARCHAR || ':' || array_to_string(list_transform(
       |    list_slice(sig, b*4+1, b*4+4), x -> x::VARCHAR), ','))) AS band FROM sig),
       |qb AS (SELECT vec_id AS query_id, v AS qv, band FROM bands WHERE vec_id < 10),
       |cand AS (SELECT DISTINCT qb.query_id, c.vec_id, c.v, qb.qv
       |         FROM bands c JOIN qb USING (band) WHERE c.vec_id <> qb.query_id),
       |s AS (SELECT query_id, vec_id, round(${cosineSql("v", "qv")}, 6) AS cosine FROM cand),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin

  /** Multi-probe LSH k-NN: same index-side bands; the query side also
    * probes every Hamming-1 band variant.
    */
  private val multiProbeKnnSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |sig AS (SELECT vec_id, v, list_transform(generate_series(0, 15), p ->
       |  CASE WHEN list_reduce(list_transform(generate_series(1, len(v)),
       |    d -> v[d] * (CASE WHEN (p*2654435761 + d*40503) % 65537 % 2 = 1
       |                 THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) > 0.0
       |  THEN 1 ELSE 0 END) AS sig FROM e),
       |bands AS (SELECT vec_id, v, unnest(list_transform(generate_series(0, 3), b ->
       |  b::VARCHAR || ':' || array_to_string(list_transform(
       |    list_slice(sig, b*4+1, b*4+4), x -> x::VARCHAR), ','))) AS band FROM sig),
       |qb AS (SELECT vec_id AS query_id, v AS qv,
       |  unnest(flatten(list_transform(generate_series(0, 3), b ->
       |    list_transform(generate_series(-1, 3), j ->
       |      b::VARCHAR || ':' || array_to_string(list_transform(generate_series(0, 3), i ->
       |        (CASE WHEN i = j THEN 1 - sig[(b*4+i+1)::INT] ELSE sig[(b*4+i+1)::INT] END)::VARCHAR),
       |        ','))))) AS band
       |  FROM sig WHERE vec_id < 10),
       |cand AS (SELECT DISTINCT qb.query_id, c.vec_id, c.v, qb.qv
       |         FROM bands c JOIN qb USING (band) WHERE c.vec_id <> qb.query_id),
       |s AS (SELECT query_id, vec_id, round(${cosineSql("v", "qv")}, 6) AS cosine FROM cand),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin

  /** Replays the deterministic spherical k-means training (seeds = first 8
    * training vectors by vec_id, 2 Lloyd rounds, decimal means, empty cells
    * keep their centroid), then the nprobe=2 probe + exact re-rank. With
    * `samplePct`, the TRAINING set is the affine-hash sample of vec_id —
    * exactly the engine's [[graft.operators.EmbeddingSearch]] portable
    * sample — while the final inverted file (`af`) and re-rank still cover
    * every vector, mirroring the train-on-a-sample/serve-everything split.
    */
  /** One Lloyd-round assignment CTE body shared by the whole-vector k-means
    * oracles ([[kmeansKnnSql]], the `dedup_semantic` replay); the PQ oracle keeps its
    * per-subspace variant. */
  private def kmAssignCte(srcCte: String, centCte: String): String =
    s"""SELECT vec_id, v, cl FROM (
       |  SELECT e.vec_id, e.v, c.cl, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY round(${cosineSql("e.v", "c.cv")}, 6) DESC, c.cl ASC) AS rn
       |  FROM $srcCte e, $centCte c) WHERE rn = 1""".stripMargin

  private def kmUpdateCtes(i: Int, aCte: String, prevCte: String): String =
    s"""m$i AS (SELECT cl, di.i AS d,
       |  CAST(sum(CAST(round(v[di.i], 6) AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
       |  FROM $aCte, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) di GROUP BY 1, 2),
       |n$i AS (SELECT cl, list(c ORDER BY d) AS cv FROM m$i GROUP BY 1),
       |c$i AS (SELECT $prevCte.cl, coalesce(n$i.cv, $prevCte.cv) AS cv
       |        FROM $prevCte LEFT JOIN n$i USING (cl))""".stripMargin

  /** The shared Lloyd replay to the final full assignment `af` — seeds,
    * exactly two rounds, round(cosine,6) argmax, DECIMAL(28,10) means,
    * lost-cluster coalesce — the trained-quantizer contract every k-means
    * oracle checks. */
  private def kmTrainedAssignCtes(samplePct: Option[Int],
      trainWhere: Option[String] = None,
      embRel: String = "embeddings"): String = {
    require(samplePct.isEmpty || trainWhere.isEmpty,
      "sample and explicit train predicate are alternative training sets")
    val train =
      if (samplePct.isDefined) "smp" else if (trainWhere.isDefined) "trn" else "e"
    val smpCte = samplePct.map(p =>
      s"smp AS (SELECT * FROM e WHERE (vec_id * 1103515245 + 12345) % 2147483647 % 100 < $p),\n")
      .getOrElse(trainWhere.map(w => s"trn AS (SELECT * FROM e WHERE $w),\n").getOrElse(""))
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |           FROM $embRel),
       |${smpCte}c0 AS (SELECT vec_id::INT AS cl, v AS cv FROM $train ORDER BY vec_id LIMIT 8),
       |a1 AS (${kmAssignCte(train, "c0")}),
       |${kmUpdateCtes(1, "a1", "c0")},
       |a2 AS (${kmAssignCte(train, "c1")}),
       |${kmUpdateCtes(2, "a2", "c1")},
       |af AS (${kmAssignCte("e", "c2")})""".stripMargin
  }

  /** The IVF probe + exact-re-rank serve TAIL (q → pd → pr → probe → s →
    * r → final top-5) — the ONE copy both the fixed-k and the sized
    * quantizer oracles rank with; expects CTEs `e`, `c2` (trained
    * centroids) and `af` (full assignment) from the training prefix. A
    * forked copy would let the hash-gated pair silently serve different
    * ranking rules.
    */
  /** The probe PROLOGUE of that tail (q → pd → pr → probe) on its own —
    * rank trained cells per query, keep the width `probeCond` allows
    * (`probeFrom` supplies an extra FROM table when the width is a
    * count-derived CTE like npv/npf) — so the rank tail and the range
    * tail share the one probing rule.
    */
  private def kmeansProbeCtes(probeCond: String, probeFrom: String = ""): String =
    s"""q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |pd AS (SELECT q.query_id, q.qv, c.cl,
       |  round(${cosineSql("q.qv", "c.cv")}, 6) AS csim FROM q, c2 c),
       |pr AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY csim DESC, cl ASC) AS rn FROM pd),
       |probe AS (SELECT query_id, qv, cl FROM pr$probeFrom WHERE $probeCond)""".stripMargin

  /** The tail over an arbitrary inverted-file CTE (`afCte`) and probe
    * width — the filtered entry re-ranks the FILTERED assignment at the
    * selectivity-widened width through this same single copy.
    */
  private def kmeansServeTailOver(afCte: String, probeCond: String,
      probeFrom: String = ""): String =
    s"""${kmeansProbeCtes(probeCond, probeFrom)},
       |s AS (SELECT probe.query_id, $afCte.vec_id,
       |  round(${cosineSql(s"$afCte.v", "probe.qv")}, 6) AS cosine
       |  FROM probe JOIN $afCte ON $afCte.cl = probe.cl
       |  WHERE $afCte.vec_id <> probe.query_id),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin

  private val kmeansServeTailSql: String = kmeansServeTailOver("af", "rn <= 2")

  private def kmeansKnnSql(samplePct: Option[Int],
      trainWhere: Option[String] = None): String = {
    s"""WITH ${kmTrainedAssignCtes(samplePct, trainWhere)},
       |$kmeansServeTailSql""".stripMargin
  }

  /** [[kmeansKnnSql]] under the CORPUS-ADAPTIVE cell count: k = ⌈√N⌉
    * clamped to [8, 65536], derived from count(*) exactly as
    * `EmbeddingSearch.ivfCellCount` (IEEE sqrt — correctly rounded in
    * both engines, exact on perfect squares); seeds = the first k
    * vectors by vec_id (row_number ≤ k, mirroring the k-row
    * TakeOrdered). Same two Lloyd rounds, same probe/re-rank tail.
    */
  /** The sized-quantizer TRAINING prefix (e → cntv → kk → c0 seeds → two
    * Lloyd rounds to `c2`) — shared by the sized kNN serve oracle and
    * the IVF-cell graph oracle, which both rank against the same trained
    * centroids.
    */
  /** The sized-quantizer training prefix, optionally GATED at the source
    * scan: `gate` is a scalar predicate on the corpus (constant per run)
    * ANDed into the `e` CTE, so a gated-off instance of this pipeline
    * processes ZERO rows end-to-end instead of paying the full Lloyd
    * replay for an arm whose output a UNION-ALL branch discards (the
    * auto-default oracle). `TRUE` yields the plain prefix.
    */
  private def kmSizedTrainCtesGatedBy(gate: String): String = {
    val seeds =
      s"""e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
         |           FROM embeddings WHERE $gate),
         |cntv AS (SELECT count(*)::BIGINT AS n FROM e),
         |kk AS (SELECT least(greatest(CAST(ceil(sqrt(n::DOUBLE)) AS BIGINT), 8), 65536) AS k
         |       FROM cntv),
         |c0 AS (SELECT vec_id::INT AS cl, v AS cv FROM (
         |  SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM e), kk
         |  WHERE rn <= kk.k)""".stripMargin
    s"""$seeds,
       |a1 AS (${kmAssignCte("e", "c0")}),
       |${kmUpdateCtes(1, "a1", "c0")},
       |a2 AS (${kmAssignCte("e", "c1")}),
       |${kmUpdateCtes(2, "a2", "c1")}""".stripMargin
  }

  private val kmSizedTrainCtes: String = kmSizedTrainCtesGatedBy("TRUE")

  /** The count-derived probe width — ONE copy of the npv formula
    * (integer half-up of cellsCandidateTarget·k/n, clamped [2,16]),
    * interpolating the Scala constant so the three consumers (cells
    * graph, its recall twin, IVF MIPS) can never drift from
    * `EmbeddingSearch.cellsNprobeFor`. On an empty gated-off corpus
    * `// 0` is NULL and `rn <= NULL` selects nothing — already-empty
    * arms stay empty, no error.
    */
  private def npCteFrom(cntCte: String, cteName: String): String =
    s"""$cteName AS (SELECT least(greatest(CAST((2 * ${graft.operators.EmbeddingSearch.cellsCandidateTarget} * kk.k + $cntCte.n)
       |  // (2 * $cntCte.n) AS BIGINT), 2), 16) AS np FROM kk, $cntCte)""".stripMargin

  private val npvCte: String = npCteFrom("cntv", "npv")

  private val kmeansKnnSizedSql: String = {
    s"""WITH $kmSizedTrainCtes,
       |af AS (${kmAssignCte("e", "c2")}),
       |$kmeansServeTailSql""".stripMargin
  }

  /** Filtered-kNN exact baseline: the brute replay with the corpus side
    * restricted to label = 3 (queries stay the full-corpus probe set).
    * `gate` empties the source scan for a discarded UNION arm (the
    * kmSizedTrainCtesGatedBy discipline).
    */
  private def filteredKnnBruteSqlGatedBy(gate: String): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v, label
       |           FROM embeddings WHERE $gate),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |s AS (SELECT q.query_id, e.vec_id, round(${cosineSql("e.v", "q.qv")}, 6) AS cosine
       |      FROM e, q WHERE e.vec_id <> q.query_id AND e.label = 3),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin

  private val filteredKnnBruteSql: String = filteredKnnBruteSqlGatedBy("TRUE")

  /** Filtered-kNN IVF replay: the FULL-corpus sized Lloyd prefix (one
    * quantizer serves every filter), the inverted file over the filter's
    * survivors only (`fe`/`aff`), and the probe width from the FILTERED
    * count — the npv formula fed `cntf`, widening by the inverse
    * selectivity so surviving candidates stay at the target.
    */
  private def filteredKnnIvfSqlGatedBy(gate: String): String =
    s"""WITH ${kmSizedTrainCtesGatedBy(gate)},
       |fe AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |       FROM embeddings WHERE label = 3 AND $gate),
       |cntf AS (SELECT count(*)::BIGINT AS n FROM fe),
       |${npCteFrom("cntf", "npf")},
       |aff AS (${kmAssignCte("fe", "c2")}),
       |${kmeansServeTailOver("aff", "rn <= npf.np", ", npf")}""".stripMargin

  private val filteredKnnIvfSql: String = filteredKnnIvfSqlGatedBy("TRUE")

  /** The filtered default's BRANCH VARIABLE as scalar SQL — the unclamped
    * widened width from the same two counts as
    * `EmbeddingSearch.filteredNpRaw` (full count → cells, filtered
    * count), pure BIGINT arithmetic so both engines derive the identical
    * branch. ONE copy interpolated into both arms' gates.
    */
  private val filteredNpRawSql: String =
    s"""(SELECT (2 * ${graft.operators.EmbeddingSearch.cellsCandidateTarget} *
       |  least(greatest(CAST(ceil(sqrt(fnc.n::DOUBLE)) AS BIGINT), 8), 65536) + fnm.m)
       |  // (2 * fnm.m)
       |  FROM (SELECT count(*)::BIGINT AS n FROM embeddings) fnc,
       |       (SELECT count(*)::BIGINT AS m FROM embeddings WHERE label = 3) fnm)""".stripMargin

  /** The filtered-kNN default: count-gated UNION ALL of the two replays —
    * exact filtered brute when the widened width would clamp (> 16),
    * the widened IVF serve otherwise. Each arm's gate is pushed into its
    * source scans, so the deselected arm processes zero rows. */
  private val filteredKnnAutoSql: String =
    s"""SELECT * FROM (${filteredKnnBruteSqlGatedBy(s"$filteredNpRawSql > 16")})
       |UNION ALL
       |SELECT * FROM (${filteredKnnIvfSqlGatedBy(s"$filteredNpRawSql <= 16")})""".stripMargin

  /** Filtered-MIPS exact baseline (the brute IP replay over the filter's
    * survivors; queries full-corpus), gated like the cosine sibling. */
  private def filteredMipsBruteSqlGatedBy(gate: String): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v, label
       |           FROM embeddings WHERE $gate),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |s AS (SELECT q.query_id, e.vec_id, round(${dotSql("e.v", "q.qv")}, 6) AS ip
       |      FROM e, q WHERE e.vec_id <> q.query_id AND e.label = 3),
       |r AS (SELECT *, (row_number() OVER
       |      (PARTITION BY query_id ORDER BY ip DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, ip, rank FROM r WHERE rank <= 5""".stripMargin

  /** Filtered-MIPS IVF replay: the full-corpus sized Lloyd prefix, the
    * filtered inverted file, the FILTERED-count probe width, and the
    * IP cell ranking + exact-IP re-rank (the mipsIvfSql tail over aff). */
  private def filteredMipsIvfSqlGatedBy(gate: String): String =
    s"""WITH ${kmSizedTrainCtesGatedBy(gate)},
       |fe AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |       FROM embeddings WHERE label = 3 AND $gate),
       |cntf AS (SELECT count(*)::BIGINT AS n FROM fe),
       |${npCteFrom("cntf", "npf")},
       |aff AS (${kmAssignCte("fe", "c2")}),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |pd AS (SELECT q.query_id, q.qv, c.cl,
       |  round(${dotSql("q.qv", "c.cv")}, 6) AS pip FROM q, c2 c),
       |pr AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY pip DESC, cl ASC) AS rn FROM pd),
       |probe AS (SELECT query_id, qv, cl FROM pr, npf WHERE rn <= npf.np),
       |s AS (SELECT probe.query_id, aff.vec_id,
       |  round(${dotSql("aff.v", "probe.qv")}, 6) AS ip
       |  FROM probe JOIN aff ON aff.cl = probe.cl
       |  WHERE aff.vec_id <> probe.query_id),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY query_id ORDER BY ip DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, ip, rank FROM r WHERE rank <= 5""".stripMargin

  /** The filtered-MIPS default: the same count-gated UNION ALL shape as
    * the cosine sibling, with IP scoring in both arms. */
  private val filteredMipsAutoSql: String =
    s"""SELECT * FROM (${filteredMipsBruteSqlGatedBy(s"$filteredNpRawSql > 16")})
       |UNION ALL
       |SELECT * FROM (${filteredMipsIvfSqlGatedBy(s"$filteredNpRawSql <= 16")})""".stripMargin

  /** Range-search exact baseline: every (query, corpus) pair with rounded
    * cosine ≥ 0.3 — no rank column (result size is data-dependent).
    * `corpusWhere` restricts the corpus side (queries stay full-corpus)
    * for the filtered-range entry. */
  private def rangeBruteSqlWhere(corpusWhere: String): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v, label
       |           FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |s AS (SELECT q.query_id, e.vec_id, round(${cosineSql("e.v", "q.qv")}, 6) AS cosine
       |      FROM e, q WHERE e.vec_id <> q.query_id AND $corpusWhere)
       |SELECT query_id, vec_id, cosine FROM s WHERE cosine >= 0.3""".stripMargin

  private val rangeBruteSql: String = rangeBruteSqlWhere("TRUE")

  /** Probed range-search replay: sized Lloyd prefix, full assignment,
    * count-derived probe width, τ-filter over probed cells' members. */
  private val rangeIvfSql: String =
    s"""WITH $kmSizedTrainCtes,
       |af AS (${kmAssignCte("e", "c2")}),
       |$npvCte,
       |${kmeansProbeCtes("rn <= npv.np", ", npv")},
       |s AS (SELECT probe.query_id, af.vec_id,
       |  round(${cosineSql("af.v", "probe.qv")}, 6) AS cosine
       |  FROM probe JOIN af ON af.cl = probe.cl
       |  WHERE af.vec_id <> probe.query_id)
       |SELECT query_id, vec_id, cosine FROM s WHERE cosine >= 0.3""".stripMargin

  /** The one recall-join shape every (exact, approx) oracle pair shares. */
  private def recallSqlOf(exactSql: String, approxSql: String): String =
    s"""WITH br AS (SELECT query_id, vec_id FROM ($exactSql)),
       |ap AS (SELECT query_id, vec_id FROM ($approxSql))
       |SELECT br.query_id, count(*) AS n_exact,
       |  count(ap.vec_id) AS n_hit,
       |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
       |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
       |GROUP BY 1""".stripMargin

  /** The IVF-cell graph's candidate CTEs (per-vector cell ranking →
    * top-nprobe memberships with the base/probe tag → the two-sided
    * candidate union the kernel scores) — the ONE copy the cells entry
    * and its recall twin both build on; expects `e` and `c2` from
    * [[kmSizedTrainCtes]].
    */
  private val cellsCandCtes: String =
    s"""pc AS (SELECT e.vec_id, e.v, c.cl,
       |  round(${cosineSql("e.v", "c.cv")}, 6) AS csim FROM e, c2 c),
       |prc AS (SELECT *, row_number() OVER
       |  (PARTITION BY vec_id ORDER BY csim DESC, cl ASC) AS rn FROM pc),
       |$npvCte,
       |pcells AS (SELECT vec_id, cl, rn = 1 AS is_base FROM prc, npv
       |  WHERE rn <= npv.np),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
       |         FROM pcells a JOIN pcells b ON a.cl = b.cl AND a.vec_id <> b.vec_id
       |         WHERE a.is_base OR b.is_base)""".stripMargin

  /** The BANDED kNN-graph replay (tb=128 adaptive banding, candidate
    * b-side widened to the Hamming-1 probe memberships) — the one copy
    * the `_banded` entry and the auto default's small-corpus branch
    * share. `gate` empties the source scan for a discarded UNION arm
    * (the kmSizedTrainCtesGatedBy discipline). */
  private def knnJoinBandedSqlGatedBy(gate: String): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |           FROM embeddings WHERE $gate),
       |${vecBandCtesScaledTb(128)},
       |$vecProbeCte,
       |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
       |         FROM vbands a JOIN vprobe b ON a.band = b.band AND a.vec_id <> b.vec_id),
       |s AS (SELECT cand.vec_id, cand.nbr_id,
       |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
       |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
       |            JOIN e eb ON cand.nbr_id = eb.vec_id),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC))::BIGINT AS rank FROM s)
       |SELECT vec_id, nbr_id, cosine, rank FROM r WHERE rank <= 3""".stripMargin

  /** The IVF-cell kNN-graph replay (sized Lloyd training, per-vector
    * top-nprobe cell ranking at the count-derived probe width, two-sided
    * base/probe candidate union, exact re-rank) — shared by the `_cells`
    * entry and the auto default's at-scale branch. */
  private def knnJoinCellsSqlGatedBy(gate: String): String =
    s"""WITH ${kmSizedTrainCtesGatedBy(gate)},
       |$cellsCandCtes,
       |s AS (SELECT cand.vec_id, cand.nbr_id,
       |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
       |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
       |            JOIN e eb ON cand.nbr_id = eb.vec_id),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC))::BIGINT AS rank FROM s)
       |SELECT vec_id, nbr_id, cosine, rank FROM r WHERE rank <= 3""".stripMargin

  private val knnJoinCellsSql: String = knnJoinCellsSqlGatedBy("TRUE")
  private val knnJoinBandedSql: String = knnJoinBandedSqlGatedBy("TRUE")

  /** The BANDED near-dup PAIRS replay (occupancy-sized tb=32 banding,
    * a<b candidate normalization, exact cosine ≥ τ verify) — the one
    * copy the `_banded` entry and the auto's small-corpus arm share.
    * `gate` empties the source scan for a discarded UNION arm. */
  private def dedupEmbBandedSqlGatedBy(gate: String): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |           FROM embeddings WHERE $gate),
       |$vecBandCtesScaled,
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM vbands a JOIN vbands b ON a.band = b.band AND a.vec_id < b.vec_id),
       |s AS (SELECT cand.vec_a, cand.vec_b,
       |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
       |  FROM cand JOIN e ea ON cand.vec_a = ea.vec_id
       |            JOIN e eb ON cand.vec_b = eb.vec_id)
       |SELECT vec_a, vec_b, cosine FROM s WHERE cosine >= 0.4""".stripMargin

  /** The IVF-CELL near-dup PAIRS replay (sized Lloyd prefix + the cells
    * graph's two-sided candidate union verbatim, pairs normalized a<b,
    * exact cosine ≥ τ verify) — shared by the `_cells` entry and the
    * auto default's at-scale arm. */
  private def dedupEmbCellsSqlGatedBy(gate: String): String =
    s"""WITH ${kmSizedTrainCtesGatedBy(gate)},
       |$cellsCandCtes,
       |pr AS (SELECT DISTINCT least(vec_id, nbr_id) AS vec_a,
       |  greatest(vec_id, nbr_id) AS vec_b FROM cand),
       |s AS (SELECT pr.vec_a, pr.vec_b,
       |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
       |  FROM pr JOIN e ea ON pr.vec_a = ea.vec_id
       |          JOIN e eb ON pr.vec_b = eb.vec_id)
       |SELECT vec_a, vec_b, cosine FROM s WHERE cosine >= 0.4""".stripMargin

  /** The AUTO near-dup PAIRS oracle (r16): the SAME count(*) gate the
    * Spark side branches on, pushed into each arm's source scan so the
    * deselected arm's pipeline — the sized Lloyd replay in particular —
    * runs over ZERO rows. Exactly one arm is non-empty for any corpus,
    * so the union IS the selected method's result. Reads the LIVE
    * crossover so a `GRAFT_XOVER_DEDUPEMB` override flows into the
    * dumped SQL (the hybrid-oracle discipline).
    */
  private def dedupEmbAutoSql: String = {
    val xover = graft.operators.EmbeddingSearch.dedupEmbeddingCellsCrossover
    val below = s"(SELECT count(*) FROM embeddings) < $xover"
    val atOrAbove = s"(SELECT count(*) FROM embeddings) >= $xover"
    s"""SELECT * FROM (${dedupEmbBandedSqlGatedBy(below)})
       |UNION ALL
       |SELECT * FROM (${dedupEmbCellsSqlGatedBy(atOrAbove)})""".stripMargin
  }

  /** Probe-pair recall replay: the exact τ-set on the probe vectors
    * (|P|·N brute cosines, pairs normalized a<b by construction since
    * vec_b > vec_a = probe id) left-joined with the arm's replay
    * restricted to probe-anchored pairs — the recallSqlOf shape on the
    * PAIRS contract. Probes with an empty exact τ-set carry no row.
    */
  private def pairsRecallSqlOf(approxSql: String, tau: Double = 0.4,
      nProbes: Int = 100): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |p AS (SELECT vec_id AS pa, v AS va FROM e WHERE vec_id < $nProbes),
       |ex AS (SELECT p.pa AS vec_a, e.vec_id AS vec_b FROM p JOIN e ON e.vec_id > p.pa
       |       WHERE round(${cosineSql("p.va", "e.v")}, 6) >= $tau),
       |ap AS (SELECT vec_a, vec_b FROM ($approxSql) WHERE vec_a < $nProbes)
       |SELECT ex.vec_a AS vec_id, count(*) AS n_exact, count(ap.vec_b) AS n_hit,
       |  round(count(ap.vec_b)::DOUBLE / count(*)::DOUBLE, 6) AS recall
       |FROM ex LEFT JOIN ap ON ex.vec_a = ap.vec_a AND ex.vec_b = ap.vec_b
       |GROUP BY 1""".stripMargin

  /** The GRAPH-NAVIGATED serve replay (r15): the sized-Lloyd quantizer
    * prefix and the cells-graph candidates verbatim, ranked to the
    * out-degree-`kBuild` navigable graph, then the deterministic walk —
    * the lowest-affine-hash entry set, `rounds` unrolled beam rounds (expand
    * through out-edges, exact re-rank, keep `beam`), self-exclusion,
    * final top-k. Every round is one CTE pair, so the oracle checks the
    * ENTIRE composition: training, graph build, entry set, and each
    * hop's frontier — a drifted tie-break or a dropped union arm in any
    * round fails the hash.
    */
  private def graphServeSql(k: Int = 5, nQ: Int = 10, kBuild: Int = 10,
      beam: Int = 32, rounds: Int = 6, entries: Int = 8): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""x$i AS (SELECT DISTINCT b.query_id, g.nbr_id AS vec_id
         |  FROM b${i - 1} b JOIN g ON b.vec_id = g.vec_id),
         |s$i AS (SELECT x.query_id, x.vec_id,
         |  round(${cosineSql("e.v", "q.qv")}, 6) AS cosine
         |  FROM x$i x JOIN e ON x.vec_id = e.vec_id
         |             JOIN q ON x.query_id = q.query_id),
         |u$i AS (SELECT query_id, vec_id, max(cosine) AS cosine FROM (
         |  SELECT * FROM s$i UNION ALL SELECT * FROM b${i - 1}) GROUP BY 1, 2),
         |b$i AS (SELECT query_id, vec_id, cosine FROM (SELECT *, row_number()
         |  OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
         |  FROM u$i) WHERE rn <= $beam)""".stripMargin
    }.mkString(",\n")
    s"""WITH $kmSizedTrainCtes,
       |$cellsCandCtes,
       |gs AS (SELECT cand.vec_id, cand.nbr_id,
       |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
       |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
       |            JOIN e eb ON cand.nbr_id = eb.vec_id),
       |g AS (SELECT vec_id, nbr_id FROM (SELECT *, row_number() OVER
       |  (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rnk FROM gs)
       |  WHERE rnk <= $kBuild),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQ),
       |ent AS (SELECT vec_id, v FROM e
       |  ORDER BY (vec_id * 1103515245 + 12345) % 2147483647, vec_id
       |  LIMIT $entries),
       |b0 AS (SELECT query_id, vec_id, cosine FROM (SELECT *, row_number()
       |  OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
       |  FROM (SELECT q.query_id, ent.vec_id,
       |    round(${cosineSql("ent.v", "q.qv")}, 6) AS cosine FROM q, ent))
       |  WHERE rn <= $beam),
       |$roundCtes,
       |srv AS (SELECT * FROM b$rounds WHERE vec_id <> query_id),
       |fin AS (SELECT query_id, vec_id, cosine, (row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC))::BIGINT AS rank
       |  FROM srv)
       |SELECT query_id, vec_id, cosine, rank FROM fin WHERE rank <= $k""".stripMargin
  }

  /** IVF MIPS replay: the sized-quantizer Lloyd prefix, per-query cell
    * ranking by rounded INNER PRODUCT (not cosine — the MIPS objective
    * ranks a big-norm cell of the right direction first), the
    * count-derived probe width (the cells graph's npv formula), and the
    * exact-IP re-rank of probed cells' members.
    */
  private def mipsIvfSqlGatedBy(gate: String): String =
    s"""WITH ${kmSizedTrainCtesGatedBy(gate)},
       |af AS (${kmAssignCte("e", "c2")}),
       |$npvCte,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |pd AS (SELECT q.query_id, q.qv, c.cl,
       |  round(${dotSql("q.qv", "c.cv")}, 6) AS pip FROM q, c2 c),
       |pr AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY pip DESC, cl ASC) AS rn FROM pd),
       |probe AS (SELECT query_id, qv, cl FROM pr, npv WHERE rn <= npv.np),
       |s AS (SELECT probe.query_id, af.vec_id,
       |  round(${dotSql("af.v", "probe.qv")}, 6) AS ip
       |  FROM probe JOIN af ON af.cl = probe.cl
       |  WHERE af.vec_id <> probe.query_id),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY query_id ORDER BY ip DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, ip, rank FROM r WHERE rank <= 5""".stripMargin

  private val mipsIvfSql: String = mipsIvfSqlGatedBy("TRUE")

  /** The AUTO MIPS oracle (the [[knnJoinAutoSql]] discipline on the MIPS
    * family): the SAME count(*) gate the Spark side branches on, pushed
    * into each arm's source scan so the deselected arm's pipeline — the
    * sized Lloyd replay in particular — runs over ZERO rows. Exactly one
    * arm is non-empty for any corpus, so the union IS the selected
    * method's result.
    */
  private def mipsAutoSql: String = {
    val xover = graft.operators.EmbeddingSearch.mipsCellsCrossover
    val below = s"(SELECT count(*) FROM embeddings) < $xover"
    val atOrAbove = s"(SELECT count(*) FROM embeddings) >= $xover"
    s"""SELECT * FROM (${mipsBruteSqlGatedBy(below)})
       |UNION ALL
       |SELECT * FROM (${mipsIvfSqlGatedBy(atOrAbove)})""".stripMargin
  }

  /** The AUTO kNN-graph oracle: the SAME count(*) gate the Spark side
    * branches on, as a UNION ALL whose two arms replay the banded and
    * cells pipelines verbatim. The gate is pushed into each arm's SOURCE
    * SCAN (the `e` CTE), so the deselected arm's entire pipeline — the
    * sized Lloyd replay in particular — runs over ZERO rows instead of
    * being computed and discarded; exactly one arm is non-empty for any
    * corpus, so the union IS the selected method's result.
    */
  private def knnJoinAutoSql: String = {
    val xover = graft.operators.EmbeddingSearch.knnGraphCellsCrossover
    val below = s"(SELECT count(*) FROM embeddings) < $xover"
    val atOrAbove = s"(SELECT count(*) FROM embeddings) >= $xover"
    s"""SELECT * FROM (${knnJoinBandedSqlGatedBy(below)})
       |UNION ALL
       |SELECT * FROM (${knnJoinCellsSqlGatedBy(atOrAbove)})""".stripMargin
  }

  /** Product-quantization oracle: per SUBSPACE, the same Lloyd replay as
    * [[kmeansKnnSql]] (seeds, round(cosine,6) argmax assignment,
    * DECIMAL(28,10) means, cluster-loss coalesce) over the dim slice,
    * then the fixed-order LUT scoring — training, encoding, and the ADC
    * estimate are ALL part of the checked contract.
    */
  /** The PQ replay's reusable middle: per-subspace Lloyd training CTEs to
    * the encodings `af_$s`, the code joins, and the fixed-order LUT sum
    * fragments — shared by [[pqKnnSql]] and the IVF-PQ composition.
    * Returns (subspaceCtes, codeJoins, pdSum, n2Sum); all CTE names carry
    * the `_$s` suffix so they compose with the unsuffixed whole-vector
    * Lloyd CTEs of [[kmTrainedAssignCtes]].
    */
  private def pqSubspaceParts(m: Int, ksub: Int, iters: Int, sub: Int,
      samplePct: Option[Int]): (String, String, String, String) = {
    def assignCte(srcCte: String, centCte: String): String =
      s"""SELECT vec_id, v, cl FROM (
         |  SELECT e.vec_id, e.v, c.cl, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY round(${cosineSql("e.v", "c.cv")}, 6) DESC, c.cl ASC) AS rn
         |  FROM $srcCte e, $centCte c) WHERE rn = 1""".stripMargin
    def updateCtes(s: Int, i: Int, aCte: String, prevCte: String): String =
      s"""m${i}_$s AS (SELECT cl, di.i AS d,
         |  CAST(sum(CAST(round(v[di.i], 6) AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
         |  FROM $aCte, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) di GROUP BY 1, 2),
         |n${i}_$s AS (SELECT cl, list(c ORDER BY d) AS cv FROM m${i}_$s GROUP BY 1),
         |c${i}_$s AS (SELECT $prevCte.cl, coalesce(n${i}_$s.cv, $prevCte.cv) AS cv
         |        FROM $prevCte LEFT JOIN n${i}_$s USING (cl))""".stripMargin
    val trainSrc = (s: Int) => if (samplePct.isDefined) s"ts$s" else s"es$s"
    val subspaceCtes = (0 until m).map { s =>
      val rounds = (1 to iters).map { i =>
        s"a${i}_$s AS (${assignCte(trainSrc(s), s"c${i - 1}_$s")}),\n" +
          updateCtes(s, i, s"a${i}_$s", s"c${i - 1}_$s")
      }.mkString(",\n")
      val tsCte = if (samplePct.isDefined)
        s"\nts$s AS (SELECT vec_id, list_slice(v, ${s * sub + 1}, ${(s + 1) * sub}) AS v FROM smp)," else ""
      s"""es$s AS (SELECT vec_id, list_slice(v, ${s * sub + 1}, ${(s + 1) * sub}) AS v FROM e),$tsCte
         |c0_$s AS (SELECT vec_id::INT AS cl, v AS cv FROM ${trainSrc(s)} ORDER BY vec_id LIMIT $ksub),
         |$rounds,
         |af_$s AS (${assignCte(s"es$s", s"c${iters}_$s")})""".stripMargin
    }.mkString(",\n")
    val codeJoins = (0 until m).map { s =>
      val vecJoin = if (s == 0) "" else s"JOIN af_$s ON af_$s.vec_id = af_0.vec_id "
      s"${vecJoin}JOIN c${iters}_$s cc$s ON af_$s.cl = cc$s.cl"
    }.mkString("\n  ")
    val pdSum = (0 until m).map(s =>
      s"(${dotSql(s"list_slice(q.qv, ${s * sub + 1}, ${(s + 1) * sub})", s"cc$s.cv")})")
      .mkString(" + ")
    val n2Sum = (0 until m).map(s => s"(${dotSql(s"cc$s.cv", s"cc$s.cv")})").mkString(" + ")
    (subspaceCtes, codeJoins, pdSum, n2Sum)
  }

  private def pqKnnSql(m: Int = 4, ksub: Int = 4, iters: Int = 2,
      k: Int = 5, nQueries: Int = 10, dims: Int = 64,
      samplePct: Option[Int] = None): String = {
    val sub = dims / m
    // with samplePct: seeds + Lloyd rounds read the ts$s sampled slices
    // (the portable affine-hash predicate); the final assignment af_$s
    // (= encoding) still covers every vector
    val smpCte = samplePct.map(p =>
      s"smp AS (SELECT * FROM e WHERE (vec_id * 1103515245 + 12345) % 2147483647 % 100 < $p),\n")
      .getOrElse("")
    val (subspaceCtes, codeJoins, pdSum, n2Sum) =
      pqSubspaceParts(m, ksub, iters, sub, samplePct)
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |           FROM embeddings),
       |$smpCte$subspaceCtes,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries),
       |sc AS (SELECT q.query_id, af_0.vec_id,
       |    sqrt(${dotSql("q.qv", "q.qv")}) AS nq,
       |    $pdSum AS adc_dot,
       |    sqrt($n2Sum) AS xn
       |  FROM q, af_0
       |  $codeJoins
       |  WHERE af_0.vec_id <> q.query_id),
       |scored AS (SELECT query_id, vec_id,
       |    round(CASE WHEN nq = 0.0 OR xn = 0.0 THEN 0.0
       |               ELSE adc_dot / (nq * xn) END, 6) AS adc_cosine FROM sc),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY query_id ORDER BY adc_cosine DESC, vec_id ASC))::BIGINT AS rank FROM scored)
       |SELECT query_id, vec_id, adc_cosine, rank FROM r WHERE rank <= $k""".stripMargin
  }

  /** IVF-PQ oracle: the whole-vector coarse Lloyd replay
    * ([[kmTrainedAssignCtes]]: e..c2 + inverted file `af`), the nprobe=2
    * probe rule from [[kmeansKnnSql]], and [[pqSubspaceParts]]' per-subspace
    * training/encoding/ADC — joined so only vectors in probed cells are
    * scored. CTE namespaces compose: coarse names are unsuffixed, PQ names
    * carry `_$s`.
    */
  private def ivfPqKnnSql(m: Int = 4, ksub: Int = 4, iters: Int = 2,
      k: Int = 5, nQueries: Int = 10, dims: Int = 64, nprobe: Int = 2): String = {
    val sub = dims / m
    val (subspaceCtes, codeJoins, pdSum, n2Sum) =
      pqSubspaceParts(m, ksub, iters, sub, samplePct = None)
    s"""WITH ${kmTrainedAssignCtes(None)},
       |$subspaceCtes,
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries),
       |pd AS (SELECT q.query_id, c.cl,
       |  round(${cosineSql("q.qv", "c.cv")}, 6) AS csim FROM q, c2 c),
       |pr AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY csim DESC, cl ASC) AS rn FROM pd),
       |probe AS (SELECT query_id, cl FROM pr WHERE rn <= $nprobe),
       |allowed AS (SELECT probe.query_id, af.vec_id
       |            FROM probe JOIN af ON af.cl = probe.cl),
       |sc AS (SELECT q.query_id, af_0.vec_id,
       |    sqrt(${dotSql("q.qv", "q.qv")}) AS nq,
       |    $pdSum AS adc_dot,
       |    sqrt($n2Sum) AS xn
       |  FROM q, af_0
       |  $codeJoins
       |  JOIN allowed ON allowed.query_id = q.query_id
       |               AND allowed.vec_id = af_0.vec_id
       |  WHERE af_0.vec_id <> q.query_id),
       |scored AS (SELECT query_id, vec_id,
       |    round(CASE WHEN nq = 0.0 OR xn = 0.0 THEN 0.0
       |               ELSE adc_dot / (nq * xn) END, 6) AS adc_cosine FROM sc),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY query_id ORDER BY adc_cosine DESC, vec_id ASC))::BIGINT AS rank FROM scored)
       |SELECT query_id, vec_id, adc_cosine, rank FROM r WHERE rank <= $k""".stripMargin
  }

  /** Two-stage PQ serve oracle: the FULL [[pqKnnSql]] replay (training,
    * encoding, ADC scoring) nested as the shortlist subquery with
    * rank ≤ `shortlist`, then the exact-cosine re-rank over only those
    * candidates — the same candidate set AND the same true-cosine order
    * the engine's refine stage produces.
    */
  private def pqRefineSql(k: Int = 5, nQueries: Int = 10,
      shortlist: Int = 20): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |           FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries),
       |sl AS (SELECT query_id, vec_id FROM (${pqKnnSql(k = shortlist)})),
       |s AS (SELECT sl.query_id, sl.vec_id,
       |        round(${cosineSql("e.v", "q.qv")}, 6) AS cosine
       |      FROM sl JOIN e ON e.vec_id = sl.vec_id
       |              JOIN q ON q.query_id = sl.query_id),
       |r AS (SELECT *, (row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC))::BIGINT AS rank FROM s)
       |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= $k""".stripMargin

  /** Reference-pipeline oracle (shared by the parquet and wholetext
    * ingestion entries — both must produce these exact rows).
    */
  private val bookQueryRefSql: String =
    s"""WITH ${shingleCte(3)},
       |q AS (SELECT sh AS q_sh, len(sh) AS q_len FROM sh WHERE doc_id = 0),
       |nn AS (SELECT count(*) AS n FROM documents),
       |inter AS (SELECT d.doc_id, list_intersect(d.sh, q.q_sh) AS t, q.q_len
       |          FROM sh d, q WHERE d.doc_id <> 0),
       |ex AS (SELECT doc_id, len(t) AS len, q_len, unnest(t) AS term
       |       FROM inter WHERE len(t) > 0),
       |df AS (SELECT term, count(*) AS df_nq FROM ex GROUP BY 1),
       |surv AS (SELECT ex.doc_id, ex.len, ex.q_len FROM ex
       |         JOIN df USING (term), nn WHERE df.df_nq <= nn.n - 2),
       |agg AS (SELECT doc_id, len, q_len, count(*) AS sum_shared
       |        FROM surv GROUP BY 1, 2, 3)
       |SELECT doc_id, len, CAST(sum_shared AS BIGINT) AS sum_shared,
       |  round(CASE WHEN sum_shared = len + q_len THEN 1.0
       |    ELSE CAST(sum_shared AS DOUBLE) / (len + q_len - sum_shared) END, 6) AS score
       |FROM agg""".stripMargin

  /** Batch-flagship oracle: the reference CTE chain with every stage keyed
    * by query_id — per-query df and stop-shingle filter, exactly the
    * standalone pipeline per query.
    */
  private def bookQueryBatchSql(nQueries: Int): String =
    s"""WITH ${shingleCte(3)},
       |q AS (SELECT doc_id AS query_id, sh AS q_sh, len(sh) AS q_len
       |      FROM sh WHERE doc_id < $nQueries),
       |nn AS (SELECT count(*) AS n FROM documents),
       |inter AS (SELECT q.query_id, d.doc_id,
       |    list_intersect(d.sh, q.q_sh) AS t, q.q_len
       |  FROM sh d, q WHERE d.doc_id <> q.query_id),
       |ex AS (SELECT query_id, doc_id, len(t) AS len, q_len, unnest(t) AS term
       |       FROM inter WHERE len(t) > 0),
       |df AS (SELECT query_id, term, count(*) AS df_nq FROM ex GROUP BY 1, 2),
       |surv AS (SELECT ex.query_id, ex.doc_id, ex.len, ex.q_len FROM ex
       |         JOIN df USING (query_id, term), nn WHERE df.df_nq <= nn.n - 2),
       |agg AS (SELECT query_id, doc_id, len, q_len, count(*) AS sum_shared
       |        FROM surv GROUP BY 1, 2, 3, 4)
       |SELECT query_id, doc_id, len, CAST(sum_shared AS BIGINT) AS sum_shared,
       |  round(CASE WHEN sum_shared = len + q_len THEN 1.0
       |    ELSE CAST(sum_shared AS DOUBLE) / (len + q_len - sum_shared) END, 6) AS score
       |FROM agg""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "book_query_batch" -> bookQueryBatchSql(3),
    "rel_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum($discPriceSql * (CAST(1 AS DECIMAL(5,2)) + CAST(l_tax AS DECIMAL(5,2)))) AS DOUBLE) AS sum_charge,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 6) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31'
         |GROUP BY 1, 2""".stripMargin,
    "rel_shipping_priority" ->
      s"""SELECT l_orderkey, epoch_us(o_orderdate) // 1000000 AS order_epoch, o_orderpriority,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |  AND l_shipdate > TIMESTAMP '1996-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "rel_local_supplier" ->
      s"""SELECT n_name, CAST(sum($discPriceSql) AS DOUBLE) AS revenue, count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1""".stripMargin,
    "rel_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  epoch_us(o_orderdate) // 1000000 AS order_epoch
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    // the bucketed layout changes WHERE rows go, never WHAT they are: the
    // oracle is the plain join over the unbucketed parquet
    // the salt replicates the dim side and splits the fact key — totals are
    // join-invariant, so the oracle is the plain join
    "rel_salted_join" ->
      s"""SELECT s_nationkey,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY 1""".stripMargin,
    // the bloom never changes results (exact join re-verifies survivors):
    // the oracle is the plain filtered join
    "rel_bloom_join" ->
      s"""SELECT p_partkey, p_brand,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size = 1
         |GROUP BY 1, 2""".stripMargin,
    "rel_bucketed_join" ->
      s"""SELECT o_orderkey, o_orderpriority,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderdate >= TIMESTAMP '2001-01-01'
         |GROUP BY 1, 2""".stripMargin,
    // the banding never changes results (exact eps filter re-verifies
    // every band candidate): the oracle is the bare inequality join
    "rel_band_join" ->
      """SELECT c_custkey, s_suppkey, c_acctbal, s_acctbal
        |FROM customer, supplier
        |WHERE abs(c_acctbal - s_acctbal) <= 2.0""".stripMargin,
    // deliberately the textbook CORRELATED form (EXISTS / NOT EXISTS) —
    // hash-equality with the engine's aggregate decorrelation is the check
    "rel_waiting_suppliers" ->
      """WITH w AS (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1 JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |  WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1
        |      FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY))
        |SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
        |FROM w JOIN supplier ON w.l_suppkey = s_suppkey
        |GROUP BY 1, 2""".stripMargin,
    "rel_customer_windows" ->
      """SELECT o_custkey, o_orderkey,
        |  (row_number() OVER w)::BIGINT AS rn,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
        |  date_diff('day', lag(o_orderdate) OVER w, o_orderdate)::BIGINT AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    // moments as associative decimal sums, ONE double expression at the
    // end — built-in stddev would be partition-order nondeterministic
    "rel_order_stats" ->
      """WITH m AS (SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |    * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sum_sq
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  round(sum_price / n, 6) AS mean_price,
        |  round((sum_sq - sum_price * sum_price / n) / n, 4) AS var_pop,
        |  round(sqrt((sum_sq - sum_price * sum_price / n) / n), 6) AS stddev_pop
        |FROM m""".stripMargin,
    // integer bucket arithmetic, clamped — portable where width_bucket
    // edge semantics differ between engines
    "rel_histogram" ->
      """SELECT least(greatest(floor(o_totalprice / 50000.0), 0), 11)::BIGINT AS bucket,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,
    // rank-family values are integer-derived rationals — identical doubles
    // in both engines, rounded the same; lead's default avoids NULL rows
    "rel_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  (ntile(4) OVER w)::BIGINT AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  lead(o_orderkey, 1, -1) OVER w AS next_key
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,
    "rel_trailing_spend" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |  epoch_us(o_orderdate) // 1000000 AS order_epoch, o_totalprice FROM orders)
        |SELECT o_custkey, o_orderkey, order_epoch,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_spend,
        |  (count(*) OVER w)::BIGINT AS trailing_orders
        |FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY order_epoch
        |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "rel_setops" ->
      """WITH a95 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
        |a96 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM a95 INTERSECT SELECT * FROM a96)
        |UNION ALL
        |SELECT 'only_1995' AS tag, o_custkey FROM (SELECT * FROM a95 EXCEPT SELECT * FROM a96)
        |UNION ALL
        |SELECT 'only_1996' AS tag, o_custkey FROM (SELECT * FROM a96 EXCEPT SELECT * FROM a95)""".stripMargin,
    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "rel_distinct_counts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,
    "rel_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "rel_semi_join" ->
      """SELECT p_partkey, p_brand, p_type FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)""".stripMargin,
    // correlated-subquery family: the ORACLE IS THE SAME SQL the Spark
    // entry runs (table refs swapped for views) — dialect parity by
    // construction
    "rel_corr_above_avg" -> Relational.corrAboveAvgSql("orders"),
    "rel_corr_exists" -> Relational.corrExistsSql("orders", "lineitem"),
    "rel_corr_not_exists" -> Relational.corrNotExistsSql("part", "lineitem"),
    "rel_corr_scalar_count" -> Relational.corrScalarCountSql("customer", "orders"),
    "rel_quantiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
        |  count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "rel_big_spenders" ->
      """WITH q AS (SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |  epoch_us(o_orderdate) // 1000000 AS order_epoch, o_totalprice, total_qty
        |FROM orders JOIN q ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "rel_bracket_revenue" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1.00 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY 1""".stripMargin,
    "rel_returned_customers" ->
      """WITH r AS (SELECT o_custkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1.00 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, c_acctbal, n_name AS nation, revenue
        |FROM r JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    // fixed-point share: scale-4 decimal revenue ×10⁴ is an exact integer;
    // the ppm division widens to avoid BIGINT overflow on big years
    "rel_promo_revenue" ->
      """WITH j AS (SELECT year(l_shipdate) AS ship_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1.00 - CAST(l_discount AS DECIMAL(5,2))) AS rev,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |a AS (SELECT CAST(ship_year AS BIGINT) AS ship_year,
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |                  ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS promo_e4,
        |    CAST(sum(rev) * 10000 AS BIGINT) AS total_e4
        |  FROM j GROUP BY 1)
        |SELECT ship_year, promo_e4, total_e4,
        |  CAST(promo_e4::HUGEINT * 1000000 // total_e4 AS BIGINT) AS promo_ppm
        |FROM a""".stripMargin,
    "rel_filtered_revenue" ->
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(5,2))) * 10000 AS BIGINT) AS revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    // interval lookup replayed as the plain inequality join (banding is
    // result-invariant); the overlapping catch-all pins k-row semantics
    "rel_interval_join" ->
      """WITH b AS (SELECT i::BIGINT AS bracket_id,
        |    CASE WHEN i < 10 THEN (i*i)::DOUBLE * 2000 ELSE 0 END AS lo,
        |    CASE WHEN i < 10 THEN ((i+1)*(i+1))::DOUBLE * 2000 ELSE 50000 END AS hi
        |  FROM (SELECT unnest(generate_series(0, 10)) AS i))
        |SELECT bracket_id, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN b ON o_totalprice >= lo AND o_totalprice <= hi
        |GROUP BY 1""".stripMargin,
    // Q2: the oracle KEEPS the correlated argmin form, so the decorrelate-
    // by-aggregation rewrite is under the hash gate; unit price is an e6
    // integer (cents·10⁴ // qty) so the min equality is bit-portable
    "rel_min_cost_supplier" ->
      """WITH offers AS (SELECT l_partkey, l_suppkey, s_name, n_name,
        |    (CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000)
        |      // CAST(l_quantity AS BIGINT) AS unit_e6
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT DISTINCT p_partkey, p_name, o.l_suppkey AS s_suppkey, s_name,
        |  n_name, unit_e6
        |FROM offers o JOIN part ON o.l_partkey = p_partkey
        |WHERE p_size < 10
        |  AND unit_e6 = (SELECT min(unit_e6) FROM offers i
        |                 WHERE i.l_partkey = o.l_partkey)""".stripMargin,
    // Q8: share as exact e4 totals + integer ppm (promo_ppm discipline);
    // the oracle's IN-subquery region filter replays the semi join
    "rel_market_share" ->
      """WITH f AS (SELECT year(o_orderdate)::BIGINT AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1.00 - CAST(l_discount AS DECIMAL(5,2))) AS rev,
        |    n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
        |    AND o_custkey IN (SELECT c_custkey FROM customer
        |      JOIN nation ON c_nationkey = n_nationkey
        |      JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')),
        |a AS (SELECT o_year,
        |    CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
        |                  ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS nation_e4,
        |    CAST(sum(rev) * 10000 AS BIGINT) AS total_e4
        |  FROM f GROUP BY 1)
        |SELECT o_year, nation_e4, total_e4,
        |  CAST(nation_e4::HUGEINT * 1000000 // total_e4 AS BIGINT) AS share_ppm
        |FROM a""".stripMargin,
    // Q9: profit in pure integers (rev_e4 − retail_cents·qty·10 — the
    // deterministic 10%-of-retail cost stand-in, no partsupp in the star)
    "rel_nation_profit" ->
      """SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1.00 - CAST(l_discount AS DECIMAL(5,2))) * 10000 AS BIGINT)
        |    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * CAST(l_quantity AS BIGINT) * 10) AS BIGINT) AS profit_e4,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2""".stripMargin,
    // Q11: group-total vs 1.5× the global MEAN, in pure widened integers
    "rel_important_parts" ->
      """WITH pp AS (SELECT l_partkey AS p_partkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1.00 - CAST(l_discount AS DECIMAL(5,2)))) * 10000 AS BIGINT) AS value_e4
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT CAST(sum(value_e4) AS BIGINT) AS total_e4,
        |    count(*) AS n_parts FROM pp)
        |SELECT p_partkey, value_e4 FROM pp, g
        |WHERE value_e4::HUGEINT * 2 * n_parts > total_e4::HUGEINT * 3""".stripMargin,
    // Q13: the priority predicate lives in the JOIN CONDITION so customers
    // with no qualifying orders keep their zero-count row
    "rel_order_count_dist" ->
      """WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM pc GROUP BY 1""".stripMargin,
    // Q16: NOT IN kept in the oracle; the engine runs it as the anti join
    "rel_supplier_diversity" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size BETWEEN 1 AND 25
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    // Q17: the oracle keeps the correlated per-part avg; the avg is the
    // exact decimal-sum/count double both engines derive identically
    "rel_small_qty_revenue" ->
      """WITH bi AS (SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |f AS (SELECT * FROM bi o
        |  WHERE l_quantity < (SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |                        / count(l_quantity)
        |                      FROM bi i WHERE i.l_partkey = o.l_partkey) * 0.2)
        |SELECT n_items, revenue_e4,
        |  round(CAST(revenue_e4 AS DOUBLE) / 7.0 / 10000.0, 6) AS avg_weekly
        |FROM (SELECT count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS BIGINT) AS revenue_e4
        |  FROM f)""".stripMargin,
    // Q15: the max is equality-joined against fixed-point longs, so the
    // winning-row selection cannot drift between engines
    "rel_top_supplier" ->
      """WITH ps AS (SELECT l_suppkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1.00 - CAST(l_discount AS DECIMAL(5,2)))) * 10000 AS BIGINT) AS revenue_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, revenue_e4
        |FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |WHERE revenue_e4 = (SELECT max(revenue_e4) FROM ps)""".stripMargin,
    // the avg is the exact decimal-sum/count double division on both
    // engines, so the > comparison is bit-portable
    "rel_idle_customers" ->
      """WITH a AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(c_acctbal) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n_custs,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer, a
        |WHERE c_acctbal > a.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01')
        |GROUP BY 1""".stripMargin,
    "rel_ship_delay" ->
      """WITH d AS (SELECT o_orderpriority,
        |  date_diff('day', o_orderdate::DATE, l_shipdate::DATE)::BIGINT AS delay_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, count(*) AS n_items,
        |  min(delay_days) AS min_days, max(delay_days) AS max_days,
        |  CAST(sum(delay_days) * 1000 // count(*) AS BIGINT) AS avg_days_e3,
        |  round(quantile_cont(delay_days, 0.5), 2) AS p50_days,
        |  round(quantile_cont(delay_days, 0.95), 2) AS p95_days
        |FROM d GROUP BY 1""".stripMargin,
    "rel_key_skew" ->
      """WITH k AS (SELECT l_orderkey, count(*)::BIGINT AS n FROM lineitem GROUP BY 1)
        |SELECT CAST(pow(2, floor(log2(n))) AS BIGINT) AS size_bucket_lo,
        |  count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
        |  max(n) AS max_key_rows
        |FROM k GROUP BY 1""".stripMargin,
    // NULL group, null-skipping counts, and IS NOT DISTINCT FROM ≡ <=>
    "rel_null_semantics" ->
      """WITH n AS (SELECT nullif(o_orderstatus, 'O') AS status_n,
        |  nullif(o_orderpriority, '1-URGENT') AS pri_n FROM orders)
        |SELECT status_n, count(*) AS n_rows, count(pri_n) AS n_pri,
        |  count(DISTINCT pri_n) AS n_distinct_pri,
        |  CAST(sum(CASE WHEN status_n IS NOT DISTINCT FROM pri_n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nullsafe_eq,
        |  CAST(sum(CASE WHEN status_n = pri_n THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq
        |FROM n GROUP BY 1""".stripMargin,
    // the oracle reads the ORIGINAL table: any row lost or duplicated by
    // the fragment/compact rewrites breaks the hash
    "source_zorder_roundtrip" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  min(epoch_us(ts) // 86400000000) AS min_day,
        |  max(epoch_us(ts) // 86400000000) AS max_day,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "source_corruption_tolerance" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
        |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
        |FROM customer GROUP BY 1""".stripMargin,
    "source_retention_roundtrip" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  min(epoch_us(ts) // 86400000000) AS min_day,
        |  max(epoch_us(ts) // 86400000000) AS max_day,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE epoch_us(ts) // 86400000000 >= 19740
        |GROUP BY 1""".stripMargin,
    // binaryFile blob ingest: every stat replayed from the source table —
    // n_bytes is the UTF-8 byte length of the exported file's content
    "source_binaryfile_ingest" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  length(text) AS n_chars, substr(text, 1, 16) AS head
        |FROM documents""".stripMargin,
    "source_schema_evolution" ->
      """SELECT CASE WHEN c_custkey % 2 = 0 THEN -1 ELSE c_nationkey END AS nation_group,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer GROUP BY 1""".stripMargin,
    "source_compaction_roundtrip" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // ntile membership is deterministic (ORDER ends on the unique key), so
    // the data-driven boundaries hash-match
    "rel_equidepth" ->
      """WITH b AS (SELECT o_totalprice,
        |  ntile(8) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS bucket
        |  FROM orders)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_orders,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM b GROUP BY 1""".stripMargin,
    "rel_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "rel_scalar_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate)::BIGINT AS order_year,
        |  month(o_orderdate)::BIGINT AS order_month,
        |  day(o_orderdate)::BIGINT AS order_day,
        |  upper(o_orderpriority) AS prio_upper,
        |  substr(o_orderpriority, 1, 1) AS prio_code,
        |  length(o_orderstatus)::BIGINT AS status_len,
        |  round(sqrt(o_totalprice), 6) AS price_sqrt,
        |  o_orderkey % 7 AS key_mod7,
        |  greatest(o_totalprice, 100000.0) AS price_floor100k
        |FROM orders""".stripMargin,
    // the exact columns recomputed exactly; the booleans are literal TRUE —
    // DuckDB cannot replay the engine's sketches, but it can (and does)
    // pin the claim that they sit inside the stated tolerance bands
    "rel_approx_bounds" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(*) AS n_rows,
        |  TRUE AS parts_within_15pct,
        |  TRUE AS median_within_p40_p60
        |FROM lineitem GROUP BY 1""".stripMargin,
    "rel_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    // pivot-then-unpivot ≡ the original long-form aggregate
    "rel_unpivot" ->
      """SELECT year(o_orderdate)::BIGINT AS order_year,
        |  o_orderstatus AS status, count(*)::BIGINT AS n_orders
        |FROM orders WHERE o_orderstatus IN ('F', 'O', 'P')
        |GROUP BY 1, 2""".stripMargin,
    "rel_pivot" ->
      """SELECT year(o_orderdate)::BIGINT AS order_year,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1""".stripMargin,
    "corpus_clean" ->
      s"""WITH $qualityCtes,
         |qf AS (SELECT doc_id, lang, n_tokens, md5(text) AS h FROM s
         |  WHERE $qualityPred),
         |k AS (SELECT h, min(doc_id) AS doc_id FROM qf GROUP BY 1)
         |SELECT qf.doc_id, qf.lang, qf.n_tokens
         |FROM qf JOIN k ON qf.doc_id = k.doc_id""".stripMargin,
    "text_sample" ->
      s"""SELECT doc_id, lang, ${duckHash("text")} % 100 AS bucket
         |FROM documents WHERE ${duckHash("text")} % 100 < 20""".stripMargin,
    "corpus_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
         |  ${duckHash("text")} % 50 AS bucket FROM documents)
         |SELECT doc_id, n_tokens, bucket FROM t WHERE bucket < n_tokens""".stripMargin,
    "text_rare_bigrams" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bi AS (SELECT doc_id, w[di.i] || ' ' || w[di.i+1] AS g FROM tok,
        |  LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i) di),
        |pd AS (SELECT doc_id, g, count(*)::BIGINT AS m FROM bi GROUP BY 1, 2),
        |df AS (SELECT g, CAST(sum(m) AS BIGINT) AS c FROM pd GROUP BY 1),
        |a AS (SELECT pd.doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
        |  CAST(sum(CASE WHEN c < 5 THEN m ELSE 0 END) AS BIGINT) AS n_rare
        |  FROM pd JOIN df USING (g) GROUP BY 1)
        |SELECT doc_id, n_bigrams, n_rare,
        |  (n_rare * 1000000) // n_bigrams AS rare_ppm FROM a""".stripMargin,
    // ratio_to_report in exact integer cents; window over the 25-row agg
    "rel_revenue_share" ->
      """WITH rev AS (SELECT r_name AS region, n_name AS nation,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) * 10000 AS BIGINT) AS revenue_e4
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT region, nation, revenue_e4,
        |  CAST((revenue_e4 * 1000000) //
        |    CAST(sum(revenue_e4) OVER (PARTITION BY region) AS BIGINT) AS BIGINT) AS share_ppm
        |FROM rev""".stripMargin,
    "rel_constraints" ->
      """SELECT 'orders_pk_unique' AS constraint,
        |  count(*)::BIGINT AS n_checked,
        |  (count(*) - count(DISTINCT o_orderkey))::BIGINT AS n_violations,
        |  count(*) = count(DISTINCT o_orderkey) AS passed FROM orders
        |UNION ALL
        |SELECT 'orders_fk_customer', (SELECT count(*) FROM orders)::BIGINT,
        |  count(*)::BIGINT, count(*) = 0
        |FROM orders o WHERE NOT EXISTS
        |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'lineitem_qty_range', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'customer_name_not_null', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) = 0
        |FROM customer
        |UNION ALL
        |SELECT 'lineitem_ship_after_order', count(*)::BIGINT,
        |  CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) = 0
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin,
    // one SELECT per profiled column (replays the single-scan Expand agg);
    // decimal(28,6) sums are exact, so sum_val is bit-equal
    "rel_profile" ->
      (Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(c =>
        s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
           |  (count(*) - count($c))::BIGINT AS n_null,
           |  count(DISTINCT $c)::BIGINT AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_val,
           |  CAST(max($c) AS DOUBLE) AS max_val,
           |  CAST(sum(CAST($c AS DECIMAL(28,6))) AS DOUBLE) AS sum_val
           |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")
        + "\nORDER BY col_name"),
    "rel_audit_constraints" ->
      """SELECT 'dom_discount_in_unit_range' AS constraint,
        |  CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violations FROM lineitem
        |UNION ALL
        |SELECT 'dom_quantity_positive',
        |  CAST(sum(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'nn_shipdate_not_null',
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'pk_orders_unique',
        |  (count(*) - count(DISTINCT o_orderkey))::BIGINT FROM orders
        |UNION ALL
        |SELECT 'dom_totalprice_nonnegative',
        |  CAST(sum(CASE WHEN o_totalprice < 0.0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'fk_lineitem_orderkey', count(*)::BIGINT FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'fk_lineitem_partkey', count(*)::BIGINT FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |UNION ALL
        |SELECT 'fk_orders_custkey', count(*)::BIGINT FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |ORDER BY "constraint"""".stripMargin,
    "rel_scd2" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
        |  epoch_us(o_orderdate) // 86400000000 AS day FROM orders)
        |SELECT o_custkey, o_orderkey, totalprice,
        |  day AS valid_from_day,
        |  coalesce(lead(day) OVER (PARTITION BY o_custkey
        |    ORDER BY day ASC, o_orderkey ASC), 99999999)::BIGINT AS valid_to_day
        |FROM o""".stripMargin,
    "rel_scd2_asof" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
        |  epoch_us(o_orderdate) // 86400000000 AS day FROM orders),
        |h AS (SELECT o_custkey, o_orderkey, totalprice,
        |  day AS valid_from_day,
        |  coalesce(lead(day) OVER (PARTITION BY o_custkey
        |    ORDER BY day ASC, o_orderkey ASC), 99999999)::BIGINT AS valid_to_day
        |FROM o),
        |c AS (SELECT (min(valid_from_day) + max(valid_from_day)) // 2 AS d FROM h)
        |SELECT o_custkey, o_orderkey, totalprice, valid_from_day, valid_to_day
        |FROM h CROSS JOIN c
        |WHERE valid_from_day <= d AND d < valid_to_day""".stripMargin,
    "rel_kanon_release" ->
      """WITH cells AS (SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
        |  count(DISTINCT o_custkey)::BIGINT AS n_customers,
        |  count(*)::BIGINT AS n_orders,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, o_year, CAST(0 AS BIGINT) AS n_suppressed_cells,
        |  n_customers, n_orders, CAST(rev AS DOUBLE) AS revenue
        |FROM cells WHERE n_customers >= 25
        |UNION ALL
        |SELECT '__suppressed__' AS n_name, CAST(-1 AS BIGINT) AS o_year,
        |  count(*)::BIGINT AS n_suppressed_cells,
        |  CASE WHEN count(*) = 0 OR (count(*) >= 2 AND sum(n_customers) >= 25)
        |    THEN CAST(coalesce(sum(n_customers), 0) AS BIGINT) END AS n_customers,
        |  CASE WHEN count(*) = 0 OR (count(*) >= 2 AND sum(n_customers) >= 25)
        |    THEN CAST(coalesce(sum(n_orders), 0) AS BIGINT) END AS n_orders,
        |  CASE WHEN count(*) = 0 OR (count(*) >= 2 AND sum(n_customers) >= 25)
        |    THEN CAST(coalesce(sum(rev), 0) AS DOUBLE) END AS revenue
        |FROM cells WHERE n_customers < 25""".stripMargin,
    "rel_upsert" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus,
        |  CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        |b AS (SELECT * FROM o WHERE o_orderkey % 10 < 8),
        |u AS (SELECT o_orderkey, 'U' AS u_status, price + 10 AS u_price
        |      FROM o WHERE o_orderkey % 10 >= 5)
        |SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
        |  coalesce(u.u_status, b.o_orderstatus) AS o_orderstatus,
        |  CAST(coalesce(u.u_price, b.price) AS DOUBLE) AS totalprice,
        |  CASE WHEN u.u_status IS NULL THEN 'base'
        |       WHEN b.o_orderstatus IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS src
        |FROM b FULL OUTER JOIN u ON b.o_orderkey = u.o_orderkey""".stripMargin,
    "rel_cdc_apply" ->
      """WITH ch AS (
        |  SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus,
        |    o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority,
        |    'U' AS op, 1 AS seq FROM orders WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U2', o_totalprice + 2.0, o_orderdate,
        |    o_orderpriority, 'U', 2 FROM orders WHERE o_orderkey % 194 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority, 'U', 1 FROM orders WHERE o_orderkey % 103 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, 'D', 3 FROM orders WHERE o_orderkey % 101 = 0),
        |al AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority, 'U' AS op, 0 AS seq FROM orders
        |       UNION ALL SELECT * FROM ch),
        |r AS (SELECT *, row_number() OVER
        |      (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM al)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  o_orderpriority
        |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin,
    // diff = replay the same apply as a CTE, then full-outer compare with
    // the old snapshot (null-safe per column); unchanged keys emit nothing
    "rel_snapshot_diff" ->
      """WITH ch AS (
        |  SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus,
        |    o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority,
        |    'U' AS op, 1 AS seq FROM orders WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U2', o_totalprice + 2.0, o_orderdate,
        |    o_orderpriority, 'U', 2 FROM orders WHERE o_orderkey % 194 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority, 'U', 1 FROM orders WHERE o_orderkey % 103 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority, 'D', 3 FROM orders WHERE o_orderkey % 101 = 0),
        |al AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority, 'U' AS op, 0 AS seq FROM orders
        |       UNION ALL SELECT * FROM ch),
        |r AS (SELECT *, row_number() OVER
        |      (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM al),
        |nw AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority FROM r WHERE rn = 1 AND op <> 'D'),
        |j AS (SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
        |        o.o_custkey AS o_c, o.o_orderstatus AS o_s, o.o_totalprice AS o_t,
        |        o.o_orderdate AS o_d, o.o_orderpriority AS o_p,
        |        n.o_custkey AS n_c, n.o_orderstatus AS n_s, n.o_totalprice AS n_t,
        |        n.o_orderdate AS n_d, n.o_orderpriority AS n_p
        |      FROM orders o FULL OUTER JOIN nw n ON o.o_orderkey = n.o_orderkey)
        |SELECT coalesce(nk, ok) AS o_orderkey,
        |  CASE WHEN ok IS NULL THEN 'I' WHEN nk IS NULL THEN 'D' ELSE 'U' END AS op,
        |  n_c AS o_custkey, n_s AS o_orderstatus, n_t AS o_totalprice,
        |  n_d AS o_orderdate, n_p AS o_orderpriority
        |FROM j
        |WHERE ok IS NULL OR nk IS NULL
        |   OR NOT (o_c IS NOT DISTINCT FROM n_c AND o_s IS NOT DISTINCT FROM n_s
        |       AND o_t IS NOT DISTINCT FROM n_t AND o_d IS NOT DISTINCT FROM n_d
        |       AND o_p IS NOT DISTINCT FROM n_p)""".stripMargin,
    // rank-equivalent integer PMI: c_ab·10⁹ // (c_a·c_b); DuckDB lists are
    // 1-based where Spark arrays are 0-based — each side spells its own
    "text_pmi_topk" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS w FROM documents),
        |uni AS (SELECT unnest(w) AS t FROM tok),
        |uc AS (SELECT t, count(*)::BIGINT AS c FROM uni GROUP BY 1),
        |bi AS (SELECT w[di.i] AS a, w[di.i+1] AS b FROM tok,
        |  LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i) di),
        |bc AS (SELECT a, b, count(*)::BIGINT AS c_ab FROM bi GROUP BY 1, 2
        |       HAVING count(*) >= 5)
        |SELECT bc.a || ' ' || bc.b AS bigram, c_ab, ua.c AS c_a, ub.c AS c_b,
        |  (c_ab * 1000000000) // (ua.c * ub.c) AS score_ppb
        |FROM bc JOIN uc ua ON bc.a = ua.t JOIN uc ub ON bc.b = ub.t
        |ORDER BY score_ppb DESC, bigram ASC LIMIT 20""".stripMargin,
    // add-one bigram LM replay: identical count tables, identical
    // round(ln(integer), 6) terms, decimal-summed — bit-equal by the same
    // argument as the cosine family
    "text_lm_score" -> lmScoreSql,
    // trained classifier: the weight VECTOR itself is the gated result —
    // the oracle re-trains bit-identically (see classifierCtes)
    "text_quality_classifier" ->
      s"""${classifierCtes()}
         |SELECT u.j::BIGINT AS j, w[(u.j + 1)::INT] AS weight
         |FROM w3, LATERAL (SELECT unnest(generate_series(0, 16)) AS j) u""".stripMargin,
    "text_quality_classifier_eval" ->
      s"""${classifierCtes()},
         |sf AS (SELECT f.y,
         |  list_reduce(list_transform(generate_series(1, 17), j -> w[j] * x[j]),
         |    (a, b) -> a + b) AS z
         |  FROM feat f CROSS JOIN w3)
         |SELECT y::BIGINT AS label, (z >= 0.0)::BIGINT AS predicted,
         |  count(*) AS n_docs
         |FROM sf GROUP BY 1, 2""".stripMargin,
    "text_quality_classifier_scores" ->
      s"""${classifierCtes()},
         |sc AS (SELECT f.doc_id,
         |  list_reduce(list_transform(generate_series(1, 17), j -> w[j] * x[j]),
         |    (a, b) -> a + b) AS z
         |  FROM feat f CROSS JOIN w3)
         |SELECT doc_id, round(z, 6) AS score, (z >= 0.0)::BIGINT AS predicted
         |FROM sc""".stripMargin,
    // wide mechanism, same model, same rows — the oracle is identical by
    // construction (the spec pins weight bit-identity; the gate pins rows)
    "text_quality_classifier_scores_wide" ->
      s"""${classifierCtes()},
         |sc AS (SELECT f.doc_id,
         |  list_reduce(list_transform(generate_series(1, 17), j -> w[j] * x[j]),
         |    (a, b) -> a + b) AS z
         |  FROM feat f CROSS JOIN w3)
         |SELECT doc_id, round(z, 6) AS score, (z >= 0.0)::BIGINT AS predicted
         |FROM sc""".stripMargin,
    // BPE trainer replay: 8 unrolled merge rounds — the merge table IS the
    // gated result (see bpeCtes)
    "text_bpe_merges" -> bpeMergeTableSql,
    // the evolving trainer is merge-identical to the chain — same oracle
    "text_bpe_merges_evolving" -> bpeMergeTableSql,
    "text_bpe_vocab" ->
      s"""${bpeCtes(8)}
         |SELECT token, freq, length(token)::BIGINT AS n_chars FROM (
         |  SELECT tok AS token, CAST(sum(c) AS BIGINT) AS freq
         |  FROM (SELECT c, unnest(string_split(trim(s, '<>'), '><')) AS tok FROM t8)
         |  GROUP BY 1)""".stripMargin,
    "text_bpe_tokens" ->
      s"""${bpeCtes(8)},
         |wt AS (SELECT w, length(w)::BIGINT AS w_chars,
         |  (length(s) - length(replace(s, '<', '')))::BIGINT AS w_toks FROM t8),
         |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |SELECT dw.doc_id, count(*)::BIGINT AS n_words,
         |  CAST(sum(w_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(w_toks) AS BIGINT) AS n_bpe_tokens
         |FROM dw JOIN wt ON dw.w = wt.w
         |WHERE dw.w <> '' GROUP BY 1""".stripMargin,
    // kernel serve path: row-identical to the chain by construction, so
    // the oracle is the SAME replayed SQL — a kernel/chain divergence
    // shows up as a hash mismatch on exactly one of the two entries
    "text_bpe_tokens_kernel" ->
      s"""${bpeCtes(8)},
         |wt AS (SELECT w, length(w)::BIGINT AS w_chars,
         |  (length(s) - length(replace(s, '<', '')))::BIGINT AS w_toks FROM t8),
         |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |SELECT dw.doc_id, count(*)::BIGINT AS n_words,
         |  CAST(sum(w_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(w_toks) AS BIGINT) AS n_bpe_tokens
         |FROM dw JOIN wt ON dw.w = wt.w
         |WHERE dw.w <> '' GROUP BY 1""".stripMargin,
    "text_bpe_fertility" ->
      s"""${bpeCtes(8)},
         |wt AS (SELECT w, length(w)::BIGINT AS w_chars,
         |  (length(s) - length(replace(s, '<', '')))::BIGINT AS w_toks FROM t8),
         |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |pd AS (SELECT dw.doc_id, count(*)::BIGINT AS n_words,
         |  CAST(sum(w_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(w_toks) AS BIGINT) AS n_bpe_tokens
         |  FROM dw JOIN wt ON dw.w = wt.w WHERE dw.w <> '' GROUP BY 1)
         |SELECT d.lang, count(*)::BIGINT AS n_docs,
         |  CAST(sum(pd.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(pd.n_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(pd.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(sum(pd.n_bpe_tokens) AS DOUBLE)
         |    / CAST(sum(pd.n_words) AS DOUBLE), 6) AS tokens_per_word,
         |  round(CAST(sum(pd.n_chars) AS DOUBLE)
         |    / CAST(sum(pd.n_bpe_tokens) AS DOUBLE), 6) AS chars_per_token
         |FROM pd JOIN documents d ON d.doc_id = pd.doc_id
         |GROUP BY 1""".stripMargin,
    // CCNet head/middle/tail: global ntile over the LM score (total order
    // with doc_id tie-break), per-tier stats decimal-summed
    "corpus_lm_tiers" ->
      s"""WITH sc AS ($lmScoreSql),
         |t AS (SELECT *, ntile(3) OVER
         |      (ORDER BY avg_logprob DESC, doc_id ASC) AS tier FROM sc)
         |SELECT tier::BIGINT AS tier, count(*)::BIGINT AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  max(avg_logprob) AS best_lp, min(avg_logprob) AS worst_lp,
         |  round(CAST(sum(CAST(avg_logprob AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6)
         |    AS mean_lp
         |FROM t GROUP BY 1""".stripMargin,
    "text_textrank" -> textrankSql(iters = 5, minCount = 5, kTop = 30),
    // the sketch is rebuilt cell-by-cell from the same affine hash family;
    // a cell-assignment or min-row drift breaks the hash
    "text_countmin" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
         |ex AS (SELECT t, count(*)::BIGINT AS exact_count FROM tok WHERE t <> ''
         |       GROUP BY 1),
         |exh AS (SELECT t, exact_count, ${duckHash("t")} AS h FROM ex),
         |wj AS (SELECT t, exact_count,  j.j,
         |    (h * (2*j.j + 1) + (12345 + 67891*j.j)) % 2147483647 % 256 AS cell
         |  FROM exh, (SELECT unnest(generate_series(0, 3)) AS j) j),
         |cells AS (SELECT j, cell, CAST(sum(exact_count) AS BIGINT) AS c
         |  FROM wj GROUP BY 1, 2),
         |top AS (SELECT t FROM ex ORDER BY exact_count DESC, t ASC LIMIT 20)
         |SELECT wj.t AS token, wj.exact_count,
         |  CAST(min(cells.c) AS BIGINT) AS cm_estimate,
         |  CAST(min(cells.c) - wj.exact_count AS BIGINT) AS overestimate
         |FROM wj JOIN top ON wj.t = top.t
         |JOIN cells ON wj.j = cells.j AND wj.cell = cells.cell
         |GROUP BY 1, 2""".stripMargin,
    // the full pipeline composition replayed stage for stage: quality
    // rules, 5-gram decontamination vs RAW-doc eval grams, MinHash-LSH +
    // recursive closure with the keep-longest window, id-ordered budgets
    "corpus_curated" ->
      s"""WITH RECURSIVE $qualityCtes,
         |qf AS (SELECT doc_id, source, text FROM s WHERE $qualityPred),
         |tokev AS (SELECT doc_id, string_split(text, ' ') AS w
         |          FROM documents WHERE doc_id < 5),
         |ev AS (SELECT DISTINCT unnest(list_transform(list_distinct(
         |    list_transform(generate_series(1, greatest(len(w) - 4, 0)),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])),
         |  t -> ${duckHash("t")})) AS gram FROM tokev),
         |tokc AS (SELECT doc_id, string_split(text, ' ') AS w FROM qf WHERE doc_id >= 5),
         |shc AS (SELECT doc_id, list_distinct(
         |    list_transform(generate_series(1, greatest(len(w) - 4, 0)),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh5
         |  FROM tokc),
         |hits AS (SELECT x.doc_id, count(*) AS n FROM
         |    (SELECT doc_id, unnest(list_transform(sh5, t -> ${duckHash("t")})) AS gram
         |     FROM shc) x
         |  JOIN ev USING (gram) GROUP BY 1),
         |qd AS (SELECT qf.doc_id, qf.source, qf.text FROM qf LEFT JOIN hits USING (doc_id)
         |       WHERE qf.doc_id >= 5 AND coalesce(hits.n, 0) = 0),
         |${shingleCte(3, src = "qd")},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |pairs AS (${verifyTail(0.7)}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |mn AS (SELECT src, min(dst) AS m FROM reach GROUP BY 1),
         |cl AS (SELECT d.doc_id, d.source,
         |    least(d.doc_id, coalesce(mn.m, d.doc_id)) AS cluster,
         |    len(string_split(d.text, ' '))::BIGINT AS n_tokens
         |  FROM qd d LEFT JOIN mn ON d.doc_id = mn.src),
         |keep AS (SELECT *, row_number() OVER (PARTITION BY cluster
         |    ORDER BY n_tokens DESC, doc_id ASC) = 1 AS kept FROM cl),
         |cum AS (SELECT doc_id, source, n_tokens,
         |    (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |     ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
         |  FROM keep WHERE kept)
         |SELECT doc_id, source, n_tokens, cum_tokens FROM cum
         |WHERE cum_tokens <= 800""".stripMargin,
    // quality rules + LSH banding + recursive closure, all shared CTE
    // builders — the shingle CTEs run over the FILTERED docs, mirroring the
    // engine's quality-first order
    "corpus_clean_near" ->
      s"""WITH RECURSIVE $qualityCtes,
         |qf AS (SELECT doc_id, text FROM s WHERE $qualityPred),
         |${shingleCte(3, src = "qf")},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |pairs AS (${verifyTail(0.7)}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |mn AS (SELECT src, min(dst) AS m FROM reach GROUP BY 1)
         |SELECT qf.doc_id,
         |  least(qf.doc_id, coalesce(mn.m, qf.doc_id)) AS keeper,
         |  qf.doc_id = least(qf.doc_id, coalesce(mn.m, qf.doc_id)) AS kept
         |FROM qf LEFT JOIN mn ON qf.doc_id = mn.src""".stripMargin,
    "rel_full_outer" ->
      """SELECT coalesce(c_custkey, o.o_custkey) AS custkey, c_name,
        |  coalesce(o.n_orders, 0) AS n_orders
        |FROM customer FULL OUTER JOIN
        |  (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
        |  ON c_custkey = o.o_custkey""".stripMargin,
    // the day-partitioned layout changes WHERE rows live, never WHAT they
    // are: the oracle replays the integer epoch-day key over the flat table
    "events_pruned_daily" ->
      """SELECT epoch_us(ts) // 86400000000 AS event_day, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE epoch_us(ts) // 86400000000 BETWEEN 19730 AND 19736
        |GROUP BY 1, 2""".stripMargin,
    "events_hourly" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sliding" ->
      """WITH e AS (SELECT event_type, (epoch_us(ts) // 10800000000) * 10800 AS b3 FROM events)
        |SELECT b3 - i.i * 10800 AS window_epoch, event_type, count(*) AS n_events
        |FROM e, (VALUES (0), (1)) i(i) GROUP BY 1, 2""".stripMargin,
    "events_sessions" ->
      s"""WITH $sessionCtes
         |SELECT user_id, session_idx, n_events, start_us, end_us,
         |  end_us - start_us AS duration_us
         |FROM sess""".stripMargin,
    // the native session_window gap (+1µs alignment) produces the SAME
    // sessions as the lag+cumsum rule — one oracle text, two engine plans
    "events_sessions_native" ->
      s"""WITH $sessionCtes
         |SELECT user_id, n_events, start_us, end_us,
         |  end_us - start_us AS duration_us
         |FROM sess""".stripMargin,
    // DuckDB verifies the binned interval join with the NAIVE inequality
    // join — different plan, same containment semantics
    "events_concurrency" ->
      s"""WITH $sessionCtes,
         |b AS (SELECT min(start_us) // 3600000000 AS b0,
         |             max(end_us) // 3600000000 AS b1 FROM sess),
         |g AS (SELECT unnest(generate_series(b0, b1)) AS bin FROM b)
         |SELECT (g.bin * 3600)::BIGINT AS hour_epoch,
         |  CAST(count(sess.start_us) AS BIGINT) AS n_active
         |FROM g LEFT JOIN sess ON sess.start_us <= g.bin * 3600000000
         |                     AND g.bin * 3600000000 <= sess.end_us
         |GROUP BY 1""".stripMargin,
    "events_seasonal" ->
      """WITH h AS (SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
        |  event_type, count(*) AS n_events FROM events GROUP BY 1, 2)
        |SELECT (hour_epoch % 86400) // 3600 AS hod, event_type,
        |  count(*)::BIGINT AS n_hours, CAST(sum(n_events) AS BIGINT) AS n_events,
        |  round(quantile_cont(n_events, 0.5), 2) AS median_n,
        |  round(quantile_cont(n_events, 0.9), 2) AS p90_n
        |FROM h GROUP BY 1, 2""".stripMargin,
    // grid × types is replayed naively; IGNORE NULLS running-last mirrors
    // the engine's forward-fill window exactly
    "events_gapfill" ->
      """WITH h AS (SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
        |  event_type, count(*) AS n_events FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hour_epoch) AS h0, max(hour_epoch) AS h1 FROM h),
        |g AS (SELECT unnest(generate_series(h0, h1, 3600)) AS hour_epoch FROM b),
        |t AS (SELECT DISTINCT event_type FROM h),
        |j AS (SELECT g.hour_epoch, t.event_type, h.n_events
        |      FROM g CROSS JOIN t
        |      LEFT JOIN h ON h.hour_epoch = g.hour_epoch AND h.event_type = t.event_type),
        |w AS (SELECT *, last_value(n_events IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY hour_epoch
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff FROM j)
        |SELECT event_type, hour_epoch, CAST(coalesce(ff, 0) AS BIGINT) AS n_filled,
        |  CASE WHEN n_events IS NOT NULL THEN 'obs'
        |       WHEN ff IS NOT NULL THEN 'ffill' ELSE 'none' END AS src
        |FROM w""".stripMargin,
    // two-sided neighbor windows (running last / running first IGNORE
    // NULLS) + integer-milli slope arithmetic
    "events_interpolate" ->
      """WITH h AS (SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
        |  event_type, count(*) AS n_events FROM events GROUP BY 1, 2),
        |b AS (SELECT min(hour_epoch) AS h0, max(hour_epoch) AS h1 FROM h),
        |g AS (SELECT unnest(generate_series(h0, h1, 3600)) AS hour_epoch FROM b),
        |t AS (SELECT DISTINCT event_type FROM h),
        |j AS (SELECT g.hour_epoch, t.event_type, h.n_events
        |      FROM g CROSS JOIN t
        |      LEFT JOIN h ON h.hour_epoch = g.hour_epoch AND h.event_type = t.event_type),
        |w AS (SELECT *,
        |  last_value(n_events IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN n_events IS NOT NULL THEN hour_epoch END IGNORE NULLS)
        |    OVER wp AS ph,
        |  first_value(n_events IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN n_events IS NOT NULL THEN hour_epoch END IGNORE NULLS)
        |    OVER wn AS nh
        |  FROM j WINDOW
        |    wp AS (PARTITION BY event_type ORDER BY hour_epoch
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY event_type ORDER BY hour_epoch
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, hour_epoch,
        |  CASE WHEN n_events IS NOT NULL THEN 'obs'
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
        |       ELSE 'none' END AS src,
        |  CASE WHEN n_events IS NOT NULL THEN n_events * 1000
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL
        |       THEN (pv * (nh - hour_epoch) + nv * (hour_epoch - ph)) * 1000 // (nh - ph)
        |       END AS value_milli
        |FROM w""".stripMargin,
    // z>3 cross-multiplied to integers; HUGEINT squares mirror the
    // engine's DECIMAL(38,0) exactly for any realistic count
    "events_anomaly" ->
      """WITH h AS (SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
        |  event_type, count(*) AS n_events FROM events GROUP BY 1, 2),
        |w AS (SELECT *,
        |  count(n_events) OVER tw AS trailing_cnt,
        |  sum(n_events) OVER tw AS trailing_sum,
        |  sum(n_events * n_events) OVER tw AS trailing_sumsq
        |  FROM h WINDOW tw AS (PARTITION BY event_type ORDER BY hour_epoch
        |    ROWS BETWEEN 48 PRECEDING AND 1 PRECEDING))
        |SELECT hour_epoch, event_type, n_events,
        |  CAST(trailing_cnt AS BIGINT) AS trailing_cnt,
        |  CAST(trailing_sum AS BIGINT) AS trailing_sum,
        |  CAST(trailing_sumsq AS BIGINT) AS trailing_sumsq
        |FROM w
        |WHERE trailing_cnt >= 24
        |  AND n_events::HUGEINT * trailing_cnt > trailing_sum::HUGEINT
        |  AND (n_events::HUGEINT * trailing_cnt - trailing_sum)
        |    * (n_events::HUGEINT * trailing_cnt - trailing_sum)
        |    > 9 * (trailing_cnt::HUGEINT * trailing_sumsq
        |           - trailing_sum::HUGEINT * trailing_sum)""".stripMargin,
    // single-pass weekly aggregation over RAW events — must equal the
    // engine's two-level daily→weekly merge exactly
    "events_weekly_reagg" ->
      """SELECT (epoch_us(ts) // 604800000000) * 604800 AS week_epoch, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_json" ->
      """WITH e AS (SELECT event_type, json_extract_string(props, '$.k')::BIGINT AS k FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k
        |FROM e GROUP BY 1""".stripMargin,
    // count-min replayed structurally: same affine hash family, same cells
    "events_heavy_hitters" ->
      """WITH ex AS (SELECT user_id, count(*)::BIGINT AS exact_count FROM events GROUP BY 1),
        |exh AS (SELECT user_id, exact_count,
        |        (user_id * 2654435761) % 2147483647 AS h FROM ex),
        |wj AS (SELECT user_id, exact_count, j.j,
        |    (h * (2*j.j + 1) + (12345 + 67891*j.j)) % 2147483647 % 256 AS cell
        |  FROM exh, (SELECT unnest(generate_series(0, 3)) AS j) j),
        |cells AS (SELECT j, cell, CAST(sum(exact_count) AS BIGINT) AS c
        |  FROM wj GROUP BY 1, 2),
        |top AS (SELECT user_id FROM ex ORDER BY exact_count DESC, user_id ASC LIMIT 20)
        |SELECT wj.user_id, wj.exact_count,
        |  CAST(min(cells.c) AS BIGINT) AS cm_estimate,
        |  CAST(min(cells.c) - wj.exact_count AS BIGINT) AS overestimate
        |FROM wj JOIN top ON wj.user_id = top.user_id
        |JOIN cells ON wj.j = cells.j AND wj.cell = cells.cell
        |GROUP BY 1, 2""".stripMargin,
    // sliding DISTINCT via the bounded fan-out: a user-day pair keeps the
    // user monthly-active for the 30 days it fans out to
    "events_dau_mau" ->
      """WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
        |dau AS (SELECT d, count(*)::BIGINT AS dau FROM du GROUP BY 1),
        |f AS (SELECT du.user_id, dd.d2 FROM du,
        |  LATERAL (SELECT unnest(generate_series(du.d, du.d + 29)) AS d2) dd),
        |mau AS (SELECT d2 AS d, count(DISTINCT user_id)::BIGINT AS mau FROM f GROUP BY 1)
        |SELECT (dau.d * 86400)::BIGINT AS day_epoch, dau.dau, mau.mau,
        |  (dau.dau * 1000000 // mau.mau)::BIGINT AS stickiness_ppm
        |FROM dau JOIN mau ON dau.d = mau.d""".stripMargin,
    // accuracy-gate discipline: oracle pins the exact weekly distinct and
    // asserts the engine's sketch-vs-exact tolerance boolean is TRUE
    "events_distinct_reagg" ->
      """SELECT epoch_us(ts) // 86400000000 // 7 AS week,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS users_within_5pct
        |FROM events GROUP BY 1""".stripMargin,
    "events_retention" ->
      """WITH w AS (SELECT DISTINCT epoch_us(ts) // 604800000000 AS wk, user_id FROM events)
        |SELECT a.wk * 604800 AS week_epoch,
        |  count(a.user_id) AS n_active,
        |  count(b.user_id) AS n_retained,
        |  round(count(b.user_id)::DOUBLE / count(a.user_id), 6) AS retention_rate
        |FROM w a LEFT JOIN w b ON a.user_id = b.user_id AND b.wk = a.wk + 1
        |GROUP BY a.wk""".stripMargin,
    // the roundtrip entries re-ingest exported CSV/JSON; the oracle reads
    // the PARQUET truth — a lossy export/read (type widening, precision
    // loss, header/quoting bugs) breaks the hash
    "source_csv_roundtrip" ->
      """SELECT c_nationkey, count(*) AS n_custs,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY 1""".stripMargin,
    "source_json_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "source_orc_roundtrip" ->
      """SELECT p_brand, count(*) AS n_parts,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY 1""".stripMargin,
    // replay of the deterministic truncation rule: corrupt rows bucket
    // together with a NULL sum; well-formed rows must survive bit-intact
    "source_json_corrupt" ->
      """SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'corrupt' ELSE o_orderstatus END
        |    AS status_bucket,
        |  count(*) AS n_records,
        |  CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |               ELSE CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    // the looked-up file contents must hash-match the source table rows
    // byte-for-byte (the corpus is newline-free, so the text-file roundtrip
    // is exact)
    "source_v2_point_lookup" ->
      """SELECT doc_id, len(text)::BIGINT AS n_chars, md5(text) AS text_hash
        |FROM documents WHERE doc_id IN (7, 11, 42)""".stripMargin,
    // the sink publishes text verbatim (corpus is newline-free), so the
    // write→read roundtrip is the identity on the source table
    "source_v2_write_roundtrip" ->
      """SELECT doc_id, text FROM documents""".stripMargin,
    // integer-exact burst rule: n·cnt > 2·sum avoids any float mean
    "events_bursts" ->
      """WITH h AS (SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
        |  event_type, count(*) AS n_events FROM events GROUP BY 1, 2),
        |t AS (SELECT *,
        |  (sum(n_events) OVER w)::BIGINT AS trailing_sum,
        |  (count(n_events) OVER w)::BIGINT AS trailing_cnt
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT hour_epoch, event_type, n_events, trailing_sum, trailing_cnt
        |FROM t WHERE trailing_cnt >= 12 AND n_events * trailing_cnt > trailing_sum * 2""".stripMargin,
    // the running-last window mirrors the engine's as-of composition
    // exactly (ROWS frame + (ts, event_id) order, IGNORE NULLS last)
    "events_asof" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |w AS (SELECT *, last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us FROM e)
        |SELECT user_id, event_id, ts_us AS purchase_us,
        |  coalesce(last_click_us, -1) AS last_click_us,
        |  coalesce(ts_us - last_click_us, -1) AS us_since_click
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    // the band mechanics never change results: the oracle is the bare
    // per-user inequality join over the two event kinds
    "events_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS click_us FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us FROM e
        |      WHERE event_type = 'purchase')
        |SELECT p.user_id, purchase_id, click_id, purchase_us, click_us,
        |  purchase_us - click_us AS us_before
        |FROM p JOIN c ON p.user_id = c.user_id
        |WHERE click_us <= purchase_us
        |  AND purchase_us - click_us <= 86400000000""".stripMargin,
    "events_attribution_last" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS click_us FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us FROM e
        |      WHERE event_type = 'purchase'),
        |pairs AS (SELECT p.user_id, purchase_id, click_id, purchase_us, click_us,
        |    purchase_us - click_us AS us_before
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE click_us <= purchase_us
        |    AND purchase_us - click_us <= 86400000000),
        |r AS (SELECT *, row_number() OVER (PARTITION BY purchase_id
        |    ORDER BY click_us DESC, click_id DESC) AS rn FROM pairs)
        |SELECT user_id, purchase_id, click_id, purchase_us, click_us, us_before
        |FROM r WHERE rn = 1""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY 1)
        |SELECT '1_view' AS step, count(*) AS n_users FROM v
        |UNION ALL SELECT '2_click', count(*) FROM c
        |UNION ALL SELECT '3_purchase', count(*) FROM p""".stripMargin,
    "events_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > t1
        |        AND ts_us <= t1 + 86400000000 GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts_us) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > t2
        |        AND ts_us <= t2 + 86400000000 GROUP BY 1)
        |SELECT '1_view' AS step, count(*) AS n_users FROM v
        |UNION ALL SELECT '2_click_1d', count(*) FROM c
        |UNION ALL SELECT '3_purchase_1d', count(*) FROM p""".stripMargin,
    // same sequential-fold norm² as every cosine oracle; per-row round(6)
    // then DECIMAL sum keeps the rollup order-free
    "embed_norm_stats" ->
      s"""WITH e AS (SELECT label::BIGINT AS label,
         |  list_reduce(list_transform(generate_series(1, len(embedding)),
         |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y) AS n2
         |  FROM embeddings)
         |SELECT label, count(*) AS n_vecs,
         |  CAST(sum(CASE WHEN n2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  CAST(sum(CASE WHEN n2 < 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_tiny,
         |  CAST(sum(CAST(round(n2, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_norm2,
         |  round(max(n2), 6) AS max_norm2
         |FROM e GROUP BY 1""".stripMargin,
    "embed_knn_brute" -> bruteKnnSql,
    // the DEFAULT: the count-gated method branch (exact scan below the
    // crossover, standing IVF-IP serve past it) — both arms replayed
    // verbatim, the deselected arm's source scan gated empty
    "embed_knn_mips" -> mipsAutoSql,
    "embed_knn_mips_brute" -> mipsBruteSql,
    // gated recall of the auto default vs the exact scan
    "embed_mips_auto_recall" -> recallSqlOf(mipsBruteSql, mipsAutoSql),
    // the DEFAULT: occupancy-sized ALSH banding — width derived from
    // count(*); the fixed 4×4 layout keeps the `_fixed` name
    "embed_knn_mips_alsh" -> mipsAlshScaledSql,
    "embed_knn_mips_alsh_fixed" -> mipsAlshSql,
    // recall@k of the DEFAULT (sized) ALSH path vs the exact
    // inner-product top-k — both pipelines nested verbatim; left join so
    // missed neighbors count
    "embed_mips_recall" ->
      s"""WITH br AS (SELECT query_id, vec_id FROM ($mipsBruteSql)),
         |ap AS (SELECT query_id, vec_id FROM ($mipsAlshScaledSql))
         |SELECT br.query_id, count(*) AS n_exact,
         |  count(ap.vec_id) AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
         |GROUP BY 1""".stripMargin,
    // IVF MIPS: sized Lloyd replay + IP-ranked cells + exact-IP re-rank
    "embed_knn_mips_ivf" -> mipsIvfSql,
    // recall of the IVF MIPS serve vs the exact inner-product top-k
    "embed_mips_ivf_recall" ->
      s"""WITH br AS (SELECT query_id, vec_id FROM ($mipsBruteSql)),
         |ap AS (SELECT query_id, vec_id FROM ($mipsIvfSql))
         |SELECT br.query_id, count(*) AS n_exact,
         |  count(ap.vec_id) AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
         |GROUP BY 1""".stripMargin,
    // recall of the fixed-layout contrast vs the same exact top-k
    "embed_mips_fixed_recall" ->
      s"""WITH br AS (SELECT query_id, vec_id FROM ($mipsBruteSql)),
         |ap AS (SELECT query_id, vec_id FROM ($mipsAlshSql))
         |SELECT br.query_id, count(*) AS n_exact,
         |  count(ap.vec_id) AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
         |GROUP BY 1""".stripMargin,
    "embed_knn_lsh" -> lshKnnSql,
    "embed_knn_multiprobe" -> multiProbeKnnSql,
    "embed_multiprobe_recall" ->
      s"""WITH br AS (SELECT query_id, vec_id FROM ($bruteKnnSql)),
         |ap AS (SELECT query_id, vec_id FROM ($multiProbeKnnSql))
         |SELECT br.query_id, count(*) AS n_exact,
         |  count(ap.vec_id) AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
         |GROUP BY 1""".stripMargin,
    // recall@k of the LSH path vs the exact top-k — both pipelines nested
    // verbatim, then joined; left join so missed neighbors count as misses
    "embed_lsh_recall" ->
      s"""WITH br AS (SELECT query_id, vec_id FROM ($bruteKnnSql)),
         |ap AS (SELECT query_id, vec_id FROM ($lshKnnSql))
         |SELECT br.query_id, count(*) AS n_exact,
         |  count(ap.vec_id) AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
         |GROUP BY 1""".stripMargin,
    "embed_pq_recall" ->
      s"""WITH br AS (SELECT query_id, vec_id FROM ($bruteKnnSql)),
         |ap AS (SELECT query_id, vec_id FROM (${pqKnnSql()}))
         |SELECT br.query_id, count(*) AS n_exact,
         |  count(ap.vec_id) AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
         |GROUP BY 1""".stripMargin,
    "embed_ivfpq_recall" ->
      s"""WITH br AS (SELECT query_id, vec_id FROM ($bruteKnnSql)),
         |ap AS (SELECT query_id, vec_id FROM (${ivfPqKnnSql()}))
         |SELECT br.query_id, count(*) AS n_exact,
         |  count(ap.vec_id) AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
         |GROUP BY 1""".stripMargin,
    // kNN join, fixed-width banding: directed band-collision edges (both
    // orders), exact re-rank
    "embed_knn_join_fixed" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |$vecBandCtes,
         |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
         |         FROM vbands a JOIN vbands b ON a.band = b.band AND a.vec_id <> b.vec_id),
         |s AS (SELECT cand.vec_id, cand.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
         |            JOIN e eb ON cand.nbr_id = eb.vec_id),
         |r AS (SELECT *, (row_number() OVER
         |  (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC))::BIGINT AS rank FROM s)
         |SELECT vec_id, nbr_id, cosine, rank FROM r WHERE rank <= 3""".stripMargin,
    // the r9 default kept registered: corpus-adaptive tb=32 banding, no
    // probing — the recall curve's 0-point
    "embed_knn_join_unprobed" -> knnJoinUnprobedOracle,
    // the tiled escape under a deliberately tiny maxBucket: the oracle is
    // IDENTICAL to the unprobed entry because the escape is exact — the
    // hash gate proves tiling changes the plan, never the rows
    "embed_knn_join_tiled" -> knnJoinUnprobedOracle,
    // the DEFAULT: the count-gated method branch (banded below the
    // crossover, IVF-cells past it) — both arms replayed verbatim
    "embed_knn_join" -> knnJoinAutoSql,
    // the banded graph under its explicit name: tb=128 adaptive banding
    // with the candidate b-side widened to the Hamming-1 probe
    // memberships
    "embed_knn_join_banded" -> knnJoinBandedSql,
    // the Hamming-2 opt-in: the candidate b-side widened to the
    // Hamming-<=2 probe memberships
    "embed_knn_join_h2" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |${vecBandCtesScaledTb(128)},
         |$vecProbe2Cte,
         |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
         |         FROM vbands a JOIN vprobe2 b ON a.band = b.band AND a.vec_id <> b.vec_id),
         |s AS (SELECT cand.vec_id, cand.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
         |            JOIN e eb ON cand.nbr_id = eb.vec_id),
         |r AS (SELECT *, (row_number() OVER
         |  (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC))::BIGINT AS rank FROM s)
         |SELECT vec_id, nbr_id, cosine, rank FROM r WHERE rank <= 3""".stripMargin,
    // Hamming-2 opt-in recall vs the exact graph on the same probe set
    "embed_knn_join_h2_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |${vecBandCtesScaledTb(128)},
         |$vecProbe2Cte,
         |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
         |         FROM vbands a JOIN vprobe2 b ON a.band = b.band AND a.vec_id <> b.vec_id
         |         WHERE a.vec_id < 100),
         |sc AS (SELECT cand.vec_id, cand.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
         |            JOIN e eb ON cand.nbr_id = eb.vec_id),
         |ap AS (SELECT vec_id AS a_id, nbr_id AS a_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rank FROM sc)
         |  WHERE rank <= 3),
         |exs AS (SELECT p.vec_id AS p_id, e2.vec_id AS e_nbr,
         |  round(${cosineSql("e2.v", "p.v")}, 6) AS cosine
         |  FROM e e2, e p WHERE p.vec_id < 100 AND e2.vec_id <> p.vec_id),
         |ext AS (SELECT p_id, e_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY p_id ORDER BY cosine DESC, e_nbr ASC) AS rank FROM exs)
         |  WHERE rank <= 3)
         |SELECT ext.p_id AS vec_id, count(*)::BIGINT AS n_exact,
         |  count(ap.a_nbr)::BIGINT AS n_hit,
         |  round(count(ap.a_nbr)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM ext LEFT JOIN ap ON ext.p_id = ap.a_id AND ext.e_nbr = ap.a_nbr
         |GROUP BY 1""".stripMargin,
    // probed-default recall vs the exact graph on the 100-probe set — the
    // other point of the recall/wall curve next to embed_knn_join_recall
    "embed_knn_join_probed_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |${vecBandCtesScaledTb(128)},
         |$vecProbeCte,
         |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
         |         FROM vbands a JOIN vprobe b ON a.band = b.band AND a.vec_id <> b.vec_id
         |         WHERE a.vec_id < 100),
         |sc AS (SELECT cand.vec_id, cand.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
         |            JOIN e eb ON cand.nbr_id = eb.vec_id),
         |ap AS (SELECT vec_id AS a_id, nbr_id AS a_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rank FROM sc)
         |  WHERE rank <= 3),
         |exs AS (SELECT p.vec_id AS p_id, e2.vec_id AS e_nbr,
         |  round(${cosineSql("e2.v", "p.v")}, 6) AS cosine
         |  FROM e e2, e p WHERE p.vec_id < 100 AND e2.vec_id <> p.vec_id),
         |ext AS (SELECT p_id, e_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY p_id ORDER BY cosine DESC, e_nbr ASC) AS rank FROM exs)
         |  WHERE rank <= 3)
         |SELECT ext.p_id AS vec_id, count(*)::BIGINT AS n_exact,
         |  count(ap.a_nbr)::BIGINT AS n_hit,
         |  round(count(ap.a_nbr)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM ext LEFT JOIN ap ON ext.p_id = ap.a_id AND ext.e_nbr = ap.a_nbr
         |GROUP BY 1""".stripMargin,
    // NN-descent: the probed-default seed + 2 unrolled refinement rounds
    // (reverse-cap, undirected union, neighbor-of-neighbor self-join,
    // exact re-score, per-vertex top-3) — the full trajectory replayed
    "embed_knn_join_nnd" ->
      s"""WITH ${knnDescentCtes(2)},
         |fin AS (SELECT vec_id, nbr_id, cosine, (row_number() OVER
         |  (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC))::BIGINT AS rank
         |  FROM gd2)
         |SELECT vec_id, nbr_id, cosine, rank FROM fin WHERE rank <= 3""".stripMargin,
    // refined-graph recall vs the exact graph on the 100-probe set — the
    // approx side is the FULL descent trajectory (the graph build is
    // global; probes filter at the end), the exact side the probe-set
    // brute force
    "embed_knn_join_nnd_recall" ->
      s"""WITH ${knnDescentCtes(2)},
         |ap AS (SELECT vec_id AS a_id, nbr_id AS a_nbr FROM (
         |  SELECT vec_id, nbr_id, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rank
         |  FROM gd2 WHERE vec_id < 100) WHERE rank <= 3),
         |exs AS (SELECT p.vec_id AS p_id, e2.vec_id AS e_nbr,
         |  round(${cosineSql("e2.v", "p.v")}, 6) AS cosine
         |  FROM e e2, e p WHERE p.vec_id < 100 AND e2.vec_id <> p.vec_id),
         |ext AS (SELECT p_id, e_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY p_id ORDER BY cosine DESC, e_nbr ASC) AS rank FROM exs)
         |  WHERE rank <= 3)
         |SELECT ext.p_id AS vec_id, count(*)::BIGINT AS n_exact,
         |  count(ap.a_nbr)::BIGINT AS n_hit,
         |  round(count(ap.a_nbr)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM ext LEFT JOIN ap ON ext.p_id = ap.a_id AND ext.e_nbr = ap.a_nbr
         |GROUP BY 1""".stripMargin,
    // IVF-cell graph: sized-quantizer Lloyd replay, per-vector top-nprobe
    // cell ranking (round(cosine,6) desc, cl asc) at the count-derived
    // probe width, the two-sided base/probe candidate union the kernel
    // scores, exact re-rank
    "embed_knn_join_cells" -> knnJoinCellsSql,
    // the graph-navigated serve: quantizer training, graph build, entry
    // sampling, and all six beam rounds replayed as unrolled CTEs
    "embed_knn_graph_serve" -> graphServeSql(),
    "embed_graph_recall" -> recallSqlOf(bruteKnnSql, graphServeSql()),
    // IVF-cell graph recall vs the exact graph on the 100-probe set
    "embed_knn_join_cells_recall" ->
      s"""WITH $kmSizedTrainCtes,
         |$cellsCandCtes,
         |sc AS (SELECT cand.vec_id, cand.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
         |            JOIN e eb ON cand.nbr_id = eb.vec_id
         |  WHERE cand.vec_id < 100),
         |ap AS (SELECT vec_id AS a_id, nbr_id AS a_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rank FROM sc)
         |  WHERE rank <= 3),
         |exs AS (SELECT p.vec_id AS p_id, e2.vec_id AS e_nbr,
         |  round(${cosineSql("e2.v", "p.v")}, 6) AS cosine
         |  FROM e e2, e p WHERE p.vec_id < 100 AND e2.vec_id <> p.vec_id),
         |ext AS (SELECT p_id, e_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY p_id ORDER BY cosine DESC, e_nbr ASC) AS rank FROM exs)
         |  WHERE rank <= 3)
         |SELECT ext.p_id AS vec_id, count(*)::BIGINT AS n_exact,
         |  count(ap.a_nbr)::BIGINT AS n_hit,
         |  round(count(ap.a_nbr)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM ext LEFT JOIN ap ON ext.p_id = ap.a_id AND ext.e_nbr = ap.a_nbr
         |GROUP BY 1""".stripMargin,
    // the capped opt-in: the embed_knn_join oracle with the candidate
    // side bounded per bucket by the same scramble-ordered row_number the
    // Spark side applies
    "embed_knn_join_capped" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |$vecBandCtesScaled,
         |bscr AS (SELECT band, vec_id, vec_id::VARCHAR AS s FROM vbands),
         |bcap AS (SELECT band, vec_id FROM (
         |  SELECT band, vec_id, row_number() OVER (PARTITION BY band
         |    ORDER BY ${duckScramble("s")} ASC, vec_id ASC) AS rn FROM bscr)
         |  WHERE rn <= 64),
         |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
         |         FROM vbands a JOIN bcap b ON a.band = b.band AND a.vec_id <> b.vec_id),
         |s AS (SELECT cand.vec_id, cand.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
         |            JOIN e eb ON cand.nbr_id = eb.vec_id),
         |r AS (SELECT *, (row_number() OVER
         |  (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC))::BIGINT AS rank FROM s)
         |SELECT vec_id, nbr_id, cosine, rank FROM r WHERE rank <= 3""".stripMargin,
    // kNN-graph recall vs the exact graph on the 100-probe set: the
    // approx side replays the embed_knn_join oracle, the exact side is a
    // probe-set brute force
    "embed_knn_join_recall" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |$vecBandCtesScaled,
         |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr_id
         |         FROM vbands a JOIN vbands b ON a.band = b.band AND a.vec_id <> b.vec_id
         |         WHERE a.vec_id < 100),
         |sc AS (SELECT cand.vec_id, cand.nbr_id,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
         |            JOIN e eb ON cand.nbr_id = eb.vec_id),
         |ap AS (SELECT vec_id AS a_id, nbr_id AS a_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC) AS rank FROM sc)
         |  WHERE rank <= 3),
         |exs AS (SELECT p.vec_id AS p_id, e2.vec_id AS e_nbr,
         |  round(${cosineSql("e2.v", "p.v")}, 6) AS cosine
         |  FROM e e2, e p WHERE p.vec_id < 100 AND e2.vec_id <> p.vec_id),
         |ext AS (SELECT p_id, e_nbr FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY p_id ORDER BY cosine DESC, e_nbr ASC) AS rank FROM exs)
         |  WHERE rank <= 3)
         |SELECT ext.p_id AS vec_id, count(*)::BIGINT AS n_exact,
         |  count(ap.a_nbr)::BIGINT AS n_hit,
         |  round(count(ap.a_nbr)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM ext LEFT JOIN ap ON ext.p_id = ap.a_id AND ext.e_nbr = ap.a_nbr
         |GROUP BY 1""".stripMargin,
    // same centroid CTEs as the IVF oracle + a decimal-exact per-cell avg
    "embed_centroid_quality" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
         |           FROM embeddings),
         |ed AS (SELECT label, di.i AS d, v[di.i] AS x
         |       FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) di),
         |cm AS (SELECT label, d,
         |  CAST(sum(CAST(round(x, 6) AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
         |  FROM ed GROUP BY 1, 2),
         |cent AS (SELECT label, list(c ORDER BY d) AS cv FROM cm GROUP BY 1),
         |s AS (SELECT e.label, round(${cosineSql("e.v", "cent.cv")}, 6) AS cos
         |      FROM e JOIN cent ON e.label = cent.label)
         |SELECT label, count(*)::BIGINT AS n,
         |  round(CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_cos,
         |  min(cos) AS min_cos
         |FROM s GROUP BY 1""".stripMargin,
    "embed_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
         |           FROM embeddings),
         |ed AS (SELECT label, di.i AS d, v[di.i] AS x
         |       FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) di),
         |cm AS (SELECT label, d,
         |  CAST(sum(CAST(round(x, 6) AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
         |  FROM ed GROUP BY 1, 2),
         |cent AS (SELECT label, list(c ORDER BY d) AS cv FROM cm GROUP BY 1),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         |pd AS (SELECT q.query_id, q.qv, cent.label,
         |  round(${cosineSql("q.qv", "cent.cv")}, 6) AS csim FROM q, cent),
         |pr AS (SELECT *, row_number() OVER
         |  (PARTITION BY query_id ORDER BY csim DESC, label ASC) AS rn FROM pd),
         |probe AS (SELECT query_id, qv, label FROM pr WHERE rn <= 2),
         |s AS (SELECT probe.query_id, e.vec_id,
         |  round(${cosineSql("e.v", "probe.qv")}, 6) AS cosine
         |  FROM probe JOIN e ON e.label = probe.label
         |  WHERE e.vec_id <> probe.query_id),
         |r AS (SELECT *, (row_number() OVER
         |  (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC))::BIGINT AS rank FROM s)
         |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin,
    // same centroid CTEs as embed_knn_ivf; distance = sequential-fold dot
    // over the difference vector; moments as decimal sums, ONE double
    // expression (m2 - m·m) at the end — operation order mirrors the Spark
    // side literal-for-literal so the z tail is bit-equal
    "embed_outliers" ->
      s"""WITH e AS (SELECT vec_id, label::BIGINT AS label,
         |             list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |ed AS (SELECT label, di.i AS d, v[di.i] AS x
         |       FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) di),
         |cm AS (SELECT label, d,
         |  CAST(sum(CAST(round(x, 6) AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
         |  FROM ed GROUP BY 1, 2),
         |cent AS (SELECT label, list(c ORDER BY d) AS cv FROM cm GROUP BY 1),
         |dvt AS (SELECT e.vec_id, e.label,
         |  list_transform(generate_series(1, len(e.v)), i -> e.v[i] - cent.cv[i]) AS dv
         |  FROM e JOIN cent USING (label)),
         |ds AS (SELECT vec_id, label, round(sqrt(${dotSql("dv", "dv")}), 6) AS dist FROM dvt),
         |mom AS (SELECT label, count(*)::BIGINT AS n,
         |  CAST(sum(CAST(dist AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         |  CAST(sum(CAST(round(dist*dist, 10) AS DECIMAL(28,10))) AS DOUBLE) AS s2
         |  FROM ds GROUP BY 1),
         |z AS (SELECT vec_id, ds.label, dist,
         |  CASE WHEN sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0)) = 0.0 THEN 0.0
         |       ELSE round((dist - s1/n) / sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0)), 6)
         |  END AS z FROM ds JOIN mom USING (label))
         |SELECT vec_id, label, dist, z FROM z WHERE z >= 1.5""".stripMargin,
    "dedup_embedding_fixed" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |$vecBandCtes,
         |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |         FROM vbands a JOIN vbands b ON a.band = b.band AND a.vec_id < b.vec_id),
         |s AS (SELECT cand.vec_a, cand.vec_b,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cosine
         |  FROM cand JOIN e ea ON cand.vec_a = ea.vec_id
         |            JOIN e eb ON cand.vec_b = eb.vec_id)
         |SELECT vec_a, vec_b, cosine FROM s WHERE cosine >= 0.4""".stripMargin,
    // SemDeDup: same adaptive banding CTEs; the keeper rule is a plain
    // min over qualifying lower-id same-label band-mates — no recursion
    "embed_semantic_prune" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |$vecBandCtesScaled,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nbr
         |         FROM vbands a JOIN vbands b ON a.band = b.band
         |         JOIN lab la ON la.vec_id = a.vec_id
         |         JOIN lab lb ON lb.vec_id = b.vec_id
         |         WHERE la.label = lb.label AND b.vec_id < a.vec_id),
         |d AS (SELECT cand.vec_id, min(cand.nbr) AS dup_of
         |      FROM cand JOIN e ea ON cand.vec_id = ea.vec_id
         |                JOIN e eb ON cand.nbr = eb.vec_id
         |      WHERE round(${cosineSql("ea.v", "eb.v")}, 6) >= 0.35
         |      GROUP BY 1)
         |SELECT l.vec_id, CAST(l.label AS BIGINT) AS label,
         |  coalesce(d.dup_of, -1) AS dup_of,
         |  CASE WHEN d.dup_of IS NULL THEN 'kept' ELSE 'dropped' END AS status
         |FROM lab l LEFT JOIN d ON l.vec_id = d.vec_id""".stripMargin,
    // the IVF-cell arm: the sized-Lloyd prefix + the cells graph's
    // two-sided candidate union (cellsCandCtes verbatim), pairs
    // normalized a<b, exact cosine >= tau verify
    "dedup_embedding_cells" -> dedupEmbCellsSqlGatedBy("TRUE"),
    "dedup_embedding_banded" -> dedupEmbBandedSqlGatedBy("TRUE"),
    // the AUTO default (r16): the same count(*) gate the Spark side
    // branches on, pushed into each arm's source CTE (the knnJoinAutoSql
    // discipline) — the measured gate is 0, so the banded arm's pipeline
    // runs over ZERO rows and the union IS the cells replay
    "dedup_embedding" -> dedupEmbAutoSql,
    // probe-pair recall of the auto vs the exact τ-set: the brute side is
    // |P|·N exact cosines over the 100 probe vectors, the approx side the
    // auto union replay restricted to probe-anchored pairs
    "dedup_embedding_pairs_recall" -> pairsRecallSqlOf(dedupEmbAutoSql),
    "dedup_embedding_banded_recall" ->
      pairsRecallSqlOf(dedupEmbBandedSqlGatedBy("TRUE")),
    "dedup_embedding_cells_recall" ->
      pairsRecallSqlOf(dedupEmbCellsSqlGatedBy("TRUE")),
    // SemDeDup: the sized Lloyd replay (the one trained-quantizer
    // contract), then the EXACT within-cell pair scan and keep-earliest —
    // a vector is dropped iff some lower-id cell-mate clears tau.
    "dedup_semantic" ->
      s"""WITH $kmSizedTrainCtes,
         |af AS (${kmAssignCte("e", "c2")}),
         |d AS (SELECT a.vec_id FROM af a JOIN af b
         |        ON a.cl = b.cl AND b.vec_id < a.vec_id
         |      WHERE round(${cosineSql("a.v", "b.v")}, 6) >= 0.35
         |      GROUP BY 1)
         |SELECT af.vec_id, CAST(af.cl AS INTEGER) AS cluster,
         |  (d.vec_id IS NULL) AS kept
         |FROM af LEFT JOIN d ON af.vec_id = d.vec_id""".stripMargin,
    "embed_dedup_incremental" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         |$vecBandCtes,
         |sp AS (SELECT count(*) * 4 // 5 AS split FROM embeddings),
         |cand AS (SELECT DISTINCT a.vec_id AS cvec, b.vec_id AS vec_id
         |         FROM vbands a JOIN vbands b ON a.band = b.band, sp
         |         WHERE a.vec_id < sp.split AND b.vec_id >= sp.split),
         |s AS (SELECT cand.vec_id, cand.cvec,
         |  round(${cosineSql("ea.v", "eb.v")}, 6) AS cos
         |  FROM cand JOIN e ea ON cand.cvec = ea.vec_id
         |            JOIN e eb ON cand.vec_id = eb.vec_id),
         |k AS (SELECT vec_id, min(cvec) AS nk FROM s WHERE cos >= 0.4 GROUP BY 1)
         |SELECT b.vec_id, coalesce(k.nk, -1) AS near_keeper,
         |  CASE WHEN k.nk IS NOT NULL THEN 'near_dup' ELSE 'unique' END AS status
         |FROM (SELECT vec_id FROM e, sp WHERE vec_id >= sp.split) b
         |LEFT JOIN k USING (vec_id)""".stripMargin,
    "embed_knn_kmeans" -> kmeansKnnSql(samplePct = None),
    // corpus-adaptive cell count: k from count(*), seeds = first k by id.
    // r14: the registered default is the STANDING-index serve — stored
    // assignments equal per-call ones (deterministic quantizer), so ONE
    // oracle covers both forms verbatim (the embed_knn_extend_serve
    // discipline) and the hash gate proves the row identity
    "embed_knn_kmeans_sized" -> kmeansKnnSizedSql,
    "embed_knn_kmeans_sized_percall" -> kmeansKnnSizedSql,
    "embed_kmeans_sized_recall" -> recallSqlOf(bruteKnnSql, kmeansKnnSizedSql),
    // filtered kNN: the count-gated auto default (brute arm when the
    // widened width clamps, IVF arm past it — both replays verbatim),
    // the explicit IVF form, and the exact baseline. r14: the default is
    // the standing payload-carrying serve; the per-call auto keeps the
    // same UNION-ALL oracle (row-identical by construction)
    "embed_knn_filtered" -> filteredKnnAutoSql,
    "embed_knn_filtered_percall" -> filteredKnnAutoSql,
    "embed_knn_filtered_ivf" -> filteredKnnIvfSql,
    "embed_knn_filtered_brute" -> filteredKnnBruteSql,
    "embed_filtered_recall" -> recallSqlOf(filteredKnnBruteSql, filteredKnnAutoSql),
    // range search: the SOUND pruned default equals the exact τ-set — its
    // oracle IS the brute replay (the hash gate proves completeness);
    // the rank-probed form keeps its own replay + measured recall.
    // r14: the default serves from the standing radii table — still
    // sound, same brute-replay oracle for both forms
    "embed_range_search" -> rangeBruteSql,
    "embed_range_search_percall" -> rangeBruteSql,
    "embed_range_search_probed" -> rangeIvfSql,
    "embed_range_search_brute" -> rangeBruteSql,
    // build 4/5 → disk extend 1/5 → SOUND standing serve: the served set
    // equals the exact tau-set, so the brute replay is the oracle and a
    // wrong radii merge fails the gate as a row diff
    "embed_range_extend_serve" -> rangeBruteSql,
    "embed_range_recall" -> recallSqlOf(rangeBruteSql, rangeBruteSql),
    "embed_range_probed_recall" -> recallSqlOf(rangeBruteSql, rangeIvfSql),
    // filtered range: sound pruning over the filter's survivors — the
    // oracle is the filtered brute replay (completeness under the filter)
    "embed_range_filtered" -> rangeBruteSqlWhere("e.label = 3"),
    // filtered MIPS: the count-gated UNION ALL with IP scoring — ONE
    // oracle for the standing default and the per-call form (r14)
    "embed_knn_mips_filtered" -> filteredMipsAutoSql,
    "embed_knn_mips_filtered_percall" -> filteredMipsAutoSql,
    "embed_mips_filtered_recall" ->
      recallSqlOf(filteredMipsBruteSqlGatedBy("TRUE"), filteredMipsAutoSql),
    // Lloyd trains on the corpus 4/5 only; af then assigns EVERY vector
    // against those centroids = persisted index ∪ routed batch
    "embed_knn_incremental" -> kmeansKnnSql(samplePct = None,
      trainWhere = Some("vec_id < (SELECT count(*) * 4 // 5 FROM embeddings)")),
    // the on-disk extend serves IDENTICALLY to the in-memory union — one
    // oracle, shared verbatim
    "embed_knn_extend_serve" -> kmeansKnnSql(samplePct = None,
      trainWhere = Some("vec_id < (SELECT count(*) * 4 // 5 FROM embeddings)")),
    "embed_knn_pq" -> pqKnnSql(),
    "embed_knn_ivfpq" -> ivfPqKnnSql(),
    "embed_knn_pq_refine" -> pqRefineSql(),
    "embed_knn_pq_sampled" -> pqKnnSql(samplePct = Some(40)),
    "embed_knn_sq8" -> sq8KnnSql(),
    "embed_knn_sq8_sampled" -> sq8KnnSql(Some(40)),
    "embed_trunc_recall" -> truncRecallSql(Seq(8, 16, 32)),
    "embed_rp_recall" -> rpRecallSql(Seq(8, 16, 32)),
    "embed_mmr_rerank" -> mmrSql(),
    "embed_sq8_recall" ->
      s"""WITH br AS (SELECT query_id, vec_id FROM ($bruteKnnSql)),
         |ap AS (SELECT query_id, vec_id FROM (${sq8KnnSql()}))
         |SELECT br.query_id, count(*) AS n_exact,
         |  count(ap.vec_id) AS n_hit,
         |  round(count(ap.vec_id)::DOUBLE / count(*)::DOUBLE, 6) AS recall
         |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
         |GROUP BY 1""".stripMargin,
    // identical replay, but the Lloyd rounds see only the affine-hash 40%
    // sample (smp CTE) — seeds and means come from the sample, the final
    // inverted file and re-rank still cover every vector
    "embed_knn_kmeans_sampled" -> kmeansKnnSql(samplePct = Some(40)),
    // same Lloyd replay to the final assignment af + centroids c2; the
    // balance is per-cluster rank by centrality (cosine to own centroid)
    "embed_cluster_balance" ->
      s"""WITH ${kmTrainedAssignCtes(None)},
         |cb AS (SELECT af.cl, af.vec_id,
         |  round(${cosineSql("af.v", "c2.cv")}, 6) AS centrality
         |  FROM af JOIN c2 USING (cl)),
         |r AS (SELECT *, (row_number() OVER
         |  (PARTITION BY cl ORDER BY centrality DESC, vec_id ASC))::BIGINT AS rank FROM cb)
         |SELECT cl, vec_id, centrality, rank FROM r WHERE rank <= 20""".stripMargin,
    "embed_label_stats" ->
      s"""WITH e AS (SELECT label::BIGINT AS label,
         |  round(sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
         |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)), 6) AS norm
         |  FROM embeddings)
         |SELECT label, count(*) AS n_vectors,
         |  round(CAST(sum(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_norm,
         |  min(norm) AS min_norm, max(norm) AS max_norm
         |FROM e GROUP BY 1""".stripMargin,
    // The multimodal oracles replay the IMAGE CONSTRUCTION, not the codec:
    // blobs are the doc's bytes packed 3-per-pixel into a 16-wide RGB image
    // (final row zero-padded) encoded as real BMP/PNG — both lossless — so
    // every decoded-raster stat is a pure function of the text bytes. A
    // codec bug (wrong dims, channel swap, lossy roundtrip) breaks the hash.
    // Char indexing == byte indexing holds because the corpus is verified
    // ASCII; height = ceil(len/48) since 16 px × 3 channel bytes per row.
    // phash replay from the text codes (the codecs are lossless, so the
    // decoded raster IS the padded byte stream): chunk j of the 48·h-byte
    // stream is exactly h bytes; dHash bit rule cs[j] > cs[(j+1) mod 48];
    // padding bytes past len(text) are 0 (NULL list access -> coalesce)
    "multimodal_phash" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes,
        |  ((len(text) - 1) // 48 + 1)::BIGINT AS h
        |  FROM documents WHERE length(text) > 0),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(codes[p], 0))), 0)::BIGINT) AS cs
        |  FROM c)
        |SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS phash
        |FROM t""".stripMargin,
    "multimodal_phash_pairs" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes,
        |  ((len(text) - 1) // 48 + 1)::BIGINT AS h
        |  FROM documents WHERE length(text) > 0),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(codes[p], 0))), 0)::BIGINT) AS cs
        |  FROM c),
        |ph AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS phash FROM t),
        |chunked AS (SELECT doc_id, phash, unnest(list_transform(generate_series(0, 3),
        |  c -> c::VARCHAR || ':' || ((phash >> (c*12)) & 4095)::VARCHAR)) AS chunk FROM ph),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
        |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin,
    // serve-path oracle is the BARE batch x corpus Hamming join — brute
    // force, no chunk machinery — so a hash match proves BOTH the dHash
    // replay and that the 4x12-bit pigeonhole serve is lossless at <= 3;
    // split on total doc count (empty-text docs included) to mirror the
    // Scala split, while ph itself only carries non-empty docs
    "multimodal_phash_incremental" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes,
        |  ((len(text) - 1) // 48 + 1)::BIGINT AS h
        |  FROM documents WHERE length(text) > 0),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(codes[p], 0))), 0)::BIGINT) AS cs
        |  FROM c),
        |ph AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS phash FROM t),
        |sp AS (SELECT count(*) * 4 // 5 AS split FROM documents)
        |SELECT b.doc_id, a.doc_id AS dup_of,
        |  bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
        |FROM ph a JOIN ph b ON bit_count(xor(a.phash, b.phash)) <= 3, sp
        |WHERE a.doc_id < sp.split AND b.doc_id >= sp.split""".stripMargin,
    "multimodal_features" ->
      """WITH c AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'image/png' END AS mime,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes,
        |  ((len(text) - 1) // 48 + 1)::BIGINT AS h
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, mime, 16::BIGINT AS width, h AS height,
        |  (h * 48)::BIGINT AS n_channel_bytes,
        |  (list_sum(codes) % 2147483647)::BIGINT AS channel_checksum,
        |  round(list_sum(codes)::DOUBLE / (h * 48), 6) AS mean_channel
        |FROM c""".stripMargin,
    // one row per decoded scanline; padding bytes contribute 0 to the sum,
    // so the slice over the unpadded codes is exact
    "multimodal_frames" ->
      """WITH f AS (SELECT doc_id, text,
        |  unnest(generate_series(1, (len(text) - 1) // 48 + 1)) AS r
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, (r - 1)::BIGINT AS frame_idx, 16::BIGINT AS n_pixels,
        |  (coalesce(list_sum(list_transform(
        |     generate_series((r - 1) * 48 + 1, least(r * 48, len(text))),
        |     i -> ascii(text[i])::BIGINT)), 0) % 2147483647)::BIGINT AS frame_checksum
        |FROM f""".stripMargin,
    // nearest-neighbor 2x downsample: out pixel (x,y) = src pixel (2x,2y);
    // src channel k of pixel (2x,2y) sits at byte (2y*16+2x)*3+k (1-indexed);
    // out-of-range list access is NULL in DuckDB = the zero padding
    "multimodal_resize" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes,
        |  ((len(text) - 1) // 48 + 1)::BIGINT AS h
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, 16::BIGINT AS orig_w, h AS orig_h,
        |  8::BIGINT AS out_w, ((h - 1) // 2 + 1)::BIGINT AS out_h,
        |  (list_sum(flatten(list_transform(generate_series(0, (h - 1) // 2),
        |     y -> list_transform(generate_series(0, 7),
        |       x -> coalesce(codes[(2 * y * 16 + 2 * x) * 3 + 1], 0)
        |          + coalesce(codes[(2 * y * 16 + 2 * x) * 3 + 2], 0)
        |          + coalesce(codes[(2 * y * 16 + 2 * x) * 3 + 3], 0))))) % 2147483647)::BIGINT
        |    AS resized_checksum
        |FROM c""".stripMargin,
    // the audio oracle replays the SAMPLE CONSTRUCTION (sample =
    // (code−64)·256 at 8 kHz), not the container: a WAV header/layout bug
    // or endianness slip on the engine side breaks the hash
    "multimodal_audio" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, 8000::BIGINT AS sample_rate, len(codes)::BIGINT AS n_samples,
        |  (len(codes) * 1000 // 8000)::BIGINT AS duration_ms,
        |  CAST(list_max(list_transform(codes, c -> abs((c - 64) * 256))) AS BIGINT) AS peak,
        |  CAST(list_sum(list_transform(codes, c -> abs((c - 64) * 256))) AS BIGINT) AS sum_abs,
        |  (list_sum(list_transform(codes, c -> (c - 64) * 256 + 32768)) % 2147483647)::BIGINT
        |    AS sample_checksum
        |FROM c""".stripMargin,
    // frame k's pixels replayed from the text codes; the (k+1)-weighted
    // checksum makes frame ORDER part of the gate
    "multimodal_video" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes
        |  FROM documents WHERE length(text) > 0),
        |f AS (SELECT doc_id, codes,
        |  list_transform(codes, cd -> list_sum(
        |    list_transform(generate_series(0, 15), j -> (cd * 7 + j * 13) % 256))) AS fsums
        |  FROM c)
        |SELECT doc_id, len(codes)::BIGINT AS n_frames,
        |  4::BIGINT AS width, 4::BIGINT AS height, 25000::BIGINT AS fps_e3,
        |  (len(codes) * 40)::BIGINT AS duration_ms,
        |  (list_sum(list_transform(generate_series(1, len(fsums)),
        |     k -> fsums[k] * k)) % 2147483647)::BIGINT AS frames_checksum,
        |  CAST(list_sum(list_transform(generate_series(1, len(fsums)),
        |     k -> CASE WHEN (k - 1) % 5 = 0 THEN fsums[k] ELSE 0 END)) AS BIGINT)
        |    AS sampled_sum
        |FROM f""".stripMargin,
    // the audio fingerprint oracle replays the shared dhash48 rule at
    // SAMPLE granularity: sample p = (code_p − 64)·256, h = ceil(n/48),
    // chunk j sums samples j·h+1 .. j·h+h (past-the-end -> 0), bit j iff
    // cs[j] > cs[(j+1) mod 48]. A WAV walker or endianness bug upstream
    // changes the samples and breaks the hash.
    "multimodal_audio_fp" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)),
        |    i -> ((ascii(text[i]) - 64) * 256)::BIGINT) AS smp,
        |  ((len(text) - 1) // 48 + 1)::BIGINT AS h
        |  FROM documents WHERE length(text) > 0),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(smp[p], 0))), 0)::BIGINT) AS cs
        |  FROM c)
        |SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS afp
        |FROM t""".stripMargin,
    // pairs oracle joins on the FLAT 4x12-bit chunks — a hash match proves
    // both the fingerprint replay and that the sharded-key engine path is
    // lossless at Hamming <= 3 (equal result sets by pigeonhole)
    "multimodal_audio_pairs" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)),
        |    i -> ((ascii(text[i]) - 64) * 256)::BIGINT) AS smp,
        |  ((len(text) - 1) // 48 + 1)::BIGINT AS h
        |  FROM documents WHERE length(text) > 0),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(smp[p], 0))), 0)::BIGINT) AS cs
        |  FROM c),
        |fp AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS afp FROM t),
        |chunked AS (SELECT doc_id, afp, unnest(list_transform(generate_series(0, 3),
        |  c -> c::VARCHAR || ':' || ((afp >> (c*12)) & 4095)::VARCHAR)) AS chunk FROM fp),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    bit_count(xor(a.afp, b.afp))::BIGINT AS hamming
        |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin,
    // serve-path oracle is the BARE batch x corpus Hamming join (split on
    // total doc count to mirror the Scala split)
    "multimodal_audio_incremental" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)),
        |    i -> ((ascii(text[i]) - 64) * 256)::BIGINT) AS smp,
        |  ((len(text) - 1) // 48 + 1)::BIGINT AS h
        |  FROM documents WHERE length(text) > 0),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(smp[p], 0))), 0)::BIGINT) AS cs
        |  FROM c),
        |fp AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS afp FROM t),
        |sp AS (SELECT count(*) * 4 // 5 AS split FROM documents)
        |SELECT b.doc_id, a.doc_id AS dup_of,
        |  bit_count(xor(a.afp, b.afp))::BIGINT AS hamming
        |FROM fp a JOIN fp b ON bit_count(xor(a.afp, b.afp)) <= 3, sp
        |WHERE a.doc_id < sp.split AND b.doc_id >= sp.split""".stripMargin,
    // the video fingerprint oracle replays dhash48 at FRAME granularity:
    // frame k's energy = Σ_j (code_k·7 + j·13) mod 256, then the same
    // chunk-sum comparison rule over the frame-sum sequence
    "multimodal_video_fp" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes
        |  FROM documents WHERE length(text) > 0),
        |f AS (SELECT doc_id,
        |  list_transform(codes, cd -> (list_sum(
        |    list_transform(generate_series(0, 15), j -> (cd * 7 + j * 13) % 256)))::BIGINT) AS fsums,
        |  ((len(codes) - 1) // 48 + 1)::BIGINT AS h
        |  FROM c),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(fsums[p], 0))), 0)::BIGINT) AS cs
        |  FROM f)
        |SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS vfp
        |FROM t""".stripMargin,
    "multimodal_video_pairs" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes
        |  FROM documents WHERE length(text) > 0),
        |f AS (SELECT doc_id,
        |  list_transform(codes, cd -> (list_sum(
        |    list_transform(generate_series(0, 15), j -> (cd * 7 + j * 13) % 256)))::BIGINT) AS fsums,
        |  ((len(codes) - 1) // 48 + 1)::BIGINT AS h
        |  FROM c),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(fsums[p], 0))), 0)::BIGINT) AS cs
        |  FROM f),
        |fp AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS vfp FROM t),
        |chunked AS (SELECT doc_id, vfp, unnest(list_transform(generate_series(0, 3),
        |  c -> c::VARCHAR || ':' || ((vfp >> (c*12)) & 4095)::VARCHAR)) AS chunk FROM fp),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    bit_count(xor(a.vfp, b.vfp))::BIGINT AS hamming
        |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin,
    "multimodal_video_incremental" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(generate_series(1, len(text)), i -> ascii(text[i])::BIGINT) AS codes
        |  FROM documents WHERE length(text) > 0),
        |f AS (SELECT doc_id,
        |  list_transform(codes, cd -> (list_sum(
        |    list_transform(generate_series(0, 15), j -> (cd * 7 + j * 13) % 256)))::BIGINT) AS fsums,
        |  ((len(codes) - 1) // 48 + 1)::BIGINT AS h
        |  FROM c),
        |t AS (SELECT doc_id, list_transform(generate_series(0, 47), j ->
        |  coalesce(list_sum(list_transform(
        |    generate_series(j*h + 1, j*h + h), p -> coalesce(fsums[p], 0))), 0)::BIGINT) AS cs
        |  FROM f),
        |fp AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
        |  CASE WHEN cs[j + 1] > cs[(j + 1) % 48 + 1]
        |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS vfp FROM t),
        |sp AS (SELECT count(*) * 4 // 5 AS split FROM documents)
        |SELECT b.doc_id, a.doc_id AS dup_of,
        |  bit_count(xor(a.vfp, b.vfp))::BIGINT AS hamming
        |FROM fp a JOIN fp b ON bit_count(xor(a.vfp, b.vfp)) <= 3, sp
        |WHERE a.doc_id < sp.split AND b.doc_id >= sp.split""".stripMargin,
    "book_query_ref" -> bookQueryRefSql,
    // identical semantics — the Spark side differs only in INGESTION (text
    // files through the wholetext source instead of parquet)
    "book_query_wholetext" -> bookQueryRefSql,
    "book_query_jaccard" ->
      s"""WITH ${shingleCte(3)},
         |q AS (SELECT sh AS q_sh FROM sh WHERE doc_id = 0)
         |SELECT d.doc_id,
         |  len(list_intersect(d.sh, q.q_sh)) AS inter_len,
         |  len(d.sh) + len(q.q_sh) - len(list_intersect(d.sh, q.q_sh)) AS union_len,
         |  round(CAST(len(list_intersect(d.sh, q.q_sh)) AS DOUBLE)
         |    / (len(d.sh) + len(q.q_sh) - len(list_intersect(d.sh, q.q_sh))), 6) AS jaccard
         |FROM sh d, q WHERE d.doc_id <> 0 AND len(list_intersect(d.sh, q.q_sh)) > 0""".stripMargin,
    "simjoin_allpairs" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
         |${verifyTail(0.7)}""".stripMargin,
    // naive directed join, containment semantics replayed on string sets
    "simjoin_containment" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  len(list_intersect(a.sh, b.sh))::BIGINT AS inter_len,
         |  len(a.sh)::BIGINT AS len_a,
         |  round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh), 6) AS containment
         |FROM sets a JOIN sets b ON a.doc_id <> b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh) >= 0.8""".stripMargin,
    // DuckDB verifies Ed-Join with the NAIVE inequality join — different
    // plan, same pair semantics
    "simjoin_edit_distance" ->
      """WITH n AS (SELECT p_name AS name, count(*) AS n_parts FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist,
        |  a.n_parts AS n_a, b.n_parts AS n_b
        |FROM n a JOIN n b
        |  ON a.name < b.name
        | AND abs(len(a.name) - len(b.name)) <= 2
        | AND levenshtein(a.name, b.name) <= 2""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_copies,
        |  min(doc_id) AS keeper FROM documents GROUP BY 1""".stripMargin,
    // normalization replayed verbatim: trim + collapse-whitespace + lower
    // (DuckDB needs the explicit 'g' flag Spark implies; the whitespace
    // class is spelled out because Java's \s includes \x0B and RE2's does
    // not — see Dedup.normalizeText)
    "dedup_exact_normalized" ->
      """WITH n AS (SELECT doc_id,
        |  sha256(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')))) AS h FROM documents)
        |SELECT h AS text_hash, CAST(count(*) AS BIGINT) AS n_copies,
        |  min(doc_id) AS keeper FROM n GROUP BY 1""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes
         |${verifyTail(0.7)}""".stripMargin,
    // LSH pair CTEs + two source joins, normalized least/greatest
    "dedup_source_matrix" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |p AS (${verifyTail(0.7)})
         |SELECT least(da.source, db.source) AS src_a,
         |  greatest(da.source, db.source) AS src_b,
         |  count(*)::BIGINT AS n_pairs
         |FROM p JOIN documents da ON p.doc_a = da.doc_id
         |       JOIN documents db ON p.doc_b = db.doc_id
         |GROUP BY 1, 2""".stripMargin,
    // slot-agreement estimate (integer ppm) vs exact Jaccard per candidate
    "dedup_minhash_accuracy" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |m AS (SELECT cand.doc_a, cand.doc_b,
         |  len(list_filter(list_transform(generate_series(1, 64),
         |    i -> ga.sig[i] = gb.sig[i]), x -> x))::BIGINT AS n_match
         |  FROM cand JOIN sig ga ON cand.doc_a = ga.doc_id
         |            JOIN sig gb ON cand.doc_b = gb.doc_id),
         |x AS (SELECT doc_a, doc_b,
         |  round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
         |    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
         |  FROM cand JOIN sets sa ON cand.doc_a = sa.doc_id
         |            JOIN sets sb ON cand.doc_b = sb.doc_id)
         |SELECT m.doc_a, m.doc_b, m.n_match,
         |  (m.n_match * 1000000) // 64 AS est_ppm, x.jaccard
         |FROM m JOIN x ON m.doc_a = x.doc_a AND m.doc_b = x.doc_b""".stripMargin,
    "dedup_simhash" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |hs AS (SELECT doc_id, list_transform(sh, t -> ${duckHash("t")}) AS hset FROM sets),
         |fpt AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
         |  CASE WHEN list_sum(list_transform(hset,
         |    h -> ((h*(2*j+3) + (999 + 7919*j)) % 2147483647 % 2) * 2 - 1)) > 0
         |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS fp FROM hs),
         |chunked AS (SELECT doc_id, fp, unnest(list_transform(generate_series(0, 3),
         |  c -> c::VARCHAR || ':' || ((fp >> (c*12)) & 4095)::VARCHAR)) AS chunk FROM fpt),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
         |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH ${shingleCte(2)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
         |${verifyTail(0.8)}""".stripMargin,
    "dedup_clusters" -> clustersKeeperSql,
    // cluster sizes over the keeper table; weight = exact 1/n rounded 6dp
    "dedup_soft_weights" ->
      s"""WITH c AS ($clustersKeeperSql),
         |s AS (SELECT keeper, count(*)::BIGINT AS cluster_size FROM c GROUP BY 1)
         |SELECT c.doc_id, c.keeper, s.cluster_size,
         |  round(1.0::DOUBLE / s.cluster_size::DOUBLE, 6) AS weight
         |FROM c JOIN s ON c.keeper = s.keeper""".stripMargin,
    "book_query_topk" ->
      s"""SELECT * FROM ($bookQueryRefSql) base
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    // both tiers replayed over the id split: exact via the md5 self-join
    // across the 4/5 line, near via the shared LSH banding restricted to
    // (corpus, batch) pairs — corpus ids all precede batch ids, so cand's
    // doc_a<doc_b orientation already puts the corpus doc on the a side
    "dedup_incremental" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |sp AS (SELECT count(*) * 4 // 5 AS split FROM documents),
         |h62 AS (SELECT doc_id,
         |  list_distinct(list_transform(sh, t -> ${duckHash62("t")})) AS hset62 FROM sets),
         |ex AS (SELECT b.doc_id, min(c.doc_id) AS ek
         |  FROM documents b JOIN documents c ON md5(b.text) = md5(c.text), sp
         |  WHERE b.doc_id >= sp.split AND c.doc_id < sp.split GROUP BY 1),
         |nearv AS (SELECT cand.doc_b AS doc_id, min(cand.doc_a) AS nk
         |  FROM cand JOIN h62 ha ON cand.doc_a = ha.doc_id
         |            JOIN h62 hb ON cand.doc_b = hb.doc_id, sp
         |  WHERE cand.doc_a < sp.split AND cand.doc_b >= sp.split
         |    AND len(list_intersect(ha.hset62, hb.hset62))::DOUBLE
         |      / (len(ha.hset62) + len(hb.hset62) - len(list_intersect(ha.hset62, hb.hset62))) >= 0.7
         |  GROUP BY 1)
         |SELECT b.doc_id,
         |  coalesce(ex.ek, -1) AS exact_keeper,
         |  coalesce(nearv.nk, -1) AS near_keeper,
         |  CASE WHEN ex.ek IS NOT NULL THEN 'exact_dup'
         |       WHEN nearv.nk IS NOT NULL THEN 'near_dup'
         |       ELSE 'unique' END AS status
         |FROM (SELECT doc_id FROM documents, sp WHERE doc_id >= sp.split) b
         |LEFT JOIN ex USING (doc_id) LEFT JOIN nearv USING (doc_id)""".stripMargin,
    // the incremental replay with the corpus side additionally filtered to
    // ids not ≡ 0 mod 7 — a forgotten doc must never be a keeper
    "dedup_forget_serve" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |sp AS (SELECT count(*) * 4 // 5 AS split FROM documents),
         |h62 AS (SELECT doc_id,
         |  list_distinct(list_transform(sh, t -> ${duckHash62("t")})) AS hset62 FROM sets),
         |ex AS (SELECT b.doc_id, min(c.doc_id) AS ek
         |  FROM documents b JOIN documents c ON md5(b.text) = md5(c.text), sp
         |  WHERE b.doc_id >= sp.split AND c.doc_id < sp.split
         |    AND c.doc_id % 7 <> 0 GROUP BY 1),
         |nearv AS (SELECT cand.doc_b AS doc_id, min(cand.doc_a) AS nk
         |  FROM cand JOIN h62 ha ON cand.doc_a = ha.doc_id
         |            JOIN h62 hb ON cand.doc_b = hb.doc_id, sp
         |  WHERE cand.doc_a < sp.split AND cand.doc_a % 7 <> 0
         |    AND cand.doc_b >= sp.split
         |    AND len(list_intersect(ha.hset62, hb.hset62))::DOUBLE
         |      / (len(ha.hset62) + len(hb.hset62) - len(list_intersect(ha.hset62, hb.hset62))) >= 0.7
         |  GROUP BY 1)
         |SELECT b.doc_id,
         |  coalesce(ex.ek, -1) AS exact_keeper,
         |  coalesce(nearv.nk, -1) AS near_keeper,
         |  CASE WHEN ex.ek IS NOT NULL THEN 'exact_dup'
         |       WHEN nearv.nk IS NOT NULL THEN 'near_dup'
         |       ELSE 'unique' END AS status
         |FROM (SELECT doc_id FROM documents, sp WHERE doc_id >= sp.split) b
         |LEFT JOIN ex USING (doc_id) LEFT JOIN nearv USING (doc_id)""".stripMargin,
    "dedup_clusters_lsh" ->
      s"""WITH RECURSIVE ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |pairs AS (${verifyTail(0.7)}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |mn AS (SELECT src, min(dst) AS m FROM reach GROUP BY 1)
         |SELECT d.doc_id,
         |  least(d.doc_id, coalesce(mn.m, d.doc_id)) AS keeper,
         |  d.doc_id = least(d.doc_id, coalesce(mn.m, d.doc_id)) AS kept
         |FROM documents d LEFT JOIN mn ON d.doc_id = mn.src""".stripMargin,
    // the simhash pair machinery + the same recursive closure
    "dedup_clusters_simhash" ->
      s"""WITH RECURSIVE ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |hs AS (SELECT doc_id, list_transform(sh, t -> ${duckHash("t")}) AS hset FROM sets),
         |fpt AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
         |  CASE WHEN list_sum(list_transform(hset,
         |    h -> ((h*(2*j+3) + (999 + 7919*j)) % 2147483647 % 2) * 2 - 1)) > 0
         |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS fp FROM hs),
         |chunked AS (SELECT doc_id, fp, unnest(list_transform(generate_series(0, 3),
         |  c -> c::VARCHAR || ':' || ((fp >> (c*12)) & 4095)::VARCHAR)) AS chunk FROM fpt),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.fp, b.fp)) <= 3),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |mn AS (SELECT src, min(dst) AS m FROM reach GROUP BY 1)
         |SELECT d.doc_id,
         |  least(d.doc_id, coalesce(mn.m, d.doc_id)) AS keeper,
         |  d.doc_id = least(d.doc_id, coalesce(mn.m, d.doc_id)) AS kept
         |FROM documents d LEFT JOIN mn ON d.doc_id = mn.src""".stripMargin,
    // same recursive-closure clusters; the keep rule becomes a window over
    // cluster members ordered by token count
    "dedup_clusters_best" ->
      s"""WITH RECURSIVE ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |pairs AS (${verifyTail(0.7)}),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |mn AS (SELECT src, min(dst) AS m FROM reach GROUP BY 1),
         |cl AS (SELECT d.doc_id,
         |    least(d.doc_id, coalesce(mn.m, d.doc_id)) AS cluster,
         |    len(string_split(d.text, ' '))::BIGINT AS n_tokens
         |  FROM documents d LEFT JOIN mn ON d.doc_id = mn.src)
         |SELECT doc_id, cluster, n_tokens,
         |  row_number() OVER (PARTITION BY cluster
         |    ORDER BY n_tokens DESC, doc_id ASC) = 1 AS kept
         |FROM cl""".stripMargin,
    "rel_nation_trade" ->
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |  CAST(sum($discPriceSql) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ns ON s_nationkey = ns.n_nationkey
         |JOIN nation nc ON c_nationkey = nc.n_nationkey
         |GROUP BY 1, 2, 3""".stripMargin,
    "text_ngram_freq" ->
      s"""WITH ${shingleCte(3)},
         |g AS (SELECT unnest(sh) AS gram FROM sh),
         |f AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
         |r AS (SELECT gram, df, (row_number() OVER
         |  (ORDER BY df DESC, gram ASC))::BIGINT AS rank FROM f)
         |SELECT gram, df, rank FROM r WHERE rank <= 20""".stripMargin,
    // salting changes where partial counts accumulate, never the totals:
    // the oracle is the plain GROUP BY
    "text_gram_df_salted" ->
      s"""WITH ${shingleCte(3)},
         |g AS (SELECT unnest(sh) AS gram FROM sh)
         |SELECT gram, count(*) AS n FROM g GROUP BY 1 HAVING count(*) >= 5""".stripMargin,
    "text_lang_minhash" ->
      s"""WITH tok AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
         |shl AS (SELECT lang,
         |  list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM tok),
         |t AS (SELECT lang, unnest(list_transform(sh, t -> ${duckHash("t")})) AS h
         |      FROM shl WHERE len(sh) > 0),
         |s AS (SELECT lang, g.i,
         |  min((h*(2*g.i+1) + (12345 + 67891*g.i)) % 2147483647) AS sig_val
         |  FROM t CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
         |  GROUP BY 1, 2)
         |SELECT lang, i::BIGINT AS slot, sig_val FROM s""".stripMargin,
    "events_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT event_type, lag(event_type) OVER
        |  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type FROM e)
        |SELECT prev_type, event_type, count(*) AS n
        |FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "text_quality" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  len(w)::BIGINT AS n_tokens,
        |  length(text)::BIGINT AS n_chars_measured,
        |  len(list_distinct(w))::BIGINT AS n_distinct_tokens,
        |  len(list_intersect(list_distinct(w),
        |    ['the','a','an','of','and','or','to','in','is','it']))::BIGINT AS n_stopword_types,
        |  round(len(list_distinct(w))::DOUBLE / len(w)::DOUBLE, 6) AS type_token_ratio,
        |  round((length(text) - (len(w) - 1))::DOUBLE / len(w)::DOUBLE, 6) AS avg_token_len,
        |  round((len(list_distinct(w))::DOUBLE / len(w)::DOUBLE
        |    + (1.0 - n_stopword_types::DOUBLE / len(list_distinct(w))::DOUBLE)
        |    + least(len(w)::DOUBLE, 100.0) / 100.0) / 3.0, 6) AS quality_score
        |FROM tok""".stripMargin,
    "text_langid" ->
      """WITH tok AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS w FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(list_intersect(w, ['the','a','an','of','and','or','to','in','is','it']))::BIGINT AS en_hits,
        |  len(list_intersect(w, ['el','la','de','y','o','en','es','un','una','que']))::BIGINT AS es_hits,
        |  len(list_intersect(w, ['le','la','de','et','ou','en','est','un','une','que']))::BIGINT AS fr_hits
        |  FROM tok)
        |SELECT doc_id, lang AS labeled_lang, en_hits, es_hits, fr_hits,
        |  CASE WHEN greatest(en_hits, es_hits, fr_hits) = 0 THEN 'und'
        |       WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
        |       WHEN es_hits >= fr_hits THEN 'es'
        |       ELSE 'fr' END AS pred_lang
        |FROM sc""".stripMargin,
    "text_lang_confusion" ->
      """WITH tok AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS w FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(list_intersect(w, ['the','a','an','of','and','or','to','in','is','it']))::BIGINT AS en_hits,
        |  len(list_intersect(w, ['el','la','de','y','o','en','es','un','una','que']))::BIGINT AS es_hits,
        |  len(list_intersect(w, ['le','la','de','et','ou','en','est','un','une','que']))::BIGINT AS fr_hits
        |  FROM tok),
        |p AS (SELECT lang AS labeled_lang,
        |  CASE WHEN greatest(en_hits, es_hits, fr_hits) = 0 THEN 'und'
        |       WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
        |       WHEN es_hits >= fr_hits THEN 'es'
        |       ELSE 'fr' END AS pred_lang
        |  FROM sc),
        |m AS (SELECT labeled_lang, pred_lang, count(*) AS n_docs FROM p GROUP BY 1, 2)
        |SELECT labeled_lang, pred_lang, n_docs,
        |  (n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY labeled_lang))::BIGINT AS row_ppm
        |FROM m""".stripMargin,
    "text_zipf" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |f AS (SELECT t, count(*)::BIGINT AS n FROM tok WHERE t <> '' GROUP BY 1)
        |SELECT CAST(pow(2, floor(log2(n))) AS BIGINT) AS freq_bucket_lo,
        |  count(*) AS n_types, CAST(sum(n) AS BIGINT) AS n_tokens,
        |  max(n) AS max_freq
        |FROM f GROUP BY 1""".stripMargin,
    "text_token_counts" ->
      """SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS bpe_ish_tokens,
        |  round(length(text)::DOUBLE
        |    / greatest(len(string_split(text, ' ')), 1)::DOUBLE, 6) AS chars_per_ws_token
        |FROM documents""".stripMargin,
    "text_pii_scrub" ->
      """WITH inj AS (SELECT doc_id,
        |  'contact user' || doc_id::VARCHAR || '@example.com call 415-555-' ||
        |  lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' see https://ex.example/u/' ||
        |  doc_id::VARCHAR || ' ' || text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' admin@example.org' ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_email,
        |  len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phone,
        |  len(regexp_extract_all(text, 'https?://[^ ]+'))::BIGINT AS n_url,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g') AS clean_text
        |FROM inj""".stripMargin,
    "text_line_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ln AS (SELECT doc_id, i::BIGINT AS line_no,
        |         array_to_string(w[(i*10+1):(i*10+10)], ' ') AS line
        |       FROM tok, unnest(generate_series(0,
        |         CAST(ceil(len(w) / 10.0) AS BIGINT) - 1)) AS t(i)),
        |df AS (SELECT line, count(DISTINCT doc_id) AS df FROM ln GROUP BY 1)
        |SELECT l.doc_id, count(*)::BIGINT AS n_lines,
        |  (count(*) FILTER (WHERE d.df < 2))::BIGINT AS n_kept,
        |  coalesce(string_agg(l.line, chr(10) ORDER BY l.line_no)
        |    FILTER (WHERE d.df < 2), '') AS clean_text
        |FROM ln l JOIN df d USING (line)
        |GROUP BY 1""".stripMargin,
    "text_fingerprints" ->
      s"""SELECT doc_id,
         |  ${duckHash("text")} AS rolling_fp,
         |  md5(text) AS md5_fp,
         |  ${duckHash("array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')")} AS bow_fp
         |FROM documents""".stripMargin,
    "text_source_stats" ->
      """WITH t AS (SELECT source, lang, len(string_split(text, ' '))::BIGINT AS n_tokens,
        |  length(text)::BIGINT AS n_chars FROM documents)
        |SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  max(n_tokens) AS max_tokens,
        |  round(CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / count(*), 6) AS avg_chars
        |FROM t GROUP BY 1""".stripMargin,
    "text_quality_filter" ->
      s"""WITH $qualityCtes
         |SELECT doc_id, lang, n_tokens, n_distinct_tokens, n_chars,
         |  avg_token_len, type_token_ratio
         |FROM s WHERE $qualityPred""".stripMargin,
    "corpus_mix" ->
      s"""WITH b AS (SELECT doc_id, lang, source,
         |  ${duckHash("text")} % 10000 AS bucket FROM documents)
         |SELECT doc_id, lang, source, bucket FROM b
         |WHERE (source = 'src0' AND bucket < 10000)
         |   OR (source = 'src1' AND bucket < 6000)
         |   OR (source = 'src2' AND bucket < 3000)
         |   OR (source = 'src3' AND bucket < 1000)""".stripMargin,
    // temperature-mix replay: same token counts, same exact sqrt rule
    "corpus_mix_temperature" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
         |  len(string_split(text, ' '))::BIGINT AS n_tokens,
         |  ${duckHash("text")} % 10000 AS bucket FROM documents),
         |c AS (SELECT source, sum(n_tokens)::BIGINT AS c FROM t GROUP BY 1),
         |m AS (SELECT min(c) AS cmin FROM c),
         |th AS (SELECT source,
         |  CAST(round(sqrt(cmin::DOUBLE / c::DOUBLE) * 10000) AS BIGINT) AS threshold
         |  FROM c CROSS JOIN m)
         |SELECT t.doc_id, t.lang, t.source, t.bucket, th.threshold
         |FROM t JOIN th USING (source) WHERE t.bucket < th.threshold""".stripMargin,
    // DSIR replay: same hashed buckets, same add-one smoothing, same
    // round(ln(integer), 6) decimal arithmetic as the engine
    "corpus_dsir_scores" -> dsirScoresSql,
    "corpus_dsir_select" ->
      s"""WITH s AS ($dsirScoresSql)
         |SELECT doc_id, n_tokens, dsir_logweight FROM s
         |ORDER BY dsir_logweight DESC, doc_id ASC LIMIT 100""".stripMargin,
    // BM25 mirrored term by term: same tf/df/len tables, same double
    // literals and operation order, same term-sorted left fold, round(6)
    "text_bm25_topk" -> bm25TopSql,
    // the persisted-index serves replay the identical ranking: postings
    // hold exactly the (doc_id, term, tf) rows the in-DAG plan builds
    // (serve) / build-on-4/5-then-append-1/5 reunions them (incremental)
    "text_bm25_serve" -> bm25TopSql,
    "text_bm25_incremental" -> bm25TopSql,
    // hybrid = the SAME BM25 rollup (shared CTEs) ranked, the exact
    // cosine top-20 of vec 0 ranked, full-outer fused by RRF — pure
    // integer-rank arithmetic after the two retrievals (1.0/(60+rank) is
    // the same IEEE division of the same integers in both engines,
    // summed lexical-then-semantic, one round(6))
    "text_hybrid_topk" -> hybridTopSql,
    // the artifact-only serve: r14 — the count-gated auto branch (flat
    // exact tier below the crossover, probed tier past it), both arms
    // replayed verbatim with the deselected arm's source scans gated
    // empty
    "text_hybrid_serve" -> hybridServeAutoSql,
    // the probed serve carries its own oracle: Lloyd training + the
    // query's nprobe=2 probed cells + probed-cell-only cosine, fused
    "text_hybrid_serve_probed" -> hybridServeProbedSql(2),
    // multi-query serve over the first 5 docs as external queries
    "text_hybrid_batch" -> hybridBatchSql(5, None),
    // both serves replayed end-to-end, recalled per query
    "text_hybrid_probed_recall" -> hybridProbedRecallSql(20, 2),
    // the fused ranking over the corpus minus doc_id ≡ 3 mod 7
    "text_hybrid_forget_serve" -> hybridForgetSql,
    "corpus_chunks" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, i::BIGINT AS chunk_no, (i * 48)::BIGINT AS start_tok,
        |  len(w[(i*48+1):(i*48+64)])::BIGINT AS n_tok,
        |  array_to_string(w[(i*48+1):(i*48+64)], ' ') AS chunk_text
        |FROM tok, unnest(generate_series(0,
        |  (greatest(len(w) - 16, 1) + 47) // 48 - 1)) AS t(i)""".stripMargin,
    // CDC replay: same anchor rule, same running boundary count, same
    // anchor-relative sub-split, same space-joined chunk hash
    "corpus_chunks_cdc" -> cdcChunksSql,
    // chunk-level dedup: one groupBy on the replayed chunk hashes
    "corpus_chunks_cdc_dedup" ->
      s"""WITH c AS ($cdcChunksSql)
         |SELECT chunk_hash, count(DISTINCT doc_id)::BIGINT AS n_docs,
         |  count(*)::BIGINT AS n_occurrences,
         |  max(n_tokens) AS n_tokens, min(doc_id) AS canonical_doc
         |FROM c GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    "corpus_shuffle" ->
      s"""WITH e AS (SELECT doc_id, unnest(generate_series(0, 1))::BIGINT AS epoch
         |           FROM documents),
         |k AS (SELECT epoch, doc_id,
         |  doc_id::VARCHAR || ':' || epoch::VARCHAR AS s FROM e)
         |SELECT epoch, doc_id, ${duckScramble("s")} AS order_key FROM k""".stripMargin,
    // the two-phase seq equals the plain global row_number by construction
    "corpus_assign_ids" ->
      s"""WITH k0 AS (SELECT doc_id, doc_id::VARCHAR || ':0' AS s FROM documents),
         |k AS (SELECT doc_id, ${duckScramble("s")} AS order_key FROM k0)
         |SELECT doc_id, order_key,
         |  (row_number() OVER (ORDER BY order_key, doc_id) - 1)::BIGINT AS seq
         |FROM k""".stripMargin,
    "corpus_split" ->
      s"""WITH b AS (SELECT doc_id, source,
         |  ${duckHash("text")} % 10000 AS bucket FROM documents)
         |SELECT doc_id, source, bucket,
         |  CASE WHEN bucket < 9000 THEN 'train'
         |       WHEN bucket < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,
    // the near-dup cluster keeper's content-hash bucket decides the fold
    // for every member — replayed over the recursive-closure keeper table
    "corpus_split_clustered" ->
      s"""WITH c AS ($clustersKeeperSql),
         |b AS (SELECT c.doc_id, c.keeper, ${duckHash("k.text")} % 10000 AS bucket
         |      FROM c JOIN documents k ON k.doc_id = c.keeper)
         |SELECT doc_id, keeper, bucket,
         |  CASE WHEN bucket < 9000 THEN 'train'
         |       WHEN bucket < 9500 THEN 'val'
         |       ELSE 'test' END AS split FROM b""".stripMargin,
    "corpus_pack_bucketed" ->
      s"""WITH t AS (SELECT doc_id, source,
         |  ${duckHash("text")} % 8 AS bucket,
         |  len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
         |c AS (SELECT *,
         |  (sum(n_tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id
         |   ROWS UNBOUNDED PRECEDING))::BIGINT - n_tokens AS start_tok
         |  FROM t WHERE n_tokens > 0)
         |SELECT doc_id, source, bucket, n_tokens, start_tok,
         |  start_tok // 512 AS seq_first,
         |  (start_tok + n_tokens - 1) // 512 AS seq_last
         |FROM c""".stripMargin,
    // same prefix-sum arithmetic: exclusive running token sum per source,
    // integer division places each doc's first/last training sequence
    "corpus_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
        |c AS (SELECT *,
        |  (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |   ROWS UNBOUNDED PRECEDING))::BIGINT - n_tokens AS start_tok
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, source, n_tokens, start_tok,
        |  start_tok // 512 AS seq_first,
        |  (start_tok + n_tokens - 1) // 512 AS seq_last
        |FROM c""".stripMargin,
    "corpus_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
        |c AS (SELECT *, (sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |  ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens FROM t)
        |SELECT doc_id, source, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 800""".stripMargin,
    "corpus_budget_bucketed" ->
      s"""WITH t AS (SELECT doc_id, source, ${duckHash("text")} % 8 AS bucket,
         |  len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
         |c AS (SELECT *, (sum(n_tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id
         |  ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens FROM t)
         |SELECT doc_id, source, bucket, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= 300""".stripMargin,
    "corpus_source_cap" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |q AS (SELECT doc_id, source, len(w)::BIGINT AS n_tokens,
        |  len(list_distinct(w))::BIGINT * 1000000 // len(w)::BIGINT AS ttr_ppm
        |  FROM t WHERE len(w) > 0),
        |r AS (SELECT *, (row_number() OVER (PARTITION BY source
        |  ORDER BY ttr_ppm DESC, doc_id ASC))::BIGINT AS rank_in_source FROM q)
        |SELECT doc_id, source, n_tokens, ttr_ppm, rank_in_source FROM r
        |WHERE rank_in_source <= 40""".stripMargin,
    "text_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
        |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram FROM tok),
        |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
        |  count(*) AS n_distinct_grams,
        |  CAST(max(n) AS BIGINT) AS max_gram_count,
        |  round(1.0 - count(*)::DOUBLE / CAST(sum(n) AS BIGINT)::DOUBLE, 6) AS dup_gram_frac
        |FROM c GROUP BY 1""".stripMargin,
    "text_decontaminate" ->
      s"""WITH ${shingleCte(5)},
         |hsh AS (SELECT doc_id, list_transform(sh, t -> ${duckHash("t")}) AS hs FROM sh),
         |ev AS (SELECT DISTINCT unnest(hs) AS gram FROM hsh WHERE doc_id < 5),
         |ex AS (SELECT doc_id, unnest(hs) AS gram FROM hsh WHERE doc_id >= 5),
         |hits AS (SELECT ex.doc_id, count(*) AS n FROM ex JOIN ev USING (gram) GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(hits.n, 0) AS BIGINT) AS n_overlap_grams,
         |  coalesce(hits.n, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= 5) d
         |LEFT JOIN hits USING (doc_id)""".stripMargin,
    // seeds = decontaminate's flagged docs (5-gram hash overlap with the
    // eval set), edges = symmetric verified LSH pairs among corpus docs,
    // spread = the same bounded-hop UNION ALL recursion the engine runs
    "text_decontaminate_spread" ->
      s"""WITH RECURSIVE
         |tokev AS (SELECT doc_id, string_split(text, ' ') AS w
         |          FROM documents WHERE doc_id < 50),
         |ev AS (SELECT DISTINCT unnest(list_transform(list_distinct(
         |    list_transform(generate_series(1, greatest(len(w) - 4, 0)),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])),
         |  t -> ${duckHash("t")})) AS gram FROM tokev),
         |tokc AS (SELECT doc_id, string_split(text, ' ') AS w
         |         FROM documents WHERE doc_id >= 50),
         |shc AS (SELECT doc_id, list_distinct(
         |    list_transform(generate_series(1, greatest(len(w) - 4, 0)),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh5
         |  FROM tokc),
         |seeds AS (SELECT DISTINCT x.doc_id FROM
         |    (SELECT doc_id, unnest(list_transform(sh5, t -> ${duckHash("t")})) AS gram
         |     FROM shc) x
         |  JOIN ev USING (gram)),
         |cd AS (SELECT doc_id, text FROM documents WHERE doc_id >= 50),
         |${shingleCte(3, src = "cd")},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |$minhashCandCtes,
         |pairs AS (${verifyTail(0.7)}),
         |edges AS (SELECT doc_a, doc_b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |spread(doc_id, hops) AS (
         |  SELECT doc_id, 0 FROM seeds
         |  UNION ALL
         |  SELECT e.doc_b, s.hops + 1
         |  FROM spread s JOIN edges e ON e.doc_a = s.doc_id
         |  WHERE s.hops < 3)
         |SELECT doc_id, CAST(min(hops) AS BIGINT) AS hops
         |FROM spread GROUP BY doc_id""".stripMargin,
    "dedup_substring" ->
      s"""WITH ${shingleCte(10)},
         |ex AS (SELECT doc_id, unnest(list_transform(sh, t -> ${duckHash("t")})) AS h
         |       FROM sh WHERE len(sh) > 0),
         |dfc AS (SELECT h, count(*) AS df FROM ex GROUP BY 1)
         |SELECT doc_id, count(*) AS n_windows,
         |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_windows,
         |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) > 0 AS has_shared
         |FROM ex JOIN dfc USING (h) GROUP BY 1""".stripMargin,
    "text_tfidf_topk" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY 1, 2),
        |dfT AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms GROUP BY 1),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfT.df,
        |  round(tf.tf::DOUBLE * ln(nn.n / dfT.df::DOUBLE), 6) AS tfidf
        |  FROM tf JOIN dfT USING (term), nn),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)::BIGINT AS rank FROM scored)
        |SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= 3""".stripMargin,
  )
}
