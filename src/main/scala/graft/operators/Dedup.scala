package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.HashFunctions._

/** Deduplication surface for a training-data pipeline (builder mandate; the
  * reference's set-semantics shingling, BookQuery.java:66-70, is the seed of
  * all of it). Four detectors, cheapest to most robust:
  *
  *   1. exact        — md5 of the raw text; one hash-shuffle groupBy.
  *   2. minhash LSH  — MinHash signatures banded into LSH buckets; candidate
  *                     pairs verified with exact Jaccard. Sub-quadratic.
  *   3. simhash      — 48-bit SimHash, 4-chunk index, Hamming ≤ d verify.
  *                     LOSSLESS for d ≤ 3 (pigeonhole over 4 chunks).
  *   4. n-gram       — exact all-pairs word-n-gram Jaccard via the
  *                     prefix-filtered join (SimilarityJoin).
  *
  * Scale notes: signatures/fingerprints are fixed-width per doc (128·8 B,
  * 8 B) regardless of document size, so the shuffle for bucketing is tiny
  * compared to the corpus; band buckets are the unit of candidate generation,
  * so a hot bucket (boilerplate dup cluster) is bounded by the true dup
  * cluster size, and AQE skew-join splits oversized ones.
  */
object Dedup {

  /** Exact-duplicate groups: (text_hash, n_copies, keeper). keeper = lowest
    * doc_id, the row a keep-first dedup pass would retain.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))

  /** Near-duplicate pairs by MinHash LSH: sig of `numHashes`, banded
    * `bands` × `rowsPerBand`, exact-Jaccard-verified at ≥ tau. Output:
    * (doc_a, doc_b, inter_len, union_len, jaccard).
    */
  def minhashLshPairs(docs: DataFrame, tau: Double,
      numHashes: Int = 64, bands: Int = 16, k: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sets = docs.select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
      .where(size(col("sh")) > 0)
    val banded = sets
      .withColumn("sig", minhashFromHashes(hashSet(col("sh")), numHashes))
      .select(col("doc_id"), explode(minhashBandKeys(col("sig"), bands, rowsPerBand)).as("band"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    SimilarityJoin.verifyJaccard(cand, sets, tau)
  }

  /** Near-duplicate pairs by SimHash: pairs at Hamming distance ≤ maxDist
    * over the 48-bit fingerprint of the doc's shingle set. Exact (not
    * approximate) for maxDist ≤ 3. Output: (doc_a, doc_b, hamming).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3, k: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk index is only lossless for Hamming <= 3")
    val fps = docs.select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), simhash48(hashSet(col("sh"))).as("fp"))
    val chunked = fps.select(col("doc_id"), col("fp"), explode(simhashChunkKeys(col("fp"))).as("chunk"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }

  /** Exact n-gram-Jaccard near-dup pairs (delegates to the prefix join). */
  def ngramJaccardPairs(docs: DataFrame, tau: Double, n: Int = 2): DataFrame =
    SimilarityJoin.allPairsNgramJaccard(docs, tau, n)
}
