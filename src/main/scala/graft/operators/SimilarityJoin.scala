package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Generalized all-pairs set-similarity join — the reference's inverted-index
  * trick (BookQuery.java:81-105) generalized from one-query-vs-corpus to
  * corpus-vs-corpus, the way the MR set-similarity-join literature does it
  * (Vernica/Carey/Li SIGMOD'10 prefix filtering; the reference's df==n drop
  * at BookQuery.java:105 is a crude special case of the same hot-token
  * pruning).
  *
  * Scale design (100 TB): the naive all-pairs join explodes O(n²). Here each
  * document contributes only its PREFIX tokens (the p = |s| − ⌊τ·|s|⌋ + 1
  * globally-rarest shingles) to the candidate join — lossless for Jaccard ≥ τ
  * under a consistent global (df, term) order — so the self-join key space is
  * dominated by rare tokens and the hot-token skew that would otherwise melt
  * a shuffle partition never enters the join. Candidate verification joins
  * back the full sets by doc_id (hash shuffles on doc_id, AQE-coalesced) and
  * filters on exact Jaccard. No driver-side collect anywhere.
  */
object SimilarityJoin {

  /** All unordered doc pairs with Jaccard(shingleSet_k) ≥ tau.
    * Output: (doc_a, doc_b, inter_len, union_len, jaccard) with doc_a < doc_b.
    */
  def allPairsJaccard(docs: DataFrame, tau: Double, k: Int = 3): DataFrame = {
    val sets = docs.select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
      .where(size(col("sh")) > 0)
    pairsFromSets(sets, tau, hashPrefilter = true)
  }

  /** Same join over word n-gram sets (dedup surface) — word n-grams of the
    * \W+ tokenizer ARE k=n shingles, so this shares the single-pass kernel.
    */
  def allPairsNgramJaccard(docs: DataFrame, tau: Double, n: Int): DataFrame = {
    val sets = docs.select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
      .where(size(col("sh")) > 0)
    // low-order grams on a small vocabulary -> dense candidate sets; the
    // hashed prefilter earns its broadcast there (793k candidates at sf0.1)
    pairsFromSets(sets, tau, hashPrefilter = true)
  }

  /** Prefix-filtered exact similarity join over (doc_id, sh: array<string>). */
  def pairsFromSets(sets: DataFrame, tau: Double, hashPrefilter: Boolean = false): DataFrame = {
    val ex = sets.select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("term"))
    // Global document frequency per term — the ordering key for prefixes.
    // |vocab| rows; at corpus scale this is the one aggregation whose result
    // is small enough to broadcast back.
    val df = ex.groupBy("term").agg(count(lit(1)).as("df"))
    val withDf = ex.join(broadcast(df), "term")
    // Prefix length p = sz − ⌊τ·sz⌋ + 1: ⌊·⌋ (not ⌈·⌉) so float error can
    // only lengthen the prefix — more candidates, never a lost pair.
    val w = Window.partitionBy("doc_id").orderBy("df", "term")
    val prefix = withDf
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= col("sz") - floor(lit(tau) * col("sz")) + 1)
      .select(col("doc_id"), col("sz"), col("rnk"), col("term"))
    // Join-condition pruning, both lossless (float error only loosens them):
    //  - length filter (Arasu/Chaudhuri): J ≥ τ ⇒ τ·max(|a|,|b|) ≤ min(|a|,|b|)
    //  - PPJoin positional filter (Xiao/Wang/Lin): matching at positions
    //    (rnk_a, rnk_b), the remaining-overlap bound
    //    min(sz_a−rnk_a, sz_b−rnk_b)+1 must reach the τ-implied minimum
    //    intersection ⌈τ/(1+τ)·(sz_a+sz_b)⌉ (floor used conservatively).
    val minInter = floor(lit(tau / (1 + tau)) * (col("a.sz") + col("b.sz")))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id") &&
        greatest(col("a.sz"), col("b.sz")) * tau <= least(col("a.sz"), col("b.sz")) &&
        least(col("a.sz") - col("a.rnk"), col("b.sz") - col("b.rnk")) + 1 >= minInter)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, sets, tau, hashPrefilter)
  }

  /** Join candidate (doc_a, doc_b) pairs back to their sets and keep exact
    * Jaccard ≥ tau. Output columns shared by every dedup variant.
    *
    * Two stages (profiled at sf0.1: attaching the string shingle arrays to
    * 793k candidates shuffled ~1 KB/row twice and dominated the query):
    *   1. map-side prefilter on compact 62-bit hash sets, broadcast
    *      (8 B/term; the whole corpus's hash sets at sf0.1 are ~4 MB —
    *      when the corpus outgrows broadcast, the same prefilter runs as a
    *      shuffle join of longs, or LSH candidates replace all-pairs
    *      entirely). 62-bit collisions (≈2^-62/pair) are the only way a
    *      true pair could be dropped here.
    *   2. exact string-set verification, now joining arrays only for the
    *      handful of surviving pairs — the output values are computed
    *      exclusively from real shingle strings.
    */
  private[operators] def verifyJaccard(cand: DataFrame, sets: DataFrame, tau: Double,
      hashPrefilter: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    val hsets = sets.select(col("doc_id"),
      toColumn(graft.functions.expressions.HashSet62(toExpression(col("sh")))).as("hs"))
    val hInter = size(array_intersect(col("ha"), col("hb")))
    val hUni = size(col("ha")) + size(col("hb")) - hInter
    val pre = if (!hashPrefilter) cand else cand
      .join(broadcast(hsets.select(col("doc_id").as("doc_a"), col("hs").as("ha"))), "doc_a")
      .join(broadcast(hsets.select(col("doc_id").as("doc_b"), col("hs").as("hb"))), "doc_b")
      .where(hInter.cast("double") / hUni.cast("double") >= tau)
      .select(col("doc_a"), col("doc_b"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    val uni = size(col("sa")) + size(col("sb")) - inter
    pre
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        inter.cast("long").as("inter_len"),
        uni.cast("long").as("union_len"),
        (inter.cast("double") / uni.cast("double")).as("j"))
      .where(col("j") >= tau)
      .select(col("doc_a"), col("doc_b"), col("inter_len"), col("union_len"),
        round(col("j"), 6).as("jaccard"))
  }
}
