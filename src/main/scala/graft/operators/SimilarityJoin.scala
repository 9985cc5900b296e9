package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
import graft.functions.TextFunctions._
import graft.functions.expressions.{HashSet62, IntersectCountSorted}

/** Generalized all-pairs set-similarity join — the reference's inverted-index
  * trick (BookQuery.java:81-105) generalized from one-query-vs-corpus to
  * corpus-vs-corpus, the way the MR set-similarity-join literature does it
  * (Vernica/Carey/Li SIGMOD'10 prefix filtering; the reference's df==n drop
  * at BookQuery.java:105 is a crude special case of the same hot-token
  * pruning).
  *
  * Scale design (100 TB): the naive all-pairs join explodes O(n²). Here each
  * document contributes only its PREFIX tokens (its globally-rarest shingles)
  * to the candidate join — lossless for Jaccard ≥ τ under a consistent global
  * (df, term) order — so the self-join key space is dominated by rare tokens
  * and the hot-token skew that would otherwise melt a shuffle partition never
  * enters the join. Three further scale decisions:
  *
  *   - ALL candidate-side machinery runs on 62-bit hashes (one long per
  *     term), never on shingle strings: the exploded frame, the df table,
  *     the self-join keys and the verify prefilter all shuffle longs; full
  *     strings are joined only for the final survivors.
  *   - the self-join is ASYMMETRIC (Bayardo's All-Pairs indexing prefix):
  *     the smaller side of every pair only exposes its
  *     p = |s| − ⌊2τ/(1+τ)·|s|⌋ + 1 rarest tokens, roughly halving generated
  *     pairs vs the symmetric probe prefix — still lossless, because the
  *     minimum overlap α ≥ ⌈2τ/(1+τ)·|small|⌉ forces a match that early.
  *   - no unconditional broadcast: corpus-derived sides (the df table, the
  *     hash-set table) go through [[Scale.maybeBroadcast]], so a 100× input
  *     degrades to a shuffled join instead of an executor OOM, and AQE still
  *     picks broadcast at runtime whenever the actual size is small.
  *
  * Candidate verification joins back by doc id (hash shuffles, AQE-coalesced)
  * and filters on exact Jaccard. No driver-side collect anywhere.
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
    // hashed prefilter earns its keep there (793k candidates at sf0.1)
    pairsFromSets(sets, tau, hashPrefilter = true)
  }

  /** Sorted-distinct 62-bit hash view of (doc_id, sh) — the compact frame the
    * candidate and prefilter stages run on.
    */
  private def hashSets(sets: DataFrame): DataFrame =
    sets.select(col("doc_id"), toColumn(HashSet62(toExpression(col("sh")))).as("hs"))

  /** Prefix-filtered exact similarity join over (doc_id, sh: array<string>). */
  def pairsFromSets(sets: DataFrame, tau: Double, hashPrefilter: Boolean = false): DataFrame = {
    // ONE shingle pass (r17): the candidate machinery consumed the shingle
    // frame from EIGHT independent plan branches (plan-counted on
    // dedup_ngram_jaccard: ranked window ×2 — probe and index — df table,
    // explode, hash-prefilter attach ×2, exact-verify attach ×2), each
    // re-running scan+tokenize+shingle. Lazy local checkpoints materialize
    // the string sets, their 62-bit hash view, and the ranked frame once;
    // every branch rereads blocks. Same single-pass discipline as
    // bm25TopDocs/withSharedShingleSets; sizes are the frames' own bounds
    // (corpus shingles, 8 B/term hashes, exploded ranked tokens),
    // spill-safe storage.
    val setsC = sets.localCheckpoint(eager = false)
    val hsetsC = hashSets(setsC).localCheckpoint(eager = false)
    val ex = hsetsC
      .select(col("doc_id"), size(col("hs")).as("sz"), explode(col("hs")).as("t"))
    // Global document frequency per (hashed) term — the ordering key that
    // makes prefixes the RAREST tokens. |vocab| rows of two longs.
    val dfT = ex.groupBy("t").agg(count(lit(1)).as("df"))
    val withDf = ex.join(Scale.maybeBroadcast(dfT), "t")
    // Rank every token of a doc under the global (df, t) order; prefixes are
    // rank cutoffs. ⌊·⌋ (not ⌈·⌉) everywhere below so float error can only
    // LENGTHEN a prefix — more candidates, never a lost pair.
    val w = Window.partitionBy("doc_id").orderBy("df", "t")
    val ranked = withDf.withColumn("rnk", row_number().over(w))
      .localCheckpoint(eager = false) // probe AND index read one window pass
    // Probe prefix p = sz − ⌊τ·sz⌋ + 1 (any pair partner); indexing prefix
    // p = sz − ⌊2τ/(1+τ)·sz⌋ + 1 (partners at least as large — the minimum
    // overlap α ≥ ⌈2τ/(1+τ)·sz⌉ then forces a shared token this early).
    val probe = ranked
      .where(col("rnk") <= col("sz") - floor(lit(tau) * col("sz")) + 1)
      .select(col("doc_id"), col("sz"), col("rnk"), col("t"))
    val index = ranked
      .where(col("rnk") <= col("sz") - floor(lit(2 * tau / (1 + tau)) * col("sz")) + 1)
      .select(col("doc_id"), col("sz"), col("rnk"), col("t"))
    // Join-condition pruning, all lossless:
    //  - size order (a the smaller side) — pairs each unordered pair once
    //  - length filter (Arasu/Chaudhuri): J ≥ τ ⇒ τ·|b| ≤ |a| (ε guards the
    //    boundary where τ·|b| is an integer and the double product rounds up)
    //  - PPJoin positional filter (Xiao/Wang/Lin): matching at (rnk_a, rnk_b),
    //    the remaining-overlap bound min(sz_a−rnk_a, sz_b−rnk_b)+1 must reach
    //    the τ-implied minimum intersection ⌊τ/(1+τ)·(sz_a+sz_b)⌋.
    val minInter = floor(lit(tau / (1 + tau)) * (col("a.sz") + col("b.sz")))
    val cand = index.as("a").join(probe.as("b"),
        col("a.t") === col("b.t") &&
        (col("a.sz") < col("b.sz") ||
          (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))) &&
        col("b.sz") * tau <= col("a.sz") + lit(1e-9) &&
        least(col("a.sz") - col("a.rnk"), col("b.sz") - col("b.rnk")) + 1 >= minInter)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    // NOT distinct here: the prefilter is cheaper per row (one merge scan)
    // than a full shuffle-dedup of the candidate stream; dedup happens on the
    // (tiny) survivor set inside verifyJaccard.
    verifyJaccard(cand, setsC, tau, hashPrefilter, hsetsIn = Some(hsetsC))
  }

  /** Join candidate (doc_a, doc_b) pairs back to their sets and keep exact
    * Jaccard ≥ tau. Output columns shared by every dedup variant; candidate
    * streams may contain duplicate pairs (dedup happens after the prefilter,
    * where the stream is smallest).
    *
    * Two stages (profiled at sf0.1: attaching the string shingle arrays to
    * 793k candidates shuffled ~1 KB/row twice and dominated the query):
    *   1. prefilter on compact sorted 62-bit hash sets (8 B/term) — one
    *      allocation-free merge scan per candidate, inside whole-stage
    *      codegen. A collision between terms NOT shared by both docs can
    *      only merge union elements (hashed Jaccard ≥ true Jaccard — safe);
    *      the residual risk is a collision between two terms SHARED by both
    *      docs, which shrinks the hashed intersection and could drop a
    *      τ-boundary pair — probability ≈ 2^-62 per pair, the accepted
    *      trade of this prefilter.
    *   2. exact string-set verification, now joining arrays only for the
    *      handful of surviving pairs — the output values are computed
    *      exclusively from real shingle strings.
    */
  private[operators] def verifyJaccard(cand: DataFrame, sets: DataFrame, tau: Double,
      hashPrefilter: Boolean = false,
      hsetsIn: Option[DataFrame] = None): DataFrame = {
    val pre = if (!hashPrefilter) cand.distinct() else {
      // callers that already materialized the hash view (pairsFromSets'
      // checkpoints) pass it in; others derive it from `sets` as before
      val hsets = hsetsIn.getOrElse(hashSets(sets))
      val hInter = toColumn(IntersectCountSorted(
        toExpression(col("ha")), toExpression(col("hb"))))
      val hUni = size(col("ha")).cast("long") + size(col("hb")).cast("long") - hInter
      cand
        .join(Scale.maybeBroadcast(hsets.select(col("doc_id").as("doc_a"), col("hs").as("ha"))), "doc_a")
        .join(Scale.maybeBroadcast(hsets.select(col("doc_id").as("doc_b"), col("hs").as("hb"))), "doc_b")
        .where(hInter.cast("double") / hUni.cast("double") >= tau)
        .select(col("doc_a"), col("doc_b"))
        .distinct()
    }
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

  /** Directed CONTAINMENT join: pairs (a, b) where a's shingle set is
    * τ-contained in b's — |sh(a) ∩ sh(b)| / |sh(a)| ≥ τ. The asymmetric
    * cousin of [[allPairsJaccard]], and the right operator for
    * SUBSET-duplicates (a quote, excerpt, or truncation of a longer doc has
    * low Jaccard against its source but containment ≈ 1 — Jaccard dedup
    * misses exactly those).
    *
    * Scale shape: containment admits NO length filter (b may be arbitrarily
    * larger than a), so the prefix scheme is one-sided — the probe (a) side
    * exposes its p = |a| − ⌊τ·|a|⌋ + 1 globally-rarest tokens (overlap
    * ≥ ⌈τ·|a|⌉ forces a shared token among them; ⌊·⌋ only lengthens the
    * prefix), while the indexed (b) side posts ALL tokens. Probes therefore
    * hit mostly RARE posting lists — the df order does the pruning the
    * length filter can't. Candidates and the prefilter run on 62-bit
    * hashes ([[verifyJaccard]]'s discipline); exact string-set containment
    * verifies survivors. Output: (doc_a, doc_b, inter_len, len_a,
    * containment), doc_a ≠ doc_b, BOTH directions evaluated.
    */
  def containmentPairs(docs: DataFrame, tau: Double, k: Int = 3): DataFrame = {
    // same ONE-shingle-pass checkpoints as [[pairsFromSets]] (r17): the
    // probe/index/prefilter/verify branches reread materialized blocks
    // instead of each re-running scan+tokenize+shingle
    val sets = docs.select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
      .where(size(col("sh")) > 0)
      .localCheckpoint(eager = false)
    val hsets = hashSets(sets).localCheckpoint(eager = false)
    val ex = hsets.select(col("doc_id"), size(col("hs")).as("sz"), explode(col("hs")).as("t"))
    val dfT = ex.groupBy("t").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy("df", "t")
    // EVERY token ranked in the one global (df, t) order (the same
    // window the prefix filter already paid — the b-side ranks are free
    // pruning input, not a new shuffle)
    val ranked = ex.join(Scale.maybeBroadcast(dfT), "t")
      .withColumn("rnk", row_number().over(w))
      .localCheckpoint(eager = false) // probe AND index read one window pass
    val probe = ranked
      .where(col("rnk") <= col("sz") - floor(lit(tau) * col("sz")) + 1)
      .select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("t"),
        col("rnk").as("rnk_a"))
    val index = ranked.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
      col("t"), col("rnk").as("rnk_b"))
    // SIZE + POSITIONAL pruning per candidate ROW before any array is
    // fetched (r15, the x64 slope diagnosis — Vernica/PPJoin's filters,
    // already the allpairs discipline, applied to the containment side):
    // the token join emits one row per shared prefix token — 25.3M rows
    // at x64, each previously dragging two shingle-hash ARRAYS through
    // the prefilter joins once the doc-hash table outgrew the broadcast
    // threshold (the measured super-linear wall term; candidate volume
    // itself is linear — 6.33M → 25.3M rows at x16 → x64, exactly 4.0×).
    // Size: containment ≥ τ needs |B| ≥ τ·|A|. Positional: with both
    // docs' tokens in ONE global (df, t) order, a row joining at ranks
    // (rnk_a, rnk_b) bounds the overlap FROM t ONWARD by
    // min(sz_a−rnk_a, sz_b−rnk_b)+1; at a true pair's FIRST shared
    // token the before-t overlap is zero, so requiring the bound ≥
    // τ·|A| keeps that row — every true pair survives via its
    // first-shared-token row (sound), while non-pairs' rows prune here
    // instead of at the array prefilter.
    // PREFIX-COUNT filter (r16, the r15 verdict's item 4 — PPJoin's
    // common-prefix-count bound, the residual-constant remedy): a pair's
    // total overlap is its shared-prefix-token count o_pre plus at most
    // the |A|−p tokens of A beyond the prefix, so containment ≥ τ forces
    //   o_pre ≥ ⌈τ·|A|⌉ − (|A| − p) = ⌈τ·|A|⌉ − ⌊τ·|A|⌋ + 1 ∈ {1, 2}.
    // Whenever τ·|A| is non-integral the bound is 2 — and the mass of
    // spurious candidates on a real corpus shares exactly ONE rare
    // prefix token, so they prune HERE, per aggregated candidate row,
    // before any array is fetched (measured: 11.1M → a fraction at x64).
    // The groupBy replaces the old distinct() — same shuffle, strictly
    // more pruning — and the per-row positional bound becomes its max
    // over the pair's rows (the first-shared-token row is among them, so
    // every true pair still survives; sound like the row form).
    val cand = probe.join(index,
        probe("t") === index("t") && col("doc_a") =!= col("doc_b"))
      .where(col("sz_b").cast("double") >= lit(tau) * col("sz_a").cast("double"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("o_pre"), first(col("sz_a")).as("sz_a"),
        max(least(col("sz_a") - col("rnk_a"), col("sz_b") - col("rnk_b")) + 1)
          .as("pos_bound"))
      .where(col("pos_bound").cast("double") >= lit(tau) * col("sz_a").cast("double"))
      .where(col("o_pre") >=
        ceil(lit(tau) * col("sz_a").cast("double")).cast("long")
          - floor(lit(tau) * col("sz_a").cast("double")).cast("long") + 1L)
      .select(col("doc_a"), col("doc_b"))
    // hash prefilter: containment on the 62-bit sets bounds true
    // containment from above (collisions only inflate the intersection)
    val hInter = toColumn(IntersectCountSorted(
      toExpression(col("ha")), toExpression(col("hb"))))
    val pre = cand
      .join(Scale.maybeBroadcast(hsets.select(col("doc_id").as("doc_a"), col("hs").as("ha"))), "doc_a")
      .join(Scale.maybeBroadcast(hsets.select(col("doc_id").as("doc_b"), col("hs").as("hb"))), "doc_b")
      .where(hInter.cast("double") / size(col("ha")).cast("double") >= tau)
      .select(col("doc_a"), col("doc_b"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    pre
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        inter.cast("long").as("inter_len"),
        size(col("sa")).cast("long").as("len_a"),
        (inter.cast("double") / size(col("sa")).cast("double")).as("c"))
      .where(col("c") >= tau)
      .select(col("doc_a"), col("doc_b"), col("inter_len"), col("len_a"),
        round(col("c"), 6).as("containment"))
  }

  /** Measurement-only candidate-volume probe for [[containmentPairs]]
    * (the Scratch `slopeprobe` diagnosis): Σ_t prefixCount(t)·df(t) —
    * the probe⋈index pair volume — as arithmetic over token counts,
    * no pair materialization. Not a registered surface. */
  private[graft] def containmentCandidateCountProbe2(docs: DataFrame,
      tau: Double = 0.8, k: Int = 3): (Long, Long) = {
    val sets = docs.select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
      .where(size(col("sh")) > 0)
    val hsets = hashSets(sets)
    val ex = hsets.select(col("doc_id"), size(col("hs")).as("sz"), explode(col("hs")).as("t"))
    val dfT = ex.groupBy("t").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy("df", "t")
    val ranked = ex.join(Scale.maybeBroadcast(dfT), "t")
      .withColumn("rnk", row_number().over(w))
    val probe = ranked
      .where(col("rnk") <= col("sz") - floor(lit(tau) * col("sz")) + 1)
    val rows = probe
      .groupBy("t").agg(count(lit(1)).as("p"))
      .join(dfT, "t")
      // sum over zero rows is NULL — coalesce so an empty corpus probes
      // to 0 instead of an NPE (ADVICE r15)
      .agg(coalesce(sum(col("p") * col("df")), lit(0L)).cast("long"))
      .collect()(0).getLong(0)
    // survivors of the size + positional + prefix-count pruning — what
    // actually reaches the array prefilter in [[containmentPairs]] (r16:
    // mirrors the shipped groupBy form, o_pre bound included)
    val dd = probe
      .select(col("doc_id").as("doc_a"), col("sz").as("sz_a"), col("t"),
        col("rnk").as("rnk_a"))
      .join(ranked.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
        col("t"), col("rnk").as("rnk_b")), "t")
      .where(col("doc_a") =!= col("doc_b"))
      .where(col("sz_b").cast("double") >= lit(tau) * col("sz_a").cast("double"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("o_pre"), first(col("sz_a")).as("sz_a"),
        max(least(col("sz_a") - col("rnk_a"), col("sz_b") - col("rnk_b")) + 1)
          .as("pos_bound"))
      .where(col("pos_bound").cast("double") >= lit(tau) * col("sz_a").cast("double"))
      .where(col("o_pre") >=
        ceil(lit(tau) * col("sz_a").cast("double")).cast("long")
          - floor(lit(tau) * col("sz_a").cast("double")).cast("long") + 1L)
      .count()
    (rows, dd)
  }

  /** All-pairs EDIT-DISTANCE join (Ed-Join, Xiao/Wang/Lin VLDB'08): unordered
    * string pairs within Levenshtein distance `maxDist`, without a cartesian
    * product. Candidate generation mirrors [[pairsFromSets]]' prefix
    * filtering, transposed to edit distance: one edit destroys at most `q`
    * of a string's q-grams, so strings within distance d share at least
    * max(|s|,|t|) − q + 1 − d·q q-grams — and under a global (df, gram)
    * order they must share one among their (d·q+1)-PREFIX grams (the
    * rarest ones). The lossless envelope:
    *
    *   - the count bound goes vacuous when max(|s|,|t|) < q·(d+1), so every
    *     string short enough to pair with one of those (len < q·(d+1)+d)
    *     is routed through an explicit short-bucket self-join — bounded by
    *     the short-string vocabulary, which a length histogram checks
    *     cheaply at any scale;
    *   - the length filter ||s|−|t|| ≤ d and the thresholded verify run on
    *     every candidate; verification uses the banded O(d·n) form
    *     (Spark's 3-arg `levenshtein` early-exits past the threshold).
    *
    * Input: a DataFrame with a `name` string column (DISTINCT names — dedupe
    * upstream; at scale you pair the vocabulary, not the rows). Output:
    * (name_a, name_b, edit_dist), name_a < name_b.
    */
  def editDistancePairs(names: DataFrame, maxDist: Int = 2, q: Int = 2): DataFrame = {
    val grams = names.select(col("name"),
      array_distinct(expr(
        s"transform(sequence(1, greatest(length(name) - $q + 1, 1)), i -> substring(name, i, $q))"))
        .as("gs"))
    val ex = grams.select(col("name"), explode(col("gs")).as("g"))
    val dfG = ex.groupBy("g").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("name").orderBy("df", "g")
    val pfx = ex.join(Scale.maybeBroadcast(dfG), "g")
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= lit(q * maxDist + 1))
      .select(col("name"), col("g"))
    val prefixCand = pfx.as("a").join(pfx.as("b"),
        col("a.g") === col("b.g") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    // strings the count bound can't cover: len < q(d+1); any qualifying
    // partner is within d of that, so the whole bucket is len < q(d+1)+d.
    // Paired via a LENGTH-KEY equi-join (one side fans out to its 2d+1
    // admissible partner lengths) — never an inequality/nested-loop join,
    // so the plan stays key-joins even for this bucket.
    val shortLen = q * (maxDist + 1) + maxDist
    val short = names.where(length(col("name")) < shortLen)
    val shortCand = short.select(col("name").as("name_a"), length(col("name")).as("lk"))
      .join(short.select(col("name").as("name_b"),
          explode(sequence(length(col("name")) - maxDist, length(col("name")) + maxDist)).as("lk")),
        "lk")
      .where(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"))
    prefixCand.unionAll(shortCand)
      .distinct()
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .where(col("edit_dist") >= 0)
  }
}
