package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for the dedup/similarity surface.
  *
  * Everything here is plain integer arithmetic over character codes, so the
  * SAME values are computable in any SQL engine (the DuckDB oracles replicate
  * them exactly) — unlike e.g. xxhash64, whose implementation is private to
  * Spark. All functions are built from codegen'd HOFs: per-row work only, no
  * shuffle, no UDF — they scale linearly with input bytes at 100 TB.
  *
  * Hash family: H(t) = fold over chars of (acc*31 + code) mod p, p = 2^31-1
  * (the classic polynomial rolling hash over a Mersenne prime); the i-th
  * permutation is the affine map h_i(x) = (x*(2i+1) + b_i) mod p — a standard
  * universal-family construction for MinHash (Broder 1997; SURVEY.md §7.4).
  */
object HashFunctions {
  val P: Long = 2147483647L // 2^31 - 1

  import org.apache.spark.sql.GraftShim.{toColumn => toCol, toExpression => toExpr}

  /** Polynomial rolling hash of a string, in [0, P). Backed by the custom
    * [[graft.functions.expressions.PortableHash31]] expression (the HOF
    * char-fold was O(len²): one substr allocation per character).
    */
  def portableHash31(t: Column): Column =
    toCol(graft.functions.expressions.PortableHash31(toExpr(t)))

  /** Scrambled hash in [0, P): `(hash31 * hash37) % P`. Use THIS (not the
    * bare folds) whenever the hash must LOOK random as an order key — each
    * fold alone is affine in the chars and order-preserving on short
    * strings; the cross-product wraps the 62-bit product mod P and
    * decorrelates neighbors. Exact in any BIGINT engine (both factors
    * < 2^31, product < 2^62).
    */
  def portableScramble(t: Column): Column = {
    val h31 = toCol(graft.functions.expressions.PortableHash31(toExpr(t)))
    val h37 = toCol(graft.functions.expressions.PortableHash37(toExpr(t)))
    (h31 * h37) % lit(P)
  }

  /** Scalar 62-bit hash `h31·2³¹ + h37` — the single-string form of
    * HashPrimitives.hashSet62's packed element hash. Use as a JOIN/GROUP key
    * standing in for a string: fixed 8 bytes through every exchange instead
    * of the text, with a 2⁻⁶² per-pair collision floor.
    */
  def portableHash62(t: Column): Column = {
    val h31 = toCol(graft.functions.expressions.PortableHash31(toExpr(t)))
    val h37 = toCol(graft.functions.expressions.PortableHash37(toExpr(t)))
    h31 * lit(2147483648L) + h37
  }

  /** Pre-hash a string set once: array<long> of H(t). Do this before calling
    * [[minhashFromHashes]] / [[simhashFromHashes]] so the per-term hash runs
    * once, not once per permutation.
    */
  def hashSet(set: Column): Column = transform(set, portableHash31 _)

  /** MinHash signature (array<long>, length numHashes) from pre-hashed set.
    * Native kernel (graft.functions.expressions.MinHashSignature): the HOF
    * (transform ∘ array_min ∘ transform) allocated a boxed array per
    * permutation per row.
    */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    toCol(graft.functions.expressions.MinHashSignature(toExpr(hashes), numHashes))

  /** LSH band keys: `bands` strings "b:v1_v2_..", each hashing rowsPerBand
    * consecutive signature slots. Docs sharing any key are candidates; with
    * b bands of r rows the candidate probability is 1-(1-J^r)^b.
    * Native kernel ([[graft.functions.expressions.MinHashBandKeys]],
    * byte-identical strings, spec-fuzzed vs the HOF form): the interpreted
    * transform∘concat_ws∘slice chain was the dedup family's measured
    * per-row hot spot.
    */
  def minhashBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    toCol(graft.functions.expressions.MinHashBandKeys(
      toExpr(signature), bands, rowsPerBand))

  /** The pre-r16 HOF band-key formulation — kept as the spec's equivalence
    * oracle for the native kernel (and nothing else). */
  private[graft] def minhashBandKeysHof(signature: Column, bands: Int,
      rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => concat_ws(":", b.cast("string"),
        concat_ws("_", transform(slice(signature, b * lit(rowsPerBand) + 1, lit(rowsPerBand)), _.cast("string")))))

  /** 48-bit SimHash from pre-hashed set: bit j of the fingerprint is the sign
    * of Σ_t (2·g_j(t) − 1) where g_j(t) = ((H(t)·(2j+3) + 999 + 7919j) mod P)
    * mod 2. 48 bits keeps every intermediate positive in an int64 in any
    * engine. Ties (sum == 0) resolve to bit 0.
    */
  def simhash48(hashes: Column): Column =
    toCol(graft.functions.expressions.SimHash48(toExpr(hashes)))

  /** SHARDED chunk keys — the second-level pigeonhole refinement of the
    * flat 4×12-bit chunk index (Manku et al., WWW'07 §3: any pair at
    * Hamming ≤ 3 shares ≥ 1 of 4 chunks exactly, so chunk-join + verify
    * is lossless): 16 `"j:cv:k:bv"` strings per fingerprint, where
    * `cv` is chunk j's 12-bit value and `bv` is 9-bit block k of the OTHER
    * 36 bits (the word with chunk j excised). Any pair at Hamming ≤ 3
    * still shares ≥ 1 key: some chunk j is exactly equal (4-way pigeonhole
    * over ≤ 3 differing bits), and with chunk j clean all ≤ 3 differing
    * bits fall in the compacted 36-bit remainder, whose four 9-bit blocks
    * pigeonhole again to ≥ 1 equal. So the index stays LOSSLESS for
    * distance ≤ 3, but a bucket key now pins 21 fingerprint bits instead
    * of 12: expected bucket occupancy — and the candidate join's output,
    * which grows with Σ occupancy² — shrinks by 2^9 for only 4× more keys.
    * This is what keeps the all-pairs join linear once corpus size crosses
    * the 4096-bucket saturation point the flat chunk index hits (measured:
    * 7.0× wall at 16× images before this refinement). The chunk width
    * itself can never be widened adaptively — pigeonhole for ≤ 3 errors
    * needs exactly 4 chunks — so the refinement nests INSIDE each chunk
    * bucket instead (an equi-key refinement, not a semantic change:
    * fingerprints-only on the wire, still one shuffle).
    */
  def simhashShardedChunkKeys(fp: Column): Column = {
    val hi36 = (1L << 36) - 1
    val keys = for { j <- 0 to 3; k <- 0 to 3 } yield {
      val chunkVal = call_function("shiftright", fp, lit(12 * j)).bitwiseAND(4095L)
      // excise chunk j: bits [0,12j) stay, bits [12j+12,48) shift down 12
      val lowMask = (1L << (12 * j)) - 1
      val rem = fp.bitwiseAND(lowMask).bitwiseOR(
        call_function("shiftright", fp, lit(12)).bitwiseAND(hi36 & ~lowMask))
      val blockVal = call_function("shiftright", rem, lit(9 * k)).bitwiseAND(511L)
      concat_ws(":", lit(j).cast("string"), chunkVal.cast("string"),
        lit(k).cast("string"), blockVal.cast("string"))
    }
    array(keys: _*)
  }

  /** Hamming distance between two fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")
}
