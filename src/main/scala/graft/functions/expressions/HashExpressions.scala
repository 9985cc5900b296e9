package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass kernels for the MinHash / SimHash signature math. Semantics
  * are IDENTICAL to the HOF formulations they replace (HashFunctions —
  * affine permutations over the portable 31-bit hash; see the DuckDB oracle
  * SQL which re-implements the same arithmetic) — these exist because the
  * HOF versions allocate a boxed array per permutation per row.
  */
object HashPrimitives {
  private val P = 2147483647L

  /** sig[i] = min over h of (h·(2i+1) + 12345 + 67891·i) mod P. */
  def minhash(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = i * 2L + 1L
      val b = 12345L + 67891L * i
      var best = Long.MaxValue
      var t = 0
      while (t < n) {
        val v = (hashes.getLong(t) * a + b) % P
        if (v < best) best = v
        t += 1
      }
      out(i) = if (n == 0) 0L else best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-element 62-bit hashes of a string array, returned SORTED and
    * DISTINCT (see HashSet62) — the sorted form lets the verify prefilter
    * intersect two sets with one allocation-free merge scan.
    */
  def hashSet62(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val str = arr.getUTF8String(i).toString
      var h1 = 0L
      var h2 = 0L
      var c = 0
      while (c < str.length) {
        val ch = str.charAt(c)
        h1 = (h1 * 31L + ch) % P
        h2 = (h2 * 37L + ch) % P
        c += 1
      }
      out(i) = (h1 << 31) | h2
      i += 1
    }
    java.util.Arrays.sort(out)
    // drop collision-induced duplicates in place (input is already a set)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == n) out else java.util.Arrays.copyOf(out, w))
  }

  /** |a ∩ b| for two SORTED DISTINCT long arrays — a single merge scan, no
    * per-row hash-set allocation (array_intersect builds one per call).
    */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** sig[p] = 1 iff Σ_d v[d]·w(p,d) > 0, w = ±1 per the parity pattern;
    * sequential fold in ascending d keeps doubles bit-equal to the oracle.
    */
  def hyperplaneSig(v: ArrayData, nPlanes: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var d = 1
      while (d <= n) {
        val sign = if ((p * 2654435761L + d * 40503L) % 65537L % 2L == 1L) 1.0 else -1.0
        acc = acc + v.getDouble(d - 1) * sign
        d += 1
      }
      out(p) = if (acc > 0.0) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }

  /** All k bloom bits of `key` set in the DENSE word array? Bit positions
    * are the (2i+1)·pmod(key,P)+(12345+67891·i) mod P mod mBits permutation
    * family — arithmetic identical to the Column form it replaces
    * (Scale.bloomPositions), but one branchy integer loop per row instead
    * of an interpreted transform+forall over a materialized position array:
    * zero allocation, early exit on the first clear bit.
    */
  def bloomMightContain(words: ArrayData, key: Long, k: Int, mBits: Int): Boolean = {
    val h = ((key % P) + P) % P // pmod: non-negative residue like Spark's
    var i = 0
    while (i < k) {
      val pos = ((h * (2L * i + 1L) + (12345L + 67891L * i)) % P) % mBits
      if ((words.getLong((pos >> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** LSH band keys "b:v1_v2_…" (r16 opt): one string build per band in a
    * reused StringBuilder. Byte-identical to the HOF form it replaces
    * (concat_ws(":", b, concat_ws("_", transform(slice(sig, b·r+1, r),
    * cast_string)))) — Long.toString is exactly Spark's long→string cast,
    * a short/empty slice degrades to the same "b:" / shorter joins — but
    * the HOF chain was the dedup family's measured hot spot: an
    * interpreted transform∘concat_ws∘transform∘slice allocating per band
    * per row (~1.6 s of a 1.9 s banding pass at sf0.1).
    */
  def minhashBandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = sig.numElements()
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(4 + 12 * rowsPerBand)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      sb.append(b).append(':')
      var r = 0
      var first = true
      while (r < rowsPerBand) {
        val idx = b * rowsPerBand + r
        if (idx < n) {
          if (!first) sb.append('_')
          sb.append(sig.getLong(idx))
          first = false
        }
        r += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 48-bit SimHash: bit j set iff Σ_t (2·((h·(2j+3)+999+7919j) mod P mod 2)−1) > 0. */
  def simhash48(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Long](48)
    var t = 0
    while (t < n) {
      val h = hashes.getLong(t)
      var j = 0
      while (j < 48) {
        votes(j) += ((h * (j * 2L + 3L) + (999L + 7919L * j)) % P % 2L) * 2L - 1L
        j += 1
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 48) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

/** 62-bit per-element hash of a string array — the compact stand-in for a
  * shingle set in the similarity-verify prefilter (one long per term instead
  * of the term bytes). Two independent 31-bit polynomial folds (multipliers
  * 31 and 37) packed as (h1<<31)|h2; pairwise collision ≈ 2^-62. Output is
  * sorted distinct so [[IntersectCountSorted]] can merge-scan it.
  */
case class HashSet62(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashPrimitives.hashSet62(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashPrimitives.hashSet62($c)")
  override protected def withNewChildInternal(c: Expression): HashSet62 = copy(c)
}

/** |a ∩ b| over two sorted-distinct long arrays (array<long> ×
  * array<long> → long). The hot inner operation of the similarity-verify
  * prefilter: candidate volume × one merge scan, fully inside whole-stage
  * codegen, zero allocation per row.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashPrimitives.intersectCountSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.HashPrimitives.intersectCountSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCountSorted =
    copy(left = l, right = r)
}

/** MinHash signature over a pre-hashed set (array<long> → array<long>). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashPrimitives.minhash(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashPrimitives.minhash($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** Random-hyperplane LSH signature for a double vector (array<double> →
  * array<int> of 0/1 bits). Plane weights are the deterministic ±1 pattern
  * sign = [(p·2654435761 + d·40503) mod 65537 is odd], d 1-based — identical
  * arithmetic and fold order to the DuckDB oracle, so buckets are bit-exact.
  */
case class HyperplaneSignature(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  require(nPlanes >= 1)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashPrimitives.hyperplaneSig(v.asInstanceOf[ArrayData], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashPrimitives.hyperplaneSig($c, $nPlanes)")
  override protected def withNewChildInternal(c: Expression): HyperplaneSignature = copy(child = c)
}

/** Bloom-filter membership probe ((array<long> dense words, long key) →
  * boolean) — the per-fact-row kernel of [[graft.operators.Scale
  * .bloomPrunedFact]]. Replaces an interpreted `transform`+`forall` of k
  * modular positions (the round-5 bench's slowest registered kernel) with
  * one codegen'd early-exit loop; position arithmetic bit-identical to the
  * Column form, so pruning sets are unchanged.
  */
case class BloomMightContain(left: Expression, right: Expression, k: Int, mBits: Int)
    extends BinaryExpression {
  require(k >= 1 && mBits >= 64 && (mBits & (mBits - 1)) == 0,
    "k >= 1 and mBits a power of two >= 64")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(words: Any, key: Any): Any =
    HashPrimitives.bloomMightContain(
      words.asInstanceOf[ArrayData], key.asInstanceOf[Long], k, mBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, c) =>
      s"graft.functions.expressions.HashPrimitives.bloomMightContain($w, $c, $k, $mBits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}

/** LSH band keys over a MinHash signature (array<long> → array<string>,
  * length `bands`) — see [[HashPrimitives.minhashBandKeys]] for the
  * byte-identity argument vs the HOF form. */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1, "bands and rowsPerBand must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashPrimitives.minhashBandKeys(v.asInstanceOf[ArrayData], bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashPrimitives.minhashBandKeys($c, $bands, $rowsPerBand)")
  override protected def withNewChildInternal(c: Expression): MinHashBandKeys = copy(child = c)
}

/** 48-bit SimHash over a pre-hashed set (array<long> → long). */
case class SimHash48(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashPrimitives.simhash48(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HashPrimitives.simhash48($c)")
  override protected def withNewChildInternal(c: Expression): SimHash48 = copy(c)
}
