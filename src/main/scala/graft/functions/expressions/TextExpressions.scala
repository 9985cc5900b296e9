package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass row kernels behind the custom expressions. Public + on a
  * plain object so whole-stage codegen can call the static forwarders
  * directly (`TextPrimitives.shingleSetData(s, k)` appears verbatim in the
  * generated Java).
  *
  * Semantics are EXACTLY the reference's (BookQuery.java:64-70): Java
  * `split("\\W+")` (leading empty token kept, trailing empties dropped),
  * k-gram join with single spaces, insertion-ordered set dedup. These
  * kernels replaced the HOF formulation in TextFunctions, which Catalyst
  * re-evaluated combinatorially (each element_at(tokens, i+j) re-ran the
  * regex split — one profiled task spent 300 s in Pattern.split at sf0.1).
  * Here: one split per row, one pass per shingle.
  */
object TextPrimitives {
  private val wordSplit = java.util.regex.Pattern.compile("\\W+")

  def tokenize(s: UTF8String): Array[String] = {
    val toks = wordSplit.split(s.toString)
    // Java split returns [""] for empty/all-delimiter input; normalize to []
    // (same downstream shingle behavior, saner token counts).
    if (toks.length == 1 && toks(0).isEmpty) Array.empty[String] else toks
  }

  def tokenizeData(s: UTF8String): ArrayData = {
    val toks = tokenize(s)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct k-shingles in first-seen order (HashSet parity — order is
    * irrelevant downstream, but determinism matters for oracles).
    */
  def shingleSetData(s: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(s)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - k + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** ALL k-shingles in order, duplicates kept — the multiset view the
    * repetition statistics need (dedup would erase exactly the signal).
    * Same single-pass discipline as [[shingleSetData]].
    */
  def shingleListData(s: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(s)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - k + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Portable polynomial rolling hash over UTF-16 chars (== code points for
    * BMP text; == DuckDB `ascii` per char for the ASCII corpora), mod 2^31-1.
    * Matches HashFunctions.portableHash31's HOF definition exactly.
    */
  def hash31(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) { acc = (acc * 31L + str.charAt(i)) % 2147483647L; i += 1 }
    acc
  }

  /** Independent base-37 sibling of [[hash31]] (the scalar form of the
    * second fold inside HashPrimitives.hashSet62). Exists for SCRAMBLING:
    * each fold alone is affine in the char values, so on short strings
    * (< ~6 chars the polynomial never wraps mod P) it is order-PRESERVING —
    * useless as a shuffle key. `(hash31(s) * hash37(s)) % P` wraps the
    * 62-bit product hundreds of times and kills that structure while
    * staying exact BIGINT arithmetic in any engine.
    */
  def hash37(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) { acc = (acc * 37L + str.charAt(i)) % 2147483647L; i += 1 }
    acc
  }
}

/** Java-split tokenizer as a native expression: `tokenize(text)`. */
case class Tokenize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextPrimitives.tokenizeData(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextPrimitives.tokenizeData($c)")
  override protected def withNewChildInternal(c: Expression): Tokenize = copy(c)
}

/** Distinct k-shingle set as a native expression: `shingle_set(text, k)`. */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextPrimitives.shingleSetData(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextPrimitives.shingleSetData($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
}

/** Non-distinct k-shingle list as a native expression — the multiset twin
  * of [[ShingleSet]] for repetition analysis. The HOF formulation
  * (`transform(sequence(...), i => concat_ws(element_at(tokens, ...)))`)
  * re-evaluates the tokenizer per element — the same O(tokens²) cliff the
  * set kernel replaced.
  */
case class ShingleList(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextPrimitives.shingleListData(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextPrimitives.shingleListData($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleList = copy(child = c)
}

/** Generator (UDTF) form of the shingler: one output row per distinct
  * k-shingle — `SELECT graft_shingle_explode(text, 3) FROM docs` or
  * `... LATERAL VIEW graft_shingle_explode(text, 3) t AS shingle`.
  * Completes the extension triple (UDF scalars above, the MinHash UDAF,
  * this UDTF). Generators run outside whole-stage codegen by design
  * (CodegenFallback) — the per-row kernel is still the single-pass
  * [[TextPrimitives.shingleSetData]].
  */
case class ShingleExplode(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr = TextPrimitives.shingleSetData(v.asInstanceOf[UTF8String], k)
      val n = arr.numElements()
      val out = new Array[InternalRow](n)
      var i = 0
      while (i < n) { out(i) = InternalRow(arr.getUTF8String(i)); i += 1 }
      out
    }
  }
  override protected def withNewChildInternal(c: Expression): ShingleExplode = copy(child = c)
}

/** Engine-portable rolling hash as a native expression: `hash31(text)`. */
case class PortableHash31(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextPrimitives.hash31(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextPrimitives.hash31($c)")
  override protected def withNewChildInternal(c: Expression): PortableHash31 = copy(c)
}

/** A trained BPE merge table preprocessed for single-pass application: the
  * pair→rank map plus the merged form per rank. Built once per plan on the
  * driver, shipped to executors as a codegen reference object — at serve
  * time the model is a broadcast-sized lookup structure, never a join and
  * never an O(merges)-deep expression tree (the literal replace-chain form
  * in TextAnalysis caps out around tens of merges; this is the 32k-vocab
  * mechanism).
  *
  * Application semantics are EXACTLY the replace chain's (spec-pinned in
  * BpeKernelSpec): the chain applies merge 1..n in training order, each as
  * a left-to-right non-overlapping token-pair rewrite. That sequential
  * order equals greedy lowest-rank-first application: merging rank i
  * creates a token first formed at step i, so every pair involving it was
  * necessarily learned LATER than i — a merge can never create a new
  * occurrence of a lower-ranked pair, hence once the minimal applicable
  * rank is exhausted it never reappears. The greedy loop is O(word_len)
  * scans per merge APPLIED to this word (≤ len−1, independent of table
  * size) instead of the chain's O(total merges) rewrites per word.
  */
final class BpeMergeTable(val merges: Seq[(String, String)]) extends Serializable {
  // The greedy ≡ sequential proof requires TRAINING ORDER: every
  // multi-char component of merge j must be the merged form of some
  // EARLIER merge i < j (tokens start as single chars; only merges create
  // multi-char tokens). A later-or-absent producer makes the pair dead in
  // the chain but firable by the greedy kernel once its producer runs —
  // the one shape where the two mechanisms disagree — so a table that was
  // reordered or hand-edited fails here instead of silently diverging.
  {
    val formedAt = new java.util.HashMap[String, Integer](merges.length * 2)
    var j = 0
    merges.foreach { case (a, b) =>
      Seq(a, b).foreach { c =>
        if (c.length > 1) {
          val i = formedAt.get(c)
          require(i != null && i.intValue() < j,
            s"merge table is not in training order: component '$c' of merge " +
              s"$j ('$a'+'$b') is not produced by any earlier merge — the " +
              "replace chain and the one-pass kernel would disagree on it")
        }
      }
      // duplicate merged forms (('c','ab') and ('ca','b') both → 'cab')
      // BREAK the greedy ≡ chain proof outright: when the later producer
      // fires it re-forms the token, and any pair ranked between the two
      // producers becomes applicable again — the chain already passed that
      // rank, the greedy kernel would fire it. No ordering argument saves
      // this shape, so such a table is refused here (serve it with the
      // replace chain, which defines the semantics).
      val prior = formedAt.putIfAbsent(a + b, Integer.valueOf(j))
      require(prior == null,
        s"merge table re-forms '${a + b}' at merge $j (first produced by " +
          s"merge $prior) — greedy one-pass application diverges from the " +
          "training-order chain on re-formed tokens; use the replace chain")
      j += 1
    }
  }
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    merges.foreach { case (a, b) =>
      // NUL separator (as an escape — a raw byte makes the file binary to
      // grep): tokens are \w-only, so the key is unambiguous
      m.putIfAbsent(a + "\u0000" + b, Integer.valueOf(i))
      i += 1
    }
    m
  }
  @transient private lazy val mergedForm: Array[String] =
    merges.map { case (a, b) => a + b }.toArray

  /** Tokens of `word` under the full merge table (greedy-by-rank ≡ the
    * training-order replace chain; see class doc). Single chars start.
    */
  def encode(word: String): Array[String] = {
    var toks = new Array[String](word.length)
    var i = 0
    while (i < word.length) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    var len = toks.length
    while (len >= 2) {
      // find the lowest-ranked adjacent pair present
      var best = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val r = ranks.get(toks(i) + "\u0000" + toks(i + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        i += 1
      }
      if (best == Int.MaxValue) len = -len // terminate
      else {
        // apply that one merge left-to-right non-overlapping (replace semantics)
        val (a, b) = merges(best)
        val ab = mergedForm(best)
        val out = new Array[String](len)
        var o = 0
        i = 0
        while (i < len) {
          if (i < len - 1 && toks(i) == a && toks(i + 1) == b) {
            out(o) = ab; o += 1; i += 2
          } else { out(o) = toks(i); o += 1; i += 1 }
        }
        toks = out
        len = o
      }
    }
    if (len < 0) len = -len
    val res = new Array[String](len)
    System.arraycopy(toks, 0, res, 0, len)
    res
  }

  def encodeData(w: UTF8String): ArrayData = {
    val toks = encode(w.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

}

/** `bpe_encode(word)` under a trained merge table — the whole-table
  * single-pass application kernel (see [[BpeMergeTable]]). Codegen is one
  * reference-object method call, so the expression stays inside
  * whole-stage codegen at any table size.
  */
case class BpeEncode(child: Expression, model: BpeMergeTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    model.encodeData(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeData($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}

/** Base-37 sibling fold: `hash37(text)` — see TextPrimitives.hash37. */
case class PortableHash37(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextPrimitives.hash37(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextPrimitives.hash37($c)")
  override protected def withNewChildInternal(c: Expression): PortableHash37 = copy(c)
}
