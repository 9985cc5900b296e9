package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k selection by (score DESC, id ASC) — the
  * scale-correct replacement for `row_number() OVER (PARTITION BY group
  * ORDER BY ...) <= k` when a group can be corpus-sized: the window sorts
  * every member of every group (and a handful of huge groups serialize
  * onto a handful of tasks), while this aggregator carries O(k) state per
  * group and combines map-side, so the shuffle is `partitions × groups × k`
  * tiny rows no matter how hot a group gets. The caller posexplodes the
  * result — the array index IS the rank, no window anywhere.
  *
  * Ordering replicates Spark's total order on doubles (NaN ranks above
  * every numeric and equal to itself; ±0.0 compare equal under primitive
  * operators), so results match what the window formulation would emit —
  * asserted against it in EmbeddingSpec.
  *
  * Precondition: score and id must be NON-NULL (the typed (Double, Long)
  * encoder rejects nulls at runtime, where `row_number()` would sort them
  * last and complete) — a caller migrating a window over nullable scores
  * must filter or coalesce them first, explicitly.
  *
  * `dedupIds = true` additionally collapses EXACT duplicate (score, id)
  * rows to one — the `distinct() → window` replacement for candidate
  * streams whose duplicates re-derive the same deterministic score (the
  * NN-descent expansion: the same (vertex, candidate) pair reached via
  * several intermediates always re-scores to the same rounded cosine), so
  * the upstream distinct's Exchange can be dropped and the collapse rides
  * the aggregation that was already required. Duplicate-equality is
  * BITWISE on the score (doubleToRawLongBits) — same-expression
  * duplicates are bit-identical by determinism; two rows with the same id
  * but genuinely different scores are NOT merged (callers owning that
  * invariant get it pinned by their own specs).
  */
class TopKByScoreAggregator(k: Int, dedupIds: Boolean = false)
    extends Aggregator[(Double, Long), TopKByScoreAggregator.Buf, Seq[(Double, Long)]] {
  import TopKByScoreAggregator.Buf
  require(k >= 1, s"topKByScore: k >= 1, got $k")

  private def sameRow(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    ia == ib && java.lang.Double.doubleToRawLongBits(sa) ==
      java.lang.Double.doubleToRawLongBits(sb)

  // (sa, ia) ranks strictly better than (sb, ib): higher score first,
  // NaN above every numeric, ties by lower id
  private def better(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    if (sa != sa) sb == sb || ia < ib
    else if (sb != sb) false
    else if (sa > sb) true
    else if (sa < sb) false
    else ia < ib

  override def zero: Buf = Buf(Array.emptyDoubleArray, Array.emptyLongArray)

  override def reduce(buf: Buf, in: (Double, Long)): Buf = {
    val n = buf.ids.length
    val (s, id) = in
    if (n == k && !better(s, id, buf.scores(n - 1), buf.ids(n - 1))) buf
    else {
      var p = n
      while (p > 0 && better(s, id, buf.scores(p - 1), buf.ids(p - 1))) p -= 1
      // insertion point p: the scan stopped because `in` is NOT better than
      // buf(p-1) — under the strict total order that means buf(p-1) is
      // strictly better OR the same row, so a duplicate can only sit at p-1
      // (everything at p.. is strictly worse than `in`)
      if (dedupIds && p > 0 && sameRow(s, id, buf.scores(p - 1), buf.ids(p - 1))) buf
      else if (n == k) {
        // full buffer: the evicted row is the current worst — shift the
        // tail down IN PLACE (steady state allocates nothing per row)
        var q = n - 1
        while (q > p) {
          buf.scores(q) = buf.scores(q - 1); buf.ids(q) = buf.ids(q - 1); q -= 1
        }
        buf.scores(p) = s; buf.ids(p) = id
        buf
      } else {
        val ss = new Array[Double](n + 1)
        val is = new Array[Long](n + 1)
        System.arraycopy(buf.scores, 0, ss, 0, p)
        System.arraycopy(buf.ids, 0, is, 0, p)
        ss(p) = s; is(p) = id
        System.arraycopy(buf.scores, p, ss, p + 1, n - p)
        System.arraycopy(buf.ids, p, is, p + 1, n - p)
        Buf(ss, is)
      }
    }
  }

  override def merge(a: Buf, b: Buf): Buf =
    if (a.ids.isEmpty) b
    else if (b.ids.isEmpty) a
    else {
      val m = math.min(a.ids.length + b.ids.length, k)
      val ss = new Array[Double](m)
      val is = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m && (i < a.ids.length || j < b.ids.length)) {
        // a duplicated row sits at BOTH heads simultaneously (sorted
        // inputs, strict order): consume the b copy silently
        if (dedupIds && i < a.ids.length && j < b.ids.length &&
            sameRow(a.scores(i), a.ids(i), b.scores(j), b.ids(j))) { j += 1 }
        else {
          val takeA = j >= b.ids.length || (i < a.ids.length &&
            better(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
          if (takeA) { ss(o) = a.scores(i); is(o) = a.ids(i); i += 1 }
          else { ss(o) = b.scores(j); is(o) = b.ids(j); j += 1 }
          o += 1
        }
      }
      if (o == m) Buf(ss, is)
      else Buf(java.util.Arrays.copyOf(ss, o), java.util.Arrays.copyOf(is, o))
    }

  override def finish(buf: Buf): Seq[(Double, Long)] =
    buf.scores.toSeq.zip(buf.ids.toSeq)

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKByScoreAggregator {
  case class Buf(scores: Array[Double], ids: Array[Long])

  /** Column form: `df.groupBy(g).agg(topKByScore(k)(col("score"), col("id")))`
    * — an array<struct<_1: score, _2: id>> of the group's top k, best first.
    */
  def topKByScore(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScoreAggregator(k)).apply(score, id)

  /** Column form with exact-duplicate collapse (see `dedupIds` above):
    * top k DISTINCT (score, id) rows per group, best first.
    */
  def topKByScoreDistinct(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScoreAggregator(k, dedupIds = true)).apply(score, id)
}
