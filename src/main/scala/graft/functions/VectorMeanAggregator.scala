package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact per-dimension mean of fixed-width double vectors — the centroid
  * update of IVF/k-means as ONE aggregation of fixed-width state, replacing
  * the posexplode → groupBy(key, dim) → collect_list/array_sort formulation
  * (which blows every row into `dims` shuffle rows and pays a second
  * shuffle to reassemble vectors).
  *
  * Exactness discipline: inputs must be pre-rounded to 6 dp (the engine's
  * standard `round(x, 6)`); each component is then an exact multiple of
  * 10⁻⁶ and is accumulated as a SCALED LONG (x·10⁶ — exact integer
  * arithmetic, associative and commutative, so Spark's map-side partial
  * aggregation applies and the result is identical under any partitioning).
  * finish() converts the scaled sum through BigDecimal(sum, 6) — the same
  * correctly-rounded decimal→double conversion as the
  * `sum(decimal).cast(double)` it replaces — then divides by the count, so
  * results are BIT-IDENTICAL to the decimal formulation (and the DuckDB
  * oracle). Overflow headroom: |x| ≤ ~10³ scaled to ≤ 10⁹ leaves room for
  * ~10⁹ rows per group before a Long could wrap.
  *
  * Dimensionality is taken from the first vector seen (state: dims longs +
  * a count, regardless of group size); mismatched widths fail loudly.
  */
class VectorMeanAggregator
    extends Aggregator[Seq[Double], VectorMeanAggregator.Buf, Seq[Double]] {
  import VectorMeanAggregator.Buf

  override def zero: Buf = Buf(Array.emptyLongArray, 0L)

  override def reduce(buf: Buf, v: Seq[Double]): Buf = {
    // fail-loudly discipline: a null array would NPE opaquely mid-task, and
    // a non-finite component would round to Long.MaxValue and silently
    // poison the sum — neither is a vector this aggregate can mean
    require(v != null, "vectorMean: null vector (filter nulls before aggregating)")
    val sums = if (buf.n == 0L) new Array[Long](v.length) else buf.sums
    require(v.length == sums.length,
      s"vectorMean: mixed dimensionality (${v.length} vs ${sums.length})")
    var i = 0
    while (i < sums.length) {
      val x = v(i)
      require(java.lang.Double.isFinite(x), s"vectorMean: non-finite component $x at dim $i")
      // input is pre-rounded@6 -> x*1e6 is within half an ulp of an integer
      sums(i) += math.round(x * 1e6)
      i += 1
    }
    Buf(sums, buf.n + 1)
  }

  override def merge(a: Buf, b: Buf): Buf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      require(a.sums.length == b.sums.length,
        s"vectorMean: mixed dimensionality (${a.sums.length} vs ${b.sums.length})")
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      Buf(a.sums, a.n + b.n)
    }

  override def finish(buf: Buf): Seq[Double] =
    buf.sums.toSeq.map(s =>
      java.math.BigDecimal.valueOf(s, 6).doubleValue() / buf.n.toDouble)

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorMeanAggregator {
  case class Buf(sums: Array[Long], n: Long)

  /** Column form: `df.groupBy(key).agg(vectorMean(col("v")).as("cv"))`.
    * `v` must be array<double> pre-rounded to 6 dp.
    */
  def vectorMean(v: Column): Column =
    udaf(new VectorMeanAggregator).apply(v)
}
