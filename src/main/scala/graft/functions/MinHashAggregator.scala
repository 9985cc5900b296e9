package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"): merges per-document
  * MinHash signatures into the signature of the UNION of their shingle sets
  * — elementwise min distributes over set union, so
  * agg(doc sigs) == sig(∪ docs' sets) exactly. This is the sketch a dedup
  * pipeline keeps per cluster/partition: fixed 8·n bytes of state no matter
  * how many documents merge, and merge() is associative+commutative, so
  * Spark's partial aggregation applies map-side like any built-in.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {
  /** Column form: `df.groupBy(...).agg(minhash_union(col("sig"), 64))`. */
  def minhashUnion(sig: Column, numHashes: Int): Column =
    udaf(new MinHashAggregator(numHashes)).apply(sig)
}
