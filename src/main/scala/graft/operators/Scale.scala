package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale tooling: the shuffle-shaping utilities a 100 TB deployment leans on
  * (SURVEY.md §7.8). None of these change results — tests assert equality
  * with the naive plans — they change where rows go.
  *
  *   - salted aggregation: splits a hot grouping key across `buckets`
  *     partial groups, then combines — the classic two-phase fix when one
  *     key holds a large share of all rows and AQE's post-hoc split isn't
  *     enough (e.g. the df count of a stop-shingle-grade hot term).
  *   - salted join: replicates the dim side `buckets`× so a skewed fact key
  *     spreads over `buckets` reducers instead of melting one.
  *   - bucketed tables (see Tables.writeBucketed): co-located sort-merge
  *     joins with ZERO runtime exchange — the right layout for repeatedly
  *     joined fact tables.
  */
object Scale {

  /** `broadcast()` hint gated on the optimizer's size estimate. A hint is a
    * command, not a suggestion — an unconditional hint on a corpus-derived
    * side forces an executor OOM at 100× scale where the unhinted plan would
    * simply shuffle. Here the hint is applied only when Catalyst's own
    * estimate already fits the session's autoBroadcastJoinThreshold; when the
    * estimate is large (or broadcasting is disabled), the frame is returned
    * unhinted and AQE still converts the join to broadcast at runtime if the
    * ACTUAL size turns out small — so small inputs keep the broadcast plan
    * without large inputs ever being forced into one.
    */
  def maybeBroadcast(df: DataFrame): DataFrame = {
    val threshold = org.apache.spark.sql.GraftShim.broadcastThreshold(df)
    if (threshold > 0 &&
        org.apache.spark.sql.GraftShim.estimatedSizeInBytes(df) <= BigInt(threshold))
      broadcast(df)
    else df
  }

  /** Two-phase count per key. Salt = row id mod buckets: result-invariant
    * (any salt assignment yields the same final counts).
    */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Skew-safe equi-join of a (possibly hot-keyed) fact side with a dim
    * side: fact rows take salt = id mod buckets; the dim side is replicated
    * once per salt value; the join key becomes (key, salt). Result set is
    * identical to `fact.join(dim, factKey === dimKey)`.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedFact.join(saltedDim,
        col(factKey) === col(dimKey) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
