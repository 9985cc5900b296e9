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

  private val P31 = 2147483647L // 2^31 - 1, the portable-hash modulus

  /** The k bloom bit positions of a non-negative integer key: the same
    * (2i+1)·h + (12345 + 67891·i) mod 2³¹-1 permutation family the MinHash
    * signatures use (HashFunctions), reduced mod `mBits`. Pure integer
    * Column arithmetic — no sketch library, no UDF — so the filter stays in
    * whole-stage codegen AND an external engine can replay it bit-for-bit.
    */
  private[graft] def bloomPositions(key: Column, k: Int, mBits: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      pmod(pmod(key, lit(P31)) * (i * lit(2) + lit(1)) + (lit(12345L) + lit(67891L) * i),
        lit(P31)) % lit(mBits.toLong))

  /** Build a bloom filter over `dim`'s key column as ONE row holding the
    * DENSE array of mBits/64 64-bit words. Construction is an aggregation:
    * each key emits k bit positions, positions group by word index with
    * `bit_or` partial aggregation (map-side combine — the shuffle carries at
    * most mBits/64 (w, word) pairs per partition, never keys); the sparse
    * pairs densify in one final single-row projection so the probe side
    * indexes words directly (no per-probe map lookup).
    * Result-order-independent by construction (bit_or is commutative), so
    * the bloom is deterministic.
    */
  private[graft] def buildBloom(dim: DataFrame, dimKey: String, k: Int, mBits: Int): DataFrame =
    dim.select(explode(bloomPositions(col(dimKey), k, mBits)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy(col("w"))
      .agg(expr("bit_or(bit)").as("word"))
      .groupBy()
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("word"))).as("m"))
      .select(transform(sequence(lit(0), lit(mBits / 64 - 1)), w =>
        coalesce(element_at(col("m"), w.cast("int")), lit(0L))).as("bloom"))

  /** True iff every one of `key`'s k bloom bits is set. No false negatives
    * ever; false positives only widen the pruned set — callers re-verify
    * with the exact join. The probe is a native codegen Expression
    * ([[graft.functions.expressions.BloomMightContain]]): one early-exit
    * integer loop per fact row inside whole-stage codegen, replacing the
    * interpreted transform+forall kernel that dominated the round-5 bench.
    */
  private[graft] def bloomMightContain(bloom: Column, key: Column, k: Int, mBits: Int): Column = {
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    toColumn(graft.functions.expressions.BloomMightContain(
      toExpression(bloom), toExpression(key.cast("long")), k, mBits))
  }

  /** Shared count-min-with-exactness-audit kernel — ONE implementation of
    * the sketch scaffold `TextAnalysis.countMinAccuracy` (tokens) and
    * `Events.userHeavyHitters` (users) both run, so the portable cell
    * formula `(h·(2j+1) + (12345 + 67891·j)) mod 2³¹−1 mod width` — which
    * the DuckDB oracles replay bit-for-bit — lives in exactly one place
    * and cannot silently diverge between modalities. `exact` carries
    * (`keyCol`, exact_count); `hash` is the caller's portable non-negative
    * integer hash of the key. Output: (keyCol, exact_count, cm_estimate,
    * overestimate) for the exact top-`kTop` keys.
    */
  private[operators] def countMinAudit(exact: DataFrame, keyCol: String,
      hash: Column, width: Int, depth: Int, kTop: Int): DataFrame = {
    val withJ = exact
      .withColumn("h", hash)
      .select(col(keyCol), col("exact_count"), col("h"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("cell", expr(s"(h * (2*j + 1) + (12345 + 67891*j)) % 2147483647 % $width"))
    val cells = withJ.groupBy(col("j"), col("cell"))
      .agg(sum(col("exact_count")).as("c"))
    val probes = withJ.join(
      exact.orderBy(col("exact_count").desc, col(keyCol).asc).limit(kTop)
        .select(col(keyCol)), keyCol)
    probes.join(maybeBroadcast(cells), Seq("j", "cell"))
      .groupBy(col(keyCol))
      .agg(first(col("exact_count")).as("exact_count"), min(col("c")).as("cm_estimate"))
      .select(col(keyCol), col("exact_count"), col("cm_estimate"),
        (col("cm_estimate") - col("exact_count")).as("overestimate"))
  }

  /** KEY-COUNT-ADAPTIVE bloom width — the bloom twin of
    * `EmbeddingSearch.lshRowsPerBand`: the smallest power of two giving at
    * least `bitsPerKey` bits per dim key, clamped to [2^17, 2^27] (16 KiB –
    * 16 MiB — always broadcastable). Integer shift-and-compare, no floating
    * log2. Why: a FIXED width saturates as the dim grows — at k=5 hashes,
    * n/m = 1/16 keeps the false-positive rate ≈ 9·10⁻⁴ whether the dim has
    * 10³ or 10⁸ keys, so the pruned-set size tracks true matches instead of
    * degrading toward "keep everything" (the occupancy-cliff failure mode
    * the LSH sizing rule fixed, on the bloom axis). The one eager count()
    * a caller pays to use it is dim-side and metadata-scale.
    */
  def bloomBitsFor(nKeys: Long, bitsPerKey: Int = 16): Int =
    // compare via division — nKeys·bitsPerKey could overflow Long
    (17 to 27).map(1 << _).find(m => nKeys <= m.toLong / bitsPerKey).getOrElse(1 << 27)

  /** Bloom-pruned reduction of `fact` to (a superset of) the rows whose
    * `factKey` appears in `dim.dimKey` — Spark's runtime row-level filter,
    * spelled explicitly so the pruning is a declared, testable part of the
    * plan. THE case for it at 100 TB: the dim side is too big to broadcast
    * (so no BroadcastHashJoin and no storage-pushed DPP), but its KEY SET
    * compresses into a few-hundred-KB bloom — the fact side then drops
    * non-matching rows AT THE SCAN, before the join shuffle, turning a
    * 100 TB shuffle into a match-sized one. The bloom build itself is one
    * dim-side aggregation into ≤ mBits/64 words; the single-row result
    * broadcasts. Callers must still run the exact join on the survivors
    * (false positives pass the bloom) — results are bloom-invariant, which
    * is exactly what makes the operator oracle-checkable by a plain join.
    */
  def bloomPrunedFact(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      k: Int = 5, mBits: Int = 1 << 17): DataFrame = {
    val bloom = buildBloom(dim.select(col(dimKey)), dimKey, k, mBits)
    fact.crossJoin(broadcast(bloom))
      .where(bloomMightContain(col("bloom"), col(factKey), k, mBits))
      .drop("bloom")
  }

  /** BAND JOIN — the inequality join |left.val − right.val| ≤ eps with NO
    * equi key, executed as an equi-join: both sides bucket the value axis
    * into eps-wide bands (band = floor(v/eps)); the right side replicates
    * into its band and both neighbors, so any pair within eps lands in
    * exactly ONE shared band (|a−b| ≤ eps ⇒ |band(a)−band(b)| ≤ 1, and
    * left's band is fixed — no duplicate matches, no dedup pass). The
    * exact |a−b| ≤ eps filter then discards band false-positives, so the
    * result set is bucketing-invariant — which is what lets a plain
    * inequality join oracle it. Why it matters at 100 TB: Spark plans a
    * bare inequality join as BroadcastNestedLoop/cartesian — O(n·m) row
    * comparisons and a broadcast of a corpus-derived side; this shape is
    * one hash shuffle on the band key with 3× replication of ONE side.
    * Pick eps-granularity wisely: a value distribution concentrated in a
    * few bands recreates skew (then salt the band key — [[saltedJoin]]
    * composes, the band IS the key).
    */
  def bandJoin(left: DataFrame, right: DataFrame, leftVal: String, rightVal: String,
      eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(leftVal != rightVal,
      "bandJoin needs distinct value column names to apply the exact filter post-join")
    // Candidates come from intervalJoin (ONE banding kernel, one
    // replication guard), but the EXACT predicate stays |a−b| ≤ eps — the
    // form the inequality-join oracle computes. Routing the exact test
    // through containment a ∈ [b−eps, b+eps] is NOT equivalent under IEEE
    // arithmetic (fl(a−b) ≤ eps vs a ≥ fl(b−eps) can disagree on boundary
    // pairs, and b±eps forces decimal inputs through double early), so the
    // implicit intervals are WIDENED to [b−2eps, b+2eps]: the candidate
    // filter then has an eps-sized margin — astronomically larger than one
    // ulp — making the candidate set a strict superset of the abs-matches,
    // and the final abs filter (exact on decimals) decides membership.
    // Band width 2·eps over width-4·eps intervals replicates the right
    // side into ⌈2⌉+1 = 3 band rows: the classic band-and-both-neighbors
    // form. Banding never decides membership, so results stay
    // bucketing-invariant.
    // dataframe-qualified references, captured against the INPUT frames:
    // by-name col() would be ambiguous whenever the other side also
    // happens to carry a column with the same name
    val lv = left(leftVal)
    val rv = right(rightVal)
    val r2 = right
      .withColumn("__lo", rv - 2 * eps)
      .withColumn("__hi", rv + 2 * eps)
    intervalJoin(left, r2, leftVal, "__lo", "__hi", bandWidth = 2 * eps)
      .where(abs(lv - rv) <= eps)
      .drop("__lo", "__hi")
  }

  /** DATA-DERIVED band width for [[intervalJoin]]/[[bandJoin]] — the
    * band-join member of the engine's adaptive-sizing family
    * (`EmbeddingSearch.lshRowsPerBand`, [[bloomBitsFor]]): one
    * metadata-scale aggregate over the interval table (it is the SMALL
    * side — brackets, rate tables, IP ranges) derives
    *
    *   w = max(median interval width, max interval width / (maxReplication − 1))
    *
    * The MEDIAN keeps per-interval replication ≈ 2 for typical intervals
    * (⌈width/w⌉ ≈ 1–2 rows) while keeping probe buckets near
    * typical-interval granularity; the max/(maxReplication−1) FLOOR caps
    * the replication of the widest interval at `maxReplication` rows —
    * the −1 matters: an interval of width exactly (maxReplication)·w
    * ALWAYS spans maxReplication+1 bands (floor(x+k)−floor(x) = k for
    * integer k), so a floor of maxW/maxReplication would put the widest
    * interval exactly AT [[intervalJoin]]'s replication threshold with
    * zero margin (it tripped the guard outright before the guard gained
    * its one-band slack); dividing by maxReplication−1 keeps the widest
    * interval a full band below the threshold instead — so ONE
    * pathological catch-all interval (the [0, ∞)-ish default bracket every
    * real rate table has) cannot explode into millions of band rows when
    * the median is narrow. Results are banding-invariant (the exact
    * containment filter re-verifies), so the rule changes cost, never the
    * answer — the plain inequality join still oracles callers. Degenerate
    * input fails loudly: all-point intervals (every width 0) have no
    * usable band axis — that lookup is an equi-join, not a band join.
    */
  def bandWidthFor(intervals: DataFrame, loCol: String, hiCol: String,
      maxReplication: Int = 64): Double = {
    require(maxReplication >= 2, s"maxReplication must be >= 2, got $maxReplication")
    // widths cast to double IN the aggregate: integer/decimal interval
    // bounds (IP ranges, day-keyed validity intervals) would otherwise
    // come back as Long/Decimal and fail the driver-side reads
    val width = (col(hiCol) - col(loCol)).cast("double")
    val row = intervals.agg(
      expr(s"percentile(CAST($hiCol - $loCol AS DOUBLE), 0.5)").as("median_w"),
      max(width).as("max_w"),
      count(lit(1)).as("n")).head()
    require(row.getLong(2) > 0, "bandWidthFor: interval table is empty")
    val medianW = row.getDouble(0)
    val maxW = row.getDouble(1)
    require(maxW > 0,
      "bandWidthFor: every interval is a point (width 0) — a band join adds " +
        "nothing here; join on the value directly (equi-join)")
    math.max(medianW, maxW / (maxReplication - 1))
  }

  /** POINT-IN-INTERVAL lookup join — `points.p ∈ [intervals.lo, hi]` with
    * NO equi key: the IP-range / bracket-table / effective-dated-rate
    * lookup shape, generalizing [[bandJoin]] from fixed-eps proximity to
    * ARBITRARY-width intervals. Each interval replicates into every
    * `bandWidth`-wide band it overlaps (⌈width/w⌉+1 rows); each point
    * probes exactly its own band; the exact `lo ≤ p ≤ hi` filter discards
    * band false-positives, so the result is banding-invariant — a plain
    * inequality join oracles it. Why not Spark's default: a bare
    * range-predicate join plans as BroadcastNestedLoop/cartesian (O(n·m)
    * compares, corpus-side broadcast); this is one hash shuffle on the
    * band key. A point inside k overlapping intervals emits k rows (join
    * semantics, not first-match). `bandWidth` defaults to the
    * DATA-DERIVED [[bandWidthFor]] rule (median width, floored so the
    * widest interval replicates ≤ 64×); pass an explicit width only when
    * the distribution is known a priori. Either way a GUARD fails the job
    * loudly — at plan execution, no extra pass — if any interval would
    * replicate into more than `maxReplication`+1 bands (an explicit width
    * chosen badly against a pathological wide interval), instead of
    * silently materializing millions of band rows; the +1 is one band of
    * deliberate slack over the derived-width maximum, since band ids are
    * computed in doubles and a zero-margin threshold would turn boundary
    * rounding into a query-killing cliff. A skewed band composes
    * with [[saltedJoin]] — the band IS the key.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bandWidth: Double = Double.NaN,
      maxReplication: Int = 64): DataFrame = {
    val w =
      if (bandWidth.isNaN) bandWidthFor(intervals, loCol, hiCol, maxReplication)
      else bandWidth
    require(w > 0, s"bandWidth must be positive, got $w")
    val pb = points.withColumn("__band", floor(col(pointCol) / w).cast("long"))
    val loBand = floor(col(loCol) / w).cast("long")
    val hiBand = floor(col(hiCol) / w).cast("long")
    // fail-loud replication guard, evaluated per interval row inside the
    // plan: raise_error's NullType branch unifies with the band sequence.
    // STRICT inequality — one band of slack past the derived-width
    // maximum (span exactly maxReplication at the binding floor): the
    // band ids are computed in doubles, so an interval whose lo sits
    // within ulps of a band boundary can round one band wide; the guard
    // exists to stop RUNAWAY replication (thousands of rows), not to
    // litigate 64 vs 65, and a zero-margin threshold would turn that
    // rounding into a query-killing cliff on legitimate data
    val bands = when(hiBand - loBand > lit(maxReplication.toLong),
        raise_error(format_string(
          s"intervalJoin: interval [%s, %s] spans more than ${maxReplication + 1} " +
            s"bands at bandWidth=$w — widen bandWidth (or use bandWidthFor) " +
            "instead of replicating this interval into that many rows",
          col(loCol).cast("string"), col(hiCol).cast("string"))))
      .otherwise(sequence(loBand, hiBand))
    val ib = intervals.withColumn("__band", explode(bands))
    // frame-qualified references: by-name col() would be ambiguous if the
    // other side happens to carry a column with the same name
    pb.join(ib, "__band")
      .where(points(pointCol) >= intervals(loCol) && points(pointCol) <= intervals(hiCol))
      .drop("__band")
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
