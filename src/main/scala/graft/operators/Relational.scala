package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** General relational operator surface over the TPC-H-ish star schema:
  * aggregation, multi-way joins, windows, top-k, set ops, rollup, distinct
  * aggregates, semi/anti joins. The reference has none of these beyond its
  * one hard-coded pipeline (SURVEY.md §2.2) — this is the "complete engine"
  * surface a user would expect, expressed so Catalyst gets full visibility:
  * filters sit directly on scans (predicate pushdown to parquet), small dims
  * are broadcast, and every aggregate runs partial map-side.
  *
  * Float discipline: every SUM over a money-like double is computed in
  * DECIMAL (exact, associative — deterministic under any partition order and
  * bit-identical across engines) and cast back to double at the end.
  * `dsum`/`davg` encapsulate the pattern.
  */
object Relational {

  /** Exact, order-insensitive sum of a 2-decimal double column. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  private def davg(c: Column): Column =
    (sum(c.cast("decimal(18,2)")).cast("double") / count(c).cast("double"))

  /** ext·(1−disc) computed exactly in decimal. */
  private def discPrice(ext: Column, disc: Column): Column =
    ext.cast("decimal(18,2)") * (lit(1).cast("decimal(5,2)") - disc.cast("decimal(5,2)"))

  /** TPC-H Q1-shaped pricing summary: filter → grouped decimal aggregates.
    * Shipdate predicate pushes to the parquet scan.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= to_timestamp(lit("1999-12-31")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount"))
          * (lit(1).cast("decimal(5,2)") + col("l_tax").cast("decimal(5,2)"))).cast("double").as("sum_charge"),
        round(davg(col("l_quantity")), 6).as("avg_qty"),
        round(davg(col("l_extendedprice")), 6).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped shipping priority: 3-way join (customer broadcast —
    * smallest side), grouped revenue, deterministic top 10.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).where(col("o_orderdate") < to_timestamp(lit("1996-07-01")))
    val li = Tables.lineitem(spark, dir).where(col("l_shipdate") > to_timestamp(lit("1996-07-01")))
    // li ⋈ ord is fact-to-fact: leave the strategy to Catalyst/AQE (broadcast
    // at test SF, sort-merge on l_orderkey at cluster scale). customer is the
    // dim side — broadcast explicitly.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .select(col("l_orderkey"), unix_timestamp(col("o_orderdate")).as("order_epoch"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Per-order revenue over PRE-BUCKETED orders/lineitem — the co-located
    * layout demo: both tables are materialized bucketed+sorted on the join
    * key ([[Tables.bucketedTable]]), so the sort-merge join AND the
    * per-order aggregation plan with ZERO runtime exchanges (PlanSpec-
    * asserted) — the scan IS the shuffle, paid once at write time. The
    * `merge` hint keeps the plan the bucketed SMJ a 100 TB fact-to-fact
    * join runs instead of the broadcast join the test SF would pick —
    * lineitem never broadcasts at scale. Result-identical to the plain
    * join on the unbucketed parquet (that is the oracle).
    */
  def bucketedOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.table(Tables.bucketedTable(spark, dir, "orders", "o_orderkey"))
    val l = spark.table(Tables.bucketedTable(spark, dir, "lineitem", "l_orderkey"))
    o.where(col("o_orderdate") >= to_timestamp(lit("2001-01-01")))
      .join(l.hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Supplier-nation revenue through the SKEW-SAFE join
    * ([[Scale.saltedJoin]]): fact rows take a salt, the supplier dim is
    * replicated once per salt value, and the join key becomes
    * (suppkey, salt) — so a hot supplier key (the one-vendor-dominates
    * shape AQE's post-hoc split can't always save) spreads over `buckets`
    * reducers. Salting replicates only the DIM side (structurally small)
    * and never changes results — the oracle is the plain join.
    */
  def saltedSupplierRevenue(spark: SparkSession, dir: String): DataFrame =
    Scale.saltedJoin(Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
        "l_suppkey", "s_suppkey", buckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** Per-part revenue for a selective part subset, with the fact side
    * BLOOM-PRUNED before the join ([[Scale.bloomPrunedFact]]): the filtered
    * part keys build a bloom in one dim-side aggregation, the lineitem scan
    * drops non-candidate rows behind a codegen'd integer predicate, and only
    * the survivors enter the exact join + aggregation. At this SF the dim
    * would broadcast anyway; the operator is the 100 TB shape where the dim
    * does NOT fit the broadcast threshold but its key-set bloom does — the
    * join shuffle then carries the match volume, not the corpus. Results are
    * bloom-invariant (the exact join re-verifies every survivor), so the
    * oracle is the plain join.
    */
  def bloomPartRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.part(spark, dir).where(col("p_size") === 1)
    // width from the dim's key count (Scale.bloomBitsFor) — the FP rate
    // then holds ≈ 9·10⁻⁴ at any dim size instead of saturating; results
    // are bloom-invariant, so the sizing changes cost, never the answer
    val mBits = Scale.bloomBitsFor(dim.count())
    Scale.bloomPrunedFact(Tables.lineitem(spark, dir), dim, "l_partkey", "p_partkey",
        mBits = mBits)
      .join(Scale.maybeBroadcast(dim), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_brand"))
      .agg(
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Customer–supplier pairs with account balances within `eps` of each
    * other — a pure BAND JOIN ([[Scale.bandJoin]]): no equi key exists, so
    * the value band becomes the join key (one hash shuffle, 3×
    * replication of the small side — band and both neighbors)
    * instead of the cartesian
    * BroadcastNestedLoop Spark would plan for the bare inequality. The
    * banding is result-invariant, so the oracle is the plain inequality
    * join. Output: (c_custkey, s_suppkey, c_acctbal, s_acctbal).
    */
  def acctbalBandPairs(spark: SparkSession, dir: String, eps: Double = 2.0): DataFrame =
    Scale.bandJoin(
      Tables.customer(spark, dir).select(col("c_custkey"), col("c_acctbal")),
      Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_acctbal")),
      "c_acctbal", "s_acctbal", eps)
      .select(col("c_custkey"), col("s_suppkey"), col("c_acctbal"), col("s_acctbal"))

  /** TPC-H Q21-shaped "waiting suppliers": suppliers who were the SOLE
    * late shipper in a multi-supplier order (late := shipped more than
    * `lateDays` after the order date). The textbook formulation is a
    * DOUBLE correlated subquery (EXISTS another supplier / NOT EXISTS
    * another LATE supplier) — planned as two extra scans + semi/anti
    * self-joins of the fact table. Here it is DECORRELATED BY AGGREGATION:
    * one pass computes per-(order, supplier) lateness, one order-keyed
    * aggregate derives (n_suppliers, n_late_suppliers, the sole late
    * suppkey), and the predicate `n_supp ≥ 2 ∧ n_late = 1` replaces both
    * subqueries — lineitem is scanned ONCE, and the two order-keyed
    * aggregates share ONE explicit exchange on l_orderkey (hash
    * partitioning on the order key satisfies both grouping clusterings,
    * so neither groupBy adds a shuffle — plan-visible in PLANS.md). The
    * oracle deliberately keeps the EXISTS/NOT-EXISTS
    * form, so the decorrelation itself is under the hash gate. Output:
    * (s_suppkey, s_name, numwait) — numwait counts orders.
    */
  def waitingSuppliers(spark: SparkSession, dir: String, lateDays: Int = 60): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val perSupp = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), 1)
          .otherwise(0).as("late"))
      // ONE exchange on l_orderkey serves BOTH aggregates below:
      // HashPartitioning(l_orderkey) satisfies the (l_orderkey, l_suppkey)
      // clustering too, so neither groupBy re-shuffles (PLANS.md row)
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(col("late")).as("n_late"),
        max(when(col("late") === 1, col("l_suppkey"))).as("sole_late_supp"))
    perOrder.where(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("sole_late_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(Scale.maybeBroadcast(
        Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))), "s_suppkey")
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  /** TPC-H Q5-shaped local-supplier revenue: 6-way join through the star,
    * dims broadcast, revenue per nation.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
             col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    // Fact-to-fact joins (li ⋈ ord ⋈ cust) stay strategy-free for AQE;
    // supplier and nation are true dims → broadcast.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
                             col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Deterministic top-k: 10 highest-value orders (tie-break o_orderkey).
    * TakeOrderedAndProject — no full sort, no full shuffle of the table.
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Window functions: per-customer order sequence with running spend
    * (exact decimal running sum) and days since previous order.
    */
  def customerOrderWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("rn"),
        col("running_spend"), col("days_since_prev"))
  }

  /** Statistical moments computed EXACTLY: mean/variance/stddev per order
    * priority from decimal moment sums (Σx, Σx²) rather than the built-in
    * stddev aggregate — the built-ins accumulate doubles in partition
    * order, so their low bits are nondeterministic under repartitioning
    * AND disagree across engines; moment sums are associative decimals,
    * and the final division/sqrt is one double expression both engines
    * evaluate identically. The same map-side-combinable one-shuffle shape
    * as any sum.
    */
  def orderStats(spark: SparkSession, dir: String): DataFrame = {
    val x = col("o_totalprice").cast("decimal(18,2)")
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_price"),
        sum((x * x).cast("decimal(38,4)")).cast("double").as("sum_sq"))
      .select(col("o_orderpriority"), col("n"),
        round(col("sum_price") / col("n"), 6).as("mean_price"),
        round((col("sum_sq") - col("sum_price") * col("sum_price") / col("n")) / col("n"), 4)
          .as("var_pop"),
        round(sqrt((col("sum_sq") - col("sum_price") * col("sum_price") / col("n")) / col("n")), 6)
          .as("stddev_pop"))
  }

  /** Fixed-width histogram of order values — integer bucket arithmetic
    * (floor((x - lo) / step) clamped to [0, nBuckets-1]), so the bucketing
    * is bit-portable where width_bucket built-ins may differ on edge
    * semantics. One map-side bucket projection + one count shuffle.
    */
  def orderValueHistogram(spark: SparkSession, dir: String,
      lo: Double = 0.0, step: Double = 50000.0, nBuckets: Int = 12): DataFrame =
    Tables.orders(spark, dir)
      .select(least(greatest(
          floor((col("o_totalprice") - lo) / step).cast("long"), lit(0L)),
          lit(nBuckets - 1L)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"))

  /** Shipping-delay distribution per order priority — the operational-SLA
    * query shape: an exact integer DAY delta between two timestamps from
    * DIFFERENT tables (lineitem ship vs. its order's date), rolled up with
    * exact counts and interpolated percentiles. The join is the standard
    * fact-fact orderkey join (strategy-free for AQE); day deltas are
    * tz-free integer epoch-day arithmetic, so the histogram is bit-exact.
    * Output: (o_orderpriority, n_items, min_days, max_days, avg_days_e3,
    * p50_days, p95_days).
    */
  def shippingDelay(spark: SparkSession, dir: String): DataFrame = {
    // TIMESTAMP_NTZ → DATE is a tz-free truncation (fixtures carry no
    // time-of-day), so datediff gives the exact integer epoch-day delta.
    val delta = expr(
      "cast(datediff(cast(l_shipdate as date), cast(o_orderdate as date)) as bigint)")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), delta.as("delay_days"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        min(col("delay_days")).as("min_days"),
        max(col("delay_days")).as("max_days"),
        // milli-day mean as exact integer division of exact integer sums
        expr("sum(delay_days) * 1000 div count(1)").as("avg_days_e3"),
        round(expr("percentile(delay_days, 0.5)"), 2).as("p50_days"),
        round(expr("percentile(delay_days, 0.95)"), 2).as("p95_days"))
  }

  /** Join-key SKEW profile — the distribution diagnostic run before
    * planning any big join: for a fact-side key, how many keys carry n
    * rows (the group-size histogram), log2-bucketed so the tail is
    * readable at any scale. A heavy head bucket says "salt this key or
    * lean on AQE skew-join" ([[Scale.saltedJoin]]); the profile itself is
    * two aggregations (per-key count — the same shuffle the join would do —
    * then a log-bucket rollup over KEYS, which is far smaller than rows).
    * Output: (size_bucket_lo, n_keys, n_rows, max_key_rows).
    */
  def joinKeySkew(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .groupBy(expr("CAST(pow(2, floor(log2(n))) AS BIGINT)").as("size_bucket_lo"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        max(col("n")).as("max_key_rows"))

  /** NULL-semantics suite: ANSI null behavior pinned end to end on derived
    * nullable columns (nullif) — NULL as a grouping key (its own group),
    * count(col) vs count(*) (null-skipping), null-skipping DISTINCT
    * counts, and NULL-SAFE equality (`<=>` ≡ IS NOT DISTINCT FROM, where
    * NULL<=>NULL is TRUE, unlike `=`'s UNKNOWN). Engines disagree on these
    * edges more than anywhere else in SQL; the hash gate makes the
    * agreement explicit. Output per status group (incl. the NULL group):
    * (status_n, n_rows, n_pri, n_distinct_pri, n_nullsafe_eq, n_plain_eq).
    */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        nullif(col("o_orderstatus"), lit("O")).as("status_n"),
        nullif(col("o_orderpriority"), lit("1-URGENT")).as("pri_n"))
      .groupBy(col("status_n"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("pri_n")).as("n_pri"),
        countDistinct(col("pri_n")).as("n_distinct_pri"),
        sum(when(col("status_n") <=> col("pri_n"), 1L).otherwise(0L)).as("n_nullsafe_eq"),
        sum(when(col("status_n") === col("pri_n"), 1L).otherwise(0L)).as("n_plain_eq"))

  /** EQUI-DEPTH histogram — [[orderValueHistogram]]'s fixed-width buckets
    * replaced by ntile quantile buckets (equal row counts, data-driven
    * boundaries): the summary an optimizer or data profiler keeps for a
    * skewed value column, where fixed-width buckets would collapse into
    * one hot bin. Ordering ends on the unique o_orderkey, so bucket
    * membership is deterministic on both engines. One global-sort window
    * (the documented cost: ntile needs a total order — at 100 TB the
    * sampled sketch in [[approxStats]] is the cheap path; this is the
    * exact one). Output: (bucket, n_orders, lo, hi, sum_price).
    */
  def orderValueEquidepth(spark: SparkSession, dir: String,
      nBuckets: Int = 8): DataFrame = {
    val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        dsum(col("o_totalprice")).as("sum_price"))
  }

  /** The RANK-FAMILY window surface (ntile / percent_rank / cume_dist /
    * first_value / lead) over a per-customer total order — the quantile-
    * bucketing and relative-position shapes a feature pipeline derives per
    * entity. Determinism discipline as everywhere: the ORDER BY ends on the
    * unique o_orderkey, percent_rank/cume_dist are integer-derived rationals
    * rounded identically in both engines, and lead carries an explicit
    * default instead of a NULL. One shuffle on o_custkey.
    */
  def windowFunctionSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .where(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("o_orderkey")).over(w).as("first_key"),
        lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"))
  }

  /** Value-RANGE window frame: each order sees the customer's exact
    * (decimal-summed) spend and order count over the PRECEDING 30 days
    * inclusive — the trailing-aggregate shape row-count frames cannot
    * express (orders per window vary). RANGE frames are tie-safe by
    * construction: the frame is defined by the ORDER BY VALUE, so rows
    * sharing an order date share a frame and the result is deterministic
    * under any partitioning. One shuffle on o_custkey.
    */
  def trailingSpend(spark: SparkSession, dir: String): DataFrame = {
    val sec30d = 30L * 86400L
    val w = Window.partitionBy("o_custkey").orderBy(col("order_epoch"))
      .rangeBetween(-sec30d, 0L)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"),
        col("o_totalprice"))
      .withColumn("trailing_spend",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .withColumn("trailing_orders", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("order_epoch"),
        col("trailing_spend"), col("trailing_orders"))
  }

  /** Relational set ops: customers active in 1995 vs 1996 — INTERSECT /
    * EXCEPT / union, tagged.
    */
  def customerSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def active(year: Int): DataFrame = ord
      .where(col("o_orderdate") >= to_timestamp(lit(f"$year-01-01")) &&
             col("o_orderdate") < to_timestamp(lit(f"${year + 1}-01-01")))
      .select(col("o_custkey"))
    val both = active(1995).intersect(active(1996)).select(lit("both").as("tag"), col("o_custkey"))
    val only95 = active(1995).except(active(1996)).select(lit("only_1995").as("tag"), col("o_custkey"))
    val only96 = active(1996).except(active(1995)).select(lit("only_1996").as("tag"), col("o_custkey"))
    both.unionAll(only95).unionAll(only96)
  }

  /** ROLLUP over (returnflag, linestatus): subtotal + grand-total rows. */
  def returnsRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** Exact distinct aggregates per return flag. */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** Anti join: customers that never ordered. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_custkey"))
    Tables.customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Semi join: parts that ever shipped in quantity > 45. */
  def partsWithBigShipments(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).where(col("l_quantity") > 45).select(col("l_partkey"))
    Tables.part(spark, dir)
      .join(li, col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
  }

  /** TPC-H Q7-shaped nation-pair trade volume: revenue flowing from each
    * supplier nation to each customer nation per ship year. The join tree
    * a 100 TB star query runs: the two fact joins (lineitem⋈orders,
    * ⋈customer) stay strategy-free for AQE (sort-merge on orderkey at
    * scale), supplier and the twice-joined nation dim broadcast. Output
    * rows are bounded by nations² × years regardless of fact volume.
    * Output: (supp_nation, cust_nation, ship_year, revenue, n_items).
    */
  def nationTradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .join(broadcast(nat.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18-shaped large-volume orders: orders whose TOTAL lineitem
    * quantity exceeds a threshold, with customer context. The HAVING runs
    * on the lineitem aggregate FIRST — one shuffle on l_orderkey reduces
    * the fact table to qualifying order keys before any join, so the
    * orders join carries only survivors (here ~2% of orders; the same
    * pre-aggregate-then-join order is what keeps this bounded at 100 TB —
    * joining first would ship every lineitem row twice). Customer is the
    * dim side → broadcast. Deterministic top-100 via TakeOrdered, never a
    * global sort. Output:
    * (c_custkey, c_name, o_orderkey, order_epoch, o_totalprice, total_qty).
    */
  def bigSpenderOrders(spark: SparkSession, dir: String, minQty: Double = 250.0): DataFrame = {
    val qual = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > minQty)
    Tables.orders(spark, dir)
      .join(qual, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q19-shaped bracket revenue: disjunctive (OR-of-ANDs) predicates
    * spanning both join sides — the shape that defeats naive pushdown.
    * What Catalyst does with it (and what this entry pins): the
    * part-only disjunction (brand/size) is NOT factored out by the
    * optimizer, but the join itself stays a plain broadcast equi-join on
    * p_partkey with the residual OR evaluated post-join inside codegen —
    * no nested-loop fallback (PlanSpec asserts no BNLJ). Revenue per
    * brand bracket. Output: (p_brand, n_items, revenue).
    */
  def bracketRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pt = Tables.part(spark, dir)
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
  }

  /** TPC-H Q22-shaped idle high-balance customers: customers whose balance
    * beats the global positive-balance average AND who placed no order
    * after a cutoff, rolled up per nation. Composition of the two scalar
    * shapes that matter at scale: the global average is a 1-row aggregate
    * CROSS-joined back (broadcast by construction — never a correlated
    * per-row subquery), and "no recent order" is a LEFT ANTI join against
    * the date-filtered orders (the filter pushes to the orders scan, so
    * the anti-join's build side is only recent orders). The avg is the
    * exact decimal-sum/count double division both engines replay
    * bit-identically, making the > comparison portable. Output:
    * (c_nationkey, n_custs, sum_bal).
    */
  def idleRichCustomers(spark: SparkSession, dir: String,
      cutoff: String = "2000-01-01"): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.where(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= to_timestamp(lit(cutoff)))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"), dsum(col("c_acctbal")).as("sum_bal"))
  }

  /** Percent-of-total (ratio_to_report) — each nation's share of its
    * REGION's supplier revenue: grouped decimal revenue, then one window
    * sum over the tiny aggregate (25 nations), never over fact rows. The
    * share ships as integer ppm of exact cent totals (cents·10⁶ div
    * region cents), so the ratio is bit-exact across engines. Output:
    * (region, nation, revenue, share_ppm).
    */
  def revenueShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), discPrice(col("l_extendedprice"), col("l_discount")).as("rev"))
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    // rev carries scale 4 (2-dp price × 2-dp discount factor), so ×10⁴ is
    // an INTEGER exactly — fixed-point with zero rounding on either engine
    val byNation = li
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg((sum(col("rev")) * 10000).cast("long").as("revenue_e4"))
    val w = Window.partitionBy("region")
    byNation
      .select(col("region"), col("nation"), col("revenue_e4"),
        sum(col("revenue_e4")).over(w).as("region_e4"))
      .select(col("region"), col("nation"), col("revenue_e4"),
        expr("revenue_e4 * 1000000 div region_e4").as("share_ppm"))
  }

  /** TPC-H Q10-shaped returned-item reporting: revenue lost to returns per
    * customer over one quarter, top 20. The plan a 100 TB star query wants:
    * the o_orderdate range filter pushes to the orders SCAN (partition/
    * row-group pruning at scale) and the returnflag filter to the lineitem
    * scan BEFORE the fact-fact join on orderkey; customer and nation are
    * dim sides → broadcast. Revenue is the exact decimal sum cast to
    * double; top-20 via TakeOrdered (never a global sort), revenue desc
    * with c_custkey tiebreak so the cut is deterministic in both engines.
    * Output: (c_custkey, c_name, c_acctbal, nation, revenue).
    */
  def returnedItemCustomers(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val li = Tables.lineitem(spark, dir).where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        discPrice(col("l_extendedprice"), col("l_discount")).as("rev"))
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name").as("nation"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q14-shaped promo revenue share per ship year: what fraction of
    * revenue came from promo-type parts. One fact scan, part broadcast,
    * and the share is conditional aggregation INSIDE one groupBy — never
    * two passes or a self-join. Fixed-point discipline (revenueShare's):
    * discounted price carries scale 4, so ×10⁴ totals are exact longs and
    * the ppm ratio is integer division — bit-identical in any engine.
    * Output: (ship_year, promo_e4, total_e4, promo_ppm).
    */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(
        (sum(when(col("p_type") === "PROMO",
          discPrice(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0)))
          * 10000).cast("long").as("promo_e4"),
        (sum(discPrice(col("l_extendedprice"), col("l_discount"))) * 10000)
          .cast("long").as("total_e4"))
      .select(col("ship_year"), col("promo_e4"), col("total_e4"),
        // ×10⁶ can overflow BIGINT on a big year — widen through
        // DECIMAL(38,0) for the integral division (exact, both engines)
        expr("CAST(CAST(promo_e4 AS DECIMAL(38,0)) * 1000000 DIV total_e4 AS LONG)")
          .as("promo_ppm"))
  }

  /** TPC-H Q6-shaped forecast revenue: the pure SCAN-PREDICATE aggregate —
    * a year of shipments in a discount band under a quantity cap, one row
    * out. The entire query is the scan: all three predicates reach the
    * parquet reader as pushed filters (PlanSpec asserts PushedFilters and
    * a 4-column ReadSchema), so at 100 TB the cost is row-groups whose
    * stats overlap the range — not the table. Revenue = Σ extprice·disc
    * as exact ×10⁴ cents-scale longs. Output: (n_items, revenue_e4).
    */
  def filteredRevenue(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_items"),
        (sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(5,2)")) * 10000)
          .cast("long").as("revenue_e4"))

  /** Point-in-interval LOOKUP join ([[Scale.intervalJoin]]) driven from a
    * deterministic variable-width bracket table: orders land in quadratic
    * price brackets [i²·2000, (i+1)²·2000] plus one deliberately
    * OVERLAPPING catch-all [0, 50000] (an order inside k intervals emits k
    * rows — join semantics, pinned by the oracle). The banding is
    * result-invariant, so the plain inequality join oracles it; at scale
    * this is the IP-range / rate-table shape: one hash shuffle instead of
    * the BroadcastNestedLoop a bare range predicate plans. The band width
    * is DATA-DERIVED ([[Scale.bandWidthFor]]: median observed bracket
    * width, floored so the widest bracket — the catch-all — replicates
    * ≤ 64×), the same once-per-snapshot sizing discipline as the LSH and
    * bloom rules: no caller-supplied constant to go stale as the bracket
    * table evolves. Output: (bracket_id, n_orders, sum_price).
    */
  def orderBracketLookup(spark: SparkSession, dir: String): DataFrame = {
    val brackets = spark.range(0, 11).select(
      col("id").as("bracket_id"),
      when(col("id") < 10, (col("id") * col("id")).cast("double") * 2000.0)
        .otherwise(0.0).as("lo"),
      when(col("id") < 10, ((col("id") + 1) * (col("id") + 1)).cast("double") * 2000.0)
        .otherwise(50000.0).as("hi"))
    Scale.intervalJoin(Tables.orders(spark, dir), brackets,
        "o_totalprice", "lo", "hi")
      .groupBy(col("bracket_id"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
  }

  /** TPC-H Q15-shaped top supplier: revenue per supplier over one quarter,
    * then the supplier(s) achieving the MAX — the aggregate-then-max-
    * join-back shape (SQL's scalar subquery over a derived view). The max
    * is a 1-row aggregate of the per-supplier aggregate, cross-joined back
    * (broadcast by construction) — never a global-order window over the
    * aggregate (total order on |suppliers| rows doesn't scale). The lazy
    * form references the per-supplier aggregate twice, so the static plan
    * carries two (pushdown-pruned) fact scans; the deployment form at
    * 100 TB persists the |suppliers|-row aggregate once and reads the fact
    * table once — same rule as the trained-quantizer entries (the
    * train-once/serve-many discipline). Revenue stays scale-4 fixed-point
    * (×10⁴ exact long) so the MAX comparison — equality against the
    * scalar! — is bit-portable; a double here could select different rows
    * per engine. Output: (s_suppkey, s_name, revenue_e4).
    */
  def topSupplier(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until))
      .groupBy(col("l_suppkey"))
      .agg((sum(discPrice(col("l_extendedprice"), col("l_discount"))) * 10000)
        .cast("long").as("revenue_e4"))
    val top = perSupp.agg(max(col("revenue_e4")).as("max_e4"))
    perSupp.join(broadcast(top), col("revenue_e4") === col("max_e4"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_e4"))
  }

  /** Data-quality constraint report — the dbt-test/Deequ-style validation
    * pass a pipeline runs before publishing a table: one row per declared
    * constraint with (n_checked, n_violations, passed). Each check is a
    * single aggregate (conditional sums, map-side partials) or a keyed
    * anti-join — nothing quadratic, nothing driver-side; the report is a
    * 5-row union of 1-row aggregates. The ship-after-order check is the
    * deliberately failing one on this data — a report where every row
    * passes can't prove the checks fire.
    */
  def constraintReport(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val li = Tables.lineitem(spark, dir)
    def row(name: String, checked: Column, viol: Column, src: DataFrame): DataFrame =
      src.agg(checked.as("n_checked"), viol.as("n_violations"))
        .select(lit(name).as("constraint"), col("n_checked"),
          col("n_violations"), (col("n_violations") === 0L).as("passed"))
    val pkUnique = row("orders_pk_unique",
      count(lit(1)), count(lit(1)) - countDistinct(col("o_orderkey")), ord)
    // anti join leaves only violators; n_checked is the full table count
    val fk = ord.join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(ord.agg(count(lit(1)).as("n_checked")))
      .select(lit("orders_fk_customer").as("constraint"), col("n_checked"),
        col("n_violations"), (col("n_violations") === 0L).as("passed"))
    val qty = row("lineitem_qty_range", count(lit(1)),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)), li)
    val nn = row("customer_name_not_null", count(lit(1)),
      sum(when(col("c_name").isNull, 1L).otherwise(0L)), cust)
    val shipAfter = row("lineitem_ship_after_order", count(lit(1)),
      sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L)),
      li.select(col("l_orderkey"), col("l_shipdate"))
        .join(ord.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey")))
    pkUnique.unionAll(fk).unionAll(qty).unionAll(nn).unionAll(shipAfter)
  }

  /** SCD2-style validity intervals built from the order history: each
    * customer's orders become consecutive [valid_from_day, valid_to_day)
    * records — valid_to is the NEXT order's day (exclusive) or the
    * 99999999 open-interval sentinel — the standard temporal-table build,
    * one per-customer lead() window (ties broken by order key). Day keys
    * are tz-free integers so both engines agree bit-exactly.
    */
  def customerOrderHistory(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("totalprice"),
        expr("unix_timestamp(o_orderdate) div 86400").as("day"))
      .select(col("o_custkey"), col("o_orderkey"), col("totalprice"),
        col("day").as("valid_from_day"),
        coalesce(lead(col("day"), 1).over(w), lit(99999999L)).as("valid_to_day"))
  }

  /** Point-in-time reconstruction (time travel) over the SCD2 history:
    * the version rows valid AS OF a cut day — the integer midpoint of the
    * observed day range, derived by one metadata-scale aggregate and
    * broadcast so the validity filter applies map-side. At 100 TB the
    * as-of read is a pure interval predicate: with the history laid out
    * by valid_from_day (the retention/z-order write discipline in
    * [[graft.operators.Maintenance]]) it prunes to the files straddling
    * the cut instead of scanning all of history. The interval columns are
    * kept so downstream auditing sees why a row qualified.
    */
  def scd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    val hist = customerOrderHistory(spark, dir)
    val asof = hist
      .agg(min(col("valid_from_day")).as("mn"), max(col("valid_from_day")).as("mx"))
      .selectExpr("(mn + mx) div 2 AS d")
    hist.crossJoin(broadcast(asof))
      .where(col("valid_from_day") <= col("d") && col("d") < col("valid_to_day"))
      .select(col("o_custkey"), col("o_orderkey"), col("totalprice"),
        col("valid_from_day"), col("valid_to_day"))
  }

  /** MERGE/upsert semantics composed Spark-natively (no table format
    * required): apply an updates table onto a base table by key — matched
    * keys take the update's values, unmatched updates insert, the rest of
    * the base passes through — as ONE full-outer join + coalesce, the
    * batch-upsert shape for plain-parquet pipelines. At 100 TB both sides
    * hash-partition on the key (one shuffle each); with the bucketed base
    * layout ([[bucketedOrderRevenue]]'s write-time discipline) the base
    * side's shuffle disappears. The demo derives base and updates
    * deterministically from orders: base = keys with last digit < 8,
    * updates = keys with last digit ≥ 5 revalued at +10 (so 5–7 are
    * matched-updates, 8–9 inserts, 0–4 untouched).
    * Output: (o_orderkey, o_orderstatus, totalprice, src).
    */
  def upsertOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    val base = ord.where(col("o_orderkey") % 10 < 8)
    val updates = ord.where(col("o_orderkey") % 10 >= 5)
      .select(col("o_orderkey"), lit("U").as("u_status"),
        (col("price") + lit(10).cast("decimal(18,2)")).as("u_price"))
    base.join(updates, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("u_status"), col("o_orderstatus")).as("o_orderstatus"),
        coalesce(col("u_price"), col("price")).cast("double").as("totalprice"),
        when(col("u_status").isNull, "base")
          .when(col("o_orderstatus").isNull, "inserted").otherwise("updated").as("src"))
  }

  /** Latest-wins apply of a keyed CDC changelog onto a base table — the
    * OTHER half of MERGE next to [[upsertOrders]]: where the upsert
    * coalesces ONE update batch two-sidedly, this replays an ARBITRARY
    * interleaving of upserts and tombstone DELETEs per key in sequence
    * order — the shape a binlog/Debezium ingest feeds. Base rows enter as
    * (op=U, seq=0); the highest-seq version per key wins; a winning
    * tombstone drops the key. ONE hash shuffle on the key (the window);
    * idempotent — re-applying the same changelog re-ranks identical rows
    * identically, so the result is a fixed point. At 100 TB the changes
    * batch is ≪ base, so cost is the base's one shuffle — which the
    * bucketed write-time layout ([[bucketedOrderRevenue]]) removes, and a
    * date-partitioned base confines to touched partitions
    * (dynamic-partition overwrite, the `maintainDailyAggregates`
    * discipline). `changes` carries base's columns plus (op, seq); per-key
    * seqs must be distinct (changelogs are per-key ordered by construction).
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val all = base.withColumn("op", lit("U")).withColumn("seq", lit(0L))
      .unionByName(changes.withColumn("seq", col("seq").cast("long")))
    val w = Window.partitionBy(col(key)).orderBy(col("seq").desc)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("op") =!= "D")
      .drop("op", "seq", "__rn")
  }

  /** SNAPSHOT DIFF — the INVERSE of [[applyChangelog]]: given two keyed
    * snapshots of the same schema, emit the minimal changelog
    * (op ∈ {I, U, D} + the NEW row's values; D rows carry the key with
    * null values) that transforms old → new — the change-data-feed
    * generator a plain-parquet pipeline runs between snapshot versions.
    * One full-outer hash join on the key (both sides one shuffle, removed
    * by the bucketed layout); change detection is per-column NULL-SAFE
    * equality (`<=>`), never a serialized-blob compare, so column order
    * and representation quirks cannot manufacture phantom diffs.
    * Unchanged keys emit NOTHING — the changelog is minimal. The algebra
    * is spec-pinned: `applyChangelog(old, snapshotDiff(old, new)) == new`.
    *
    * `key` must be UNIQUE within each snapshot (the primary-key contract
    * every keyed table in the engine carries) — with duplicates the full
    * outer join fans out and no minimal changelog exists. This is ENFORCED
    * in-plan: each side's per-key count rides the join's own hash
    * partitioning (the window reuses the exchange — no extra shuffle), and
    * a duplicated key raises a targeted error at execution instead of
    * silently emitting a changelog that breaks the apply∘diff algebra. A
    * key-only snapshot (no value columns) degenerates correctly: `changed`
    * folds to false and the diff is pure membership (I/D rows only).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    require(newDf.columns.toSeq == oldDf.columns.toSeq,
      s"snapshots must share a schema: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    val cols = oldDf.columns.filterNot(_ == key).toSeq
    val o = oldDf.select(col(key).as("__ok") +: cols.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__oc", count(lit(1)).over(Window.partitionBy(col("__ok"))))
    val n = newDf.select(col(key).as("__nk") +: cols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__nc", count(lit(1)).over(Window.partitionBy(col("__nk"))))
    val changed = cols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .foldLeft(lit(false))(_ || _)
    // one ordered when-expression: the dup check is evaluated before the
    // change filter for every joined row, so a duplicated key cannot be
    // filtered away as "unchanged" before the guard sees it
    val emit = when(col("__oc") > 1L || col("__nc") > 1L,
        raise_error(format_string(
          s"snapshotDiff: key '$key' value %s is duplicated within a " +
            "snapshot — snapshots must be keyed (unique per key) for a " +
            "minimal changelog to exist",
          coalesce(col("__nk"), col("__ok")).cast("string"))))
      .otherwise(col("__ok").isNull || col("__nk").isNull || changed)
    o.join(n, col("__ok") === col("__nk"), "full_outer")
      .where(emit)
      .select(
        (coalesce(col("__nk"), col("__ok")).as(key) +:
          when(col("__ok").isNull, "I").when(col("__nk").isNull, "D")
            .otherwise("U").as("op") +:
          cols.map(c => col(s"__n_$c").as(c))): _*)
  }

  /** [[snapshotDiff]] driven between the orders snapshot and its
    * deterministically-CDC'd successor ([[cdcApplyOrders]]): the diff must
    * recover exactly the NET effect of the changelog — updates as U,
    * +10⁹-keyed inserts as I, tombstoned keys as D, seq-1-then-seq-2
    * double-updates collapsing to ONE U row with the final values, and
    * untouched keys absent. Oracle replays the apply then diffs with plain
    * SQL. Output: (o_orderkey, op, <new row columns>).
    */
  def ordersSnapshotDiff(spark: SparkSession, dir: String): DataFrame =
    snapshotDiff(Tables.orders(spark, dir), cdcApplyOrders(spark, dir), "o_orderkey")

  /** [[applyChangelog]] demo over orders with a deterministic changelog:
    * seq 1 revalues every 97th key (+1.00, status U1); seq 2 re-updates the
    * every-194th subset (+2.00, status U2 — latest-wins over seq 1); seq 3
    * tombstones every 101st key; seq 1 also inserts fresh keys (+10⁹
    * offset, status N) for every 103rd key — upsert-on-missing. Pure
    * integer/IEEE arithmetic, so the oracle replays the changelog verbatim.
    */
  def cdcApplyOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    def upd(mod: Int, add: Double, status: String, seq: Int): DataFrame =
      ord.where(col("o_orderkey") % mod === 0)
        .withColumn("o_orderstatus", lit(status))
        .withColumn("o_totalprice", col("o_totalprice") + lit(add))
        .withColumn("op", lit("U")).withColumn("seq", lit(seq.toLong))
    val inserts = ord.where(col("o_orderkey") % 103 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      .withColumn("o_orderstatus", lit("N"))
      .withColumn("op", lit("U")).withColumn("seq", lit(1L))
    val deletes = ord.where(col("o_orderkey") % 101 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(3L))
    val changes = upd(97, 1.0, "U1", 1)
      .unionByName(upd(194, 2.0, "U2", 2))
      .unionByName(inserts)
      .unionByName(deletes)
    applyChangelog(ord, changes, "o_orderkey")
  }

  // ---- correlated-subquery SQL surface -----------------------------------
  // The ANSI front door a reference-switching SQL user hits first: scalar
  // aggregate subqueries, EXISTS, NOT EXISTS — each correlated to the outer
  // row. The SAME text runs on Spark (over parquet.`path` tables) and
  // verbatim on DuckDB as its oracle, so these entries prove two things at
  // once: SQL-dialect parity, and that Catalyst DECORRELATES every form
  // (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery) into
  // aggregate + equi-join plans — per-outer-row re-execution would be
  // O(outer·inner) at 100 TB, the same class of blowup as an unbinned
  // range join. Arithmetic stays in DECIMAL/INTEGER so both engines agree
  // bit-exactly (`avg` is spelled sum·count-free: price·n > Σprice).

  /** Orders above their customer's average order value, with the float-free
    * spelling of "above average": price × n_orders > Σ price (exact decimal
    * both sides). Two correlated scalar aggregates over the same table —
    * Catalyst folds both into ONE grouped aggregate joined back on custkey.
    */
  def corrAboveAvgSql(orders: String): String =
    s"""SELECT o.o_custkey, o.o_orderkey,
       |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
       |FROM $orders o
       |WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) *
       |    (SELECT count(*) FROM $orders o2 WHERE o2.o_custkey = o.o_custkey)
       |  > (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
       |     FROM $orders o3 WHERE o3.o_custkey = o.o_custkey)""".stripMargin

  /** TPC-H Q4-shaped EXISTS: orders with some lineitem shipped more than 60
    * days after the order date. The correlated predicate mixes an equi key
    * with an inequality on the OUTER row's column — decorrelates to a left
    * semi join with the inequality as residual condition, never a BNLJ.
    */
  def corrExistsSql(orders: String, lineitem: String): String =
    s"""SELECT o.o_orderpriority, count(*) AS n_orders
       |FROM $orders o
       |WHERE EXISTS (SELECT 1 FROM $lineitem l
       |              WHERE l.l_orderkey = o.o_orderkey
       |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
       |GROUP BY o.o_orderpriority""".stripMargin

  /** NOT EXISTS: parts never shipped in quantity ≥ 48 → left anti join. */
  def corrNotExistsSql(part: String, lineitem: String): String =
    s"""SELECT p.p_partkey, p.p_brand
       |FROM $part p
       |WHERE NOT EXISTS (SELECT 1 FROM $lineitem l
       |                  WHERE l.l_partkey = p.p_partkey
       |                    AND l.l_quantity >= 48)""".stripMargin

  /** Correlated COUNT in the SELECT list — the "count bug" witness: a
    * customer with no orders must read 0, not NULL, which requires the
    * decorrelated left join to repair empty groups. Both engines agree.
    */
  def corrScalarCountSql(customer: String, orders: String): String =
    s"""SELECT c.c_custkey,
       |  (SELECT count(*) FROM $orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
       |FROM $customer c""".stripMargin

  private def pq(dir: String, t: String): String = s"parquet.`$dir/$t.parquet`"

  def corrAboveAvgOrders(spark: SparkSession, dir: String): DataFrame =
    spark.sql(corrAboveAvgSql(pq(dir, "orders")))

  def corrLateShippedOrders(spark: SparkSession, dir: String): DataFrame =
    spark.sql(corrExistsSql(pq(dir, "orders"), pq(dir, "lineitem")))

  def corrNeverBulkParts(spark: SparkSession, dir: String): DataFrame =
    spark.sql(corrNotExistsSql(pq(dir, "part"), pq(dir, "lineitem")))

  def corrOrderCounts(spark: SparkSession, dir: String): DataFrame =
    spark.sql(corrScalarCountSql(pq(dir, "customer"), pq(dir, "orders")))

  /** Exact interpolated quantiles of order value per status (percentile is
    * the exact aggregate — sorts within group; for sketch-based scale-out
    * use approx_percentile, which trades the oracle for O(1) memory).
    */
  def orderValueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"),
        count(lit(1)).as("n"))

  /** CUBE over (returnflag, linestatus): all 2^2 grouping combinations. */
  def returnsCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** Scalar-function coverage in one projection: date parts, string ops,
    * math — all codegen'd built-ins (SURVEY.md §2.2 "scalar functions").
    */
  def scalarFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("order_year"),
      month(col("o_orderdate")).cast("long").as("order_month"),
      dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
      upper(col("o_orderpriority")).as("prio_upper"),
      substring(col("o_orderpriority"), 1, 1).as("prio_code"),
      length(col("o_orderstatus")).cast("long").as("status_len"),
      round(sqrt(col("o_totalprice")), 6).as("price_sqrt"),
      (col("o_orderkey") % 7).as("key_mod7"),
      greatest(col("o_totalprice"), lit(100000.0)).as("price_floor100k"))

  /** Explicit GROUPING SETS — independent subtotals by flag and by status
    * in one pass (Spark 4 Dataset.groupingSets; distinct from rollup/cube).
    */
  def returnsGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** PIVOT: order counts per year spread across status columns — the
    * wide-format aggregation surface. Pivot values are declared explicitly
    * (no value-discovery scan) and absent cells coalesce to 0 so the output
    * matches the CASE-sum formulation any SQL engine can run.
    */
  def ordersPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("long").as("order_year"), col("o_orderstatus"))
      .groupBy(col("order_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("order_year"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** UNPIVOT — the inverse reshape of [[ordersPivot]]: the wide
    * year×status count matrix back to long (year, status, n) form via
    * Spark's native `unpivot` (SQL `stack`) — the standard move when a
    * wide metrics table must feed a long-form consumer. Zero-filled cells
    * are filtered back out so the roundtrip reproduces exactly the rows
    * the original long form had. Pure reshape: the only shuffle is the
    * pivot's own aggregate; unpivot itself is a map-side explode.
    * Output: (order_year, status, n_orders).
    */
  def ordersUnpivot(spark: SparkSession, dir: String): DataFrame =
    ordersPivot(spark, dir)
      .unpivot(
        Array(col("order_year")),
        Array(col("n_f").as("F"), col("n_o").as("O"), col("n_p").as("P")),
        "status", "n_orders")
      .where(col("n_orders") > 0)

  /** Sketch-based approximate aggregates — the O(1)-memory scale path next
    * to the exact operators (HLL++ for distincts, KLL-style quantile
    * sketch). Sketch VALUES are engine-specific, so this operator is
    * deliberately NOT a registered entry (it could never hash-match a
    * DuckDB oracle); RelationalSpec bounds it against the exact answers,
    * and the registry carries [[approxBounds]] — exact values + tolerance
    * verdicts — as the driver-hash-gated face of the same sketches.
    */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 2).as("approx_median_price"),
        count(lit(1)).as("n_rows"))

  /** Driver-checkable sketch-accuracy gate — the companion that closes
    * [[approxStats]]'s oracle hole (r2 verdict item 7): computes the
    * sketches AND their exact twins in one pass, then emits only the exact
    * values plus boolean within-tolerance verdicts. The oracle produces the
    * same exact values with literal TRUEs, so a sketch drifting out of
    * tolerance flips a boolean and fails the driver's hash compare — sketch
    * regressions become driver-visible even though the sketch values
    * themselves are engine-specific. Tolerances: HLL++ at default 5% rsd
    * gets a 3σ 15% band; approx_percentile at accuracy 10000 has rank error
    * ≤ n/10000, far inside the exact p40–p60 band.
    */
  def approxBounds(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("amed"),
        expr("percentile(l_extendedprice, 0.4)").as("p40"),
        expr("percentile(l_extendedprice, 0.6)").as("p60"))
      .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double")
          <= col("exact_parts").cast("double") * 0.15).as("parts_within_15pct"),
        (col("amed") >= col("p40") && col("amed") <= col("p60")).as("median_within_p40_p60"))

  /** Full outer join: every customer and every ordering custkey, with order
    * counts (0 where a side is missing).
    */
  def customerOrdersFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
  }

  /** Exact e6-scale unit price: integer cents ×10⁴ integer-divided by the
    * (integral) quantity — bit-portable where a double division would tie-
    * break differently per engine in the argmin below.
    */
  private def unitPriceE6: Column =
    expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000" +
      " DIV CAST(l_quantity AS BIGINT)")

  /** TPC-H Q2-shaped min-cost supplier: for each small part, the EUROPE
    * supplier(s) offering the minimum observed unit price. The classic
    * correlated-argmin (`WHERE price = (SELECT min(price) … same part)`)
    * DECORRELATED BY AGGREGATION: offers are built once (lineitem ⋈
    * broadcast region-filtered suppliers), the per-part min is a grouped
    * aggregate of that same frame, and the winner join-back is an
    * equi-join on (part, exact fixed-point price) — two shuffles on
    * l_partkey where the correlated form would rescan per row; ties emit
    * every achieving supplier (pinned by the oracle, which KEEPS the
    * correlated form so the rewrite is under the hash gate). The unit
    * price is an e6 integer so the argmin equality cannot drift between
    * engines. Output: (p_partkey, p_name, s_suppkey, s_name, n_name,
    * unit_e6).
    */
  def minCostSupplier(spark: SparkSession, dir: String,
      regionName: String = "EUROPE", maxSize: Int = 10): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).where(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    // the part filter cuts the OFFER frame before any aggregation — the
    // per-part min over region suppliers is independent of which parts are
    // output, so filtering early is result-invariant and drops ~80% of the
    // fact rows ahead of both shuffles
    val offers = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), unitPriceE6.as("unit_e6"))
      .join(broadcast(Tables.part(spark, dir).where(col("p_size") < maxSize)
          .select(col("p_partkey"), col("p_name"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
    val minPer = offers.groupBy(col("p_partkey").as("mp_key"))
      .agg(min(col("unit_e6")).as("min_e6"))
    offers
      .join(minPer, col("p_partkey") === col("mp_key") && col("unit_e6") === col("min_e6"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("unit_e6"))
      .distinct()
  }

  /** TPC-H Q8-shaped market share: of the revenue ASIA-region customers
    * generated in 1996–1997, what fraction (ppm) was supplied by one
    * nation, per order year. ONE fact pass: the share is conditional
    * aggregation inside a single groupBy — never two scans differenced —
    * and the ratio is exact integer arithmetic on e4 fixed-point totals
    * (widened through DECIMAL(38,0) like promo_ppm). Dims broadcast; the
    * date predicate pushes to the orders scan. Output: (o_year,
    * nation_e4, total_e4, share_ppm).
    */
  def marketShare(spark: SparkSession, dir: String,
      regionName: String = "ASIA", suppNation: String = "NATION_3",
      from: String = "1996-01-01", until: String = "1998-01-01"): DataFrame = {
    val custRegion = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).where(col("r_name") === regionName),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNat = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .where(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until)),
        col("l_orderkey") === col("o_orderkey"))
      .join(custRegion, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === suppNation,
          discPrice(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0)))
          * 10000).cast("long").as("nation_e4"),
        (sum(discPrice(col("l_extendedprice"), col("l_discount"))) * 10000)
          .cast("long").as("total_e4"))
      .select(col("o_year"), col("nation_e4"), col("total_e4"),
        expr("CAST(CAST(nation_e4 AS DECIMAL(38,0)) * 1000000 DIV total_e4 AS LONG)")
          .as("share_ppm"))
  }

  /** TPC-H Q9-shaped profit by supplier nation and order year, for parts
    * whose name contains a token. With no partsupp table in the star, the
    * per-unit cost is a DETERMINISTIC stand-in — 10% of the part's retail
    * price — so profit stays a pure function of shipped columns:
    * profit_e4 = rev_e4 − retail_cents·qty·10 (all integer, engine-exact).
    * The name filter cuts the part dim BEFORE its broadcast, so the fact
    * rows that survive the join are already profit-relevant — the
    * filter-the-dim-not-the-fact discipline. Output: (n_name, o_year,
    * profit_e4, n_items).
    */
  def nationProfit(spark: SparkSession, dir: String,
      nameToken: String = "bolt"): DataFrame = {
    val pt = Tables.part(spark, dir)
      .where(col("p_name").contains(nameToken))
      .select(col("p_partkey"), col("p_retailprice"))
    val suppNat = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val profitE4 =
      (discPrice(col("l_extendedprice"), col("l_discount")) * 10000).cast("long") -
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          col("l_quantity").cast("long") * lit(10L)
    Tables.lineitem(spark, dir)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(profitE4).cast("long").as("profit_e4"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q11-shaped important parts: parts whose total traded value
    * exceeds 1.5× the MEAN per-part value. The group-vs-global-scalar
    * HAVING: one fact pass builds the per-part e4 totals, a 1-row
    * aggregate OF THAT AGGREGATE (never a second fact scan) is cross-
    * joined back broadcast, and the threshold compare is pure integer —
    * value_e4·2·n_parts > 3·total_e4, widened through DECIMAL(38,0) so
    * the product can't wrap at planet scale. A multiple-of-MEAN threshold
    * (not TPC-H's fixed global fraction) is the deliberate scale-safe
    * choice: a fixed share-of-total selects a vanishing set as the part
    * population grows (measured: 0 rows even at sf0.01), while the mean
    * multiple keeps the selected fraction stable at any SF. Output:
    * (p_partkey, value_e4).
    */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg((sum(discPrice(col("l_extendedprice"), col("l_discount"))) * 10000)
        .cast("long").as("value_e4"))
    val total = perPart.agg(
      sum(col("value_e4")).as("total_e4"), count(lit(1)).as("n_parts"))
    perPart.join(broadcast(total),
        expr("CAST(value_e4 AS DECIMAL(38,0)) * 2 * n_parts") >
          expr("CAST(total_e4 AS DECIMAL(38,0)) * 3"))
      .select(col("p_partkey"), col("value_e4"))
  }

  /** TPC-H Q13-shaped order-count distribution: how many customers placed
    * exactly k URGENT orders, INCLUDING k = 0 — the left-outer + count
    * composition where the zero bucket only exists because count(o_orderkey)
    * counts non-null keys, not rows (the classic "count bug" the inner-join
    * form silently drops). Two aggregations: per-customer counts (one hash
    * shuffle), then the |distinct-counts|-sized histogram. Output:
    * (c_count, custdist).
    */
  def orderCountDistribution(spark: SparkSession, dir: String,
      priority: String = "1-URGENT"): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(Tables.orders(spark, dir)
          .where(col("o_orderpriority") === priority)
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q16-shaped supplier diversity: distinct supplier count per
    * (brand, type, size) for mid-size non-Brand#1 parts, EXCLUDING
    * suppliers in arrears — the NOT IN over a subquery expressed as what
    * it is at scale: a left-anti join on the (structurally small) excluded
    * key set, run on the distinct (part, supplier) PAIRS (one dedup
    * shuffle) rather than raw lineitems, so the count-distinct aggregate
    * sees pre-deduped fixed-width keys. Output: (p_brand, p_type, p_size,
    * supplier_cnt).
    */
  def supplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .where(col("p_brand") =!= "Brand#1" && col("p_size").between(1, 25))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val excluded = Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(Scale.maybeBroadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q17-shaped small-quantity revenue: revenue lost to sub-20%-of-
    * average-quantity orders of one brand's parts. The correlated per-part
    * AVG threshold decorrelated by aggregation: per-part exact averages
    * (decimal sum / count — the one double both engines derive bit-
    * identically) join back broadcast onto the brand's lineitems, and only
    * the surviving rows aggregate. The oracle keeps the correlated
    * `l_quantity < 0.2 * (SELECT avg …)` form. Output: (n_items,
    * revenue_e4, avg_weekly).
    */
  def smallQtyRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#13"): DataFrame = {
    val pt = Tables.part(spark, dir)
      .where(col("p_brand") === brand).select(col("p_partkey"))
    val brandItems = Tables.lineitem(spark, dir)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgPer = brandItems.groupBy(col("l_partkey").as("ap_key"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    brandItems
      .join(broadcast(avgPer), col("l_partkey") === col("ap_key"))
      .where(col("l_quantity") < col("avg_qty") * 0.2)
      .agg(count(lit(1)).as("n_items"),
        (sum(col("l_extendedprice").cast("decimal(18,2)")) * 10000)
          .cast("long").as("revenue_e4"))
      .select(col("n_items"), col("revenue_e4"),
        round(col("revenue_e4").cast("double") / 7.0 / 10000.0, 6).as("avg_weekly"))
  }

  /** k-ANONYMOUS aggregate release — the privacy-preserving publication
    * discipline: quasi-identifier cells (nation × order year) backed by
    * fewer than k DISTINCT CUSTOMERS are SUPPRESSED from the release and
    * rolled into one explicit residual row — k-anonymity is over
    * individuals, not records: a 25-order cell fed by one customer would
    * publish that individual's yearly spend verbatim, so the gate counts
    * customers and n_orders is published as a measure. Totals still
    * reconcile and the suppression is auditable (an always-present
    * residual row, zeros when nothing was suppressed; its n_customers is
    * the SUM of per-cell counts — a cross-cell distinct union would
    * itself leak cell structure). The residual itself sits under the SAME
    * k-gate: when it rolls up fewer than 2 suppressed cells OR fewer than
    * k summed customers, publishing its exact measures would re-identify
    * the one suppressed cell (the missing (nation, year) is inferable
    * from the published grid, so "QI masked" protects nothing) — in that
    * case the measures are NULLed and only the suppressed-cell count is
    * released. Totals reconcile whenever the residual passes its own
    * gate; when it doesn't, privacy wins over reconciliation by design.
    * One aggregation behind a broadcast dim join; the suppression rollup
    * is a second agg over the cell table (nations × years — metadata
    * scale). Output: (n_name, o_year, n_suppressed_cells, n_customers,
    * n_orders, revenue) + residual row.
    */
  def kAnonRelease(spark: SparkSession, dir: String, k: Long = 25): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val kept = cells.where(col("n_customers") >= k)
      .withColumn("n_suppressed_cells", lit(0L))
    // the residual's own k-gate, ONE shared condition for every measure:
    // exact measures when nothing was suppressed (zeros are harmless) or
    // when ≥ 2 cells AND ≥ k summed customers back them; otherwise NULL
    // measures, count only
    val publish = col("n_suppressed_cells") === 0L ||
      (col("n_suppressed_cells") >= 2L && col("n_customers") >= k)
    val suppressed = cells.where(col("n_customers") < k)
      .agg(count(lit(1)).cast("long").as("n_suppressed_cells"),
        coalesce(sum(col("n_customers")), lit(0L)).cast("long").as("n_customers"),
        coalesce(sum(col("n_orders")), lit(0L)).cast("long").as("n_orders"),
        coalesce(sum(col("rev")), lit(0).cast("decimal(38,2)")).as("rev"))
      .select(lit("__suppressed__").as("n_name"), lit(-1L).as("o_year"),
        col("n_suppressed_cells"),
        when(publish, col("n_customers")).as("n_customers"),
        when(publish, col("n_orders")).as("n_orders"),
        when(publish, col("rev")).as("rev"))
    kept.unionByName(suppressed)
      .select(col("n_name"), col("o_year"), col("n_suppressed_cells"),
        col("n_customers"), col("n_orders"),
        col("rev").cast("double").as("revenue"))
  }
}
