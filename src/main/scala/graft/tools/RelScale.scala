package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational scaling-curve evidence: replicate the sf0.1 STAR SCHEMA and
  * the events stream K× with an FK-PRESERVING key-offset transform and time
  * the heaviest registered `rel_*`/`events_*` queries at each size — the
  * measured counterpart of ScaleBench's documents/embeddings curve, closing
  * the "the rel_/events_ tables never grow" gap: every 100 TB argument in
  * SCALING.md for joins, window frames, write-path ops and the bloom-pruned
  * join now rests on an observed x1/x4/x16 slope, not a single sf0.1 point.
  *
  * The transform: replica i offsets every PRIMARY KEY and every FOREIGN KEY
  * that references a replicated table by i·STRIDE — `customer`, `supplier`,
  * `part`, `orders`, `lineitem`, `events` replicate; `region`/`nation` stay
  * fixed (genuinely small dims — "more data" means more facts per nation,
  * not more nations). Offsetting parent PK and child FK by the SAME stride
  * keeps referential integrity exact, so every join's output grows exactly
  * K× (each replica joins only with itself — no cross-replica matches, no
  * K² blowup) while per-key fan-outs, value distributions, skew shape and
  * date ranges are byte-identical per replica: the honest model of "same
  * workload statistics, K× the volume". Events keep their timestamps — K×
  * the users in the SAME time window — so time-grid outputs (gapfill
  * hours) stay fixed while per-user state grows linearly, which is the
  * production shape of a growing service.
  *
  * Usage: runMain graft.tools.RelScale [srcSfDir] [workDir] [k1,k2,...] [only]
  * One JSON line per size; generation cached per (src, K) via _SUCCESS.
  */
object RelScale {

  /** The measured family: the suite's most expensive rel/events queries by
    * the round-5 verdict's fresh-bench ranking, plus one representative per
    * cost class so the curve separates scan-aggs from shuffle-joins from
    * window state from write-path replays:
    *   - scan-shaped controls: pricing_summary (TPC-H Q1), scalar_funcs
    *   - decorrelated/correlated joins: corr_above_avg, nation_trade, setops
    *   - per-key window state: customer_windows, trailing_spend
    *   - layout + skew machinery: bucketed_join (0-shuffle SMJ),
    *     salted_join, bloom_join (fixed 2^17-bit bloom — the FP-rate growth
    *     case), constraints + audit_constraints (FK-star anti-join gate)
    *   - write-path replays: upsert, scd2, cdc_apply
    *   - events state machines: funnel, sessions_native, concurrency, hourly
    */
  private val family = Seq(
    "rel_pricing_summary", "rel_scalar_funcs", "rel_corr_above_avg",
    "rel_nation_trade", "rel_setops", "rel_customer_windows",
    "rel_trailing_spend", "rel_bucketed_join", "rel_salted_join",
    "rel_bloom_join", "rel_constraints", "rel_audit_constraints",
    "rel_upsert", "rel_scd2", "rel_cdc_apply",
    "events_funnel", "events_sessions_native", "events_concurrency",
    "events_hourly",
    // round-6 additions: the eps-band inequality join, the decorrelated
    // Q21 shape (fact self-semantics via one scan), and the temporal band
    // join + its per-purchase rank reduction
    "rel_band_join", "rel_waiting_suppliers",
    "events_attribution", "events_attribution_last",
    // round-7 additions: Q10 (filter-before-fact-fact-join + top-k), Q14
    // (conditional-agg share), Q6 (pure pushed-predicate scan), Q15
    // (aggregate→max→join-back, the twice-used aggregate), and the
    // count-min heavy-hitter audit (user-set-bounded sketch)
    "rel_returned_customers", "rel_promo_revenue", "rel_filtered_revenue",
    "rel_top_supplier", "events_heavy_hitters",
    // round-8 addition: the point-in-interval lookup under the DATA-DERIVED
    // band width (Scale.bandWidthFor) — probe side grows with k, the
    // bracket table stays metadata-scale, so the curve measures the
    // derived-width banding at growing point volume
    "rel_interval_join",
    // round-8 additions: the remaining TPC-H disciplines — Q2's
    // decorrelated argmin, Q8/Q9's conditional-agg and computed-cost
    // rollups, Q11's group-vs-global HAVING, Q13's left-outer count
    // distribution, Q16's NOT-IN anti join, Q17's per-part avg threshold
    "rel_min_cost_supplier", "rel_market_share", "rel_nation_profit",
    "rel_important_parts", "rel_order_count_dist", "rel_supplier_diversity",
    "rel_small_qty_revenue")

  /** Key stride between replicas — far above any base key (max base key is
    * l_orderkey ≈ 6·10⁵ at sf0.1; 16 replicas stay below 2³¹ even embedded
    * in derived synthetic keys downstream).
    */
  private val Stride = 100000000L

  /** Value columns that VALUE-PROXIMITY joins (the eps-band join) match
    * on: cloned verbatim across replicas they manufacture K² cross-replica
    * matches (every replica's balance is within eps of every other
    * replica's copy) — the value-axis analog of the dup-clique problem the
    * documents transform avoids with its token bijection. Offsetting each
    * replica's values by rep·10⁵ (far beyond any eps) keeps within-replica
    * proximity structure byte-identical while cross-replica proximity
    * decoheres, so band-join match volume grows K× like every other join.
    */
  private val valueOffsets: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_acctbal"),
    "supplier" -> Seq("s_acctbal"))

  def scaledRel(spark: SparkSession, src: String, k: Int, out: String): String = {
    // v2: value-decohered acctbal columns (cache key bumps with the
    // transform so stale v1 dirs are never served)
    val dir = s"$out/relx${k}v2"
    // (table, PK/FK columns to offset by rep·Stride). region/nation copy
    // verbatim: fixed dims, every replica's FKs still resolve against them.
    val offsets: Seq[(String, Seq[String])] = Seq(
      "region" -> Nil,
      "nation" -> Nil,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"))
    for ((name, keys) <- offsets) {
      val tgt = s"$dir/$name.parquet"
      if (!new java.io.File(s"$tgt/_SUCCESS").exists()) {
        val base = spark.read.parquet(s"$src/$name.parquet")
        val vals = valueOffsets.getOrElse(name, Nil)
        val scaled =
          if (keys.isEmpty) base
          else base
            .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("rep"))
            .select(base.columns.map { c =>
              if (keys.contains(c)) (col(c) + col("rep").cast("long") * Stride).as(c)
              else if (vals.contains(c)) (col(c) + col("rep").cast("double") * 100000.0).as(c)
              else col(c)
            }: _*)
        scaled.repartition(32).write.mode("overwrite").parquet(tgt)
      }
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_relscale")
    val ks = args.lift(2).getOrElse("4,16").split(",").map(_.trim.toInt).toSeq
    val only = args.lift(3).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    val dirs: Seq[(Int, String)] =
      (1, src) +: ks.map(k => k -> scaledRel(spark, src, k, work))
    val allFns = family.map(n => n -> graft.SparkEntry.queries(n))
    val fns = only.fold(allFns)(o => allFns.filter(f => o(f._1)))
    for ((k, dir) <- dirs) {
      val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      var rows = 0L
      for (pass <- 1 to iters; (name, fn) <- fns) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
        if (pass == 1) rows += n
        System.err.println(f"[relscale] x$k pass $pass $name: $t%.2f s ($n rows)")
      }
      val qs = best.map { case (q, t) => s"${graft.JsonOut.q(q)}:$t" }.mkString("{", ",", "}")
      println(s"""{"metric":"relscale_family","k":$k,"dir":${graft.JsonOut.q(dir)},""" +
        s""""total":${best.values.sum},"result_rows":$rows,"queries":$qs}""")
    }
    spark.stop()
  }
}
