package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event / time-series surface (batch; the Structured Streaming variant of
  * the same windowed aggregation lives in graft.streaming). The reference is
  * strictly batch with no temporal operators (SURVEY.md §2.2) — this is the
  * extension surface over `events.parquet`.
  *
  * The events table's `ts` column has shipped under two physical parquet
  * encodings across testdata generations — TIMESTAMP(NANOS) (which Spark
  * surfaces as BIGINT ns under the `nanosAsLong` escape hatch) and
  * TIMESTAMP(MICROS) (surfaced as TimestampType / TimestampNTZType).
  * [[events]] is SCHEMA-ADAPTIVE: it branches on the column's resolved type
  * and normalizes both encodings to the same three-column contract — `ts_ns`
  * (BIGINT ns), `ts_us` (BIGINT µs, exact), `ts` (TimestampType, µs) — so
  * every downstream operator is encoding-agnostic. All query outputs expose
  * time as epoch seconds/micros (BIGINT) — exact, timezone-free, portable.
  */
object Events {

  import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

  /** events with ts_ns (long), ts_us (long), and ts (TimestampType, µs) —
    * identical logical schema whichever physical encoding the parquet
    * carries.
    *
    *  - `ts: BIGINT` (TIMESTAMP(NANOS) read with
    *    `spark.sql.legacy.parquet.nanosAsLong=true`): ns pass through;
    *    `ts_us = ts_ns div 1000` (floor — what engines that truncate ns→µs
    *    on read produce). The nanosAsLong conf is only REQUIRED on this
    *    branch; without it Spark's scan rejects ns-parquet before we get
    *    here, so the require exists purely to turn that into a clear
    *    message. A query constructor must not mutate session config — a
    *    concurrent query would race on the shared value — so it checks and
    *    fails loudly instead of setting it.
    *  - `ts: TIMESTAMP_NTZ` (TIMESTAMP(MICROS), isAdjustedToUTC=false — what
    *    pyarrow writes for tz-naive data): the stored int64 IS epoch µs the
    *    way every naive-timestamp engine (DuckDB `epoch_us`) reads it, i.e.
    *    wall-clock-as-UTC. Spark's NTZ→Timestamp cast goes through the
    *    SESSION timezone, so this branch requires
    *    `spark.sql.session.timeZone=UTC` (all graft entrypoints pin it) and
    *    the cast is then the identity on the stored micros.
    *  - `ts: TIMESTAMP` (isAdjustedToUTC=true): already an instant;
    *    `unix_micros` is timezone-free on it.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = graft.sources.Tables.table(spark, dir, "events")
    val normalized = raw.schema("ts").dataType match {
      case LongType =>
        require(
          spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
          "events.parquet carries TIMESTAMP(NANOS): build the SparkSession with " +
            "spark.sql.legacy.parquet.nanosAsLong=true (see README)")
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case TimestampNTZType | TimestampType =>
        if (raw.schema("ts").dataType == TimestampNTZType) require(
          spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.parquet carries TIMESTAMP_NTZ(MICROS): build the SparkSession " +
            "with spark.sql.session.timeZone=UTC so the naive→instant cast is the " +
            "identity on the stored micros (matching DuckDB epoch_us semantics)")
        raw.withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
          .withColumn("ts_ns", col("ts_us") * 1000L)
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case other => sys.error(
        s"events.parquet: unsupported physical type for ts: $other — expected " +
          "BIGINT (TIMESTAMP(NANOS) via nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ. " +
          "The testdata generator likely changed encodings again; extend " +
          "Events.events with the new branch.")
    }
    // one canonical column order whichever branch produced it — then any
    // EXTRA columns in their schema order: additive generator evolution is
    // declared legal by Tables.assertExpectedSchema ("extra columns are
    // ignored" means not policed — not silently dropped from the reader)
    val canonical = Seq("event_id", "ts_ns", "user_id", "event_type",
      "value", "props", "ts_us", "ts")
    val extras = normalized.columns.filterNot(canonical.contains).toSeq
    normalized.select((canonical ++ extras).map(col): _*)
  }

  /** The events table re-materialized PARTITIONED BY integer epoch day —
    * the first-order cost lever at 100 TB: a day-range predicate then
    * prunes whole directories at PLANNING time and the scan never opens
    * them (PlanSpec-asserted). The partition key is a tz-free integer
    * (`ts_us div 86400000000`), not a date, so both engines and any
    * session timezone agree on which partition a row lands in. Export-once
    * per source fingerprint, same discipline as the csv/json/orc fixtures;
    * at production scale this layout is written once by ingest, not
    * derived per query.
    */
  def eventsPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Tables.exportOnce(s"$dir/events.parquet", "graft_events_byday_", p =>
      events(spark, dir)
        .withColumn("event_day", expr("ts_us div 86400000000"))
        .write.partitionBy("event_day").parquet(p))
    spark.read.parquet(out)
  }

  /** Daily rollup over ONE WEEK of the partitioned layout: the day-range
    * predicate is a partition filter, so 23 of 30 day-directories are never
    * scanned. Same aggregate discipline as [[hourlyRollup]].
    */
  def prunedDailyRollup(spark: SparkSession, dir: String,
      fromDay: Long = 19730L, toDay: Long = 19736L): DataFrame =
    eventsPartitioned(spark, dir)
      .where(col("event_day").between(fromDay, toDay))
      .groupBy(col("event_day").cast("long").as("event_day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Tumbling 1-hour windows per event type: counts, exact value sum,
    * distinct users. Window key = epoch seconds of the hour bucket.
    */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        (expr("ts_us div 3600000000") * 3600L).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Sliding windows via Spark's native window(): 6-hour windows sliding by
    * 3 hours — each event lands in 2 windows. Output window start as epoch
    * seconds.
    */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_epoch"),
        col("event_type"), col("n_events"))

  /** Sessionization: per user, a >30-minute gap starts a new session.
    * lag → gap flag → running sum = session index (the standard
    * windowed-gap formulation; Structured Streaming's stateful equivalent is
    * in graft.streaming). Output: one row per session with bounds + size.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    events(spark, dir)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))

  }

  /** [[sessionize]] via Spark's NATIVE `session_window` aggregation — the
    * same 30-minute-gap sessions as the lag+cumsum formulation, but
    * expressed as the gap-window groupBy the engine merges internally
    * (and the only formulation that also runs under Structured Streaming
    * with state eviction). Semantics note: `session_window`'s window end
    * extends `gap` past the last event, and an event AT exactly
    * `prev + gap` starts a NEW session (the window is half-open), while
    * the lag rule keeps `ts − prev == gap` in the OLD session — so this
    * uses gap+1µs to make the two formulations identical on µs
    * timestamps; EventsSpec pins the equality row-for-row. Output matches
    * [[sessionize]] minus the session index (window identity replaces it):
    * (user_id, n_events, start_us, end_us, duration_us).
    */
  def sessionizeNative(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "1800000001 microseconds"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))

  /** Event-type transition counts: per user, consecutive event pairs
    * (ordered by time) → global (prev_type, event_type) matrix. The lag
    * window is the same per-user shuffle sessionization uses.
    */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Ordered 3-step funnel (view → click → purchase): a user advances a
    * step only with an event STRICTLY AFTER their previous step's first
    * event — the conversion analysis every product-analytics engine ships,
    * here as three user-keyed min-aggregations chained by time predicates.
    * After the first aggregation everything is co-partitioned on user_id
    * (AQE reuses the partitioning; per-step state is one µs timestamp per
    * user), and each step's frame only shrinks. Output:
    * (step, n_users) — one row per funnel stage.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select(col("user_id"), col("event_type"), col("ts_us"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts_us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts_us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("step"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("step"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("step"), col("n_users")))
  }

  /** [[funnel]] with CONVERSION WINDOWS — each step counts only if it
    * happens within `windowUs` of the user's previous step (the form
    * product analytics actually reports: "clicked within a day of first
    * view"). Same chained min-aggregation shape; the window bound rides
    * the same time predicate, so the plan is identical and the frames
    * still only shrink. Output: (step, n_users).
    */
  def funnelWindowed(spark: SparkSession, dir: String,
      windowUs: Long = 86400000000L): DataFrame = {
    val e = events(spark, dir).select(col("user_id"), col("event_type"), col("ts_us"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, "user_id")
      .where(col("ts_us") > col("t1") && col("ts_us") <= col("t1") + windowUs)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, "user_id")
      .where(col("ts_us") > col("t2") && col("ts_us") <= col("t2") + windowUs)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("step"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click_1d").as("step"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase_1d").as("step"), col("n_users")))
  }

  /** As-of join, Spark-native: for every purchase event, the user's most
    * recent click AT-OR-BEFORE it in (ts, event_id) order — the classic
    * time-series operator Spark lacks as a primitive (attribution,
    * "state as of t", trade-vs-quote joins). Composed WITHOUT a range
    * join: both event kinds ride ONE tagged stream and a per-user ordered
    * window carries the last non-null click timestamp to each row — one
    * shuffle on user_id, no (purchase × click) candidate blowup, nothing
    * driver-side, and the running-last state is one value per window
    * partition however long the history. Ties break on event_id (a click
    * sharing the purchase's timestamp counts as before it only with a
    * lower event_id) — deterministic, mirrored in the oracle. Output:
    * (user_id, event_id, purchase_us, last_click_us, us_since_click);
    * -1s when the user has no prior click.
    */
  def asofLastClick(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .withColumn("click_us", when(col("event_type") === "click", col("ts_us")))
      .withColumn("last_click_us", last(col("click_us"), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us").as("purchase_us"),
        coalesce(col("last_click_us"), lit(-1L)).as("last_click_us"),
        coalesce(col("ts_us") - col("last_click_us"), lit(-1L)).as("us_since_click"))
  }

  /** MULTI-TOUCH ATTRIBUTION pairs: every (purchase, click) of the same
    * user with the click at-or-before the purchase and within `windowUs` —
    * the interval join marketing attribution runs, and the other classic
    * shape Spark plans as a cartesian BNLJ if written as a bare range
    * predicate. Executed as a TEMPORAL BAND JOIN ([[Scale.bandJoin]]'s
    * discipline on the time axis, one-sided): bands are windowUs wide, a
    * click replicates into its band and the NEXT (click ∈ [p−W, p] ⟹
    * band(click) ∈ {band(p)−1, band(p)}), purchases probe their own band,
    * and the exact predicate runs on same-(user, band) pairs only — one
    * hash shuffle on (user_id, band), 2× replication of the click side, no
    * per-user clicks×purchases blowup beyond true in-window matches.
    * Banding is result-invariant (exact filter re-verifies), so the oracle
    * is the plain inequality join. Output: (user_id, purchase_id,
    * click_id, purchase_us, click_us, us_before).
    */
  def attributionPairs(spark: SparkSession, dir: String,
      windowUs: Long = 86400000000L): DataFrame = {
    val e = events(spark, dir)
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("click_us"))
      .withColumn("__band", explode(array(
        expr(s"click_us div ${windowUs}L"),
        expr(s"click_us div ${windowUs}L") + lit(1L))))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_us"))
      .withColumn("__band", expr(s"purchase_us div ${windowUs}L"))
    purchases.join(clicks, Seq("user_id", "__band"))
      .where(col("click_us") <= col("purchase_us") &&
        col("purchase_us") - col("click_us") <= windowUs)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_us"), col("click_us"),
        (col("purchase_us") - col("click_us")).as("us_before"))
  }

  /** LAST-TOUCH attribution: [[attributionPairs]] reduced to the latest
    * in-window click per purchase (ties on click_us break to the higher
    * click_id — the later-arriving event wins, mirrored in the oracle).
    * Contrast with [[asofLastClick]]: as-of carries the last click however
    * old (running state, no join); last-touch bounds the lookback to the
    * attribution window and keeps only attributed purchases. The rank
    * window partitions by purchase — per-purchase state, purchase-count
    * parallelism. Output schema = attributionPairs.
    */
  def attributionLastTouch(spark: SparkSession, dir: String,
      windowUs: Long = 86400000000L): DataFrame = {
    val w = Window.partitionBy("purchase_id")
      .orderBy(col("click_us").desc, col("click_id").desc)
    attributionPairs(spark, dir, windowUs)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Concurrency curve — how many sessions are OPEN at each bin boundary —
    * via a BINNED INTERVAL JOIN, the generic big-big range-join shape Spark
    * has no primitive for. A naive `probe.join(intervals, start <= t && t
    * <= end)` plans as BroadcastNestedLoopJoin (O(|P|·|S|) comparisons and
    * an unconditional broadcast) — the classic scale-killer. Binning makes
    * it an EQUI-join: each interval emits one row per `binUs`-wide bin it
    * overlaps (fan-out = duration/binUs + 1, bounded by the session-gap
    * rule here; in general pick binUs near the median interval length),
    * each probe point lands in exactly one bin, and the residual
    * containment predicate runs only on same-bin pairs. Both sides are
    * hash-partitioned on the bin key — no broadcast needed at any scale
    * (the tiny probe grid here rides the same plan; AQE picks broadcast
    * when it fits). Probe points are the bin boundaries derived from the
    * session span itself (one scalar aggregation → sequence — stays in the
    * DAG); zero-concurrency boundaries are kept via a final left join.
    * Output: (hour_epoch, n_active).
    */
  def sessionConcurrency(spark: SparkSession, dir: String,
      binUs: Long = 3600000000L): DataFrame = {
    val sessions = sessionize(spark, dir).select(col("start_us"), col("end_us"))
    val grid = sessions
      .agg(expr(s"min(start_us) div $binUs").as("b0"), expr(s"max(end_us) div $binUs").as("b1"))
      .select(explode(sequence(col("b0"), col("b1"))).as("bin"))
      .select(col("bin"), (col("bin") * binUs).as("t_us"))
    val binned = sessions.select(col("start_us"), col("end_us"),
      explode(sequence(expr(s"start_us div $binUs"), expr(s"end_us div $binUs"))).as("bin"))
    val active = binned.join(grid, "bin")
      .where(col("start_us") <= col("t_us") && col("t_us") <= col("end_us"))
      .groupBy(col("t_us")).agg(count(lit(1)).as("n_active"))
    grid.join(active, Seq("t_us"), "left")
      .select(expr("t_us div 1000000").as("hour_epoch"),
        coalesce(col("n_active"), lit(0L)).as("n_active"))
  }

  /** Burst detection: hours where an event type's count exceeds 2× its
    * trailing baseline (the mean of its previous 24 OBSERVED hourly
    * buckets, current hour excluded; at least 12 observations required
    * before flagging). The comparison is pure INTEGER arithmetic —
    * `n · trailing_cnt > 2 · trailing_sum` instead of a float mean — so
    * the result is bit-exact across engines and partitionings by
    * construction. One hourly rollup + one per-type ordered window; at
    * scale the window state is one row per (type, hour) bucket, bounded by
    * time, not event volume. Output:
    * (hour_epoch, event_type, n_events, trailing_sum, trailing_cnt).
    */
  def bursts(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(
        (expr("ts_us div 3600000000") * 3600L).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("hour_epoch")
      .rowsBetween(-24, -1)
    hourly
      .withColumn("trailing_sum", sum(col("n_events")).over(w))
      .withColumn("trailing_cnt", count(col("n_events")).over(w))
      .where(col("trailing_cnt") >= 12 &&
        col("n_events") * col("trailing_cnt") > col("trailing_sum") * 2L)
  }

  /** Rolling z-score spike detection — [[bursts]]' 2×-mean rule graduated
    * to a variance-aware one: flag hours whose count sits more than 3
    * standard deviations above the trailing 48-observed-hour mean. The
    * entire test is EXACT INTEGER arithmetic: with m = trailing count,
    * S = trailing sum, Q = trailing sum of squares, the z > 3 condition
    *   (n − S/m) > 3·sqrt((Q − S²/m)/m)
    * cross-multiplies to
    *   n·m > S  AND  (n·m − S)² > 9·(m·Q − S²)
    * — no float mean, no sqrt, bit-exact across engines and partition
    * orders by construction. The squared terms run in DECIMAL(38,0), so
    * hourly counts up to ~10⁹ (any realistic bucket at 100 TB) can't
    * overflow; window state is one row per (type, hour) bucket, bounded by
    * time not volume. Output: flagged rows only,
    * (hour_epoch, event_type, n_events, trailing_cnt, trailing_sum,
    *  trailing_sumsq).
    */
  def anomalies(spark: SparkSession, dir: String, lookback: Int = 48,
      minObs: Int = 24): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(
        (expr("ts_us div 3600000000") * 3600L).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("hour_epoch")
      .rowsBetween(-lookback, -1)
    val dec = "decimal(38,0)"
    val m = col("trailing_cnt").cast(dec)
    val s = col("trailing_sum").cast(dec)
    val q = col("trailing_sumsq").cast(dec)
    val n = col("n_events").cast(dec)
    hourly
      .withColumn("trailing_cnt", count(col("n_events")).over(w))
      .withColumn("trailing_sum", sum(col("n_events")).over(w))
      .withColumn("trailing_sumsq", sum(col("n_events") * col("n_events")).over(w))
      .where(col("trailing_cnt") >= minObs &&
        n * m > s &&
        (n * m - s) * (n * m - s) > lit(9).cast(dec) * (m * q - s * s))
  }

  /** Weekly cohort retention: of the distinct users active in week w, how
    * many are also active in week w+1. The classic period-over-period
    * self-join, shaped for scale: activity is reduced to DISTINCT
    * (week, user) pairs first (one agg), so the self-join carries one row
    * per active user-week — bounded by actives, not by raw event volume.
    * Output: (week_epoch, n_active, n_retained, retention_rate).
    */
  def weeklyRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 604800000000L // 7 * 24 * 3600 * 1e6
    val weekly = events(spark, dir)
      .select(expr(s"ts_us div $weekUs").as("wk"), col("user_id"))
      .distinct()
    weekly.as("a")
      .join(weekly.as("b"),
        col("a.user_id") === col("b.user_id") && col("b.wk") === col("a.wk") + 1, "left")
      .groupBy(col("a.wk").as("wk"))
      .agg(
        count(col("a.user_id")).as("n_active"),
        count(col("b.user_id")).as("n_retained"))
      .select((col("wk") * 604800L).as("week_epoch"),
        col("n_active"), col("n_retained"),
        round(col("n_retained").cast("double") / col("n_active").cast("double"), 6)
          .as("retention_rate"))
  }

  /** DAU / trailing-30-day MAU / stickiness — the engagement triple every
    * product dashboard leads with. The trailing DISTINCT is the interesting
    * scale problem (distinct counts don't merge across windows): activity
    * reduces to DISTINCT (day, user) pairs first, then each pair fans out
    * to the 30 future days it keeps the user "monthly-active" for — an
    * EQUI-join shape with bounded fan-out (the binned-interval-join trick
    * applied to sliding distinct counts), never a 30× rescan of raw events.
    * Stickiness ships as integer ppm. Output:
    * (day_epoch, dau, mau, stickiness_ppm).
    */
  def dauMau(spark: SparkSession, dir: String, windowDays: Int = 30): DataFrame = {
    val du = events(spark, dir)
      .select(expr("ts_us div 86400000000").as("d"), col("user_id")).distinct()
    val dau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val mau = du
      .select(col("user_id"), explode(sequence(col("d"), col("d") + (windowDays - 1))).as("d2"))
      .groupBy(col("d2").as("d")).agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, "d")
      .select((col("d") * 86400L).as("day_epoch"), col("dau"), col("mau"),
        expr("dau * 1000000 div mau").as("stickiness_ppm"))
  }

  /** Mergeable-sketch REAGGREGATION — the at-scale answer to "distinct
    * users per week/month" when the raw events are too big to rescan per
    * question: distinct counts are NON-additive, so the maintained daily
    * table stores an HLL SKETCH partial per day (Spark's DataSketches
    * `hll_sketch_agg`), and any coarser period is `hll_union_agg` over the
    * days it covers — same aggregate-once/serve-many shape as
    * [[graft.streaming.StreamingOps.maintainDailyAggregates]], extended to
    * the one aggregate that can't be summed. Verification is the
    * accuracy-gate discipline of `rel_approx_bounds`: the entry emits the
    * EXACT weekly distinct (oracle-checkable) plus a sketch-vs-exact
    * tolerance boolean the oracle asserts TRUE — a sketch drift past 5%
    * breaks the gate deterministically. Output:
    * (week, exact_users, users_within_5pct).
    */
  def distinctReagg(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
    // the maintained table: one sketch partial per day
    val daily = e.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    // served question: weekly distinct = union of that week's partials
    val weekly = daily.groupBy(expr("day div 7").as("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"))
    val exact = e.groupBy(expr("day div 7").as("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    weekly.join(exact, "week")
      .select(col("week"), col("exact_users"),
        (abs(col("est_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("users_within_5pct"))
  }

  /** Hour-of-day seasonality profile — the baseline table an anomaly rule
    * (e.g. [[bursts]]) graduates to once a corpus has enough history:
    * per (hour-of-day, event_type), the distribution of hourly counts
    * across observed days (exact interpolated median/p90, the
    * [[graft.operators.Relational.orderValueQuantiles]] discipline). Two
    * aggregations, both map-side-combinable; profile rows are bounded by
    * 24 × types regardless of volume. Output:
    * (hod, event_type, n_hours, n_events, median_n, p90_n).
    */
  def hourOfDayProfile(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        (expr("ts_us div 3600000000") * 3600L).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(expr("(hour_epoch % 86400) div 3600").as("hod"), col("event_type"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("n_events")).as("n_events"),
        round(expr("percentile(n_events, 0.5)"), 2).as("median_n"),
        round(expr("percentile(n_events, 0.9)"), 2).as("p90_n"))

  /** Gap-filled hourly series with FORWARD FILL — the time-series repair
    * every downstream consumer of a rollup wants: a dense (event_type ×
    * hour) grid over the observed span, missing buckets carrying the last
    * observed value. The grid is time-span × dimension values — a
    * STRUCTURAL cross join (two derived-tiny sides: one scalar agg and one
    * distinct over a low-cardinality dimension), the same reviewed-by-
    * design shape as the 1-row broadcast joins in the book_query family.
    * The fill itself is one per-type running-last window — state is a
    * single value per partition regardless of gap length, and the window
    * rows are (type, hour) buckets, bounded by time not event volume.
    * Output: (event_type, hour_epoch, n_filled, src ∈ obs|ffill|none).
    */
  def gapFilledHourly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(
        (expr("ts_us div 3600000000") * 3600L).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val grid = hourly
      .agg(expr("min(hour_epoch) div 3600").as("b0"), expr("max(hour_epoch) div 3600").as("b1"))
      .select(explode(sequence(col("b0"), col("b1"))).as("bin"))
      .select((col("bin") * 3600L).as("hour_epoch"))
    val types = hourly.select(col("event_type")).distinct()
    val w = Window.partitionBy("event_type").orderBy("hour_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(types)
      .join(hourly, Seq("hour_epoch", "event_type"), "left")
      .withColumn("ff", last(col("n_events"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("hour_epoch"),
        coalesce(col("ff"), lit(0L)).as("n_filled"),
        when(col("n_events").isNotNull, "obs")
          .when(col("ff").isNotNull, "ffill").otherwise("none").as("src"))
  }

  /** MERGEABLE daily aggregate table, materialized once (export-once
    * discipline, same as the bucketed/partitioned fixtures): per
    * (event_day, event_type) — count, EXACT decimal value sum, min, max.
    * Every statistic is an algebraic merge state (sums add, counts add,
    * min/max fold), deliberately excluding non-mergeable aggregates like
    * raw distinct counts — that's what sketches are for. At 100 TB this
    * table is what ingest maintains incrementally; rollup queries then
    * read days, not events.
    */
  def dailyAggregates(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Tables.exportOnce(s"$dir/events.parquet", "graft_events_daily_", p =>
      events(spark, dir)
        .groupBy(expr("ts_us div 86400000000").as("event_day"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("sum_value_dec"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .write.parquet(p))
    spark.read.parquet(out)
  }

  /** Weekly rollup served from the DAILY AGGREGATE table — the
    * aggregate-once / re-aggregate-many pattern: the weekly answer merges
    * ~7 daily rows per group instead of rescanning raw events (here 30
    * daily rows per type vs 100k+ events; at 100 TB the ratio is the whole
    * point). Lossless because every column of [[dailyAggregates]] is an
    * algebraic merge state, and day→week nesting is exact integer
    * arithmetic ((ts div day) div 7 ≡ ts div week). The oracle aggregates
    * RAW events directly — proving the two-level merge reproduces the
    * single-pass answer bit-for-bit. Output:
    * (week_epoch, event_type, n_events, sum_value, min_value, max_value).
    */
  def weeklyFromDaily(spark: SparkSession, dir: String): DataFrame =
    dailyAggregates(spark, dir)
      .groupBy((expr("event_day div 7") * 604800L).as("week_epoch"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value_dec")).cast("double").as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** Gap repair by LINEAR INTERPOLATION — [[gapFilledHourly]]'s forward
    * fill upgraded to the two-sided estimate: a missing hour between
    * observed neighbors (hp, np) and (hn, nn) carries
    *   v = (np·(hn−h) + nn·(h−hp)) / (hn−hp)
    * shipped as EXACT integer milli-units (numerator·1000 div gap) — no
    * float slope, bit-identical on both engines. Same dense-grid
    * construction as gapfill (structural cross join of two derived-tiny
    * sides); the neighbor search is one running-last window and one
    * running-first window per type — state is two values per partition
    * regardless of gap length. Hours outside the observed span (no
    * neighbor on one side) are tagged `none`. Output:
    * (event_type, hour_epoch, src ∈ obs|interp|none, value_milli).
    */
  def interpolatedHourly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(
        (expr("ts_us div 3600000000") * 3600L).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val grid = hourly
      .agg(expr("min(hour_epoch) div 3600").as("b0"), expr("max(hour_epoch) div 3600").as("b1"))
      .select(explode(sequence(col("b0"), col("b1"))).as("bin"))
      .select((col("bin") * 3600L).as("hour_epoch"))
    val types = hourly.select(col("event_type")).distinct()
    val wPrev = Window.partitionBy("event_type").orderBy("hour_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("event_type").orderBy("hour_epoch")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsAt = when(col("n_events").isNotNull, col("hour_epoch"))
    grid.crossJoin(types)
      .join(hourly, Seq("hour_epoch", "event_type"), "left")
      .withColumn("pv", last(col("n_events"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(obsAt, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("n_events"), ignoreNulls = true).over(wNext))
      .withColumn("nh", first(obsAt, ignoreNulls = true).over(wNext))
      .select(col("event_type"), col("hour_epoch"),
        when(col("n_events").isNotNull, "obs")
          .when(col("pv").isNotNull && col("nv").isNotNull, "interp")
          .otherwise("none").as("src"),
        when(col("n_events").isNotNull, col("n_events") * 1000L)
          .when(col("pv").isNotNull && col("nv").isNotNull,
            expr("(pv * (nh - hour_epoch) + nv * (hour_epoch - ph)) * 1000 div (nh - ph)"))
          .as("value_milli"))
  }

  /** JSON extraction from the props column + grouped stats over the
    * extracted value — get_json_object stays codegen'd, no UDF.
    */
  def jsonStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(sum(col("k")).cast("double") / count(col("k")).cast("double"), 6).as("avg_k"))

  /** Approximate HEAVY HITTERS over per-user activity — the events twin of
    * [[graft.operators.TextAnalysis.countMinAccuracy]]: a count-min sketch
    * (depth affine rows over a portable integer hash of user_id, fixed
    * `depth × width` cells) audited against the exact top-`kTop` counts.
    * The fixed-size summary an ops pipeline keeps when the per-user count
    * table outgrows serving (estimate ≥ exact always — never under); the
    * audit quantifies the collision overestimate on precisely the users
    * that matter. Hashes are affine integer arithmetic both engines replay
    * bit-for-bit, so the SKETCH STRUCTURE is under the hash gate, not just
    * the exact counts. Build cost: the exact per-user aggregation (key-
    * bounded) + a depth-way explode of the USER SET (never the event
    * stream). Output: (user_id, exact_count, cm_estimate, overestimate).
    */
  def userHeavyHitters(spark: SparkSession, dir: String, width: Int = 256,
      depth: Int = 4, kTop: Int = 20): DataFrame = {
    val exact = events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_count"))
    // shared sketch scaffold (Scale.countMinAudit) — the same kernel and
    // oracle-replayed cell formula as TextAnalysis.countMinAccuracy
    Scale.countMinAudit(exact, "user_id",
      expr("(user_id * 2654435761) % 2147483647"), width, depth, kTop)
  }
}
