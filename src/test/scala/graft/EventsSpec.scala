package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events

/** Event-time fixtures (FIXTURES.md §B.7): window boundary + session gap on
  * the real table, with hand-checked invariants.
  */
class EventsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hourly buckets partition the events exactly") {
    val total = Events.events(spark, dir).count()
    val summed = Events.hourlyRollup(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_events")).as[Long].head()
    assert(summed == total)
  }

  test("sliding 6h/3h windows double-count every event") {
    val total = Events.events(spark, dir).count()
    val summed = Events.slidingCounts(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_events")).as[Long].head()
    assert(summed == 2 * total)
  }

  test("sessions partition each user's events; durations within session bounds") {
    val events = Events.events(spark, dir).count()
    val sess = Events.sessionize(spark, dir)
    val nAssigned = sess.agg(org.apache.spark.sql.functions.sum("n_events")).as[Long].head()
    assert(nAssigned == events)
    val bad = sess.where($"duration_us" < 0 ||
      ($"n_events" === 1 && $"duration_us" =!= 0)).count()
    assert(bad == 0)
  }

  test("as-of: last_click equals the quadratic reference join per purchase") {
    import org.apache.spark.sql.functions._
    val e = Events.events(spark, dir).select($"user_id", $"event_id", $"event_type", $"ts_us")
    val got = Events.asofLastClick(spark, dir)
      .select($"user_id", $"event_id", $"last_click_us").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the O(purchases × clicks) join the window composition replaces — fine
    // as a reference at sf0.001, exactly what must never run at scale
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), $"ts_us".as("pts"))
    val clicks = e.where($"event_type" === "click")
      .select($"user_id", $"event_id".as("cid"), $"ts_us".as("cts"))
    val expect = purchases.join(clicks, Seq("user_id"))
      .where($"cts" < $"pts" || ($"cts" === $"pts" && $"cid" < $"pid"))
      .groupBy($"user_id", $"pid").agg(max($"cts").as("mx"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(expect.nonEmpty && got.size >= expect.size)
    expect.foreach { case (k, v) => assert(got(k) == v, s"purchase $k") }
    (got.keySet -- expect.keySet).foreach { k =>
      assert(got(k) == -1L, s"purchase $k should have no prior click")
    }
  }

  test("concurrency: binned interval join equals the naive containment join") {
    import org.apache.spark.sql.functions._
    val got = Events.sessionConcurrency(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    // quadratic reference: every (boundary, session) containment pair —
    // exactly the BNLJ the binned equi-join exists to avoid at scale
    val sess = Events.sessionize(spark, dir)
      .select($"start_us", $"end_us").as[(Long, Long)].collect()
    val b0 = sess.map(_._1).min / 3600000000L
    val b1 = sess.map(_._2).max / 3600000000L
    (b0 to b1).foreach { bin =>
      val t = bin * 3600000000L
      val n = sess.count { case (s, e) => s <= t && t <= e }
      assert(got(bin * 3600L) == n.toLong, s"bin $bin")
    }
    assert(got.size == (b1 - b0 + 1), "grid must cover every boundary exactly once")
  }

  test("gapfill: dense grid, observed hours intact, fills carry the last observation") {
    import org.apache.spark.sql.functions._
    val hourly = Events.hourlyRollup(spark, dir)
      .select($"hour_epoch", $"event_type", $"n_events").as[(Long, String, Long)].collect()
      .map(r => (r._2, r._1) -> r._3).toMap
    val filled = Events.gapFilledHourly(spark, dir)
      .as[(String, Long, Long, String)].collect()
    val types = hourly.keys.map(_._1).toSet
    val h0 = hourly.keys.map(_._2).min
    val h1 = hourly.keys.map(_._2).max
    // dense: every (type, hour) exactly once
    assert(filled.length == types.size * ((h1 - h0) / 3600 + 1))
    assert(filled.map(r => (r._1, r._2)).distinct.length == filled.length)
    filled.foreach { case (t, h, n, src) =>
      hourly.get((t, h)) match {
        case Some(obs) => assert(n == obs && src == "obs", s"($t,$h)")
        case None =>
          // carried value equals the most recent observed hour before h
          val prev = hourly.collect { case ((`t`, ph), v) if ph < h => (ph, v) }
          if (prev.isEmpty) assert(n == 0L && src == "none", s"($t,$h)")
          else assert(n == prev.maxBy(_._1)._2 && src == "ffill", s"($t,$h)")
      }
    }
  }

  test("seasonal profile: hour-of-day buckets partition the hourly rollup") {
    import org.apache.spark.sql.functions._
    val hourly = Events.hourlyRollup(spark, dir)
    val prof = Events.hourOfDayProfile(spark, dir)
      .as[(Long, String, Long, Long, Double, Double)].collect()
    assert(prof.forall(r => r._1 >= 0 && r._1 < 24))
    // bucket mass conserved: Σ n_hours = hourly rows, Σ n_events = events
    assert(prof.map(_._3).sum == hourly.count())
    assert(prof.map(_._4).sum == Events.events(spark, dir).count())
    // median/p90 sit inside each bucket's value range by definition
    prof.foreach(r => assert(r._5 <= r._6, s"median > p90 in ${r._1}/${r._2}"))
  }

  test("funnel is monotonically narrowing and strictly ordered") {
    val steps = Events.funnel(spark, dir)
      .select("step", "n_users").as[(String, Long)].collect().toMap
    assert(steps.keySet == Set("1_view", "2_click", "3_purchase"))
    // each step can only lose users, and on this data some users do convert
    assert(steps("1_view") >= steps("2_click"))
    assert(steps("2_click") >= steps("3_purchase"))
    assert(steps("1_view") > 0)
  }

  test("bursts: flagged hours genuinely exceed twice their trailing baseline") {
    val flagged = Events.bursts(spark, dir)
      .select("n_events", "trailing_sum", "trailing_cnt")
      .as[(Long, Long, Long)].collect()
    // every flagged row satisfies the integer rule and its preconditions
    flagged.foreach { case (n, s, c) =>
      assert(c >= 12 && n * c > s * 2, s"bogus flag: n=$n sum=$s cnt=$c")
    }
  }

  test("anomalies: the integer rule equals the float z>3 rule on observed data") {
    // loose threshold so the tiny fixture actually flags something to check
    val flagged = Events.anomalies(spark, dir, lookback = 48, minObs = 4)
      .select("n_events", "trailing_cnt", "trailing_sum", "trailing_sumsq")
      .as[(Long, Long, Long, Long)].collect()
    assert(flagged.nonEmpty, "fixture produced no anomalies to validate")
    flagged.foreach { case (n, m, s, q) =>
      assert(m >= 4)
      val mean = s.toDouble / m
      val variance = (q.toDouble - s.toDouble * s / m) / m
      assert(n > mean, s"flag below mean: n=$n mean=$mean")
      // the cross-multiplied integer test implies the float one (variance
      // here is far from the float precision edge)
      assert((n - mean) * (n - mean) > 9.0 * variance - 1e-6,
        s"flag fails float z-test: n=$n m=$m s=$s q=$q")
    }
  }

  test("dau/mau: trailing-window distinct equals a direct recount") {
    import org.apache.spark.sql.functions._
    val du = Events.events(spark, dir)
      .select(expr("ts_us div 86400000000").as[Long], $"user_id".as[Long])
      .distinct().collect()
    val byDay = du.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Events.dauMau(spark, dir)
      .select($"day_epoch".as[Long], $"dau".as[Long], $"mau".as[Long],
        $"stickiness_ppm".as[Long]).collect()
    assert(got.length == byDay.size)
    got.foreach { case (ep, dau, mau, ppm) =>
      val d = ep / 86400
      assert(dau == byDay(d).size, s"day $d dau")
      val expectedMau = (d - 29 to d).flatMap(byDay.get).flatten.toSet.size
      assert(mau == expectedMau, s"day $d mau $mau != $expectedMau")
      assert(mau >= dau && ppm == dau * 1000000 / mau)
    }
  }

  test("interpolation equals an independent two-sided neighbor model") {
    val hourly = Events.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.expr("(ts_us div 3600000000) * 3600").as("h"),
        org.apache.spark.sql.functions.col("event_type"))
      .count()
      .as[(Long, String, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._3).toMap).toMap
    val h0 = hourly.values.flatMap(_.keys).min
    val h1 = hourly.values.flatMap(_.keys).max
    val got = Events.interpolatedHourly(spark, dir)
      .select("event_type", "hour_epoch", "src", "value_milli")
      .as[(String, Long, String, Option[Long])].collect()
    assert(got.length == hourly.size * (((h1 - h0) / 3600) + 1).toInt)
    got.foreach { case (et, h, src, v) =>
      val obs = hourly(et)
      val prev = obs.keys.filter(_ <= h) match { case e if e.isEmpty => None case e => Some(e.max) }
      val next = obs.keys.filter(_ >= h) match { case e if e.isEmpty => None case e => Some(e.min) }
      obs.get(h) match {
        case Some(n) =>
          assert(src == "obs" && v.contains(n * 1000), s"$et@$h")
        case None => (prev, next) match {
          case (Some(hp), Some(hn)) =>
            val exp = (obs(hp) * (hn - h) + obs(hn) * (h - hp)) * 1000 / (hn - hp)
            assert(src == "interp" && v.contains(exp), s"$et@$h got $v expected $exp")
          case _ => assert(src == "none" && v.isEmpty, s"$et@$h")
        }
      }
    }
    assert(got.exists(_._3 == "interp"), "fixture produced no gaps to interpolate")
  }

  test("native session_window sessions equal the lag+cumsum sessions") {
    val viaLag = Events.sessionize(spark, dir)
      .select("user_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaNative = Events.sessionizeNative(spark, dir)
      .select("user_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaNative == viaLag,
      s"missing=${viaLag -- viaNative} extra=${viaNative -- viaLag}")
  }

  test("weekly-from-daily merge equals the single-pass weekly aggregation") {
    import org.apache.spark.sql.functions._
    val twoLevel = Events.weeklyFromDaily(spark, dir)
      .select("week_epoch", "event_type", "n_events", "sum_value", "min_value", "max_value")
      .as[(Long, String, Long, Double, Double, Double)].collect().toSet
    val onePass = Events.events(spark, dir)
      .groupBy((expr("ts_us div 604800000000") * 604800L).as("week_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .as[(Long, String, Long, Double, Double, Double)].collect().toSet
    assert(twoLevel == onePass,
      s"missing=${onePass -- twoLevel} extra=${twoLevel -- onePass}")
    assert(twoLevel.nonEmpty)
  }

  test("json extraction bounds: k in [0, 99]") {
    val s = Events.jsonStats(spark, dir)
      .select("min_k", "max_k").as[(Long, Long)].collect()
    s.foreach { case (mn, mx) => assert(mn >= 0 && mx <= 99) }
  }

  test("sketch reagg: daily-union estimate equals the one-shot weekly sketch") {
    import org.apache.spark.sql.functions._
    // the mergeability contract the maintained-table pattern rests on:
    // union of per-day partials must estimate EXACTLY what a single sketch
    // built over the whole week estimates (DataSketches unions are exact
    // over sketch state, not approximately compatible)
    val e = Events.events(spark, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
    val viaDays = e.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy(expr("day div 7").as("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val oneShot = e.groupBy(expr("day div 7").as("week"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
    val a = viaDays.select("week", "est").as[(Long, Long)].collect().toMap
    val b = oneShot.select("week", "est").as[(Long, Long)].collect().toMap
    assert(a.nonEmpty && a == b)
    // and the registered entry's gate holds
    val gate = Events.distinctReagg(spark, dir)
      .select($"users_within_5pct".as[Boolean]).collect()
    assert(gate.nonEmpty && gate.forall(identity))
  }

  test("attribution: band join equals naive per-user inequality; last-touch is the max") {
    import org.apache.spark.sql.functions._
    val windowUs = 86400000000L
    val e = Events.events(spark, dir)
    val c = e.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts_us").as("click_us"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_us"))
    val naive = p.join(c, col("user_id") === col("cu") &&
        col("click_us") <= col("purchase_us") &&
        col("purchase_us") - col("click_us") <= windowUs)
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    val banded = Events.attributionPairs(spark, dir, windowUs)
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(banded.nonEmpty, "fixture should produce attributed pairs")
    // last-touch: exactly one row per attributed purchase, and it is the
    // latest in-window click
    val pairs = Events.attributionPairs(spark, dir, windowUs)
      .select($"purchase_id", $"click_id", $"click_us")
      .as[(Long, Long, Long)].collect()
    val expectLast = pairs.groupBy(_._1).map { case (pid, rs) =>
      pid -> rs.maxBy(r => (r._3, r._2))._2
    }
    val gotLast = Events.attributionLastTouch(spark, dir, windowUs)
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect()
    assert(gotLast.length == gotLast.map(_._1).distinct.length)
    assert(gotLast.toMap == expectLast)
  }

  test("heavy hitters: estimates never under-count and probe the exact top-k users") {
    import org.apache.spark.sql.functions._
    val nUsers = Events.events(spark, dir)
      .select($"user_id").distinct().count()
    val out = Events.userHeavyHitters(spark, dir)
      .select($"user_id".as[Long], $"exact_count".as[Long],
        $"cm_estimate".as[Long], $"overestimate".as[Long]).collect()
    assert(out.length == math.min(20L, nUsers))
    out.foreach { case (u, exact, est, over) =>
      assert(est >= exact, s"user $u: count-min under-counted ($est < $exact)")
      assert(over == est - exact)
    }
    val expectTop = Events.events(spark, dir).groupBy($"user_id").count()
      .orderBy(col("count").desc, col("user_id").asc).limit(20)
      .select($"user_id".as[Long]).collect().toSet
    assert(out.map(_._1).toSet == expectTop)
  }

  // The testdata generator has shipped `ts` as TIMESTAMP(NANOS) (→ BIGINT ns
  // under nanosAsLong) and as TIMESTAMP(MICROS) (→ timestamp_ntz). This pins
  // the reader's adaptivity on explicit fixtures of EVERY supported encoding,
  // so the next encoding flip is THIS test failing with a clear name — not 24
  // scattered DATATYPE_MISMATCH analysis errors across the suite.
  test("events reader normalizes ns-long, µs TIMESTAMP_NTZ, and µs TIMESTAMP identically") {
    import org.apache.spark.sql.functions._
    val base = Seq(
      (1L, 1700000000123456L, 10L, "click", 1.5, "{}"),
      (2L, 1700000003999999L, 11L, "purchase", 2.5, "{}"),
      (3L, 1700000007000001L, 10L, "view", 0.5, "{}"))
    def fixtureDir(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_enc_$tag").toString
    val raw = base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // ns-as-long (what TIMESTAMP(NANOS) parquet resolves to under nanosAsLong)
    val dNs = fixtureDir("ns")
    raw.withColumn("ts", col("ts") * lit(1000L))
      .write.parquet(s"$dNs/events.parquet")
    // TIMESTAMP_NTZ(µs): wall-clock-as-UTC naive micros (pyarrow's encoding)
    val dNtz = fixtureDir("ntz")
    raw.withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.parquet(s"$dNtz/events.parquet")
    // TIMESTAMP(µs), isAdjustedToUTC=true: a true instant column
    val dTs = fixtureDir("ts")
    raw.withColumn("ts", timestamp_micros(col("ts")))
      .write.parquet(s"$dTs/events.parquet")
    val outs = Seq(dNs, dNtz, dTs).map { d =>
      Events.events(spark, d)
        .select($"event_id", $"ts_ns", $"ts_us", unix_micros($"ts").as("ts_col_us"),
          $"user_id", $"event_type", $"value", $"props")
        .collect().map(_.toSeq).toSet
    }
    assert(outs(0) == outs(1), "ns-long vs TIMESTAMP_NTZ encodings diverge")
    assert(outs(0) == outs(2), "ns-long vs TIMESTAMP encodings diverge")
    val expectUs = base.map(_._2).toSet
    assert(outs(0).map(r => r(2).asInstanceOf[Long]) == expectUs, "ts_us must be the stored epoch micros")
  }

  test("events reader passes EXTRA generator columns through, after the canonical eight") {
    import org.apache.spark.sql.functions._
    // additive schema evolution is declared legal — a new generator column
    // must survive the reader (appended after the canonical columns), not
    // silently disappear downstream
    val d = java.nio.file.Files.createTempDirectory("graft_enc_extra").toString
    Seq((1L, 1700000000123456L, 10L, "click", 1.5, "{}", "web", 42L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props",
        "channel", "shard")
      .withColumn("ts", timestamp_micros(col("ts")))
      .write.parquet(s"$d/events.parquet")
    val out = Events.events(spark, d)
    assert(out.columns.toSeq == Seq("event_id", "ts_ns", "user_id", "event_type",
      "value", "props", "ts_us", "ts", "channel", "shard"))
    val r = out.select($"channel".as[String], $"shard".as[Long]).head()
    assert(r == ("web", 42L))
  }
}
