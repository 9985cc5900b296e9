package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.sources.Tables

/** Bounds for the deliberately oracle-less OPERATOR `Relational.approxStats`
  * (not a registered entry — engine-specific sketch values can never
  * hash-match a DuckDB oracle, so the registry carries its tolerance-gate
  * twin `rel_approx_bounds` instead): the sketches are checked against the
  * EXACT answers computed by the same engine — HLL distinct counts within
  * the configured relative error envelope, the approximate median inside the
  * exact p40–p60 band. Both sketches are deterministic for fixed data, so
  * this is a stable regression gate, not a flaky tolerance test.
  */
class RelationalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("SCD2 as-of read reconstructs exactly one version per covered customer") {
    // per customer the validity intervals partition the day line, so the
    // as-of cut must hit EXACTLY one version for every customer whose
    // history starts on or before the cut — the time-travel contract
    val hist = Relational.customerOrderHistory(spark, dir)
      .select($"o_custkey", $"valid_from_day").as[(Long, Long)].collect()
    val d = {
      val days = hist.map(_._2)
      (days.min + days.max) / 2
    }
    val asof = Relational.scd2AsOf(spark, dir)
      .select($"o_custkey").as[Long].collect()
    assert(asof.length == asof.distinct.length,
      "as-of read returned more than one version for some customer")
    val covered = hist.filter(_._2 <= d).map(_._1).distinct.sorted.toSeq
    assert(asof.sorted.toSeq == covered,
      s"as-of customers ${asof.length} != customers with history before the cut ${covered.length}")
  }

  test("k-anon release: no sub-k-customer cell published, totals reconcile through the residual") {
    val k = 25L
    val rel = Relational.kAnonRelease(spark, dir, k)
      .select($"n_name", $"o_year", $"n_suppressed_cells", $"n_customers", $"n_orders")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect()
    val (residual, published) = rel.partition(_._1 == "__suppressed__")
    assert(residual.length == 1, "exactly one auditable residual row")
    published.foreach { case (n, y, sc, c, o) =>
      assert(sc == 0L && c.exists(_ >= k) && o.nonEmpty,
        s"cell with fewer than $k distinct customers published: ($n, $y, $c)")
    }
    val Array((_, _, nCells, resCust, resOrders)) = residual
    if (nCells == 0 || (nCells >= 2 && resCust.exists(_ >= k))) {
      // residual passes its own gate -> exact measures, totals reconcile
      val total = Tables.orders(spark, dir).count()
      assert(rel.flatMap(_._5).sum == total,
        s"release total ${rel.flatMap(_._5).sum} != $total orders")
    } else {
      // coarsened residual: only the suppressed-cell count is released
      assert(resCust.isEmpty && resOrders.isEmpty,
        s"under-gate residual must NULL its measures: $residual")
    }
  }

  test("k-anon residual obeys its own k-gate across adversarial k values (ADVICE r8)") {
    // mirror the rule against cells computed straight from the base tables,
    // sweeping k values chosen to push the residual into each regime —
    // k=1 (nothing suppressed), just-above-min (few suppressed cells, the
    // single-cell re-identification shape the advice flagged), and a k
    // suppressing everything
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"o_orderdate").cast("long").as("o_year"))
      .agg(countDistinct($"o_custkey").as("c"), count(lit(1)).as("o"))
      .select($"n_name", $"o_year", $"c", $"o")
      .as[(String, Long, Long, Long)].collect()
    val counts = cells.map(_._3).distinct.sorted
    // the last k suppresses EVERY cell while exceeding the summed customer
    // counts -> guaranteed to exercise the coarsened (count-only) branch
    val ks = Seq(1L, counts.head + 1, counts(counts.length / 2), counts.last + 1,
      cells.map(_._3).sum + 1)
    ks.foreach { k =>
      val supp = cells.filter(_._3 < k)
      val nCells = supp.length.toLong
      val sumCust = supp.map(_._3).sum
      val safe = nCells == 0 || (nCells >= 2 && sumCust >= k)
      val got = Relational.kAnonRelease(spark, dir, k)
        .where($"n_name" === "__suppressed__")
        .select($"n_suppressed_cells", $"n_customers", $"n_orders")
        .as[(Long, Option[Long], Option[Long])].collect()
      assert(got.length == 1, s"k=$k: exactly one residual row expected")
      val (gc, gcust, gord) = got.head
      assert(gc == nCells, s"k=$k: suppressed-cell count $gc != $nCells")
      if (safe)
        assert(gcust.contains(sumCust) && gord.contains(supp.map(_._4).sum),
          s"k=$k: gated-safe residual must publish exact measures, got $got")
      else
        assert(gcust.isEmpty && gord.isEmpty,
          s"k=$k: residual backed by $nCells cells / $sumCust customers must be " +
            s"coarsened to count-only, got $got")
    }
    // the sweep must actually exercise both residual branches
    def safeAt(k: Long) = {
      val supp = cells.filter(_._3 < k)
      supp.isEmpty || (supp.length >= 2 && supp.map(_._3).sum >= k)
    }
    assert(ks.exists(k => !safeAt(k) && cells.exists(_._3 < k)),
      "no k in the sweep exercised the coarsened-residual branch")
    assert(ks.exists(k => safeAt(k) && cells.exists(_._3 < k)),
      "no k in the sweep exercised the exact-measures residual branch")
  }

  test("waiting suppliers: aggregate decorrelation equals the semi/anti-join form") {
    import graft.sources.Tables
    val pairs = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1)
          .otherwise(0).as("late"))
      .groupBy("l_orderkey", "l_suppkey").agg(max("late").as("late"))
      .localCheckpoint()
    val late = pairs.where(col("late") === 1).select("l_orderkey", "l_suppkey")
    // the correlated form, spelled as Spark semi/anti joins: another
    // supplier EXISTS in the order; no OTHER late supplier exists
    val semi = late.as("x").join(pairs.as("y"),
      col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_suppkey") =!= col("y.l_suppkey"), "left_semi")
    val sole = semi.as("x").join(late.as("z"),
      col("x.l_orderkey") === col("z.l_orderkey") &&
        col("x.l_suppkey") =!= col("z.l_suppkey"), "left_anti")
    val expected = sole.groupBy(col("l_suppkey")).count()
      .as[(Long, Long)].collect().toMap
    val got = Relational.waitingSuppliers(spark, dir)
      .select("s_suppkey", "numwait").as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture should have sole-late suppliers")
  }

  test("revenue share: per-region ppm shares are exhaustive up to div truncation") {
    import spark.implicits._
    val rows = Relational.revenueShare(spark, dir)
      .select($"region", $"nation", $"revenue_e4", $"share_ppm")
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, ns) =>
      val tot = ns.map(_._3).sum
      ns.foreach { case (_, nation, e4, ppm) =>
        assert(ppm == e4 * 1000000L / tot, s"$region/$nation share wrong")
      }
      val sumPpm = ns.map(_._4).sum
      // integer division truncates: the region's shares sum to 1e6 minus
      // at most one ppm per nation
      assert(sumPpm <= 1000000L && sumPpm > 1000000L - ns.length, s"$region sums to $sumPpm")
    }
  }

  test("constraint report: structural checks pass, ship-after-order fires") {
    import spark.implicits._
    val rows = Relational.constraintReport(spark, dir)
      .select($"constraint", $"n_checked", $"n_violations", $"passed")
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(rows.size == 5)
    rows.values.foreach { case (c, checked, viol, passed) =>
      assert(checked > 0, s"$c checked nothing")
      assert(viol >= 0 && viol <= checked)
      assert(passed == (viol == 0L), s"$c verdict inconsistent")
    }
    Seq("orders_pk_unique", "orders_fk_customer", "lineitem_qty_range",
      "customer_name_not_null").foreach(c => assert(rows(c)._4, s"$c should pass"))
    assert(!rows("lineitem_ship_after_order")._4 &&
      rows("lineitem_ship_after_order")._3 > 0,
      "the deliberately failing check did not fire")
  }

  test("scd2: per-customer intervals chain and end with the open sentinel") {
    import spark.implicits._
    val hist = Relational.customerOrderHistory(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"valid_from_day", $"valid_to_day")
      .as[(Long, Long, Long, Long)].collect()
    assert(hist.nonEmpty)
    hist.groupBy(_._1).foreach { case (cust, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, s"cust $cust: gap ${a._4} -> ${b._3}")
        case _ =>
      }
      assert(ordered.last._4 == 99999999L, s"cust $cust: last interval not open")
      ordered.foreach(r => assert(r._3 <= r._4, s"cust $cust: negative interval"))
    }
  }

  test("upsert: matched keys updated, new keys inserted, others pass through") {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .as[(Long, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val up = Relational.upsertOrders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"totalprice", $"src")
      .as[(Long, String, Double, String)].collect()
    // one output row per base-or-update key (keys ending 0..9 all appear)
    assert(up.length == orders.size)
    assert(up.map(_._1).distinct.length == up.length)
    up.foreach { case (k, status, price, src) =>
      val (oStatus, oPrice) = orders(k)
      k % 10 match {
        case d if d < 5 =>
          assert(src == "base" && status == oStatus && price == oPrice, s"key $k")
        case d if d < 8 =>
          assert(src == "updated" && status == "U" && math.abs(price - (oPrice + 10)) < 1e-9, s"key $k")
        case _ =>
          assert(src == "inserted" && status == "U" && math.abs(price - (oPrice + 10)) < 1e-9, s"key $k")
      }
    }
  }

  test("cleanedCorpus keep-first dedup drops exact duplicates that pass quality") {
    import spark.implicits._
    // 35 distinct short tokens: passes every quality rule (n_tokens >= 30,
    // avg_token_len ~2.7, type_token_ratio 1.0). The sf corpora carry no
    // exact dups among quality survivors, so this plants them explicitly.
    val good = (1 to 35).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (5L, good), (2L, good),                       // exact dups -> keep 2
      (9L, good + " extra tail words here"),        // unique survivor
      (1L, "short"))                                // fails the filter
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val got = graft.operators.TextAnalysis.cleanedCorpus(docs)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 35L), (9L, 39L)), s"got $got")
  }

  test("approxStats sketches stay inside exact-answer bounds") {
    val approx = Relational.approxStats(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val li = Tables.lineitem(spark, dir)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.4)").as("p40"),
        expr("percentile(l_extendedprice, 0.6)").as("p60"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (flag, a) =>
      val e = exact(flag)
      val nParts = e.getLong(1).toDouble
      assert(math.abs(a.getLong(1) - nParts) / nParts <= 0.15,
        s"$flag: approx distinct ${a.getLong(1)} vs exact $nParts drifts >15%")
      val med = a.getDouble(2)
      assert(med >= e.getDouble(2) - 0.01 && med <= e.getDouble(3) + 0.01,
        s"$flag: approx median $med outside exact p40..p60 [${e.getDouble(2)}, ${e.getDouble(3)}]")
      assert(a.getLong(3) == e.getLong(4), s"$flag: row counts disagree")
    }
  }

  test("key-skew profile: buckets partition keys and rows; bounds consistent") {
    import spark.implicits._
    val rows = Relational.joinKeySkew(spark, dir)
      .select($"size_bucket_lo", $"n_keys", $"n_rows", $"max_key_rows")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._3).sum == Tables.lineitem(spark, dir).count())
    assert(rows.map(_._2).sum ==
      Tables.lineitem(spark, dir).select($"l_orderkey").distinct().count())
    rows.foreach { case (lo, _, _, mx) =>
      assert(mx >= lo && mx < lo * 2, s"max $mx outside [$lo, ${2 * lo})")
    }
  }

  test("unpivot inverts pivot back to the direct long-form aggregate") {
    import spark.implicits._
    val got = Relational.ordersUnpivot(spark, dir)
      .select("order_year", "status", "n_orders")
      .as[(Long, String, Long)].collect().toSet
    val direct = Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("long").as("y"), col("o_orderstatus"))
      .groupBy($"y", $"o_orderstatus").agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == direct && got.nonEmpty)
  }

  test("shipping delay: totals reconcile; order stats are consistent") {
    import spark.implicits._
    val rows = Relational.shippingDelay(spark, dir)
      .select($"n_items", $"min_days", $"max_days", $"avg_days_e3", $"p50_days", $"p95_days")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).sum == Tables.lineitem(spark, dir).count())
    rows.foreach { case (n, mn, mx, avgE3, p50, p95) =>
      assert(n > 0 && mn <= mx)
      assert(avgE3 >= mn * 1000 && avgE3 <= mx * 1000, s"mean $avgE3 outside [$mn,$mx] days")
      assert(p50 >= mn && p50 <= p95 && p95 <= mx, s"percentiles $p50/$p95 out of order")
    }
  }

  test("equi-depth histogram: near-equal bucket counts, ordered boundaries") {
    import spark.implicits._
    val rows = Relational.orderValueEquidepth(spark, dir)
      .select($"bucket", $"n_orders", $"lo", $"hi").as[(Long, Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 8L))
    val total = Tables.orders(spark, dir).count()
    assert(rows.map(_._2).sum == total)
    // ntile: counts differ by at most 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // boundaries are non-decreasing across buckets
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3 + 1e-9, s"bucket ${a._1} hi ${a._4} > bucket ${b._1} lo ${b._3}")
    case _ => ()
    }
  }

  test("nation trade: pair matrix totals reconcile with the whole fact table") {
    import spark.implicits._
    val rows = Relational.nationTradeVolume(spark, dir)
      .select($"n_items".as[Long]).collect()
    val liCount = Tables.lineitem(spark, dir).count()
    // every lineitem has exactly one supplier nation and one customer
    // nation — the matrix partitions the fact table
    assert(rows.sum == liCount, s"matrix covers ${rows.sum} of $liCount items")
  }

  test("big spenders: every kept order clears the quantity threshold") {
    import spark.implicits._
    val rows = Relational.bigSpenderOrders(spark, dir, minQty = 150.0)
      .select($"o_orderkey", $"total_qty", $"o_totalprice")
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { case (k, q, _) => assert(q > 150.0, s"order $k kept with qty $q") }
    // TakeOrdered semantics: results arrive price-desc
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // independent recount for one kept order
    val k0 = rows.head._1
    val exact = Tables.lineitem(spark, dir).where(col("l_orderkey") === k0)
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    assert(exact == rows.head._2)
  }

  test("bracket revenue: only the three brackets survive, each non-empty filter logic") {
    import spark.implicits._
    val rows = Relational.bracketRevenue(spark, dir)
      .select($"p_brand", $"n_items", $"revenue").as[(String, Long, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf(Set("Brand#12", "Brand#23", "Brand#34")))
    rows.foreach { case (b, n, rev) =>
      assert(n > 0 && rev > 0, s"$b bracket empty") }
  }

  test("changelog apply: latest-wins, tombstones drop, inserts land, idempotent") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "v", "x")
    val changes = Seq(
      (1L, "a1", 11.0, "U", 1L), // update
      (1L, "a2", 12.0, "U", 2L), // later update wins
      (2L, "b", 20.0, "D", 1L),  // tombstone
      (3L, "c1", 31.0, "U", 1L), // update...
      (3L, "c1", 31.0, "D", 2L), // ...then delete: delete wins
      (5L, "e", 50.0, "U", 1L)   // insert on missing key
    ).toDF("k", "v", "x", "op", "seq")
    val out = Relational.applyChangelog(base, changes, "k")
    val got = out.as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a2", 12.0), (4L, "d", 40.0), (5L, "e", 50.0)))
    // idempotence: re-applying the same changelog to the result is a no-op
    val again = Relational.applyChangelog(out, changes, "k")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(again == got)
  }

  test("idle rich customers: members beat the global avg and placed no recent order") {
    import spark.implicits._
    // replay the definition row-by-row at tiny SF
    val cust = Tables.customer(spark, dir)
    val avg = {
      val a = cust.where(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("s"),
          count(col("c_acctbal")).as("n")).head
      a.getDouble(0) / a.getLong(1)
    }
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
      .select($"o_custkey".as[Long]).collect().toSet
    val expected = cust.select($"c_custkey".as[Long], $"c_nationkey".cast("long").as[Long],
        $"c_acctbal".as[Double]).collect()
      .filter { case (ck, _, bal) => bal > avg && !recent.contains(ck) }
      .groupBy(_._2).map { case (nk, cs) => nk -> cs.length }
    val got = Relational.idleRichCustomers(spark, dir)
      .select($"c_nationkey".as[Long], $"n_custs".as[Long]).collect()
      .map(r => r._1 -> r._2.toInt).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("snapshot diff: minimal I/U/D changelog; applyChangelog(old, diff) == new") {
    val old = Tables.orders(spark, dir)
    val neu = Relational.cdcApplyOrders(spark, dir)
    val diff = Relational.snapshotDiff(old, neu, "o_orderkey").localCheckpoint()
    val ops = diff.groupBy($"op").count().as[(String, Long)].collect().toMap
    assert(Set("I", "U", "D").subsetOf(ops.keySet), s"missing op classes: $ops")
    // minimality: every diffed key was actually touched by the changelog
    val touched = old.select($"o_orderkey".as[Long]).collect()
      .filter(k => k % 97 == 0 || k % 101 == 0 || k % 103 == 0).toSet
    diff.select($"o_orderkey".as[Long], $"op".as[String]).collect().foreach {
      case (k, "I") => assert(touched.contains(k - 1000000000L), s"phantom insert $k")
      case (k, _) => assert(touched.contains(k), s"phantom diff for untouched key $k")
    }
    // the algebra: re-applying the diff as a changelog reproduces new exactly
    val cols = old.columns.toSeq
    val reapplied = Relational.applyChangelog(old,
      diff.withColumn("seq", lit(1L)), "o_orderkey")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq.toList).toSet
    assert(rows(reapplied) == rows(neu))
  }

  test("snapshot diff: key-only snapshots diff by membership; duplicate keys fail loudly") {
    // no value columns: `changed` folds over lit(false) instead of
    // reduce-throwing on the empty column list; the diff is pure I/D
    val oldK = Seq(1L, 2L, 3L).toDF("k")
    val newK = Seq(2L, 3L, 4L).toDF("k")
    val d = Relational.snapshotDiff(oldK, newK, "k")
      .select($"k".as[Long], $"op".as[String]).collect().toSet
    assert(d == Set((1L, "D"), (4L, "I")))
    // a duplicated key breaks the apply∘diff algebra — enforced in-plan
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val clean = Seq((1L, "a"), (2L, "c")).toDF("k", "v")
    val e = intercept[Exception] {
      Relational.snapshotDiff(dup, clean, "k").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicated within a snapshot")), s"wrong error: $e")
  }

  test("Q15 shape: winners carry exactly the max per-supplier revenue") {
    val perSupp = Tables.lineitem(spark, dir)
      .where($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .groupBy($"l_suppkey")
      .agg((sum($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1).cast("decimal(5,2)") - $"l_discount".cast("decimal(5,2)"))) * 10000)
        .cast("long").as("rev"))
      .select($"l_suppkey".as[Long], $"rev".as[Long]).collect().toMap
    val expectMax = perSupp.values.max
    val winners = perSupp.filter(_._2 == expectMax).keySet
    val got = Relational.topSupplier(spark, dir)
      .select($"s_suppkey".as[Long], $"revenue_e4".as[Long]).collect()
    assert(got.map(_._1).toSet == winners, s"winner set drifts: got ${got.toSeq}")
    assert(got.forall(_._2 == expectMax))
  }

  test("Q6 shape: filtered revenue equals an exact driver-side recompute") {
    val rows = Tables.lineitem(spark, dir)
      .select($"l_shipdate".cast("string").as[String], $"l_discount".as[Double],
        $"l_quantity".as[Double], $"l_extendedprice".as[Double]).collect()
    val in = rows.filter { case (d, disc, qty, _) =>
      d >= "1996-01-01" && d < "1997-01-01" && disc >= 0.05 && disc <= 0.07 && qty < 24 }
    val expectE4 = in.map { case (_, disc, _, ext) =>
      (BigDecimal(ext).setScale(2) * BigDecimal(disc).setScale(2) * 10000).toLongExact
    }.sum
    val got = Relational.filteredRevenue(spark, dir)
      .select($"n_items".as[Long], $"revenue_e4".as[Long]).head()
    assert(got == ((in.length.toLong, expectE4)), s"got $got expected (${in.length}, $expectE4)")
  }

  test("Q14 shape: promo share is bounded, consistent, and covers all ship years") {
    val out = Relational.promoRevenueShare(spark, dir)
      .select($"ship_year".as[Long], $"promo_e4".as[Long], $"total_e4".as[Long],
        $"promo_ppm".as[Long]).collect()
    val years = Tables.lineitem(spark, dir)
      .select(year($"l_shipdate").cast("long").as[Long]).distinct().collect().toSet
    assert(out.map(_._1).toSet == years)
    out.foreach { case (y, promo, total, ppm) =>
      assert(promo >= 0 && promo <= total, s"year $y: promo_e4 outside [0, total]")
      assert(ppm == (BigInt(promo) * 1000000 / BigInt(total)).toLong,
        s"year $y: ppm inconsistent with the e4 totals")
    }
    assert(out.exists(_._2 > 0), "no promo revenue found at all — fixture assumption broken")
  }

  test("Q10 shape: top-20 returned-item customers ordered, tie-broken, recomputable") {
    val got = Relational.returnedItemCustomers(spark, dir)
      .select($"c_custkey".as[Long], $"revenue".as[Double]).collect()
    assert(got.length <= 20)
    // deterministic order: revenue desc, custkey asc on ties
    got.sliding(2).foreach {
      case Array((k1, r1), (k2, r2)) =>
        assert(r1 > r2 || (r1 == r2 && k1 < k2), s"order violated at $k1/$k2")
      case _ =>
    }
    // the top row's revenue equals an independent per-customer recompute
    val byCust = Tables.lineitem(spark, dir).where($"l_returnflag" === "R")
      .join(Tables.orders(spark, dir).where(
        $"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-04-01"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum(($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1).cast("decimal(5,2)") - $"l_discount".cast("decimal(5,2)"))))
        .cast("double").as("rev"))
      .select($"o_custkey".as[Long], $"rev".as[Double]).collect().toMap
    got.foreach { case (k, r) => assert(byCust(k) == r, s"customer $k revenue drifts") }
  }

  /** Driver-side exact model of the Q2/Q8/Q9 offer rows at sf0.001:
    * (partkey, suppkey, unit_e6) for region-filtered suppliers.
    */
  private def europeOffers: Seq[(Long, Long, Long)] = {
    val regionOf = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as[Long], $"r_name".as[String]).collect().toMap
    val suppNation = Tables.supplier(spark, dir)
      .select($"s_suppkey".as[Long], $"s_nationkey".as[Long]).collect().toMap
    Tables.lineitem(spark, dir)
      .select($"l_partkey".as[Long], $"l_suppkey".as[Long],
        $"l_extendedprice".as[Double], $"l_quantity".as[Double]).collect()
      .filter { case (_, sk, _, _) => regionOf(suppNation(sk)) == "EUROPE" }
      .map { case (pk, sk, ext, qty) =>
        val cents = (BigDecimal(ext).setScale(2) * 100).toLongExact
        (pk, sk, cents * 10000L / qty.toLong)
      }.toSeq
  }

  test("Q2 shape: every winner achieves the per-part min unit price; ties all emit") {
    val smallParts = Tables.part(spark, dir).where($"p_size" < 10)
      .select($"p_partkey".as[Long]).collect().toSet
    val offers = europeOffers
    val minPer = offers.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val expected = offers
      .filter { case (pk, _, u) => smallParts(pk) && u == minPer(pk) }
      .map { case (pk, sk, u) => (pk, sk, u) }.toSet
    val got = Relational.minCostSupplier(spark, dir)
      .select($"p_partkey".as[Long], $"s_suppkey".as[Long], $"unit_e6".as[Long])
      .collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture should have EUROPE offers on small parts")
    // at least one part must tie across two suppliers OR the min must be
    // unique everywhere — either way the argmin equality held exactly
  }

  test("Q8 shape: share ppm consistent with e4 totals; only window years emit") {
    val out = Relational.marketShare(spark, dir)
      .select($"o_year".as[Long], $"nation_e4".as[Long], $"total_e4".as[Long],
        $"share_ppm".as[Long]).collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).toSet.subsetOf(Set(1996L, 1997L)))
    out.foreach { case (y, nat, total, ppm) =>
      assert(nat >= 0 && nat <= total, s"year $y: nation_e4 outside [0, total]")
      assert(ppm == (BigInt(nat) * 1000000 / BigInt(total)).toLong,
        s"year $y: ppm inconsistent")
    }
  }

  test("Q9 shape: profit equals an exact driver-side recompute per (nation, year)") {
    val retail = Tables.part(spark, dir).where($"p_name".contains("bolt"))
      .select($"p_partkey".as[Long], $"p_retailprice".as[Double]).collect().toMap
    val nationName = Tables.nation(spark, dir)
      .select($"n_nationkey".as[Long], $"n_name".as[String]).collect().toMap
    val suppNation = Tables.supplier(spark, dir)
      .select($"s_suppkey".as[Long], $"s_nationkey".as[Long]).collect().toMap
    val orderYear = Tables.orders(spark, dir)
      .select($"o_orderkey".as[Long], year($"o_orderdate").cast("long").as[Long])
      .collect().toMap
    val expected = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount", $"l_quantity")
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect()
      .filter(r => retail.contains(r._2))
      .map { case (ok, pk, sk, ext, disc, qty) =>
        val revE4 = (BigDecimal(ext).setScale(2) *
          (BigDecimal(1).setScale(2) - BigDecimal(disc).setScale(2)) * 10000).toLongExact
        val costE4 = (BigDecimal(retail(pk)).setScale(2) * 100).toLongExact * qty.toLong * 10L
        ((nationName(suppNation(sk)), orderYear(ok)), revE4 - costE4)
      }
      .groupBy(_._1).view.mapValues(vs => (vs.map(_._2).sum, vs.size.toLong)).toMap
    val got = Relational.nationProfit(spark, dir)
      .select($"n_name".as[String], $"o_year".as[Long], $"profit_e4".as[Long],
        $"n_items".as[Long]).collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture should have bolt parts")
  }

  test("Q11 shape: selected parts clear 1.5x the mean value, unselected don't") {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg((sum($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1).cast("decimal(5,2)") - $"l_discount".cast("decimal(5,2)"))) * 10000)
        .cast("long").as("v"))
      .select($"l_partkey".as[Long], $"v".as[Long]).collect().toMap
    val total = perPart.values.map(BigInt(_)).sum
    val n = perPart.size
    val expected = perPart.filter { case (_, v) => BigInt(v) * 2 * n > total * 3 }
    val got = Relational.importantParts(spark, dir)
      .select($"p_partkey".as[Long], $"value_e4".as[Long]).collect().toMap
    assert(got == expected)
  }

  test("Q13 shape: count distribution covers every customer; zero bucket only if earned") {
    val urgentPer = Tables.orders(spark, dir).where($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .select($"o_custkey".as[Long], $"n".as[Long]).collect().toMap
    val nCust = Tables.customer(spark, dir).count()
    val expected = Tables.customer(spark, dir).select($"c_custkey".as[Long]).collect()
      .map(c => urgentPer.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Relational.orderCountDistribution(spark, dir)
      .select($"c_count".as[Long], $"custdist".as[Long]).collect().toMap
    assert(got == expected)
    assert(got.values.sum == nCust, "every customer lands in exactly one bucket")
  }

  test("Q16 shape: distinct supplier counts match a driver-side pair recompute") {
    val partAttrs = Tables.part(spark, dir)
      .where($"p_brand" =!= "Brand#1" && $"p_size".between(1, 25))
      .select($"p_partkey".as[Long], $"p_brand".as[String], $"p_type".as[String],
        $"p_size".as[Int]).collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val excluded = Tables.supplier(spark, dir).where($"s_acctbal" < 0)
      .select($"s_suppkey".as[Long]).collect().toSet
    val expected = Tables.lineitem(spark, dir)
      .select($"l_partkey".as[Long], $"l_suppkey".as[Long]).distinct().collect()
      .filter { case (pk, sk) => partAttrs.contains(pk) && !excluded(sk) }
      .groupBy { case (pk, _) => partAttrs(pk) }.view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = Relational.supplierDiversity(spark, dir)
      .select($"p_brand".as[String], $"p_type".as[String], $"p_size".as[Int],
        $"supplier_cnt".as[Long]).collect()
      .map(r => ((r._1, r._2, r._3), r._4)).toMap
    assert(got == expected)
    assert(excluded.isEmpty || got.nonEmpty)
  }

  test("Q17 shape: the correlated avg threshold matches a driver-side recompute") {
    val brandParts = Tables.part(spark, dir).where($"p_brand" === "Brand#13")
      .select($"p_partkey".as[Long]).collect().toSet
    val items = Tables.lineitem(spark, dir)
      .select($"l_partkey".as[Long], $"l_quantity".as[Double], $"l_extendedprice".as[Double])
      .collect().filter(r => brandParts(r._1))
    // the engine's avg: exact decimal sum cast double / count — replay it
    val avgPer = items.groupBy(_._1).view.mapValues { vs =>
      (vs.map(v => BigDecimal(v._2).setScale(2)).sum.toDouble) / vs.length.toDouble
    }.toMap
    val kept = items.filter { case (pk, qty, _) => qty < avgPer(pk) * 0.2 }
    val expectE4 = kept.map(v => (BigDecimal(v._3).setScale(2) * 10000).toLongExact).sum
    val got = Relational.smallQtyRevenue(spark, dir)
      .select($"n_items".as[Long], $"revenue_e4".as[Long], $"avg_weekly".as[Double]).head()
    assert(got._1 == kept.length.toLong, s"n_items ${got._1} != ${kept.length}")
    assert(got._2 == expectE4)
    assert(got._3 == BigDecimal(got._2.toDouble / 7.0 / 10000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
