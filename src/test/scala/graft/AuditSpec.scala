package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Audit

/** The audit gate on DELIBERATELY DIRTIED data: every declared rule must
  * actually fire (a validator that never fails validates nothing), the
  * profile must count nulls/distincts/sums exactly, and building the
  * frames must not launch Spark jobs (the audit is ONE lazy DAG — the
  * eager-count-at-plan-build anti-pattern is the regression this guards).
  */
class AuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  import spark.implicits._

  // a tiny dirty star: 1 orphan FK per edge, 1 dup PK, 1 bad domain value
  // per rule, 1 null shipdate
  private def dirty() = {
    val li = Seq(
      // (orderkey, partkey, quantity, discount, shipdate)
      (1L, 10L, 5.0, 0.05, Date.valueOf("2024-01-01")),
      (1L, 10L, 2.0, 1.5, Date.valueOf("2024-01-02")),   // discount out of range
      (2L, 10L, -3.0, 0.0, Date.valueOf("2024-01-03")),  // non-positive qty
      (2L, 99L, 1.0, 0.0, Date.valueOf("2024-01-04")),   // orphan partkey
      (77L, 10L, 1.0, 0.0, null.asInstanceOf[Date]),     // orphan orderkey + null ship
    ).toDF("l_orderkey", "l_partkey", "l_quantity", "l_discount", "l_shipdate")
    val ord = Seq(
      (1L, 100L, 10.0), (1L, 100L, 20.0),                // dup PK
      (2L, 200L, -5.0),                                  // negative total
      (3L, 999L, 30.0),                                  // orphan custkey
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq((100L, "a"), (200L, "b")).toDF("c_custkey", "c_name")
    val part = Seq((10L, "p")).toDF("p_partkey", "p_name")
    (li, ord, cust, part)
  }

  test("constraint audit: every declared rule fires on dirtied data") {
    val (li, ord, cust, part) = dirty()
    val got = Audit.constraintViolationsFor(li, ord, cust, part)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "dom_discount_in_unit_range" -> 1L,
      "dom_quantity_positive" -> 1L,
      "nn_shipdate_not_null" -> 1L,
      "pk_orders_unique" -> 1L,
      "dom_totalprice_nonnegative" -> 1L,
      "fk_lineitem_orderkey" -> 1L,
      "fk_lineitem_partkey" -> 1L,
      "fk_orders_custkey" -> 1L))
  }

  test("constraint audit: fixture star is clean (all zeros)") {
    val got = Audit.constraintViolations(spark, dir)
      .as[(String, Long)].collect()
    assert(got.length == 8)
    got.foreach { case (c, n) => assert(n == 0L, s"$c reported $n violations") }
    // and the output is ordered by constraint name (the oracle's ORDER BY)
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
  }

  test("profile: exact counts, nulls, distincts, and decimal sums") {
    val df = Seq(
      (Some(1.5), 2.0), (Some(1.5), 3.0), (None, 4.0), (Some(-2.25), 0.1),
    ).toDF("a", "b")
    val got = Audit.numericProfile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == ("a", 4L, 1L, 2L, Some(-2.25), Some(1.5), Some(0.75)))
    assert(got("b") == ("b", 4L, 0L, 4L, Some(0.1), Some(4.0), Some(9.1)))
  }

  test("audit frames build lazily — no Spark job fires at plan time") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val (li, ord, cust, part) = dirty()
    val frame = Audit.constraintViolationsFor(li, ord, cust, part)
    val profile = Audit.numericProfile(li, Seq("l_quantity"))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"building audit frames launched ${after - before} Spark job(s)")
    // both frames still produce when actually run
    assert(frame.count() == 8 && profile.count() == 1)
  }
}
