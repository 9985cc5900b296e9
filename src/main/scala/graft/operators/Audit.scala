package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-audit surface: the pre-publish gate a 100 TB ingest runs before a
  * snapshot goes live — column profiling (the stats a human or an optimizer
  * reads first) and declared-constraint validation (the dbt-test/Deequ
  * shape: PK uniqueness, FK integrity, domain and non-null rules as
  * violation COUNTS, so the gate is "all zeros or no publish").
  *
  * Both are audit PASSES, not row transforms: profile is ONE aggregation
  * over the table (all columns in a single scan — never one job per
  * column), constraints are one conditional-sum scan per table plus one
  * anti-join per FK edge. At 100 TB that is the floor: every check needs
  * the rows it checks, and nothing here shuffles more than the FK
  * mismatch sets.
  */
object Audit {

  /** Numeric column profile as ONE aggregation: per column — row count,
    * nulls, distinct count, min/max, and a DECIMAL-exact sum (the four
    * doubles are 2-decimal money/rate values, so the decimal sum is exact
    * and order-independent — hash-gateable). The multi-column distinct
    * counts plan as one Expand aggregation: a constant fan-out factor per
    * row, one shuffle total, not a job per column.
    * Output: (col_name, n_rows, n_null, n_distinct, min_val, max_val,
    * sum_val) — one row per profiled column.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
        sum(col(c).cast("decimal(28,6)")).cast("double").as(s"${c}__sum"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      row.select(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").cast("double").as("min_val"),
        col(s"${c}__max").cast("double").as("max_val"),
        col(s"${c}__sum").as("sum_val"))
    }.reduce(_ unionByName _)
  }

  /** The lineitem money/rate/quantity profile — the registered audit entry. */
  def lineitemProfile(spark: SparkSession, dir: String): DataFrame =
    numericProfile(Tables.lineitem(spark, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  private def violations(name: String, n: Column): Column =
    struct(lit(name).as("constraint"), n.cast("long").as("n_violations"))

  /** Declared-constraint validation over the star schema, as violation
    * counts: PK uniqueness (rows − distinct keys), FK integrity (anti-join
    * mismatch counts on each declared edge), and domain/non-null rules
    * (conditional sums — ALL of a table's row-local rules ride one scan).
    * A clean snapshot is all zeros; the spec proves each rule actually
    * fires on deliberately dirtied data. Output: (constraint,
    * n_violations), one row per declared rule, ordered by name.
    */
  def constraintViolations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val part = Tables.part(spark, dir)

    // row-local rules: one conditional-sum scan per table
    val liRules = li.agg(
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L).otherwise(0L))
        .as("dom_discount_in_unit_range"),
      sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("dom_quantity_positive"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("nn_shipdate_not_null"))
    val ordRules = ord.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_orders_unique"),
      sum(when(col("o_totalprice") < 0.0, 1L).otherwise(0L)).as("dom_totalprice_nonnegative"))

    // FK edges: anti-join mismatch counts (AQE broadcasts the dim side)
    def fkCount(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String): Column = {
      val n = fact.join(dim, fact(factKey) === dim(dimKey), "left_anti").count()
      lit(n)
    }
    val rows = Seq(
      liRules.select(explode(array(
        violations("dom_discount_in_unit_range", col("dom_discount_in_unit_range")),
        violations("dom_quantity_positive", col("dom_quantity_positive")),
        violations("nn_shipdate_not_null", col("nn_shipdate_not_null")))).as("r")),
      ordRules.select(explode(array(
        violations("pk_orders_unique", col("pk_orders_unique")),
        violations("dom_totalprice_nonnegative", col("dom_totalprice_nonnegative")))).as("r")),
      li.sparkSession.range(1).select(
        violations("fk_lineitem_orderkey", fkCount(li, "l_orderkey", ord, "o_orderkey")).as("r")),
      li.sparkSession.range(1).select(
        violations("fk_lineitem_partkey", fkCount(li, "l_partkey", part, "p_partkey")).as("r")),
      ord.sparkSession.range(1).select(
        violations("fk_orders_custkey", fkCount(ord, "o_custkey", cust, "c_custkey")).as("r")))
    rows.reduce(_ unionByName _)
      .select(col("r.constraint").as("constraint"), col("r.n_violations").as("n_violations"))
      .orderBy(col("constraint"))
  }
}
