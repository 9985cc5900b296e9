package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** SQL facade: register every engine table for an SF dir as a temp view and
  * run queries as plain SQL (with the graft_* functions available when the
  * session carries [[GraftExtensions]]). The events view is encoding-
  * adaptive; build the session with `spark.sql.legacy.parquet.nanosAsLong=
  * true` and `spark.sql.session.timeZone=UTC` so it registers whichever
  * physical timestamp encoding the testdata carries (see README).
  * The "switch from the reference" story for SQL-first users:
  *
  * {{{
  *   GraftSql.registerTables(spark, "/root/testdata/sf0.01")
  *   spark.sql(GraftSql.flagshipSql(queryDocId = 0))  // the BookQuery pipeline
  * }}}
  */
object GraftSql {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "documents", "embeddings")

  def registerTables(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    // the events view is encoding-adaptive (Events.events) but still needs
    // the right build-time conf for the encoding it finds (nanosAsLong for
    // ns-parquet, UTC session tz for TIMESTAMP_NTZ); a session without it
    // still gets every other view. ONLY that known missing-conf case is
    // downgraded to a skip note — a genuine schema-drift failure (the
    // targeted "testdata schema changed" probe, or an unknown ts encoding)
    // must surface, it is the drift signal the probe exists to raise
    try Events.eventsView(spark, dir)
    catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("build the SparkSession") =>
        System.err.println(s"[graft] skipping `events` view: ${e.getMessage}")
    }
  }

  private object Events {
    def eventsView(spark: SparkSession, dir: String): Unit =
      graft.operators.Events.events(spark, dir).createOrReplaceTempView("events")
  }

  /** The reference pipeline as one SQL statement (requires GraftExtensions
    * for graft_shingle_set). Same semantics as BookQuery.referenceScores.
    */
  def flagshipSql(queryDocId: Long = 0L): String =
    s"""WITH sh AS (
       |  SELECT doc_id, graft_shingle_set(text, 3) AS sh FROM documents),
       |q AS (SELECT sh AS q_sh, size(sh) AS q_len FROM sh WHERE doc_id = $queryDocId),
       |n AS (SELECT count(*) AS n FROM documents),
       |inter AS (
       |  SELECT d.doc_id, array_intersect(d.sh, q.q_sh) AS t, q.q_len
       |  FROM sh d CROSS JOIN q WHERE d.doc_id <> $queryDocId),
       |ex AS (
       |  SELECT doc_id, size(t) AS len, q_len, explode(t) AS term
       |  FROM inter WHERE size(t) > 0),
       |df AS (SELECT term, count(*) AS df_nq FROM ex GROUP BY term),
       |surv AS (
       |  SELECT ex.doc_id, ex.len, ex.q_len FROM ex
       |  JOIN df ON ex.term = df.term CROSS JOIN n
       |  WHERE df.df_nq <= n.n - 2),
       |agg AS (
       |  SELECT doc_id, len, q_len, count(*) AS sum_shared
       |  FROM surv GROUP BY doc_id, len, q_len)
       |SELECT doc_id, CAST(len AS BIGINT) AS len,
       |  CAST(sum_shared AS BIGINT) AS sum_shared,
       |  round(CASE WHEN sum_shared = len + q_len THEN 1.0
       |    ELSE CAST(sum_shared AS DOUBLE) / (len + q_len - sum_shared) END, 6) AS score
       |FROM agg""".stripMargin
}
