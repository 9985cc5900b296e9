package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (parity
  * surface or mandated extension); [[oracleSql]] holds the DuckDB-equivalent
  * SQL over the same parquet tables. Column names and types are kept
  * identical between the Spark result and the oracle (the driver sorts
  * columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BookQuery.referenceScores(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "book_query_ref" -> ((s, dir) =>
      BookQuery.referenceScores(Tables.documents(s, dir))),
    "book_query_jaccard" -> ((s, dir) =>
      BookQuery.jaccardScores(Tables.documents(s, dir))),
  )

  /** DuckDB shingle CTEs shared by the text-similarity oracles: `sh` is
    * (doc_id, sh = distinct 3-gram list). Mirrors TextFunctions.shingleSet on
    * the clean (single-spaced, lowercase) `documents.text`.
    */
  private val shingleCte: String =
    """tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct(list_transform(generate_series(1, greatest(len(w)-2, 0)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM tok)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "book_query_ref" ->
      s"""WITH $shingleCte,
         |q AS (SELECT sh AS q_sh, len(sh) AS q_len FROM sh WHERE doc_id = 0),
         |nn AS (SELECT count(*) AS n FROM documents),
         |inter AS (SELECT d.doc_id, list_intersect(d.sh, q.q_sh) AS t, q.q_len
         |          FROM sh d, q WHERE d.doc_id <> 0),
         |ex AS (SELECT doc_id, len(t) AS len, q_len, unnest(t) AS term
         |       FROM inter WHERE len(t) > 0),
         |df AS (SELECT term, count(*) AS df_nq FROM ex GROUP BY 1),
         |surv AS (SELECT ex.doc_id, ex.len, ex.q_len FROM ex
         |         JOIN df USING (term), nn WHERE df.df_nq <= nn.n - 2),
         |agg AS (SELECT doc_id, len, q_len, count(*) AS sum_shared
         |        FROM surv GROUP BY 1, 2, 3)
         |SELECT doc_id, len, CAST(sum_shared AS BIGINT) AS sum_shared,
         |  round(CASE WHEN sum_shared = len + q_len THEN 1.0
         |    ELSE CAST(sum_shared AS DOUBLE) / (len + q_len - sum_shared) END, 6) AS score
         |FROM agg""".stripMargin,
    "book_query_jaccard" ->
      s"""WITH $shingleCte,
         |q AS (SELECT sh AS q_sh FROM sh WHERE doc_id = 0)
         |SELECT d.doc_id,
         |  len(list_intersect(d.sh, q.q_sh)) AS inter_len,
         |  len(d.sh) + len(q.q_sh) - len(list_intersect(d.sh, q.q_sh)) AS union_len,
         |  round(CAST(len(list_intersect(d.sh, q.q_sh)) AS DOUBLE)
         |    / (len(d.sh) + len(q.q_sh) - len(list_intersect(d.sh, q.q_sh))), 6) AS jaccard
         |FROM sh d, q WHERE d.doc_id <> 0 AND len(list_intersect(d.sh, q.q_sh)) > 0""".stripMargin,
  )
}
