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
  * columns by name and hash-compares values). Hash-based operators (MinHash,
  * SimHash, fingerprints) use the engine-portable integer hash family in
  * [[graft.functions.HashFunctions]] precisely so they remain oracle-exact.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BookQuery.referenceScores(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity (SURVEY.md §2.1) —
    "book_query_ref" -> ((s, dir) =>
      BookQuery.referenceScores(Tables.documents(s, dir))),
    "book_query_jaccard" -> ((s, dir) =>
      BookQuery.jaccardScores(Tables.documents(s, dir))),
    // — generalized similarity join (SURVEY.md §7.3) —
    "simjoin_allpairs" -> ((s, dir) =>
      SimilarityJoin.allPairsJaccard(Tables.documents(s, dir), tau = 0.7)),
    // — dedup surface (SURVEY.md §7.4) —
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir))),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), tau = 0.7)),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), maxDist = 3)),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), tau = 0.2, n = 2)),
    // — text analysis (SURVEY.md §7.6) —
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityStats(Tables.documents(s, dir))),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.languageId(Tables.documents(s, dir))),
    "text_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.documents(s, dir))),
    "text_fingerprints" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir))),
    "text_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), kTop = 3)),
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB CTEs shared by the text oracles. `tok`: (doc_id, w = token
    * list); `sh`: (doc_id, sh = distinct 3-shingle list). `documents.text`
    * is clean single-spaced lowercase (verified), so string_split mirrors
    * the engine's Java-\W+ tokenizer exactly on this data.
    */
  private def shingleCte(k: Int): String = {
    val gram = (1 to k).map(j => if (j == 1) "w[i]" else s"w[i+${j - 1}]").mkString(" || ' ' || ")
    s"""tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct(list_transform(generate_series(1, greatest(len(w)-${k - 1}, 0)),
       |    i -> $gram)) AS sh FROM tok)""".stripMargin
  }

  /** Portable rolling hash of a string `s` (mirrors HashFunctions.portableHash31). */
  private def duckHash(s: String): String =
    s"list_reduce(list_transform(generate_series(1, len($s)), ci -> ascii($s[ci])::BIGINT), (a, b) -> (a*31 + b) % 2147483647)"

  /** Exact-Jaccard pair verification tail shared by the pair-emitting
    * oracles; expects CTEs `sets`(doc_id, sh) and `cand`(doc_a, doc_b).
    */
  private def verifyTail(tau: Double): String =
    s"""SELECT doc_a, doc_b,
       |  len(list_intersect(sa.sh, sb.sh))::BIGINT AS inter_len,
       |  (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::BIGINT AS union_len,
       |  round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
       |    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
       |FROM cand JOIN sets sa ON cand.doc_a = sa.doc_id
       |          JOIN sets sb ON cand.doc_b = sb.doc_id
       |WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
       |    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= $tau""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "book_query_ref" ->
      s"""WITH ${shingleCte(3)},
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
      s"""WITH ${shingleCte(3)},
         |q AS (SELECT sh AS q_sh FROM sh WHERE doc_id = 0)
         |SELECT d.doc_id,
         |  len(list_intersect(d.sh, q.q_sh)) AS inter_len,
         |  len(d.sh) + len(q.q_sh) - len(list_intersect(d.sh, q.q_sh)) AS union_len,
         |  round(CAST(len(list_intersect(d.sh, q.q_sh)) AS DOUBLE)
         |    / (len(d.sh) + len(q.q_sh) - len(list_intersect(d.sh, q.q_sh))), 6) AS jaccard
         |FROM sh d, q WHERE d.doc_id <> 0 AND len(list_intersect(d.sh, q.q_sh)) > 0""".stripMargin,
    "simjoin_allpairs" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
         |${verifyTail(0.7)}""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_copies,
        |  min(doc_id) AS keeper FROM documents GROUP BY 1""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |hs AS (SELECT doc_id, list_transform(sh, t -> ${duckHash("t")}) AS hset FROM sets),
         |sig AS (SELECT doc_id, list_transform(generate_series(0, 63),
         |  i -> list_min(list_transform(hset, h -> (h*(2*i+1) + (12345 + 67891*i)) % 2147483647))) AS sig
         |  FROM hs),
         |bands AS (SELECT doc_id, unnest(list_transform(generate_series(0, 15),
         |  b -> b::VARCHAR || ':' || array_to_string(list_transform(
         |    list_slice(sig, b*4+1, b*4+4), v -> v::VARCHAR), '_'))) AS band FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
         |${verifyTail(0.7)}""".stripMargin,
    "dedup_simhash" ->
      s"""WITH ${shingleCte(3)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |hs AS (SELECT doc_id, list_transform(sh, t -> ${duckHash("t")}) AS hset FROM sets),
         |fpt AS (SELECT doc_id, list_sum(list_transform(generate_series(0, 47), j ->
         |  CASE WHEN list_sum(list_transform(hset,
         |    h -> ((h*(2*j+3) + (999 + 7919*j)) % 2147483647 % 2) * 2 - 1)) > 0
         |  THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT AS fp FROM hs),
         |chunked AS (SELECT doc_id, fp, unnest(list_transform(generate_series(0, 3),
         |  c -> c::VARCHAR || ':' || ((fp >> (c*12)) & 4095)::VARCHAR)) AS chunk FROM fpt),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
         |  FROM chunked a JOIN chunked b ON a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH ${shingleCte(2)},
         |sets AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
         |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
         |${verifyTail(0.2)}""".stripMargin,
    "text_quality" ->
      """WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  len(w)::BIGINT AS n_tokens,
        |  length(text)::BIGINT AS n_chars_measured,
        |  len(list_distinct(w))::BIGINT AS n_distinct_tokens,
        |  len(list_intersect(list_distinct(w),
        |    ['the','a','an','of','and','or','to','in','is','it']))::BIGINT AS n_stopword_types,
        |  round(len(list_distinct(w))::DOUBLE / len(w)::DOUBLE, 6) AS type_token_ratio,
        |  round((length(text) - (len(w) - 1))::DOUBLE / len(w)::DOUBLE, 6) AS avg_token_len,
        |  round((len(list_distinct(w))::DOUBLE / len(w)::DOUBLE
        |    + (1.0 - n_stopword_types::DOUBLE / len(list_distinct(w))::DOUBLE)
        |    + least(len(w)::DOUBLE, 100.0) / 100.0) / 3.0, 6) AS quality_score
        |FROM tok""".stripMargin,
    "text_langid" ->
      """WITH tok AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS w FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  len(list_intersect(w, ['the','a','an','of','and','or','to','in','is','it']))::BIGINT AS en_hits,
        |  len(list_intersect(w, ['el','la','de','y','o','en','es','un','una','que']))::BIGINT AS es_hits,
        |  len(list_intersect(w, ['le','la','de','et','ou','en','est','un','une','que']))::BIGINT AS fr_hits
        |  FROM tok)
        |SELECT doc_id, lang AS labeled_lang, en_hits, es_hits, fr_hits,
        |  CASE WHEN greatest(en_hits, es_hits, fr_hits) = 0 THEN 'und'
        |       WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
        |       WHEN es_hits >= fr_hits THEN 'es'
        |       ELSE 'fr' END AS pred_lang
        |FROM sc""".stripMargin,
    "text_token_counts" ->
      """SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS bpe_ish_tokens,
        |  round(length(text)::DOUBLE
        |    / greatest(len(string_split(text, ' ')), 1)::DOUBLE, 6) AS chars_per_ws_token
        |FROM documents""".stripMargin,
    "text_fingerprints" ->
      s"""SELECT doc_id,
         |  ${duckHash("text")} AS rolling_fp,
         |  md5(text) AS md5_fp,
         |  ${duckHash("array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')")} AS bow_fp
         |FROM documents""".stripMargin,
    "text_tfidf_topk" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY 1, 2),
        |dfT AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms GROUP BY 1),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfT.df,
        |  round(tf.tf::DOUBLE * ln(nn.n / dfT.df::DOUBLE), 6) AS tfidf
        |  FROM tf JOIN dfT USING (term), nn),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC)::BIGINT AS rank FROM scored)
        |SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= 3""".stripMargin,
  )
}
