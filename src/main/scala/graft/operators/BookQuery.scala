package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The reference engine's entire query capability: score every corpus
  * document against one query document by (approximate) Jaccard similarity of
  * 3-word shingle sets.
  *
  * Reference pipeline (BookQuery.java, two chained MR jobs + three HDFS
  * materializations):
  *   job 1: per-doc shingle-set ∩ query-set (":77"), emit (term, doc@len)
  *          (":81-83"), group by term, drop groups of size 1 or n (":105").
  *   job 2: per surviving (term, doc) emit 1 keyed by (doc,len,|Q|)
  *          (":143-147"), sum (":154-158"), score = sum/(len+|Q|-sum) with a
  *          ==-guard returning 1 (":162-166").
  *
  * Here it is ONE lazy DataFrame DAG with exactly two exchanges:
  *   1. hash-partition by `term` for the document-frequency count;
  *   2. hash-partition by `doc_id` for the final score aggregation.
  * The query side is a one-row broadcast (the Spark analog of the reference
  * stuffing the query text into the job `Configuration`, ":205"), and the
  * per-term df table is broadcast back for the filter join — it is bounded by
  * |Q| (the query's shingle count), never by corpus size, so this plan holds
  * at 100 TB: corpus rows stream map-side, shuffle volume is
  * O(Σ_D |sh(D) ∩ Q|) exactly like the reference's map-side pruning, and no
  * collect touches the driver.
  *
  * IMPORTANT semantic note (SURVEY.md §0.1): the reference's score is NOT
  * true Jaccard — the denominator uses len_D = |sh(D) ∩ Q| in place of
  * |sh(D)|, so absent stop-shingle hits it reduces to the query-containment
  * coefficient |sh(D) ∩ Q| / |Q|. [[referenceScores]] reproduces that formula
  * bit-for-bit; [[jaccardScores]] is the principled variant the reference
  * intended (comment at BookQuery.java:165).
  */
object BookQuery {

  /** Per-document intermediate: doc_id, its query-intersected shingle set and
    * size, and the query set size — rows with empty intersection dropped
    * (they can never score, same as the reference never emitting them).
    */
  private def intersected(docs: DataFrame, queryDocId: Column, k: Int): DataFrame = {
    val query = broadcast(
      docs.where(col("doc_id") === queryDocId)
        .select(shingleSet(col("text"), k).as("q_sh"))
        .withColumn("q_len", size(col("q_sh"))))
    docs.where(col("doc_id") =!= queryDocId)
      .select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
      .crossJoin(query) // 1-row broadcast: BroadcastNestedLoopJoin, no shuffle
      .select(
        col("doc_id"),
        array_intersect(col("sh"), col("q_sh")).as("t"), // BookQuery.java:77 retainAll
        col("q_len"))
      .withColumn("len", size(col("t")))
      .where(col("len") > 0)
  }

  /** Reference-exact scores. `n` (corpus cardinality incl. the query doc,
    * BookQuery.java:211-214, via `ContentSummary`) is a 1-row global
    * aggregate folded INTO the DAG as a broadcast scalar — the whole query
    * is one lazy job (constructing the DataFrame runs nothing; the
    * historical driver-side count() ran an eager extra job at plan-build
    * time). Output: (doc_id, len, sum_shared, score).
    */
  def referenceScores(docs: DataFrame, queryDocId: Long = 0L, k: Int = 3): DataFrame =
    referenceScoresFor(docs, lit(queryDocId), k)

  /** Generalized over any doc_id type (the CLI/wholetext form keys documents
    * by basename string, reference `equals("query")` at BookQuery.java:144).
    */
  def referenceScoresFor(docs: DataFrame, queryDocId: Column, k: Int = 3): DataFrame = {
    // guaranteed 1 row (global aggregate), so the broadcast hint can never
    // OOM an executor; its exchange is SinglePartition — one long crosses
    // the wire, metadata-scale, not a data shuffle
    val nRow = broadcast(docs.agg(count(lit(1)).as("__n")))
    // ONE corpus pass (r17): `ex` — the reference's own job-1 output, which
    // it materializes to HDFS between its two MR jobs — feeds BOTH the df
    // aggregation and the final scoring rollup; without the checkpoint each
    // action re-ran the scan + shingle + intersect subtree once per
    // consumer. Lazy (the df broadcast build is the first consumer and
    // materializes it inside the action); size is the reference's own
    // intermediate bound O(Σ_D |sh(D) ∩ Q|), spill-safe storage.
    val ex = intersected(docs, queryDocId, k)
      .select(col("doc_id"), col("len"), col("q_len"), explode(col("t")).as("term"))
      .localCheckpoint(eager = false)
    // df over NON-query docs; the query trivially holds every surviving term
    // (t ⊆ Q), so reference df = df_nq + 1. Reference filter (":105") keeps
    // 2 <= df <= n-1  ⇔  1 <= df_nq <= n-2; the lower bound is implied
    // (a term only appears here if some non-query doc has it).
    val df = ex.groupBy("term").agg(count(lit(1)).as("df_nq"))
      .crossJoin(nRow) // |Q|-bounded rows × 1 row
      .where(col("df_nq") <= col("__n") - 2)
      .select(col("term"), col("df_nq"))
    ex.join(broadcast(df), "term") // |df| ≤ |Q| ⇒ broadcast, no re-shuffle of ex
      .groupBy("doc_id", "len", "q_len")
      .agg(count(lit(1)).as("sum_shared")) // BookQuery.java:154-158
      .select(
        col("doc_id"),
        col("len").cast("long").as("len"), // long: DuckDB len(list) is BIGINT
        col("sum_shared"),
        round(referenceScore(col("sum_shared"), col("len"), col("q_len")), 6).as("score"))
  }

  /** BATCH scoring — the reference pipeline generalized from one query
    * document to a query SET, amortizing the corpus scan the reference
    * re-runs per query (its driver is invoked once per query document;
    * BookQuery.java:176-208): every (corpus doc, query) pair scores with
    * the EXACT per-query reference semantics — the df table and the
    * df ≤ n−2 stop-shingle filter are computed per query over the docs
    * that aren't it, so each query's scores equal a standalone
    * [[referenceScoresFor]] run bit-for-bit (spec-asserted). Plan shape
    * unchanged: queries ride as one ≤\|Q\|-row broadcast, the df table is
    * (query × term)-bounded and broadcast back, and the same two
    * exchanges carry keys widened by query_id — shuffle volume
    * O(Σ_D Σ_q \|sh(D)∩sh(q)\|), the batch form of the reference's own
    * bound. Output: (query_id, doc_id, len, sum_shared, score).
    */
  def referenceScoresBatch(docs: DataFrame, nQueries: Int = 3, k: Int = 3): DataFrame = {
    val nRow = broadcast(docs.agg(count(lit(1)).as("__n")))
    val queries = broadcast(docs.where(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), shingleSet(col("text"), k).as("q_sh"))
      .withColumn("q_len", size(col("q_sh"))))
    val ex = docs.select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
      .crossJoin(queries)
      .where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("q_len"),
        array_intersect(col("sh"), col("q_sh")).as("t"))
      .withColumn("len", size(col("t")))
      .where(col("len") > 0)
      .select(col("query_id"), col("doc_id"), col("len"), col("q_len"),
        explode(col("t")).as("term"))
      // same one-corpus-pass sharing as [[referenceScoresFor]] (r17): the
      // batch df table and the batch scoring rollup read one materialized
      // job-1 intermediate instead of re-scanning per consumer
      .localCheckpoint(eager = false)
    val df = ex.groupBy("query_id", "term").agg(count(lit(1)).as("df_nq"))
      .crossJoin(nRow)
      .where(col("df_nq") <= col("__n") - 2)
      .select(col("query_id"), col("term"))
    ex.join(broadcast(df), Seq("query_id", "term"))
      .groupBy("query_id", "doc_id", "len", "q_len")
      .agg(count(lit(1)).as("sum_shared"))
      .select(
        col("query_id"), col("doc_id"),
        col("len").cast("long").as("len"),
        col("sum_shared"),
        round(referenceScore(col("sum_shared"), col("len"), col("q_len")), 6).as("score"))
  }

  /** sum/(len+qlen−sum), guard → 1.0 when denominator would be 0
    * (BookQuery.java:162-166).
    */
  def referenceScore(sum: Column, len: Column, qlen: Column): Column =
    when(sum === len + qlen, lit(1.0))
      .otherwise(sum.cast("double") / (len + qlen - sum).cast("double"))

  /** True Jaccard |sh(D) ∩ Q| / |sh(D) ∪ Q| of every corpus doc vs the query
    * — the formula the reference intended (comment BookQuery.java:165). Pure
    * map-side: one broadcast, zero shuffles (the scan streams and scores).
    * Output: (doc_id, inter_len, union_len, jaccard).
    */
  def jaccardScores(docs: DataFrame, queryDocId: Long = 0L, k: Int = 3): DataFrame =
    jaccardScoresFor(docs, lit(queryDocId), k)

  def jaccardScoresFor(docs: DataFrame, queryDocId: Column, k: Int = 3): DataFrame = {
    val query = broadcast(
      docs.where(col("doc_id") === queryDocId)
        .select(shingleSet(col("text"), k).as("q_sh")))
    docs.where(col("doc_id") =!= queryDocId)
      .select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
      .crossJoin(query)
      .select(
        col("doc_id"),
        size(array_intersect(col("sh"), col("q_sh"))).as("inter_len"),
        (size(col("sh")) + size(col("q_sh")) - size(array_intersect(col("sh"), col("q_sh")))).as("union_len"))
      .where(col("inter_len") > 0)
      .select(
        col("doc_id"),
        col("inter_len").cast("long").as("inter_len"),
        col("union_len").cast("long").as("union_len"),
        round(col("inter_len").cast("double") / col("union_len").cast("double"), 6).as("jaccard"))
  }

  /** Ranked top-k — the query shape the reference's users actually wanted
    * (its output was unranked text lines; SURVEY.md §2.2). Deterministic
    * tie-break on doc_id.
    */
  def topK(scored: DataFrame, scoreCol: String, kTop: Int): DataFrame =
    scored.orderBy(col(scoreCol).desc, col("doc_id").asc).limit(kTop)

  /** Reference text-sink parity: the exact `"<doc> - query\t<score>"` lines
    * the reference's TextOutputFormat emits (key "doc - query", value score;
    * BookQuery.java:162-167,255). Write with `.write.text(dir)`.
    */
  def referenceOutputLines(scored: DataFrame): DataFrame =
    scored.select(concat(
      col("doc_id").cast("string"), lit(" - query"), lit("\t"),
      col("score").cast("string")).as("value"))
}
