package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the embedding column (`embeddings.parquet`:
  * vec_id, embedding array<float> ×64, label).
  *
  * Two paths, per the scale mandate:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     Query set × corpus via broadcast of the (small) query side; per-pair
  *     cosine is a codegen'd HOF fold; top-k per query is a bounded window.
  *   - [[lshTopK]]: random-hyperplane LSH (SimHash for vectors, Charikar'02)
  *     — signs of 16 fixed ±1 hyperplane projections, banded 4×4; candidates
  *     share a band key, then exact re-rank. At 100 TB the corpus-side work
  *     drops from |Q|·N cosines to |Q|·(bucket size), and the bucket join is
  *     a hash shuffle on short string keys instead of a cross join.
  *
  * The hyperplanes are a deterministic pseudo-random ±1 pattern
  * (parity of (p·2654435761 + d·40503) mod 65537) — engine-portable integer
  * arithmetic, so the DuckDB oracle reproduces the EXACT same buckets.
  * All float math is done in double after exact float→double casts, with
  * sequential fold order — bit-identical across engines.
  */
object EmbeddingSearch {

  /** Sequential-fold dot product of two double arrays. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def toDouble(a: Column): Column = transform(a, _.cast("double"))

  /** cosine(a, b) in pure HOF arithmetic; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Exact top-k neighbors by cosine for query vectors vec_id < nQueries.
    * Output: (query_id, vec_id, cosine, rank). Rank on rounded score with
    * vec_id tie-break → fully deterministic.
    */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val queries = broadcast(emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    val scored = emb.crossJoin(queries)
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("v"), col("qv")), 6).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** 16-bit hyperplane signature of a double vector (native kernel —
    * [[graft.functions.expressions.HyperplaneSignature]]; weights are the
    * deterministic ±1 parity pattern shared with the DuckDB oracle).
    */
  def lshSignature(v: Column, nPlanes: Int = 16): Column = {
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    toColumn(graft.functions.expressions.HyperplaneSignature(toExpression(v), nPlanes))
  }

  /** 4 band keys ("b:bit,bit,bit,bit") over the 16-bit signature. */
  def lshBandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(3)), b =>
      concat_ws(":", b.cast("string"),
        concat_ws(",", transform(slice(sig, b * lit(4) + 1, lit(4)), _.cast("string")))))

  /** ANN top-k: candidates share ≥1 of 4 LSH band keys with the query,
    * re-ranked by exact cosine. Same output shape as [[bruteForceTopK]]
    * (rank ≤ k within the candidate set).
    */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bands", lshBandKeys(lshSignature(col("v"))))
    val corpus = emb.select(col("vec_id"), col("v"), explode(col("bands")).as("band"))
    val queries = broadcast(emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), explode(col("bands")).as("band")))
    val cand = corpus.join(queries, "band")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("v"), col("qv"))
      .distinct()
    val scored = cand.select(col("query_id"), col("vec_id"),
      round(cosine(col("v"), col("qv")), 6).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF-style ANN: a coarse quantizer (per-label centroid — exact,
    * order-independent decimal means, so the index is deterministic and
    * oracle-checkable) routes each query to its `nprobe` closest cells;
    * only those cells' vectors are re-ranked exactly. At 100 TB: centroids
    * are one tiny broadcast; the corpus is scanned with a `label IN (...)`
    * semi-join instead of |Q|·N cosines — the classic inverted-file trade.
    * Output shape matches [[bruteForceTopK]].
    */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
      nprobe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    // exact centroids: per (label, dim), mean of values rounded@6 summed in
    // decimal (associative) — bit-reproducible under any partitioning
    val cm = emb.select(col("label"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg((sum(round(col("x"), 6).cast("decimal(28,10)")).cast("double")
        / count(lit(1)).cast("double")).as("c"))
    val cent = cm.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        s => s.getField("c")).as("cv"))
    val q = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("csim").desc, col("label").asc)
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("label"),
        round(cosine(col("qv"), col("cv")), 6).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("label"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    emb.join(broadcast(probes), Seq("label"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("v"), col("qv")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Per-label corpus stats: count and exact (decimal-summed, order-
    * independent) mean/min/max of vector L2 norms — the IVF-style partition
    * profile (label plays the coarse-centroid role on this synthetic data).
    */
  def labelStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        round(sqrt(dot(toDouble(col("embedding")), toDouble(col("embedding")))), 6).as("norm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(sum(col("norm").cast("decimal(18,6)")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_norm"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
}
