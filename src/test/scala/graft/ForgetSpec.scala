package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Forget}

/** The cross-artifact forget composition (VERDICT r8 item 4) and the
  * id-set fingerprint contract (r8 ADVICE): a forget spanning several
  * indexes must be resumable to the FULLY-forgotten state after a crash
  * between per-index swaps, and a resume with a different id set must
  * fail loudly instead of filtering tables inconsistently.
  */
class ForgetSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val full = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
  private def corpus = full.where(col("doc_id") < 300)
  private def batch = full.where(col("doc_id") >= 300 && col("doc_id") < 360)
  private def forgetIds = corpus.where(col("doc_id") % 7 === 0).select(col("doc_id"))

  private def serve(idx: String) = Dedup.dedupAgainst(idx, batch, tau = 0.7)
    .select("doc_id", "exact_keeper", "near_keeper", "status")
    .as[(Long, Long, Long, String)].collect().toSet

  test("forgetEverywhere: crash between index swaps resumes to the fully-forgotten state") {
    val root = java.nio.file.Files.createTempDirectory("graft_fgt_all").toString
    val manifest = s"$root/_FORGET_MANIFEST"
    val targets = Seq(Forget.textDedupTarget(s"$root/i1"), Forget.textDedupTarget(s"$root/i2"))
    // crash simulation: only the FIRST index exists, so the composition
    // completes target 1 and dies on target 2 — exactly the mid-sequence
    // crash shape (index 1 forgotten, index 2 still serving the doc)
    Dedup.buildDedupIndex(corpus, s"$root/i1")
    val thrown = intercept[IllegalArgumentException] {
      Forget.forgetEverywhere(spark, manifest, forgetIds, targets)
    }
    assert(thrown.getMessage.contains("rebuild the index"))
    val fs = new org.apache.hadoop.fs.Path(manifest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(manifest)),
      "intent manifest must survive the crash — that is what makes it detectable")
    // a resume with a DIFFERENT id set must refuse
    val other = corpus.where(col("doc_id") % 5 === 0).select(col("doc_id"))
    val mismatch = intercept[IllegalArgumentException] {
      Forget.forgetEverywhere(spark, manifest, other, targets)
    }
    assert(mismatch.getMessage.contains("DIFFERENT id set"), mismatch.getMessage)
    // repair the world (build index 2) and resume with the SAME request:
    // both indexes end fully forgotten, the manifest is gone
    Dedup.buildDedupIndex(corpus, s"$root/i2")
    Forget.forgetEverywhere(spark, manifest, forgetIds, targets)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(manifest)),
      "manifest must drop only after every target swapped")
    Dedup.buildDedupIndex(corpus.where(col("doc_id") % 7 =!= 0), s"$root/ref")
    val want = serve(s"$root/ref")
    assert(serve(s"$root/i1") == want, "index 1 diverged from rebuild-on-filtered")
    assert(serve(s"$root/i2") == want,
      "index 2 (the one the crash left unfiltered) diverged from rebuild-on-filtered")
  }

  test("per-index _FORGET_IDS marker blocks a mid-crash rerun with different ids") {
    val root = java.nio.file.Files.createTempDirectory("graft_fgt_fp").toString
    Dedup.buildDedupIndex(corpus, s"$root/idx")
    // plant a crashed pass's marker with a different request's fingerprint
    val marker = new org.apache.hadoop.fs.Path(s"$root/idx", "_FORGET_IDS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, true)
    out.write("999:123456".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException] {
      Dedup.forgetFromDedupIndex(spark, s"$root/idx", forgetIds)
    }
    assert(e.getMessage.contains("DIFFERENT id set"), e.getMessage)
    // clearing the stale marker (operator resolves the crashed pass) lets
    // the forget run; on success the marker is gone again
    fs.delete(marker, false)
    Dedup.forgetFromDedupIndex(spark, s"$root/idx", forgetIds)
    assert(!fs.exists(marker), "completed forget must remove its id-set marker")
    Dedup.buildDedupIndex(corpus.where(col("doc_id") % 7 =!= 0), s"$root/ref")
    assert(serve(s"$root/idx") == serve(s"$root/ref"))
  }

  test("refused forget on a crashed build claims no marker; rebuild clears stale forget state") {
    // review finding: claiming _FORGET_IDS before validating the index
    // would poison every future forget after a rebuild
    val root = java.nio.file.Files.createTempDirectory("graft_fgt_pf").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // no index at all: the pass must refuse BEFORE writing its marker
    intercept[IllegalArgumentException] {
      Dedup.forgetFromDedupIndex(spark, s"$root/idx", forgetIds)
    }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/idx", "_FORGET_IDS")),
      "a refused pass must not leave an id-set marker behind")
    // a crashed forget's marker + staging survive until a REBUILD, which
    // wholesale-overwrites the tables and must clear both — a later
    // forget with a different id set is then legitimate
    Dedup.buildDedupIndex(corpus, s"$root/idx")
    val marker = new org.apache.hadoop.fs.Path(s"$root/idx", "_FORGET_IDS")
    val out = fs.create(marker, true); out.write("999:1".getBytes("UTF-8")); out.close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/idx", "sets__forgetting"))
    Dedup.buildDedupIndex(corpus, s"$root/idx")
    assert(!fs.exists(marker), "rebuild must clear a crashed forget's marker")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/idx", "sets__forgetting")),
      "rebuild must clear crashed forget staging")
    Dedup.forgetFromDedupIndex(spark, s"$root/idx",
      corpus.where(col("doc_id") % 5 === 0).select(col("doc_id")))
    Dedup.buildDedupIndex(corpus.where(col("doc_id") % 5 =!= 0), s"$root/ref5")
    assert(serve(s"$root/idx") == serve(s"$root/ref5"))
  }

  test("extend refuses an index whose forget crashed mid-pass") {
    val root = java.nio.file.Files.createTempDirectory("graft_fgt_ext").toString
    Dedup.buildDedupIndex(corpus, s"$root/idx")
    val marker = new org.apache.hadoop.fs.Path(s"$root/idx", "_FORGET_IDS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, true); out.write("1:2".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalArgumentException] {
      Dedup.extendDedupIndex(s"$root/idx", batch)
    }
    assert(e.getMessage.contains("incomplete"), e.getMessage)
    // resolving the crashed pass (here: clearing it) re-enables extend
    fs.delete(marker, false)
    Dedup.extendDedupIndex(s"$root/idx", batch)
  }

  test("one forget request spans BOTH retrieval artifacts (postings+doclens and the IVF vector table)") {
    // the GDPR story for the RAG serving pair: a single forgetEverywhere
    // manifest removes a document from the lexical index (both
    // doc_id-keyed tables) and its embedding twin from the vector store;
    // the hybrid serve afterwards equals a serve over indexes REBUILT on
    // the filtered corpus — and the quantizer (cent) is untouched, the
    // documented index-vs-model distinction
    import graft.operators.{TextAnalysis, EmbeddingSearch}
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val embV = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val root = java.nio.file.Files.createTempDirectory("graft_fgt_retr").toString
    TextAnalysis.buildBm25Index(docs, s"$root/bm")
    EmbeddingSearch.buildIvfIndex(embV, s"$root/ivf")
    val queries = docs.select(col("doc_id").as("query_id"), col("text"))
      .join(emb.select(col("vec_id").as("query_id"), col("embedding")), "query_id")
      .where(col("query_id") < 2)
    def serveRows(bm: String, ivf: String) =
      TextAnalysis.hybridServeBatch(queries, bm, ivf).collect().map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getDouble(4), r.getLong(5))
      }.toSet
    val before = serveRows(s"$root/bm", s"$root/ivf")
    // victim: a doc the serve currently returns, so the forget must move it
    val victim = before.map(_._2).min
    val centBefore = spark.read.parquet(s"$root/ivf/cent").collect().toSet
    // INDEPENDENT reference, snapshotted BEFORE the forget runs: the
    // lexical index rebuilt from the filtered corpus, and the vector
    // table hand-filtered under the SAME quantizer (record deletion
    // removes the record's row; it never retrains the model)
    TextAnalysis.buildBm25Index(docs.where(col("doc_id") =!= victim), s"$root/bm2")
    spark.read.parquet(s"$root/ivf/ivf").where(col("vec_id") =!= victim)
      .write.parquet(s"$root/ivf2/ivf")
    spark.read.parquet(s"$root/ivf/cent").write.parquet(s"$root/ivf2/cent")
    val wantRows = serveRows(s"$root/bm2", s"$root/ivf2")
    // the ids frame carries BOTH key columns (documents and embeddings
    // are id-aligned twins) — forgetEverywhere fingerprints each target's
    // keyCol over the same request frame
    Forget.forgetEverywhere(spark, s"$root/_MANIFEST",
      Seq(victim).toDF("doc_id").withColumn("vec_id", col("doc_id")),
      Seq(Forget.bm25Target(s"$root/bm"), Forget.ivfTarget(s"$root/ivf")))
    val after = serveRows(s"$root/bm", s"$root/ivf")
    assert(!after.exists(_._2 == victim),
      s"doc $victim still served after the cross-artifact forget")
    assert(after == wantRows,
      "post-forget hybrid serve diverged from the rebuilt-on-filtered reference")
    assert(spark.read.parquet(s"$root/ivf/cent").collect().toSet == centBefore,
      "forget must not touch the trained quantizer (index-vs-model distinction)")
  }

  test("id-set fingerprint is order- and duplication-independent, value-sensitive") {
    val a = Seq(3L, 1L, 2L).toDF("doc_id")
    val b = Seq(1L, 2L, 3L, 2L, 1L).toDF("doc_id")
    val c = Seq(1L, 2L, 4L).toDF("doc_id")
    import graft.operators.Forget.{idSetFingerprint => fp}
    assert(fp(a, "doc_id") == fp(b, "doc_id"),
      "same id set in different order/multiplicity must fingerprint identically")
    assert(fp(a, "doc_id") != fp(c, "doc_id"),
      "different id sets must fingerprint differently")
  }
}
