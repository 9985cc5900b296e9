package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The configurable artifact-store root (r16, the r15 verdict's item 2):
  * every standing artifact — sized quantizer, standing IVF index, BM25
  * postings, dedup index, navigable graph, fixture exports — must BUILD
  * and SERVE under a non-default `Tables.artifactRoot`, and the
  * stale-export reclaim must honor the same root. The spec drives the
  * REGISTERED entries (not the operators directly), so what's pinned is
  * the shipped wiring: `fingerprintedDir` and every marker probe /
  * reclaim going through the root and the Hadoop FS API.
  */
class ArtifactRootSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("resolution order: override > session conf > env > tmpdir") {
    val dflt = Tables.artifactRoot
    assert(dflt == System.getProperty("java.io.tmpdir"),
      "with nothing configured the root must stay tmpdir (local-mode default)")
    spark.conf.set("spark.graft.artifactRoot", "/x/conf")
    try {
      assert(Tables.artifactRoot == "/x/conf")
      Tables.artifactRootOverride = Some("/x/override")
      try assert(Tables.artifactRoot == "/x/override")
      finally Tables.artifactRootOverride = None
    } finally spark.conf.unset("spark.graft.artifactRoot")
    assert(Tables.artifactRoot == dflt)
  }

  test("every standing artifact builds, serves, and reclaims under a non-default root") {
    val root = java.nio.file.Files.createTempDirectory("graft_altroot").toString
    // a stale sibling under the ALTERNATE root: same prefix as the sized
    // quantizer but a superseded fingerprint — the reclaim must find it
    // under the configured root, not under tmpdir
    val staleName = "graft_kmidx_sized_i2_sf0.001_deadbeef"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, staleName))
    Tables.artifactRootOverride = Some(root)
    try {
      val entries = Seq(
        "embed_knn_kmeans_sized", // sized quantizer (graft_kmidx_sized_i2)
        "embed_knn_mips",         // standing IVF index (graft_ivfmeta_szi2)
        "text_bm25_serve",        // BM25 postings (graft_bm25idx)
        "dedup_incremental",      // dedup index (graft_dedupidx_s3h64b16k3)
        "embed_knn_graph_serve")  // navigable graph (graft_knngraph_k10)
      for (e <- entries)
        assert(SparkEntry.queries(e)(spark, dir).count() > 0,
          s"$e returned no rows under the alternate root")
      val built = new java.io.File(root).list().toSeq
      for (prefix <- Seq("graft_kmidx_sized_i2_", "graft_ivfmeta_szi2_",
          "graft_bm25idx_", "graft_dedupidx_s3h64b16k3_", "graft_knngraph_k10_"))
        assert(built.exists(_.startsWith(prefix)),
          s"no artifact dir with prefix $prefix under the alternate root " +
            s"(found: ${built.mkString(", ")})")
      assert(!built.contains(staleName),
        "stale-fingerprint reclaim did not honor the configured root")
      // serve-again under the same root: artifacts are found, not rebuilt
      // (the quantizer training counter is the build witness)
      val before = graft.operators.EmbeddingSearch.kmeansTrainings.get()
      for (e <- entries)
        assert(SparkEntry.queries(e)(spark, dir).count() > 0)
      assert(graft.operators.EmbeddingSearch.kmeansTrainings.get() == before,
        "second serve under the same root retrained instead of reusing the artifact")
    } finally Tables.artifactRootOverride = None
  }
}
