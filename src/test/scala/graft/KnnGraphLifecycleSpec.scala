package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EmbeddingSearch

/** The navigable graph's artifact lifecycle (r16, the r15 verdict's
  * item 3): build/extend with the frozen-quantizer exact-merge contract,
  * the crash contract, replay idempotence, and the staleness rule — the
  * IVF index's lifecycle disciplines applied to the last standing
  * artifact that lacked them.
  */
class KnnGraphLifecycleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vec(seed: Int, eps: Double = 0.0): Seq[Double] =
    (0 until 8).map(d => if (d == seed % 8) 1.0 + eps else 0.01)

  private def vecsDf(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "v")

  private def edgeRows(path: String): Set[(Long, Long, Double)] =
    spark.read.parquet(s"$path/edges")
      .select($"vec_id", $"nbr_id", $"cosine")
      .as[(Long, Long, Double)].collect().toSet

  test("extend is an EXACT merge under the frozen quantizer: build(all) == build(prefix) + extend(batch)") {
    val all = (0L to 19L).map(i => i -> vec(i.toInt, 0.002 * i))
    val (prefix, batch) = (all.take(14), all.drop(14))
    val root = java.nio.file.Files.createTempDirectory("graft_glc").toString
    // ONE quantizer for both sides (trained on the prefix — the frozen-
    // quantizer contract is exactly that extends never retrain)
    val cent = EmbeddingSearch.trainKmeansIndex(vecsDf(prefix), nClusters = 4)
    EmbeddingSearch.buildKnnGraphFrom(vecsDf(all), cent, np = 2, kBuild = 3,
      s"$root/full", trainedN = all.size)
    EmbeddingSearch.buildKnnGraphFrom(vecsDf(prefix), cent, np = 2, kBuild = 3,
      s"$root/inc", trainedN = prefix.size)
    EmbeddingSearch.extendKnnGraph(s"$root/inc", vecsDf(batch))
    assert(edgeRows(s"$root/inc") == edgeRows(s"$root/full"),
      "extend drifted from the from-scratch build under the same frozen quantizer")
    // the extend→serve witness: batch vertices are reachable — each has
    // an out-edge list, and some EXISTING vertex gained a batch neighbor
    // only a merged edge partition can carry
    val inc = edgeRows(s"$root/inc")
    val batchIds = batch.map(_._1).toSet
    assert(batchIds.forall(b => inc.exists(_._1 == b)),
      "an appended vector has no merged out-edges")
    assert(inc.exists(e => !batchIds(e._1) && batchIds(e._2)),
      "no existing vertex gained a batch neighbor — the merge never rewrote live lists")
    // micro-batch extends == the one-batch extend (the StreamingSpec
    // discipline): same final edge set
    EmbeddingSearch.buildKnnGraphFrom(vecsDf(prefix), cent, np = 2, kBuild = 3,
      s"$root/micro", trainedN = prefix.size)
    for (b <- batch.grouped(2).toSeq)
      EmbeddingSearch.extendKnnGraph(s"$root/micro", vecsDf(b))
    assert(edgeRows(s"$root/micro") == edgeRows(s"$root/full"),
      "micro-batch extends drifted from the one-batch extend")
    // verts carries every vector's memberships; params grew total_n
    assert(spark.read.parquet(s"$root/inc/verts").select("vec_id")
      .distinct().count() == all.size)
    val prm = spark.read.parquet(s"$root/inc/params").collect()(0)
    assert(prm.getAs[Long]("total_n") == all.size &&
      prm.getAs[Long]("trained_n") == prefix.size)
  }

  test("crash contract, replay idempotence, and the staleness warning") {
    val root = java.nio.file.Files.createTempDirectory("graft_glc2").toString + "/g"
    val base = (0L to 9L).map(i => i -> vec(i.toInt))
    EmbeddingSearch.buildKnnGraph(vecsDf(base), root, kBuild = 3, nClusters = 4)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(org.apache.spark.sql.GraftShim.sessionHadoopConf())
    val done = new org.apache.hadoop.fs.Path(root, "_DONE")
    // crashed extend (no _DONE): extend AND the serve read refuse loudly
    fs.delete(done, false)
    val batch = vecsDf(Seq(100L -> vec(2, 0.01)))
    val e1 = intercept[IllegalArgumentException](
      EmbeddingSearch.extendKnnGraph(root, batch))
    assert(e1.getMessage.contains("buildKnnGraph"))
    val e2 = intercept[IllegalArgumentException](
      EmbeddingSearch.knnGraphEdges(spark, root))
    assert(e2.getMessage.contains("buildKnnGraph"))
    graft.operators.Markers.commit(fs, done)
    // replay idempotence: same token never double-appends; the
    // token-recorded/_DONE-down crash state self-heals
    EmbeddingSearch.extendKnnGraph(root, batch, Some("batch_0"))
    val after1 = edgeRows(root)
    EmbeddingSearch.extendKnnGraph(root, batch, Some("batch_0"))
    assert(edgeRows(root) == after1, "replayed graph extend changed the edge set")
    fs.delete(done, false)
    EmbeddingSearch.extendKnnGraph(root, batch, Some("batch_0"))
    assert(fs.exists(done) && edgeRows(root) == after1)
    // staleness: total_n >= 4x trained_n warns naming the rebuild remedy
    val big = vecsDf((200L until 240L).map(i => i -> vec(i.toInt, 0.001 * i)))
    val buf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    try EmbeddingSearch.extendKnnGraph(root, big, Some("batch_1"))
    finally System.setErr(realErr)
    val msg = buf.toString("UTF-8")
    assert(msg.contains("STALE") && msg.contains("buildKnnGraph"),
      s"no staleness warning naming the rebuild remedy; stderr was: $msg")
  }

  test("auto-compaction bounds files/dir across extends; compaction is row-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_glc3").toString + "/g"
    val base = (0L to 7L).map(i => i -> vec(i.toInt))
    EmbeddingSearch.buildKnnGraph(vecsDf(base), root, kBuild = 3, nClusters = 4)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(org.apache.spark.sql.GraftShim.sessionHadoopConf())
    // 18 extends all landing near seed 1: ONE cell's dirs accumulate a
    // file set per extend, so the >16-files/dir policy MUST trip inside
    // the extend loop (the IVF ingest discipline, measured not assumed)
    for (i <- 0 until 18)
      EmbeddingSearch.extendKnnGraph(root,
        vecsDf(Seq((100L + i) -> vec(1, 0.002 * (i + 1)))))
    def worstFiles(t: String, pk: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(root, t))
        .filter(e => !e.isFile && e.getPath.getName.startsWith(s"$pk="))
        .map(d => fs.listStatus(d.getPath).count(e =>
          e.isFile && !e.getPath.getName.startsWith("_") &&
            !e.getPath.getName.startsWith(".")))
        .foldLeft(0)(math.max)
    assert(worstFiles("verts", "cl") <= EmbeddingSearch.IvfCompactFileThreshold,
      s"verts never compacted: worst dir has ${worstFiles("verts", "cl")} files")
    assert(worstFiles("edges", "hc") <= EmbeddingSearch.IvfCompactFileThreshold,
      s"edges never compacted: worst dir has ${worstFiles("edges", "hc")} files")
    // an explicit compaction pass is row-identical on both tables
    val e0 = edgeRows(root)
    val v0 = spark.read.parquet(s"$root/verts")
      .select($"cl".cast("int"), $"vec_id", $"is_base")
      .as[(Int, Long, Boolean)].collect().toSet
    EmbeddingSearch.compactKnnGraph(spark, root)
    assert(edgeRows(root) == e0, "compaction changed the edge set")
    assert(spark.read.parquet(s"$root/verts")
      .select($"cl".cast("int"), $"vec_id", $"is_base")
      .as[(Int, Long, Boolean)].collect().toSet == v0,
      "compaction changed the membership table")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "_DONE")))
  }
}
