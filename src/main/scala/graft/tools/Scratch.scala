package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main: per-query wall time at a given SF, printed as each
  * query finishes (the real Bench prints one JSON line at the end — this is
  * for finding hotspots interactively). Not part of the engine surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
    // A/B experiment hook: GRAFT_EXTRA_CONF="key=value;key=value" lands in
    // the session builder — probe-only, the product mains never read it.
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1) == "slopeprobe") {
      // r15 (the r14 verdict's item 6): the two super-linear x16→x64
      // rows — is the growth CANDIDATE volume (an algorithmic width
      // problem) or engine overhead at fixed volume (spill/skew)?
      import org.apache.spark.sql.functions._
      import graft.operators.EmbeddingSearch
      for (xdir <- Seq("/tmp/graft_scale/x16", "/tmp/graft_scale/x64")) {
        // dedup_embedding: band-join candidate pairs at the sized width
        val emb = graft.sources.Tables.embeddings(spark, xdir)
        val n = emb.count()
        val rpb = EmbeddingSearch.lshRowsPerBand(n, 32)
        val t0 = System.nanoTime()
        val cands = EmbeddingSearch.bandCandidateCountProbe(spark, xdir, 8 * rpb, 8)
        println(f"[slopeprobe] $xdir n=$n rpb=$rpb embCandPairs=$cands " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
        // simjoin_containment: prefix-token candidate pairs (rows vs distinct)
        val t1 = System.nanoTime()
        val docs = graft.sources.Tables.documents(spark, xdir)
        val (cc, dd) = graft.operators.SimilarityJoin.containmentCandidateCountProbe2(docs)
        println(f"[slopeprobe] $xdir containCandRows=$cc distinctPairs=$dd wall=${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "deduprecall") {
      // r16 (the r15 verdict's top item): the banded-vs-cells PAIRS
      // recall curve that gates the dedup_embedding default flip — per
      // scale point, each arm's wall AND its probe-pair recall against
      // the exact τ-set on 100 probe vectors (micro recall =
      // Σhit/Σexact over probes; the arms find DIFFERENT pair sets, so
      // the wall inversion alone cannot justify the flip).
      import org.apache.spark.sql.functions._
      import graft.operators.EmbeddingSearch
      val tau = 0.4
      val src = "/root/testdata/sf0.1"
      val ks = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
        else Seq(1, 4, 16, 64)
      for (k <- ks) {
        val dir = if (k == 1) src
          else ScaleBench.scaledDocs(spark, src, k, "/tmp/graft_scale")
        val n = graft.sources.Tables.embeddingsCount(spark, dir)
        val idx = graft.SparkEntry.sizedKmeansIndexDirFor(dir)
        def measure(name: String, pairs: () => org.apache.spark.sql.DataFrame): Unit = {
          val wall = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            pairs().count()
            (System.nanoTime() - t0) / 1e9
          }.min
          val rec = EmbeddingSearch.nearDupPairsRecall(spark, dir, pairs(), tau)
            .agg(sum("n_exact"), sum("n_hit"),
              round(avg("recall"), 4), count(lit(1))).collect()(0)
          println(f"[deduprecall] x$k n=$n $name wall=$wall%.2f s " +
            s"exact=${rec.get(0)} hit=${rec.get(1)} " +
            f"micro=${rec.getLong(1).toDouble / rec.getLong(0)}%.4f " +
            s"macroAvg=${rec.get(2)} probesWithPairs=${rec.get(3)}")
        }
        measure("banded", () => EmbeddingSearch.cosineNearDupPairsScaled(spark, dir, tau))
        measure("cells ", () => EmbeddingSearch.cosineNearDupPairsCells(spark, dir, tau, idx))
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "ivfbuildsplit") {
      // r16 (the r15 verdict's item 5): the standing-index BUILD curve
      // with the phase split named — train (iters·n·k) vs assign (n·k)
      // vs the full build (train + assign + clustered write + idmap +
      // radii). Both named phases are N^1.5 at the sized k = ⌈√N⌉ —
      // this probe measures which dominates and what the write adds.
      // Optional 3rd arg: comma list of xK tags to run (default all 3).
      import org.apache.spark.sql.functions._
      import graft.operators.EmbeddingSearch
      val tags = if (args.length > 2) args(2).split(",").toSet
        else Set("256k", "512k", "1m")
      val dirs = Seq(
        "256k" -> "/tmp/graft_scale/x128",
        "512k" -> "/tmp/graft_scale/x256",
        "1m" -> "/tmp/graft_scale/mipswall_x512").filter(d => tags(d._1))
      for ((tag, dir) <- dirs) {
        val emb = graft.sources.Tables.embeddings(spark, dir)
          .select(col("vec_id"), transform(col("embedding"),
            x => x.cast("double")).as("v"))
        val n = emb.count()
        val cells = EmbeddingSearch.ivfCellCount(n)
        val (tt, ta) = EmbeddingSearch.ivfBuildSplitProbe(emb, cells)
        val idx = java.nio.file.Files.createTempDirectory("graft_bsp").toString + "/idx"
        val t2 = System.nanoTime()
        EmbeddingSearch.buildIvfIndex(emb, idx, cells)
        val tb = (System.nanoTime() - t2) / 1e9
        // sampled-training contrast: the 100 TB shape (Lloyd on the
        // deterministic 10% sample, assignment still full)
        val (tts, _) = EmbeddingSearch.ivfBuildSplitProbe(emb, cells,
          samplePct = 10)
        println(f"[ivfbuildsplit] $tag n=$n cells=$cells train=$tt%.1f s " +
          f"assign=$ta%.1f s buildTotal=$tb%.1f s trainSampled10=$tts%.1f s")
        org.apache.hadoop.fs.FileSystem.getLocal(
          org.apache.spark.sql.GraftShim.sessionHadoopConf())
          .delete(new org.apache.hadoop.fs.Path(idx).getParent, true)
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "mipswall") {
      // r15 (the r14 verdict's item 1): the MIPS brute↔IVF WALL inversion,
      // measured where it actually lives. The corpus-model replication is
      // honest to k = 4·dim = 256 (512k vectors — BENCH_SCALE x256); this
      // probe extends the WALL-ONLY curve to 1M vectors by cycling the
      // same inner-product-preserving transforms (reps >= 256 repeat
      // earlier replicas' angle structure verbatim — fine for wall
      // measurement, recalls not read here).
      import org.apache.spark.sql.functions._
      val k = 512
      val dir = s"/tmp/graft_scale/mipswall_x$k"
      if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
        val dimOf = size(col("embedding"))
        val rot = pmod(col("rep"), dimOf)
        val cyc = (col("rep") / dimOf).cast("int")
        val base0 = when(pmod(cyc, lit(4)) >= 2, reverse(col("embedding")))
          .otherwise(col("embedding"))
        val rotated = concat(slice(base0, rot + 1, dimOf - rot), slice(base0, lit(1), rot))
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("rep"))
          .select((col("vec_id") + col("rep").cast("long") * 10000000L).as("vec_id"),
            when(pmod(cyc, lit(2)) === 0, rotated)
              .otherwise(transform(rotated, x => -x)).as("embedding"),
            col("label"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      val n = graft.sources.Tables.embeddings(spark, dir).count()
      println(s"[mipswall] corpus n=$n")
      for (pass <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = graft.operators.EmbeddingSearch.mipsTopK(spark, dir).count()
        println(f"[mipswall] pass=$pass brute wall=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
      }
      val idx = graft.SparkEntry.standingIvfIndexDirFor(dir)
      val tb = System.nanoTime()
      graft.operators.EmbeddingSearch.ensureStandingIvfIndex(spark, dir, idx)
      println(f"[mipswall] standing index build: ${(System.nanoTime() - tb) / 1e9}%.2f s")
      for (pass <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = graft.operators.EmbeddingSearch.mipsStandingServe(spark, dir, idx).count()
        println(f"[mipswall] pass=$pass ivf wall=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "standingwall") {
      // r15 (the r14 verdict's item 2): per-entry wall of the standing
      // serves whose r14 fixed constants (probe-cell pre-collection job,
      // quantizer load, batch scan) regressed them vs the r13 per-call
      // walls — measured cold (pass 1 pays the one-time index build +
      // memo fills) and warm (the standing deployment's steady state).
      val idx = graft.SparkEntry.standingIvfIndexDirFor(sfDir)
      val entries = Seq("embed_knn_kmeans_sized", "embed_range_search",
        "embed_range_recall", "embed_knn_mips_ivf", "embed_knn_mips_alsh",
        "embed_knn_filtered", "embed_knn_mips_filtered")
      graft.operators.EmbeddingSearch.ensureStandingIvfIndex(spark, sfDir, idx)
      for (pass <- 1 to 3; name <- entries) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[standingwall] pass=$pass $name wall=${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "knnprobe") {
      // hypothesis probe for the embed_knn_join x16 slope: does the wall
      // time track the autoBroadcastJoinThreshold (vector-fetch joins
      // falling off broadcast), independent of candidate volume?
      for (thr <- Seq("10485760", "134217728"); pass <- 1 to 2) {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        val t0 = System.nanoTime()
        val n = graft.operators.EmbeddingSearch.knnJoinScaled(spark, sfDir).count()
        println(f"[knnprobe] thr=$thr pass=$pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "compactprobe") {
      // measured benefit of compactIvfIndex: standing-serve wall on a
      // 16-extend fragmented index vs the compacted rewrite of the SAME
      // contents (the SCALING.md compaction paragraph's number)
      import org.apache.spark.sql.functions._
      val root = java.nio.file.Files.createTempDirectory("graft_compactprobe")
        .toString + "/idx"
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = emb.count()
      graft.operators.EmbeddingSearch.buildIvfIndex(
        emb.where(pmod(col("vec_id"), lit(16)) === 0), root,
        graft.operators.EmbeddingSearch.ivfCellCount(n))
      for (q <- 1 to 15)
        graft.operators.EmbeddingSearch.extendIvfIndex(root,
          emb.where(pmod(col("vec_id"), lit(16)) === q))
      def files(): Int = new java.io.File(s"$root/ivf").listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("cl="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
      val queries = graft.sources.Tables.embeddings(spark, sfDir)
        .where(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
      def serve(tag: String): Unit = for (pass <- 1 to 3) {
        val t0 = System.nanoTime()
        val rows = graft.operators.EmbeddingSearch
          .knnBatchAgainstIvfIndex(queries, root).count()
        println(f"[compactprobe] $tag pass $pass: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      }
      println(s"[compactprobe] n=$n files before=${files()}")
      serve("fragmented")
      val t0 = System.nanoTime()
      graft.operators.EmbeddingSearch.compactIvfIndex(spark, root)
      println(f"[compactprobe] compact pass: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      println(s"[compactprobe] files after=${files()}")
      serve("compacted")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "graphextend") {
      // r16: wall the graph EXTEND against the build it avoids, across
      // corpus scale at a FIXED batch — the SCALING.md reach claim
      // (extend work ≈ nprobe·|B|·N/cells ≈ nprobe·|B|·√N at the sized
      // cell count) measured rather than asserted. Per factor:
      // build(prefix = all but the 1024 lowest vec_ids), then extend
      // that fixed batch; report both walls, the batch's distinct home
      // cells vs the quantizer's total, and the merged edge rows.
      // args: <sfDir> graphextend [outRoot] [factors] [batchSizes]
      import org.apache.spark.sql.functions._
      import graft.operators.EmbeddingSearch
      val out = if (args.length > 2) args(2) else "/tmp/graft_scale"
      val factors = (if (args.length > 3) args(3) else "4,16,64")
        .split(",").map(_.trim.toInt)
      val batchSizes = (if (args.length > 4) args(4) else "64,1024")
        .split(",").map(_.trim.toInt)
      for (f <- factors; bs <- batchSizes; pass <- 1 to 2) {
        val dir = ScaleBench.scaledDocs(spark, sfDir, f, out)
        val emb = graft.sources.Tables.embeddings(spark, dir)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
        val batch = emb.where(col("vec_id") < bs).localCheckpoint()
        val prefix = emb.where(col("vec_id") >= bs)
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_graphextend_x$f").toString + "/g"
        val t0 = System.nanoTime()
        EmbeddingSearch.buildKnnGraph(prefix, root)
        val wBuild = (System.nanoTime() - t0) / 1e9
        val cent = EmbeddingSearch.loadKmeansIndex(spark, s"$root/cent")
        val cells = cent.count()
        val homes = EmbeddingSearch.assignWithIndex(
          batch.select(col("vec_id"), col("v").as("embedding")), cent)
          .select("cl").distinct().count()
        val t1 = System.nanoTime()
        EmbeddingSearch.extendKnnGraph(root, batch)
        val wExtend = (System.nanoTime() - t1) / 1e9
        val edges = EmbeddingSearch.knnGraphEdges(spark, root).count()
        println(f"[graphextend] x$f%-3d B=$bs%-5d pass=$pass " +
          f"build(prefix)=$wBuild%7.2f s extend=$wExtend%6.2f s " +
          f"homeCells=$homes/$cells edges=$edges")
        org.apache.spark.sql.GraftShim.unpersistCheckpoint(batch)
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "assigncost") {
      // r16: isolate the graphextend seed-window sensitivity — the same
      // brute n·k argmax read ~93 s/round seeded from vec_ids 64..779 vs
      // ~36 s/round seeded 1024..1739 at 512k. Candidate mechanism:
      // round(csim, 6) inside the argmax goes through BigDecimal.valueOf
      // (a Double.toString) per candidate — 716 per row — whose cost is
      // VALUE-dependent. A/B: assignment wall over both RAW seed windows
      // and over each window's 2-round TRAINED centroids (means have
      // long decimal expansions; raw float-cast seeds have short ones),
      // each with and without the round. Forced through an aggregate
      // over the assigned cell (the ivfbuildsplit lesson).
      // args: <sfDir> assigncost [dir]
      import org.apache.spark.sql.functions._
      import graft.operators.EmbeddingSearch
      val dir = if (args.length > 2) args(2) else "/tmp/graft_scale/x256"
      val emb = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .localCheckpoint()
      val dotc = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      def centsOf(tag: String): Seq[(String, org.apache.spark.sql.DataFrame)] = tag match {
        case "raw64" => Seq(("raw64", emb.where(col("vec_id") >= 64 && col("vec_id") < 780)
          .select((col("vec_id") - 64).cast("int").as("cl"), col("v").as("cv"))))
        case "raw1024" => Seq(("raw1024", emb.where(col("vec_id") >= 1024 && col("vec_id") < 1740)
          .select((col("vec_id") - 1024).cast("int").as("cl"), col("v").as("cv"))))
        case "tr64" => Seq(("tr64", EmbeddingSearch.trainKmeansIndex(
          emb.where(col("vec_id") >= 64), 716, 2)))
        case "tr1024" => Seq(("tr1024", EmbeddingSearch.trainKmeansIndex(
          emb.where(col("vec_id") >= 1024), 716, 2)))
      }
      for (tag <- Seq("raw64", "raw1024", "tr64", "tr1024");
           (label, cent) <- centsOf(tag);
           rounded <- Seq(true, false); pass <- 1 to 2) {
        val centsArr = broadcast(cent.agg(array_sort(collect_list(
          struct(col("cl"), col("cv"),
            sqrt(dotc(col("cv"), col("cv"))).as("ncv")))).as("cents")))
        val nv = sqrt(dotc(col("v"), col("v")))
        val t0 = System.nanoTime()
        val s = emb.withColumn("nv", nv).crossJoin(centsArr)
          .withColumn("best", array_max(transform(col("cents"), c => {
            val csim = dotc(col("v"), c.getField("cv")) /
              (col("nv") * c.getField("ncv"))
            struct((if (rounded) round(csim, 6) else csim).as("csim"),
              (-c.getField("cl")).as("ncl"))
          })))
          .select((-col("best").getField("ncl")).as("cl"))
          .agg(sum(col("cl"))).collect()(0)
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[assigncost] $label%-8s round=$rounded%-5s pass=$pass " +
          f"wall=$w%7.2f s sum=${s.getLong(0)}")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "scanprobe") {
      // r16: isolate the graphextend B=64-vs-B=1024 train-round gap to
      // the INPUT PLAN (every Lloyd round re-scans parquet + cast +
      // filter; the assigncost probe showed the same argmax is fast from
      // a checkpoint). Times the bare scan plan at both predicates, plus
      // the full kmeansAssign-equivalent via assignWithIndex on the same
      // 716 raw seeds, from plan vs from checkpoint.
      // args: <sfDir> scanprobe [dir]
      import org.apache.spark.sql.functions._
      import graft.operators.EmbeddingSearch
      val dir = if (args.length > 2) args(2) else "/tmp/graft_scale/x256"
      def planOf(bs: Int) = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .where(col("vec_id") >= bs)
      for (bs <- Seq(64, 1024); pass <- 1 to 3) {
        val t0 = System.nanoTime()
        val s = planOf(bs).agg(sum(element_at(col("v"), 1))).collect()(0)
        println(f"[scanprobe] scan bs=$bs%-5d pass=$pass " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%6.2f s sum=${s.getDouble(0)}%.3f")
      }
      for (bs <- Seq(64, 1024); ck <- Seq(false, true); pass <- 1 to 2) {
        val base = if (ck) planOf(bs).localCheckpoint() else planOf(bs)
        val cent = base.where(col("vec_id") < bs + 716)
          .select((col("vec_id") - bs).cast("int").as("cl"), col("v").as("cv"))
          .localCheckpoint()
        val t0 = System.nanoTime()
        val s = EmbeddingSearch.assignWithIndex(
          base.select(col("vec_id"), col("v").as("embedding")), cent)
          .agg(sum(col("cl"))).collect()(0)
        println(f"[scanprobe] assign bs=$bs%-5d ckpt=$ck%-5s pass=$pass " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%6.2f s sum=${s.getLong(0)}")
        if (ck) org.apache.spark.sql.GraftShim.unpersistCheckpoint(base)
        org.apache.spark.sql.GraftShim.unpersistCheckpoint(cent)
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "rangeplan") {
      // r14 plan probe: why does the standing range serve's executedPlan
      // show no embeddings.parquet FileSourceScanExec?
      import org.apache.spark.sql.functions._
      val idx = graft.SparkEntry.standingIvfIndexDirFor(sfDir)
      graft.operators.EmbeddingSearch.ensureStandingIvfIndex(spark, sfDir, idx)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = graft.operators.EmbeddingSearch.rangeStandingServe(spark, sfDir, idx)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "tilecheck") {
      // does the registered embed_knn_join_tiled config genuinely tile at
      // this SF? (the untiled guard must fire at the same maxBucket) —
      // plus the tiled wall cost next to the untiled entry's
      val fired = try {
        graft.operators.EmbeddingSearch.knnJoinScaled(spark, sfDir,
          targetBucket = 32, multiProbe = false, maxBucket = 24).count()
        false
      } catch {
        // only the drain guard counts; anything else is a real failure
        // this probe must not re-label as "guard fired"
        case t: Throwable
            if Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
              .exists(c => Option(c.getMessage).exists(_.contains("tileOversized"))) =>
          true
      }
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.EmbeddingSearch.knnJoinScaled(spark, sfDir,
          targetBucket = 32, multiProbe = false, maxBucket = 24, tileOversized = true).count()
        val t1 = System.nanoTime()
        val n2 = graft.operators.EmbeddingSearch.knnJoinScaled(spark, sfDir,
          targetBucket = 32, multiProbe = false).count()
        val t2 = System.nanoTime()
        println(f"[tilecheck] guardFired=$fired pass=$pass tiled=${(t1 - t0) / 1e9}%.2f s " +
          f"($n rows) untiled=${(t2 - t1) / 1e9}%.2f s ($n2 rows)")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "knnrecall") {
      // recall/wall curve for the kNN-graph configs: what Hamming-1
      // probing, band count, and bucket width each buy at sf0.1
      for ((label, tb, bands, mp) <- Seq(
          ("base-8b", 32, 8, false), ("probed-8b", 32, 8, true),
          ("base-tb64", 64, 8, false), ("probed-8b-tb64", 64, 8, true),
          ("base-tb128", 128, 8, false), ("probed-8b-tb128", 128, 8, true),
          ("probed-4b-tb64", 64, 4, true)); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.EmbeddingSearch
          .knnJoinScaled(spark, sfDir, targetBucket = tb, bands = bands,
            multiProbe = mp, probeHamming = 1) // r10 curve = Hamming-1 labels
          .count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = graft.operators.EmbeddingSearch
          .knnJoinRecall(spark, sfDir, targetBucket = tb, bands = bands, multiProbe = mp)
          .agg(org.apache.spark.sql.functions.sum("n_hit"),
            org.apache.spark.sql.functions.sum("n_exact"))
          .collect()(0)
        println(f"[knnrecall] $label%-16s pass=$pass wall=$w%6.2f s rows=$n " +
          f"recall=${rec.getLong(0).toDouble / rec.getLong(1)}%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "knnrecall2") {
      // extend the r10 kNN-graph frontier past 0.883: more bands and wider
      // buckets at the tb=128+probed default's side of the curve
      for ((label, tb, bands, mp, ph) <- Seq(
          ("probed-8b-tb128", 128, 8, true, 1),   // the registered default
          ("base-16b-tb128", 128, 16, false, 1),
          ("probed-16b-tb128", 128, 16, true, 1),
          ("h2-8b-tb128", 128, 8, true, 2),       // the Hamming-2 opt-in
          ("h2-16b-tb128", 128, 16, true, 2)); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.EmbeddingSearch
          .knnJoinScaled(spark, sfDir, targetBucket = tb, bands = bands,
            multiProbe = mp, probeHamming = ph)
          .count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = graft.operators.EmbeddingSearch
          .knnJoinRecall(spark, sfDir, targetBucket = tb, bands = bands,
            multiProbe = mp, probeHamming = ph)
          .agg(org.apache.spark.sql.functions.sum("n_hit"),
            org.apache.spark.sql.functions.sum("n_exact"))
          .collect()(0)
        println(f"[knnrecall2] $label%-17s pass=$pass wall=$w%6.2f s rows=$n " +
          f"recall=${rec.getLong(0).toDouble / rec.getLong(1)}%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "nnd") {
      // NN-descent frontier: what the internal width kBuild and the round
      // count buy in recall@3 (vs the probed seed) and what they cost in
      // wall — the measurement behind the registered (kBuild, rounds)
      import org.apache.spark.sql.functions.{avg, col}
      for ((kb, rounds) <- Seq((3, 2), (6, 2), (10, 1), (10, 2), (10, 3), (16, 2));
           pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.EmbeddingSearch
          .knnJoinDescent(spark, sfDir, kBuild = kb, rounds = rounds).count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = graft.operators.EmbeddingSearch
          .knnJoinDescentRecall(spark, sfDir, kBuild = kb, rounds = rounds)
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"[nnd] kBuild=$kb%-2d rounds=$rounds pass=$pass wall=$w%6.2f s " +
          f"rows=$n recall=$rec%.4f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "knnx16") {
      // the x16 recall frontier across the two scale-safe knobs: bucket
      // width (targetBucket — work/vector = tb·bands, corpus-independent)
      // and band count, each ± NN-descent refinement on top
      import org.apache.spark.sql.functions.{avg, col}
      import graft.operators.EmbeddingSearch
      for ((label, tb, bands, nnd) <- Seq(
          ("tb128-8b", 128, 8, false), ("tb128-8b+nnd", 128, 8, true),
          ("tb128-16b", 128, 16, false), ("tb128-16b+nnd", 128, 16, true),
          ("tb512-8b", 512, 8, false), ("tb512-8b+nnd", 512, 8, true),
          ("tb512-16b", 512, 16, false)); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val g = if (nnd) EmbeddingSearch.knnJoinDescent(spark, sfDir,
            targetBucket = tb, bands = bands)
          else EmbeddingSearch.knnJoinScaled(spark, sfDir,
            targetBucket = tb, bands = bands)
        val n = g.count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = (if (nnd) EmbeddingSearch.knnJoinDescentRecall(spark, sfDir,
            targetBucket = tb, bands = bands)
          else EmbeddingSearch.knnJoinRecall(spark, sfDir,
            targetBucket = tb, bands = bands, multiProbe = true))
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"[knnx16] $label%-14s pass=$pass wall=$w%6.2f s rows=$n recall=$rec%.4f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "knncells") {
      // IVF-cell kNN-graph frontier: recall/wall per nprobe at this SF
      import org.apache.spark.sql.functions.{avg, col}
      import graft.operators.EmbeddingSearch
      for (np <- Seq(1, 2, 3, 4, 6, 8); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = EmbeddingSearch.knnJoinCells(spark, sfDir, nprobe = np).count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = EmbeddingSearch.knnJoinCellsRecall(spark, sfDir, nprobe = np)
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"[knncells] nprobe=$np pass=$pass wall=$w%6.2f s rows=$n recall=$rec%.4f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "cellsnnd") {
      // composition probe: NN-descent refinement over a CELLS-graph seed
      // (the cells graph's x1 recall trails the banded default — does the
      // k²-bounded refinement close that gap at bounded wall?)
      import org.apache.spark.sql.functions.{avg, col}
      import graft.operators.EmbeddingSearch
      for ((np, rounds) <- Seq((2, 1), (2, 2), (4, 1)); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val refined = EmbeddingSearch.descentRefine(spark, sfDir,
          EmbeddingSearch.knnJoinCells(spark, sfDir, k = 10, nprobe = np),
          k = 3, rounds = rounds, kBuild = 10)
        val n = refined.count()
        val w = (System.nanoTime() - t0) / 1e9
        // score the SAME frame that was just timed (the descent's final
        // round is checkpointed, so this re-evaluation is cheap)
        val rec = EmbeddingSearch.graphRecallProbe(spark, sfDir, refined)
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"[cellsnnd] nprobe=$np rounds=$rounds pass=$pass " +
          f"wall=$w%6.2f s rows=$n recall=$rec%.4f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "graphserve") {
      // r14 frontier probe (r13 verdict stretch item 8): HNSW-STYLE QUERY
      // SERVING — greedy beam search over the navigable kNN graph (the
      // cells graph at kBuild=10), flattened to Spark rounds (one edge
      // join + per-query re-rank + beam cut per round), measured against
      // the standing IVF probe serve (recall@5 + wall). HNSW's serve-side
      // value is log-hop navigation at high recall; the question is
      // whether a batch engine keeps any of it once each hop costs a
      // full shuffle round.
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import graft.operators.EmbeddingSearch
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .localCheckpoint()
      val n = emb.count()
      // the navigable graph: built once per config sweep (HNSW pays its
      // build once too); kBuild=10 out-degree, the descent family's width
      val tg = System.nanoTime()
      val graph = EmbeddingSearch.knnJoinCells(spark, sfDir, k = 10)
        .select(col("vec_id"), col("nbr_id")).localCheckpoint()
      println(f"[graphserve] graph build (k=10 cells): ${(System.nanoTime() - tg) / 1e9}%.2f s, ${graph.count()} edges")
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv")).localCheckpoint()
      val wB = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
      def ranked(cand: org.apache.spark.sql.DataFrame, keep: Int) =
        cand.withColumn("rn", row_number().over(wB)).where(col("rn") <= keep).drop("rn")
      for ((beam, rounds) <- Seq((16, 2), (16, 3), (32, 3), (32, 6), (64, 8)); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        // deterministic entry points: 8 affine-hash-sampled vertices
        val entry = emb.where((col("vec_id") * 1103515245L + 12345L) % 2147483647L % n < 8L)
        var cand = ranked(q.crossJoin(entry.select(col("vec_id"), col("v")))
          .select(col("query_id"), col("qv"), col("vec_id"),
            round(EmbeddingSearch.cosine(col("v"), col("qv")), 6).as("cosine")),
          beam).localCheckpoint()
        for (_ <- 1 to rounds) {
          val grown = cand.select(col("query_id"), col("qv"), col("vec_id"))
            .join(graph, "vec_id")
            .select(col("query_id"), col("qv"), col("nbr_id").as("vec_id"))
            .distinct()
            .join(emb, "vec_id")
            .select(col("query_id"), col("qv"), col("vec_id"),
              round(EmbeddingSearch.cosine(col("v"), col("qv")), 6).as("cosine"))
            .unionByName(cand)
            .groupBy(col("query_id"), col("vec_id"))
            .agg(first(col("qv")).as("qv"), max(col("cosine")).as("cosine"))
          cand = ranked(grown, beam).localCheckpoint()
        }
        val served = cand.where(col("vec_id") =!= col("query_id"))
        val top = ranked(served, 5)
          .select(col("query_id").as("vec_id"), col("vec_id").as("nbr_id"))
        val rows = top.count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = EmbeddingSearch.graphRecallProbe(spark, sfDir,
            top, k = 5, nProbes = 10)
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"[graphserve] beam=$beam rounds=$rounds pass=$pass " +
          f"wall=$w%6.2f s rows=$rows recall=$rec%.4f")
      }
      // the comparison point: the standing IVF probe serve on the same
      // queries (k=5) — the registered default's plan
      val idx = graft.SparkEntry.standingIvfIndexDirFor(sfDir)
      EmbeddingSearch.ensureStandingIvfIndex(spark, sfDir, idx)
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = EmbeddingSearch.kmeansSizedStandingServe(spark, sfDir, idx).count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = EmbeddingSearch.kmeansRecallSizedStanding(spark, sfDir, idx)
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"[graphserve] IVF standing serve pass=$pass wall=$w%6.2f s rows=$r recall=$rec%.4f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "np4") {
      // r14: the sized standing serve's recall-vs-nprobe frontier — the
      // widening headroom the graphserve comparison cites (is the last
      // recall gap closable for one extra probed cell per query?)
      import org.apache.spark.sql.functions.{avg, col}
      import graft.operators.EmbeddingSearch
      val idx = graft.SparkEntry.standingIvfIndexDirFor(sfDir)
      EmbeddingSearch.ensureStandingIvfIndex(spark, sfDir, idx)
      for (np <- Seq(2, 4, 8); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = EmbeddingSearch.kmeansSizedStandingServe(spark, sfDir, idx,
          nprobe = np).count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = EmbeddingSearch.recallOfStandingSized(spark, sfDir, idx, np)
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"[np4] nprobe=$np pass=$pass wall=$w%6.2f s rows=$n recall=$rec%.4f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "mipsivf") {
      // the MIPS approx-method frontier at this SF: wall + recall@5 of
      // the IVF serve (adaptive and fixed nprobe) next to the two ALSH
      // band layouts — the measurement behind the r13 MIPS default
      import org.apache.spark.sql.functions.{avg, col}
      import graft.operators.EmbeddingSearch
      for ((label, fn) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
          ("ivf-npauto", () => EmbeddingSearch.mipsTopKIvf(spark, sfDir)),
          ("ivf-np2", () => EmbeddingSearch.mipsTopKIvf(spark, sfDir, nprobe = 2)),
          ("alsh-sized", () => EmbeddingSearch.mipsTopKAlshScaled(spark, sfDir)),
          ("alsh-fixed", () => EmbeddingSearch.mipsTopKAlsh(spark, sfDir)));
          pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = fn().count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = graft.operators.EmbeddingSearch
          .mipsRecallProbe(spark, sfDir, fn())
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"[mipsivf] $label%-11s pass=$pass wall=$w%6.2f s rows=$n recall=$rec%.4f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "hybridprobe") {
      // recall/wall curve for the probed hybrid serve: what nprobe buys
      // the FUSED ranking (single-query serve wall + 20-query fused-rank
      // recall per nprobe; nprobe=0 is the exact flat-scan tier)
      import org.apache.spark.sql.functions.sum
      val bp = graft.SparkEntry.bm25IndexDirFor(sfDir)
      val ip = graft.SparkEntry.ivfFullIndexDirFor(sfDir)
      graft.operators.TextAnalysis.ensureBm25Index(spark, sfDir, bp)
      graft.operators.EmbeddingSearch.ensureIvfIndex(spark, sfDir, ip)
      for (np <- Seq(0, 1, 2, 4); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.TextAnalysis
          .hybridTopKServed(spark, bp, ip, nprobe = np).count()
        val w = (System.nanoTime() - t0) / 1e9
        val rec = if (np == 0) 1.0 else {
          val r = graft.operators.TextAnalysis
            .hybridProbedRecall(spark, sfDir, bp, ip, nQueries = 20, nprobe = np)
            .agg(sum("n_hit"), sum("n_exact")).head()
          r.getLong(0).toDouble / r.getLong(1)
        }
        println(f"[hybridprobe] nprobe=$np pass=$pass wall=$w%6.2f s rows=$n recall=$rec%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "bpe1024") {
      // O(T) round-cost probe for the evolving trainer: 1024 requested
      // rounds should cost ~4x the 256-round scale row (or stop early at
      // vocab exhaustion), never the kernel's quadratic re-tokenization
      val t0 = System.nanoTime()
      val n = graft.operators.TextAnalysis.bpeMergesEvolving(
        graft.sources.Tables.documents(spark, sfDir), rounds = 1024).count()
      println(f"[bpe1024] ${(System.nanoTime() - t0) / 1e9}%.2f s ($n merges learned)")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "knncaprecall") {
      import org.apache.spark.sql.functions._
      for (cap <- Seq(0, 32, 64, 96, 128, 192, 256)) {
        val t0 = System.nanoTime()
        val r = graft.operators.EmbeddingSearch.knnJoinRecall(spark, sfDir, candidateCap = cap)
          .agg(avg(col("recall")), count(lit(1))).head()
        println(f"[knnrecall] cap=$cap mean=${r.getDouble(0)}%.4f probes=${r.getLong(1)} " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "knncand") {
      // candidate-volume census: is edge growth actually linear (the
      // occupancy rule's claim), and where do the bucket sizes sit?
      import org.apache.spark.sql.functions._
      import graft.operators.EmbeddingSearch
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      val n = emb.count()
      val rpb = EmbeddingSearch.lshRowsPerBand(n)
      val banded = emb.select(col("vec_id"),
        explode(EmbeddingSearch.lshBandKeys(
          EmbeddingSearch.lshSignature(col("v"), 8 * rpb), 8, rpb)).as("band"))
      val occ = banded.groupBy("band").count()
      val stats = occ.agg(count(lit(1)), max(col("count")), avg(col("count")),
        sum(col("count") * col("count"))).head()
      println(s"[knncand] n=$n rpb=$rpb buckets=${stats.getLong(0)} " +
        s"maxOcc=${stats.getLong(1)} avgOcc=${stats.getDouble(2)} sumSq=${stats.getLong(3)}")
      val pre = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.vec_id") =!= col("b.vec_id")).count()
      val post = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id")).distinct().count()
      println(s"[knncand] edges pre-distinct=$pre post-distinct=$post")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "fsprof") {
      // microbenchmark the Hadoop FS ops the sink performs per document
      import org.apache.hadoop.fs.{FileContext, Options, Path => HPath}
      val conf = spark.sparkContext.hadoopConfiguration
      val base = java.nio.file.Files.createTempDirectory("graft_fsprof").toString
      val stage = new HPath(s"$base/stage"); val root = new HPath(s"$base/root")
      val fs = stage.getFileSystem(conf)
      fs.mkdirs(stage); fs.mkdirs(root)
      val nFiles = 2000
      var t0 = System.nanoTime()
      (0 until nFiles).foreach { i =>
        val out = fs.create(new HPath(stage, s"$i.txt"), true)
        out.write(("x" * 500).getBytes); out.close()
      }
      println(f"create+write+close x$nFiles: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val fc = FileContext.getFileContext(root.toUri, conf)
      t0 = System.nanoTime()
      (0 until nFiles).foreach { i =>
        val dest = new HPath(root, s"$i.txt")
        fs.exists(dest)
        fc.rename(new HPath(stage, s"$i.txt"), dest, Options.Rename.OVERWRITE)
      }
      println(f"exists+fcrename x$nFiles: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "sinkprof") {
      // profile the graft-text DSv2 sink: write sf docs to a FRESH corpus
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("CAST(doc_id AS STRING) AS doc_id", "text")
      val out = java.nio.file.Files.createTempDirectory("graft_sinkprof").toString + "/corpus"
      var t0 = System.nanoTime()
      docs.write.format("graft-text").mode("overwrite").save(out)
      println(f"WRITE fresh: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      docs.write.format("graft-text").mode("append").save(out)
      println(f"WRITE upsert-over-existing: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val n = spark.read.format("graft-text").load(out).count()
      println(f"READ back ($n docs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "ngramprof") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions._
      val tau = 0.8
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val sets = docs.select(col("doc_id"), shingleSet(col("text"), 2).as("sh"))
        .where(size(col("sh")) > 0).cache()
      println(s"sets=${sets.count()}")
      val ex = sets.select(col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("term"))
      val df = ex.groupBy("term").agg(count(lit(1)).as("df"))
      println(s"vocab=${df.count()}")
      val w = Window.partitionBy("doc_id").orderBy("df", "term")
      val prefix = ex.join(broadcast(df), "term")
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= col("sz") - floor(lit(tau) * col("sz")) + 1)
        .select(col("doc_id"), col("sz"), col("rnk"), col("term")).cache()
      println(s"prefixRows=${prefix.count()}")
      var t0 = System.nanoTime()
      val joined = prefix.as("a").join(prefix.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      println(s"rawJoin=${joined.count()} in ${(System.nanoTime()-t0)/1e9}%.1f s")
      t0 = System.nanoTime()
      val minInter = floor(lit(tau / (1 + tau)) * (col("a.sz") + col("b.sz")))
      val filtered = prefix.as("a").join(prefix.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id") &&
        greatest(col("a.sz"), col("b.sz")) * tau <= least(col("a.sz"), col("b.sz")) &&
        least(col("a.sz") - col("a.rnk"), col("b.sz") - col("b.rnk")) + 1 >= minInter)
      println(s"filteredJoin=${filtered.count()} in ${(System.nanoTime()-t0)/1e9} s")
      t0 = System.nanoTime()
      val cand = filtered.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
      println(s"cand=${cand.count()} in ${(System.nanoTime()-t0)/1e9} s")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "wtprof") {
      val corpus = s"${System.getProperty("java.io.tmpdir")}/graft_wtcorpus_" +
        new java.io.File(sfDir).getName
      def time(what: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"WTPROF $what%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  n=$n")
      }
      time("list+count lines (plain)")(spark.read.text(corpus).count())
      time("wholetext count")(spark.read.option("wholetext", "true").text(corpus).count())
      time("wholetext count again")(spark.read.option("wholetext", "true").text(corpus).count())
      time("wholetext + docid")(graft.sources.Tables.wholeTextDocuments(spark, corpus).count())
      time("wholetext partitions")(
        spark.read.option("wholetext", "true").text(corpus).rdd.getNumPartitions.toLong)
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "stream") {
      // readStream over a parquet dir -> watermarked hourly counts -> memory sink
      import org.apache.spark.sql.functions._
      val src = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
      val batch = graft.operators.Events.events(spark, sfDir)
        .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      batch.limit(500).write.mode("overwrite").parquet(src)
      val q = graft.streaming.StreamingOps.hourlyCounts(
          spark.readStream.schema(spark.read.parquet(src).schema).parquet(src))
        .writeStream.format("memory").queryName("s_hourly").outputMode("complete").start()
      q.processAllAvailable()
      println(s"STREAM WINDOWS=${spark.table("s_hourly").count()} " +
        s"EVENTS=${spark.table("s_hourly").agg(sum("n_events")).head().getLong(0)}")
      q.stop(); spark.stop(); return
    }
    if (args.length > 1 && args(1) == "bucket") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import graft.sources.Tables
      val ordersB = Tables.bucketedTable(spark, sfDir, "orders", "o_orderkey")
      val lineitemB = Tables.bucketedTable(spark, sfDir, "lineitem", "l_orderkey")
      val j = spark.table(lineitemB).join(spark.table(ordersB),
        org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
      println(s"BUCKET JOIN rows=${j.count()}")
      println(s"EXCHANGES=${j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.size}")
      val salted = graft.operators.Scale.saltedJoin(
        Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir), "l_partkey", "p_partkey", 4)
      println(s"SALTED JOIN rows=${salted.count()}")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "sql") {
      // Exercise GraftExtensions + the reference text sink end-to-end.
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new graft.GraftExtensions).getOrCreate()
      graft.GraftSql.registerTables(s2, sfDir)
      s2.sql(
        """SELECT doc_id, graft_hash31(text) AS fp,
          |       size(graft_shingle_set(text, 3)) AS n_sh
          |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).show()
      println(s"SQL FLAGSHIP rows=${s2.sql(graft.GraftSql.flagshipSql(0L)).count()}")
      val out = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/scores"
      graft.operators.BookQuery.referenceOutputLines(
        graft.operators.BookQuery.referenceScores(s2.read.parquet(s"$sfDir/documents.parquet")))
        .write.mode("overwrite").text(out)
      println("SINK LINES:")
      s2.read.text(out).limit(3).collect().foreach(r => println("  " + r.getString(0)))
      s2.stop(); return
    }
    if (args.length > 1 && args(1).startsWith("explain:")) {
      val name = args(1).stripPrefix("explain:")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "lshsplit") {
      // r16 opt micro-probe: where does the MinHash-LSH pair pipeline's
      // exec time go? Cumulative stage cuts, min of 3 counts each.
      import org.apache.spark.sql.functions._
      import graft.functions.HashFunctions._
      import graft.functions.TextFunctions._
      val docs = graft.sources.Tables.documents(spark, sfDir)
      def bench(what: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
        }.min
        println(f"LSHSPLIT $what%-26s $t%7.3f s")
      }
      val sets = docs.select(col("doc_id"), shingleSet(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
      bench("tokenize only")(docs.select(size(tokenize(col("text"))).as("n")).where(col("n") >= 0))
      bench("shingleSet")(sets)
      bench("+hashSet")(sets.select(col("doc_id"), hashSet(col("sh")).as("h")))
      bench("+minhash64")(sets.select(col("doc_id"),
        minhashFromHashes(hashSet(col("sh")), 64).as("sig")))
      bench("+bandkeys+explode")(sets.select(col("doc_id"),
        explode(minhashBandKeys(minhashFromHashes(hashSet(col("sh")), 64), 16, 4)).as("b")))
      bench("full lsh pairs")(graft.operators.Dedup.minhashLshPairs(docs, 0.7))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "ngramsplit") {
      // r17 opt: where does dedup_ngram_jaccard (allPairsNgramJaccard at
      // tau=0.8, n=2) spend — the shingle/hash passes, the df+window
      // ranking, the prefix self-join, or the two-stage verify? Min-of-3,
      // cumulative cuts.
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions._
      val docs = graft.sources.Tables.documents(spark, sfDir)
      def bench(what: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
        }.min
        println(f"NGRAMSPLIT $what%-26s $t%7.3f s")
      }
      val sets = docs.select(col("doc_id"), shingleSet(col("text"), 2).as("sh"))
        .where(size(col("sh")) > 0)
      bench("sets (shingle 2-gram)")(sets)
      bench("full ngram jaccard")(
        graft.operators.SimilarityJoin.allPairsNgramJaccard(docs, 0.8, 2))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "spreadsplit") {
      // r17 opt (VERDICT item 7): where does text_decontaminate_spread's
      // wall go — the seed scan, the LSH edge pipeline (eager checkpoint
      // at construct), or the recursive-CTE hops? Min-of-3 each.
      import org.apache.spark.sql.functions._
      val docs = graft.sources.Tables.documents(spark, sfDir)
      def bench(what: String)(f: => Unit): Unit = {
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
        println(f"SPREADSPLIT $what%-26s $t%7.3f s")
      }
      bench("seeds (decontaminate)")(
        graft.operators.TextAnalysis.decontaminate(docs, 5, 50)
          .where(col("contaminated")).select(col("doc_id")).count())
      bench("edges (LSH pairs ckpt)")(
        graft.operators.Dedup.withSharedShingleSets(docs.where(col("doc_id") >= 50)) { sets =>
          graft.operators.Dedup.minhashLshPairsFromSets(sets, 0.7)
            .select(explode(array(
              struct(col("doc_a"), col("doc_b")),
              struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))).as("e"))
            .select(col("e.doc_a").as("doc_a"), col("e.doc_b").as("doc_b"))
            .localCheckpoint().count()
        })
      bench("full contaminationSpread")(
        graft.operators.TextAnalysis.contaminationSpread(docs, nEval = 50).count())
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "hybridsplit") {
      // r17 opt (VERDICT item 3): where does text_hybrid_topk's wall go,
      // and which stage anti-scales with cores (8-core beat 32-core 2.3×
      // in the driver's scaling block)? Cumulative stage cuts, min-of-3,
      // noop-sink so the computation is timed, not the count shortcut.
      // Run at another width via GRAFT_EXTRA_CONF="spark.master=local[8];
      // spark.sql.shuffle.partitions=8".
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions._
      import graft.operators.{EmbeddingSearch, TextAnalysis}
      println(s"[hybridsplit] master=${spark.sparkContext.master} " +
        s"shuffle.partitions=${spark.conf.get("spark.sql.shuffle.partitions")}")
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
      def bench(what: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"HYBRIDSPLIT $what%-26s $t%7.3f s")
      }
      val terms = docs.select(col("doc_id"), explode(tokenize(col("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      bench("tf (tokenize+agg)")(tf)
      bench("dl per doc")(tf.groupBy("doc_id").agg(sum(col("tf")).as("dl")))
      bench("bm25 top-20 full")(TextAnalysis.bm25TopDocs(docs))
      val ev = emb.select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v"))
      val q = broadcast(ev.where(col("vec_id") === 0L).select(col("v").as("qv")))
      bench("sem cosine scan")(ev.crossJoin(q).where(col("vec_id") =!= 0L)
        .select(col("vec_id"),
          round(EmbeddingSearch.cosine(col("v"), col("qv")), 6).as("cosine")))
      bench("sem top-20")(ev.crossJoin(q).where(col("vec_id") =!= 0L)
        .select(col("vec_id"),
          round(EmbeddingSearch.cosine(col("v"), col("qv")), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc).limit(20))
      bench("full hybridTopK")(TextAnalysis.hybridTopK(docs, emb))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "tableread") {
      // r16 opt micro-probe: what does ONE Tables.table() construct cost
      // (read.parquet schema inference + drift check), vs a schema-supplied
      // read, vs reusing a memoized frame? 200 reps each, steady state.
      def bench(what: String)(f: => Unit): Unit = {
        f; f // warm
        val t0 = System.nanoTime()
        (1 to 200).foreach(_ => f)
        println(f"TABLEREAD $what%-28s ${(System.nanoTime() - t0) / 1e9 / 200 * 1000}%8.3f ms/call")
      }
      val p = s"$sfDir/documents.parquet"
      val schema = spark.read.parquet(p).schema
      bench("Tables.documents")(graft.sources.Tables.documents(spark, sfDir))
      bench("read.parquet")(spark.read.parquet(p))
      bench("read.schema().parquet")(spark.read.schema(schema).parquet(p))
      bench("fingerprint walk")(graft.sources.Tables.datasetFingerprint(p))
      bench("queries(text_zipf) construct")(
        graft.SparkEntry.queries("text_zipf")(spark, sfDir))
      bench("queries(rel_pivot) construct")(
        graft.SparkEntry.queries("rel_pivot")(spark, sfDir))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "phases") {
      // r16 opt round: where does the FLAT TAIL's time go? Decompose every
      // query's bench wall into construct (the registry fn itself — artifact
      // probes, fingerprint walks, any memo jobs), plan (analysis +
      // optimization + physical planning via executedPlan), and exec (the
      // count). Two passes like Bench; per-phase MIN reported, so the JIT
      // noise of pass 1 doesn't misattribute.
      val sel = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
      val named = graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => sel.isEmpty || sel.contains(n) }
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, (Double, Double, Double)]
      for (pass <- 1 to 2; (name, fn) <- named) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        val (c, p, e) =
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        val prev = acc.getOrElse(name, (Double.MaxValue, Double.MaxValue, Double.MaxValue))
        acc(name) = (math.min(prev._1, c), math.min(prev._2, p), math.min(prev._3, e))
      }
      var (sc, sp, se) = (0.0, 0.0, 0.0)
      acc.foreach { case (name, (c, p, e)) =>
        sc += c; sp += p; se += e
        println(f"PHASES $name%-36s construct=$c%7.3f plan=$p%7.3f exec=$e%7.3f total=${c + p + e}%7.3f")
      }
      println(f"PHASES-SUM n=${acc.size} construct=$sc%8.2f plan=$sp%8.2f exec=$se%8.2f total=${sc + sp + se}%8.2f")
      spark.stop(); return
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case e: Throwable => println(s"!! $name: ${e.getMessage.take(200)}"); -1L }
        println(f"TIMING $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
