package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BookQuery
import graft.sources.Tables

/** Source/sink parity (SURVEY.md §2.1 rows 1-3, 16): whole-text directory
  * ingestion and the reference's exact text output format, plus the SQL
  * extension registration.
  */
class SourceSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("wholetext source: one row per file, doc_id from basename, lines joined") {
    val dir = Files.createTempDirectory("graft_corpus").toFile
    Files.writeString(new java.io.File(dir, "alpha.txt").toPath, "a b c\nd e f\n")
    Files.writeString(new java.io.File(dir, "query.txt").toPath, "a b c")
    val docs = Tables.wholeTextDocuments(spark, dir.getAbsolutePath)
      .as[(String, String)].collect().toMap
    assert(docs.keySet == Set("alpha", "query"))
    assert(docs("alpha") == "a b c d e f ") // trailing newline -> trailing space
    assert(docs("query") == "a b c")
  }

  test("DSv2 graft-text source: parity with v1, pruning reaches the reader") {
    val dir = Files.createTempDirectory("graft_corpus_v2").toFile
    Files.writeString(new java.io.File(dir, "alpha.txt").toPath, "a b c\nd e f\n")
    Files.writeString(new java.io.File(dir, "beta.txt").toPath, "x y\r\nz")
    Files.writeString(new java.io.File(dir, "_marker").toPath, "ignore me")
    val v2 = Tables.wholeTextDocumentsV2(spark, dir.getAbsolutePath)
    val v1 = Tables.wholeTextDocuments(spark, dir.getAbsolutePath)
    assert(v2.as[(String, String)].collect().toMap ==
      v1.as[(String, String)].collect().toMap)
    // column pruning reaches the custom reader: a doc_id-only projection
    // plans a scan whose ReadSchema carries no `text` field
    val pruned = v2.select("doc_id")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("TextCorpusScan") || scanDesc.contains("graft-text"),
      s"v2 scan missing in:\n$scanDesc")
    assert(!scanDesc.contains("ReadSchema: struct<doc_id:string,text:string>"),
      s"text not pruned from scan:\n$scanDesc")
    assert(pruned.as[String].collect().sorted.toSeq == Seq("alpha", "beta"))
    // the flagship runs unchanged through the v2 source
    val scored = BookQuery.referenceScoresFor(
      Tables.wholeTextDocumentsV2(spark, dir.getAbsolutePath), lit("alpha"))
    assert(scored.columns.toSeq ==
      Seq("doc_id", "len", "sum_shared", "score"))
  }

  test("DSv2 doc_id filter pushdown prunes FILES at planning time") {
    val dir = Files.createTempDirectory("graft_corpus_push").toFile
    for (n <- Seq("alpha", "beta", "gamma", "delta"))
      Files.writeString(new java.io.File(dir, s"$n.txt").toPath, s"body of $n")
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[graft.sources.v2.TextCorpusScan]
            .planInputPartitions()
            .map(_.asInstanceOf[graft.sources.v2.TextFilesPartition].files.length).sum
      }.get
    val src = Tables.wholeTextDocumentsV2(spark, dir.getAbsolutePath)
    // point lookup: ONE file opened out of four
    val eq = src.where(col("doc_id") === "beta")
    assert(plannedFiles(eq) == 1, eq.queryExecution.executedPlan.toString)
    assert(eq.as[(String, String)].collect().toSeq == Seq(("beta", "body of beta")))
    // IN-list: two files; conjunction with equality intersects to one
    val in = src.where(col("doc_id").isin("alpha", "gamma"))
    assert(plannedFiles(in) == 2)
    assert(in.select("doc_id").as[String].collect().sorted.toSeq == Seq("alpha", "gamma"))
    val both = src.where(col("doc_id").isin("alpha", "gamma") && col("doc_id") === "gamma")
    assert(plannedFiles(both) == 1)
    assert(both.select("doc_id").as[String].collect().toSeq == Seq("gamma"))
    // a non-pushable predicate (on text) stays Spark-side: all files planned,
    // rows still correct
    val onText = src.where(col("text").contains("delta"))
    assert(plannedFiles(onText) == 4)
    assert(onText.select("doc_id").as[String].collect().toSeq == Seq("delta"))
    // explain surfaces the pruning for plan reviews
    assert(eq.queryExecution.executedPlan.toString.contains("PushedDocIds"),
      eq.queryExecution.executedPlan.toString)
  }

  test("reference text sink emits '<doc> - query\\t<score>' lines") {
    // 4th doc keeps n=4 so "a b c" (df=3) clears the df==n stop filter.
    val corpus = Seq((0L, "a b c d"), (1L, "a b c x"), (2L, "a b c d e"), (3L, "z z z z"))
      .toDF("doc_id", "text")
    val out = Files.createTempDirectory("graft_out").toFile.getAbsolutePath + "/scores"
    BookQuery.referenceOutputLines(BookQuery.referenceScores(corpus))
      .write.mode("overwrite").text(out)
    val lines = spark.read.text(out).as[String].collect().toSet
    assert(lines == Set("1 - query\t0.5", "2 - query\t1.0"))
  }

  test("BookQueryMain: reference CLI shape end-to-end over a text-file corpus") {
    val dir = Files.createTempDirectory("graft_cli").toFile
    Files.writeString(new java.io.File(dir, "query.txt").toPath, "a b c d")
    Files.writeString(new java.io.File(dir, "doc1.txt").toPath, "a b c x")
    Files.writeString(new java.io.File(dir, "doc2.txt").toPath, "a b c d e")
    Files.writeString(new java.io.File(dir, "doc3.txt").toPath, "z z z z")
    val out = Files.createTempDirectory("graft_cli_out").toString + "/scores"
    BookQueryMain.run(spark, dir.getAbsolutePath, out)
    val lines = spark.read.text(out).as[String].collect().toSet
    assert(lines == Set("doc1 - query\t0.5", "doc2 - query\t1.0"))
  }

  test("csv and json round-trips preserve the relation") {
    val dir = "/root/testdata/sf0.001"
    val nation = Tables.nation(spark, dir)
    val base = Files.createTempDirectory("graft_fmt").toString
    nation.write.mode("overwrite").option("header", "true").csv(s"$base/n_csv")
    nation.write.mode("overwrite").json(s"$base/n_json")
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/n_csv")
    val fromJson = spark.read.json(s"$base/n_json")
    assert(fromCsv.count() == 25 && fromJson.count() == 25)
    assert(fromCsv.select("n_name").as[String].collect().sorted.toSeq ==
      nation.select("n_name").as[String].collect().sorted.toSeq)
    assert(fromJson.select("n_nationkey").as[Long].collect().sorted.toSeq ==
      nation.select("n_nationkey").as[Int].collect().map(_.toLong).sorted.toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = Files.createTempDirectory("graft_part").toString + "/orders"
    val dir = "/root/testdata/sf0.001"
    Tables.orders(spark, dir)
      .withColumn("order_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("order_year").parquet(out)
    val pruned = spark.read.parquet(out).where($"order_year" === 1996)
    val expected = Tables.orders(spark, dir).where(year($"o_orderdate") === 1996).count()
    assert(pruned.count() == expected)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("order_year"), s"no partition pruning in:\n$scan")
  }

  test("compaction: fewer size-targeted files, identical relation") {
    import graft.operators.Maintenance
    val dir = Files.createTempDirectory("graft_compact_spec").toString
    val src = s"$dir/frag"
    val out = s"$dir/compact"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.repartition(32).write.parquet(src)
    assert(Maintenance.dataFileCount(spark, src) == 32)
    val written = Maintenance.compactParquet(spark, src, out, targetFileBytes = 1L * 1024 * 1024)
    assert(Maintenance.dataFileCount(spark, out) == written && written < 32,
      s"expected a compacted layout, got $written files")
    // contents identical as multisets
    val a = spark.read.parquet(src).collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("schema evolution: mergeSchema reconciles pre/post-migration batches") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val merged = graft.operators.Maintenance.schemaEvolutionRoundtrip(spark, dir)
    val cust = Tables.customer(spark, dir)
    // every customer lands exactly once: group counts reconcile to the table
    val total = merged.agg(sum(col("n_customers"))).collect()(0).getLong(0)
    assert(total == cust.count())
    // the pre-migration batch (even custkeys) surfaces as the NULL bucket
    val nullBucket = merged.where(col("nation_group") === -1)
      .select(col("n_customers")).collect()(0).getLong(0)
    assert(nullBucket == cust.where(col("c_custkey") % 2 === 0).count())
    // post-migration groups carry real nation keys only
    assert(merged.where(col("nation_group") < -1).count() == 0)
  }

  test("z-order: day predicates prune files a user-only sort cannot") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Events, Maintenance}
    val dir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_zspec").toString
    val ev = Events.events(spark, dir)
      .withColumn("event_day", expr("ts_us div 86400000000"))
    Maintenance.zorderWrite(ev, "user_id", "event_day", s"$tmp/z", nFiles = 16)
    ev.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
      .write.parquet(s"$tmp/u")
    // candidate files = files whose day bounding box intersects the
    // predicate (what file-stats skipping keeps)
    def candidates(path: String, lo: Long, hi: Long): Int =
      new java.io.File(path).listFiles
        .filter(_.getName.endsWith(".parquet")).count { f =>
          val mm = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("event_day")), max(col("event_day"))).collect()(0)
          mm.getLong(0) <= hi && mm.getLong(1) >= lo
        }
    val (lo, hi) = (19730L, 19736L) // one-week predicate
    val zc = candidates(s"$tmp/z", lo, hi)
    val uc = candidates(s"$tmp/u", lo, hi)
    assert(zc < uc, s"z-order candidates $zc not fewer than user-sort's $uc")
    // layout is a permutation: both copies hold exactly the same rows
    val a = spark.read.parquet(s"$tmp/z").select("event_id")
      .as[Long].collect().sorted.toSeq
    val b = spark.read.parquet(s"$tmp/u").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("corruption tolerance: default read fails loudly, scoped read recovers") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val agg = graft.operators.Maintenance.corruptionToleranceRoundtrip(spark, dir)
    val total = agg.agg(sum(col("n_customers"))).collect()(0).getLong(0)
    assert(total == Tables.customer(spark, dir).count())
    // the fixture really contains the garbage member...
    val fixture = graft.sources.Tables.exportOnce(
      s"$dir/customer.parquet", "graft_corrupt_", _ => fail("fixture missing"))
    assert(new java.io.File(fixture, "part-corrupt.parquet").exists())
    // ...and the DEFAULT (unscoped) read refuses to silently skip it
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(fixture).count()
    }
    assert(ex.getMessage != null)
  }

  test("retention: expired day directories are gone, survivors intact") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val cutoff = 19740L
    val agg = graft.operators.Maintenance.retentionRoundtrip(spark, dir, cutoff)
    // nothing older than the cutoff survives the read
    val minDay = agg.agg(min(col("min_day"))).collect()(0).getLong(0)
    assert(minDay >= cutoff)
    // row counts reconcile with the flat table's cutoff filter
    val total = agg.agg(sum(col("n_events"))).collect()(0).getLong(0)
    val expected = graft.operators.Events.events(spark, dir)
      .where(expr("ts_us div 86400000000") >= cutoff).count()
    assert(total == expected && total > 0)
    // the layout itself: every surviving partition directory is >= cutoff
    val fixture = graft.sources.Tables.exportOnce(
      s"$dir/events.parquet", "graft_retain_", _ => fail("fixture missing"))
    val days = new java.io.File(fixture).listFiles()
      .filter(_.getName.startsWith("event_day="))
      .map(_.getName.stripPrefix("event_day=").toLong)
    assert(days.nonEmpty && days.forall(_ >= cutoff))
  }

  test("GraftExtensions registers SQL functions") {
    // getOrCreate would return the shared session; force a fresh one on the
    // same SparkContext so the extension hook actually runs.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = s2.sql(
        """SELECT graft_shingle_set('a b c d', 3) AS sh,
          |       graft_tokenize('x!!y') AS toks,
          |       graft_hash31('ab') AS h,
          |       graft_simhash48(array(1L, 2L, 3L)) AS sh48,
          |       graft_minhash(array(7L, 8L), 4) AS mh,
          |       graft_hyperplane_sig(array(1.0d, -1.0d), 4) AS hp""".stripMargin).head()
      assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
      assert(row.getSeq[String](1) == Seq("x", "y"))
      assert(row.getLong(2) == ('a'.toInt * 31 + 'b'.toInt) % 2147483647L)
      assert(row.getSeq[Long](4).length == 4)

      // 62-bit family: packed two-fold hashes, sorted distinct; merge-scan
      // intersect over them
      val h62 = s2.sql(
        """SELECT graft_hash62_set(array('ab', 'cd', 'ab')) AS ha,
          |       graft_intersect_count(graft_hash62_set(array('ab', 'cd')),
          |                             graft_hash62_set(array('cd', 'ef'))) AS ic""".stripMargin).head()
      def fold(s: String, base: Long) = s.foldLeft(0L)((a, c) => (a * base + c) % 2147483647L)
      assert(h62.getSeq[Long](0).toSet ==
        Set("ab", "cd").map(s => (fold(s, 31) << 31) | fold(s, 37)))
      assert(h62.getLong(1) == 1L)

      // multiset shingler: duplicates kept (vs the set form above)
      assert(s2.sql("SELECT graft_shingle_list('a b a b a', 2) AS g")
        .head().getSeq[String](0) == Seq("a b", "b a", "a b", "b a"))

      // UDTF: generator in the select list and in LATERAL VIEW position
      assert(s2.sql("SELECT graft_shingle_explode('a b c d', 3) AS shingle")
        .collect().map(_.getString(0)).toSeq == Seq("a b c", "b c d"))
      assert(s2.sql(
        """SELECT doc, shingle FROM VALUES ('a b c d') v(doc)
          |LATERAL VIEW graft_shingle_explode(doc, 2) t AS shingle""".stripMargin)
        .count() == 3)

      // pure-SQL flagship through the same session: must equal the
      // DataFrame-API pipeline row for row
      GraftSql.registerTables(s2, "/root/testdata/sf0.001")
      val viaSql = s2.sql(GraftSql.flagshipSql(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
      val viaApi = graft.operators.BookQuery.referenceScores(
          graft.sources.Tables.documents(s2, "/root/testdata/sf0.001"))
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
      assert(viaSql == viaApi && viaSql.nonEmpty)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("graft-text sink: staged commit, overwrite truncates, append upserts, bad ids loud") {
    val dir = Files.createTempDirectory("graft_v2sink").toString
    Seq(("a", "alpha body"), ("b", "beta body"))
      .toDF("doc_id", "text")
      .write.format("graft-text").mode("overwrite").save(dir)
    // published atomically: docs visible, _SUCCESS marker, staging gone
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.contains("a.txt") && files.contains("b.txt") && files.contains("_SUCCESS"))
    assert(!files.exists(_.startsWith(".staging")), s"staging leaked: $files")
    val back = Tables.wholeTextDocumentsV2(spark, dir)
      .select($"doc_id".as[String], $"text".as[String]).collect().toMap
    assert(back == Map("a" -> "alpha body", "b" -> "beta body"))
    // append upserts by doc_id (the file IS the key) and keeps the rest
    Seq(("b", "beta v2"), ("c", "gamma body"))
      .toDF("doc_id", "text")
      .write.format("graft-text").mode("append").save(dir)
    val afterAppend = Tables.wholeTextDocumentsV2(spark, dir)
      .select($"doc_id".as[String], $"text".as[String]).collect().toMap
    assert(afterAppend == Map("a" -> "alpha body", "b" -> "beta v2", "c" -> "gamma body"))
    // overwrite truncates the visible corpus — readers see old or new, no mix
    Seq(("z", "zeta body")).toDF("doc_id", "text")
      .write.format("graft-text").mode("overwrite").save(dir)
    val afterOver = Tables.wholeTextDocumentsV2(spark, dir)
      .select($"doc_id".as[String]).collect().toSet
    assert(afterOver == Set("z"))
    // a doc_id that can't be a publishable file name fails the WRITE, and
    // the failed job publishes nothing
    val e = intercept[Exception] {
      Seq(("bad/slash", "x")).toDF("doc_id", "text")
        .write.format("graft-text").mode("append").save(dir)
    }
    assert(e.getMessage != null)
    val afterFail = Tables.wholeTextDocumentsV2(spark, dir)
      .select($"doc_id".as[String]).collect().toSet
    assert(afterFail == Set("z"), "failed write must publish nothing")
    // schema contract is validated up front
    val e2 = intercept[Exception] {
      Seq(("a", 1)).toDF("doc_id", "n")
        .write.format("graft-text").mode("append").save(dir)
    }
    assert(e2.getMessage != null)
    // text publishes line-NORMALIZED (\r?\n -> space, the corpus format's
    // canonical form), so write->read is the identity on what any reader
    // of this format observes — and republishing converges byte-for-byte
    Seq(("nl", "line one\nline two\r\nline three")).toDF("doc_id", "text")
      .write.format("graft-text").mode("append").save(dir)
    val nl = Tables.wholeTextDocumentsV2(spark, dir)
      .where($"doc_id" === "nl").select($"text".as[String]).head()
    assert(nl == "line one line two line three")
    Seq(("nl", nl)).toDF("doc_id", "text")
      .write.format("graft-text").mode("append").save(dir)
    val nl2 = Tables.wholeTextDocumentsV2(spark, dir)
      .where($"doc_id" === "nl").select($"text".as[String]).head()
    assert(nl2 == nl)
    // extra input columns would be silently discarded by a doc-per-file
    // format — the write schema contract is exact, and fails up front
    // (Spark's append analysis rejects it against the table schema before
    // our builder's exact-set require even runs — either way, loud)
    val e3 = intercept[Exception] {
      Seq(("q", "body", 7)).toDF("doc_id", "text", "extra")
        .write.format("graft-text").mode("append").save(dir)
    }
    assert(e3.getMessage != null)
    assert(!new java.io.File(dir).listFiles().map(_.getName).contains("q.txt"))
  }

  test("graft-text sink: driver commit work is O(tasks), publish is executor-side") {
    import graft.sources.v2.TextCorpusSinkMetrics
    val dir = Files.createTempDirectory("graft_v2sink_scale").toString
    val nDocs = 96
    // many docs spread over many tasks: the per-doc renames must happen at
    // TASK commit (parallel, executor-side); the DRIVER commit does only
    // staging cleanup + _SUCCESS — a small constant independent of nDocs.
    // This is the pin against the Hadoop-v1-committer regression (a serial
    // per-document driver rename loop was measured at 97.7 s for ~10k docs).
    spark.range(nDocs).selectExpr("CONCAT('doc', id) AS doc_id", "'body' AS text")
      .repartition(8)
      .write.format("graft-text").mode("append").save(dir)
    val appendOps = TextCorpusSinkMetrics.lastDriverCommitOps.get()
    assert(appendOps <= 3, s"driver commit did $appendOps FS mutation ops for " +
      s"$nDocs docs — publish work leaked back onto the driver")
    assert(Tables.wholeTextDocumentsV2(spark, dir).count() == nDocs)
    // overwrite with the same doc set: truncate finds nothing stale to
    // delete, so driver work stays O(tasks) there too
    spark.range(nDocs).selectExpr("CONCAT('doc', id) AS doc_id", "'body2' AS text")
      .repartition(8)
      .write.format("graft-text").mode("overwrite").save(dir)
    val overwriteOps = TextCorpusSinkMetrics.lastDriverCommitOps.get()
    assert(overwriteOps <= 3, s"same-keyed overwrite did $overwriteOps driver ops")
    val back = Tables.wholeTextDocumentsV2(spark, dir)
    assert(back.count() == nDocs && back.where($"text" === "body2").count() == nDocs)
  }

  // the defensive probe the events testdata regeneration motivated: a fixture
  // table whose column was re-encoded to something outside the accepted set
  // must fail with ONE targeted "testdata schema changed" message naming the
  // column and both types — not scattered analysis errors downstream
  test("schema probe: a re-typed fixture column fails with one targeted message") {
    val dir = Files.createTempDirectory("graft_probe").toString
    Seq((1L, "not-a-timestamp", 10L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] { Tables.table(spark, dir, "events") }
    assert(e.getMessage.contains("testdata schema changed for table 'events'"))
    assert(e.getMessage.contains("ts: string"))
    // minimal same-named spec fixtures (absent columns) are fine
    val dir2 = Files.createTempDirectory("graft_probe2").toString
    Seq((1L, 2L)).toDF("event_id", "user_id").write.parquet(s"$dir2/events.parquet")
    assert(Tables.table(spark, dir2, "events").count() == 1)
    // unknown (user) tables are not policed
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/mytable.parquet")
    assert(Tables.table(spark, dir, "mytable").count() == 1)
  }

  test("stale-export reclaim is block-count anchored: sibling hex-named datasets survive") {
    // dataset `sf1` vs sibling `sf1_7a` (name extends with a HEX-ONLY
    // segment): the sibling's live dirs parse as prefix + one EXTRA hex
    // block, so a blocks-anchored reclaim for sf1 must leave them alone —
    // keepPrefix only protects the caller's own dataset
    val parent = Files.createTempDirectory("graft_reclaim").toString
    def mk(name: String): java.io.File = {
      val f = new java.io.File(parent, name); f.mkdirs(); f
    }
    val stale1 = mk("graft_x_sf1_aaaa")           // sf1, superseded fp
    val live1 = mk("graft_x_sf1_bbbb")            // sf1, current fp
    val sibling = mk("graft_x_sf1_7a_cccc")       // sf1_7a's LIVE dir
    val other = mk("graft_x_sf1_notes")           // non-hex suffix: untouched
    Tables.cleanStaleExports(parent, "graft_x_sf1_", "graft_x_sf1_bbbb", blocks = 1)
    assert(!stale1.exists(), "superseded fingerprint must be reclaimed")
    assert(live1.exists() && sibling.exists() && other.exists(),
      "live, sibling-dataset, and non-hex dirs must survive a 1-block reclaim")
    // 2-block prefixes (paired-table fingerprints): same anchoring — a
    // 3-block sibling name survives, the stale 2-block dir is reclaimed
    val stale2 = mk("graft_y_sf1_aaaa_bbbb")
    val live2 = mk("graft_y_sf1_cccc_dddd")
    val sibling2 = mk("graft_y_sf1_7a_aaaa_bbbb")
    Tables.cleanStaleExports(parent, "graft_y_sf1_", "graft_y_sf1_cccc_dddd",
      blocks = 2)
    assert(!stale2.exists() && live2.exists() && sibling2.exists())
    // blocks = 0 (legacy reclaim, keep marker matches nothing): ANY block
    // count under the dead prefix is stale, including the sibling's
    Tables.cleanStaleExports(parent, "graft_y_sf1_", "graft_y_sf1_-")
    assert(!live2.exists() && !sibling2.exists())
  }
}
