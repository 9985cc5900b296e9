package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BookQuery, SimilarityJoin}
import graft.functions.HashFunctions

/** Property-based checks (SURVEY.md §5.2) against an independent plain-Scala
  * model of the reference semantics: Java split("\\W+") + sliding(3) + set
  * ops. Uses ScalaCheck generators sampled over fixed seeds (build.sbt has
  * scalacheck but not the scalatest-plus bridge), so runs are deterministic
  * and each case is one small Spark job.
  */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d", "e", "spark", "row", "scan")
  private val genText: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** The reference model, independent of the engine code. */
  private def modelShingles(s: String): Set[String] =
    s.split("\\W+").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet

  private def modelJaccard(a: String, b: String): Double = {
    val (sa, sb) = (modelShingles(a), modelShingles(b))
    if ((sa union sb).isEmpty) 0.0 else (sa intersect sb).size.toDouble / (sa union sb).size
  }

  // Dense generator (4-word vocab) so random text pairs actually share
  // shingles often enough to exercise the nonempty-intersection property.
  private val genTextDense: Gen[String] =
    Gen.chooseNum(4, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab.take(4))).map(_.mkString(" ")))

  test("sharded chunk keys: every Hamming<=3 pair shares a key (pigeonhole, 500 planted pairs)") {
    // the lossless-index guarantee the phash/simhash pairs joins rest on:
    // 12-bit chunk pigeonhole (some chunk of 4 is clean) nested with 9-bit
    // block pigeonhole over the 36-bit remainder (some block of 4 is clean)
    val rnd = new scala.util.Random(0xC0FFEE)
    val pairs = (0 until 500).map { i =>
      val fp = rnd.nextLong() & ((1L << 48) - 1)
      val flips = rnd.nextInt(4) // 0..3 bit flips
      var other = fp
      (0 until flips).foreach(_ => other ^= 1L << rnd.nextInt(48))
      (i.toLong, fp, other)
    }
    import org.apache.spark.sql.functions.{arrays_overlap, col}
    val df = pairs.toDF("i", "fp_a", "fp_b")
      .select(col("i"),
        HashFunctions.hamming(col("fp_a"), col("fp_b")).as("d"),
        arrays_overlap(
          HashFunctions.simhashShardedChunkKeys(col("fp_a")),
          HashFunctions.simhashShardedChunkKeys(col("fp_b"))).as("shared"))
    val missed = df.where(col("d") <= 3 && !col("shared")).count()
    assert(missed == 0, s"$missed Hamming<=3 pairs missed by the sharded key index")
    // and the keys really do refine: identical fingerprints share all 16
    val self = df.where(col("d") === 0).count()
    assert(self > 0) // seed sanity: some zero-flip pairs were generated
  }

  test("ShingleList kernel == independent sliding-window model on random text") {
    import graft.functions.TextFunctions.shingleList
    import org.apache.spark.sql.functions.col
    def modelList(s: String): Seq[String] =
      s.split("\\W+").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
    for (seed <- 0L until 20L) {
      val t = sample(genText, seed)
      val kernel = Seq(t).toDF("t").select(shingleList(col("t"), 3)).as[Seq[String]].head()
      assert(kernel == modelList(t), s"mismatch on '$t'")
    }
  }

  test("MinHashBandKeys kernel == HOF band keys, byte-identical (random + short signatures)") {
    // the r16 native band-key kernel against the HOF formulation it
    // replaced, which stays in-tree as this spec's oracle
    // (HashFunctions.minhashBandKeysHof): random signatures at the
    // registered geometry, plus shorter-than-bands·rpb adversaries where
    // slices degrade to partial/empty bands
    import graft.functions.HashFunctions
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val sigs: Seq[Seq[Long]] =
      Seq.fill(40)(Seq.fill(64)(rnd.nextLong().abs % 2147483647L)) ++
        Seq(Seq.empty[Long], Seq(7L), Seq.fill(5)(rnd.nextLong().abs),
          Seq.fill(63)(rnd.nextLong().abs % 2147483647L))
    for ((bands, rpb) <- Seq((16, 4), (8, 8), (4, 2))) {
      val df = sigs.toDF("sig").select(
        HashFunctions.minhashBandKeys(col("sig"), bands, rpb).as("native"),
        HashFunctions.minhashBandKeysHof(col("sig"), bands, rpb).as("hof"))
      df.as[(Seq[String], Seq[String])].collect().foreach { case (n, h) =>
        assert(n == h, s"band keys diverged at bands=$bands rpb=$rpb: $n vs $h")
      }
    }
  }

  test("62-bit hash kernels == independent model on random shingle sets") {
    // hashSet62 and IntersectCountSorted are the incremental-dedup index's
    // verification currency — model them independently: two plain-Scala
    // rolling folds packed h1*2^31+h2, set intersection via Scala Sets
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    import org.apache.spark.sql.functions.col
    def fold(s: String, base: Long): Long =
      s.foldLeft(0L)((a, c) => (a * base + c) % 2147483647L)
    def model62(s: String): Long = (fold(s, 31) << 31) | fold(s, 37)
    def kernelSets(a: Seq[String], b: Seq[String]): (Seq[Long], Seq[Long], Long) = {
      val df = Seq((a, b)).toDF("a", "b")
        .select(
          toColumn(graft.functions.expressions.HashSet62(toExpression(col("a")))).as("ha"),
          toColumn(graft.functions.expressions.HashSet62(toExpression(col("b")))).as("hb"))
      val r = df.select(col("ha"), col("hb"),
          toColumn(graft.functions.expressions.IntersectCountSorted(
            toExpression(col("ha")), toExpression(col("hb")))))
        .as[(Seq[Long], Seq[Long], Long)].head()
      r
    }
    for (seed <- 0L until 15L) {
      val ta = sample(genText, seed).split(" ").toSeq.filter(_.nonEmpty).distinct
      val tb = sample(genText, seed + 100).split(" ").toSeq.filter(_.nonEmpty).distinct
      val (ha, hb, inter) = kernelSets(ta, tb)
      val (ma, mb) = (ta.map(model62).distinct.sorted, tb.map(model62).distinct.sorted)
      assert(ha == ma, s"hashSet62 mismatch on $ta")
      assert(hb == mb, s"hashSet62 mismatch on $tb")
      assert(inter == (ma.toSet intersect mb.toSet).size.toLong,
        s"intersect count mismatch on ($ta, $tb)")
    }
  }

  test("VectorMeanAggregator == per-dim decimal-sum formulation, bit-exact") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(42)
    val rows = (0 until 97).map { i =>
      (i % 5, Seq.fill(8)(math.rint(rng.nextDouble() * 2e6 - 1e6) / 1e6))
    }
    val df = rows.toDF("g", "v")
      .select(col("g"), transform(col("v"), x => round(x, 6)).as("rv"))
    val viaUdaf = df.groupBy(col("g"))
      .agg(graft.functions.VectorMeanAggregator.vectorMean(col("rv")).as("cv"))
      .as[(Int, Seq[Double])].collect().toMap
    val viaDecimal = df
      .select(col("g"), posexplode(col("rv")).as(Seq("d", "x")))
      .groupBy(col("g"), col("d"))
      .agg((sum(col("x").cast("decimal(28,10)")).cast("double")
        / count(lit(1)).cast("double")).as("c"))
      .groupBy(col("g"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        s => s.getField("c")).as("cv"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(viaUdaf.keySet == viaDecimal.keySet)
    viaUdaf.foreach { case (g, v) =>
      assert(v.zip(viaDecimal(g)).forall { case (a, b) => a == b },
        s"group $g: $v vs ${viaDecimal(g)}")
    }
  }

  test("engine Jaccard equals the independent Scala model") {
    var checked = 0
    var seed = 0L
    while (checked < 8 && seed < 500) {
      val q = sample(genTextDense, seed * 2 + 1)
      val d = sample(genTextDense, seed * 2 + 2)
      if (modelShingles(q).nonEmpty && (modelShingles(q) intersect modelShingles(d)).nonEmpty) {
        val docs = Seq((0L, q), (1L, d)).toDF("doc_id", "text")
        val got = BookQuery.jaccardScores(docs).select("jaccard").as[Double].collect()
        val expected = BigDecimal(modelJaccard(q, d))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got.toSeq == Seq(expected), s"q=[$q] d=[$d]")
        checked += 1
      }
      seed += 1
    }
    assert(checked == 8)
  }

  test("reference score is within [0, 1] and invariant under doc order") {
    (0L until 6L).foreach { seed =>
      val texts = sample(Gen.listOfN(4, genText), seed + 500)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val scores = BookQuery.referenceScores(docs).select("score").as[Double].collect()
      assert(scores.forall(s => s >= 0.0 && s <= 1.0), s"texts=$texts")
      val shuffled = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.reverse
        .toDF("doc_id", "text")
      val scores2 = BookQuery.referenceScores(shuffled).select("score").as[Double].collect()
      assert(scores.sorted.toSeq == scores2.sorted.toSeq)
    }
  }

  test("all-pairs join: J(a,a)=1 via duplicated docs; pairs emitted once (a<b)") {
    var checked = 0
    var seed = 1000L
    while (checked < 5 && seed < 1100) {
      val t = sample(genText, seed)
      if (modelShingles(t).nonEmpty) {
        val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
        val pairs = SimilarityJoin.allPairsJaccard(docs, tau = 0.99)
          .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
        assert(pairs.toSeq == Seq((1L, 2L, 1.0)), s"t=[$t]")
        checked += 1
      }
      seed += 1
    }
    assert(checked == 5)
  }

  test("IntersectCountSorted(HashSet62) == model set-intersection size") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    import graft.functions.expressions.{HashSet62, IntersectCountSorted}
    (0L until 8L).foreach { seed =>
      val a = sample(genTextDense, seed * 2 + 9001)
      val b = sample(genTextDense, seed * 2 + 9002)
      val df = Seq((a, b)).toDF("a", "b")
      def hs(c: org.apache.spark.sql.Column) =
        toColumn(HashSet62(toExpression(graft.functions.TextFunctions.shingleSet(c, 3))))
      val got = df.select(
        toColumn(IntersectCountSorted(toExpression(hs(col("a"))), toExpression(hs(col("b"))))))
        .as[Long].head()
      val expected = (modelShingles(a) intersect modelShingles(b)).size.toLong
      assert(got == expected, s"a=[$a] b=[$b] got=$got expected=$expected")
    }
  }

  test("DotProduct kernel == sequential-fold model, bit-exact") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    import graft.functions.expressions.DotProduct
    val rnd = new scala.util.Random(7)
    (0 until 6).foreach { _ =>
      val a = Vector.fill(64)(rnd.nextDouble() * 2 - 1)
      val b = Vector.fill(64)(rnd.nextDouble() * 2 - 1)
      val got = Seq((a, b)).toDF("a", "b")
        .select(toColumn(DotProduct(toExpression(col("a")), toExpression(col("b")))))
        .as[Double].head()
      var acc = 0.0 // same fold order as the kernel and the DuckDB oracle
      (0 until 64).foreach(i => acc += a(i) * b(i))
      assert(got == acc, s"got=$got expected=$acc")
    }
  }

  test("graft_shingle_explode rows == shingleSet elements, order preserved") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    import graft.functions.expressions.ShingleExplode
    (0L until 6L).foreach { seed =>
      val t = sample(genText, seed + 4242)
      val df = Seq(Tuple1(t)).toDF("text")
      val exploded = df.select(
        toColumn(ShingleExplode(toExpression(col("text")), 3)).as("s"))
        .as[String].collect().toSeq
      val asSet = df.select(explode(graft.functions.TextFunctions.shingleSet(col("text"), 3)))
        .as[String].collect().toSeq
      assert(exploded == asSet, s"t=[$t]")
    }
  }

  test("minhash agreement estimates Jaccard within coarse epsilon") {
    import org.apache.spark.sql.functions._
    var checked = 0
    var seed = 2000L
    while (checked < 5 && seed < 2200) {
      val a = sample(genText, seed * 2 + 1)
      val b = sample(genText, seed * 2 + 2)
      if (modelShingles(a).size >= 3 && modelShingles(b).size >= 3) {
        val df = Seq((a, b)).toDF("a", "b")
        val numHashes = 128
        def sig(c: org.apache.spark.sql.Column) =
          HashFunctions.minhashFromHashes(
            HashFunctions.hashSet(graft.functions.TextFunctions.shingleSet(c, 3)), numHashes)
        val agree = df.select(
          size(filter(zip_with(sig(col("a")), sig(col("b")), (x, y) => (x === y).cast("int")),
            v => v === 1)).cast("double") / numHashes).as[Double].head()
        assert(math.abs(agree - modelJaccard(a, b)) < 0.35, s"a=[$a] b=[$b] agree=$agree")
        checked += 1
      }
      seed += 1
    }
    assert(checked == 5)
  }

  test("min-shared-band match stream == distinct banded candidates >= tau, exactly once") {
    // the stateless exactly-once trick (emit only on the minimum band a
    // pair shares) must reproduce the OBVIOUS formulation — distinct
    // band-collision candidates verified at tau — on random corpora where
    // near-identical pairs collide in many of the 16 bands. The transform
    // is stream-legal but runs identically on batch frames, so the
    // property checks at batch speed. Truth side: engine band keys (pinned
    // against models elsewhere) + the independent Scala Jaccard model.
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.functions.TextFunctions.shingleSet
    val tau = 0.5
    for (seed <- 0L until 3L) {
      val corpus = (0 until 12).map(i => (i.toLong, sample(genTextDense, seed * 100 + i)))
        .filter(d => modelShingles(d._2).nonEmpty)
      val batch = (100 until 108).map(i => (i.toLong, sample(genTextDense, seed * 100 + 50 + i)))
        .filter(d => modelShingles(d._2).nonEmpty)
      val idx = java.nio.file.Files.createTempDirectory("graft_prop_idx").toString
      Dedup.buildDedupIndex(corpus.toDF("doc_id", "text"), idx)
      val got = graft.streaming.StreamingOps.nearDupMatchesAgainstIndex(
          batch.toDF("doc_id", "text"), idx, tau)
        .select(col("doc_id"), col("near_match")).as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"seed $seed: duplicate pair emitted: ${got.toSeq}")
      val bandKeys: Map[Long, Set[String]] = (corpus ++ batch).toDF("doc_id", "text")
        .select(col("doc_id"), HashFunctions.minhashBandKeys(
          HashFunctions.minhashFromHashes(
            HashFunctions.hashSet(shingleSet(col("text"), 3)), 64), 16, 4).as("bk"))
        .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.toSet).toMap
      val texts = (corpus ++ batch).toMap
      val expected = (for {
        (bid, btext) <- batch
        (cid, ctext) <- corpus
        if bandKeys(bid).intersect(bandKeys(cid)).nonEmpty
        if modelJaccard(btext, ctext) >= tau
      } yield (bid, cid)).toSet
      assert(got.toSet == expected,
        s"seed $seed: got ${got.toSet} expected $expected (texts: $texts)")
    }
  }

  test("property: applyChangelog(old, snapshotDiff(old, new)) == new; diff is minimal") {
    import org.apache.spark.sql.functions.{col, lit}
    // arbitrary keyed snapshots incl. null values, overlapping and disjoint
    // keys — the diff/apply algebra must hold for EVERY pair, and the diff
    // must name exactly the keys whose rows differ
    val genVal: Gen[Option[String]] =
      Gen.option(Gen.oneOf("x", "y", "z", ""))
    val genSnap: Gen[Map[Long, (Option[String], Long)]] =
      Gen.mapOf(for {
        k <- Gen.chooseNum(0L, 12L)
        s <- genVal
        v <- Gen.chooseNum(-2L, 2L)
      } yield k -> (s, v))
    for (seed <- 1L to 8L) {
      val oldM = sample(genSnap, seed)
      val newM = sample(genSnap, seed + 1000)
      def df(m: Map[Long, (Option[String], Long)]) =
        m.toSeq.map { case (k, (s, v)) => (k, s.orNull, v) }.toDF("k", "s", "v")
      val (oldDf, newDf) = (df(oldM), df(newM))
      val diff = graft.operators.Relational.snapshotDiff(oldDf, newDf, "k")
        .localCheckpoint()
      // minimality: the diffed key set is exactly the symmetric-difference-
      // or-changed set of the two maps
      val expectKeys = (oldM.keySet ++ newM.keySet)
        .filter(k => oldM.get(k) != newM.get(k))
      val gotKeys = diff.select($"k".as[Long]).collect().toSet
      assert(gotKeys == expectKeys, s"seed $seed: $gotKeys != $expectKeys")
      // the algebra: re-apply reproduces new exactly (incl. null values)
      val reapplied = graft.operators.Relational.applyChangelog(
          oldDf, diff.withColumn("seq", lit(1L)), "k")
        .select($"k".as[Long], $"s".as[String], $"v".as[Long]).collect()
        .map(r => r._1 -> ((Option(r._2), r._3))).toMap
      assert(reapplied == newM, s"seed $seed: $reapplied != $newM")
    }
  }

  test("global-id assignment: exact 0..N-1 permutation in scramble order on arbitrary corpora") {
    // the two-phase (range-partition + local ranks + offsets) machinery
    // must produce EXACTLY the positions a driver-side global sort gives,
    // for any doc-id set — sparse, dense, singleton, adversarial gaps
    val genIds: Gen[List[Long]] = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1000000L)).map(_.distinct))
    def modelKey(id: Long): Long = {
      // portableScramble("<id>:0") — independent plain-Scala model
      def fold(s: String, base: Long): Long =
        s.foldLeft(0L)((a, c) => (a * base + c) % 2147483647L)
      val s = s"$id:0"
      (fold(s, 31) * fold(s, 37)) % 2147483647L
    }
    for (seed <- 1L to 8L) {
      val ids = sample(genIds, seed)
      val docs = ids.map(id => (id, s"doc $id")).toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis.assignGlobalIds(docs)
        .select($"doc_id".as[Long], $"seq".as[Long]).collect().toMap
      val expected = ids.sortBy(id => (modelKey(id), id)).zipWithIndex
        .map { case (id, i) => id -> i.toLong }.toMap
      assert(got == expected, s"seed $seed: $got != $expected")
    }
  }
}
