package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Scale}
import graft.sources.Tables

/** Scale tooling: result-equivalence of the salted plans and the
  * zero-exchange property of bucketed co-located joins.
  */
class ScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("salted count equals plain groupBy count") {
    val li = Tables.lineitem(spark, dir)
    val plain = li.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    val salted = Scale.saltedCount(li, Seq("l_returnflag"), buckets = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("bucket-local kNN kernel: hot one-bucket corpus matches the edge plan; guard trips loudly") {
    // the worst shape the kernel can meet: 150 near-identical vectors put
    // the whole corpus in ONE bucket per band (hyperplane signs agree on
    // near-dups by design) plus a distinct tail — the kernel's B² loop
    // runs on the hot bucket and must still emit exactly the edge plan's
    // rows; a maxBucket below the hot size must fail loudly, not OOM
    import graft.operators.EmbeddingSearch
    val root = java.nio.file.Files.createTempDirectory("graft_knn_hot").toString
    val base = (0 until 64).map(d => math.sin(d + 1).toFloat)
    val rows = (0L until 150L).map { i =>
      // tiny per-vector perturbation: same signature, distinct cosines
      (i, base.zipWithIndex.map { case (x, d) =>
        x + (if (d == (i % 64).toInt) 1e-4f * ((i % 7) + 1) else 0f) }, 0)
    } ++ (150L until 160L).map { i =>
      (i, (0 until 64).map(d => math.cos((d + 3) * (i - 148)).toFloat).toIndexedSeq, 1)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4).write.mode("overwrite").parquet(s"$root/embeddings.parquet")
    val edge = EmbeddingSearch.knnJoin(spark, root)
      .as[(Long, Long, Double, Long)].collect().toSet
    val local = EmbeddingSearch.knnJoinBucketLocal(spark, root)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(local == edge, "hot-bucket kernel diverged from the edge plan")
    assert(local.nonEmpty && local.map(_._1).size >= 150,
      "every hot-family vector should find neighbors")
    val e = intercept[org.apache.spark.SparkException] {
      EmbeddingSearch.knnJoinBucketLocal(spark, root, maxBucket = 100)
        .count()
    }
    assert(e.getMessage.contains("not discriminating") ||
      Option(e.getCause).exists(_.getMessage.contains("not discriminating")),
      s"guard message missing: ${e.getMessage}")
  }

  test("bucket-local pairs kernel: hot one-bucket corpus streams its quadratic output exactly") {
    // the pairs twin of the kNN stress above: a 150-member near-identical
    // family is ONE bucket per band and every member pair survives the
    // tau filter — quadratic OUTPUT by contract (~11k rows from 150
    // vectors), which the kernel must stream out of its lazy iterator
    // row-identically to the edge plan, never buffer per task
    import graft.operators.EmbeddingSearch
    val base = (0 until 64).map(d => math.sin(d + 1).toFloat)
    val rows = (0L until 150L).map { i =>
      (i, base.zipWithIndex.map { case (x, d) =>
        x + (if (d == (i % 64).toInt) 1e-4f * ((i % 7) + 1) else 0f) }, 0)
    } ++ (150L until 160L).map { i =>
      (i, (0 until 64).map(d => math.cos((d + 3) * (i - 148)).toFloat).toIndexedSeq, 1)
    }
    val df = rows.toDF("vec_id", "embedding", "label").repartition(4)
    val edge = EmbeddingSearch.cosineNearDupPairsFor(df, tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val local = EmbeddingSearch.cosineNearDupPairsBucketLocal(df, tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(local == edge, "hot-bucket pairs kernel diverged from the edge plan")
    assert(local.size >= 150L * 149L / 2,
      s"the hot family's all-pairs output should survive tau: ${local.size}")
    val e = intercept[org.apache.spark.SparkException] {
      EmbeddingSearch.cosineNearDupPairsBucketLocal(df, tau = 0.9, maxBucket = 100).count()
    }
    assert(e.getMessage.contains("not discriminating") ||
      Option(e.getCause).exists(_.getMessage.contains("not discriminating")),
      s"guard message missing: ${e.getMessage}")
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand")
    val plain = li.join(part, $"l_partkey" === $"p_partkey")
      .groupBy("p_brand").count().as[(String, Long)].collect().toMap
    val salted = Scale.saltedJoin(li, part, "l_partkey", "p_partkey", buckets = 4)
      .groupBy("p_brand").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("hot LSH bucket (150-way dup family) completes with exact pair set under AQE") {
    // The 100 TB skew story (SCALING.md): a boilerplate dup family lands ALL
    // its docs in the same band buckets, so candidate volume inside one
    // bucket is C(n,2) — the worst shape the band self-join can take. With
    // AQE skew handling on (session default, asserted), the oversized
    // partition is split at runtime and the result must still be EXACTLY
    // every pair of the family, nothing more.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    val hot = (0L until 150L).map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
    val cold = Seq(
      (900L, "totally different words in this one right here"),
      (901L, "and yet another unrelated document body text"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val got = graft.operators.Dedup.minhashLshPairs(docs, tau = 0.9)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.length == 150 * 149 / 2, s"expected C(150,2) pairs, got ${got.length}")
    assert(got.forall(_._3 == 1.0))
    assert(got.forall { case (a, b, _) => a < b && b < 150L })
  }

  test("bucketed tables join with zero runtime exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ordersB = Tables.bucketedTable(spark, dir, "orders", "o_orderkey")
      val lineitemB = Tables.bucketedTable(spark, dir, "lineitem", "l_orderkey")
      val joined = spark.table(lineitemB).select("l_orderkey", "l_quantity")
        .join(spark.table(ordersB), $"l_orderkey" === $"o_orderkey")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, s"expected no exchange, plan:\n${joined.queryExecution.executedPlan}")
      // and the join is still correct
      assert(joined.count() == Tables.lineitem(spark, dir).count())

      // control: the same join over plain parquet DOES shuffle both sides
      val plain = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      val plainExchanges = plain.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(plainExchanges.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bloom-pruned fact: no false negatives, real pruning, join-invariant") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val dim = Tables.part(spark, dir).where($"p_partkey" % 13 === 0)
      .select("p_partkey")
    val pruned = Scale.bloomPrunedFact(li, dim, "l_partkey", "p_partkey")

    // every true match survives the bloom (no false negatives): the exact
    // semi-join result minus the pruned set must be empty
    val exactSemi = li.join(dim, $"l_partkey" === $"p_partkey", "left_semi")
    assert(exactSemi.exceptAll(pruned).count() == 0)

    // the bloom actually prunes: survivors are a small fraction of the fact
    val (total, kept, matches) = (li.count(), pruned.count(), exactSemi.count())
    assert(kept < total / 2, s"bloom kept $kept of $total rows — not pruning")
    assert(kept >= matches)

    // false positives are verified away by the exact join: the joined
    // result over the pruned fact equals the plain join
    val viaBloom = pruned.join(dim, $"l_partkey" === $"p_partkey")
      .groupBy("p_partkey").count().as[(Long, Long)].collect().toMap
    val plain = li.join(dim, $"l_partkey" === $"p_partkey")
      .groupBy("p_partkey").count().as[(Long, Long)].collect().toMap
    assert(viaBloom == plain)
  }

  test("bloom width rule: power of two, >= 16 bits/key, clamped") {
    assert(Scale.bloomBitsFor(0) == (1 << 17))
    assert(Scale.bloomBitsFor(8192) == (1 << 17))      // 8192*16 = 2^17 exactly
    assert(Scale.bloomBitsFor(8193) == (1 << 18))      // first key over the edge
    assert(Scale.bloomBitsFor(1000000) == (1 << 24))
    assert(Scale.bloomBitsFor(Long.MaxValue / 32) == (1 << 27)) // clamp
    // monotone and always a power of two
    val widths = Seq(1L, 100L, 10000L, 1000000L, 100000000L).map(Scale.bloomBitsFor(_))
    assert(widths == widths.sorted)
    widths.foreach(w => assert((w & (w - 1)) == 0))
  }

  test("codegen bloom probe ≡ the interpreted HOF formulation, bit-for-bit") {
    import org.apache.spark.sql.Column
    val P31 = 2147483647L
    val (k, mBits) = (5, 1 << 12)
    val dim = spark.range(0, 1000, 13).toDF("key")
    val bloom = Scale.buildBloom(dim, "key", k, mBits)
    val facts = spark.range(0, 3000).toDF("fk").crossJoin(bloom)
    // the pre-round-6 interpreted kernel, replayed against the dense words
    // (array element_at is 1-based where the old map lookup was 0-keyed)
    def hofPositions(key: Column): Column =
      transform(sequence(lit(0), lit(k - 1)), i =>
        pmod(pmod(key, lit(P31)) * (i * lit(2) + lit(1))
          + (lit(12345L) + lit(67891L) * i), lit(P31)) % lit(mBits.toLong))
    val old = facts.where(forall(hofPositions(col("fk")), pos =>
        element_at(col("bloom"), ((pos / 64).cast("int") + 1))
          .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0))
      .select("fk").as[Long].collect().toSet
    val neu = facts.where(Scale.bloomMightContain(col("bloom"), col("fk"), k, mBits))
      .select("fk").as[Long].collect().toSet
    assert(neu == old)
    // sanity: every dim key passes its own bloom, and the probe prunes
    assert((0L until 1000L by 13).toSet.subsetOf(neu))
    assert(neu.size < 3000)
  }

  test("interval join equals the naive range join: overlaps, boundaries, empties") {
    // intervals: disjoint, OVERLAPPING (a point in k intervals emits k
    // rows), zero-width (lo == hi boundary hit), inverted (lo > hi — can
    // never match), and spanning many bands; points sit on boundaries too
    val intervals = Seq(
      (0L, 0.0, 10.0), (1L, 5.0, 15.0), (2L, 20.0, 20.0),
      (3L, 30.0, 25.0), (4L, 40.0, 140.0)).toDF("iid", "lo", "hi")
    val points = Seq((100L, 0.0), (101L, 5.0), (102L, 10.0), (103L, 12.5),
      (104L, 20.0), (105L, 27.0), (106L, 139.99), (107L, 140.0), (108L, 141.0))
      .toDF("pid", "p")
    // (maxReplication raised for the w=1.0 point: the [40,140] interval
    // spans 101 1-wide bands, which the default guard would rightly refuse)
    for (w <- Seq(1.0, 7.0, 1000.0)) {
      val banded = Scale.intervalJoin(points, intervals, "p", "lo", "hi", w,
          maxReplication = 200)
        .select($"pid".as[Long], $"iid".as[Long]).collect().toSeq.sorted
      val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
        .select($"pid".as[Long], $"iid".as[Long]).collect().toSeq.sorted
      assert(banded == naive, s"bandWidth=$w: $banded != $naive")
    }
    // DERIVED width (no constant supplied) recovers the same result set
    val derived = Scale.intervalJoin(points, intervals, "p", "lo", "hi")
      .select($"pid".as[Long], $"iid".as[Long]).collect().toSeq.sorted
    val naiveAll = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid".as[Long], $"iid".as[Long]).collect().toSeq.sorted
    assert(derived == naiveAll)
    // sanity on the fixture: the overlap really produces multi-matches and
    // the inverted interval matches nothing
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"pid".as[Long], $"iid".as[Long]).collect()
    assert(naive.count(_._1 == 101L) == 2)
    assert(!naive.exists(_._2 == 3L))
  }

  test("bandWidthFor: median rule, catch-all floor, closed form, degenerate fail-loud") {
    // median width drives the answer: widths {2, 4, 100} -> median 4,
    // floor 100/64 < 4, so w = 4
    val mixed = Seq((0.0, 2.0), (10.0, 14.0), (0.0, 100.0)).toDF("lo", "hi")
    assert(Scale.bandWidthFor(mixed, "lo", "hi") == 4.0)
    // a pathological catch-all: median 2, max 100000 -> the floor wins and
    // caps the wide interval's replication at maxReplication bands. The
    // divisor is maxReplication-1: a width-64w interval ALWAYS spans 65
    // bands (floor(x+64)-floor(x) = 64), which would trip intervalJoin's
    // own guard on exactly the interval the floor was derived for
    val catchAll = Seq((0.0, 2.0), (1.0, 3.0), (0.0, 100000.0)).toDF("lo", "hi")
    val w = Scale.bandWidthFor(catchAll, "lo", "hi")
    assert(w == 100000.0 / 63)
    assert(math.ceil(100000.0 / w) <= 64)
    // EXECUTE the binding-floor case end to end: the derived width must
    // clear the replication guard (regression: w = maxW/64 raised in-plan)
    val caPoints = Seq((1L, 1.5), (2L, 99999.0)).toDF("pid", "p")
    val caIntervals = Seq((0L, 0.0, 2.0), (1L, 1.0, 3.0), (2L, 0.0, 100000.0))
      .toDF("iid", "lo", "hi")
    val caGot = Scale.intervalJoin(caPoints, caIntervals, "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(caGot == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 2L)))
    // integer interval bounds (the IP-range / day-interval shape) must
    // derive, not ClassCastException on the driver-side double reads
    assert(Scale.bandWidthFor(Seq((0L, 10L), (5L, 25L), (0L, 30L))
      .toDF("lo", "hi"), "lo", "hi") == 20.0)
    // CLOSED FORM the bandJoin delegation relies on: constant-width
    // implicit intervals [v-eps, v+eps] derive exactly 2*eps
    val eps = 0.25
    val const = Seq(-1.25, 0.0, 0.49, 1.26).toDF("v")
      .select(($"v" - eps).as("lo"), ($"v" + eps).as("hi"))
    assert(Scale.bandWidthFor(const, "lo", "hi") == 2 * eps)
    // degenerate inputs fail loudly instead of dividing by zero downstream
    val e1 = intercept[IllegalArgumentException] {
      Scale.bandWidthFor(Seq((1.0, 1.0), (2.0, 2.0)).toDF("lo", "hi"), "lo", "hi")
    }
    assert(e1.getMessage.contains("point"))
    val e2 = intercept[IllegalArgumentException] {
      Scale.bandWidthFor(Seq.empty[(Double, Double)].toDF("lo", "hi"), "lo", "hi")
    }
    assert(e2.getMessage.contains("empty"))
  }

  test("intervalJoin replication guard: a pathologically wide interval fails loudly") {
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val intervals = Seq((0L, 0.0, 10.0), (1L, 0.0, 100000.0)).toDF("iid", "lo", "hi")
    // explicit narrow width: the catch-all would replicate into 100000
    // band rows — the in-plan guard raises instead of materializing them
    val e = intercept[Exception] {
      Scale.intervalJoin(points, intervals, "p", "lo", "hi", bandWidth = 1.0).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("spans more than") ||
        e.getCause != null && e.getCause.getMessage.contains("spans more than")))
    // the DERIVED width on the same table sails through (the floor caps
    // the catch-all at <= 64 bands) and matches the naive join
    val got = Scale.intervalJoin(points, intervals, "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 0L), (1L, 1L)))
  }

  test("band join equals the naive inequality cross-join, incl. negatives") {
    val eps = 0.25
    // values straddle band boundaries, zero, and negatives; includes exact
    // eps-distance pairs (the <= boundary) and same-band duplicates
    val left = Seq((1L, -1.0), (2L, -0.76), (3L, 0.0), (4L, 0.24), (5L, 0.25),
      (6L, 1.0), (7L, 1.0)).toDF("lid", "lv")
    val right = Seq((10L, -1.25), (11L, -0.5), (12L, 0.0), (13L, 0.49),
      (14L, 1.26)).toDF("rid", "rv")
    val banded = Scale.bandJoin(left, right, "lv", "rv", eps)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val naive = left.crossJoin(right).where(abs($"lv" - $"rv") <= eps)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(banded == naive)
    // no duplicate pair from the 3-band replication (left band is fixed)
    assert(banded.distinct == banded)
    // exact-boundary pair present: |0.25 - 0.0| <= 0.25
    assert(banded.contains((5L, 12L)))
    // and on the real tables: the registered entry equals the naive plan
    val dir = "/root/testdata/sf0.001"
    // eps widened for the tiny fixture so the match set is non-empty
    val got = Relational.acctbalBandPairs(spark, dir, eps = 50.0)
      .select("c_custkey", "s_suppkey").as[(Long, Long)].collect().toSet
    val c = graft.sources.Tables.customer(spark, dir)
    val s = graft.sources.Tables.supplier(spark, dir)
    val exp = c.crossJoin(s).where(abs($"c_acctbal" - $"s_acctbal") <= 50.0)
      .select("c_custkey", "s_suppkey").as[(Long, Long)].collect().toSet
    assert(got == exp)
    assert(got.nonEmpty, "band join should match pairs on the fixture")
  }
}
