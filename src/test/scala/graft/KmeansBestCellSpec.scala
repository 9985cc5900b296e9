package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.expressions.{KmeansBestCell, KmeansKernel}

/** The native assignment-argmax kernel (r16) against its two contracts:
  *
  *  1. `round6` is BIT-IDENTICAL to Spark's `round(x, 6)` on doubles —
  *     fuzzed over the cosine range plus grid/boundary adversaries (the
  *     kernel replicates RoundBase's scala-BigDecimal path, and every
  *     DuckDB oracle replays `round(x, 6)`).
  *  2. `KmeansBestCell` selects the SAME winner with the SAME rounded
  *     output as the HOF argmax it replaced
  *     (`array_max(transform(cents, struct(round(csim,6), -cl)))`),
  *     including rounding-collision ties broken by lowest cl — fuzzed
  *     over random centroid tables and vectors, plus constructed
  *     duplicate/near-tie centroid sets.
  */
class KmeansBestCellSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("round6 is bit-identical to Spark round(x, 6) across the cosine range and boundary adversaries") {
    val rnd = new scala.util.Random(7)
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 0.5e-6, -0.5e-6, 1.5e-6, -1.5e-6,
      0.1234565, 0.12345649999999999, 0.12345650000000001,
      -0.1234565, -0.12345649999999999, -0.12345650000000001,
      0.9999995, -0.9999995, 1e-7, -1e-7, 4.9e-7, 5.1e-7,
      math.ulp(0.5e-6), 0.5e-6 - math.ulp(0.5e-6), 0.5e-6 + math.ulp(0.5e-6),
      Double.MinPositiveValue, -Double.MinPositiveValue)
    val fuzz = Seq.fill(200000)(rnd.nextDouble() * 2 - 1) ++
      Seq.fill(50000)((rnd.nextInt(2000001) - 1000000) / 1e6 +
        (rnd.nextDouble() - 0.5) * 2e-6) ++ adversarial
    val viaSpark = fuzz.toDF("d")
      .select(col("d"), round(col("d"), 6).as("r")).collect()
    viaSpark.foreach { row =>
      val d = row.getDouble(0)
      val expect = row.getDouble(1)
      val got = KmeansKernel.round6(d)
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(expect) ||
        (got == 0.0 && expect == 0.0),
        s"round6($d) = $got but Spark round = $expect")
    }
  }

  private def bestVia(expr: (Column, Column, Column) => Column,
      vecs: Seq[(Long, Seq[Double])], cents: Seq[(Int, Seq[Double])]) = {
    val centsArr = broadcast(
      cents.toDF("cl", "cv").agg(array_sort(collect_list(struct(col("cl"),
        col("cv"), sqrt(aggregate(zip_with(col("cv"), col("cv"), _ * _),
          lit(0.0), _ + _)).as("ncv")))).as("cents")))
    vecs.toDF("vec_id", "v")
      .withColumn("nv", sqrt(aggregate(zip_with(col("v"), col("v"), _ * _),
        lit(0.0), _ + _)))
      .crossJoin(centsArr)
      .withColumn("best", expr(col("v"), col("nv"), col("cents")))
      .select(col("vec_id"), col("best").getField("csim").as("csim"),
        col("best").getField("ncl").as("ncl"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
  }

  private val hofArgmax: (Column, Column, Column) => Column = (v, nv, cents) =>
    array_max(transform(cents, c => {
      val csim = when(nv === 0.0 || c.getField("ncv") === 0.0, lit(0.0))
        .otherwise(aggregate(zip_with(v, c.getField("cv"), _ * _),
          lit(0.0), _ + _) / (nv * c.getField("ncv")))
      struct(round(csim, 6).as("csim"), (-c.getField("cl")).as("ncl"))
    }))

  private val nativeArgmax: (Column, Column, Column) => Column = (v, nv, cents) => {
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    toColumn(KmeansBestCell(toExpression(v), toExpression(nv), toExpression(cents)))
  }

  test("KmeansBestCell matches the HOF argmax on random vectors and centroids") {
    val rnd = new scala.util.Random(13)
    val dim = 8
    val cents = (0 until 23).map(i => (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val vecs = (0L until 400L).map(i => (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    assert(bestVia(nativeArgmax, vecs, cents) == bestVia(hofArgmax, vecs, cents))
  }

  test("KmeansTopCells matches the HOF slice(array_sort(...), 1, np) elements and order") {
    import org.apache.spark.sql.GraftShim.{toColumn, toExpression}
    val rnd = new scala.util.Random(31)
    val dim = 6
    val base = Seq(0.4, -0.1, 0.7, 0.2, -0.5, 0.3)
    val cents = (0 until 17).map(i => (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))) ++
      // rounding-collision ties and a zero-norm centroid
      Seq((40, base), (41, base), (42, base.map(_ * (1 + 1e-9))),
        (43, Seq.fill(dim)(0.0)))
    val vecs = (0L until 200L).map(i => (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))) ++
      Seq((900L, base), (901L, Seq.fill(dim)(0.0)))
    for (np <- Seq(1, 2, 3, 5, 25)) {
      def cellsVia(expr: (Column, Column, Column) => Column) = {
        val centsArr = broadcast(
          cents.toDF("cl", "cv").agg(array_sort(collect_list(struct(col("cl"),
            col("cv"), sqrt(aggregate(zip_with(col("cv"), col("cv"), _ * _),
              lit(0.0), _ + _)).as("ncv")))).as("cents")))
        vecs.toDF("vec_id", "v")
          .withColumn("nv", sqrt(aggregate(zip_with(col("v"), col("v"), _ * _),
            lit(0.0), _ + _)))
          .crossJoin(centsArr)
          .withColumn("cells", expr(col("v"), col("nv"), col("cents")))
          .select(col("vec_id"), posexplode(col("cells")).as(Seq("pos", "c")))
          .select(col("vec_id"), col("pos"), col("c.ncsim"), col("c.cl"))
          .orderBy("vec_id", "pos").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3))).toSeq
      }
      val hof: (Column, Column, Column) => Column = (v, nv, c) =>
        slice(array_sort(transform(c, e => {
          val csim = when(nv === 0.0 || e.getField("ncv") === 0.0, lit(0.0))
            .otherwise(aggregate(zip_with(v, e.getField("cv"), _ * _),
              lit(0.0), _ + _) / (nv * e.getField("ncv")))
          struct((-round(csim, 6)).as("ncsim"), e.getField("cl").as("cl"))
        })), 1, np)
      val native: (Column, Column, Column) => Column = (v, nv, c) =>
        toColumn(graft.functions.expressions.KmeansTopCells(
          toExpression(v), toExpression(nv), toExpression(c), np))
      assert(cellsVia(native) == cellsVia(hof), s"np=$np mismatch")
    }
  }

  test("KmeansBestCell breaks rounding-collision ties by lowest cl, like the HOF argmax") {
    // duplicate centroids (exact ties at every rank) and near-ties that
    // collide only after rounding; zero vector exercises the norm guard
    val dim = 4
    val base = Seq(0.3, -0.2, 0.9, 0.1)
    val cents = Seq(
      (5, base), (2, base), (9, base),
      (1, base.map(_ * (1 + 1e-9))), // rounds onto the same cosine
      (0, Seq(0.0, 0.0, 0.0, 0.0)), // zero-norm centroid -> guarded 0.0
      (7, Seq(-0.3, 0.2, -0.9, -0.1)))
    val vecs = Seq((0L, base), (1L, base.map(-_)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0)), (3L, Seq(1.0, 0.0, 0.0, 0.0)))
    val native = bestVia(nativeArgmax, vecs, cents)
    assert(native == bestVia(hofArgmax, vecs, cents))
    // the winner for the base vector must be the LOWEST cl among the ties
    assert(native.head._3 == -1 || native.head._3 == -2,
      s"tie must resolve to the lowest colliding cl, got ${native.head}")
  }
}
