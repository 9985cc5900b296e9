package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at the SF dir in
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Comparability (r2 verdict item 1): queries run in FIXED sorted-name order
  * for SPARK_GRAFT_BENCH_ITERS (default 2) full passes, and each query
  * reports the MIN across passes — so round-over-round deltas track code, not
  * the registry's hash-map iteration order or residual JIT/codegen noise in
  * whichever queries happen to run first.
  *
  * A failed query is LOUD: its name lands in an "errors" object on the same
  * line (and on stderr), its wall time stays visible in "queries", and it is
  * EXCLUDED from "value" — a broken query can't contribute a plausible total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.parquet is TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on synthetic rows (touches NO benchmark data):
    // without it the first measured query absorbs ~5 s of JIT + codegen +
    // shuffle-machinery init and per-query numbers misattribute it.
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    def jq(s: String): String = JsonOut.q(s)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (pass <- 1 to iters; (name, fn) <- named) {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          errors(name) = e.toString.take(300)
          System.err.println(s"[bench] FAILED $name (pass $pass): ${e.toString.take(500)}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
      System.err.println(f"[bench] pass $pass $name: $t%.2f s")
    }
    val qs = named.map { case (k, _) => s"${jq(k)}:${best(k)}" }.mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
        .mkString(""","errors":{""", ",", "}")
    val total = named.collect { case (k, _) if !errors.contains(k) => best(k) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson""" +
      s""","iters":$iters,"order":"sorted","sf":${jq(sfDir)}}""")
    spark.stop()
  }
}
