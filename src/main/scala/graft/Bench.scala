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
  * A failed query is LOUD and TRUNCATION-PROOF: "n_errors" rides directly
  * after "value" at the head of the line, the compact "error_names" list is
  * the LAST key on the line (an artifact keeping only a head or a tail of
  * the line still shows the failure count/names), the per-error messages
  * live mid-line in "errors" (and on stderr), a failed query's wall time
  * stays visible in "queries", it is EXCLUDED from "value" — and the entire
  * untruncated line is also written to BENCH_FULL.json in the working dir.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    require(iters >= 1, s"SPARK_GRAFT_BENCH_ITERS must be >= 1, got $iters")
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
    val lastError = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // min over SUCCESSFUL passes only — a failed pass's time-to-exception is
    // not a measurement and must never become the reported minimum
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failTime = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // EVERY pass's wall time (failed passes as negative), so min-vs-mean
    // divergence (contention, GC) is visible in the artifact itself, not
    // only on stderr
    val passes = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    for (pass <- 1 to iters; (name, fn) <- named) {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            lastError(name) = e.toString.take(300)
            System.err.println(s"[bench] FAILED $name (pass $pass): ${e.toString.take(500)}")
            false
        }
      val t = (System.nanoTime() - t0) / 1e9
      if (ok) best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
      else failTime(name) = t
      passes(name) = passes.getOrElse(name, Nil) :+ (if (ok) t else -t)
      System.err.println(f"[bench] pass $pass $name: $t%.2f s${if (ok) "" else " (failed)"}")
    }
    // a query is an ERROR only if NO pass succeeded (its JSON time is then
    // the last failure's wall time, visible but excluded from the total); a
    // transient single-pass failure keeps its successful min and is only
    // flagged on stderr
    val errors = named.collect {
      case (name, _) if !best.contains(name) => name -> lastError(name)
    }
    val errorNames = errors.map(_._1).toSet
    val qs = named.map { case (k, _) =>
      s"${jq(k)}:${best.getOrElse(k, failTime(k))}"
    }.mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
        .mkString(""","errors":{""", ",", "}")
    val passJson = named.map { case (k, _) =>
      s"${jq(k)}:${passes.getOrElse(k, Nil).mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val total = named.collect { case (k, _) if !errorNames.contains(k) => best(k) }.sum
    val errorNamesJson = errors.map(e => jq(e._1)).mkString("[", ",", "]")
    // HEADLINE the 5 slowest FIRST passes (cold cost): a min-of-iters
    // `queries` map hides a pathological cold run (r7's 97.7 s sink write
    // was invisible in the total), and the `passes` tail can be truncated
    // away — so the cold outliers go near the line head where any prefix
    // of the artifact still shows them
    val coldTop = named
      .flatMap { case (k, _) => passes.getOrElse(k, Nil).headOption.map(t => k -> t.abs) }
      .sortBy(-_._2).take(5)
      .map { case (k, t) => s"${jq(k)}:$t" }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","n_errors":${errors.size},""" +
        s""""max_iter1":$coldTop,""" +
        s""""queries":$qs$errJson,"passes":$passJson,"iters":$iters,""" +
        s""""order":"sorted","sf":${jq(sfDir)},"error_names":$errorNamesJson}"""
    println(line)
    // the full line survives any stdout truncation the harness applies
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_FULL.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"[bench] BENCH_FULL.json write failed: $e") }
    spark.stop()
  }
}
