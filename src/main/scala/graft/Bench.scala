package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at the SF dir in
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  * A failed query is LOUD: its name lands in an "errors" object on the same
  * line (and on stderr), its wall time stays visible in "queries", and it is
  * EXCLUDED from "value" — a broken query can't contribute a plausible
  * total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          errors(name) = e.toString.take(300)
          System.err.println(s"[bench] FAILED $name: ${e.toString.take(500)}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
        .mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (k, v) if !errors.contains(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":${jq(sfDir)}}""")
    spark.stop()
  }
}
