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
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1).startsWith("explain:")) {
      val name = args(1).stripPrefix("explain:")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
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
