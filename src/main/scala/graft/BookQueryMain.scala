package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import graft.operators.BookQuery
import graft.sources.Tables

/** CLI parity with the reference driver (`hadoop jar BookQuery.jar BookQuery
  * <inputDir> <outputDir> <queryFile>`, BookQuery.java:171-258): score every
  * text file in a corpus directory against the query document and write the
  * reference-format `"<doc> - query\t<score>"` lines.
  *
  * Differences by design (SURVEY.md §0.1): the query doc is identified by
  * its basename ("query", the reference's `equals("query")` self-exclusion
  * test) — so like the reference, the query file lives IN the corpus dir; no
  * manifest file, no `_temp` materialization — one lazy DAG.
  *
  * Usage: runMain graft.BookQueryMain <corpusDir> <outputDir> [queryDocId]
  */
object BookQueryMain {

  def run(spark: SparkSession, corpusDir: String, outDir: String,
      queryDocId: String = "query"): Unit = {
    val docs = Tables.wholeTextDocuments(spark, corpusDir)
    val scored = BookQuery.referenceScoresFor(docs, lit(queryDocId))
    BookQuery.referenceOutputLines(scored).write.mode("overwrite").text(outDir)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BookQueryMain <corpusDir> <outputDir> [queryDocId=query]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-bookquery")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0), args(1), if (args.length > 2) args(2) else "query")
    spark.stop()
  }
}
