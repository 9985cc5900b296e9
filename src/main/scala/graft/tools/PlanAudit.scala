package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan inventory over EVERY SparkEntry query: exchange, scan, and
  * codegen counts per query, written as a markdown table (PLANS.md). The
  * point is longitudinal: the table is committed, so any plan regression —
  * a new shuffle, a lost broadcast, a cartesian sneaking into a pair
  * emitter, a codegen fence splitting a hot stage — shows up as a git diff
  * long before it shows up as a bench number. Cartesian/BNLJ cells name the
  * join so the (legitimate) broadcast-1-row cross joins are reviewable at a
  * glance rather than blanket-allowed.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [outFile]
  * (defaults: /root/testdata/sf0.001, PLANS.md). AQE is disabled so the
  * table shows the static plans the cost model commits to; at runtime AQE
  * can only improve on them.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        def count(p: SparkPlan => Boolean): Int = plan.collect { case x if p(x) => x }.size
        val nlJoins = plan.collect {
          case c: CartesianProductExec => c.nodeName
          case b: BroadcastNestedLoopJoinExec => b.nodeName
        }
        Seq(name,
          count(_.isInstanceOf[ShuffleExchangeExec]).toString,
          count(_.isInstanceOf[BroadcastExchangeExec]).toString,
          count(_.isInstanceOf[FileSourceScanExec]).toString,
          count(_.isInstanceOf[WholeStageCodegenExec]).toString,
          if (nlJoins.isEmpty) "—" else nlJoins.distinct.mkString(", "))
      } catch {
        case e: Throwable => Seq(name, "ERR", "ERR", "ERR", "ERR", e.toString.take(60))
      }
    }
    val header = Seq(
      "| query | shuffles | broadcasts | file scans | codegen spans | cartesian/BNLJ |",
      "|---|---|---|---|---|---|")
    val body = rows.map(r => r.mkString("| ", " | ", " |"))
    val doc =
      ("# PLANS — static physical-plan inventory (AQE off, sf0.001)\n\n" +
        "Regenerate: `sbt \"runMain graft.tools.PlanAudit\"`. Committed so plan\n" +
        "regressions (new shuffle, lost broadcast, cartesian in a pair emitter,\n" +
        "split codegen span) surface as git diffs. BNLJ entries are the\n" +
        "REVIEWED broadcast-small-side cross joins (1-row query/centroid/eval\n" +
        "sets); anything new appearing there needs a justification.\n" +
        "Recursive-CTE queries (UnionLoop) keep their loop body as a nested\n" +
        "logical plan the counters can't traverse — their scan/exchange cells\n" +
        "undercount; review those plans via explain (the spread operator's\n" +
        "loop body is one join against an eagerly-checkpointed edge list).\n" +
        "EAGER-trainer entries (text_quality_classifier: cache-once GD runs\n" +
        "during plan construction, kmeans-discipline; text_bpe_merges: the\n" +
        "8 cache-once argmax rounds) return a literal frame — their row\n" +
        "legitimately shows a trivial plan; the per-round plans are the\n" +
        "cached-scan aggregations SCALING.md documents. embed_mmr_rerank\n" +
        "likewise ends on a per-round localCheckpoint (plan growth would be\n" +
        "3^k without it), so its row shows the checkpoint-backed frame, not\n" +
        "the k unrolled greedy-round joins that ran to produce it.\n" +
        "embed_knn_join_tiled materializes its signature pass as a\n" +
        "localCheckpoint (the tiled escape's 1×-vs-3× scan trade), so its\n" +
        "file-scan cell reads 0 — the scan ran eagerly at plan construction.\n" +
        "Standing-index serve entries (embed_range_extend_serve) undercount\n" +
        "too: dynamic partition pruning rewrites their probe subtree into a\n" +
        "SubqueryBroadcast + ReusedExchange the child-walker doesn't enter,\n" +
        "so the row shows only the final pruned cell-file join (1 scan, the\n" +
        "INSET-filtered ivf read); the probe side (queries × k-row\n" +
        "cent⋈radii broadcast) is reviewable via explain.\n\n" +
        header.mkString("\n") + "\n" + body.mkString("\n") + "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), doc)
    println(s"[plan-audit] wrote ${rows.size} rows to $outFile")
    spark.stop()
  }
}
