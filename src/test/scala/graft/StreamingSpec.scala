package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

/** Structured Streaming specs over MemoryStream — windowed counts across an
  * hour boundary and stateful sessionization across a gap (FIXTURES.md §B.7).
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming hourly window counts match hand-placed events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    input.addData(
      (ts("2024-01-01 00:10:00"), "click"),
      (ts("2024-01-01 00:55:00"), "click"),
      (ts("2024-01-01 01:05:00"), "click"), // crosses the hour boundary
      (ts("2024-01-01 00:20:00"), "view"))
    val counts = StreamingOps.hourlyCounts(
      input.toDF().toDF("ts", "event_type"))
    val q = counts.writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select(date_format($"window_start", "HH").as("h"), $"event_type", $"n_events")
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(("00", "click", 2L), ("01", "click", 1L), ("00", "view", 1L)))
    } finally q.stop()
  }

  test("streaming exact dedup keeps first doc per content hash across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = StreamingOps.dedupExact(input.toDF().toDF("doc_id", "text"))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // dups arrive only in LATER batches: which row a within-batch dedup
      // keeps is partition-order-dependent, across batches it's the state
      input.addData((0L, "a b c"), (2L, "x y z"))
      q.processAllAvailable()
      input.addData((3L, "a b c"), (4L, "new doc"))
      q.processAllAvailable()
      val kept = spark.table("sdedup").select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(0L, 2L, 4L), s"got $kept")
    } finally q.stop()
  }

  test("file-source streaming: parquet directory -> windowed counts == batch") {
    // Real readStream over a parquet dir (the deploy shape), checked against
    // the batch aggregation of the same files.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val batch = Seq(
      (ts("2024-01-01 00:10:00"), "click"),
      (ts("2024-01-01 00:55:00"), "click"),
      (ts("2024-01-01 01:05:00"), "view"))
      .toDF("ts", "event_type")
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = StreamingOps.hourlyCounts(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_hourly")
        .select(date_format($"window_start", "HH"), $"event_type", $"n_events")
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(("00", "click", 2L), ("01", "view", 1L)))
    } finally q.stop()
  }

  test("stateful sessionization closes a session across a >30min gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(7L, ts("2024-01-01 00:00:00"), 1L),
      Event(7L, ts("2024-01-01 00:10:00"), 2L),
      Event(7L, ts("2024-01-01 01:00:00"), 3L), // 50-min gap -> new session
      Event(8L, ts("2024-01-01 00:00:00"), 4L))
    val sessions = StreamingOps.sessionize(input.toDS(), idleTimeout = false)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // Only sessions CLOSED by a later event are emitted in append mode;
      // user 7's first session (2 events, 10 min) is the one closed so far.
      val got = spark.table("sessions")
        .select($"user_id", $"n_events").as[(Long, Long)].collect().toSet
      assert(got == Set((7L, 2L)))
    } finally q.stop()
  }
}
