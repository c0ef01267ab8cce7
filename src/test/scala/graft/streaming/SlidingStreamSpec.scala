package graft.streaming

import java.nio.file.Files

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Sliding-window aggregation: drain ≡ batch through the SAME builder
  * (q_events_sliding calls slidingCounts directly), and the 1h/15m
  * geometry — every event lands in exactly 4 epoch-aligned windows. */
class SlidingStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow sliding counts equal the batch computation") {
    val events = graft.Tables.events(spark, sfDir)
    val staged = tmp("events-slide")
    events.write.mode("overwrite").parquet(staged)
    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.slidingCounts(stream), "slide_counts", tmp("ckpt-sl"),
      outputMode = "complete")
    val streamed = spark.sql("SELECT * FROM slide_counts")
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    val batch = StreamingRefresh.slidingCounts(events)
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("every event lands in exactly 4 windows, epoch-aligned") {
    import spark.implicits._
    // one event at an odd offset inside a quarter hour
    val base = 1700000000000000L // µs; NOT on a 15-min boundary by chance?
    val alignedQ = base / 900000000L * 900000000L
    val ev = Seq((1L, alignedQ + 123456789L, "click", 2.5, "{}"))
      .toDF("event_id", "ts_us", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        lit(7L).as("user_id"), col("event_type"), col("value"), col("props"))
    val out = StreamingRefresh.slidingCounts(ev)
      .orderBy(col("window_start")).collect()
    assert(out.length === 4)
    // starts are the 4 quarter-hour marks at and before the event
    val startsUs = out.map(r =>
      java.time.LocalDateTime.parse(r.getString(0).replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L)
    assert(startsUs.toSeq ===
      (3 to 0 by -1).map(j => alignedQ - j * 900000000L))
    assert(out.forall(_.getLong(3) === 1L)) // n_events
  }
}
