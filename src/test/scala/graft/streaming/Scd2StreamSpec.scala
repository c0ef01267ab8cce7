package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming SCD2: the drained CLOSED intervals must equal the batch
  * history's non-current rows exactly — across micro-batch boundaries,
  * including a run that spans batches (no spurious close) and a change
  * that lands in a later batch than its predecessor (close uses state).
  */
class Scd2StreamSpec extends SparkSpecBase {

  private def startStream(name: String,
      input: MemoryStream[(Long, String, Long, Long)]) = {
    val df = input.toDF()
      .toDF("user_id", "event_type", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us")))
    StreamingRefresh.scd2Stream(df).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"$name-ckpt").toString)
      .start()
  }

  private def drained(name: String): Set[(Long, String, Long, Long)] =
    spark.table(name)
      .select("user_id", "event_type", "valid_from_us", "valid_to_us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("3-batch drain emits exactly the batch history's closed rows") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val log = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._3, r._4)) // global time order -> in-order per key
    val batches = log.grouped(math.max(1, log.length / 3 + 1)).toSeq

    val input = MemoryStream[(Long, String, Long, Long)]
    val q = startStream("scd2_stream", input)
    batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }

    val expected = graft.ops.Scd2.history(
      graft.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id")),
      "user_id", "event_type", "us", "event_id")
      .filter(col("is_current") === 0)
      .select("user_id", "event_type", "valid_from_us", "valid_to_us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(expected.nonEmpty)
    assert(drained("scd2_stream") === expected)
    q.stop()
  }

  test("cross-batch: runs span batches silently, changes close from state") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val q = startStream("scd2_stream2", input)
    // batch 1: open bronze
    input.addData(Seq((1L, "bronze", 100L, 1L)))
    q.processAllAvailable()
    assert(drained("scd2_stream2") === Set.empty)
    // batch 2: same attr again — still one open run, nothing closes
    input.addData(Seq((1L, "bronze", 200L, 2L)))
    q.processAllAvailable()
    assert(drained("scd2_stream2") === Set.empty)
    // batch 3: the change closes [100, 300) using state from batch 1
    input.addData(Seq((1L, "silver", 300L, 3L)))
    q.processAllAvailable()
    assert(drained("scd2_stream2") === Set((1L, "bronze", 100L, 300L)))
    q.stop()
  }

  test("late-retroactive boundary: stream drops, batch merge repairs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val q = startStream("scd2_stream3", input)
    // in-order flow opens gold at 500
    input.addData(Seq((1L, "bronze", 100L, 1L), (1L, "gold", 500L, 2L)))
    q.processAllAvailable()
    assert(drained("scd2_stream3") === Set((1L, "bronze", 100L, 500L)))
    // a RETROACTIVE differing event at 300 (< open interval's 500)
    // arrives in a later batch: the forward-only stream DROPS it —
    // without the guard it would append the inverted row
    // (gold, 500, 300); with it, nothing is emitted and the open
    // interval is untouched
    input.addData(Seq((1L, "silver", 300L, 3L)))
    q.processAllAvailable()
    assert(drained("scd2_stream3") === Set((1L, "bronze", 100L, 500L)))
    // ...and a subsequent in-order change still closes cleanly from
    // the (unclobbered) state
    input.addData(Seq((1L, "plat", 900L, 4L)))
    q.processAllAvailable()
    assert(drained("scd2_stream3") ===
      Set((1L, "bronze", 100L, 500L), (1L, "gold", 500L, 900L)))
    q.stop()

    // the documented repair path: batch Scd2.merge reconstruction over
    // dimension ∪ the late event SPLITS the interval the event lands in
    val dim = graft.ops.Scd2.history(
      Seq((1L, "bronze", 100L, 1L), (1L, "gold", 500L, 2L),
        (1L, "plat", 900L, 4L))
        .toDF("user_id", "event_type", "us", "event_id"),
      "user_id", "event_type", "us", "event_id")
    val repaired = graft.ops.Scd2.merge(dim,
      Seq((1L, "silver", 300L, 3L))
        .toDF("user_id", "event_type", "us", "event_id"),
      "user_id", "event_type", "us", "event_id")
      .orderBy("version")
      .select("event_type", "valid_from_us", "valid_to_us", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getInt(3)))
      .toSeq
    assert(repaired === Seq(
      ("bronze", 100L, 300L, 0), ("silver", 300L, 500L, 0),
      ("gold", 500L, 900L, 0), ("plat", 900L, -1L, 1)))
  }
}
