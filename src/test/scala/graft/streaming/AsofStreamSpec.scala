package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming as-of join: single-batch drain must equal the batch
  * operator exactly; cross-batch behavior follows arrival order
  * (documented append-mode semantics); state is two longs per key. */
class AsofStreamSpec extends SparkSpecBase {

  private def tagFixture() = {
    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
    ev.select(col("user_id").as("key"), unix_micros(col("ts")).as("ts_us"),
      when(col("event_type") === "view", 0).otherwise(1).as("side"),
      col("event_id").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSeq
  }

  test("one-batch drain equals the batch asofJoin row-for-row") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Int, Long)]
    val stream = StreamingRefresh.asofStream(
      input.toDF().toDF("key", "ts_us", "side", "id"))
    val q = stream.writeStream
      .format("memory").queryName("asof_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("asof-ckpt").toString)
      .start()
    input.addData(tagFixture())
    q.processAllAvailable()

    val streamed = spark.sql("SELECT id, r_id FROM asof_stream")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val batch = graft.ops.AsofJoin.asofJoin(clicks, views, "user_id", "ts",
      Seq("event_id"), "event_id", "view_")
      .select(col("event_id"), col("view_event_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(streamed === batch)
    assert(batch.values.exists(_.isDefined))
    q.stop()
  }

  test("cross-batch: a later right row never retro-matches an emitted left") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Int, Long)]
    val stream = StreamingRefresh.asofStream(
      input.toDF().toDF("key", "ts_us", "side", "id"))
    val q = stream.writeStream
      .format("memory").queryName("asof_stream2").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("asof-ckpt2").toString)
      .start()
    // batch 1: click at t=20 with only a view at t=5 available
    input.addData(Seq((1L, 5L, 0, 100L), (1L, 20L, 1, 200L)))
    q.processAllAvailable()
    // batch 2: a LATE view at t=10 (event-time before the click) and a
    // new click at t=30 — the old click keeps view 100; the new click
    // sees the late view 101 (arrival-order semantics)
    input.addData(Seq((1L, 10L, 0, 101L), (1L, 30L, 1, 201L)))
    q.processAllAvailable()
    val out = spark.sql("SELECT id, r_id FROM asof_stream2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(200L -> 100L, 201L -> 101L))
    q.stop()
  }
}
