package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming funnel: a single-batch drain must reproduce the batch
  * funnel's per-stage anchors and counts exactly (inclusive ≥
  * boundaries, equal-ts view-before-click ordering); across batches
  * the anchors follow arrival order (documented append-mode
  * semantics); state is three longs per user. */
class FunnelStreamSpec extends SparkSpecBase {

  private def fixtureRows() =
    graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  private def startStream(name: String, input: MemoryStream[(Long, String, Long)]) = {
    val df = input.toDF().toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    StreamingRefresh.funnelStream(df).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"$name-ckpt").toString)
      .start()
  }

  test("one-batch drain equals the batch funnel's anchors and counts") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = startStream("funnel_stream", input)
    input.addData(fixtureRows())
    q.processAllAvailable()

    val streamed = spark.sql("SELECT user_id, stage, ts_us FROM funnel_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    // batch anchors, computed the same way EventsQueries.funnel builds its
    // v/c/p frames (which q_events_funnel oracle-checks against DuckDB)
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") >= col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    def toMap(df: org.apache.spark.sql.DataFrame, stage: Int) =
      df.collect().map(r => (r.getLong(0), stage) -> r.getLong(1)).toMap
    val batch = toMap(v, 1) ++ toMap(c, 2) ++ toMap(p, 3)

    assert(streamed === batch)
    // all three stages are populated on the fixture
    assert((1 to 3).forall(s => batch.keys.exists(_._2 == s)))
    q.stop()
  }

  test("cross-batch: anchors follow arrival order, stages never rewrite") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = startStream("funnel_stream2", input)
    // batch 1: view at t=10, click at t=20 -> stages 1 and 2
    input.addData(Seq((1L, "view", 10L), (1L, "click", 20L)))
    q.processAllAvailable()
    // batch 2: a LATE click at t=12 (event-time earlier than the anchored
    // click) must NOT rewrite stage 2; a purchase at t=15 is before the
    // anchored click t2=20 so it does NOT qualify; one at t=25 does
    input.addData(Seq((1L, "click", 12L), (1L, "purchase", 15L),
      (1L, "purchase", 25L)))
    q.processAllAvailable()
    val out = spark.sql("SELECT stage, ts_us FROM funnel_stream2 WHERE user_id = 1")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(1 -> 10L, 2 -> 20L, 3 -> 25L))
    q.stop()
  }
}
