package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming anomaly scoring: drained flags under broadcast stats must
  * equal the batch q_events_anomaly scan row-for-row, and an unknown
  * event type must flag NULL, never false. */
class AnomalyStreamSpec extends SparkSpecBase {

  test("drained flags == batch anomaly scan under the same stats") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = graft.Tables.events(spark, sfDir)
    val stats = StreamingRefresh.anomalyStats(events)

    val input = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = StreamingRefresh.anomalyStream(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type",
          "value", "props"),
        stats).writeStream
      .format("memory").queryName("anomaly_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("anomaly-ckpt").toString)
      .start()
    val rows = events.collect().map(r => (
      r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
      r.getDouble(4), r.getString(5))).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()

    val streamed = spark.table("anomaly_stream")
      .select("event_id", "cents", "is_anomaly")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val batch = graft.queries.EventsQueries.anomalies(spark, sfDir)
      .select("event_id", "cents", "is_anomaly")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(batch.exists(_._3), "fixture produced no anomalies")
    q.stop()
  }

  test("an event type absent from the stats flags NULL, not false") {
    import spark.implicits._
    val feed = Seq((1L, "mystery_type", 12.34)).toDF(
      "event_id", "event_type", "value")
    val out = StreamingRefresh.anomalyStream(feed,
      Map("click" -> ((10L, 100L, 2000L))))
      .select("is_anomaly").collect()
    assert(out.length == 1 && out.head.isNullAt(0))
  }
}
