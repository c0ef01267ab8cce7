package graft.streaming

import java.sql.Timestamp
import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpecBase

/** Stateful streaming CDC (flatMapGroupsWithState): per-file minute-floor
  * change detection across micro-batches must reproduce the batch rule —
  * unseen → new, minute-floor advanced → updated, sub-minute touch →
  * nothing — with state carried between batches. */
class CdcStreamSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("classifications across micro-batches match the minute-floor rule") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val listings = input.toDF()
      .toDF("file_name", "file_path", "date_last_modified")

    val q = StreamingRefresh.cdcStream(listings).writeStream
      .format("memory").queryName("cdc_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("cdc-ckpt").toString)
      .start()

    def drainTo(n: Int): Seq[(String, String)] = {
      q.processAllAvailable()
      spark.sql("SELECT file_name, reason FROM cdc_stream")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    }

    // batch 1: two unseen files
    input.addData(
      ("a.pdf", "/x/a.pdf", ts("2024-01-01 10:00:10")),
      ("b.pdf", "/x/b.pdf", ts("2024-01-01 10:00:20")))
    assert(drainTo(2).sorted ==
      Seq(("a.pdf", "new"), ("b.pdf", "new")))

    // batch 2: a +90min (updated), b +30s within the same minute
    // (nothing — the reference's filesystem-precision guard), c unseen
    input.addData(
      ("a.pdf", "/x/a.pdf", ts("2024-01-01 11:30:10")),
      ("b.pdf", "/x/b.pdf", ts("2024-01-01 10:00:40")),
      ("c.pdf", "/x/c.pdf", ts("2024-01-01 12:00:00")))
    assert(drainTo(4).sorted == Seq(
      ("a.pdf", "new"), ("a.pdf", "updated"),
      ("b.pdf", "new"), ("c.pdf", "new")))

    // batch 3: a touched at the SAME minute (nothing), b advanced a
    // minute (updated) — state survived two batches
    input.addData(
      ("a.pdf", "/x/a.pdf", ts("2024-01-01 11:30:55")),
      ("b.pdf", "/x/b.pdf", ts("2024-01-01 10:01:05")))
    assert(drainTo(5).sorted == Seq(
      ("a.pdf", "new"), ("a.pdf", "updated"),
      ("b.pdf", "new"), ("b.pdf", "updated"), ("c.pdf", "new")))

    q.stop()
  }

  test("streaming dedup keeps one arrival per key within the watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val events = input.toDF().toDF("event_id", "payload", "ts")
    val q = StreamingRefresh.dedupStream(events, Seq("event_id")).writeStream
      .format("memory").queryName("dedup_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("dedup-ckpt").toString)
      .start()

    input.addData(
      (1L, "first", ts("2024-01-01 10:00:00")),
      (1L, "dup-same-batch", ts("2024-01-01 10:05:00")),
      (2L, "only", ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    input.addData((1L, "dup-next-batch", ts("2024-01-01 10:20:00")))
    q.processAllAvailable()

    val out = spark.sql("SELECT event_id, payload FROM dedup_stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(out == Seq((1L, "first"), (2L, "only")))
    q.stop()
  }

  test("an in-batch burst folds in mtime order: one new, then updates") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp)]
    val listings = input.toDF()
      .toDF("file_name", "file_path", "date_last_modified")
    val q = StreamingRefresh.cdcStream(listings).writeStream
      .format("memory").queryName("cdc_burst").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("cdc-ckpt2").toString)
      .start()

    input.addData(
      ("d.pdf", "/x/d.pdf", ts("2024-01-01 09:20:00")), // minute 3: updated
      ("d.pdf", "/x/d.pdf", ts("2024-01-01 09:00:00")), // earliest: new
      ("d.pdf", "/x/d.pdf", ts("2024-01-01 09:00:30")), // same minute: no
      ("d.pdf", "/x/d.pdf", ts("2024-01-01 09:10:00"))) // minute 2: updated
    q.processAllAvailable()
    val out = spark.sql("SELECT minute_us, reason FROM cdc_burst")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(out.map(_._2) == Seq("new", "updated", "updated"))
    q.stop()
  }

  test("a vanished file emits a delete row agreeing with batch Cdc") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the stream saw a and b; by refresh time b has vanished from the NAS
    val input = MemoryStream[(String, String, Timestamp)]
    val listings = input.toDF()
      .toDF("file_name", "file_path", "date_last_modified")
    val q = StreamingRefresh.cdcStream(listings).writeStream
      .format("memory").queryName("cdc_del").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("cdc-ckpt3").toString)
      .start()
    input.addData(
      ("a.pdf", "/x/a.pdf", ts("2024-01-01 10:00:00")),
      ("b.pdf", "/x/b.pdf", ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    q.stop()

    val catalog = Seq(
      (1L, "a.pdf", "/x/a.pdf", "nas", "pdf", "doc a", ts("2024-01-01 10:00:00")),
      (2L, "b.pdf", "/x/b.pdf", "nas", "pdf", "doc b", ts("2024-01-01 10:00:00")))
      .toDF("id", "file_name", "file_path", "document_source",
        "document_type", "document_name", "date_last_modified")
    val snapshot = Seq( // current listing: b is gone
      ("a.pdf", "/x/a.pdf", 10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")))
      .toDF("file_name", "file_path", "file_size", "date_created",
        "date_last_modified")

    val streamed = StreamingRefresh.detectDeletes(catalog, snapshot)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(6))).toSeq
    assert(streamed == Seq((2L, "b.pdf", "deleted")))

    // agreement with the batch classifier on the same snapshot
    val batch = graft.ops.Cdc.toDelete(graft.ops.Cdc.classify(snapshot, catalog))
      .filter($"reason" === "deleted")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(6))).toSeq
    assert(batch == streamed)
  }
}
