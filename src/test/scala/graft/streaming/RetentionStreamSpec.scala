package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming cohort retention: a single-batch drain must aggregate to
  * exactly the batch retention matrix (cohort = min week, first activity
  * per (user, week) credited once); across batches the cohort follows
  * arrival order and a late earlier week never re-anchors it. */
class RetentionStreamSpec extends SparkSpecBase {

  private def fixtureRows() =
    graft.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def startStream(name: String, input: MemoryStream[(Long, Long)]) = {
    val df = input.toDF().toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    StreamingRefresh.retentionStream(df).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"$name-ckpt").toString)
      .start()
  }

  test("one-batch drain aggregates to the batch retention matrix") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = startStream("retention_stream", input)
    input.addData(fixtureRows())
    q.processAllAvailable()

    val streamed = spark.sql(
      """SELECT cohort_wk_us, week_offset, COUNT(*) AS n_active
        |FROM retention_stream GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // batch matrix, built the same way EventsQueries.retention builds its
    // act frame (which q_events_retention oracle-checks against DuckDB)
    val uw = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val batch = uw.join(first, "user_id")
      .groupBy(unix_micros(col("cohort_wk")).as("c_us"),
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("off"))
      .agg(count(lit(1)).as("n_active"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    assert(streamed === batch)
    // the fixture spans several weeks: the matrix has depth, not just w0
    assert(batch.keys.exists(_._2 > 0))
    q.stop()
  }

  test("cross-batch: cohort follows arrival order, late weeks never re-anchor") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val weekUs = 7L * 24 * 3600 * 1000000L
    // anchor in the middle of a UTC week-truncation week (Monday-based):
    // 2024-01-08T00:00:00Z is a Monday
    val w0 = 1704672000000000L
    val input = MemoryStream[(Long, Long)]
    val q = startStream("retention_stream2", input)
    // batch 1: activity in week w0 -> cohort anchors there, offset 0
    input.addData(Seq((7L, w0 + 3600L * 1000000)))
    q.processAllAvailable()
    // batch 2: a LATE event from the PREVIOUS week (ignored — cannot
    // re-anchor), a duplicate w0 event (already credited), and week w0+2
    input.addData(Seq((7L, w0 - weekUs + 1000L), (7L, w0 + 7200L * 1000000),
      (7L, w0 + 2 * weekUs + 1000L)))
    q.processAllAvailable()
    val out = spark.sql(
      "SELECT cohort_wk_us, week_offset FROM retention_stream2 WHERE user_id = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((w0, 0L), (w0, 2L)))
    q.stop()
  }
}
