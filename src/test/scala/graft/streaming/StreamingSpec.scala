package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ≡ batch: the same windowed aggregation computed incrementally
  * (AvailableNow + watermark) must equal the batch result, and the
  * foreachBatch upsert must apply increments to the parquet master. */
class StreamingSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow windowed counts equal the batch computation") {
    val events = graft.Tables.events(spark, sfDir)
    // stage to µs-timestamp parquet: the streaming reader needs a plain
    // schema (no legacy ns rebasing in the file-source path)
    val staged = tmp("events-staged")
    events.write.mode("overwrite").parquet(staged)

    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    // complete mode: append would hold back windows above the final
    // watermark; complete emits the full aggregation state at drain
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.windowedCounts(stream), "win_counts", tmp("ckpt"),
      outputMode = "complete")

    val streamed = spark.sql("SELECT * FROM win_counts")
      .orderBy(col("hour_start"), col("event_type")).collect().toSeq
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("AvailableNow sessionization equals the batch gap rule") {
    import org.apache.spark.sql.expressions.Window
    val events = graft.Tables.events(spark, sfDir)
    val staged = tmp("events-sess")
    events.write.mode("overwrite").parquet(staged)

    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.sessionized(stream), "sessions", tmp("ckpt-sess"),
      outputMode = "complete")
    val streamed = spark.sql("SELECT user_id, session_start, n_events FROM sessions")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // batch formulation of the same half-open gap rule: a gap of exactly
    // the window closes the session (session_window extends only while
    // ts < last_ts + gap)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("brk", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") >= 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("sn", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sn"))
      .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch, "streaming session_window != batch gap rule")
  }

  test("upsert propagates a corrupt master instead of replacing it") {
    import spark.implicits._
    // an existing-but-unreadable master must FAIL the batch — the old
    // behavior silently substituted an empty frame and overwrote the
    // master with just the batch's rows
    val masterPath = tmp("master-corrupt") + "/m"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(masterPath))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(masterPath, "part-00000.parquet"),
      "not a parquet file".getBytes)
    val updatesDir = tmp("updates-corrupt")
    Seq((1L, "new")).toDF("id", "payload")
      .write.mode("overwrite").parquet(updatesDir)
    val stream = StreamingRefresh.parquetStream(spark, updatesDir,
      spark.read.parquet(updatesDir).schema)
    intercept[Exception] {
      StreamingRefresh.upsertStream(stream, "id", masterPath, tmp("ckpt3"))
    }
    // the corrupt master is untouched — no silent replacement
    val left = new java.io.File(masterPath).listFiles().map(_.getName).toSet
    assert(left.contains("part-00000.parquet"))
  }

  test("foreachBatch upsert replaces master rows by key") {
    import spark.implicits._
    val masterPath = tmp("master") + "/m"
    Seq((1L, "old-1"), (2L, "old-2"), (3L, "old-3")).toDF("id", "payload")
      .write.parquet(masterPath)

    val updatesDir = tmp("updates")
    Seq((2L, "new-2"), (4L, "new-4")).toDF("id", "payload")
      .write.mode("overwrite").parquet(updatesDir)

    val stream = StreamingRefresh.parquetStream(spark, updatesDir,
      spark.read.parquet(updatesDir).schema)
    StreamingRefresh.upsertStream(stream, "id", masterPath, tmp("ckpt2"))

    val after = spark.read.parquet(masterPath)
      .as[(Long, String)].collect().toMap
    assert(after == Map(1L -> "old-1", 2L -> "new-2", 3L -> "old-3", 4L -> "new-4"))
  }
}
