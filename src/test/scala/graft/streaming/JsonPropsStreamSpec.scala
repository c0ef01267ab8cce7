package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ≡ batch for the schema-on-read props report: every
  * aggregate column is additive or monotone, so micro-batch order
  * cannot change the state (bounded at one row per event type), and
  * the drained report must reproduce the registered batch query after
  * the same avg decode.
  */
class JsonPropsStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow drain equals the registered batch report") {
    val events = graft.Tables.events(spark, sfDir)
    val staged = tmp("events-json")
    events.repartition(5).write.mode("overwrite").parquet(staged)

    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.jsonPropsStream(stream), "json_props_stream",
      tmp("ckpt-json"), outputMode = "complete")

    val drained = spark.sql("SELECT * FROM json_props_stream")
      .withColumn("avg_k",
        round(col("sum_k").cast("double") / col("n_parsed"), 6))
      .orderBy(col("event_type"))
      .collect().toSeq
    val batch = graft.queries.EventsQueries.jsonProps(spark, sfDir)
      .collect().toSeq
    assert(drained.nonEmpty)
    assert(drained.map(_.toSeq) === batch.map(_.toSeq))
  }
}
