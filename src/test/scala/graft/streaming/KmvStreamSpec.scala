package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ≡ batch for the KMV cardinality sketch: partials merged
  * across micro-batches must produce the exact same bounded state as
  * the one-shot batch aggregation — the sketch is a set function, so
  * incremental processing cannot change it.
  */
class KmvStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow KMV sketch state equals the batch sketch exactly") {
    val events = graft.Tables.events(spark, sfDir)
    val staged = tmp("events-kmv")
    // several small files -> several micro-batch merges of partial sketches
    events.repartition(5).write.mode("overwrite").parquet(staged)

    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.kmvDistinctStream(stream, k = 64), "kmv_stream",
      tmp("ckpt-kmv"), outputMode = "complete")

    def toMap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[String]("event_type") ->
        r.getAs[scala.collection.Seq[Long]]("sketch").toList).toMap

    val streamed = toMap(spark.sql("SELECT * FROM kmv_stream").collect().toSeq)
    val batch = toMap(
      StreamingRefresh.kmvDistinctStream(events, k = 64).collect().toSeq)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // the state really is bounded and sorted
    streamed.values.foreach { s =>
      assert(s.size <= 64 && s === s.sorted && s.distinct.size === s.size)
    }
  }
}
