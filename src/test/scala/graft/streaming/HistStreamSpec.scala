package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ≡ batch for the log-histogram bin counters: counts are a
  * commutative monoid, so micro-batch order cannot change the state —
  * and the state stays bounded at sources × 248 bins.
  */
class HistStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow bin counters equal the batch sketch bin-for-bin") {
    val docs = graft.Tables.documents(spark, sfDir)
    val staged = tmp("docs-hist")
    docs.repartition(5).write.mode("overwrite").parquet(staged)

    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.histStream(stream), "hist_stream",
      tmp("ckpt-hist"), outputMode = "complete")

    def toMap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("bin_key")) ->
        r.getAs[Long]("bin_count")).toMap

    val streamed = toMap(spark.sql("SELECT * FROM hist_stream").collect().toSeq)
    val batch = toMap(StreamingRefresh.histStream(docs).collect().toSeq)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // bounded state; every bin holds at least one doc; totals conserve
    val sources = streamed.keys.map(_._1).toSet
    assert(streamed.size <= sources.size * 4 * 62)
    assert(streamed.values.forall(_ >= 1L))
    assert(streamed.values.sum === docs.count())
  }
}
