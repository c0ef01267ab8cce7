package graft.streaming

import graft.SparkSpecBase
import java.nio.file.Files

/** Streaming ≡ batch for per-group top-k: the merge-truncation law
  * makes the bounded aggregator micro-batch-order-insensitive, so the
  * drained ranking equals the batch one row-for-row — with ≤ k pairs
  * of state per source.
  */
class TopKStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow top-k equals batch row-for-row") {
    val k = 3
    val docs = graft.Tables.documents(spark, sfDir)
    val staged = tmp("docs-topk")
    docs.repartition(5).write.mode("overwrite").parquet(staged)

    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.topkStream(stream, k), "topk_stream",
      tmp("ckpt-topk"), outputMode = "complete")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq

    val streamed = rows(spark.sql("SELECT * FROM topk_stream"))
    val batch = rows(StreamingRefresh.topkStream(docs, k))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // bounded output: <= k rows per source, ranks 1..k
    streamed.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.size <= k, src)
      assert(rs.map(_._2) === (1 to rs.size), src)
    }
  }
}
