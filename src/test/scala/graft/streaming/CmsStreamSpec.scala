package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ≡ batch for the count-min sketch: the counter matrix is a
  * commutative monoid (cells are sums), so micro-batch merge order
  * cannot change it — and the state stays bounded at depth·width rows.
  */
class CmsStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow CMS matrix equals the batch sketch cell-for-cell") {
    val docs = graft.Tables.documents(spark, sfDir)
    val staged = tmp("docs-cms")
    // several files -> several micro-batches of partial counter merges
    docs.repartition(5).write.mode("overwrite").parquet(staged)

    val (depth, width) = (4, 512)
    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.cmsStream(stream, depth, width), "cms_stream",
      tmp("ckpt-cms"), outputMode = "complete")

    def toMap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Int]("depth"), r.getAs[Long]("cell")) ->
        r.getAs[Long]("counter")).toMap

    val streamed = toMap(spark.sql("SELECT * FROM cms_stream").collect().toSeq)
    val batch = toMap(
      StreamingRefresh.cmsStream(docs, depth, width).collect().toSeq)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // bounded state: at most depth x width cells, indices in range
    assert(streamed.size <= depth * width)
    streamed.keys.foreach { case (d, c) =>
      assert(d >= 0 && d < depth && c >= 0 && c < width)
    }
    // conservation: every depth row sums to the total token count
    val total = docs
      .select(explode(split(col("text"), "\\s+")).as("w")).count()
    (0 until depth).foreach { d =>
      val rowSum = streamed.collect { case ((`d`, _), n) => n }.sum
      assert(rowSum === total, s"depth $d row sums to $rowSum, not $total")
    }
  }
}
