package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming decontamination: the drained hit stream, rolled up per
  * doc, must flag exactly the docs (with exactly the hit counts) the
  * batch operator flags over the same corpus and probe set; being
  * stateless, hits land in the arrival micro-batch. */
class DecontaminateStreamSpec extends SparkSpecBase {

  private val n = 3

  private def probes() =
    graft.Tables.documents(spark, sfDir).limit(5).select(col("text"))

  test("drained hit stream rolls up to the batch decontaminate report") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val input = MemoryStream[(Long, String)]
    val q = StreamingRefresh.decontaminateStream(
        input.toDF().toDF("doc_id", "text"), probes(), n = n).writeStream
      .format("memory").queryName("decon_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("decon-ckpt").toString)
      .start()
    // two batches: stateless flagging must not care how the corpus is
    // split across arrivals
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()

    val streamed = spark.table("decon_stream")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batch = graft.ops.CorpusFilters
      .decontaminate(docs, probes(), "doc_id", "text", n)
      .select(col("doc_id"), col("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(streamed === batch)
    // the probe set comes from the corpus itself: contamination exists
    assert(batch.nonEmpty)
    q.stop()
  }
}
