package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.ops.Dedup

/** Streaming MinHash-LSH near-dup candidates (flatMapGroupsWithState):
  * cross-micro-batch pair detection must agree with the batch operator,
  * and per-bucket state must stay bounded on hostile hot buckets. */
class StreamingDedupSpec extends SparkSpecBase {

  test("multi-batch drain finds exactly the batch operator's pairs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val input = MemoryStream[(Long, String)]
    val stream = StreamingRefresh.nearDupStream(
      input.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream
      .format("memory").queryName("near_dup_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("neardup-ckpt").toString)
      .start()

    // split the corpus in three micro-batches: planted duplicate clusters
    // span the split, so cross-batch state is what finds most pairs
    val (b1, rest) = docs.splitAt(docs.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 3)
    Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }

    val streamed = spark.sql("SELECT id_a, id_b FROM near_dup_stream")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.lshPairs(
      Dedup.minhashSignature(
        graft.Tables.documents(spark, sfDir), "doc_id", "text"), "doc_id")
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"stream found ${streamed.size} pairs, batch ${batch.size}; " +
        s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    assert(batch.nonEmpty)
    q.stop()
  }

  test("hot bucket: state stays bounded, overflow docs still pair backward") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // identical texts -> identical signatures -> one bucket per band
    val input = MemoryStream[(Long, String)]
    val stream = StreamingRefresh.nearDupStream(
      input.toDF().toDF("doc_id", "text"), maxBucket = 3)
    val q = stream.writeStream
      .format("memory").queryName("hot_bucket_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("hotbucket-ckpt").toString)
      .start()
    input.addData((0L until 6L).map(i => (i, "same text every time")))
    q.processAllAvailable()
    val pairs = spark.sql("SELECT id_a, id_b FROM hot_bucket_stream")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // retained state = {0,1,2}; docs 3..5 each pair against the retained
    // three but not against each other (the documented bounded-state trade)
    val expected = (0L until 6L).flatMap(b =>
      (0L until math.min(b, 3L)).map(a => (a, b))).toSet
    assert(pairs == expected, s"got $pairs")
    // a later batch doc still pairs against the bounded state only
    input.addData((100L, "same text every time"))
    q.processAllAvailable()
    val pairs2 = spark.sql("SELECT id_a, id_b FROM hot_bucket_stream")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs2 == expected ++ Set((0L, 100L), (1L, 100L), (2L, 100L)))
    q.stop()
  }
}
