package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming incremental admission: the drained band-hit stream, rolled
  * up per (incoming, corpus) pair, must equal the batch
  * lshPairsAgainst over the same split; being stateless, a collision
  * lands in the micro-batch its doc arrives in regardless of how the
  * batch boundary cuts the feed. */
class AdmissionStreamSpec extends SparkSpecBase {

  test("drained hit stream rolls up to the batch incremental pairs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("text"))
    val incoming = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("text"))
    val corpusSig = graft.ops.Dedup
      .minhashSignature(corpus, "doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val q = StreamingRefresh.admissionStream(
        input.toDF().toDF("doc_id", "text"), corpusSig).writeStream
      .format("memory").queryName("admission_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("admission-ckpt").toString)
      .start()
    val rows = incoming.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()

    val streamed = spark.table("admission_stream")
      .groupBy(col("incoming_id"), col("corpus_id"))
      .agg(count(lit(1)).as("n_bands"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val batch = graft.ops.Dedup.lshPairsAgainst(corpusSig,
        graft.ops.Dedup.minhashSignature(incoming, "doc_id", "text"),
        "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    assert(streamed === batch)
    // the fixture corpus plants near-dups: collisions must exist
    assert(batch.nonEmpty)
    q.stop()
  }
}
