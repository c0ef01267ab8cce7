package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming perceptual admission: the drained band-hit stream, rolled
  * up per pair, must equal the batch pHashPairsAgainst over the same
  * corpus/incoming split — stateless, so micro-batch boundaries cannot
  * change the hits, only which batch emits them. */
class PHashStreamSpec extends SparkSpecBase {

  test("drained media hits roll up to the batch incremental pHash pairs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
    // corpus = the originals; incoming = their 4-byte re-encodes (the
    // planted near-dups) plus fresh unrelated payloads
    val corpus = docs
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
    val incomingDf = docs.select(
      (col("doc_id") + 1000000L).as("media_id"),
      encode(concat(col("text"), lit("!!!!")), "UTF-8").as("payload"))
    val corpusHashes = graft.ops.Multimodal.pHash(corpus)

    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingRefresh.mediaAdmissionStream(
        input.toDF().toDF("media_id", "payload")
          .select(col("media_id"), lit("image").as("kind"), col("payload"))
          .as[(Long, String, Array[Byte])],
        corpusHashes).writeStream
      .format("memory").queryName("phash_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("phash-ckpt").toString)
      .start()
    val rows = incomingDf.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()

    val streamed = spark.table("phash_stream")
      .select(col("incoming_id"), col("corpus_id"), col("hamming"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val incoming = incomingDf
      .select(col("media_id"), lit("image").as("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
    val batch = graft.ops.Multimodal.pHashPairsAgainst(
        corpusHashes, graft.ops.Multimodal.pHash(incoming))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(streamed === batch)
    // each re-encode should mostly admit against its own original
    val selfPairs = batch.count { case (i, c, _) => i == c + 1000000L }
    assert(selfPairs > (docs.count() * 8) / 10,
      s"only $selfPairs planted re-encodes admitted")
    q.stop()
  }
}
