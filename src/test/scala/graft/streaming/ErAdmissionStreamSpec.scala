package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming ER admission: the drained per-signature hit stream,
  * rolled up to distinct (incoming, corpus) pairs, must equal the batch
  * edOnePairsAgainst over the same split; the join is stateless, so a
  * match lands in the micro-batch its mention arrives in regardless of
  * where the batch boundary cuts the feed. */
class ErAdmissionStreamSpec extends SparkSpecBase {

  test("drained hit stream rolls up to the batch against-pairs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // dictionary: distinctive names; arrivals: one-edit variants of a
    // subset plus novel names that must not match
    val dict = (0L until 40L).map(i =>
      (i, f"ent-${i * 7919}%06d-${('a' + (i % 26)).toChar}%s")).toDF(
      "mention_id", "name")
    val arrivals = dict.collect().map(r => (r.getLong(0), r.getString(1)))
      .flatMap { case (id, nm) =>
        val sub = (1000 + id, nm.updated((id % nm.length).toInt, '@'))
        if (id % 3 == 0) Seq(sub, (2000 + id, nm + "-novel")) else Seq(sub)
      }.toSeq
    val dictSig = graft.ops.EntityResolution
      .signatureFrame(dict, "mention_id", "name")

    val input = MemoryStream[(Long, String)]
    val q = StreamingRefresh.erAdmissionStream(
        input.toDF().toDF("mention_id", "name"), dictSig).writeStream
      .format("memory").queryName("er_admission_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("er-adm-ckpt").toString)
      .start()
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()

    val streamed = spark.table("er_admission_stream")
      .select(col("incoming_id"), col("corpus_id"), col("lev"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = graft.ops.EntityResolution.edOnePairsAgainst(
        dict, arrivals.toDF("mention_id", "name"), "mention_id", "name")
      .select(col("incoming_id"), col("corpus_id"), col("lev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed === batch)
    assert(batch.size >= 40, "every substitution variant must match")
    assert(!batch.exists(_._1 >= 2000), "novel names must not match")
    q.stop()
  }
}
