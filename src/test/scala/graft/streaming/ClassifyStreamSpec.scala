package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming NB classification: the exported-model stream scorer must
  * produce EXACTLY the batch scorer's predictions, rounded scores, and
  * vocab counts for every document, independent of micro-batch
  * boundaries — the exported decimal constants are the same numbers
  * the batch plan inlines as literals. */
class ClassifyStreamSpec extends SparkSpecBase {

  test("stream scores are bit-equal to the batch scorer per document") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test0 = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"), col("text"))

    val model = graft.ops.TextClassify.trainModel(train, "lang", "text")
    val input = MemoryStream[(Long, String)]
    val q = StreamingRefresh.classifyStream(
        input.toDF().toDF("doc_id", "text"), model).writeStream
      .format("memory").queryName("classify_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("classify-ckpt").toString)
      .start()
    val rows = test0.collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()

    val streamed = spark.table("classify_stream").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3))))
      .toMap

    val batch = graft.ops.TextClassify
      .naiveBayes(train, test0, "doc_id", "lang", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3), r.getLong(4))))
      .toMap

    assert(streamed === batch)
    assert(batch.nonEmpty)
    q.stop()
  }

  test("model parquet round trip scores bit-equally") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir)
    val model = graft.ops.TextClassify.trainModel(
      docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
    val dir = Files.createTempDirectory("nbmodel").toFile.getAbsolutePath
    graft.ops.TextClassify.saveModel(model, spark, dir)
    val loaded = graft.ops.TextClassify.loadModel(spark, dir)
    val texts = docs.filter(col("doc_id") % 5 === 0)
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach(t => assert(loaded.score(t) == model.score(t)))
    assert(loaded.classes == model.classes)
  }
}
