package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming ANN probes: the drained candidate stream, cut to the same
  * k·refine ADC window and exactly re-ranked, must reproduce
  * AnnIndex.topK row for row — the per-row broadcast-model ADC tables
  * are the same numbers the batch scorer's driver-collected dtable map
  * holds, and candidates land in their query's arrival micro-batch. */
class AnnProbeStreamSpec extends SparkSpecBase {

  private val K = 5
  private val Refine = 5

  test("drained candidates re-ranked ≡ AnnIndex.topK") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val ixDir = Files.createTempDirectory("annix-stream").toFile.getAbsolutePath
    graft.ops.AnnIndex.save(emb, ixDir)

    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingRefresh.annProbeStream(
        input.toDF().toDF("vec_id", "embedding"), ixDir).writeStream
      .format("memory").queryName("ann_probe_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("annprobe-ckpt").toString)
      .start()
    val rows = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()

    // consumer-side rollup: the same k·refine ADC cut + exact re-rank
    // the batch scorer applies (adist asc / cos desc, id tiebreaks)
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id"))
    val cand = spark.table("ann_probe_stream")
      .withColumn("ark", row_number().over(wA))
      .filter(col("ark") <= K * Refine)
      .select(col("query_id"), col("neighbor_id"), col("adist"))
    val e = graft.ops.Similarity.withNorm(emb, "vec_id", "embedding")
    val qv = graft.ops.Similarity.withNorm(queries, "vec_id", "embedding")
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val streamed = cand
      .join(e.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .join(qv, "query_id")
      .withColumn("cos", round(graft.ops.Similarity.dot(col("v"), col("qv"))
        / (col("nrm") * col("qn")), 4))
      .withColumn("rk", row_number().over(wC))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        col("adist"), col("cos"))
      .collect().map(_.toSeq).toSet

    val batch = graft.ops.AnnIndex
      .topK(spark, ixDir, emb, queries, K, refine = Refine)
      .collect().map(_.toSeq).toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
    q.stop()
  }
}
