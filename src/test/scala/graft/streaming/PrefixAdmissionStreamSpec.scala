package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Streaming exact-Jaccard admission: the drained per-prefix-hit
  * stream, rolled up to distinct (incoming, corpus) pairs, must equal
  * the batch prefixJaccardAgainst over the same split; the joins are
  * stateless stream-static, so a match lands in the micro-batch its
  * doc arrives in regardless of where the boundary cuts the feed. */
class PrefixAdmissionStreamSpec extends SparkSpecBase {

  test("drained hit stream rolls up to the batch against-pairs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = (0 until 40).map { i =>
      (i.toLong, (0 until 10).map(w => s"c${i}_w$w").mkString(" "))
    }.toDF("doc_id", "text")
    // arrivals: exact copies (J=1), 9-of-10-word overlaps (J=0.6),
    // and all-novel docs that must not match
    val arrivals: Seq[(Long, String)] = (0 until 40).flatMap { i =>
      val copy = (100L + i, (0 until 10).map(w => s"c${i}_w$w").mkString(" "))
      val near = (200L + i,
        ((0 until 9).map(w => s"c${i}_w$w") :+ s"novel$i").mkString(" "))
      val novel = (300L + i, (0 until 10).map(w => s"x${i}_w$w").mkString(" "))
      if (i % 2 == 0) Seq(copy, near, novel) else Seq(near)
    }
    val (pref, sets) = graft.ops.Dedup.prefixIndexArtifacts(
      corpus, "doc_id", "text", 0.5)

    val input = MemoryStream[(Long, String)]
    val q = StreamingRefresh.prefixAdmissionStream(
        input.toDF().toDF("doc_id", "text"), pref, sets).writeStream
      .format("memory").queryName("prefix_admission_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("pfx-adm-ckpt").toString)
      .start()
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()

    val streamed = spark.table("prefix_admission_stream")
      .select(col("incoming_id"), col("corpus_id"), col("n_inter"),
        col("jaccard"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

    val batch = graft.ops.Dedup.prefixJaccardAgainst(corpus,
        arrivals.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

    assert(streamed === batch)
    assert(batch.exists(_._4 == 1.0), "exact copies must match at J=1")
    assert(batch.exists(p => p._4 > 0.5 && p._4 < 1.0),
      "near docs must match strictly between threshold and 1")
    assert(!batch.exists(_._1 >= 300), "novel docs must not match")
    q.stop()
  }
}
