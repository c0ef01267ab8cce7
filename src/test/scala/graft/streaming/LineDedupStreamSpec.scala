package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.ops.CorpusFilters

/** Streaming C4 line dedup: a single-batch drain must keep exactly the
  * lines batch `lineDedup` keeps (same min-(doc,pos) first-seen rule),
  * verified per doc by count AND rebuilt-text md5 fingerprint; across
  * batches a claimed line stays claimed — a later duplicate emits
  * nothing and never steals the claim. */
class LineDedupStreamSpec extends SparkSpecBase {

  private val wordsPerLine = 3

  /** Fixture docs re-lined exactly as q_corpus_line_dedup's input. */
  private def linedFixture() =
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        CorpusFilters.synthesizeLines(col("text"), wordsPerLine).as("text"))

  private def startStream(name: String, input: MemoryStream[(Long, String)]) = {
    val df = input.toDF().toDF("doc_id", "text")
    StreamingRefresh.lineDedupStream(df).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"$name-ckpt").toString)
      .start()
  }

  test("one-batch drain keeps exactly the batch lineDedup survivors") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lined = linedFixture()
    val input = MemoryStream[(Long, String)]
    val q = startStream("line_dedup_stream", input)
    input.addData(lined.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    q.processAllAvailable()

    // per-doc rebuild over the drained sink: n_kept + md5 of the kept
    // lines re-joined in pos order — the same fingerprint contract as
    // the batch operator's kept_fp
    val streamed = spark.table("line_dedup_stream")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(
            sort_array(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")),
          "\n")).as("kept_fp"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

    val batch = CorpusFilters.lineDedup(lined, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    // every doc with at least one surviving line matches count + md5;
    // docs whose every line was claimed elsewhere are absent from the
    // append sink (the batch row reports n_kept = 0 for them)
    batch.foreach { case (id, (_, nKept, fp)) =>
      if (nKept == 0L) assert(!streamed.contains(id), s"doc $id")
      else assert(streamed(id) === ((nKept, fp)), s"doc $id")
    }
    assert(streamed.keySet === batch.collect {
      case (id, (_, k, _)) if k > 0 => id }.toSet)
    // the fixture has real cross-doc collisions: something was dropped
    assert(batch.exists { case (_, (n, k, _)) => k < n })
    q.stop()
  }

  test("cross-batch: a claimed line stays claimed, new lines still emit") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = startStream("line_dedup_stream2", input)
    // batch 1: doc 1 claims "a b c" and "d e f"
    input.addData(Seq((1L, "a b c\nd e f")))
    q.processAllAvailable()
    // batch 2: doc 2 repeats "a b c" (suppressed — claim held from
    // batch 1, even though (2,0) < (1,0) is false and (2,...) arrives
    // later), adds fresh "g h i"; doc 0 repeats "d e f" (suppressed —
    // a SMALLER doc id cannot retro-steal a prior batch's claim)
    input.addData(Seq((2L, "a b c\ng h i"), (0L, "d e f")))
    q.processAllAvailable()
    val out = spark.table("line_dedup_stream2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(out === Set((1L, 0, "a b c"), (1L, 1, "d e f"), (2L, 1, "g h i")))
    q.stop()
  }
}
