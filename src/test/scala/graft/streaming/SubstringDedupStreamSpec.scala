package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.ops.CorpusFilters

/** Streaming duplicated-substring dedup: a single-batch drain must keep
  * exactly the tiles batch `dropDuplicatedSubstrings` keeps (same
  * min-(doc,tile) first-occurrence rule), verified per doc by kept
  * count AND the rebuilt-text md5 the batch operator emits as kept_fp;
  * across batches a claimed span stays claimed. A RocksDB-provider
  * variant pins that the deployment-grade state store preserves the
  * semantics. */
class SubstringDedupStreamSpec extends SparkSpecBase {

  private val n = 4

  private def startStream(name: String, input: MemoryStream[(Long, String)]) = {
    val df = input.toDF().toDF("doc_id", "text")
    StreamingRefresh.substringDedupStream(df, n = n).writeStream
      .format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory(s"$name-ckpt").toString)
      .start()
  }

  /** Session-conf provider switch, restored afterwards (the same
    * mechanism as RocksDbStateSpec — the provider is a session conf
    * read at query start, not a sink option). */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Per-doc rebuild over the drained sink: kept count + md5 of the
    * kept tiles space-joined in tile order — the batch kept_fp
    * contract. */
  private def drainedRebuild(table: String): Map[Long, (Long, String)] =
    spark.table(table)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(
            sort_array(collect_list(struct(col("tile"), col("gram")))),
            s => s.getField("gram")),
          " ")).as("kept_fp"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private def checkAgainstBatch(table: String): Unit = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val batch = CorpusFilters.dropDuplicatedSubstrings(docs, "doc_id", "text", n)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val streamed = drainedRebuild(table)
    batch.foreach { case (id, (_, nKept, fp)) =>
      if (nKept == 0L) assert(!streamed.contains(id), s"doc $id")
      else assert(streamed(id) === ((nKept, fp)), s"doc $id")
    }
    assert(streamed.keySet === batch.collect {
      case (id, (_, k, _)) if k > 0 => id }.toSet)
    // the fixture has real cross-doc duplicated spans: something dropped
    assert(batch.exists { case (_, (t, k, _)) => k < t },
      "fixture produced no duplicated spans — the test has no signal")
  }

  test("one-batch drain rebuilds to the batch operator's kept_fp per doc") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = startStream("substr_dedup_stream", input)
    input.addData(graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    q.processAllAvailable()
    checkAgainstBatch("substr_dedup_stream")
    q.stop()
  }

  test("cross-batch: a claimed span stays claimed, fresh spans still emit") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = startStream("substr_dedup_stream2", input)
    // batch 1: doc 5 claims tiles "a b c d" and "e f g h"
    input.addData(Seq((5L, "a b c d e f g h")))
    q.processAllAvailable()
    // batch 2: doc 9 repeats span "a b c d" (suppressed) + fresh tail;
    // doc 1 repeats "e f g h" (suppressed — a SMALLER doc id cannot
    // retro-steal a prior batch's claim)
    input.addData(Seq((9L, "a b c d x y z w"), (1L, "e f g h")))
    q.processAllAvailable()
    val out = spark.table("substr_dedup_stream2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(out === Set((5L, 0, "a b c d"), (5L, 1, "e f g h"),
      (9L, 1, "x y z w")))
    q.stop()
  }

  test("RocksDB state store: drain rebuild identical to batch") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = startStream("substr_dedup_stream_rdb", input)
      input.addData(graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
      checkAgainstBatch("substr_dedup_stream_rdb")
      q.stop()
    }
  }
}
