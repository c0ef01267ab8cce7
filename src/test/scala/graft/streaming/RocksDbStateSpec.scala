package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpecBase

/** The stateful streaming operators on the RocksDB state store — the
  * provider a 100 TB deployment actually runs, because their state
  * grows with the corpus (line dedup: one entry per DISTINCT line value
  * for the stream's lifetime; near-dup: one per LSH bucket) and the
  * default in-memory HDFSBackedStateStore holds every entry on the
  * executor heap. RocksDB keeps state off-heap on local disk with
  * incremental checkpointing, so state size is bounded by disk, not
  * memory. This spec pins that the flatMapGroupsWithState operators
  * produce IDENTICAL results under the RocksDB provider, cross-batch
  * claims included — the provider is a deployment knob, never a
  * semantics change. */
class RocksDbStateSpec extends SparkSpecBase {

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

  test("line dedup claims persist across batches under RocksDB state") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = StreamingRefresh.lineDedupStream(
          input.toDF().toDF("doc_id", "text")).writeStream
        .format("memory").queryName("rocksdb_line_dedup")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("rocksdb-ld-ckpt").toString)
        .start()
      input.addData(Seq((1L, "a b c\nd e f")))
      q.processAllAvailable()
      input.addData(Seq((2L, "a b c\ng h i"), (0L, "d e f")))
      q.processAllAvailable()
      val out = spark.table("rocksdb_line_dedup")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(out === Set((1L, 0, "a b c"), (1L, 1, "d e f"), (2L, 1, "g h i")))
      q.stop()
    }
  }

  test("near-dup bucket state pairs across batches under RocksDB state") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val dup = "alpha beta gamma delta epsilon zeta"
      val q = StreamingRefresh.nearDupStream(
          input.toDF().toDF("doc_id", "text")).writeStream
        .format("memory").queryName("rocksdb_near_dup")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("rocksdb-nd-ckpt").toString)
        .start()
      // batch 1 seeds doc 10; batch 2's identical doc 11 must pair
      // against state retained in RocksDB from batch 1
      input.addData(Seq((10L, dup)))
      q.processAllAvailable()
      input.addData(Seq((11L, dup)))
      q.processAllAvailable()
      val pairs = spark.table("rocksdb_near_dup")
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((10L, 11L)))
      q.stop()
    }
  }
}
