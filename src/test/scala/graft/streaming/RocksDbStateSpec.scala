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

  test("SCD2 open intervals close across batches under RocksDB state") {
    withRocksDb {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, timestamp_micros}
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String, Long, Long)]
      val q = StreamingRefresh.scd2Stream(
          input.toDF().toDF("user_id", "event_type", "us", "event_id")
            .withColumn("ts", timestamp_micros(col("us")))).writeStream
        .format("memory").queryName("rocksdb_scd2")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("rocksdb-scd2-ckpt").toString)
        .start()
      // the open interval from batch 1 must survive in RocksDB to be
      // closed by batch 2's change
      input.addData(Seq((1L, "bronze", 100L, 1L)))
      q.processAllAvailable()
      input.addData(Seq((1L, "silver", 300L, 2L)))
      q.processAllAvailable()
      val out = spark.table("rocksdb_scd2")
        .select("user_id", "event_type", "valid_from_us", "valid_to_us")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(out === Set((1L, "bronze", 100L, 300L)))
      q.stop()
    }
  }

  test("CMS counters accumulate across batches under RocksDB state") {
    withRocksDb {
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val (depth, width) = (4, 128)
      val q = StreamingRefresh.cmsStream(
          input.toDF().toDF("doc_id", "text"), depth, width).writeStream
        .format("memory").queryName("rocksdb_cms")
        .outputMode("complete")
        .option("checkpointLocation",
          Files.createTempDirectory("rocksdb-cms-ckpt").toString)
        .start()
      input.addData(Seq((1L, "apple banana apple")))
      q.processAllAvailable()
      input.addData(Seq((2L, "apple cherry")))
      q.processAllAvailable()
      val streamed = spark.table("rocksdb_cms").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = StreamingRefresh.cmsStream(
          Seq((1L, "apple banana apple"), (2L, "apple cherry"))
            .toDF("doc_id", "text"), depth, width)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      // every depth row must carry all 5 tokens
      (0 until depth).foreach { d =>
        assert(streamed.collect { case ((`d`, _), n) => n }.sum === 5L)
      }
      q.stop()
    }
  }
}
