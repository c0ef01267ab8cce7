package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ≡ batch for the Bloom skip index: bit_or is a
  * duplicate-insensitive commutative monoid, so micro-batch arrival
  * order cannot change the filter words — and the streamed words must
  * also equal the distinct+sum batch formulation exactly.
  */
class BloomStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow index words equal both batch builds word-for-word") {
    val (mBits, k) = (1008, 3)
    val orders = graft.Tables.orders(spark, sfDir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_custkey"))
    val staged = tmp("orders-bloom")
    orders.repartition(5).write.mode("overwrite").parquet(staged)

    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      graft.ops.BloomIndex.buildIncremental(stream, "month", "o_custkey",
        mBits, k),
      "bloom_stream", tmp("ckpt-bloom"), outputMode = "complete")

    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    val streamed = toMap(spark.table("bloom_stream"))
    val batchOr = toMap(graft.ops.BloomIndex.buildIncremental(
      orders, "month", "o_custkey", mBits, k))
    val batchSum = toMap(graft.ops.BloomIndex.build(
      orders, "month", "o_custkey", mBits, k))
    assert(streamed.nonEmpty)
    assert(streamed === batchOr)
    assert(streamed === batchSum)
    // bounded state: at most parts x words rows
    val nParts = orders.select("month").distinct().count()
    assert(streamed.size <= nParts * (mBits / graft.ops.BloomIndex.WordBits))
  }
}
