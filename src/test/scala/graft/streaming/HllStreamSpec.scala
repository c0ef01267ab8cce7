package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ≡ batch for the HyperLogLog register file: per-register
  * MAX is a monotone set function, so micro-batch order cannot change
  * it — and the state stays bounded at sources × 2^p rows. The drained
  * registers are then pushed through the batch estimator arithmetic and
  * must reproduce q_corpus_distinct_hll's estimates exactly.
  */
class HllStreamSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow register file equals batch; estimator closes") {
    val p = 8
    val m = 1L << p
    val docs = graft.Tables.documents(spark, sfDir)
    val staged = tmp("docs-hll")
    // several files -> several micro-batches of partial register maxes
    docs.repartition(5).write.mode("overwrite").parquet(staged)

    val stream = StreamingRefresh.parquetStream(spark, staged,
      spark.read.parquet(staged).schema)
    StreamingRefresh.runAvailableNowToMemory(
      StreamingRefresh.hllStream(stream, p), "hll_stream",
      tmp("ckpt-hll"), outputMode = "complete")

    def toMap(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("idx")) ->
        r.getAs[Int]("reg")).toMap

    val streamed = toMap(spark.sql("SELECT * FROM hll_stream").collect().toSeq)
    val batch = toMap(StreamingRefresh.hllStream(docs, p).collect().toSeq)
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // bounded state: <= m registers per source, ranks in [1, 53]
    val sources = streamed.keys.map(_._1).toSet
    assert(streamed.size <= sources.size * m)
    streamed.foreach { case ((_, idx), reg) =>
      assert(idx >= 0 && idx < m)
      assert(reg >= 1 && reg <= 60 - p + 1)
    }
    // close the loop: drained registers -> the batch estimator's exact
    // arithmetic -> must equal the registered query's estimates
    val est = sources.map { src =>
      val regs = streamed.collect { case ((`src`, _), reg) => reg }.toSeq
      val zeros = m - regs.size
      val sum = regs.map(r => BigInt(1) << (60 - r)).sum +
        BigInt(zeros) * (BigInt(1) << 60)
      val raw = (0.7213 / (1 + 1.079 / 256.0)) * 65536.0 *
        1152921504606846976.0 / sum.toDouble
      val v = if (raw <= 2.5 * m && zeros > 0)
        256.0 * BigDecimal(math.log(256.0 / zeros))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      else raw
      src -> BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
    val fromQuery = graft.ops.Sketches.hllDistinct(
      docs.select(col("source"),
        explode(graft.functions.GraftFunctions.shingles(col("text"), 3))
          .as("gram"))
        .select(col("source"),
          conv(substring(md5(col("gram").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("hv")),
      "source", "hv", p)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("est_distinct")).toMap
    assert(est === fromQuery)
  }
}
