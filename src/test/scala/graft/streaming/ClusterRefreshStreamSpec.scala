package graft.streaming

import graft.SparkSpecBase
import java.nio.file.Files

/** Streaming cluster refresh ≡ batch CC: the persisted label state
  * after any drain equals full connected components over every pair
  * seen so far — across forced one-file micro-batches AND across a
  * stop/restart with new pairs arriving in between (the daily-refresh
  * contract).
  */
class ClusterRefreshStreamSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def fullCc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val vs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    graft.ops.Dedup.connectedComponents(vs.toDF("vec_id"), "vec_id",
      pairs.toDF("vec_a", "vec_b"), "vec_a", "vec_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("drained labels equal batch CC, across batches and restarts") {
    val staged = tmp("pairs-in")
    val labels = tmp("labels-state") + "/labels"
    val ckpt = tmp("ckpt-ccref")

    val day1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    day1.toDF("vec_a", "vec_b").repartition(3)
      .write.mode("append").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    // one file per micro-batch: the label state must fold correctly
    // through MANY small increments, not just one big one
    def drain(): Unit = StreamingRefresh.clusterRefreshStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(staged), labels, ckpt)

    drain()
    def state(): Map[Long, Long] =
      spark.read.parquet(labels).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state() === fullCc(day1))

    // day 2: a bridge that MERGES two day-1 clusters, a new chain, and
    // a pair linking the new chain into an old cluster
    val day2 = Seq((3L, 10L), (30L, 31L), (31L, 20L))
    day2.toDF("vec_a", "vec_b").repartition(2)
      .write.mode("append").parquet(staged)
    drain() // same checkpoint: only the new files are processed
    assert(state() === fullCc(day1 ++ day2))
    // the merge actually happened: 1-2-3-10-11 is one cluster now
    assert(Seq(1L, 2L, 3L, 10L, 11L).map(state()).toSet === Set(1L))
    assert(Seq(20L, 21L, 30L, 31L).map(state()).toSet === Set(20L))
  }
}
