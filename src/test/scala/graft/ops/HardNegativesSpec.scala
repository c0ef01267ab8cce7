package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Hard-negative mining (Similarity.hardNegatives): cross-label top-k
  * over the IVF-probed region. The registered q_knn_hard_negatives adds
  * the cross-engine leg (DuckDB replays the IVF cells + label filter).
  */
class HardNegativesSpec extends SparkSpecBase {

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)
  private lazy val queries = emb.filter(col("vec_id") % 100 === 0)

  test("no returned negative shares the query's label; no self-matches") {
    val out = Similarity.hardNegatives(emb, queries, k = 5)
    assert(out.filter(col("neighbor_label") === col("query_label"))
      .count() === 0L)
    assert(out.filter(col("neighbor_id") === col("query_id")).count() === 0L)
    assert(out.count() > 0)
  }

  test("exhaustive probe equals brute-force cross-label top-k") {
    // with nProbe = numCells the probed region is the whole corpus, so
    // the miner must agree with an independent derivation: brute top-k
    // over all cross-label pairs
    val mined = Similarity.hardNegatives(emb, queries, k = 3,
      numCells = 4, nProbe = 4)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
      .collect().map(_.toString).toSet
    val labels = emb.select(col("vec_id"), col("label"))
    val brute = Similarity.bruteForceTopK(emb, queries, k = emb.count().toInt)
      .join(labels.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nl"), "neighbor_id")
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "ql"), "query_id")
      .filter(col("nl") =!= col("ql"))
    val rebuiltRk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val want = brute
      .withColumn("rk2", row_number().over(rebuiltRk))
      .filter(col("rk2") <= 3)
      .select(col("query_id"), col("rk2").as("rk"), col("neighbor_id"),
        col("cos"))
      .collect().map(_.toString).toSet
    assert(mined === want)
    assert(mined.nonEmpty)
  }
}
