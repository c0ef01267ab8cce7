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

  test("embedding decontamination surfaces every planted near-copy") {
    // the registered probe construction: damp odd dims ×0.99 → cos ≈
    // 0.99996 to the source, far below the bar to everything else
    val probes = queries.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") * when(i % 2 === 0, lit(1.0)).otherwise(lit(0.99)))
          .cast("float")).as("embedding"))
    val out = Similarity.embeddingDecontaminate(emb, probes, minCos = 0.8,
      numCells = 4, nProbe = 4) // exhaustive probe: no cell can hide a hit
    val hits = out.select(col("probe_id"), col("corpus_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wanted = queries.select(col("vec_id"))
      .collect().map(_.getLong(0)).map(v => (v + 1000000L, v)).toSet
    assert(wanted.subsetOf(hits),
      s"planted sources missed: ${(wanted -- hits).take(3)}")
    // and nothing else clears the bar on this corpus (max stranger
    // cosine ≈ 0.48 at sf0.001)
    assert(hits === wanted)
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
