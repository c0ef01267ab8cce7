package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** ANN recall@k evaluation: output invariants (one row per query
  * vector, n_hits ≤ k, recall = n_hits/k), agreement with a direct
  * set-intersection of the two verified legs, and the perfect-recall
  * identity when the approximate leg IS the exact leg.
  */
class KnnRecallSpec extends SparkSpecBase {

  private val K = 5

  test("one row per query; recall consistent with the two legs") {
    val rows = graft.SparkEntry.queries("q_knn_recall")(spark, sfDir)
      .collect()
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    assert(rows.length.toLong === queries.count())
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= K)
      assert(r.getAs[Double]("recall_at_k") === hits.toDouble / K)
      // r13 rank-quality legs: bounded, and pinned at the identities a
      // full hit set / an empty hit set force
      val ndcg = r.getAs[Double]("ndcg_at_k")
      val rr = r.getAs[Double]("rr")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg out of range: $ndcg")
      assert(rr == 0.0 || (rr >= 1.0 / K && rr <= 1.0), s"rr out of range: $rr")
      if (hits == K) {
        assert(ndcg === 1.0, "all k ranks relevant must score ideal DCG")
        assert(rr === 1.0)
      }
      if (hits == 0L) { assert(ndcg === 0.0); assert(rr === 0.0) }
    }
    // recompute the intersection directly from the two verified legs
    val brute = graft.ops.Similarity.bruteForceTopK(emb, queries, K)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.ops.Similarity.ivfTopK(emb, queries, K)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (ivf & brute).groupBy(_._1).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val q = r.getLong(0)
      assert(r.getAs[Long]("n_hits") === expect.getOrElse(q, 0).toLong,
        s"query $q")
    }
  }

  test("exact leg against itself scores recall 1.0 everywhere") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val brute = graft.ops.Similarity.bruteForceTopK(emb, queries, K)
      .select(col("query_id"), col("neighbor_id"))
    val hits = brute.join(brute, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      .collect()
    assert(hits.nonEmpty)
    hits.foreach(r => assert(r.getAs[Long]("n") === K.toLong))
  }
}
