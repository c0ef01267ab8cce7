package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** kMeans + semDedup semantics: crafted-corpus exact expectations and
  * fixture-scale invariants (the q_sim_kmeans / q_sim_semdedup oracles
  * add the cross-engine value check). */
class KmeansSpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    parts.foreach { case (i, x) => a(i) = x }
    a
  }

  /** Two obvious directions: ids 0/2 along e0, ids 1/3/4 along e1. */
  private def crafted = Seq(
    (0L, vec(0 -> 1.0f)),
    (1L, vec(1 -> 1.0f)),
    (2L, vec(0 -> 2.0f)),
    (3L, vec(1 -> 1.5f)),
    (4L, vec(1 -> 1.0f, 2 -> 0.05f))
  ).toDF("vec_id", "embedding")

  test("kMeans: crafted corpus converges to the two true clusters") {
    val out = Similarity.kMeans(crafted, k = 2, iters = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.toSet === Set(Set(0L, 2L), Set(1L, 3L, 4L)))
  }

  test("kMeans: fixture run is deterministic and iterations do not hurt WCSS") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val r1 = Similarity.kMeans(emb, 8, 3).orderBy("vec_id").collect().toSeq
    val r2 = Similarity.kMeans(emb, 8, 3).orderBy("vec_id").collect().toSeq
    assert(r1 === r2)
    assert(r1.map(_.getInt(1)).forall(c => c >= 0 && c < 8))
    val wcss1 = Similarity.kMeans(emb, 8, 1)
      .agg(sum("d2")).head.getDouble(0)
    val wcss3 = r1.map(_.getDouble(2)).sum
    assert(wcss3 <= wcss1 + 1e-6)
  }

  test("semDedup: crafted corpus keeps min-id survivors, counts dups") {
    val out = Similarity.semDedup(crafted, threshold = 0.9, k = 2, iters = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3))).toSeq
    // cluster {0,2}: keep 0, drop 2 (cos=1); cluster {1,3,4}: keep 1,
    // drop 3 (cos=1 vs 1) and 4 (cos≈0.9988 vs both 1 and 3)
    assert(out === Seq((0L, true, 0L), (1L, true, 0L), (2L, false, 1L),
      (3L, false, 1L), (4L, false, 2L)))
  }

  test("semDedup: min-id member of every cluster is always kept") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val out = Similarity.semDedup(emb, 0.35, k = 16, iters = 2)
    val minKept = out
      .withColumn("min_id", min("vec_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("cluster")))
      .filter(col("vec_id") === col("min_id") && !col("keep"))
      .count()
    assert(minKept === 0)
    // keep <-> n_dups == 0, on every row
    assert(out.filter(col("keep") =!= (col("n_dups") === 0)).count() === 0)
  }
}
