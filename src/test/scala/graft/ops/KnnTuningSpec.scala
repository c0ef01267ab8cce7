package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The IVF tuning curve's laws: recall@k is monotone non-decreasing in
  * the probe depth (probing more cells can only ADD candidates — the
  * property the knob exists for), candidate cost is strictly increasing
  * on a non-degenerate corpus, and the exhaustive depth anchors at
  * recall exactly 1.0 (it IS the brute-force set, so any other reading
  * means the evaluation itself is broken). */
class KnnTuningSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(11)
    (0L until 120L)
      .map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("recall is monotone in nprobe and the exhaustive depth reads exactly 1.0") {
    val emb = fixture
    val rows = Similarity.ivfRecallSweep(emb,
        emb.filter(col("vec_id") % 20 === 0), k = 5,
        numCells = 8, probes = Seq(1, 2, 4, 8))
      .orderBy(col("nprobe")).collect()
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq === Seq(1, 2, 4, 8))
    val recalls = rows.map(_.getAs[Double]("mean_recall")).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in nprobe: $recalls")
    assert(recalls.last === 1.0,
      "probing every cell IS brute force — recall must anchor at 1.0")
    assert(rows.map(_.getAs[Double]("min_recall")).last === 1.0)
    // the r13 rank-quality legs anchor too: the exhaustive depth IS the
    // brute ranking, so its NDCG and MRR must read exactly 1.0, and
    // every depth stays within [0, 1]
    val ndcgs = rows.map(_.getAs[Double]("mean_ndcg")).toSeq
    val mrrs = rows.map(_.getAs[Double]("mean_mrr")).toSeq
    assert(ndcgs.forall(v => v >= 0.0 && v <= 1.0), s"ndcg range: $ndcgs")
    assert(mrrs.forall(v => v >= 0.0 && v <= 1.0), s"mrr range: $mrrs")
    assert(ndcgs.last === 1.0, s"exhaustive depth must score ideal DCG: $ndcgs")
    assert(mrrs.last === 1.0, s"exhaustive depth must rank a hit first: $mrrs")
    val cands = rows.map(_.getAs[Double]("mean_candidates")).toSeq
    assert(cands.zip(cands.tail).forall { case (a, b) => a < b },
      s"candidate cost must grow with nprobe: $cands")
    // every query is counted at every depth, even candidate-less ones
    assert(rows.map(_.getAs[Long]("n_queries")).distinct.toSeq === Seq(6L))
  }

  test("PQ refine: recall monotone, rescore cost exactly k·refine") {
    val emb = fixture
    val rows = Similarity.pqRefineSweep(emb,
        emb.filter(col("vec_id") % 20 === 0), k = 5,
        numSubspaces = 4, codebookSize = 8, dims = 16,
        refines = Seq(1, 2, 4))
      .orderBy(col("refine")).collect()
    assert(rows.map(_.getAs[Int]("refine")).toSeq === Seq(1, 2, 4))
    val recalls = rows.map(_.getAs[Double]("mean_recall")).toSeq
    // a deeper ADC prefix is a SUPERSET, and the exact re-rank of a
    // superset can only keep or gain brute top-k members
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in refine: $recalls")
    // the cost axis: every query buys exactly k·refine exact rescores
    // (corpus is large enough that the ADC prefix never truncates)
    assert(rows.map(_.getAs[Double]("mean_candidates")).toSeq ===
      Seq(5.0, 10.0, 20.0))
  }

  test("deepest-depth candidates equal the full corpus minus self") {
    val emb = fixture
    val rows = Similarity.ivfRecallSweep(emb,
        emb.filter(col("vec_id") === 0L), k = 5,
        numCells = 4, probes = Seq(4))
      .collect()
    assert(rows.head.getAs[Double]("mean_candidates") === 119.0)
  }
}
