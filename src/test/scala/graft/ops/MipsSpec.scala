package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** MIPS semantics: brute inner-product ranking rewards magnitude (not
  * angle), the norm augmentation makes every corpus vector's norm
  * exactly M (so cosine ranking of augmented vectors IS inner-product
  * ranking), and exhaustive probing through the reduction recovers the
  * brute answer. */
class MipsSpec extends SparkSpecBase {
  import spark.implicits._

  // 2-dim: q = (1, 0). cosine would rank b (angle 0, tiny) first;
  // inner product must rank the big vectors first.
  private val tiny = Seq(
    (0L, Seq(1.0f, 0.0f)), // the query (vec_id % 100 == 0 convention)
    (1L, Seq(10.0f, 0.5f)), // ip 10.0
    (2L, Seq(8.0f, -4.0f)), // ip 8.0
    (3L, Seq(0.9f, 0.0f)), // ip 0.9 — best ANGLE, small ip
    (4L, Seq(-9.0f, 1.0f))) // ip -9.0
    .toDF("vec_id", "embedding")

  test("mipsTopK ranks by inner product, not cosine") {
    val out = Similarity.mipsTopK(tiny,
      tiny.filter(col("vec_id") === 0L), k = 3)
      .orderBy(col("rk"))
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L),
      s"ip order wrong: ${out.toSeq}")
    assert(out.map(_._2).toSeq == Seq(10.0, 8.0, 0.9))
  }

  private def gaussians(n: Int, dims: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // varied magnitudes so ip and cosine rankings genuinely differ
      val scale = 0.5f + (i % 7).toFloat
      (i.toLong, Seq.fill(dims)(rnd.nextGaussian().toFloat * scale))
    }.toDF("vec_id", "embedding")
  }

  test("augmented corpus vectors all have norm exactly M") {
    val emb = gaussians(300, 16, seed = 3)
    val e = Similarity.withNorm(emb, "vec_id", "embedding")
    val m = e.agg(max(col("nrm"))).collect()(0).getDouble(0)
    val aug = e.select(
      sqrt(graft.functions.GraftFunctions.dot(
        concat(col("v"), array(sqrt(lit(m) * lit(m) - col("nrm") * col("nrm")))),
        concat(col("v"), array(sqrt(lit(m) * lit(m) - col("nrm") * col("nrm"))))))
        .as("an"))
      .agg(min(col("an")).as("mn"), max(col("an")).as("mx"))
      .collect()(0)
    assert(math.abs(aug.getDouble(0) - m) < 1e-9 &&
      math.abs(aug.getDouble(1) - m) < 1e-9,
      s"augmented norms [${aug.getDouble(0)}, ${aug.getDouble(1)}] != $m")
  }

  test("exhaustive probe through the reduction recovers brute MIPS") {
    val emb = gaussians(300, 16, seed = 7)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val rec = Similarity.mipsRecall(emb, queries, k = 5,
      numCells = 8, nProbe = 8)
      .agg(avg(col("recall_at_k"))).collect()(0).getDouble(0)
    // exhaustive probing leaves only the float-rounded augmentation and
    // the 4-decimal tie boundary between the two rankings
    assert(rec >= 0.9, s"exhaustive-probe MIPS recall $rec < 0.9")
  }

  test("partial probe recall is a proper fraction and deterministic") {
    val emb = gaussians(400, 16, seed = 11)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def run() = Similarity.mipsRecall(emb, queries, k = 5,
      numCells = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val a = run(); val b = run()
    assert(a == b, "mipsRecall must be deterministic")
    assert(a.forall { case (_, h) => h >= 0 && h <= 5 })
  }
}
