package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** MMR semantics pinned against an independent in-memory greedy
  * implementation (same rounding contract: 4-rounded cosines, 6-rounded
  * scores, HALF_UP like Spark's `round`), plus a constructed case where
  * pure relevance ranking and MMR must disagree.
  */
class MmrSpec extends SparkSpecBase {
  import spark.implicits._

  private val Lambda = 0.7

  private def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    r(dot / (na * nb), 4)
  }

  /** Reference greedy MMR over one query's candidate list. */
  private def refMmr(vecs: Map[Long, Array[Double]], qId: Long, k: Int,
      candK: Int): Seq[(Long, Double)] = {
    val rel = vecs.keys.filter(_ != qId).toSeq
      .map(id => id -> cos(vecs(id), vecs(qId)))
      .sortBy { case (id, c) => (-c, id) }
      .take(candK)
    val oneMinus = 1 - Lambda
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (picked.size < k && picked.size < rel.size) {
      val chosen = rel.filterNot(c => picked.exists(_._1 == c._1))
        .map { case (id, relv) =>
          val ms = if (picked.isEmpty) 0.0
            else picked.map(p => cos(vecs(id), vecs(p._1))).max
          (id, r(Lambda * relv - oneMinus * ms, 6))
        }
        .minBy { case (id, s) => (-s, id) }
      picked += chosen
    }
    picked.toSeq
  }

  test("matches the reference greedy on seeded random vectors") {
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 30L)
      .map(i => i -> Array.fill(8)(rnd.nextGaussian().toFloat.toDouble)).toMap
    val df = vecs.toSeq
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(df, df.filter(col("vec_id") % 10 === 0),
        k = 4, candK = 10, lambda = Lambda)
      .orderBy(col("query_id"), col("rk"))
      .collect()
      .map(row => (row.getAs[Long]("query_id"), row.getAs[Long]("cand_id"),
        row.getAs[Double]("score")))
    // float32 storage first: the reference must see the same values
    val f32 = vecs.map { case (id, v) => id -> v.map(_.toFloat.toDouble) }
    val expect = Seq(0L, 10L, 20L).flatMap(q =>
      refMmr(f32, q, 4, 10).map { case (id, s) => (q, id, s) })
    assert(out.toSeq === expect)
  }

  test("diversifies: near-duplicate of the first pick loses to a diverse doc") {
    // q leans mostly toward c1; c2 is c1's exact clone (sim 1.0), c3 is
    // orthogonal to c1 but still carries some relevance. At λ = 0.5 the
    // clone's penalty (−0.5·1.0) sinks it below the diverse candidate.
    val vecs = Seq(
      100L -> Array(1f, 0.3f, 0f, 0f), // query
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(1f, 0f, 0f, 0f),
      3L -> Array(0f, 1f, 0f, 0f))
    val df = vecs.toDF("vec_id", "embedding")
    val picks = Similarity.mmrTopK(df, df.filter(col("vec_id") === 100L),
        k = 2, candK = 3, lambda = 0.5)
      .orderBy(col("rk")).collect().map(_.getAs[Long]("cand_id")).toSeq
    assert(picks.head === 1L, "first pick is pure relevance")
    assert(picks(1) === 3L,
      "second pick must skip the clone and take the diverse candidate")
    // sanity: relevance-only ranking WOULD have picked the clone
    val rel = Similarity.bruteForceTopK(df,
        df.filter(col("vec_id") === 100L), 2)
      .orderBy(col("rk")).collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(rel === Seq(1L, 2L))
  }
}
