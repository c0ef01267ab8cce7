package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** JL random projection: exactness against a by-hand fold with the same
  * signs, and the distance-preservation property the projection exists
  * for (loose statistical band at k=16). */
class RandomProjectSpec extends SparkSpecBase {
  import spark.implicits._

  test("projection equals the by-hand signed fold (same signs, order)") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(20)
    val signs = Similarity.rpSigns(16, 64)
    val got = Similarity.randomProject(emb, 16)
      .collect().map(r => r.getLong(0) ->
        (0 until 16).map(j => r.getDouble(j + 1))).toMap
    emb.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble)
      val want = (0 until 16).map { j =>
        val s = v.indices.foldLeft(0.0)((acc, d) => acc + v(d) * signs(j)(d))
        BigDecimal(s / 4).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
      val g = got(r.getLong(0))
      (0 until 16).foreach(j => assert(math.abs(g(j) - want(j)) < 1e-9,
        s"vec ${r.getLong(0)} dim $j: ${g(j)} vs ${want(j)}"))
    }
  }

  test("projected distances track original distances (JL property)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val orig = emb.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toSeq).toMap
    val proj = Similarity.randomProject(emb, 16)
      .collect().map(r => r.getLong(0) ->
        (0 until 16).map(j => r.getDouble(j + 1))).toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(60)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      o = d2(orig(ids(i)), orig(ids(j))) if o > 1e-9
    } yield d2(proj(ids(i)), proj(ids(j))) / o
    val mean = ratios.sum / ratios.length
    // E[ratio] = 1; at k=16 individual pairs are noisy but the mean
    // over ~1700 pairs concentrates
    assert(mean > 0.8 && mean < 1.25, s"mean distortion $mean")
    assert(ratios.count(r => r > 0.2 && r < 5.0) > ratios.length * 9 / 10,
      "distortion tails too heavy for a JL projection")
  }
}
