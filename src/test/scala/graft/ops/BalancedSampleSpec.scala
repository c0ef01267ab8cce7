package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Cluster-balanced selection: the salted pre-prune must be INVISIBLE
  * (same kept set as the naive per-cell window), quotas bind per cell,
  * and small cells keep everything. */
class BalancedSampleSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)

  test("salted pre-prune keeps exactly the naive per-cell top-quota") {
    import org.apache.spark.sql.expressions.Window
    val got = Similarity.clusterBalancedSample(emb, 8, 3, quota = 20)
      .select("vec_id", "cluster", "rk").as[(Long, Int, Long)]
      .collect().sortBy(_._1).toSeq
    // the naive formulation the scale shape must agree with
    val asg = Similarity.kMeans(emb, 8, 3)
    val hv = conv(substring(md5(col("vec_id").cast("string").cast("binary")),
      1, 15), 16, 10).cast("long") + lit(1L)
    val skey = round(org.apache.spark.sql.functions.log(
      hv.cast("double") / lit(1152921504606846976.0)), 9)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("skey").desc, col("vec_id"))
    val naive = asg.withColumn("skey", skey)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 20)
      .select("vec_id", "cluster", "rk").as[(Long, Int, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("quota binds per cell; a cell smaller than the quota keeps all") {
    val small = emb.limit(30) // 30 vectors over 8 cells: most cells < quota
    val out = Similarity.clusterBalancedSample(small, 8, 3, quota = 3)
      .select("cluster", "rk").as[(Int, Long)].collect()
    val perCell = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perCell.values.forall(_ <= 3), s"quota violated: $perCell")
    assert(out.forall(_._2 <= 3))
    val cells = Similarity.kMeans(small, 8, 3)
      .groupBy("cluster").count().as[(Int, Long)].collect().toMap
    cells.foreach { case (c, n) =>
      assert(perCell.getOrElse(c, 0) == math.min(n, 3L).toInt,
        s"cell $c: ${perCell.getOrElse(c, 0)} kept of $n")
    }
  }
}
