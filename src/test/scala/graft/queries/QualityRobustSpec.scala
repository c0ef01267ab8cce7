package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Robust (median/MAD) per-source normalization: the estimator's
  * defining properties on the fixture (z median 0, winsor bounds,
  * degenerate-source NULL), outlier resistance vs the mean/stddev
  * z-score on a planted heavy tail, and the scale shape (two bounded
  * aggregates + broadcasts — no window).
  */
class QualityRobustSpec extends SparkSpecBase {

  private lazy val rows = TextQueries.qualityRobust(spark, sfDir).collect()

  test("per-source laws: z centers on 0, winsorization bounds hold") {
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val zs = rs.filter(!_.isNullAt(5)).map(_.getAs[Double]("z")).sorted
      assert(zs.nonEmpty, s"$src: MAD degenerate on the whole fixture?")
      // the median doc's z is exactly 0 by construction (odd n) or the
      // interpolated median of z straddles 0 (even n)
      val medZ =
        if (zs.length % 2 == 1) zs(zs.length / 2)
        else (zs(zs.length / 2 - 1) + zs(zs.length / 2)) / 2
      assert(math.abs(medZ) < 1e-6, s"$src median z = $medZ")
      rs.filter(!_.isNullAt(6)).foreach { r =>
        val w = r.getAs[Double]("z_wins")
        assert(w >= -3.0 && w <= 3.0)
        val z = r.getAs[Double]("z")
        assert(w === math.max(-3.0, math.min(3.0, z)))
      }
      // the cross-engine determinism guarantee: the micro-grid median
      // and MAD are DYADIC (integer or half-integer micro-units), so
      // the p=0.5 interpolation was exact — any fractional tail here
      // means the grid leaked and the oracle can ulp-diverge again
      rs.foreach { r =>
        val med2 = r.getAs[Double]("med_micro") * 2
        val mad2 = r.getAs[Double]("mad_micro") * 2
        assert(med2 === math.rint(med2), s"med_micro not dyadic: $r")
        assert(mad2 === math.rint(mad2), s"mad_micro not dyadic: $r")
      }
    }
  }

  test("a degenerate (MAD = 0) source yields NULL z, not a blow-up") {
    import spark.implicits._
    // the same micro-grid arithmetic through a tiny frame: constant
    // quality -> MAD exactly 0 -> z must be NULL, never a division
    val docs = Seq((1L, "s", 500000L), (2L, "s", 500000L),
      (3L, "s", 500000L)).toDF("doc_id", "source", "qi")
    val med = docs.groupBy(col("source"))
      .agg(percentile(col("qi"), lit(0.5)).as("med_micro"))
    val withMed = docs.join(broadcast(med), "source")
    val mad = withMed
      .select(col("source"), abs(col("qi") - col("med_micro")).as("dev"))
      .groupBy(col("source"))
      .agg(percentile(col("dev"), lit(0.5)).as("mad_micro"))
    val out = withMed.join(broadcast(mad), "source")
      .withColumn("z", when(col("mad_micro") > 0,
        round((col("qi") - col("med_micro")) /
          (lit(1.4826) * col("mad_micro")), 6)))
      .collect()
    assert(out.length === 3)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("z"))))
  }

  test("median/MAD resists the outlier that wrecks mean/stddev") {
    // breakdown resistance: one wild score among 99 inliers barely
    // moves the robust location/scale, while it drags the mean three
    // orders of magnitude and inflates stddev ~40000x — which is why
    // the normalizer uses med/MAD (a classic z would both shrink every
    // inlier toward 0 and blunt the outlier's own score)
    val inliers = (1 to 99).map(i => 0.5 + (i % 10) * 0.001)
    def medOf(xs: Seq[Double]) = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    def madOf(xs: Seq[Double]) = medOf(xs.map(x => math.abs(x - medOf(xs))))
    val all = inliers :+ 1000.0
    assert(math.abs(medOf(all) - medOf(inliers)) < 0.001)
    assert(madOf(all) <= madOf(inliers) * 1.5)
    val meanClean = inliers.sum / inliers.length
    val meanDirty = all.sum / all.length
    assert(math.abs(meanDirty - meanClean) > 9.0) // dragged ~10.0
    // and the robust z still pins the outlier as extreme (winsorized
    // to +3 in the report) while a typical inlier stays in band
    val z = (x: Double) => (x - medOf(all)) / (1.4826 * madOf(all))
    assert(math.abs(z(0.5)) < 2.0)
    assert(z(1000.0) > 1000.0)
  }

  test("plan shape: broadcasts + aggregates, no Window stage") {
    val plan = TextQueries.qualityRobust(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(1500))
  }
}
