package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded per-group top-k: exact agreement with the window-sort
  * formulation on messy data (ties, duplicates, sub-k groups), the
  * merge-truncation law partials rely on, partitioning determinism,
  * and the two-phase (map-side partial) aggregation plan shape.
  */
class TopKSpec extends SparkSpecBase {

  import spark.implicits._

  private val rows = Seq(
    // group a: ties at 30 (ids 3 vs 1 -> smaller id first), 6 rows
    ("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 30L), ("a", 4L, 25L),
    ("a", 5L, 5L), ("a", 6L, 25L),
    // group b: fewer rows than k
    ("b", 7L, 100L), ("b", 8L, 1L),
    // group c: all equal values -> pure id ordering
    ("c", 9L, 7L), ("c", 10L, 7L), ("c", 11L, 7L), ("c", 12L, 7L))
    .toDF("g", "id", "v")

  private def run(k: Int, parts: Int = 4) =
    TopK.perGroup(rows.repartition(parts), "g", "v", "id", k)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq

  private def windowRef(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    rows.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("g"), col("rk"), col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
  }

  test("agrees with the window formulation on ties and sub-k groups") {
    (1 to 5).foreach { k =>
      assert(run(k) === windowRef(k), s"k=$k")
    }
    // ties at 30 keep the smaller id first
    assert(run(2).take(2) === Seq(("a", 1, 1L, 30L), ("a", 2, 3L, 30L)))
  }

  test("result is independent of partitioning (merge law)") {
    assert(run(3, parts = 1) === run(3, parts = 11))
    // the law itself: merging split partials equals one-shot reduce
    val agg = new TopK.TopKAggregator(3)
    val (xs, ys) = (1L to 40L).map(i => (i * 37 % 19, i)).splitAt(17)
    val one = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
    val split = agg.merge(xs.foldLeft(agg.zero)(agg.reduce),
      ys.foldLeft(agg.zero)(agg.reduce))
    assert(one.toSeq === split.toSeq)
    assert(one.length === 3)
  }

  test("rejects fractional value types and Long.MinValue values") {
    // fractional input would be silently truncated into a different
    // ranking — refused at plan time
    val frac = Seq(("a", 1L, 1.5)).toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(frac, "g", "v", "id", 2)
    }
    assert(e.getMessage.contains("integral"))
    // -Long.MinValue == Long.MinValue would break the negated-key
    // ordering — refused at run time, not mis-sorted
    val sentinel = Seq(("a", 1L, Long.MinValue), ("a", 2L, 3L))
      .toDF("g", "id", "v")
    val ex = intercept[Exception] {
      TopK.perGroup(sentinel, "g", "v", "id", 2).collect()
    }
    assert(ex.getMessage.contains("Long.MinValue") ||
      Option(ex.getCause).exists(_.getMessage.contains("Long.MinValue")),
      s"unexpected error: $ex")
  }

  test("aggregation is two-phase: partials combine map-side") {
    val plan = TopK.perGroup(rows, "g", "v", "id", 3)
      .queryExecution.executedPlan.toString
    // a partial + final ObjectHashAggregate pair, no Window anywhere
    assert(plan.split("ObjectHashAggregate").length - 1 >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }
}
