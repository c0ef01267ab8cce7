package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IncrementalAgg algebra: merge(state(A), state(B), …) must equal
  * state(A ∪ B ∪ …) for ANY split — the property that lets a daily
  * refresh aggregate only the delta. The registered q_agg_incremental
  * adds the cross-engine leg (Spark merges three time slices, DuckDB
  * aggregates directly). */
class IncrementalAggSpec extends SparkSpecBase {

  private def fixture: DataFrame =
    graft.Tables.events(spark, sfDir).select(col("event_type"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def direct: DataFrame =
    IncrementalAgg.report(
      IncrementalAgg.state(fixture, "event_type", "cents"), "event_type")

  test("2-way split merge equals the direct aggregate") {
    val e = fixture
    val parts = Seq(e.filter(col("cents") % 2 === 0),
      e.filter(col("cents") % 2 =!= 0))
      .map(IncrementalAgg.state(_, "event_type", "cents"))
    val merged = IncrementalAgg.report(
      IncrementalAgg.merge("event_type", parts), "event_type")
    assert(rows(merged) === rows(direct))
  }

  test("3-way uneven split merge equals the direct aggregate") {
    val e = fixture
    val parts = Seq(
      e.filter(col("cents") % 7 === 0),
      e.filter(col("cents") % 7 === 1),
      e.filter(col("cents") % 7 >= 2))
      .map(IncrementalAgg.state(_, "event_type", "cents"))
    val merged = IncrementalAgg.report(
      IncrementalAgg.merge("event_type", parts), "event_type")
    assert(rows(merged) === rows(direct))
  }

  test("merge is order-insensitive") {
    val e = fixture
    val a = IncrementalAgg.state(e.filter(col("cents") < 5000),
      "event_type", "cents")
    val b = IncrementalAgg.state(e.filter(col("cents") >= 5000),
      "event_type", "cents")
    assert(rows(IncrementalAgg.merge("event_type", Seq(a, b))) ===
      rows(IncrementalAgg.merge("event_type", Seq(b, a))))
  }

  test("an empty delta is the identity") {
    import spark.implicits._
    val e = fixture
    val empty = IncrementalAgg.state(
      e.filter(lit(false)), "event_type", "cents")
    val merged = IncrementalAgg.report(
      IncrementalAgg.merge("event_type",
        Seq(IncrementalAgg.state(e, "event_type", "cents"), empty)),
      "event_type")
    assert(rows(merged) === rows(direct))
  }

  test("a nullable measure computes moments over the non-null population") {
    // r12 ADVICE: n was COUNT(*) while s/ss/min/max skipped NULLs,
    // diluting mean and variance; n must be count(valueCol)
    import spark.implicits._
    val t = Seq(("a", Some(1L)), ("a", Option.empty[Long]), ("a", Some(3L)))
      .toDF("g", "v")
    val r = IncrementalAgg.report(
      IncrementalAgg.state(t, "g", "v"), "g").collect().head
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Long]("s") === 4L)
    assert(r.getAs[String]("ss") === "10")
    assert(r.getAs[Double]("mean") === 2.0)
    assert(r.getAs[Double]("variance") === 1.0)
  }

  test("report stats match hand math on a tiny group") {
    import spark.implicits._
    val t = Seq(("a", 1L), ("a", 3L), ("a", 5L)).toDF("g", "v")
    val r = IncrementalAgg.report(
      IncrementalAgg.state(t, "g", "v"), "g").collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("s") === 9L)
    assert(r.getAs[String]("ss") === "35")
    assert(r.getAs[Long]("min_v") === 1L)
    assert(r.getAs[Long]("max_v") === 5L)
    assert(r.getAs[Double]("mean") === 3.0)
    // E[x²] − E[x]² = 35/3 − 9 = 2.666667
    assert(r.getAs[Double]("variance") === 2.666667)
  }
}
