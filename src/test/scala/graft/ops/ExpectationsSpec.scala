package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Expectations engine: exact violation counts per check kind on a
  * corpus with planted defects, the one-aggregation-pass plan shape,
  * null semantics (nulls are not range/regex violations), and the
  * duplicate-name guard.
  */
class ExpectationsSpec extends SparkSpecBase {

  import spark.implicits._
  import Expectations._

  private val rows = Seq(
    (Some(1L), Some("alpha"), Some(10.0)),
    (Some(2L), Some("beta"), Some(20.0)),
    (Some(2L), Some("gamma!"), Some(-5.0)), // dup id, bad regex, low
    (None, None, Some(999.0)), // null id, null text, high
    (Some(4L), Some("delta"), None)) // null value: not a range violation
    .toDF("id", "tag", "v")

  private def run(checks: Seq[Check]): Map[String, (Long, Long, Boolean)] =
    Expectations.report(rows, checks).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("exact violation counts per check kind") {
    val got = run(Seq(NotNull("id"), Unique("id"), NotNull("tag"),
      Matches("tag", "^[a-z]+$"), InRange("v", 0.0, 100.0)))
    assert(got("not_null(id)") === ((1L, 5L, false)))
    assert(got("unique(id)") === ((1L, 5L, false))) // one extra 2L
    assert(got("not_null(tag)") === ((1L, 5L, false)))
    assert(got("matches(tag)") === ((1L, 5L, false))) // gamma! only
    assert(got("in_range(v)") === ((2L, 5L, false))) // -5 and 999; null no
    val clean = run(Seq(InRange("v", -100.0, 1000.0)))
    assert(clean("in_range(v)") === ((0L, 5L, true)))
  }

  test("N checks cost one aggregate pass, not N scans") {
    val plan = Expectations.report(rows,
      Seq(NotNull("id"), NotNull("tag"), InRange("v", 0, 1),
        Matches("tag", "x"), Unique("id")))
      .queryExecution.optimizedPlan.toString
    // a single Aggregate over a single scan of the input
    assert(plan.split("Aggregate").length - 1 === 1, plan)
  }

  test("duplicate check names are rejected loudly") {
    intercept[IllegalArgumentException] {
      Expectations.report(rows, Seq(NotNull("id"), NotNull("id")))
    }
  }
}
