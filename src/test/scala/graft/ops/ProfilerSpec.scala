package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Column-profile semantics: null accounting, exact distincts, typed
  * min/max dispatch, and the loud contract on unknown columns. */
class ProfilerSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Option(2.5), Option("b"), Option(Timestamp.valueOf("2024-01-02 03:04:05"))),
    (2L, None, Option("a"), None),
    (3L, Option(7.25), None, Option(Timestamp.valueOf("2023-12-31 23:59:59"))),
    (3L, Option(2.5), Option("c"), Option(Timestamp.valueOf("2024-06-01 00:00:00"))))
    .toDF("k", "x", "s", "t")

  test("counts, nulls, distincts, typed min/max") {
    val out = Profiler.profile(df, Seq("k", "x", "s", "t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k").getLong(1) == 4 && out("k").getLong(2) == 0 &&
      out("k").getLong(3) == 3)
    assert(out("x").getLong(2) == 1 && out("x").getLong(3) == 2)
    assert(out("x").getDouble(5) == 2.5 && out("x").getDouble(6) == 7.25)
    assert(out("x").isNullAt(7) && out("x").isNullAt(8),
      "numeric column must not emit string min/max")
    assert(out("s").getString(7) == "a" && out("s").getString(8) == "c")
    assert(out("s").isNullAt(5) && out("s").isNullAt(6))
    assert(out("t").getString(7) == "2023-12-31 23:59:59" &&
      out("t").getString(8) == "2024-06-01 00:00:00")
    // tiny exact counts: the approx sketch is exact here → audit true
    assert(Seq("k", "x", "s", "t").forall(c => out(c).getBoolean(4)))
  }

  test("unknown column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Profiler.profile(df, Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
