package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** SnapshotDiff semantics: added/removed/changed classification,
  * unchanged suppression, null-vs-string discrimination, and the
  * mismatched-schema guard. The registered q_refresh_diff adds the
  * cross-engine check (DuckDB recomputes both hashes byte-identically).
  */
class SnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  private def classes(old: org.apache.spark.sql.DataFrame,
      nw: org.apache.spark.sql.DataFrame): Map[Long, String] =
    SnapshotDiff.diff(old, nw, "id")
      .select(col("id"), col("change_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("classifies added, removed, changed; suppresses unchanged") {
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "p1", "p2")
    val nw = Seq((2L, "b", "y"), (3L, "c", "w"), (4L, "d", "v"))
      .toDF("id", "p1", "p2")
    assert(classes(old, nw) ===
      Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("identical snapshots diff to zero rows") {
    val s = Seq((1L, "a"), (2L, "b")).toDF("id", "p")
    assert(SnapshotDiff.diff(s, s, "id").count() === 0L)
  }

  test("NULL payload is distinct from the string rendering of null") {
    val old = Seq((1L, Option.empty[String], "k"),
      (2L, Option.empty[String], "k")).toDF("id", "p1", "p2")
    val nw = Seq((1L, Some("null"), "k"),
      (2L, Option.empty[String], "k")).toDF("id", "p1", "p2")
    // id 1: NULL -> "null" must read as changed; id 2: NULL == NULL
    assert(classes(old, nw) === Map(1L -> "changed"))
  }

  test("separator cannot be confused by adjacent column content") {
    // ("ab","c") vs ("a","bc") — equal under naive concat, different rows
    val old = Seq((1L, "ab", "c")).toDF("id", "p1", "p2")
    val nw = Seq((1L, "a", "bc")).toDF("id", "p1", "p2")
    assert(classes(old, nw) === Map(1L -> "changed"))
  }

  test("a NULL key matches itself null-safely, never removed+added") {
    // r12 ADVICE: plain-equality join double-reported a both-sides NULL
    // key; the <=> join compares its content like any other key
    val old = Seq((Some(1L), "a"), (Option.empty[Long], "x"))
      .toDF("id", "p")
    val same = Seq((Some(1L), "a"), (Option.empty[Long], "x"))
      .toDF("id", "p")
    assert(SnapshotDiff.diff(old, same, "id").count() === 0L)
    val changed = Seq((Some(1L), "a"), (Option.empty[Long], "y"))
      .toDF("id", "p")
    val out = SnapshotDiff.diff(old, changed, "id")
      .select(col("id"), col("change_type")).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(0) && out.head.getString(1) === "changed")
  }

  test("mismatched payload schemas are rejected loudly") {
    val old = Seq((1L, "a")).toDF("id", "p1")
    val nw = Seq((1L, "a")).toDF("id", "other")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, nw, "id")
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("diffCounts tallies each class") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e"))
      .toDF("id", "p")
    val nw = Seq((2L, "B"), (3L, "c"), (4L, "d"), (5L, "E"))
      .toDF("id", "p")
    val m = SnapshotDiff.diffCounts(old, nw, "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L))
  }
}
