package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** kmvOverlapMatrix: estimates agree with the pairwise kmvOverlap
  * operator on the same inputs, zero-overlap pairs report zero,
  * below-k groups estimate exactly, and NULL hashes never create
  * phantom overlap. */
class KmvOverlapMatrixSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 16

  private def hv(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  test("below-k sketches make every estimate exact") {
    // g1 = {0..9}, g2 = {5..14}, g3 = {100..104} — all under k = 16
    val df = ((0 to 9).map(i => ("g1", i)) ++
      (5 to 14).map(i => ("g2", i)) ++
      (100 to 104).map(i => ("g3", i)))
      .toDF("g", "v").select(col("g"), hv(col("v")).as("hv"))
    val m = Sketches.kmvOverlapMatrix(df, "g", "hv", K)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // (u_size, n_both, est_union, est_inter)
    assert(m(("g1", "g2")) === ((15L, 5L, 15.0, 5.0)))
    assert(m(("g1", "g3")) === ((15L, 0L, 15.0, 0.0)))
    assert(m(("g2", "g3")) === ((15L, 0L, 15.0, 0.0)))
  }

  test("matrix pair estimates equal the pairwise kmvOverlap operator") {
    val a = (0 until 400).map(i => ("a", i))
    val b = (200 until 600).map(i => ("b", i))
    val raw = (a ++ b).toDF("g", "v")
    // matrix takes the precomputed portable hash; kmvOverlap hashes its
    // key column internally — same md5 surface either way
    val df = raw.select(col("g"), hv(col("v")).as("hv"))
    val matrix = Sketches.kmvOverlapMatrix(df, "g", "hv", K)
      .collect().head
    val pair = Sketches.kmvOverlap(
      raw.filter(col("g") === "a"), "v",
      raw.filter(col("g") === "b"), "v", K)
      .collect().head
    // est_inter (matrix col 5) vs est_overlap (pairwise col 2)
    assert(matrix.getDouble(5) === pair.getDouble(2))
  }

  test("NULL hashes are dropped, never a shared phantom key") {
    val df = Seq(("a", Some(1L)), ("a", None), ("b", Some(2L)), ("b", None))
      .toDF("g", "hv")
    val m = Sketches.kmvOverlapMatrix(df, "g", "hv", K).collect().head
    assert(m.getLong(3) === 0L) // n_both
    assert(m.getDouble(5) === 0.0) // est_inter
  }
}
