package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpecBase

/** Drift report: hand-computed TVD, identity/disjoint extremes, the
  * one-sided-source convention, and the KS gap on a shifted length
  * distribution. */
class DriftSpec extends SparkSpecBase {

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def run(oldR: Seq[(Long, String, String)],
      newR: Seq[(Long, String, String)]) =
    Drift.report(df(oldR), df(newR), "source", "text")
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_old"), r.getAs[Long]("n_new"),
          Option(r.getAs[java.lang.Double]("count_ratio")).map(_.doubleValue),
          r.getAs[Double]("vocab_tvd"), r.getAs[Double]("ks_len"))))
      .toMap

  test("identical snapshots: zero drift, ratio 1") {
    val rows = Seq((1L, "s", "alpha beta gamma"), (2L, "s", "delta beta"))
    val out = run(rows, rows)
    assert(out("s") == ((2L, 2L, Some(1.0), 0.0, 0.0)))
  }

  test("hand value: p=(2/3,1/3) vs q=(1/3,2/3) gives TVD 1/3") {
    val out = run(
      Seq((1L, "s", "a a b")),
      Seq((2L, "s", "a b b")))
    val (nOld, nNew, ratio, tvd, ks) = out("s")
    assert((nOld, nNew, ratio) == ((1L, 1L, Some(1.0))))
    assert(tvd == 0.333333, s"tvd $tvd")
    assert(ks == 0.0) // same length distribution
  }

  test("disjoint vocab: TVD 1; shifted lengths: KS reflects the gap") {
    val out = run(
      Seq((1L, "s", "aa bb")),          // len 5
      Seq((2L, "s", "xxx yyy zzz")))    // len 11
    val (_, _, _, tvd, ks) = out("s")
    assert(tvd == 1.0)
    assert(ks == 1.0) // CDFs never overlap: old all mass at 5, new at 11
  }

  test("one-sided source: convention 1.0/1.0, NULL ratio when no old") {
    val out = run(
      Seq((1L, "both", "w w w"), (2L, "gone", "x y")),
      Seq((3L, "both", "w w w"), (4L, "fresh", "z q")))
    assert(out("gone") == ((1L, 0L, Some(0.0), 1.0, 1.0)))
    assert(out("fresh")._3.isEmpty) // no old docs -> NULL ratio
    assert(out("fresh")._4 == 1.0 && out("fresh")._5 == 1.0)
    assert(out("both")._4 == 0.0 && out("both")._5 == 0.0)
  }
}
