package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The 100 TB sketch variants of the exact reports: at scale,
  * countDistinct becomes approx_count_distinct (HLL++, mergeable, no
  * giant shuffle) and percentile becomes approx_percentile (KLL-style
  * sketch). The exact forms are the oracle surface (q_corpus_vocab_
  * entropy, q_corpus_length_pctl); these specs pin that the sketch path
  * actually lands within its documented error envelope on the fixture,
  * so "swap in the sketch at scale" is a tested claim, not a comment. */
class SketchPathSpec extends SparkSpecBase {

  private def words =
    graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("word"))

  test("approx_count_distinct lands within 5% of the exact vocabulary") {
    val exact = words.agg(countDistinct(col("word"))).head.getLong(0)
    val approx = words.agg(approx_count_distinct(col("word"), 0.02))
      .head.getLong(0)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact token-length percentiles") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(size(split(col("text"), "\\s+")).cast("long").as("n"))
    val exact = toks.agg(
      percentile(col("n"), lit(0.5)).as("p50"),
      percentile(col("n"), lit(0.9)).as("p90")).head
    val approx = toks.agg(
      percentile_approx(col("n"), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col("n"), lit(0.9), lit(10000)).as("p90")).head
    // approx_percentile returns an actual data value; exact interpolates —
    // they must agree to within one value-step of the discrete column
    assert(math.abs(approx.getLong(0) - exact.getDouble(0)) <= 1.0,
      s"p50 approx=${approx.getLong(0)} exact=${exact.getDouble(0)}")
    assert(math.abs(approx.getLong(1) - exact.getDouble(1)) <= 1.0,
      s"p90 approx=${approx.getLong(1)} exact=${exact.getDouble(1)}")
  }
}
