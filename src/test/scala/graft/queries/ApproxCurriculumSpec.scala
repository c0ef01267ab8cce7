package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The approx-percentile curriculum leg: at fixture scale the GK sketch's
  * accuracy parameter (10000) exceeds n, so Spark's approx cut points sit
  * within one inter-element gap of the interpolated exact percentiles
  * (GK returns a real element; `percentile` interpolates) and the phase
  * drift they induce is a handful of boundary docs — far inside every
  * tolerance band. (The registered q_corpus_curriculum_approx adds the
  * DuckDB cross-engine check, holding the t-digest leg to the same
  * bands.) */
class ApproxCurriculumSpec extends SparkSpecBase {

  test("fixture-scale approx leg: all tolerance bands green, quartiles sane") {
    val out = CorpusQueries.curriculumApprox(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 4)
    out.foreach { r =>
      assert(r.getAs[Boolean]("phase_count_ok"), s"count band: $r")
      assert(r.getAs[Boolean]("moved_ok"), s"moved band: $r")
      assert(r.getAs[Boolean]("cuts_ok"), s"cut band: $r")
    }
    // quartile phases: counts sum to the corpus and each is ~n/4
    val n = out.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.Tables.documents(spark, sfDir).count()
    assert(n === docs)
    out.foreach { r =>
      val c = r.getAs[Long]("n_docs")
      assert(c >= docs / 8 && c <= docs * 3 / 8,
        s"phase ${r.getAs[Long]("phase")} count $c far from n/4 of $docs")
    }
  }

  test("accuracy > n makes the approx phase assignment exactly the exact one") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        round(graft.ops.TextAnalysis.qualityScore(col("text")), 6)
          .as("quality"))
    val th = docs.agg(
      round(percentile(col("quality"), lit(0.75)), 6).as("e75"),
      round(percentile_approx(col("quality"), lit(0.75), lit(10000)), 6)
        .as("a75"),
      round(percentile(col("quality"), lit(0.25)), 6).as("e25"),
      round(percentile_approx(col("quality"), lit(0.25), lit(10000)), 6)
        .as("a25")).head()
    // GK with accuracy >> n returns an element at the exact rank bound:
    // the cut points may differ from the interpolated exact percentile,
    // but by less than one inter-element gap — bound the drift tightly
    assert(math.abs(th.getAs[Double]("a75") - th.getAs[Double]("e75")) <= 0.01)
    assert(math.abs(th.getAs[Double]("a25") - th.getAs[Double]("e25")) <= 0.01)
  }
}
