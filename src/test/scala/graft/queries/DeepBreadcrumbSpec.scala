package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The W12 deep-breadcrumb gate's FIXTURE-FAMILY claim (r12 VERDICT #3):
  * the synthesized heading stream must actually exercise deep stacks and
  * truncation — otherwise the oracle-backed query degenerates to the same
  * shallow coverage the documents fixture's period-3 cycle gave. The
  * breadcrumb VALUES are cross-engine-checked by the DuckDB mirror; this
  * spec pins the structural properties of the stream itself.
  */
class DeepBreadcrumbSpec extends SparkSpecBase {

  private lazy val out =
    TextQueries.deepBreadcrumbs(spark, sfDir).cache()

  private def depth = size(split(col("breadcrumb"), " > "))

  test("the synthesized stream reaches >= 4-deep breadcrumbs") {
    val maxDepth = out.agg(max(depth)).head().getInt(0)
    assert(maxDepth >= 4,
      s"max breadcrumb depth $maxDepth — the fixture family went shallow")
  }

  test("truncation happens: some deep section is followed by a shallower one") {
    // a group where level drops by >= 2 between adjacent sections forces
    // the stack to truncate more than one entry at once
    import spark.implicits._
    val drops = out.select(col("grp"), col("seq"), col("level"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3).toSeq)
      .flatMap(ls => ls.zip(ls.tail).map { case (a, b) => a - b })
    assert(drops.exists(_ >= 2), "no multi-entry truncation in the stream")
  }

  test("level skips leave holes: some breadcrumb is shallower than its level") {
    // a section at level L whose running map misses an intermediate
    // level joins fewer than L parts — the flatMap-skip branch
    val holes = out.filter(depth < col("level")).count()
    assert(holes > 0, "every breadcrumb was dense — the skip branch is dead")
  }

  test("own title is always the last breadcrumb element") {
    assert(out.filter(
      element_at(split(col("breadcrumb"), " > "), -1) =!= col("title"))
      .count() === 0L)
  }
}
