package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.model.PageRecord

/** The ordered pipeline path (range-partition pages, consecutive-group
  * chapter algebra) must produce EXACTLY the rows of the groupByKey path
  * in EXACTLY the (document_id, chapter_number, section_number) order a
  * global sort would give — with no sort above the computation. */
class OrderedPipelineSpec extends SparkSpecBase {

  private lazy val pages = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => graft.text.FixtureCorpus.pages(id, text) }
  }

  test("ordered sections equal groupByKey sections + global sort, in order") {
    val ordered = DocPipeline.pagesToSectionsOrdered(pages)
      .collect().map(_.toString).toSeq
    val viaGroup = DocPipeline.pagesToSections(pages)
      .orderBy(col("document_id"), col("chapter_number"), col("section_number"))
      .collect().map(_.toString).toSeq
    assert(ordered == viaGroup)
  }

  test("ordered chunks arrive sorted without any sort in the plan") {
    val chunks = DocPipeline.sectionsToChunks(
      DocPipeline.pagesToSectionsOrdered(pages))
    val keys = chunks.collect().map(c =>
      (c.document_id, c.chapter_number, c.section_number, c.chunk_number)).toSeq
    assert(keys == keys.sorted)
    // the only exchange is the range partition of the PAGE rows — the
    // computed section/chunk rows are never re-shuffled or re-sorted
    val plan = chunks.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.toLowerCase.contains("sortexec") ||
      plan.indexOf("Sort") < plan.indexOf("MapPartitions"), plan)
  }

  test("consecutive grouping is key-complete on a sorted iterator") {
    val rows = Seq(("a", 1), ("a", 2), ("b", 1), ("c", 1), ("c", 2), ("c", 3))
    val groups = DocPipeline.groupConsecutive(rows.iterator)(_._1).toSeq
    assert(groups.map { case (k, v) => (k, v.map(_._2)) } ==
      Seq(("a", Seq(1, 2)), ("b", Seq(1)), ("c", Seq(1, 2, 3))))
    assert(DocPipeline.groupConsecutive(Iterator.empty[PageRecord])(_.document_id).isEmpty)
  }
}
