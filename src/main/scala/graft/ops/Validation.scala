package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Validation/QA operators (SURVEY §2.8) as DataFrame reports — the
  * reference logs warnings; here every audit is a queryable table whose
  * violation counters gate the pipeline.
  */
object Validation {

  /** V1 (stage_05_csv_export.py:407-442): per-row violation list for chunk
    * frames — required fields present/non-empty, embedding dims exact. */
  def chunkViolations(chunks: DataFrame, dims: Int): DataFrame = {
    def missing(c: String): Column =
      when(col(c).isNull || col(c).cast("string") === "", lit(s"missing_$c"))
    val checks = array(
      missing("document_id"), missing("filename"),
      missing("chunk_number"), missing("chunk_content"),
      when(col("embedding").isNotNull && size(col("embedding")) =!= dims,
        lit("bad_embedding_dims")))
    chunks.withColumn("violations", filter(checks, _.isNotNull))
  }

  /** V2 (stage5_output_final_csv.py:261-313): one-row integrity report —
    * null ids, duplicate ids, multi-source. */
  def csvReport(df: DataFrame): DataFrame = {
    val dupCounts = df.groupBy(col("id")).agg(count(lit(1)).as("cnt"))
    val dups = dupCounts.agg(
      coalesce(sum(col("cnt") - 1), lit(0)).as("duplicate_ids"))
    df.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("id").isNull, 1)).as("null_ids"),
      countDistinct(col("document_source")).as("n_sources"))
      .crossJoin(dups)
      .withColumn("multi_source", col("n_sources") > 1)
  }

  /** V4 (stage_02_section_processing.py:1553-1694): page-coverage audit.
    * `pages`: (chapter_id, page_number); `sections`: (chapter_id,
    * section_number, start_page, end_page). Reports, per chapter: pages in
    * no section, section pages outside the chapter, inter-section gaps and
    * overlaps, missing page metadata. One shuffle per input on chapter_id. */
  def coverageReport(pages: DataFrame, sections: DataFrame): DataFrame = {
    val chapterPages = pages.select(col("chapter_id"), col("page_number")).distinct()
    val sectionPages = sections
      .filter(col("start_page").isNotNull && col("end_page").isNotNull &&
        col("start_page") <= col("end_page"))
      .select(col("chapter_id"),
        explode(sequence(col("start_page"), col("end_page"))).as("page_number"))
      .distinct()
    // missing AND extra from ONE full-outer join (r15): the former two
    // anti-joins each shuffled BOTH inputs and re-computed the page /
    // section-page derivations per leg — 4 input executions, 4
    // exchanges. One full outer on (chapter_id, page_number) classifies
    // every page exactly once (page-only → missing, section-only →
    // extra, both → neither), so each input executes once and the same
    // two counters fall out of one aggregate. Identical values: the
    // distinct inputs make the outer join 1:1, so row multiplicity
    // cannot differ from the anti-join form.
    val me = chapterPages.withColumn("_p", lit(1))
      .join(sectionPages.withColumn("_s", lit(1)),
        Seq("chapter_id", "page_number"), "full_outer")
      .groupBy(col("chapter_id"))
      .agg(
        count(when(col("_s").isNull, 1)).as("missing_pages"),
        count(when(col("_p").isNull, 1)).as("extra_pages"))
    val w = Window.partitionBy(col("chapter_id")).orderBy(col("section_number"))
    val continuity = sections
      .withColumn("next_start", lead(col("start_page"), 1).over(w))
      .groupBy(col("chapter_id"))
      .agg(
        count(when(col("start_page").isNull || col("end_page").isNull, 1))
          .as("sections_missing_pages"),
        count(when(col("next_start").isNotNull && col("end_page").isNotNull &&
          col("next_start") > col("end_page") + 1, 1)).as("gaps"),
        count(when(col("next_start").isNotNull && col("end_page").isNotNull &&
          col("next_start") < col("end_page"), 1)).as("overlaps"))
    continuity
      .join(me, Seq("chapter_id"), "left")
      .na.fill(0, Seq("missing_pages", "extra_pages"))
  }
}
