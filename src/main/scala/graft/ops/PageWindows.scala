package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-shaped page-inference operators (SURVEY §2.5).
  *
  * The reference computes section/chunk page bounds with multi-pass Python
  * loops; here each pass is a closed-form window expression over
  * `Window.partitionBy(chapter).orderBy(section)` — one shuffle on the
  * chapter key serves every pass, and all expressions stay inside
  * whole-stage codegen.
  *
  * Expected columns: `chapter_id`, `section_number` (dense order key),
  * `start_page`, `end_page` (nullable ints).
  */
object PageWindows {

  private def w = Window.partitionBy(col("chapter_id")).orderBy(col("section_number"))

  /** W2 (stage_02_section_processing.py:694-811): fill a section's missing
    * bounds from neighbors — previous known end page and next known start
    * page, scanning past adjacent nulls (hence ignoreNulls over unbounded
    * frames, not lag/lead 1).
    */
  def neighborFill(sections: DataFrame): DataFrame = {
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    sections
      .withColumn("prev_end", last(col("end_page"), ignoreNulls = true).over(before))
      .withColumn("next_start", first(col("start_page"), ignoreNulls = true).over(after))
      .withColumn("start_filled",
        coalesce(col("start_page"),
          col("prev_end") + lit(1),
          col("next_start")))
      .withColumn("end_filled",
        coalesce(col("end_page"),
          col("next_start") - lit(1),
          col("start_filled")))
  }

  /** W6 (stage_02b_section_page_correction.py:670-720): detect gaps
    * (`next_start > end+1`) and overlaps (`next_start < end`, wait-free
    * clamp `end = next_start - 1`) against the following section.
    */
  def continuityFix(sections: DataFrame): DataFrame =
    sections
      .withColumn("next_start", lead(col("start_page"), 1).over(w))
      .withColumn("has_gap",
        col("next_start").isNotNull && col("next_start") > col("end_page") + lit(1))
      .withColumn("has_overlap",
        col("next_start").isNotNull && col("next_start") < col("end_page"))
      .withColumn("end_fixed",
        when(col("has_overlap"), col("next_start") - lit(1))
          .otherwise(col("end_page")))

  /** W9 (stage_03b_chunk_page_correction.py:634-667): distribute a section's
    * page range [a,b] proportionally across its n chunks — chunk j (0-based)
    * spans `a + j*(b-a+1) div n` .. `a + (j+1)*(b-a+1) div n - 1`, last chunk
    * pinned to b. Pure integer arithmetic on row_number/count — no
    * iteration.
    *
    * Expected columns: `section_id`, `chunk_number` (order key), `a`, `b`.
    */
  def proportionalDistribute(chunks: DataFrame): DataFrame = {
    val ws = Window.partitionBy(col("section_id")).orderBy(col("chunk_number"))
    val wsAll = Window.partitionBy(col("section_id"))
    chunks
      .withColumn("j", row_number().over(ws) - lit(1))
      .withColumn("n", count(lit(1)).over(wsAll))
      .withColumn("span", col("b") - col("a") + lit(1))
      .withColumn("chunk_start", col("a") + expr("(j * span) div n"))
      .withColumn("chunk_end",
        when(col("j") === col("n") - lit(1), col("b"))
          .otherwise(col("a") + expr("((j + 1) * span) div n") - lit(1)))
      .drop("j", "n", "span")
  }
}
