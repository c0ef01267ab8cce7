package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.PageWindows

/** Ordered grouping (SURVEY §2.4) and window inference (§2.5) queries.
  *
  * The per-chapter engine: groups sorted within the group key, ordered
  * concatenation, first-of-group metadata, per-chapter renumbering, and the
  * neighbor-fill / continuity / proportional-distribution window passes —
  * all on section/chunk-shaped projections derived deterministically from
  * orders/lineitem so DuckDB rebuilds identical inputs.
  */
object GroupWindowQueries extends QueryModule {

  /** G1+G5+G7: group by key, order by line number inside the group, concat
    * content, count/min/max — one shuffle, all inside HashAggregate. */
  def orderedConcat(spark: SparkSession, dir: String): DataFrame =
    // Ordered-pipeline shape (guide §2.4, the pagesToSectionsOrdered
    // convention): range-partition the CHEAP input rows on the group key
    // — RangePartitioning satisfies the aggregate's ClusteredDistribution,
    // so the groupBy adds NO second exchange — and sort the aggregated
    // rows within partitions. Output is globally ordered by construction
    // (ordered range partitions + in-partition sort over the unique key).
    // The former `orderBy` AFTER the aggregate planned a second (range)
    // exchange whose bounds sampling re-executed the whole concat
    // aggregate: 2 exchanges + 2 aggregate executions → 1 + 1.
    Tables.lineitem(spark, dir)
      .repartitionByRange(col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("l_linenumber"),
              concat(lit("p"), col("l_partkey")).as("part")))),
            x => x.getField("part")),
          ",").as("content"),
        count(lit(1)).as("n_items"),
        min(col("l_linenumber")).as("min_line"),
        max(col("l_linenumber")).as("max_line"))
      .sortWithinPartitions(col("l_orderkey"))

  /** G10: first-row-of-group metadata extraction via row_number()==1. */
  def firstOfGroup(spark: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // tiebreak on every output column so the chosen row is deterministic.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_quantity"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_partkey").as("first_part"),
        col("l_quantity").as("first_qty"))
      .orderBy(col("l_orderkey"))
  }

  /** T16: per-chapter page renumbering with a stable composite sort. */
  def renumber(spark: SparkSession, dir: String): DataFrame = {
    // Ordered-pipeline shape (see orderedConcat): range-partition the
    // input on the window key — satisfies the window's clustering, so
    // one exchange serves both the window and the output order — and
    // sort within partitions on the OUTPUT key. The former global
    // orderBy planned a second exchange that re-executed the window for
    // bounds sampling. page_number is the row_number in the window's own
    // sort order, so the final in-partition sort is over already-ordered
    // rows (one cheap pass, kept because the planner cannot prove the
    // rank ≡ sort-key equivalence).
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .repartitionByRange(col("l_suppkey"))
      .withColumn("page_number", row_number().over(w))
      .select(col("l_suppkey").as("chapter_id"), col("l_orderkey"),
        col("l_linenumber").as("source_page_number"), col("page_number"))
      .sortWithinPartitions(col("chapter_id"), col("page_number"))
  }

  /** Section-shaped projection of orders with deterministic null page
    * bounds (every 3rd start, every 4th end missing).
    *
    * The rename to `chapter_id` happens BEFORE the numbering window:
    * aliasing the partition key downstream of the exchange severs
    * partitioning propagation (the planner can't see through a dropped
    * source column), which forced the neighbor-fill/continuity windows —
    * partitioned by the same key — to re-shuffle. With the alias first,
    * both window stages share one hash exchange. */
  private def sections(spark: SparkSession, dir: String): DataFrame = {
    // range-partitioned on the chapter key (the orderedConcat shape):
    // RangePartitioning satisfies every downstream window's clustering,
    // so the numbering window, the neighbor-fill/continuity windows AND
    // the consumers' (chapter_id, section_number) output order all ride
    // ONE exchange — the former final orderBy added a second (range)
    // exchange whose bounds sampling re-executed the window chain.
    val base = Tables.orders(spark, dir).select(
      col("o_custkey").as("chapter_id"), col("o_orderkey").as("ord"))
      .repartitionByRange(col("chapter_id"))
    val w = Window.partitionBy(col("chapter_id")).orderBy(col("ord"))
    def page(mod: Int, extra: Column): Column =
      when(col("ord") % mod === 0, lit(null).cast("long"))
        .otherwise(col("ord") % 40 + lit(1) + extra)
    base.select(
      col("chapter_id"),
      row_number().over(w).as("section_number"),
      page(3, lit(0)).as("start_page"),
      page(4, col("ord") % 5).as("end_page"))
  }

  /** W2: neighbor fill over nullable bounds. */
  def neighborFill(spark: SparkSession, dir: String): DataFrame =
    PageWindows.neighborFill(sections(spark, dir))
      .select("chapter_id", "section_number", "start_page", "end_page",
        "prev_end", "next_start", "start_filled", "end_filled")
      .sortWithinPartitions(col("chapter_id"), col("section_number"))

  /** W6: gap/overlap detection + clamp. */
  def continuity(spark: SparkSession, dir: String): DataFrame =
    PageWindows.continuityFix(sections(spark, dir))
      .select("chapter_id", "section_number", "start_page", "end_page",
        "next_start", "has_gap", "has_overlap", "end_fixed")
      .sortWithinPartitions(col("chapter_id"), col("section_number"))

  /** W9: proportional page distribution across a section's chunks. */
  def proportional(spark: SparkSession, dir: String): DataFrame = {
    // range-partitioned on the section key (the orderedConcat shape):
    // one exchange serves the distribution windows and the output order
    val chunks = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("section_id"),
      col("l_linenumber").as("chunk_number"),
      (col("l_orderkey") % 20 + lit(1)).as("a"),
      (col("l_orderkey") % 20 + lit(1) + col("l_orderkey") % 7 + lit(2)).as("b"))
      .repartitionByRange(col("section_id"))
    PageWindows.proportionalDistribute(chunks)
      .select("section_id", "chunk_number", "a", "b", "chunk_start", "chunk_end")
      .sortWithinPartitions(col("section_id"), col("chunk_number"))
  }

  /** W2-as-streaming-analogue: forward fill nulls in an event stream. */
  def eventsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("v",
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("value")))
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("v"), col("filled"))
      .orderBy(col("event_id"))
  }

  /** Bounded-state per-group top-k (TopK.TopKAggregator): the 3
    * longest documents per source by whitespace token count, ties to
    * the smaller doc_id — NO window, no per-group sort: each partial
    * carries at most 3 pairs, so a giant group cannot funnel the
    * corpus tail through one task. The mirror is the plain ROW_NUMBER
    * formulation — an independent method, so agreement checks the
    * aggregator's semantics, not its mechanics. */
  def groupTopK(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TopK.perGroup(
      Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("n_toks")),
      "source", "n_toks", "doc_id", k = 3)
      .orderBy(col("source"), col("rk"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_group_topk" -> groupTopK,
    "q_group_ordered_concat" -> orderedConcat,
    "q_group_first_meta" -> firstOfGroup,
    "q_group_renumber" -> renumber,
    "q_window_neighbor_fill" -> neighborFill,
    "q_window_continuity" -> continuity,
    "q_window_proportional" -> proportional,
    "q_events_gapfill" -> eventsGapfill)

  private val sectionsCte: String =
    """WITH sections AS (
      |  SELECT o_custkey AS chapter_id,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS section_number,
      |         CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |              ELSE (o_orderkey % 40) + 1 END AS start_page,
      |         CASE WHEN o_orderkey % 4 = 0 THEN NULL
      |              ELSE (o_orderkey % 40) + 1 + (o_orderkey % 5) END AS end_page
      |  FROM orders
      |)""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q_group_topk" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |rk AS (
        |  SELECT source, doc_id, n_toks,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_toks DESC, doc_id) AS INTEGER) AS rk
        |  FROM t)
        |SELECT source, rk, doc_id, n_toks FROM rk
        |WHERE rk <= 3 ORDER BY source, rk""".stripMargin,
    "q_group_ordered_concat" ->
      """SELECT l_orderkey,
        |  string_agg('p' || l_partkey, ',' ORDER BY l_linenumber, 'p' || l_partkey) AS content,
        |  COUNT(*) AS n_items,
        |  MIN(l_linenumber) AS min_line,
        |  MAX(l_linenumber) AS max_line
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_group_first_meta" ->
      """SELECT l_orderkey, first_part, first_qty FROM (
        |  SELECT l_orderkey, l_partkey AS first_part, l_quantity AS first_qty,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
        |  FROM lineitem) t WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q_group_renumber" ->
      """SELECT l_suppkey AS chapter_id, l_orderkey,
        |  l_linenumber AS source_page_number,
        |  ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS page_number
        |FROM lineitem ORDER BY chapter_id, page_number""".stripMargin,
    "q_window_neighbor_fill" -> (sectionsCte +
      """, filled AS (
        |  SELECT chapter_id, section_number, start_page, end_page,
        |    LAST_VALUE(end_page IGNORE NULLS) OVER (PARTITION BY chapter_id
        |      ORDER BY section_number
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end,
        |    FIRST_VALUE(start_page IGNORE NULLS) OVER (PARTITION BY chapter_id
        |      ORDER BY section_number
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_start
        |  FROM sections)
        |SELECT chapter_id, section_number, start_page, end_page, prev_end, next_start,
        |  COALESCE(start_page, prev_end + 1, next_start) AS start_filled,
        |  COALESCE(end_page, next_start - 1,
        |    COALESCE(start_page, prev_end + 1, next_start)) AS end_filled
        |FROM filled ORDER BY chapter_id, section_number""".stripMargin),
    "q_window_continuity" -> (sectionsCte +
      """, led AS (
        |  SELECT chapter_id, section_number, start_page, end_page,
        |    LEAD(start_page, 1) OVER (PARTITION BY chapter_id
        |      ORDER BY section_number) AS next_start
        |  FROM sections)
        |SELECT chapter_id, section_number, start_page, end_page, next_start,
        |  next_start IS NOT NULL AND next_start > end_page + 1 AS has_gap,
        |  next_start IS NOT NULL AND next_start < end_page AS has_overlap,
        |  CASE WHEN next_start IS NOT NULL AND next_start < end_page
        |       THEN next_start - 1 ELSE end_page END AS end_fixed
        |FROM led ORDER BY chapter_id, section_number""".stripMargin),
    "q_window_proportional" ->
      """WITH chunks AS (
        |  SELECT l_orderkey AS section_id, l_linenumber AS chunk_number,
        |         (l_orderkey % 20) + 1 AS a,
        |         (l_orderkey % 20) + 1 + (l_orderkey % 7) + 2 AS b
        |  FROM lineitem
        |), numbered AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY section_id ORDER BY chunk_number) - 1 AS j,
        |    COUNT(*) OVER (PARTITION BY section_id) AS n,
        |    b - a + 1 AS span
        |  FROM chunks)
        |SELECT section_id, chunk_number, a, b,
        |  a + (j * span) // n AS chunk_start,
        |  CASE WHEN j = n - 1 THEN b
        |       ELSE a + ((j + 1) * span) // n - 1 END AS chunk_end
        |FROM numbered ORDER BY section_id, chunk_number""".stripMargin,
    "q_events_gapfill" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v,
        |  LAST_VALUE(CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin)
}
