package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Skew

/** Remaining SURVEY §2 relational operators, each oracle-checked:
  * P6 (first-N-chapters semi-join limit), J8 (checkpoint anti-join),
  * J9 (broadcast metadata lookup), T14 (IASB filename parse),
  * G16 (priority grouping), T15 (chapter assignment by page interval —
  * a range join), G12/G14 (stats reports), G15 (content hash).
  */
object CoverageQueries extends QueryModule {

  /** P6: keep ALL rows of the first 5 chapter keys — a semi-join limit,
    * not limit() (stage_03_content_chunking.py:337-350). */
  def sampleChapters(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val firstKeys = li.select(col("l_suppkey")).distinct()
      .orderBy(col("l_suppkey")).limit(5)
    li.join(broadcast(firstKeys), Seq("l_suppkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("l_suppkey"))
  }

  /** J8: skip inputs already processed — anti-join on the checkpoint set
    * (orders with status 'F' stand in for done keys). */
  def checkpointAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val done = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    Tables.lineitem(spark, dir)
      .join(done, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_remaining"))
      .orderBy(col("l_returnflag"))
  }

  /** J9: broadcast lookup join — supplier metadata onto lineitem. */
  def metadataLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("s_nationkey"))

  /** Synthetic IASB-style filenames from part (T14 shape:
    * `[B-|C-]std-number-name.pdf`, stage_00_pdf_merger.py:228-262). */
  private def files(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      concat(
        element_at(array(lit(""), lit("B-"), lit("C-")), (col("p_partkey") % 3 + 1).cast("int")),
        lit("ias-"), (col("p_partkey") % 42).cast("string"), lit("-"),
        regexp_replace(lower(col("p_name")), " ", "_"), lit(".pdf")).as("file_name"),
      col("p_partkey"))

  private val fnRe = "^(B-|C-)?([a-z]+)-(\\d+)-(.+)\\.pdf$"

  /** T14: regex parse into prefix/standard/number/name/base_key. */
  def filenameParse(spark: SparkSession, dir: String): DataFrame =
    files(spark, dir).select(
      col("p_partkey"), col("file_name"),
      regexp_extract(col("file_name"), fnRe, 1).as("prefix"),
      regexp_extract(col("file_name"), fnRe, 2).as("standard"),
      regexp_extract(col("file_name"), fnRe, 3).cast("int").as("number"),
      regexp_extract(col("file_name"), fnRe, 4).as("doc_name"),
      concat(regexp_extract(col("file_name"), fnRe, 2), lit("-"),
        regexp_extract(col("file_name"), fnRe, 3)).as("base_key"))
      .orderBy(col("p_partkey"))

  /** G16: group by parsed (standard, number), pick the top-priority file
    * ('' < B- < C-), count the group (stage_00_pdf_merger.py:264-300). */
  def priorityGroup(spark: SparkSession, dir: String): DataFrame = {
    val parsed = filenameParse(spark, dir)
    val w = Window.partitionBy(col("standard"), col("number"))
      .orderBy(col("prefix"), col("file_name"))
    parsed
      .withColumn("rk", row_number().over(w))
      .withColumn("n_files", count(lit(1)).over(
        Window.partitionBy(col("standard"), col("number"))))
      .filter(col("rk") === 1)
      .select(col("standard"), col("number"), col("file_name").as("primary_file"),
        col("prefix").as("primary_prefix"), col("n_files"))
      .orderBy(col("standard"), col("number"))
  }

  /** T15: chapter assignment by page interval — range join of pages into
    * [start,end] chapter definitions (chapter_splitter.py:1334-1400).
    * Unassigned pages keep a null chapter (P2 path). */
  def chapterAssign(spark: SparkSession, dir: String): DataFrame = {
    val chapters = Tables.nation(spark, dir).select(
      col("n_nationkey").as("chapter_number"),
      (col("n_nationkey") * 40 + 1).as("start_page"),
      (col("n_nationkey") * 40 + 35).as("end_page")) // pages 36..40 of each block unassigned
    val pages = Tables.lineitem(spark, dir)
      .select((col("l_orderkey") % 1000).as("page_number")).distinct()
    pages.join(broadcast(chapters),
        col("page_number").between(col("start_page"), col("end_page")), "left")
      .select(col("page_number"), col("chapter_number"))
      .orderBy(col("page_number"))
  }

  /** G12/G14: distribution stats — per-group counts then avg/max + a
    * value_counts histogram (stage_03:620-630, stage5:510-535). */
  def groupStats(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_chunks"))
    perOrder.agg(
      count(lit(1)).as("n_groups"),
      round(avg(col("n_chunks")), 6).as("avg_chunks"),
      max(col("n_chunks")).as("max_chunks"),
      count(when(col("n_chunks") === 1, 1)).as("single_chunk_groups"))
  }

  /** Skew battery: a synthetically skewed key (80% of rows collapse onto
    * key 0) joined via Skew.saltedJoin and aggregated via Skew.saltedSum.
    * The oracle is the PLAIN join/aggregation — salting must be
    * semantically invisible. */
  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(spark, dir).select(
      when(col("l_suppkey") % 10 < 8, lit(0L)).otherwise(col("l_suppkey"))
        .as("hot_key"),
      col("l_quantity").cast("decimal(18,2)").as("qty"))
    val dim = fact.select(col("hot_key")).distinct()
      .withColumn("label", concat(lit("k"), col("hot_key")))
    Skew.saltedJoin(fact, dim, "hot_key", salts = 8)
      .groupBy(col("hot_key"), col("label"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("qty")).cast("double").as("sum_qty"))
      .orderBy(col("hot_key"))
  }

  def skewSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(spark, dir).select(
      when(col("l_suppkey") % 10 < 8, lit(0L)).otherwise(col("l_suppkey"))
        .as("hot_key"),
      col("l_quantity").cast("decimal(18,2)").as("qty"))
    Skew.saltedSum(fact, "hot_key", "qty", salts = 8)
      .withColumn("sum_qty", col("sum_qty").cast("double"))
      .orderBy(col("hot_key"))
  }

  /** G15: whole-table content hash — per-row md5 over a canonical string,
    * aggregated order-independently (sum of h32). The reference hashes a
    * JSON dump (order-sensitive); at scale the order-free sum is the
    * correct distributed formulation and is what both engines compute. */
  def tableHash(spark: SparkSession, dir: String): DataFrame = {
    val rowStr = concat_ws("|",
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_linestatus"),
      date_format(col("l_shipdate"), "yyyy-MM-dd"))
    Tables.lineitem(spark, dir)
      .select(conv(substring(md5(rowStr), 1, 8), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("content_hash"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_chapters" -> sampleChapters,
    "q_checkpoint_antijoin" -> checkpointAntiJoin,
    "q_metadata_lookup" -> metadataLookup,
    "q_filename_parse" -> filenameParse,
    "q_priority_group" -> priorityGroup,
    "q_chapter_assign" -> chapterAssign,
    "q_group_stats" -> groupStats,
    "q_skew_salted_join" -> skewSaltedJoin,
    "q_skew_salted_agg" -> skewSaltedAgg,
    "q_table_hash" -> tableHash)

  private val filesCte =
    """WITH files AS (
      |  SELECT p_partkey,
      |    ['', 'B-', 'C-'][CAST(p_partkey % 3 AS INTEGER) + 1]
      |      || 'ias-' || CAST(p_partkey % 42 AS VARCHAR) || '-'
      |      || replace(lower(p_name), ' ', '_') || '.pdf' AS file_name
      |  FROM part
      |), parsed AS (
      |  SELECT p_partkey, file_name,
      |    regexp_extract(file_name, '^(B-|C-)?([a-z]+)-(\d+)-(.+)\.pdf$', 1) AS prefix,
      |    regexp_extract(file_name, '^(B-|C-)?([a-z]+)-(\d+)-(.+)\.pdf$', 2) AS standard,
      |    CAST(regexp_extract(file_name, '^(B-|C-)?([a-z]+)-(\d+)-(.+)\.pdf$', 3) AS INTEGER) AS number,
      |    regexp_extract(file_name, '^(B-|C-)?([a-z]+)-(\d+)-(.+)\.pdf$', 4) AS doc_name
      |  FROM files
      |)""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q_sample_chapters" ->
      """SELECT l_suppkey, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_suppkey IN (
        |  SELECT DISTINCT l_suppkey FROM lineitem ORDER BY l_suppkey LIMIT 5)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_checkpoint_antijoin" ->
      """SELECT l_returnflag, COUNT(*) AS n_remaining
        |FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderstatus = 'F' AND o_orderkey = l_orderkey)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_metadata_lookup" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        |  COUNT(DISTINCT s_suppkey) AS n_suppliers
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_filename_parse" -> (filesCte +
      """
        |SELECT p_partkey, file_name, prefix, standard, number, doc_name,
        |  standard || '-' || CAST(number AS VARCHAR) AS base_key
        |FROM parsed ORDER BY p_partkey""".stripMargin),
    "q_priority_group" -> (filesCte +
      """, ranked AS (
        |  SELECT standard, number, file_name, prefix,
        |    ROW_NUMBER() OVER (PARTITION BY standard, number
        |      ORDER BY prefix, file_name) AS rk,
        |    COUNT(*) OVER (PARTITION BY standard, number) AS n_files
        |  FROM parsed)
        |SELECT standard, number, file_name AS primary_file,
        |  prefix AS primary_prefix, n_files
        |FROM ranked WHERE rk = 1 ORDER BY standard, number""".stripMargin),
    "q_chapter_assign" ->
      """WITH chapters AS (
        |  SELECT n_nationkey AS chapter_number,
        |    n_nationkey * 40 + 1 AS start_page,
        |    n_nationkey * 40 + 35 AS end_page
        |  FROM nation),
        |pages AS (SELECT DISTINCT l_orderkey % 1000 AS page_number FROM lineitem)
        |SELECT page_number, chapter_number
        |FROM pages LEFT JOIN chapters
        |  ON page_number BETWEEN start_page AND end_page
        |ORDER BY page_number""".stripMargin,
    "q_group_stats" ->
      """WITH per_order AS (
        |  SELECT l_orderkey, COUNT(*) AS n_chunks FROM lineitem GROUP BY l_orderkey)
        |SELECT COUNT(*) AS n_groups,
        |  ROUND(AVG(n_chunks), 6) AS avg_chunks,
        |  MAX(n_chunks) AS max_chunks,
        |  COUNT(CASE WHEN n_chunks = 1 THEN 1 END) AS single_chunk_groups
        |FROM per_order""".stripMargin,
    "q_skew_salted_join" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_suppkey % 10 < 8 THEN 0 ELSE l_suppkey END AS hot_key,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS qty
        |  FROM lineitem),
        |dim AS (SELECT DISTINCT hot_key, 'k' || hot_key AS label FROM fact)
        |SELECT f.hot_key, label, COUNT(*) AS n_rows,
        |  CAST(SUM(qty) AS DOUBLE) AS sum_qty
        |FROM fact f JOIN dim d ON f.hot_key = d.hot_key
        |GROUP BY f.hot_key, label ORDER BY f.hot_key""".stripMargin,
    "q_skew_salted_agg" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_suppkey % 10 < 8 THEN 0 ELSE l_suppkey END AS hot_key,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS qty
        |  FROM lineitem)
        |SELECT hot_key, CAST(SUM(qty) AS DOUBLE) AS sum_qty, COUNT(*) AS n_rows
        |FROM fact GROUP BY hot_key ORDER BY hot_key""".stripMargin,
    // CAST AS BIGINT: DuckDB SUM(BIGINT) returns HUGEINT (int128), which the
    // driver serializes differently from Spark's int64 — pin the width.
    "q_table_hash" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST('0x' || substr(md5(
        |    l_orderkey || '|' || l_partkey || '|' || l_suppkey || '|' || l_linenumber
        |    || '|' || l_returnflag || '|' || l_linestatus
        |    || '|' || strftime(l_shipdate, '%Y-%m-%d')), 1, 8) AS BIGINT)) AS BIGINT)
        |    AS content_hash
        |FROM lineitem""".stripMargin)
}
