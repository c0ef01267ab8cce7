package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Layout

/** Table-layout operators: z-order clustering for multi-column data
  * skipping. The registered query verifies the bit-interleave and the
  * exact-integer quantization per row against DuckDB running the same
  * magic-mask arithmetic; the file-level skipping behavior of the
  * clustered WRITE path is pinned in LayoutSpec (per-file min/max boxes
  * vs a linear layout).
  */
object LayoutQueries extends QueryModule {

  /** Per-row z-value of lineitem along (l_partkey, l_suppkey): the two
    * dimensions a part-availability probe filters together. Output is
    * every row's quantized coordinates and interleaved z-value keyed by
    * the (l_orderkey, l_linenumber) PK — so the oracle hash checks the
    * full bit arithmetic on all 60k rows, not a summary. */
  def zorder(spark: SparkSession, dir: String): DataFrame =
    Layout.zorderFrame(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("qx"), col("qy"), col("zvalue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_layout_zorder" -> zorder)

  override def oracle: Map[String, String] = Map(
    "q_layout_zorder" ->
      // the same Morton magic-mask chain in DuckDB integer arithmetic:
      // masks 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555
      """WITH stats AS (
        |  SELECT MIN(l_partkey) AS min_x, MAX(l_partkey) AS max_x,
        |         MIN(l_suppkey) AS min_y, MAX(l_suppkey) AS max_y
        |  FROM lineitem),
        |q AS (
        |  SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
        |    ((l.l_partkey - s.min_x) * 65536) // (s.max_x - s.min_x + 1) AS qx,
        |    ((l.l_suppkey - s.min_y) * 65536) // (s.max_y - s.min_y + 1) AS qy
        |  FROM lineitem l CROSS JOIN stats s),
        |s1 AS (SELECT *, (qx | (qx << 8)) & 16711935 AS x,
        |               (qy | (qy << 8)) & 16711935 AS y FROM q),
        |s2 AS (SELECT l_orderkey, l_linenumber, qx, qy,
        |    (x | (x << 4)) & 252645135 AS x,
        |    (y | (y << 4)) & 252645135 AS y FROM s1),
        |s3 AS (SELECT l_orderkey, l_linenumber, qx, qy,
        |    (x | (x << 2)) & 858993459 AS x,
        |    (y | (y << 2)) & 858993459 AS y FROM s2),
        |s4 AS (SELECT l_orderkey, l_linenumber, qx, qy,
        |    (x | (x << 1)) & 1431655765 AS x,
        |    (y | (y << 1)) & 1431655765 AS y FROM s3)
        |SELECT l_orderkey, l_linenumber, qx, qy, (x | (y << 1)) AS zvalue
        |FROM s4 ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
