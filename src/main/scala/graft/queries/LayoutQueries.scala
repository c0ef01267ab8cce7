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

  private val BloomBits = 1008 // 16 words x 63 usable bits
  private val BloomK = 3
  private val NProbes = 25

  /** Bloom skip-index probe: per-month filters over orders.o_custkey,
    * probed with custkeys 1..25. Output is every candidate (custkey,
    * month) the index admits, flagged with the exact answer — no false
    * negatives ever (BloomIndexSpec pins that over ALL keys), false
    * positives show up as might_contain=1/exact_present=0 rows. The
    * oracle rebuilds filter words and probe verdicts from the same
    * portable hash in SQL. */
  def bloomProbe(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_custkey"))
    val index = graft.ops.BloomIndex.build(orders, "month", "o_custkey",
      BloomBits, BloomK)
    val probes = spark.range(1, NProbes + 1L).select(col("id").as("custkey"))
    val cand = graft.ops.BloomIndex.mightContain(index, probes, "custkey",
      BloomBits, BloomK)
      .select(col("custkey"), col("part").as("month"))
    val exact = orders
      .filter(col("o_custkey").between(1L, NProbes.toLong))
      .select(col("o_custkey").as("custkey"), col("month"))
      .distinct()
      .withColumn("exact_present", lit(1))
    cand.join(exact, Seq("custkey", "month"), "left")
      .select(col("custkey"), col("month"), lit(1).as("might_contain"),
        coalesce(col("exact_present"), lit(0)).as("exact_present"))
      .orderBy(col("custkey"), col("month"))
  }

  /** Compaction plan over a synthetic manifest derived from the z-order
    * frame: z-range buckets of lineitem stand in for clustered files
    * (file id = zvalue >> 24, zero-padded name so both engines' string
    * sort equals numeric order; bytes = a deterministic integer size
    * proxy). The target is total/16 + 1 — scale-relative, recomputed
    * identically by the mirror — so the plan exercises multi-file
    * groups at every fixture size. Verifies the whole two-pass
    * distributed prefix sum (stage + partition offsets + local fold)
    * against DuckDB's window cumsum. */
  def compaction(spark: SparkSession, dir: String): DataFrame = {
    val z = Layout.zorderFrame(
      Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey")
    // staged: the manifest (file-count rows) feeds BOTH the target
    // collect and the planner — without it the 600k-row z-frame
    // derivation runs twice
    val mf = graft.ops.Checkpoints.stage(z
      .groupBy(shiftrightunsigned(col("zvalue"), 24).as("b"))
      .agg((lit(64L) * count(lit(1)) +
        sum(col("l_suppkey").cast("long") % 997)).cast("long").as("bytes"))
      .select(format_string("file_%05d", col("b")).as("file"), col("bytes")),
      eager = false)
    val target = mf.agg(sum(col("bytes"))).head().getLong(0) / 16 + 1
    Layout.compactionPlan(mf, "file", "bytes", target)
      .orderBy(col("file"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_layout_zorder" -> zorder,
    "q_layout_compaction" -> compaction,
    "q_index_bloom" -> bloomProbe)

  override def oracle: Map[String, String] = Map(
    // the same Morton chain as q_layout_zorder feeding the synthetic
    // manifest, then the oracle-side cumsum is a plain window (fine
    // here — it's the oracle; the Spark side is the two-pass scan)
    "q_layout_compaction" ->
      """WITH stats AS (
        |  SELECT MIN(l_partkey) AS min_x, MAX(l_partkey) AS max_x,
        |         MIN(l_suppkey) AS min_y, MAX(l_suppkey) AS max_y
        |  FROM lineitem),
        |q AS (
        |  SELECT l.l_suppkey,
        |    ((l.l_partkey - s.min_x) * 65536) // (s.max_x - s.min_x + 1) AS qx,
        |    ((l.l_suppkey - s.min_y) * 65536) // (s.max_y - s.min_y + 1) AS qy
        |  FROM lineitem l CROSS JOIN stats s),
        |s1 AS (SELECT *, (qx | (qx << 8)) & 16711935 AS x,
        |               (qy | (qy << 8)) & 16711935 AS y FROM q),
        |s2 AS (SELECT l_suppkey, (x | (x << 4)) & 252645135 AS x,
        |    (y | (y << 4)) & 252645135 AS y FROM s1),
        |s3 AS (SELECT l_suppkey, (x | (x << 2)) & 858993459 AS x,
        |    (y | (y << 2)) & 858993459 AS y FROM s2),
        |s4 AS (SELECT l_suppkey, (x | (x << 1)) & 1431655765 AS x,
        |    (y | (y << 1)) & 1431655765 AS y FROM s3),
        |mf AS (
        |  SELECT printf('file_%05d', (x | (y << 1)) // 16777216) AS file,
        |    CAST(64 * COUNT(*) + SUM(l_suppkey % 997) AS BIGINT) AS bytes
        |  FROM s4 GROUP BY 1),
        |t AS (SELECT CAST(SUM(bytes) AS BIGINT) // 16 + 1 AS target FROM mf),
        |c AS (
        |  SELECT file, bytes,
        |    CAST(COALESCE(SUM(bytes) OVER (ORDER BY file
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM mf)
        |SELECT c.file, c.bytes, c.cum_before,
        |  c.cum_before // t.target AS grp
        |FROM c CROSS JOIN t ORDER BY c.file""".stripMargin,
    "q_index_bloom" ->
      s"""WITH pk AS (
         |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month, o_custkey
         |  FROM orders),
         |seeds AS (SELECT unnest(range(0, $BloomK)) AS seed),
         |pos AS (
         |  SELECT month, seed,
         |    CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || ':' ||
         |      CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) % $BloomBits
         |      AS pos
         |  FROM pk CROSS JOIN seeds),
         |bitsrc AS (
         |  SELECT DISTINCT month, pos // 63 AS word,
         |    (1::BIGINT) << CAST(pos % 63 AS INTEGER) AS mask
         |  FROM pos),
         |idx AS (
         |  SELECT month, word, CAST(SUM(mask) AS BIGINT) AS bits
         |  FROM bitsrc GROUP BY 1, 2),
         |probes AS (SELECT unnest(range(1, ${NProbes + 1})) AS custkey),
         |ppos AS (
         |  SELECT custkey, seed,
         |    CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || ':' ||
         |      CAST(custkey AS VARCHAR)), 1, 15) AS BIGINT) % $BloomBits
         |      AS pos
         |  FROM probes CROSS JOIN seeds),
         |pw AS (
         |  SELECT custkey, seed, pos // 63 AS word,
         |    (1::BIGINT) << CAST(pos % 63 AS INTEGER) AS mask
         |  FROM ppos),
         |cand AS (
         |  SELECT p.custkey, i.month
         |  FROM pw p JOIN idx i ON p.word = i.word AND (i.bits & p.mask) <> 0
         |  GROUP BY p.custkey, i.month
         |  HAVING COUNT(DISTINCT p.seed) = $BloomK),
         |exact AS (
         |  SELECT DISTINCT o_custkey AS custkey,
         |    strftime(o_orderdate, '%Y-%m') AS month
         |  FROM orders WHERE o_custkey BETWEEN 1 AND $NProbes)
         |SELECT c.custkey, c.month, 1 AS might_contain,
         |  CASE WHEN e.custkey IS NOT NULL THEN 1 ELSE 0 END AS exact_present
         |FROM cand c LEFT JOIN exact e USING (custkey, month)
         |ORDER BY custkey, month""".stripMargin,
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
