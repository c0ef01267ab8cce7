package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational battery: scan/filter/aggregate/join/top-k.
  *
  * These are the engine's "is the relational substrate sound" queries —
  * predicate pushdown, partial aggregation, broadcast joins — exercising the
  * same shapes the reference uses for its CDC/master-table work
  * (reference: catalog search/stage1_extract_csv.py, stage4_update_csv.py).
  *
  * Numeric policy: aggregate in DECIMAL (exact, order-independent), cast the
  * final value to DOUBLE so Spark and DuckDB hash identically.
  */
object Relational extends QueryModule {

  private val D = "decimal(18,2)"

  /** TPC-H Q1-shaped pricing summary: groupBy + exact decimal sums. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(D)).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast(D) *
          (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast(D)).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Revenue by nation: 4-way join; nation/region are broadcast-size dims.
    *
    * The per-order revenue is pre-aggregated BELOW the join chain: the
    * lineitem→orders join is N:1 on the order key and the revenue sum is
    * exact DECIMAL (order-independent), so summing per order first and
    * re-summing per nation is bit-identical to aggregating after the
    * joins — but the customer/nation joins then carry one row per order
    * instead of one per line item (~4× less at any scale; the optimizer
    * does not push aggregates through joins on its own). */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_extendedprice").cast(D) *
          (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
          .as("o_revenue"),
        count(lit(1)).as("o_items"))
    perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("o_revenue")).cast("double").as("revenue"),
        sum(col("o_items")).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Top-10 customers by order spend — deterministic tiebreak on c_custkey. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(D)).cast("double").as("total_spend"),
        count(lit(1)).as("n_orders"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spend"), col("n_orders"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(10)
  }

  /** Parts by brand with size stats — scan+filter+agg on a dim table. */
  def partStats(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.filter(col("p_size") >= 10)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"),
        sum(col("p_retailprice").cast(D)).cast("double").as("sum_price"))
      .orderBy(col("p_brand"))
  }

  /** Grouping-set aggregation: revenue by (returnflag, linestatus) with
    * ROLLUP subtotals and grand total in ONE pass — Spark expands the
    * grouping sets inside a single HashAggregate (no multi-scan union).
    * `gid` (grouping_id) disambiguates real NULL keys from subtotal
    * rows; both engines use the first-arg-is-MSB bitmask convention. */
  def pricingRollup(spark: SparkSession, dir: String): DataFrame = {
    // decimal terms are projected BELOW the grouping-set Expand: the
    // Expand copies every input row once per grouping set, and Spark
    // does not hoist agg-input expressions on its own — without this
    // the revenue multiply would run 3x per row
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("l_extendedprice").cast(D) *
          (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
          .as("rev_term"),
        col("l_quantity").cast(D).as("qty_term"))
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        sum(col("rev_term")).cast("double").as("revenue"),
        sum(col("qty_term")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
        col("revenue"), col("sum_qty"), col("n_rows"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  private val Buckets = 8

  /** Source-identity tag for bucketed-table names: a bucketed table is a
    * materialization of ONE input dir — encode it so sf0.001 warm-up,
    * sf0.01 and sf0.1 passes in the same session never share a table. */
  private def bucketTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(8)

  /** The bucketed lineitem/orders projections for `dir`, ingested at most
    * once per session (write-once / join-many). */
  def bucketedTables(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val tag = bucketTag(dir)
    val li = graft.ops.Bucketing.ensureBucketed(spark,
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      s"graft_bkt_lineitem_$tag", "l_orderkey", Buckets)
    val o = graft.ops.Bucketing.ensureBucketed(spark,
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority")),
      s"graft_bkt_orders_$tag", "o_orderkey", Buckets)
    (li, o)
  }

  /** Force a fresh bucketed ingest for `dir` (drops + rewrites both
    * tables). Exists so the bench can time the pay-once write as its own
    * labeled number, separate from the per-query join timings. */
  def bucketedIngest(spark: SparkSession, dir: String): Unit = {
    val tag = bucketTag(dir)
    Seq(s"graft_bkt_lineitem_$tag", s"graft_bkt_orders_$tag")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    bucketedTables(spark, dir)
    ()
  }

  /** Co-located join over bucketed tables: lineitem and orders are
    * persisted bucketed (8 buckets) + in-bucket-sorted on the order key
    * ONCE per session (`ensureBucketed`), then joined WITHOUT an
    * exchange on either side — the ingest-time answer to the join
    * shuffle (the write pays the partitioning once; every subsequent
    * keyed join/agg reads it back free; BucketingSpec pins the
    * zero-shuffle plan). The first invocation pays the ingest; steady
    * invocations measure the read-side benefit, which is the point.
    * The oracle checks the round-trip preserves the join's arithmetic
    * exactly. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (li, o) = bucketedTables(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(D) *
          (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)")))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val KmvK = 256

  /** Pre-join selectivity report: KMV set-overlap estimate of the
    * customer ⋈ orders key intersection (Beyer et al. 2007) next to
    * the exact counts — the optimizer-statistics question answered
    * from two bounded sketches (≤ 256 longs of state per side) instead
    * of a full join. The mirror rebuilds both sketches, the union
    * sketch, and the ρ estimator in SQL. */
  def joinCardinality(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.kmvOverlap(
      Tables.customer(spark, dir), "c_custkey",
      Tables.orders(spark, dir), "o_custkey", KmvK)

  /** TPC-H Q8-shaped national market share: of the 'PROMO'-type part
    * revenue sold into the ASIA region, the fraction supplied by
    * NATION_7's suppliers, per order year — the widest registered
    * relational plan (lineitem→part→supplier→orders→customer→nation×2→
    * region; seven base-table joins). Dimension filters (part type,
    * region) reach their scans as PushedFilters; the constant-size dims
    * (nation, region) broadcast; part/supplier/customer stay
    * AQE-decided (they grow with SF — a broadcast hint here would be a
    * 100 TB lie). Revenue is the exact DECIMAL volume; the share is one
    * double division rounded to 6. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n1 = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice").cast(D) *
      (lit(1).cast("decimal(5,2)") - col("l_discount").cast("decimal(5,2)"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(vol).as("_total"),
        sum(when(col("supp_nation") === "NATION_7", vol)).as("_nation"),
        count(lit(1)).as("n_lineitems"))
      .select(col("o_year"), col("n_lineitems"),
        col("_total").cast("double").as("total_revenue"),
        coalesce(col("_nation").cast("double"), lit(0.0))
          .as("nation_revenue"),
        round(coalesce(col("_nation").cast("double"), lit(0.0)) /
          col("_total").cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** CUBE over (status, priority): all four grouping sets in one pass
    * (the engine plans ONE Expand, not four scans), with grouping_id
    * disambiguating rolled-up NULLs from data NULLs. Completes the
    * grouping-set family next to q_rel_rollup. */
  def statusCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("revenue"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("n_orders"), col("revenue"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rel_market_share" -> marketShare,
    "q_rel_cube" -> statusCube,
    "q_rel_join_card" -> joinCardinality,
    "q_rel_rollup" -> pricingRollup,
    "q_rel_pricing_summary" -> pricingSummary,
    "q_rel_revenue_by_nation" -> revenueByNation,
    "q_rel_top_customers" -> topCustomers,
    "q_rel_part_stats" -> partStats,
    "q_rel_bucketed_join" -> bucketedJoin)

  /** kmvOverlap mirror: distinct 60-bit key hashes per side, k-smallest
    * sketches via ROW_NUMBER, the merged union sketch, and the same
    * fixed-order estimator arithmetic (size<k ⇒ exact; else
    * 255·2^60/kth; overlap = nboth/nu · est_union, all HALF_UP). */
  private val joinCardSql: String =
    s"""WITH ha AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
       |    AS BIGINT) AS hv FROM customer),
       |hb AS (
       |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
       |    AS BIGINT) AS hv FROM orders),
       |sa AS (SELECT hv FROM (
       |  SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM ha)
       |  WHERE rn <= $KmvK),
       |sb AS (SELECT hv FROM (
       |  SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn FROM hb)
       |  WHERE rn <= $KmvK),
       |u AS (SELECT hv FROM (
       |  SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
       |  FROM (SELECT hv FROM sa UNION SELECT hv FROM sb))
       |  WHERE rn <= $KmvK),
       |s AS (
       |  SELECT
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sa) AS na,
       |    (SELECT MAX(hv) FROM sa) AS ka,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sb) AS nb,
       |    (SELECT MAX(hv) FROM sb) AS kb,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS nu,
       |    (SELECT MAX(hv) FROM u) AS ku,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM u
       |     JOIN sa USING (hv) JOIN sb USING (hv)) AS nboth,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ha) AS xa,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM hb) AS xb,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ha JOIN hb USING (hv)) AS xi),
       |e AS (
       |  SELECT
       |    CASE WHEN na < $KmvK THEN CAST(na AS DOUBLE)
       |      ELSE ROUND(${KmvK - 1}.0 * 1152921504606846976.0
       |        / CAST(ka AS DOUBLE), 4) END AS est_distinct_a,
       |    CASE WHEN nb < $KmvK THEN CAST(nb AS DOUBLE)
       |      ELSE ROUND(${KmvK - 1}.0 * 1152921504606846976.0
       |        / CAST(kb AS DOUBLE), 4) END AS est_distinct_b,
       |    CASE WHEN nu < $KmvK THEN CAST(nu AS DOUBLE)
       |      ELSE ROUND(${KmvK - 1}.0 * 1152921504606846976.0
       |        / CAST(ku AS DOUBLE), 4) END AS est_union,
       |    nboth, nu, xa, xb, xi
       |  FROM s)
       |SELECT est_distinct_a, est_distinct_b,
       |  ROUND(CAST(nboth AS DOUBLE) / nu * est_union, 4) AS est_overlap,
       |  xa AS exact_distinct_a, xb AS exact_distinct_b,
       |  xi AS exact_overlap,
       |  CASE WHEN xi = 0 THEN NULL
       |    ELSE ROUND(ABS(ROUND(CAST(nboth AS DOUBLE) / nu * est_union, 4) - xi)
       |      / CAST(xi AS DOUBLE), 6) END AS rel_err
       |FROM e""".stripMargin

  override def oracle: Map[String, String] = Map(
    // same decimal volume, same conditional-sum + double division
    "q_rel_market_share" ->
      """WITH j AS (
        |  SELECT year(o.o_orderdate) AS o_year, n2.n_name AS supp_nation,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(5,2)) - CAST(l.l_discount AS DECIMAL(5,2)))
        |      AS vol
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |  JOIN region r ON n1.n_regionkey = r.r_regionkey
        |    AND r.r_name = 'ASIA'
        |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey),
        |a AS (
        |  SELECT o_year, COUNT(*) AS n_lineitems,
        |    SUM(vol) AS total,
        |    SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol END) AS nat
        |  FROM j GROUP BY o_year)
        |SELECT o_year, n_lineitems,
        |  CAST(total AS DOUBLE) AS total_revenue,
        |  COALESCE(CAST(nat AS DOUBLE), 0.0) AS nation_revenue,
        |  ROUND(COALESCE(CAST(nat AS DOUBLE), 0.0)
        |    / CAST(total AS DOUBLE), 6) AS mkt_share
        |FROM a ORDER BY o_year""".stripMargin,
    "q_rel_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin,
    "q_rel_join_card" -> joinCardSql,
    "q_rel_rollup" ->
      """SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
        |  l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rel_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_rel_top_customers" ->
      """SELECT c_custkey, c_name, total_spend, n_orders
        |FROM (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey) agg
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_spend DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "q_rel_part_stats" ->
      """SELECT p_brand,
        |  COUNT(*) AS n_parts,
        |  MIN(p_size) AS min_size,
        |  MAX(p_size) AS max_size,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part
        |WHERE p_size >= 10
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_rel_bucketed_join" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
