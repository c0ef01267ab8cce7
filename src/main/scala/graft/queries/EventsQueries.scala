package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time analytics over the `events` stream table — the batch face of
  * the streaming surface (SURVEY §2.10). Every query here uses exactly the
  * constructs Structured Streaming executes incrementally (tumbling
  * `window()`, event-time sessionization), so the same code runs under
  * `readStream` + watermark (see graft.streaming and StreamingSpec).
  */
object EventsQueries extends QueryModule {

  /** Tumbling 1-hour windows per event type: the canonical streaming agg. */
  def windowed(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Sliding 1-hour windows every 15 minutes — the rolling-metrics
    * companion to [[windowed]]; calls the STREAMING builder directly
    * (`StreamingRefresh.slidingCounts` — watermark is a no-op in
    * batch), so the oracle-checked plan is the very plan the stream
    * runs. The mirror rebuilds window membership arithmetically:
    * each event belongs to the 4 epoch-aligned starts
    * (⌊us/15min⌋ − j)·15min, j ∈ 0..3. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingRefresh.slidingCounts(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Sessionization: a session breaks after a >30-minute gap per user.
    * lag + running sum of break flags — the batch formulation of
    * `sessionWindow`/flatMapGroupsWithState. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_number",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_number"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / 1000000L)
          .cast("long").as("duration_s"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("user_id"), col("session_number"))
  }

  /** Per-type daily pivot: counts per event_type column, fixed type list so
    * the schema is static (streaming-safe). */
  def typePivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val aggs = types.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t"))
    Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("day"))
  }

  /** As-of join: each click matched to the user's latest view at or
    * before it (left semantics — view-less clicks keep nulls). The
    * oracle is DuckDB's NATIVE `ASOF LEFT JOIN` — an independent
    * implementation, not a restatement of our window formulation, so
    * agreement is a real semantic check. Timestamps travel as exact
    * epoch-microsecond longs. */
  def asof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.ops.AsofJoin.asofJoin(clicks, views, "user_id", "ts",
      Seq("event_id", "ts"), "event_id", suffix = "view_")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("view_event_id"),
        unix_micros(col("view_ts")).as("view_ts_us"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Funnel analysis: users converting view → click (at or after their
    * first view) → purchase (at or after that click). Each stage anchors
    * on the EARLIEST qualifying event, so the funnel is order-correct,
    * not a bag-of-types count. Three filtered aggregate+join passes —
    * each an equi-join on user_id, no window, no state. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") >= col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") >= col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    val n1 = v.agg(count(lit(1)).as("n_view")) // 1-row frames; crossJoins are 1x1
    val n2 = c.agg(count(lit(1)).as("n_click_after_view"))
    val n3 = p.agg(count(lit(1)).as("n_purchase_after_click"))
    n1.crossJoin(n2).crossJoin(n3)
      .select(col("n_view"), col("n_click_after_view"),
        col("n_purchase_after_click"),
        round(col("n_click_after_view") / col("n_view").cast("double"), 6)
          .as("view_to_click"),
        round(col("n_purchase_after_click") /
          col("n_click_after_view").cast("double"), 6).as("click_to_purchase"))
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * event; each later week's active share of that cohort. Activity is
    * pre-collapsed to distinct (user, week) rows so every aggregate is a
    * plain count — two shuffles on user_id, then the per-cohort sizes
    * (|weeks| rows) broadcast back onto the matrix. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val act = uw.join(first, "user_id")
      .groupBy(col("cohort_wk"),
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = act.filter(col("week_offset") === 0)
      .select(col("cohort_wk"), col("n_active").as("cohort_size"))
    act.join(broadcast(sizes), "cohort_wk")
      .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active") / col("cohort_size").cast("double"), 6)
          .as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** SCD2 dimension history: each user's event_type runs collapsed into
    * validity intervals [valid_from_us, valid_to_us) with version
    * numbers and a current flag (graft.ops.Scd2 — one shuffle, per-key
    * windows). The oracle rebuilds the intervals independently with
    * DuckDB window SQL. */
  def scd2(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Scd2.history(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id")),
      "user_id", "event_type", "us", "event_id")
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .orderBy(col("user_id"), col("version"))

  /** Per-type 3σ anomaly flags — outlier detection over an event
    * stream's value column, the data-quality triage step before a
    * metrics rollup trusts its inputs. ENTIRELY in exact integer
    * arithmetic: values become cents via the cross-engine DECIMAL(18,2)
    * cast, and the z-test |x−μ| > 3σ is algebraically cleared of both
    * divisions and the square root — (n·c − S)² > 9·(n·SS − S²) — so
    * no engine ever computes a float (Spark widens through
    * DECIMAL(38,0), the mirror through HUGEINT; magnitudes ≤ ~10¹⁹,
    * both exact). Scale shape: the per-type stats are a 5-row
    * broadcast under a scan-wide projection — one aggregate, no
    * window, no second shuffle. */
  def anomalies(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_id"),
      col("event_type"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val st = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("cents")).as("s"),
      sum(col("cents") * col("cents")).as("ss"))
    val nD = col("n").cast("decimal(38,0)")
    val sD = col("s").cast("decimal(38,0)")
    val ssD = col("ss").cast("decimal(38,0)")
    val d = nD * col("cents") - sD
    e.join(broadcast(st), Seq("event_type"))
      .withColumn("is_anomaly", d * d > lit(9) * (nD * ssD - sD * sD))
      .select(col("event_id"), col("event_type"), col("cents"),
        col("is_anomaly"))
      .orderBy(col("event_id"))
  }

  /** Semi-structured schema-on-read: the untyped `props` JSON column
    * parsed with an EXPLICIT schema (`from_json` — a native Catalyst
    * expression evaluated in-row, no UDF encoder round-trip; it is a
    * CodegenFallback node, the documented cost of schema'd parsing)
    * into typed fields, with malformed payloads degrading to NULL
    * (counted, never thrown) — the ingestion contract for event
    * streams whose producers evolve independently of the warehouse.
    * Per type: parse coverage and the typed field's stats, with the
    * average as one explicit double division both engines replay.
    * Scale shape: parse + extract are a stateless projection under the
    * scan; the report is ONE partial-combined aggregate. The
    * mirror guards extraction with json_valid (DuckDB throws on
    * malformed JSON where from_json nulls), then takes k only when its
    * JSON type is an integer, via TRY_CAST — from_json degrades a
    * well-formed record whose k is non-numeric ({"k":"abc"}, {"k":"12"},
    * {"k":1.5}) to NULL rather than coercing, and a plain CAST mirror
    * would THROW on the string case instead of matching that contract
    * (r11 ADVICE; JsonPropsSpec pins the Spark side of each branch —
    * the fixture itself is all well-formed). */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    jsonPropsOver(Tables.events(spark, dir))

  /** [[jsonProps]] over any (event_type, props) frame — the scale
    * ladder's seam, so its rung times the registered operator itself. */
  private[graft] def jsonPropsOver(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("k", LongType)))
    events
      .select(col("event_type"),
        from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_parsed"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"),
        count(when(col("k") >= 50, 1)).as("n_k_high"))
      .withColumn("avg_k",
        round(col("sum_k").cast("double") / col("n_parsed"), 6))
      .orderBy(col("event_type"))
  }

  /** k-anonymous aggregate release: (event_type, value bucket) cells
    * at k = 5 with the 10 → 100 → suppress generalization ladder —
    * every emitted count describes ≥ 5 distinct users. */
  def kanon(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.kAnonRelease(Tables.events(spark, dir),
      "event_type", "user_id", "value", k = 5)
      .orderBy(col("event_type"), col("level"),
        col("bucket_lo").asc_nulls_first)

  /** Pseudonymized per-user activity rollup: user_id never appears in
    * the output — the salted sha256 token does, and because equal ids
    * map to equal tokens the rollup (counts, distinct types, value
    * sum) is EXACTLY what the raw-id rollup would be, row for row.
    * That equivalence is the referential-integrity claim, and the
    * oracle checks it end-to-end by recomputing the same tokens. */
  def pseudo(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(graft.ops.Privacy.pseudonym(col("user_id"), "graft-demo-salt")
        .as("user_token"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("value").cast("decimal(28,12)")).cast("double").as("value_sum"))
      .withColumn("value_sum", round(col("value_sum"), 6))
      .orderBy(col("user_token"))

  /** Last-click attribution: each purchase attributed to the user's
    * LATEST click within a 30-minute lookback (ties on click time break
    * to the greatest click id); purchases with no qualifying click keep
    * NULLs. Built ON the shared stream-stream candidate builder
    * (`StreamingRefresh.attributionPairs` — the same join plan runs
    * under watermarks; AttributionStreamSpec pins drain ≡ batch), then
    * picks last-click with a skew-safe struct-max aggregate and joins
    * back to the purchase side LEFT — no window function.
    *
    * Scale shape: one user-key equi-join with a range predicate, one
    * per-purchase aggregate, one left join back. The oracle re-derives
    * the winner independently with a ROW_NUMBER window. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val pairs = graft.streaming.StreamingRefresh
      .attributionPairs(purchases, clicks, lookbackMin = 30)
    val best = pairs.groupBy(col("purchase_id"))
      .agg(max(struct(col("c_ts_us"), col("click_id"))).as("w"))
      .select(col("purchase_id"), col("w.click_id").as("click_id"),
        col("w.c_ts_us").as("click_ts_us"))
    purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_ts_us"))
      .join(best, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("p_ts_us"),
        col("click_id"), col("click_ts_us"),
        (col("p_ts_us") - col("click_ts_us")).as("gap_us"),
        col("click_id").isNotNull.as("attributed"))
      .orderBy(col("purchase_id"))
  }

  /** Unconverted clicks — the re-marketing feed and the RIGHT-OUTER face
    * of the stream-stream attribution join (r12 VERDICT #4): every click
    * with NO purchase by the same user inside the click's forward
    * 30-minute window, derived by running the shared candidate builder
    * right-outer (`StreamingRefresh.attributionPairsOuterRight` — the
    * same plan runs under watermarks, where the null row may emit only
    * once the purchase watermark clears the window; AttributionStreamSpec
    * pins the withheld-then-emitted semantics) and keeping the
    * null-purchase rows. The oracle derives the same set INDEPENDENTLY
    * with a NOT EXISTS anti-join, so agreement is a real semantic check,
    * not a restatement. */
  def attributionUnconverted(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.streaming.StreamingRefresh
      .attributionPairsOuterRight(purchases, clicks, lookbackMin = 30)
      .filter(col("purchase_id").isNull)
      .select(col("click_id"), col("user_id"),
        col("c_ts_us").as("click_ts_us"))
      .orderBy(col("click_id"))
  }

  /** The reconciliation feed — the FULL-OUTER face completing the
    * stream-stream attribution family (inner: q_events_attribution;
    * left: unmatched purchases inside it; right:
    * q_events_attribution_unconverted): every candidate pair plus both
    * sides' unmatched rows in one frame, with a face tag. The oracle
    * mirrors with a FULL OUTER JOIN on the same microsecond bounds. */
  def attributionFull(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.streaming.StreamingRefresh
      .attributionPairsFull(purchases, clicks, lookbackMin = 30)
      .withColumn("face",
        when(col("click_id").isNull, "purchase_only")
          .when(col("purchase_id").isNull, "click_only")
          .otherwise("matched"))
      .orderBy(col("purchase_id").asc_nulls_first,
        col("click_id").asc_nulls_first)
  }

  /** Incremental aggregate maintenance, exercised end-to-end: per-type
    * value stats computed by MERGING three independently-aggregated
    * time slices (before Jan 15 / Jan 15–22 / Jan 23 on — yesterday's
    * persisted state plus two delta batches), while the oracle computes
    * the same report DIRECTLY over all events — the hash compare proves
    * merge(state(A), state(B), state(C)) ≡ state(A∪B∪C) against an
    * independent engine (IncrementalAggSpec pins it inside Spark for
    * arbitrary splits). */
  def aggIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.IncrementalAgg
    val e = Tables.events(spark, dir).select(col("event_type"), col("ts"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val slices = Seq(
      e.filter(col("ts") < lit("2024-01-15").cast("timestamp")),
      e.filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
        col("ts") < lit("2024-01-23").cast("timestamp")),
      e.filter(col("ts") >= lit("2024-01-23").cast("timestamp")))
      .map(IncrementalAgg.state(_, "event_type", "cents"))
    IncrementalAgg.report(
      IncrementalAgg.merge("event_type", slices), "event_type")
      .orderBy(col("event_type"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_attribution" -> attribution,
    "q_events_attribution_unconverted" -> attributionUnconverted,
    "q_events_attribution_full" -> attributionFull,
    "q_agg_incremental" -> aggIncremental,
    "q_events_kanon" -> kanon,
    "q_events_pseudo" -> pseudo,
    "q_events_json_props" -> jsonProps,
    "q_events_anomaly" -> anomalies,
    "q_events_scd2" -> scd2,
    "q_events_windowed" -> windowed,
    "q_events_sliding" -> sliding,
    "q_events_sessions" -> sessions,
    "q_events_type_pivot" -> typePivot,
    "q_events_asof" -> asof,
    "q_events_funnel" -> funnel,
    "q_events_retention" -> retention)

  override def oracle: Map[String, String] = Map(
    // independent winner derivation: ROW_NUMBER over the candidate
    // pairs (vs Spark's struct-max), same 30-min microsecond bound
    "q_events_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_ts_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_ts_us
        |  FROM events WHERE event_type = 'click'),
        |cand AS (
        |  SELECT p.purchase_id, c.click_id, c.c_ts_us,
        |    ROW_NUMBER() OVER (PARTITION BY p.purchase_id
        |      ORDER BY c.c_ts_us DESC, c.click_id DESC) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.c_ts_us <= p.p_ts_us
        |    AND c.c_ts_us >= p.p_ts_us - 1800000000),
        |best AS (SELECT purchase_id, click_id, c_ts_us FROM cand WHERE rn = 1)
        |SELECT p.purchase_id, p.user_id, p.p_ts_us,
        |  b.click_id, b.c_ts_us AS click_ts_us,
        |  p.p_ts_us - b.c_ts_us AS gap_us,
        |  b.click_id IS NOT NULL AS attributed
        |FROM p LEFT JOIN best b USING (purchase_id)
        |ORDER BY p.purchase_id""".stripMargin,
    // independent derivation: NOT EXISTS anti-join (vs Spark's
    // right-outer + null filter), same inclusive microsecond bounds
    "q_events_attribution_unconverted" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  epoch_us(c.ts) AS click_ts_us
        |FROM events c
        |WHERE c.event_type = 'click' AND NOT EXISTS (
        |  SELECT 1 FROM events p
        |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        |    AND epoch_us(p.ts) >= epoch_us(c.ts)
        |    AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000)
        |ORDER BY click_id""".stripMargin,
    "q_events_attribution_full" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id AS p_user,
        |    epoch_us(ts) AS p_ts_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id AS c_user,
        |    epoch_us(ts) AS c_ts_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, c.click_id,
        |  COALESCE(p.p_user, c.c_user) AS user_id,
        |  p.p_ts_us, c.c_ts_us,
        |  CASE WHEN c.click_id IS NULL THEN 'purchase_only'
        |       WHEN p.purchase_id IS NULL THEN 'click_only'
        |       ELSE 'matched' END AS face
        |FROM p FULL OUTER JOIN c
        |  ON p.p_user = c.c_user
        |  AND c.c_ts_us <= p.p_ts_us
        |  AND c.c_ts_us >= p.p_ts_us - 1800000000
        |ORDER BY purchase_id NULLS FIRST, click_id NULLS FIRST""".stripMargin,
    // DIRECT full aggregate — Spark goes through the three-slice merge,
    // so hash equality proves the state algebra cross-engine; ss crosses
    // as digit string (HLL convention), variance as E[x²]−E[x]² in
    // doubles (each input exact below 2^53)
    "q_agg_incremental" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |a AS (
        |  SELECT event_type, COUNT(cents) AS n, CAST(SUM(cents) AS BIGINT) AS s,
        |    SUM(CAST(cents AS HUGEINT) * cents) AS ssh,
        |    MIN(cents) AS min_v, MAX(cents) AS max_v
        |  FROM c GROUP BY 1)
        |SELECT event_type, n, s, CAST(ssh AS VARCHAR) AS ss, min_v, max_v,
        |  ROUND(CAST(s AS DOUBLE) / n, 6) AS mean,
        |  ROUND(CAST(ssh AS DOUBLE) / n
        |    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 6)
        |    AS variance
        |FROM a ORDER BY event_type""".stripMargin,
    // same salted token, same decimal-sum-then-round money math
    "q_events_pseudo" ->
      """SELECT sha256('graft-demo-salt' || ':' || CAST(user_id AS VARCHAR))
        |    AS user_token,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE), 6)
        |    AS value_sum
        |FROM events GROUP BY 1 ORDER BY user_token""".stripMargin,
    // mirror of the two-level generalization ladder; COUNT(DISTINCT)
    // is BIGINT in both engines, buckets are exact double arithmetic
    "q_events_kanon" ->
      """WITH e AS (
        |  SELECT event_type AS t, user_id AS u,
        |    floor(value / 10) * 10 AS b, floor(value / 100) * 100 AS bc
        |  FROM events),
        |fine AS (
        |  SELECT t, b, COUNT(DISTINCT u) AS n_users, COUNT(*) AS n_events
        |  FROM e GROUP BY t, b),
        |fine_ok AS (SELECT * FROM fine WHERE n_users >= 5),
        |rest AS (
        |  SELECT e.* FROM e LEFT JOIN fine_ok
        |    ON e.t = fine_ok.t AND e.b = fine_ok.b
        |  WHERE fine_ok.t IS NULL),
        |coarse AS (
        |  SELECT t, bc, COUNT(DISTINCT u) AS n_users, COUNT(*) AS n_events
        |  FROM rest GROUP BY t, bc),
        |coarse_ok AS (SELECT * FROM coarse WHERE n_users >= 5),
        |rest2 AS (
        |  SELECT rest.* FROM rest LEFT JOIN coarse_ok
        |    ON rest.t = coarse_ok.t AND rest.bc = coarse_ok.bc
        |  WHERE coarse_ok.t IS NULL),
        |supp AS (
        |  SELECT t, COUNT(DISTINCT u) AS nu, COUNT(*) AS ne
        |  FROM rest2 GROUP BY t)
        |SELECT t AS event_type, 'fine' AS level, b AS bucket_lo,
        |  n_users, n_events FROM fine_ok
        |UNION ALL
        |SELECT t, 'coarse', bc, n_users, n_events FROM coarse_ok
        |UNION ALL
        |SELECT t, 'suppressed', NULL,
        |  CASE WHEN nu >= 5 THEN nu END,
        |  CASE WHEN nu >= 5 THEN ne END FROM supp
        |ORDER BY event_type, level, bucket_lo NULLS FIRST""".stripMargin,
    "q_events_json_props" ->
      """WITH p AS (
        |  SELECT event_type,
        |    CASE WHEN json_valid(props) THEN
        |      CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
        |        THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
        |        END
        |      END AS k
        |  FROM events),
        |a AS (
        |  SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_parsed,
        |    MIN(k) AS min_k, MAX(k) AS max_k,
        |    CAST(SUM(k) AS BIGINT) AS sum_k,
        |    COUNT(CASE WHEN k >= 50 THEN 1 END) AS n_k_high
        |  FROM p GROUP BY 1)
        |SELECT event_type, n_events, n_parsed, min_k, max_k, sum_k,
        |  n_k_high, ROUND(CAST(sum_k AS DOUBLE) / n_parsed, 6) AS avg_k
        |FROM a ORDER BY event_type""".stripMargin,
    "q_events_anomaly" ->
      """WITH c AS (
        |  SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS s,
        |    CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss
        |  FROM c GROUP BY 1)
        |SELECT c.event_id, c.event_type, c.cents,
        |  (CAST(st.n AS HUGEINT) * c.cents - st.s)
        |    * (CAST(st.n AS HUGEINT) * c.cents - st.s)
        |  > 9 * (CAST(st.n AS HUGEINT) * st.ss
        |         - CAST(st.s AS HUGEINT) * st.s) AS is_anomaly
        |FROM c JOIN st USING (event_type)
        |ORDER BY c.event_id""".stripMargin,
    "q_events_scd2" ->
      """WITH flagged AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
        |    CASE WHEN LAG(event_id) OVER w IS NULL
        |           OR (LAG(event_type) OVER w) IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id, event_type, us,
        |    CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
        |    LEAD(us) OVER w2 AS valid_to_us
        |  FROM flagged WHERE chg = 1
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, version, event_type, us AS valid_from_us,
        |  valid_to_us,
        |  CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM runs ORDER BY user_id, version""".stripMargin,
    "q_events_sliding" ->
      """WITH w AS (
        |  SELECT e.event_type, e.value,
        |    make_timestamp((epoch_us(e.ts) // 900000000 - t.j) * 900000000)
        |      AS ws
        |  FROM events e, (SELECT unnest(range(0, 4)) AS j) t)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM w GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,
    "q_events_windowed" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 30 * 60 * 1000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), numbered AS (
        |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts,
        |    event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS session_number
        |  FROM flagged)
        |SELECT user_id, CAST(session_number AS BIGINT) AS session_number,
        |  COUNT(*) AS n_events,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS duration_s,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, session_number
        |ORDER BY user_id, session_number""".stripMargin,
    "q_events_type_pivot" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_events_asof" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |r AS (
        |  -- DuckDB's ASOF choice among equal-ts right rows is unspecified;
        |  -- AsofJoin pins greatest event_id, so make the tie rule explicit
        |  -- by collapsing each (user_id, ts) to its max event_id first.
        |  SELECT MAX(event_id) AS event_id, user_id, ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
        |  r.event_id AS view_event_id, epoch_us(r.ts) AS view_ts_us,
        |  epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "q_events_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t1
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t2
        |  GROUP BY e.user_id)
        |SELECT
        |  (SELECT COUNT(*) FROM v) AS n_view,
        |  (SELECT COUNT(*) FROM c) AS n_click_after_view,
        |  (SELECT COUNT(*) FROM p) AS n_purchase_after_click,
        |  ROUND((SELECT COUNT(*) FROM c)
        |    / CAST((SELECT COUNT(*) FROM v) AS DOUBLE), 6) AS view_to_click,
        |  ROUND((SELECT COUNT(*) FROM p)
        |    / CAST((SELECT COUNT(*) FROM c) AS DOUBLE), 6) AS click_to_purchase""".stripMargin,
    "q_events_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |first_wk AS (
        |  SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id),
        |act AS (
        |  SELECT f.cohort_wk,
        |    CAST(date_diff('day', f.cohort_wk, uw.wk) // 7 AS BIGINT)
        |      AS week_offset,
        |    COUNT(*) AS n_active
        |  FROM uw JOIN first_wk f USING (user_id)
        |  GROUP BY 1, 2),
        |sz AS (
        |  SELECT cohort_wk, n_active AS cohort_size FROM act
        |  WHERE week_offset = 0)
        |SELECT strftime(a.cohort_wk, '%Y-%m-%d') AS cohort_week,
        |  a.week_offset, a.n_active, s.cohort_size,
        |  ROUND(a.n_active / CAST(s.cohort_size AS DOUBLE), 6) AS retention
        |FROM act a JOIN sz s USING (cohort_wk)
        |ORDER BY cohort_week, week_offset""".stripMargin)
}
