package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** AsofJoin semantics: inclusive boundary, same-ts tiebreak, left
  * semantics, and agreement with a brute-force inequality join on the
  * fixture (the q_events_asof oracle adds DuckDB's native ASOF JOIN as
  * an independent cross-engine check). */
class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: Long) = to_timestamp(lit(s))

  private def mk(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("event_id", "user_id", "secs")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("secs")).as("ts"))

  test("asof: inclusive boundary, no-match nulls, latest-prior wins") {
    val clicks = mk(Seq((100L, 1L, 5L), (101L, 1L, 20L), (102L, 1L, 25L)))
    val views = mk(Seq((200L, 1L, 10L), (201L, 1L, 20L)))
    val out = AsofJoin.asofJoin(clicks, views, "user_id", "ts",
      Seq("event_id"), "event_id", "view_")
      .orderBy("event_id")
      .select("event_id", "view_event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    assert(out === Seq(
      (100L, None),        // click before any view
      (101L, Some(201L)),  // view AT the click ts matches (inclusive)
      (102L, Some(201L)))) // latest prior, not just any prior
  }

  test("asof: same-ts right rows resolve to the greatest right id") {
    val clicks = mk(Seq((100L, 1L, 30L)))
    val views = mk(Seq((200L, 1L, 10L), (202L, 1L, 10L), (201L, 1L, 10L)))
    val out = AsofJoin.asofJoin(clicks, views, "user_id", "ts",
      Seq("event_id"), "event_id", "view_")
      .select("view_event_id").head.getLong(0)
    assert(out === 202L)
  }

  test("asof: keys never cross-match") {
    val clicks = mk(Seq((100L, 1L, 30L)))
    val views = mk(Seq((200L, 2L, 10L)))
    val out = AsofJoin.asofJoin(clicks, views, "user_id", "ts",
      Seq("event_id"), "event_id", "view_")
    assert(out.count() === 1 && out.filter(col("view_event_id").isNull).count() === 1)
  }

  test("asof: agrees with the brute-force inequality join on the fixture") {
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val fast = AsofJoin.asofJoin(clicks, views.select(
        col("v_id").as("event_id"), col("v_user").as("user_id"),
        col("v_ts").as("ts")), "user_id", "ts",
      Seq("event_id"), "event_id", "view_")
      .select(col("event_id"), col("view_event_id"))
    // brute force: max (v_ts, v_id) over all views at or before the click
    val brute = clicks.join(views,
        col("user_id") === col("v_user") && col("v_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(struct(col("v_ts"), col("v_id"))).as("m"))
      .select(col("event_id"), col("m.v_id").as("view_event_id"))
    assert(fast.orderBy("event_id").collect().toSeq ===
      brute.orderBy("event_id").collect().toSeq)
  }
}
