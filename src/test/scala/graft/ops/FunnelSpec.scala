package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Funnel semantics: stage anchoring is order-correct — a click BEFORE
  * the user's first view does not convert. */
class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  test("funnel: order matters, not just event presence") {
    // A: view@10 click@20 purchase@30  -> full conversion
    // B: click@5 view@10               -> click precedes view: stage 1 only
    // C: view@10                       -> stage 1 only
    // D: view@10 click@20 purchase@15  -> purchase precedes click: stage 2
    val rows = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 10L),
      (4L, "view", 10L), (4L, "click", 20L), (4L, "purchase", 15L))
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    // raw events parquet stores ts as int64 nanos (see Tables.events)
    rows.toDF("user_id", "event_type", "secs")
      .select(lit(0L).as("event_id"),
        (col("secs") * lit(1000000000L)).as("ts"),
        col("user_id"), col("event_type"), lit(0.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.EventsQueries.funnel(spark, dir).head
    assert(out.getLong(0) === 4L)  // all four viewed
    assert(out.getLong(1) === 2L)  // A and D clicked after viewing
    assert(out.getLong(2) === 1L)  // only A purchased after the click
    assert(math.abs(out.getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(out.getDouble(4) - 0.5) < 1e-9)
  }
}
