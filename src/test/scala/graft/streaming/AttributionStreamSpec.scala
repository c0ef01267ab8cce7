package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Stream-stream interval join (attribution candidates): two watermarked
  * event streams joined on user + a 30-minute time-range bound — Spark's
  * two-sided-state join operator, state bounded by watermark + lookback.
  * The drain over the fixture must equal the batch attributionPairs
  * row-for-row (same code path, batch frames). */
class AttributionStreamSpec extends SparkSpecBase {

  private def sideFixture(eventType: String): Seq[(Long, Long, Long)] =
    graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === eventType)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def asEvents(df: org.apache.spark.sql.DataFrame) =
    df.toDF("event_id", "user_id", "ts_us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"))

  test("one-batch drain equals the batch candidate join row-for-row") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Long, Long)]
    val purchasesIn = MemoryStream[(Long, Long, Long)]
    val stream = StreamingRefresh.attributionPairs(
      asEvents(purchasesIn.toDF()).withWatermark("ts", "1 hour"),
      asEvents(clicksIn.toDF()).withWatermark("ts", "1 hour"),
      lookbackMin = 30)
    val q = stream.writeStream
      .format("memory").queryName("attr_stream").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("attr-ckpt").toString)
      .start()
    clicksIn.addData(sideFixture("click"))
    purchasesIn.addData(sideFixture("purchase"))
    q.processAllAvailable()

    val streamed = spark.sql(
      "SELECT purchase_id, click_id FROM attr_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = graft.Tables.events(spark, sfDir)
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"), col("ts"))
    val batch = StreamingRefresh.attributionPairs(
      side("purchase"), side("click"), lookbackMin = 30)
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture produced no candidate pairs")
    q.stop()
  }

  test("left-outer: the null row waits for the watermark, then emits") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000000L
    val hour = 3600L * 1000000
    val clicksIn = MemoryStream[(Long, Long, Long)]
    val purchasesIn = MemoryStream[(Long, Long, Long)]
    val stream = StreamingRefresh.attributionPairsOuter(
      asEvents(purchasesIn.toDF()).withWatermark("ts", "1 hour"),
      asEvents(clicksIn.toDF()).withWatermark("ts", "1 hour"),
      lookbackMin = 30)
    val q = stream.writeStream
      .format("memory").queryName("attr_outer").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("attr-ckpt3").toString)
      .start()
    // batch 1: a click-less purchase (user 9) and a matched one (user 8)
    purchasesIn.addData(Seq((500L, 9L, base), (501L, 8L, base)))
    clicksIn.addData(Seq((600L, 8L, base - 60L * 1000000)))
    q.processAllAvailable()
    val afterB1 = spark.sql("SELECT purchase_id, click_id FROM attr_outer")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    // the matched pair emits; the null row for 500 is WITHHELD — a
    // qualifying click could still arrive within the watermark
    assert(afterB1 === Set((501L, Some(600L))))
    // batch 2: far-future events on BOTH sides advance both watermarks
    // past purchase 500's window — the engine can now prove no click
    // will ever match, and the null row emits
    purchasesIn.addData(Seq((502L, 1L, base + 10 * hour)))
    clicksIn.addData(Seq((601L, 1L, base + 10 * hour)))
    q.processAllAvailable()
    val afterB2 = spark.sql("SELECT purchase_id, click_id FROM attr_outer")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(afterB2.contains((500L, None)))
    q.stop()
  }

  test("left-outer batch face equals inner plus null-extended unmatched") {
    val ev = graft.Tables.events(spark, sfDir)
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"), col("ts"))
    val outer = StreamingRefresh.attributionPairsOuter(
      side("purchase"), side("click"), 30)
    val inner = StreamingRefresh.attributionPairs(
      side("purchase"), side("click"), 30)
    assert(outer.filter(col("click_id").isNotNull).count() === inner.count())
    // every purchase appears; unmatched ones exactly once with nulls
    val nPurch = side("purchase").count()
    assert(outer.select(col("purchase_id")).distinct().count() === nPurch)
    assert(outer.filter(col("click_id").isNull)
      .groupBy(col("purchase_id")).count()
      .filter(col("count") > 1).count() === 0L)
  }

  test("right-outer: the unconverted click waits for the purchase watermark, then emits") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000000L
    val hour = 3600L * 1000000
    val clicksIn = MemoryStream[(Long, Long, Long)]
    val purchasesIn = MemoryStream[(Long, Long, Long)]
    val stream = StreamingRefresh.attributionPairsOuterRight(
      asEvents(purchasesIn.toDF()).withWatermark("ts", "1 hour"),
      asEvents(clicksIn.toDF()).withWatermark("ts", "1 hour"),
      lookbackMin = 30)
    val q = stream.writeStream
      .format("memory").queryName("attr_router").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("attr-ckpt4").toString)
      .start()
    // batch 1: an unconverted click (user 9) and a converting one
    // (user 8: purchase 60 s AFTER the click — inside its forward window)
    clicksIn.addData(Seq((700L, 9L, base), (701L, 8L, base)))
    purchasesIn.addData(Seq((800L, 8L, base + 60L * 1000000)))
    q.processAllAvailable()
    val afterB1 = spark.sql("SELECT click_id, purchase_id FROM attr_router")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    // the converted pair emits; click 700's null row is WITHHELD — a
    // qualifying purchase could still arrive within the watermark
    assert(afterB1 === Set((701L, Some(800L))))
    // batch 2: far-future events advance both watermarks past click
    // 700's forward window — no purchase can ever match, null row emits
    clicksIn.addData(Seq((702L, 1L, base + 10 * hour)))
    purchasesIn.addData(Seq((801L, 1L, base + 10 * hour)))
    q.processAllAvailable()
    val afterB2 = spark.sql("SELECT click_id, purchase_id FROM attr_router")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(afterB2.contains((700L, None)))
    q.stop()
  }

  test("right-outer batch face: every click appears; unmatched exactly once with nulls") {
    val ev = graft.Tables.events(spark, sfDir)
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"), col("ts"))
    val outer = StreamingRefresh.attributionPairsOuterRight(
      side("purchase"), side("click"), 30)
    val inner = StreamingRefresh.attributionPairs(
      side("purchase"), side("click"), 30)
    assert(outer.filter(col("purchase_id").isNotNull).count() === inner.count())
    assert(outer.select(col("click_id")).distinct().count() ===
      side("click").count())
    assert(outer.filter(col("purchase_id").isNull)
      .groupBy(col("click_id")).count()
      .filter(col("count") > 1).count() === 0L)
  }

  test("full-outer: both sides' null rows wait for the opposite watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000000L
    val hour = 3600L * 1000000
    val clicksIn = MemoryStream[(Long, Long, Long)]
    val purchasesIn = MemoryStream[(Long, Long, Long)]
    val stream = StreamingRefresh.attributionPairsFull(
      asEvents(purchasesIn.toDF()).withWatermark("ts", "1 hour"),
      asEvents(clicksIn.toDF()).withWatermark("ts", "1 hour"),
      lookbackMin = 30)
    val q = stream.writeStream
      .format("memory").queryName("attr_full").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("attr-ckpt5").toString)
      .start()
    // batch 1: a matched pair (user 8), a click-less purchase (user 9),
    // and an unconverted click (user 6)
    purchasesIn.addData(Seq((510L, 9L, base), (511L, 8L, base)))
    clicksIn.addData(Seq((610L, 8L, base - 60L * 1000000), (611L, 6L, base)))
    q.processAllAvailable()
    def rows() = spark.sql(
      "SELECT purchase_id, click_id FROM attr_full")
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(rows() === Set((Some(511L), Some(610L))),
      "both null faces must be withheld while the windows are open")
    // batch 2: advance both watermarks — both null rows emit
    purchasesIn.addData(Seq((512L, 1L, base + 10 * hour)))
    clicksIn.addData(Seq((612L, 1L, base + 10 * hour)))
    q.processAllAvailable()
    assert(rows().contains((Some(510L), None)), "purchase-only row missing")
    assert(rows().contains((None, Some(611L))), "click-only row missing")
    q.stop()
  }

  test("full-outer batch face decomposes into inner + both outer complements") {
    val ev = graft.Tables.events(spark, sfDir)
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"), col("ts"))
    val full = StreamingRefresh.attributionPairsFull(
      side("purchase"), side("click"), 30)
    val inner = StreamingRefresh.attributionPairs(
      side("purchase"), side("click"), 30)
    assert(full.filter(col("purchase_id").isNotNull &&
      col("click_id").isNotNull).count() === inner.count())
    assert(full.select(col("user_id")).filter(col("user_id").isNull)
      .count() === 0L, "user_id must coalesce non-null on every face")
    assert(full.filter(col("purchase_id").isNull).count() ===
      StreamingRefresh.attributionPairsOuterRight(
        side("purchase"), side("click"), 30)
        .filter(col("purchase_id").isNull).count())
    assert(full.filter(col("click_id").isNull).count() ===
      StreamingRefresh.attributionPairsOuter(
        side("purchase"), side("click"), 30)
        .filter(col("click_id").isNull).count())
  }

  test("the range bound is inclusive at the purchase instant, exclusive past the lookback") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000000L // µs
    val min = 60L * 1000000
    val clicksIn = MemoryStream[(Long, Long, Long)]
    val purchasesIn = MemoryStream[(Long, Long, Long)]
    val stream = StreamingRefresh.attributionPairs(
      asEvents(purchasesIn.toDF()).withWatermark("ts", "1 hour"),
      asEvents(clicksIn.toDF()).withWatermark("ts", "1 hour"),
      lookbackMin = 30)
    val q = stream.writeStream
      .format("memory").queryName("attr_stream2").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("attr-ckpt2").toString)
      .start()
    // purchase at base+30min; clicks at exactly the bound edges
    purchasesIn.addData(Seq((900L, 7L, base + 30 * min)))
    clicksIn.addData(Seq(
      (1L, 7L, base),               // exactly lookback ago — included
      (2L, 7L, base - 1),           // 1µs past lookback — excluded
      (3L, 7L, base + 30 * min),    // at the purchase instant — included
      (4L, 7L, base + 30 * min + 1) // after the purchase — excluded
    ))
    q.processAllAvailable()
    val got = spark.sql("SELECT click_id FROM attr_stream2")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
    q.stop()
  }
}
