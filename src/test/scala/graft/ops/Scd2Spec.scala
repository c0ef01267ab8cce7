package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 reconstruction-merge semantics: merging a batch into a dimension
  * must equal rebuilding history from the full log — including late
  * (retroactive) events, which close-and-insert implementations corrupt.
  */
class Scd2Spec extends SparkSpecBase {

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.select("user_id", "version", "event_type", "valid_from_us",
      "valid_to_us", "is_current")
      .collect().map(_.toSeq).toSeq
      .sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))

  private def eventsLog(dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))

  test("merge(history(prefix), suffix) == history(all) on real events") {
    val log = eventsLog(sfDir)
    // split at the median timestamp so both halves are non-trivial
    val split = log.stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    val dim = Scd2.history(log.filter(col("us") <= split),
      "user_id", "event_type", "us", "event_id")
    val merged = Scd2.merge(dim, log.filter(col("us") > split),
      "user_id", "event_type", "us", "event_id")
    val full = Scd2.history(log, "user_id", "event_type", "us", "event_id")
    assert(canon(merged) === canon(full))
    assert(canon(full).nonEmpty)
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val log = eventsLog(sfDir)
    val split = log.stat.approxQuantile("us", Array(0.5), 0.0).head.toLong
    val batch = log.filter(col("us") > split)
    val dim = Scd2.history(log.filter(col("us") <= split),
      "user_id", "event_type", "us", "event_id")
    val once = Scd2.merge(dim, batch, "user_id", "event_type", "us", "event_id")
    val twice = Scd2.merge(once, batch, "user_id", "event_type", "us", "event_id")
    assert(canon(once) === canon(twice))
  }

  test("late retroactive event splits an interval instead of corrupting it") {
    import spark.implicits._
    val early = Seq(
      (7L, "bronze", 100L, 1L),
      (7L, "gold", 300L, 3L)).toDF("user_id", "event_type", "us", "event_id")
    val late = Seq(
      (7L, "silver", 200L, 2L)).toDF("user_id", "event_type", "us", "event_id")
    val dim = Scd2.history(early, "user_id", "event_type", "us", "event_id")
    val merged = Scd2.merge(dim, late, "user_id", "event_type", "us", "event_id")
    val expect = Scd2.history(early.unionByName(late),
      "user_id", "event_type", "us", "event_id")
    assert(canon(merged) === canon(expect))
    // and the reconstructed history is the 3-interval split
    assert(canon(merged).map(r => (r(2), r(3), r(4))) === Seq(
      ("bronze", 100L, 200L), ("silver", 200L, 300L), ("gold", 300L, null)))
  }

  test("lossy-summary boundary: a late event inside a collapsed run " +
    "reconstructs from recorded change points, not the unrecoverable log") {
    import spark.implicits._
    // log: A@100, A@200 (collapsed into A's run), B@300. A late B@150
    // lands inside the collapsed run; the FULL log's history would
    // re-assert A at 200 — but A@200 was collapsed away, so the best
    // any dimension-only merge can do is history(openings ∪ late).
    // This pins merge to exactly that (documented) semantic, and pins
    // that retained-log repair recovers the full answer.
    val log = Seq(
      (7L, "A", 100L, 1L), (7L, "A", 200L, 2L), (7L, "B", 300L, 3L))
      .toDF("user_id", "event_type", "us", "event_id")
    val late = Seq((7L, "B", 150L, 9L))
      .toDF("user_id", "event_type", "us", "event_id")
    val dim = Scd2.history(log, "user_id", "event_type", "us", "event_id")
    val merged = Scd2.merge(dim, late, "user_id", "event_type", "us", "event_id")
    // dimension-only merge: B wins from 150 until the recorded B@300
    // opening collapses into it — A's 200 re-assertion is gone
    assert(canon(merged).map(r => (r(2), r(3), r(4))) === Seq(
      ("A", 100L, 150L), ("B", 150L, null)))
    // retained-log repair is the same code path and recovers everything
    val repaired = Scd2.history(log.unionByName(late),
      "user_id", "event_type", "us", "event_id")
    assert(canon(repaired).map(r => (r(2), r(3), r(4))) === Seq(
      ("A", 100L, 150L), ("B", 150L, 200L),
      ("A", 200L, 300L), ("B", 300L, null)))
  }

  test("intervals are contiguous per key: valid_to == next valid_from") {
    val full = Scd2.history(eventsLog(sfDir),
      "user_id", "event_type", "us", "event_id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("version")
    val broken = full
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
      .count()
    assert(broken === 0L)
    // exactly one current row per key
    val multiCurrent = full.filter(col("is_current") === 1)
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(multiCurrent === 0L)
    // consecutive runs never share an attr value (runs are collapsed)
    val sameRun = full
      .withColumn("next_attr", lead(col("event_type"), 1).over(w))
      .filter(col("next_attr").isNotNull &&
        col("event_type") === col("next_attr"))
      .count()
    assert(sameRun === 0L)
  }
}
