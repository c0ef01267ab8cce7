package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Compaction planner: the two-pass distributed prefix sum must equal
  * the naive global-window formulation, be independent of how many
  * partitions the scan was cut into, and produce groups whose byte
  * totals satisfy the bin-fill bound. */
class CompactionPlanSpec extends SparkSpecBase {
  import spark.implicits._

  private def manifest = {
    val z = Layout.zorderFrame(
      graft.Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey")
    z.groupBy(shiftrightunsigned(col("zvalue"), 24).as("b"))
      .agg((lit(64L) * count(lit(1)) +
        sum(col("l_suppkey").cast("long") % 997)).cast("long").as("bytes"))
      .select(format_string("file_%05d", col("b")).as("file"), col("bytes"))
  }

  private def naive(target: Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("file"))
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .withColumn("cum_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("grp", (col("cum_before") / target).cast("long"))
      .select("file", "bytes", "cum_before", "grp")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("two-pass distributed prefix sum equals the global-window plan") {
    val target = manifest.agg(sum(col("bytes"))).head().getLong(0) / 16 + 1
    val got = Layout.compactionPlan(manifest, "file", "bytes", target)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === naive(target))
    assert(got.nonEmpty)
  }

  test("plan is independent of the scan's partition count") {
    val target = manifest.agg(sum(col("bytes"))).head().getLong(0) / 16 + 1
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def planAt(p: Int) = {
      spark.conf.set(key, p.toString)
      try Layout.compactionPlan(manifest, "file", "bytes", target)
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      finally spark.conf.set(key, prev)
    }
    assert(planAt(1) === planAt(7))
    assert(planAt(7) === planAt(32))
  }

  test("bin-fill bound: non-final groups span target +/- one max file") {
    // grp = floor(cum_before / target): a group's byte total is the
    // cum distance between the first files of consecutive groups, and
    // each of those straddles its boundary by less than one file — so
    // totals land in (target - maxFile, target + maxFile), and no
    // group index is skipped (every boundary is crossed in order)
    val target = manifest.agg(sum(col("bytes"))).head().getLong(0) / 16 + 1
    val plan = Layout.compactionPlan(manifest, "file", "bytes", target)
      .as[(String, Long, Long, Long)].collect()
    val maxFile = plan.map(_._2).max
    val byGrp = plan.groupBy(_._4).view.mapValues(_.map(_._2).sum).toMap
    val last = byGrp.keys.max
    assert(byGrp.keySet === (0L to last).toSet, "a group index was skipped")
    byGrp.foreach { case (g, total) =>
      if (g != last)
        assert(total > target - maxFile && total < target + maxFile,
          s"group $g total $total outside (${target - maxFile}, ${target + maxFile})")
    }
  }
}
