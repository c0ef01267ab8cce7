package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min frequency sketch (Cormode & Muthukrishnan 2005) — the
  * bounded-state answer to "how often does each of these terms occur in
  * a 100 TB stream?" when the exact per-term groupBy would shuffle the
  * whole vocabulary.
  *
  * The sketch is a depth × width counter matrix; every cell is a SUM of
  * the counts hashing into it, so the structure is a commutative
  * monoid: partials map-side combine, micro-batches merge by addition,
  * and the result is independent of partitioning and merge order —
  * which also makes it exactly reproducible in DuckDB from the same
  * portable hash (md5-prefix → integer, the Sketches.scala convention),
  * so the registered query is hash-compare oracle-checkable despite
  * being an "approximate" structure. Point estimates take the MIN over
  * the depth rows, guaranteeing estimate ≥ true count with
  * over-estimate ≤ εN (ε = e/width) at probability 1 − δ (δ = e^-depth).
  *
  * Scale shape: building is one explode(depth)+groupBy over (depth,
  * cell) — bounded output (depth·width rows, metadata-scale);
  * estimation broadcasts the sketch under the probe stream, never the
  * reverse. Streaming: the same countMin plan runs under
  * readStream+complete with state bounded at depth·width rows (see
  * StreamingRefresh/CmsStreamSpec).
  */
object FreqSketch {

  /** Portable cell index for `term` in depth row `depth`: 60-bit
    * md5-prefix integer (engine-portable: Spark `conv(hex,16,10)` ≡
    * DuckDB `CAST('0x'||hex AS BIGINT)`) mod `width`. */
  def cellOf(term: Column, depth: Column, width: Int): Column =
    pmod(
      conv(substring(md5(concat(depth.cast("string"), lit(":"), term)),
        1, 15), 16, 10).cast("long"),
      lit(width.toLong))

  /** Build the sketch from weighted terms (`termCol`, `cntCol`): one
    * pass, one shuffle, ≤ depth·width output rows. Works identically on
    * a streaming frame (all operators are streamable aggregations). */
  def countMin(terms: DataFrame, termCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    terms
      .select(col(termCol).as("__t"), col(cntCol).as("__c"))
      .select(explode(array((0 until depth).map(lit): _*)).as("depth"),
        col("__t"), col("__c"))
      .withColumn("cell", cellOf(col("__t"), col("depth"), width))
      .groupBy(col("depth"), col("cell"))
      .agg(sum(col("__c")).cast("long").as("counter"))
  }

  /** Point-estimate each probe term against a built sketch: min over
    * the depth rows of the term's cell counters. The sketch (bounded)
    * is broadcast under the probes (unbounded), so estimation scales
    * with the probe stream. Probes keep all their columns; `est_n` is
    * appended. Probe terms never seen by the sketch get est_n = 0 (the
    * left join's missing cells — CMS's answer for absent keys).
    * SET semantics: probes are grouped by their full column tuple, so
    * duplicate probe rows collapse to one output row — carry a
    * distinct request id column if multiplicity matters. */
  def estimate(sketch: DataFrame, probes: DataFrame, termCol: String,
      depth: Int, width: Int): DataFrame = {
    val probeCols = probes.columns.map(col).toSeq
    probes
      .select(probeCols :+
        explode(array((0 until depth).map(lit): _*)).as("depth"): _*)
      .withColumn("cell", cellOf(col(termCol), col("depth"), width))
      .join(broadcast(sketch), Seq("depth", "cell"), "left")
      // a missing cell is a ZERO counter — clamp before the min, not
      // after (min skips nulls, which would let a single occupied row
      // inflate an absent key's estimate past its true 0-row floor)
      .groupBy(probeCols: _*)
      .agg(min(coalesce(col("counter"), lit(0L))).as("est_n"))
  }
}
