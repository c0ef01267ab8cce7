package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/** Z-order (Morton-curve) clustered table layout — the data-skipping
  * primitive a 100 TB deployment needs for multi-column selective scans.
  *
  * A table laid out by one sort key prunes scans on that key only; a
  * conjunctive predicate over two columns still reads every file the
  * first column's range admits. Interleaving the bits of both (quantized)
  * columns into one z-value and range-partitioning the write on it gives
  * every file a small axis-aligned bounding box in (x, y) space, so
  * file-level min/max statistics prune on BOTH columns at once — the
  * layout strategy Delta OPTIMIZE ZORDER / Hudi clustering use, built
  * here from public bit-interleaving arithmetic (Morton 1966).
  *
  * Everything is exact integer arithmetic on longs (magic-mask bit
  * spread + floored integer division), so the identical formula runs in
  * DuckDB for the oracle and the z-values are reproducible across
  * engines — no floating-point quantization drift.
  *
  * Scale notes:
  *   - the only shuffle is the `repartitionByRange` that places rows into
  *     their z-range file — exactly one pass, the same cost as a sorted
  *     rewrite;
  *   - the min/max quantization stats are a 1-row global aggregate
  *     broadcast under every row (metadata-scale, PlanGuard-bounded);
  *   - nothing is collected to the driver; file-stats pruning reads only
  *     parquet footers at plan time on a real lakehouse reader.
  */
object Layout {

  /** Exact integer division (floor for nonnegative operands) on longs —
    * `functions` has no integral divide, and routing through doubles
    * would silently lose exactness past 2^53 at real id magnitudes.
    * Shared across the ops package (BloomIndex reuses it). */
  private[ops] def idiv(a: Column, b: Column): Column =
    GraftSqlBridge.column(IntegralDivide(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Spread the low 16 bits of `x` into the even bit positions of a
    * 32-bit lane (classic magic-mask Morton spread; stays in longs). */
  def spreadBits16(x: Column): Column = {
    val m0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Interleave two 16-bit quantized coordinates into one 32-bit
    * z-value: x takes the even bits, y the odd bits. */
  def zvalue16(qx: Column, qy: Column): Column =
    spreadBits16(qx).bitwiseOR(shiftleft(spreadBits16(qy), 1))

  /** Min-max quantize a nonnegative integral column into [0, 65535]:
    * `((v - min) * 65536) div (max - min + 1)` — exact, monotone in v,
    * and identical to DuckDB's `//` on the same inputs. The product is
    * taken in DECIMAL(38,0): a span wider than 2^47 would overflow the
    * long multiply and wrap the quantized value negative (snowflake-
    * style id magnitudes are exactly where that silent corruption would
    * land); decimal keeps the full product exact at any long span. */
  def quantize16(v: Column, minV: Column, maxV: Column): Column = {
    val dv = v.cast("long") - minV.cast("long")
    val span = maxV.cast("long") - minV.cast("long") + lit(1L)
    // Long fast path whenever the span provably cannot overflow the
    // product: dv ≤ span − 1, so dv·65536 < 2^63 iff span ≤ 2^47.
    // Decimal ops allocate per row and dominated the z-order scan
    // (measured ~2× the whole query at sf0.1); the long path computes
    // the IDENTICAL floored quotient for every span below the bound,
    // and the decimal path still covers snowflake-scale id spans
    // exactly. The branch condition is a constant per run (broadcast
    // stats), so codegen's lazy CASE WHEN never evaluates the decimal
    // expressions on the fast path.
    when(span <= lit(1L << 47),
      idiv(dv * lit(65536L), span))
      .otherwise(idiv(
        dv.cast("decimal(38,0)") * lit(65536L).cast("decimal(38,0)"),
        span.cast("decimal(38,0)")).cast("long"))
  }

  /** The per-row z-value frame: `df` plus `qx`, `qy`, `zvalue` columns
    * quantized against the table-global min/max of `xCol`/`yCol` (1-row
    * broadcast stats — the crossJoin is a bounded global aggregate). */
  def zorderFrame(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val stats = df.agg(
      min(col(xCol)).cast("long").as("__min_x"),
      max(col(xCol)).cast("long").as("__max_x"),
      min(col(yCol)).cast("long").as("__min_y"),
      max(col(yCol)).cast("long").as("__max_y"))
    df.crossJoin(broadcast(stats))
      .withColumn("qx", quantize16(col(xCol), col("__min_x"), col("__max_x")))
      .withColumn("qy", quantize16(col(yCol), col("__min_y"), col("__max_y")))
      .withColumn("zvalue", zvalue16(col("qx"), col("qy")))
      .drop("__min_x", "__max_x", "__min_y", "__max_y")
  }

  /** Rewrite `df` into `numFiles` parquet files clustered along the
    * z-curve of (`xCol`, `yCol`). One range shuffle; rows inside each
    * file are z-sorted so row-group stats stay tight too. */
  def clusteredWrite(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int): Unit =
    zorderFrame(df, xCol, yCol)
      .repartitionByRange(numFiles, col("zvalue"))
      .sortWithinPartitions(col("zvalue"))
      .drop("qx", "qy", "zvalue")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max statistics of two columns — the footer stats a
    * lakehouse reader prunes on, materialized as a frame so specs can
    * measure skippability (files whose box intersects a query box). */
  def fileStats(spark: SparkSession, path: String,
      xCol: String, yCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))

  /** Small-file compaction planner — the OPTIMIZE half of the layout
    * story: given a file manifest (unique file key, byte size), assign
    * each file to a compaction group by sequential bin fill along the
    * key order (group = exclusive-prefix-bytes div target), so adjacent
    * files — which under a clustered layout share key locality — merge
    * together and every output group lands in [target, target + max
    * file) bytes. Deterministic: the plan is a pure function of the
    * manifest and the target.
    *
    * Scale shape: the prefix sum is NOT a single-partition global
    * window (a 100 TB table's manifest is ~10^6 files — metadata-scale
    * but not one-task-scale). It is the classic two-pass distributed
    * scan: range-partition + sort by the file key, stage ONCE (pinning
    * one materialization so both passes see identical partition
    * boundaries — repartitionByRange samples its bounds per execution),
    * collect the P per-partition byte totals (P rows — the codebook
    * collect budget), then a single mapPartitions seeds each partition
    * with its exclusive offset and folds locally. Output is
    * boundary-independent: the exclusive prefix over a total order does
    * not depend on where the partitions were cut. */
  def compactionPlan(files: DataFrame, fileCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val spark = files.sparkSession
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    val staged = Checkpoints.stage(
      files.select(col(fileCol).cast("string").as("file"),
          col(bytesCol).cast("long").as("bytes"))
        .repartitionByRange(p, col("file"))
        .sortWithinPartitions(col("file")),
      eager = true)
    val sums = staged.groupBy(spark_partition_id().as("pid"))
      .agg(sum(col("bytes")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive offset of partition pid = bytes of all partitions
    // before it (range partitioning is ascending, so pid order IS the
    // global key order; empty partitions are simply absent and default
    // to whatever the nearest prior offset chain implies — their
    // mapPartitions sees no rows, so the seed is never used)
    val excl: Map[Int, Long] = sums.map(_._1).zip(
      sums.scanLeft(0L) { case (acc, (_, s)) => acc + s }.dropRight(1)).toMap
    staged.as[(String, Long)].mapPartitions { it =>
      var cum = excl.getOrElse(org.apache.spark.TaskContext.getPartitionId(), 0L)
      it.map { case (f, b) =>
        val before = cum
        cum += b
        (f, b, before, before / targetBytes)
      }
    }.toDF("file", "bytes", "cum_before", "grp")
  }

  /** Count the files a conjunctive box predicate must read under the
    * layout at `path` — i.e. files whose (x, y) bounding box intersects
    * the query box. The skipping metric: lower is better. */
  def filesTouched(spark: SparkSession, path: String,
      xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): Long =
    fileStats(spark, path, xCol, yCol)
      .filter(col("max_x") >= xLo && col("min_x") <= xHi &&
        col("max_y") >= yLo && col("min_y") <= yHi)
      .count()
}
