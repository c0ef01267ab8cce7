package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, TimestampType}

/** Column profiling — the first report a pipeline runs against an
  * unfamiliar table (the deequ/profiler shape): per column, row/null
  * counts, exact and approximate distinct cardinality, and typed
  * min/max. One aggregate over one scan produces a single wide row that
  * explodes into |cols| output rows — no per-column scans, no shuffle
  * beyond the aggregate itself.
  *
  * Scale notes: the EXACT `countDistinct` columns are the oracle
  * surface — Spark plans multi-distinct aggregates via Expand (the scan
  * is replicated per distinct column inside one stage, never re-read).
  * At 100 TB the profile drops them and keeps `approx_count_distinct`
  * (HLL++, one pass, bounded state) — the emitted `approx_ok` audit
  * column (relative error ≤ 5% against exact) is the evidence that
  * swap is safe, measured per column per run (tolerance [[ApproxTol]]).
  * Engines compute approx sketches with their own implementations, so
  * `approx_ok` is the HLL-report convention: compare engine-side, emit
  * the boolean.
  *
  * Min/max are emitted typed: numerics as 6-rounded doubles
  * (min_num/max_num), strings lexicographically and timestamps
  * formatted UTC (min_str/max_str) — no raw timestamps or floats in
  * the output (the hash-compare contract). */
object Profiler {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** approx-vs-exact audit tolerance: Spark's default HLL++ rsd is 5%
    * (1σ), so 15% ≈ 3σ keeps the boolean stable while still catching a
    * broken sketch; each engine audits its OWN sketch. */
  val ApproxTol = 0.15

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c),
      s"profile: column $c not in ${df.schema.fieldNames.mkString(",")}"))
    def isNum(c: String) = types(c).isInstanceOf[NumericType]
    def isTs(c: String) = types(c) == TimestampType

    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        approx_count_distinct(col(c)).as(s"${c}__ad"),
        min(col(c)).as(s"${c}__mn"),
        max(col(c)).as(s"${c}__mx"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = array(cols.map { c =>
      val mn = col(s"${c}__mn")
      val mx = col(s"${c}__mx")
      val (minNum, maxNum) =
        if (isNum(c)) (round(mn.cast("double"), 6), round(mx.cast("double"), 6))
        else (lit(null).cast("double"), lit(null).cast("double"))
      val (minStr, maxStr) =
        if (isTs(c)) (date_format(mn, TsFmt), date_format(mx, TsFmt))
        else if (isNum(c)) (lit(null).cast("string"), lit(null).cast("string"))
        else (mn.cast("string"), mx.cast("string"))
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        (abs(col(s"${c}__ad") - col(s"${c}__nd")).cast("double") /
          col(s"${c}__nd").cast("double") <= ApproxTol).as("approx_ok"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
    }: _*)
    one.select(explode(entries).as("p")).select(col("p.*"))
  }
}
