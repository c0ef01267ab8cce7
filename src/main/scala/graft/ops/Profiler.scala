package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, TimestampType}

/** Column profiling — the first report a pipeline runs against an
  * unfamiliar table (the deequ/profiler shape): per column, row/null
  * counts, exact and approximate distinct cardinality, and typed
  * min/max.
  *
  * Two linear passes, NO Expand: pass A is one plain aggregate over one
  * scan (counts, nulls, min/max, `approx_count_distinct` — HLL++,
  * bounded state); pass B computes the EXACT distinct counts through a
  * narrow (column, value-string) explode whose first-level aggregate
  * partial-dedups map-side — the multi-`countDistinct` form this
  * replaces planned as an Expand that replicated the scan |cols|+1
  * times through wide aggregate buffers (measured 2.7× slower at
  * sf0.1). Value strings are Spark's casts, which are injective on the
  * profiled types (shortest-round-trip doubles, formatted timestamps),
  * so the counts equal typed distincts.
  *
  * At 100 TB the profile drops pass B and keeps the HLL++ estimate —
  * the emitted `approx_ok` audit column (relative error ≤ [[ApproxTol]]
  * against exact) is the evidence that swap is safe, measured per
  * column per run. Engines compute approx sketches with their own
  * implementations, so `approx_ok` is the HLL-report convention:
  * compare engine-side, emit the boolean.
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

  /** Column-pair dependence: mutual information I(X;Y) in nats between
    * two categorical columns, with both marginal entropies — the audit
    * behind "is `lang` redundant given `source`?" and stratification
    * design (NMI = mi / min(H) is one more division away). ONE scan:
    * the joint (x, y, count) aggregate is the only wide shuffle; both
    * marginals and the total ROLL UP from the joint (never a second
    * scan), join back broadcast (the joint's distinct-pair count is
    * bounded by the category product, metadata at any corpus size).
    *
    * Determinism (the corpus-battery ln9 contract): each term's ln is
    * computed on ONE double division of exact ints (c_xy·N and c_x·c_y
    * are exact below 2⁵³ for categorical cardinalities), rounded to 9;
    * per-cell products round to 9 then DECIMAL-sum; finals round to 6.
    * I(X;Y) = Σ (c_xy/N)·ln(c_xy·N / (c_x·c_y)) ≥ 0; H via the
    * vocabEntropy formulation. */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def ln9(c: org.apache.spark.sql.Column) = round(log(c), 9)
    val joint = Checkpoints.stage(
      df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
        .groupBy(col(xCol).as("x"), col(yCol).as("y"))
        .agg(count(lit(1)).as("cxy")),
      eager = true)
    val mx = joint.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
    val my = joint.groupBy(col("y")).agg(sum(col("cxy")).as("cy"))
    val tot = joint.agg(sum(col("cxy")).as("n"))
    def entropyOf(m: DataFrame, c: String) =
      m.crossJoin(broadcast(tot)) // 1-row total
        .select((round(col(c).cast("double") / col("n") *
          ln9(col(c).cast("double") / col("n")), 9))
          .cast("decimal(28,12)").as("plnp"))
        .agg((-sum(col("plnp")).cast("double")).as("h"))
    val mi = joint
      .join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(tot))
      .select(round(col("cxy").cast("double") / col("n") *
        ln9((col("cxy") * col("n")).cast("double") /
          (col("cx") * col("cy"))), 9)
        .cast("decimal(28,12)").as("term"))
      .agg(sum(col("term")).cast("double").as("mi"),
        count(lit(1)).as("n_cells"))
    mi.crossJoin(entropyOf(mx, "cx").select(col("h").as("hx")))
      .crossJoin(entropyOf(my, "cy").select(col("h").as("hy")))
      .crossJoin(broadcast(tot))
      .select(col("n").as("n_rows"), col("n_cells"),
        round(col("mi"), 6).as("mi_nats"),
        round(col("hx"), 6).as("h_x"),
        round(col("hy"), 6).as("h_y"),
        // a constant column has H = 0: NMI is undefined, not Infinity
        when(least(col("hx"), col("hy")) > 0,
          round(col("mi") / least(col("hx"), col("hy")), 6)).as("nmi"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c),
      s"profile: column $c not in ${df.schema.fieldNames.mkString(",")}"))
    def isNum(c: String) = types(c).isInstanceOf[NumericType]
    def isTs(c: String) = types(c) == TimestampType

    // pass A: one plain aggregate (no distinct rewrite, no Expand)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        approx_count_distinct(col(c)).as(s"${c}__ad"),
        min(col(c)).as(s"${c}__mn"),
        max(col(c)).as(s"${c}__mx"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)

    // pass B: exact distincts over narrow (col, value) rows; the first
    // aggregate dedups map-side, the second counts |cols| tiny groups
    val kv = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select(col("e.c").as("c"), col("e.v").as("v"))
      .where(col("v").isNotNull)
    val exact = kv.groupBy(col("c"), col("v")).agg(count(lit(1)).as("_x"))
      .groupBy(col("c")).agg(count(lit(1)).as("__nd"))

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
        col(s"${c}__ad").as("__ad"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
    }: _*)
    one.select(explode(entries).as("p")).select(col("p.*"))
      .join(broadcast(exact), col("col_name") === col("c"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("__nd"), lit(0L)).as("n_distinct"),
        (abs(col("__ad") - coalesce(col("__nd"), lit(0L))).cast("double") /
          coalesce(col("__nd"), lit(0L)).cast("double") <= ApproxTol)
          .as("approx_ok"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }
}
