package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift monitoring — the report a daily-refresh pipeline runs
  * between yesterday's snapshot and today's before letting the new data
  * into training: per-source volume shift, vocabulary distribution
  * shift, and length distribution shift.
  *
  * Metric choices are deliberately TRANSCENDENTAL-FREE (total variation
  * distance and the Kolmogorov–Smirnov statistic, not KL/JS): every
  * number here is built from counts with IEEE-754 basic ops (÷, −, ×,
  * max), which are bit-deterministic across engines — ln/exp are
  * correctly-rounded only per-library, and the r11 percentile saga
  * showed what one ulp does to a 6-digit hash gate. TVD and KS carry
  * the same decision signal for drift thresholds.
  *
  * Scale posture: one word-count aggregate per side (map-side partial),
  * one length histogram per side, a full-outer merge on bounded keys
  * (distinct words / distinct lengths per source — domain-bounded, not
  * corpus-bounded), and windows partitioned by SOURCE over those
  * bounded domains only. No window ever spans document rows.
  */
object Drift {

  /** Per-source drift report between two corpus snapshots.
    * Output: source, n_old, n_new, count_ratio (new/old, NULL when no
    * old), vocab_tvd ∈ [0,1] (½·Σ|p_w − q_w| over the union vocab),
    * ks_len ∈ [0,1] (max CDF gap over the length distribution). A
    * source present on only one side reports TVD/KS = 1 (total drift,
    * by convention: the other side's distribution is empty). */
  def report(oldDocs: DataFrame, newDocs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    def words(df: DataFrame) = df
      .select(col(sourceCol).as("src"),
        explode(split(col(textCol), "\\s+")).as("w"))
    def wcounts(df: DataFrame, side: String) = words(df)
      .groupBy(col("src"), col("w"))
      .agg(count(lit(1)).as(s"c_$side"))
    def totals(df: DataFrame, side: String) = df
      .groupBy(col(sourceCol).as("src"))
      .agg(count(lit(1)).as(s"n_$side"))

    val tot = totals(oldDocs, "old")
      .join(totals(newDocs, "new"), Seq("src"), "full_outer")
      .select(col("src"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))

    // vocabulary TVD: ½ Σ_w |c_old/W_old − c_new/W_new| over the union
    // vocab; per-side word totals from one extra aggregate
    val wc = wcounts(oldDocs, "old")
      .join(wcounts(newDocs, "new"), Seq("src", "w"), "full_outer")
      .select(col("src"), col("w"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
    val wtot = wc.groupBy(col("src"))
      .agg(sum(col("c_old")).as("w_old"), sum(col("c_new")).as("w_new"))
    val tvd = wc.join(wtot, "src")
      .select(col("src"),
        // |p − q| per word; decimal sum keeps the Σ order-independent
        abs(when(col("w_old") > 0, col("c_old") / col("w_old").cast("double"))
          .otherwise(lit(0.0)) -
          when(col("w_new") > 0, col("c_new") / col("w_new").cast("double"))
            .otherwise(lit(0.0))).cast("decimal(28,18)").as("d"))
      .groupBy(col("src"))
      // decimal Σ (order-independent), THEN double, THEN the exact /2 —
      // decimal division rules differ per engine, double halving is IEEE
      .agg(round(sum(col("d")).cast("double") / 2, 6).as("vocab_tvd"))

    // length KS: max |F_old(x) − F_new(x)| over the union of observed
    // lengths; cumulative counts via a window over the BOUNDED
    // per-source length domain
    def lcounts(df: DataFrame, side: String) = df
      .select(col(sourceCol).as("src"),
        length(col(textCol)).cast("long").as("len"))
      .groupBy(col("src"), col("len"))
      .agg(count(lit(1)).as(s"c_$side"))
    val lc = lcounts(oldDocs, "old")
      .join(lcounts(newDocs, "new"), Seq("src", "len"), "full_outer")
      .select(col("src"), col("len"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
    val cumW = Window.partitionBy(col("src")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ks = lc
      .withColumn("cum_old", sum(col("c_old")).over(cumW))
      .withColumn("cum_new", sum(col("c_new")).over(cumW))
      .join(lc.groupBy(col("src"))
        .agg(sum(col("c_old")).as("t_old"), sum(col("c_new")).as("t_new")),
        "src")
      .select(col("src"),
        abs(when(col("t_old") > 0,
            col("cum_old") / col("t_old").cast("double")).otherwise(lit(0.0)) -
          when(col("t_new") > 0,
            col("cum_new") / col("t_new").cast("double")).otherwise(lit(0.0)))
          .as("gap"))
      .groupBy(col("src"))
      .agg(round(max(col("gap")), 6).as("ks_len"))

    // a one-sided source is total drift by CONVENTION (the formulas
    // against an empty side give TVD ½ and KS 1 — pin both to 1)
    val oneSided = col("n_old") === 0 || col("n_new") === 0
    tot.join(tvd, Seq("src"), "left")
      .join(ks, Seq("src"), "left")
      .select(col("src").as(sourceCol), col("n_old"), col("n_new"),
        when(col("n_old") > 0,
          round(col("n_new") / col("n_old").cast("double"), 6))
          .as("count_ratio"),
        when(oneSided, lit(1.0)).otherwise(col("vocab_tvd"))
          .as("vocab_tvd"),
        when(oneSided, lit(1.0)).otherwise(col("ks_len")).as("ks_len"))
  }
}
