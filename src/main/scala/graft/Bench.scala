package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs the headline query set on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Each query is fully materialized through the `noop` sink — `count()`
  * would let Catalyst prune expensive aggregate/projection work and
  * under-report. Headline set mirrors BASELINE.md: CDC battery, master
  * upsert, ordered-group pipeline, window battery, validation battery,
  * plus the training-data additions (dedup, knn, text analysis).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq(
      "q_rel_pricing_summary", "q_rel_revenue_by_nation", "q_rel_top_customers",
      "q_cdc_process_list", "q_cdc_counts", "q_upsert_master",
      "q_group_ordered_concat", "q_group_renumber",
      "q_window_neighbor_fill", "q_window_proportional",
      "q_validate_coverage", "q_master_merge",
      "q_dedup_minhash_pairs", "q_dedup_simhash", "q_knn_brute",
      "q_text_stats", "q_text_quality",
      "q_events_windowed", "q_events_sessions",
      "q_pipe_chunks")

    val all = SparkEntry.queries
    // one warm-up materialization to amortize JIT/codegen compilation
    all("q_rel_part_stats")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val results = headline.flatMap { name =>
      all.get(name).map { fn =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
