package graft.plans

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.SparkSpecBase

/** Job-count regression pins for the iterative family — the
  * host-noise-free barrier metric (`graft.CountJobs` is the manual
  * tool; this spec is its CI form). Every Spark job is a blocking
  * driver barrier, so the job count is the scheduling cost that
  * wall-clock benchmarks on a shared host keep mis-measuring — and,
  * unlike wall time, it is exactly reproducible per fixture.
  *
  * These pins also close PlanGuardSpec's acknowledged blind spot for
  * eagerly-staged subtrees (PlanGuardSpec.scala:38-45): the graph
  * queries stage their edge list DURING query construction, so a
  * cartesian product or stray barrier introduced into edge derivation
  * executes before the walked plan exists and PlanGuard never sees
  * it — but it cannot hide from the job counter, because a cartesian
  * over the fixture inflates the stage/job structure immediately.
  *
  * Bounds are the sf0.001 fixture's measured counts +20% headroom
  * (round counts are graph-structure-deterministic, so the measured
  * numbers are stable; the headroom absorbs benign Spark-internal
  * scheduling differences, not structural regressions). Measured on
  * the round-9 barrier-reduction work: representatives 40 (was ~111
  * shape-equivalent before AQE-off co-partitioned staging), pagerank
  * 15, mmr 53, kmeans 11, semdedup 14, clusters 27.
  */
class JobCountSpec extends SparkSpecBase {

  /** Run one registered query to the noop sink and count the jobs it
    * launches. The listener bus is async: poll until the counter is
    * stable for three consecutive 200 ms windows rather than sleeping
    * a fixed interval (the undercount failure mode ADVICE r8 flagged
    * in CountJobs). Counting is scoped to a per-test JOB GROUP so
    * suites running in parallel on the shared session cannot inflate
    * the number: jobs submitted from this thread carry the group id,
    * and AQE's async stage materializations inherit it too (Spark
    * captures the submitting thread's local properties into them). */
  private def countJobs(name: String): Int = {
    val fn = graft.SparkEntry.queries(name)
    val group = s"graft-jobcount-$name"
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (Option(js.properties)
            .exists(p => p.getProperty("spark.jobGroup.id") == group))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, s"job-count pin for $name")
    try {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      var stable = 0
      var last = -1
      while (stable < 3) {
        Thread.sleep(200)
        val now = jobs.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      last
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  private val bounds = Seq(
    // measured +20%, rounded up
    "q_dedup_representatives" -> 48,
    "q_sim_pagerank" -> 18,
    "q_knn_mmr" -> 64,
    "q_sim_kmeans" -> 14,
    "q_sim_semdedup" -> 17,
    "q_sim_clusters" -> 33,
    // r9-continuation additions with construction-time collects (the
    // NB class constants, the BPE per-round argmaxes) — the pin bounds
    // their metadata-collect budget the same way it bounds the graph
    // family's loop barriers
    "q_text_nb_classify" -> 30,
    "q_text_bpe_merges" -> 26,
    "q_text_bpe_tokens" -> 28,
    "q_dedup_incremental" -> 11,
    // round-9 layout/warehouse/sketch additions (measured via
    // CountJobs at sf0.001: 6 / 8 / 5 / 5 / 18) — flat pipelines whose
    // only legitimate barriers are the broadcast stats frames and, for
    // triangles, the shared staged pair generation
    "q_layout_zorder" -> 8,
    "q_index_bloom" -> 10,
    "q_events_scd2" -> 6,
    "q_corpus_cms_topk" -> 6,
    "q_sim_triangles" -> 22,
    // r10: kCore reworked onto the CC/PR loop discipline (AQE-off
    // co-partitioned rounds; convergence read off the staged edge
    // count) — 90 jobs before the rework, 36 measured after
    "q_sim_kcore" -> 44,
    // r10 additions (measured 6 / 13 / 17 / 6): balanced_sample carries
    // the Lloyd centroid collects, compaction the staged manifest +
    // partition-sum collect + target collect — the pins bound those
    // metadata collects like the rest of the construction-time family
    "q_media_phash_pairs" -> 8,
    "q_sim_balanced_sample" -> 16,
    "q_layout_compaction" -> 17, // 14 after the staged-manifest fix
    "q_events_anomaly" -> 8,
    // r10 second wave (measured 21 / 9): LPA is 4 fixed rounds on the
    // shared loop discipline (one vote + one update barrier per round
    // over the staged sym edges); HLL is a flat two-level aggregation
    "q_sim_lpa" -> 26,
    "q_corpus_distinct_hll" -> 11,
    // measured 14 / 8: recall carries the IVF leg's centroid collects;
    // the histogram sketch is a flat two-level aggregation + a bounded
    // per-source window
    "q_knn_recall" -> 17,
    "q_corpus_hist_pctl" -> 10,
    // measured 4: one narrow flatMap stage over the media scan + the
    // ordered sink — frame sampling must never shuffle
    "q_media_frame_sample" -> 5,
    // measured 41: the query runs CC TWICE by construction (it must
    // first build yesterday's corpus-only assignment before exercising
    // the label-contraction update; production persists the labels)
    "q_sim_clusters_incremental" -> 50,
    // measured 15: the build's staged tokenization + two index writes
    // dominate; the probe itself is the pruned-scan scoring join
    "q_search_bm25_index" -> 18,
    // measured 4: five checks, ONE scan + one aggregate — the whole
    // point of the declarative expectations engine
    "q_validate_expectations" -> 5,
    // measured 5: one two-phase bounded aggregation + the ordered
    // sink — per-group top-k must never plan a window sort
    "q_group_topk" -> 6,
    // measured 10 (r10) / 9 after the one-job fold of the two side
    // sketches: the remaining barriers are the folded sketch collect
    // (metadata-scale) + the exact-audit join
    "q_rel_join_card" -> 12,
    // r11 (measured 9 / 5 / 8): epoch shuffle is MintRank's two-pass
    // rank (count + stamp) + the 1-row count frame; json props is one
    // partial-combined aggregate; robust normalization is two bounded
    // per-source aggregates + their broadcasts
    "q_corpus_epoch_shuffle" -> 11,
    "q_events_json_props" -> 6,
    "q_text_quality_robust" -> 10,
    // measured 17: two MintRank passes (count + stamp, twice) + the
    // staged metadata-scale mixture frame and its broadcast
    "q_corpus_mix_order" -> 21)

  bounds.foreach { case (name, bound) =>
    test(s"$name stays within $bound driver barriers on the fixture") {
      val n = countJobs(name)
      assert(n > 0, s"$name launched no jobs — counter broken?")
      assert(n <= bound,
        s"$name launched $n jobs (bound $bound): a barrier regression " +
          "— look for new eager materializations, lost co-partitioning " +
          "in the loop stages, or a cartesian in edge derivation")
    }
  }
}
