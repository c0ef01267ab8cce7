package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncation seam for every staged materialization in the
  * engine — the iterative operators (PageRank, connected components,
  * the LSH pair generator, the MMR greedy fold), whose loop rounds must
  * cut plan lineage or the optimizer re-derives an ever-growing tree,
  * AND the compute-once/consume-many frames (BM25 term base, bigram/
  * unigram vocab tables, winnow fingerprints, k-means assignments,
  * temperature strata). HOW lineage is cut is a deployment decision,
  * not an algorithm one, so no operator calls localCheckpoint directly.
  *
  * - Default (`spark.graft.checkpoint.dir` unset): `localCheckpoint` —
  *   blocks live on executor local storage with truncated lineage. Fast,
  *   zero-config, correct on `local[*]` and for short jobs. On a real
  *   cluster a LOST EXECUTOR makes those blocks unrecoverable (the
  *   lineage that could rebuild them was truncated away), failing the
  *   job — an availability risk for a multi-hour 100 TB PageRank.
  * - Reliable (`spark.graft.checkpoint.dir` = a fault-tolerant path,
  *   e.g. HDFS/object store): `Dataset.checkpoint` writes the staged
  *   frame there, so iteration state survives executor loss and the job
  *   resumes from the last round instead of dying. The extra cost is one
  *   distributed write+read per staged frame — the standard trade for
  *   long iterative jobs.
  *
  * ReliableCheckpointSpec pins output equality between the two modes
  * (same hash either way — this seam changes fault-tolerance, never
  * results).
  */
object Checkpoints {

  /** Session conf key: directory for reliable checkpoints. Unset (the
    * default) selects `localCheckpoint`. */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Stage `df` with truncated lineage: reliable `checkpoint` when
    * [[DirKey]] is configured, `localCheckpoint` otherwise. `eager=false`
    * materializes on first action (construction-time staging of plan-only
    * consumers stays free — the PlanGuard constraint), `eager=true`
    * materializes now (iteration loops, where the frame is consumed
    * immediately and repeatedly). */
  def stage(df: DataFrame, eager: Boolean): DataFrame = {
    val session = df.sparkSession
    session.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = session.sparkContext
        // setCheckpointDir appends a per-context UUID subdir and resolves
        // to a full URI — only (re-)set when the context's current dir's
        // PARENT is not exactly the configured path (repeated re-sets
        // would scatter rounds across UUID dirs; a raw substring check
        // would silently keep routing to a stale dir when the conf
        // changes to a prefix of the old one, e.g. ckpt2 -> ckpt)
        val normalized = new org.apache.hadoop.fs.Path(dir).toUri.getPath
        val currentParent = sc.getCheckpointDir.map(d =>
          new org.apache.hadoop.fs.Path(d).getParent.toUri.getPath)
        if (!currentParent.contains(normalized))
          sc.setCheckpointDir(dir)
        // Dataset.checkpoint recomputes the subtree for the checkpoint
        // write unless the frame is persisted first (Spark's documented
        // behavior) — without this, every eager round pays its
        // join+agg twice. Persist, checkpoint, then drop the cache for
        // eager stages (the checkpoint files are now the source of
        // truth); lazy stages keep the cache so the deferred write at
        // first action reads it instead of recomputing.
        val cached = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = cached.checkpoint(eager)
        if (eager) cached.unpersist(blocking = false)
        out
      case None => df.localCheckpoint(eager)
    }
  }
}
