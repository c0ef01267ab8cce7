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

  /** Reliable-mode LAZY stages persist their input so the deferred
    * checkpoint write reads the cache instead of recomputing — but the
    * cache must not outlive the write, or every pageRank /
    * connectedComponents / mmrTopK call leaks a MEMORY_AND_DISK frame
    * for the session lifetime (unbounded growth in a long-running
    * driver). Each lazy stage's (cache, checkpointed RDD) pair is
    * queued here and swept on every subsequent `stage` call:
    * `rdd.isCheckpointed` flips true exactly when the checkpoint files
    * exist (the deferred write runs at the end of the first job that
    * computes the RDD), at which point the files are the source of
    * truth and the cache is dropped. Iterative operators call `stage`
    * every round, so a converged loop carries at most the final lazy
    * frame until the next operator invocation sweeps it; `sweep()` is
    * public for callers that want a deterministic release point. */
  private val pendingUnpersist =
    new java.util.concurrent.ConcurrentLinkedQueue[
      (DataFrame, org.apache.spark.rdd.RDD[_])]()

  /** Bound on pending lazy-stage caches: a plan-only consumer in
    * reliable mode constructs lazy stages that may NEVER materialize,
    * so their queue entries would otherwise accumulate forever. Beyond
    * this many, the oldest cache is force-unpersisted and dropped —
    * semantically safe at any time: a deferred write that later runs
    * simply recomputes its subtree instead of reading the cache. */
  private val MaxPending = 32

  /** Release caches whose deferred reliable checkpoint has
    * materialized (plus the force-evicted overflow — see MaxPending).
    * Safe to call at any time from any thread; never loses data (an
    * evicted cache only costs a recompute if its write ever runs). */
  def sweep(): Unit = {
    val it = pendingUnpersist.iterator()
    while (it.hasNext) {
      val (cached, rdd) = it.next()
      if (rdd.isCheckpointed) {
        cached.unpersist(blocking = false)
        it.remove()
      }
    }
    while (pendingUnpersist.size() > MaxPending) {
      val oldest = pendingUnpersist.poll()
      if (oldest != null) oldest._1.unpersist(blocking = false)
    }
  }

  /** Spec surface: how many lazy-stage caches still await their
    * deferred checkpoint (post-sweep count pins the no-leak claim). */
  private[graft] def pendingCount: Int = { sweep(); pendingUnpersist.size() }

  /** Session conf key: set true to compile keepPartitioning stages
    * under AQE after all. The loop joins then pay a re-exchange of the
    * staged frames every round (checkpoint forgets partitioning under
    * AQE) but regain AQE's runtime skew-splitting — the right trade
    * for a graph with a GIANT component, where the CC pointer-halving
    * join's key (the candidate label) concentrates onto the component
    * minimum in late rounds and a static plan would funnel that
    * component's rows through one task. Default false: near-dup
    * components are typically small and exchange-free rounds win.
    * Results are identical either way (spec-pinned). */
  val LoopAqeKey = "spark.graft.loop.aqe"

  /** Free a staged frame's blocks NOW instead of waiting for
    * ContextCleaner's PERIODIC cycle (spark.cleaner.periodicGC.interval,
    * default 30 min): an iterative operator otherwise holds every prior
    * round's localCheckpoint blocks — rounds × |V| rows of dead storage
    * across a long CC/PageRank run (the r11 scale ladder measured a
    * 5.6× steady-time inflation at 200k from exactly this class of
    * leftover). ONLY call when the frame can never be read again: for
    * local checkpoints the cached blocks ARE the data (lineage is
    * truncated at the checkpoint), so a later read would fail rather
    * than recompute. The loop convention: release round i−1 right
    * after round i's EAGER stage materializes; never release the
    * predecessor of a LAZY final stage (its deferred job still reads
    * it) or the frame an operator returns.
    *
    * The frame must be backed by EXACTLY ONE staged input (one
    * LogicalRDD in its analyzed plan — the staged frame itself or a
    * cheap projection over it, like pageRank's `ids.withColumn`
    * round-1 frame). A composite frame — say a join of two staged
    * frames, one of them a SHARED input other plans still read — is
    * rejected loudly here: silently unpersisting every LogicalRDD it
    * references would free blocks whose lineage is truncated, and the
    * victim read fails with "checkpoint block not found" far from the
    * cause (local checkpoints cannot recompute). */
  def release(df: DataFrame): Unit = {
    val staged = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.distinct
    require(staged.length == 1,
      s"Checkpoints.release expects a frame backed by exactly one staged " +
        s"input (got ${staged.length} LogicalRDDs) — releasing a composite " +
        "frame would free shared staged blocks that other plans still read")
    staged.head.unpersist(blocking = false)
  }

  /** Transient staged frames (see [[stageTransient]]) awaiting release,
    * queued PER OWNING THREAD (r13 ADVICE: a JVM-global queue let one
    * pipeline's stageTransient sweep evict another thread's — or
    * session's — still-pending frame; correctness-safe via lineage but
    * a silent recompute of the corpus-scale scan the staging exists to
    * avoid). Each thread's stageTransient sweeps only its OWN prior
    * frames; queues whose owner thread has exited are reaped on any
    * later stageTransient call, and [[releaseTransients]] stays the
    * explicit global loop-boundary sweep. Releasing early only costs a
    * recompute (lineage is preserved), so sweeping stays aggressive. */
  private val transientQueues =
    new java.util.concurrent.ConcurrentHashMap[Thread,
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  private def drain(
      q: java.util.concurrent.ConcurrentLinkedQueue[DataFrame]): Unit = {
    var f = q.poll()
    while (f != null) {
      // two transient flavors share the queues: [[stageTransient]]
      // frames are persist-based (Dataset.unpersist frees the cache;
      // lineage preserved), while [[registerTransient]] frames are
      // staged through stageImpl — a bare LogicalRDD whose blocks only
      // free via the RDD (Dataset.unpersist is a no-op there). Match on
      // the exact output shape; a bare LogicalRDD can only be the
      // staged frame itself, never a shared upstream input.
      f.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => f.unpersist(blocking = false)
      }
      f = q.poll()
    }
  }

  private def reapDeadThreadQueues(): Unit = {
    val it = transientQueues.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!e.getKey.isAlive) { drain(e.getValue); it.remove() }
    }
  }

  /** Stage a compute-once/consume-within-ONE-plan frame (TF-IDF's tf
    * partials, unigramNll's vocab) with DETERMINISTIC release instead of
    * the wait-for-the-periodic-cleaner convention (r12 VERDICT #5: each
    * single-shot call leaked one MEMORY_AND_DISK frame for up to 30 min;
    * the r11 ladder measured 5.6× steady inflation when loops leak this
    * class of block).
    *
    * Unlike [[stage]], lineage is NOT truncated: the frame is persisted
    * and eagerly materialized (one job computes it once; every scan in
    * the consuming plan reads the cache), so releasing its blocks is
    * safe at ANY time — a later action simply recomputes from lineage
    * instead of failing on vanished checkpoint blocks. That safety is
    * what lets each `stageTransient` call sweep the CALLING THREAD's
    * prior transient frames (their consumers have run by then in every
    * registered-query flow; a plan still unmaterialized when its input
    * is swept degrades to recompute, never to wrong results — and since
    * r13's ADVICE, a concurrent pipeline on another thread is never the
    * victim), and lets batch drivers call [[releaseTransients]] at a
    * loop boundary for an exact zero.
    * Iterative operators must keep using [[stage]]: their loop rounds
    * need lineage truncation, and their predecessors are provably dead
    * — the stronger [[release]] applies there. */
  def stageTransient(df: DataFrame): DataFrame = {
    val own = transientQueues.computeIfAbsent(Thread.currentThread(),
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
    drain(own)
    reapDeadThreadQueues()
    val cached = df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count() // materialize NOW: one computation feeds all consumers
    own.add(cached)
    cached
  }

  /** Register a compute-once/consume-within-ONE-plan frame for shared,
    * DETERMINISTICALLY-released staging WITHOUT sweeping the thread's
    * prior transients and WITHOUT a materialization barrier (r14). The
    * frame stages through the same seam as [[stage]] (lazy
    * localCheckpoint by default, reliable checkpoint under [[DirKey]]) —
    * row-block storage, which measured ~1.8× faster end-to-end than the
    * columnar persist cache for the array-heavy frames this serves —
    * and is queued on the owning thread for the next
    * [[releaseTransients]] sweep. Unlike [[stageTransient]] it CHAINS
    * inside one not-yet-materialized plan (a sweep at call time would
    * evict the earlier link before its consumer ran), and unlike a bare
    * lazy localCheckpoint its blocks free at the next QUERY boundary
    * instead of waiting on driver GC + ContextCleaner — the r14
    * mid-round bench measured late-suite queries 2-3× inflated from
    * exactly that accumulation (SparkEntry sweeps before each
    * registered query's construction).
    *
    * Contract (the [[release]] rule, not the [[stageTransient]] one):
    * local-mode lineage is TRUNCATED, so reading the frame after its
    * sweep fails loudly — only register frames whose every consumer
    * runs before the next query boundary, which is true by construction
    * for query-internal shared subtrees. */
  def registerTransient(df: DataFrame): DataFrame = {
    val own = transientQueues.computeIfAbsent(Thread.currentThread(),
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
    reapDeadThreadQueues()
    val staged = stageImpl(df, eager = false)
    own.add(staged)
    staged
  }

  /** Release every outstanding transient AND staged frame now, across
    * ALL threads (idempotent; safe at any time for transients — see
    * [[stageTransient]]; staged frames are released on the
    * query-boundary contract below). Batch drivers running many
    * TF-IDF/NLL calls per session call this at their loop boundary. */
  def releaseTransients(): Unit = {
    val it = transientQueues.entrySet().iterator()
    while (it.hasNext) { drain(it.next().getValue); it.remove() }
    val it2 = stagedQueues.entrySet().iterator()
    while (it2.hasNext) { drain(it2.next().getValue); it2.remove() }
  }

  /** Every [[stage]]/[[stageObserved]] frame awaiting the QUERY-BOUNDARY
    * sweep (r14): loop predecessors are released round by round via
    * [[release]], but the frames that survive an operator — the staged
    * symmetric edge list, the lazy loop finals, the compute-once
    * assignment frames — used to wait on driver GC + the
    * ContextCleaner's periodic sweep, and the r14 mid-suite bench
    * measured late-suite queries up to 3× inflated from ~150 queries'
    * leftovers squeezing the storage pool (q_corpus_bigram_nll 2.94 s
    * in-suite vs 0.98 s isolated). Staged frames queue per owning
    * thread here and [[releaseTransients]] — which SparkEntry calls
    * before each registered query's construction — frees the blocks
    * deterministically. Contract: a staged frame's every consumer runs
    * before the next query boundary (true by construction — every
    * registered query computes from the parquet inputs; nothing staged
    * is shared across queries). Double-release with [[release]] is a
    * no-op (RDD.unpersist is idempotent). */
  private val stagedQueues =
    new java.util.concurrent.ConcurrentHashMap[Thread,
      java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  private def enqueueStaged(df: DataFrame): Unit = {
    // a dead thread's still-queued frames may have live consumers (a
    // Par worker's loop final, returned to the caller) — MIGRATE them
    // to the current thread's queue rather than draining (the
    // transient-queue reap may drain because transients recompute from
    // lineage; staged frames cannot)
    val own = stagedQueues.computeIfAbsent(Thread.currentThread(),
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
    val it = stagedQueues.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!e.getKey.isAlive) {
        var f = e.getValue.poll()
        while (f != null) { own.add(f); f = e.getValue.poll() }
        it.remove()
      }
    }
    own.add(df)
  }

  /** Move `threads`' queued staged frames onto the CALLING thread's
    * queue — [[Par]] calls this after joining its workers so a loop
    * final staged on a worker thread lives until the caller's query
    * boundary, never until a dead-thread reap. */
  private[ops] def adoptStagedFrom(threads: Seq[Thread]): Unit = {
    val own = stagedQueues.computeIfAbsent(Thread.currentThread(),
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
    threads.foreach { t =>
      val q = stagedQueues.remove(t)
      if (q != null) {
        var f = q.poll()
        while (f != null) { own.add(f); f = q.poll() }
      }
    }
  }

  /** Spec surface: outstanding staged frames across all threads. */
  private[graft] def stagedCount: Int = {
    var n = 0
    stagedQueues.values().forEach(q => n += q.size())
    n
  }

  /** Spec surface: outstanding transient frames across all threads. */
  private[graft] def transientCount: Int = {
    var n = 0
    transientQueues.values().forEach(q => n += q.size())
    n
  }

  /** Conf keys the loop-compile clone re-syncs from the parent on
    * every keepPartitioning stage: the seam's own routing key (reliable
    * vs local checkpointing) and the runtime cartesian guard (so a
    * guarded session's eagerly-staged subtrees compile under the guard
    * too, not past it). Everything else was copied at clone birth;
    * these are the ones tests and deployments flip mid-session. */
  private val SyncedKeys = Seq(DirKey,
    graft.plans.CartesianGuard.EnabledKey)

  /** The per-parent loop-compile clone (see stage): weak keys so a
    * discarded parent session releases its clone. The VALUE is a
    * WeakReference too — the clone strongly references its parent
    * (retained parentSessionState), so a strong value would keep the
    * weak KEY reachable through the map itself and no entry could ever
    * be collected (one full SessionState leaked per parent session in
    * apps that create many). SOFT, not weak: a weak value would be
    * cleared by any minor GC between loop rounds, recreating the clone
    * mid-loop and re-paying the ~20% per-call SessionState-cloning cost
    * the cache exists to avoid; a soft value survives routine GC and is
    * cleared (entry and all) only under actual memory pressure — before
    * an OOM, never instead of the cache. A cleared reference is just a
    * cache miss: the clone is recreated, correctness unchanged. */
  private val cloneCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.lang.ref.SoftReference[org.apache.spark.sql.SparkSession]]()

  private def loopCompileSession(
      parent: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val cached = cloneCache.get(parent)
    val live = if (cached != null) cached.get else null
    if (live != null) live
    else {
      val c = org.apache.spark.sql.GraftSqlBridge.cloneSession(parent)
      cloneCache.put(parent, new java.lang.ref.SoftReference(c))
      c
    }
  }

  /** Stage `df` with truncated lineage: reliable `checkpoint` when
    * [[DirKey]] is configured, `localCheckpoint` otherwise. `eager=false`
    * materializes on first action (construction-time staging of plan-only
    * consumers stays free — the PlanGuard constraint), `eager=true`
    * materializes now (iteration loops, where the frame is consumed
    * immediately and repeatedly).
    *
    * `keepPartitioning=true` compiles THIS staging without AQE so the
    * staged frame's hash partitioning AND ordering survive into the
    * LogicalRDD (under AQE, `Dataset.checkpoint` records
    * UnknownPartitioning — verified against Spark 4.1 — and every
    * downstream join then re-exchanges and re-sorts the staged scan).
    * The iterative graph family stages its loop frames this way: each
    * round's joins become statically co-partitioned, pre-sorted merge
    * joins in the `Graph.loopPartitions` layout, turning a per-round
    * |E| re-shuffle of the edge list into zero and each round's
    * materialization into a single driver barrier. Only use it for
    * loop-round frames whose subtree is already shape-pinned (stat-less
    * staged scans joined + one aggregate — the static planner keeps
    * them sort-merge) — AQE's runtime re-planning has nothing to add
    * there (set [[LoopAqeKey]] when it does — giant-component skew).
    * The AQE-off + partition pins live on a cached CLONED session
    * (own SQLConf, shared context/cache), so they are never visible to
    * any other thread of the parent — the compile happens at the
    * `stage` call even when lazy, entirely inside the clone. */
  def stage(df: DataFrame, eager: Boolean,
      keepPartitioning: Boolean = false,
      shufflePartitions: Option[Int] = None): DataFrame = {
    val out = stageExec(df, eager, keepPartitioning, shufflePartitions)._1
    enqueueStaged(out)
    out
  }

  /** As [[stage]] with eager materialization, additionally returning
    * the metrics a `Dataset.observe(name, exprs...)` node accumulated
    * DURING that materialization — read directly off the executed
    * plan's CollectMetrics accumulators (QueryExecution
    * .observedMetrics), NOT via an Observation listener. An Observation
    * registers on one session's listener bus, and the loop compile
    * runs in the cached cloned session whose bus predates the
    * registration — `Observation.get` would block forever (this hung
    * the r11 spec battery). The accumulator read is session-independent
    * and exactly-once for the single materialization job. */
  def stageObserved(df: DataFrame,
      keepPartitioning: Boolean = false,
      shufflePartitions: Option[Int] = None)
      : (DataFrame, Map[String, org.apache.spark.sql.Row]) = {
    val (out, executed) =
      stageExec(df, eager = true, keepPartitioning, shufflePartitions)
    enqueueStaged(out)
    (out, executed.queryExecution.observedMetrics)
  }

  /** Shared body: returns (result frame bound to the caller's session,
    * the frame whose QueryExecution actually ran — the metrics
    * surface). */
  private def stageExec(df: DataFrame, eager: Boolean,
      keepPartitioning: Boolean,
      shufflePartitions: Option[Int]): (DataFrame, DataFrame) = {
    val session = df.sparkSession
    val aqeRounds =
      session.conf.getOption(LoopAqeKey).exists(_.toBoolean)
    if (keepPartitioning && !aqeRounds) {
      // compile THIS staging in a CLONED session: shared SparkContext,
      // block-manager cache, and listener bus, but its OWN SQLConf —
      // so the AQE-off pin and the loop's spark.sql.shuffle.partitions
      // value are invisible to every other thread of the parent
      // session. (Until r11 this seam flipped the parent conf inside a
      // lock and documented the cross-thread visibility window as a
      // caveat; the clone removes the caveat instead of describing it.
      // No lock needed — nothing shared is mutated.) The staged result
      // is a LogicalRDD (a materialized RDD + schema + partitioning),
      // context-level state, so re-binding it to the parent session is
      // sound and downstream plans see the preserved layout.
      //
      // The partition pin itself: INTERMEDIATE exchanges in this
      // compile (a loop round's aggregate shuffle) take the loop's
      // measured partition count — with AQE off nothing coalesces at
      // runtime, so without the pin a 1-partition toy round still
      // launches conf-many near-empty tasks per aggregate.
      // loopPartitions caps at the session conf, so at deployment
      // scale the pinned value EQUALS the conf and this is a no-op.
      // One clone per parent session, cached weakly (cloning per stage
      // call measured ~20% on the kcore loop — SessionState cloning is
      // not free at a call per round). The lock serializes concurrent
      // keepPartitioning compiles on the SHARED clone (they may pin
      // different partition counts); the parent is never touched either
      // way. Seam-relevant keys that tests/deployments flip on the
      // parent AFTER the clone was born are re-synced per call.
      Checkpoints.synchronized {
        val clone = loopCompileSession(session)
        clone.conf.set("spark.sql.adaptive.enabled", "false")
        shufflePartitions match {
          case Some(p) =>
            clone.conf.set("spark.sql.shuffle.partitions", p.toString)
          case None => clone.conf.set("spark.sql.shuffle.partitions",
            session.conf.get("spark.sql.shuffle.partitions"))
        }
        SyncedKeys.foreach { k =>
          session.conf.getOption(k) match {
            case Some(v) => clone.conf.set(k, v)
            case None => clone.conf.unset(k)
          }
        }
        val rebound = org.apache.spark.sql.GraftSqlBridge.ofRows(
          clone, df.queryExecution.analyzed)
        val staged = stageImpl(rebound, eager)
        (org.apache.spark.sql.GraftSqlBridge.ofRows(
          session, staged.queryExecution.analyzed), rebound)
      }
    } else (stageImpl(df, eager), df)
  }

  private def stageImpl(df: DataFrame, eager: Boolean): DataFrame = {
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
        // every stage call is a sweep point: release prior lazy-stage
        // caches whose deferred write has since landed
        sweep()
        // RDD.doCheckpoint stops at the FIRST marked RDD in a job's
        // lineage and skips marked ancestors by default — so a lazy
        // stage consumed only by a later EAGER stage's job (whose root
        // is itself marked) would never get its deferred write, and in
        // AQE-off compiles there are no intermediate stage jobs on
        // unmarked RDDs to flush it either. Spark's documented escape
        // hatch is this local property: with it, every job checkpoints
        // ALL marked ancestors in its lineage. Thread-local, so set it
        // here (stage calls and the consuming actions share the
        // driver thread in batch flows).
        session.sparkContext.setLocalProperty(
          "spark.checkpoint.checkpointAllMarkedAncestors", "true")
        val cached = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = cached.checkpoint(eager)
        if (eager) cached.unpersist(blocking = false)
        else {
          // queue the cache for release once the deferred write lands
          out.queryExecution.logical.collectFirst {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }.foreach(rdd => pendingUnpersist.add((cached, rdd)))
        }
        out
      case None => df.localCheckpoint(eager)
    }
  }
}
