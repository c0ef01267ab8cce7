package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over similarity/dedup graphs. PageRank
  * picks REPRESENTATIVE documents: in a near-dup cluster the member
  * most connected to everything else is the one to keep for training,
  * and centrality over the similarity graph is that signal.
  *
  * Determinism contract (the q_sim_pagerank oracle unrolls the same
  * steps as CTEs): ranks are rounded to 9 decimals after EVERY update,
  * per-vertex contribution sums run in DECIMAL(28,12) over 9-rounded
  * terms, so both engines walk identical values. Dangling-mass
  * redistribution is deliberately omitted (isolated vertices keep the
  * teleport term only) — fine for ranking, and it keeps the recurrence
  * local: each iteration is ONE equi-join on the edge list + ONE
  * groupBy, no global exchange beyond them.
  *
  * Scale: per iteration the shuffle volume is |E| (the contribution
  * join) — the standard distributed PageRank shape; `iters` bounds the
  * round count explicitly (no convergence loop to run away). */
object Graph {

  /** Symmetrized, staged edge list: each (a, b) pair in both directions
    * as (_s, _d), materialized once with truncated lineage so every
    * iterative consumer (CC rounds, PR iterations) re-reads staged
    * blocks instead of re-running the possibly-expensive pair
    * generation. */
  private[graft] def stagedSym(pairs: DataFrame,
      aCol: String, bCol: String): DataFrame =
    Checkpoints.stage(
      pairs.select(col(aCol).as("_s"), col(bCol).as("_d"))
        .union(pairs.select(col(bCol).as("_s"), col(aCol).as("_d"))),
      eager = true)

  /** Undirected PageRank: `pairs` lists each edge once (a, b); both
    * directions are materialized internally. Emits
    * (id, degree, pagerank) for every vertex in `vertices`. */
  def pageRank(vertices: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame =
    pageRankSym(vertices, idCol, stagedSym(pairs, aCol, bCol),
      iters, damping)

  /** PageRank over an ALREADY-staged symmetric (_s, _d) edge list —
    * the shared-sym entry `clusterRepresentatives` uses so CC and PR
    * materialize the edge list once between them, not once each. */
  private[graft] def pageRankSym(vertices: DataFrame, idCol: String,
      sym: DataFrame, iters: Int, damping: Double): DataFrame = {
    val n = vertices.count()
    // plain IEEE divide — the same operation the mirror SQL performs
    val teleport = (1 - damping) / n
    val deg = sym.groupBy(col("_s")).agg(count(lit(1)).as("_deg"))
    // lazy: only iteration 1 reads ids (later rounds read their own
    // staged predecessor), so the first round's job materializes it —
    // no standalone barrier
    val ids = Checkpoints.stage(
      vertices.select(col(idCol).as("_id"))
        .join(deg, col("_id") === col("_s"), "left")
        .select(col("_id"), coalesce(col("_deg"), lit(0L)).as("_deg")),
      eager = false)
    val r0 = round(lit(1.0) / n, 9)
    val init = ids.withColumn("_r", r0)
    val ranked = (1 to iters).foldLeft(init) { (ranks, i) =>
      val contribs = ranks
        .join(sym, col("_id") === col("_s"))
        .select(col("_d"),
          round(col("_r") / col("_deg"), 9)
            .cast("decimal(28,12)").as("_c"))
        .groupBy(col("_d"))
        .agg(sum(col("_c")).as("_in"))
      // the LAST iteration's stage is lazy: no further round re-reads
      // it, so the final sink action materializes it — one fewer
      // blocking driver barrier per pageRank call
      Checkpoints.stage(
        ranks.join(contribs, col("_id") === col("_d"), "left")
          .select(col("_id"), col("_deg"),
            round(lit(teleport) +
              lit(damping) * coalesce(col("_in").cast("double"), lit(0.0)), 9)
              .as("_r")),
        eager = i < iters)
    }
    ranked.select(col("_id").as(idCol), col("_deg").as("degree"),
      round(col("_r"), 6).as("pagerank"))
  }

  /** Cluster-representative selection — the production keep decision of a
    * near-dup pipeline (the SemDeDup/D4 shape): vertices are grouped into
    * connected components of the similarity graph, every member is ranked
    * by PageRank centrality over the SAME edge list, and the most central
    * member of each cluster is kept (ties broken by smallest id, on the
    * 6-rounded pagerank both engines emit).
    *
    * The selection is a skew-safe `groupBy(cluster).min(struct(-pagerank,
    * id))` + join-back — NOT a per-cluster window: a giant boilerplate
    * cluster (the case dedup exists for) must not funnel every member
    * into one task's sort. Negating the rank turns "max pagerank, then
    * min id" into a single struct-min, which gets a map-side partial
    * combine. pagerank ≥ teleport > 0, so the negation never meets -0.0. */
  def clusterRepresentatives(vertices: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    // both consumers re-scan the edge list many times (CC rounds, PR
    // iterations); materialize ONE symmetrized staged frame and share
    // it — previously edges, CC's sym, and PR's sym were three separate
    // |E|-scale eager materializations of the same data (three blocking
    // driver barriers), now it is one
    val sym = stagedSym(pairs, aCol, bCol)
    val cc = Dedup.connectedComponentsSym(vertices, idCol, sym)
    val pr = pageRankSym(vertices, idCol, sym, iters, damping)
    val members = cc.join(pr, idCol)
    val best = members.groupBy(col("cluster_id"))
      .agg(min(struct((-col("pagerank")).as("np"), col(idCol).as("i")))
        .as("_best"))
      .select(col("cluster_id"), col("_best").getField("i").as("_rep_id"))
    members.join(best, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("degree"), col("pagerank"),
        (col(idCol) === col("_rep_id")).as("is_representative"))
  }
}
