package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.execution.SparkPlan

/** Plan-regression gate: the scale properties the engine is designed
  * around, asserted on the optimized physical plans so a future edit that
  * silently reintroduces a cartesian product, a single-partition window,
  * or an unpruned scan fails CI — not a 100 TB run.
  */
class PlanGuardSpec extends SparkSpecBase {

  private def planOf(name: String): SparkPlan =
    graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      // AQE wraps the real plan; before execution its children are empty
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.inputPlan)
      case other => other.children
    }
    (p +: kids.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
  }

  private def names(name: String): Seq[String] =
    nodes(planOf(name)).map(_.nodeName)

  // ---- default-deny cartesian/unbounded-broadcast sweep -------------------
  //
  // EVERY registered query's physical plan is walked; a CartesianProduct
  // anywhere, or a BroadcastNestedLoopJoin whose broadcast side is not
  // structurally bounded, fails unless the query carries a labeled
  // allowlist entry below. A future query that accidentally composes a
  // cross join therefore cannot ship unguarded (the r7 review's ask:
  // the clean plan audit as an invariant, not a point-in-time fact).
  //
  // Graph queries caveat: Graph.pageRank eagerly stages its edge list
  // (Checkpoints.stage), so a cartesian INSIDE the edge derivation would
  // execute during query construction without surfacing in the final
  // plan this spec walks. The binding regression gate for those is the
  // two-staged oracle instead: it reads the ADAPTIVE pair parquet, so an
  // edge-derivation swap back to the O(N²) test oracle changes the
  // result set and fails CORRECTNESS, not just a plan lint.

  // No registered query is permitted a CartesianProduct today. If a
  // deliberate one ever becomes necessary, it must be named here WITH a
  // reason, and the sweep will then require it to stay present.
  private val allowCartesian = Map.empty[String, String]

  // BroadcastNestedLoopJoin build sides that are NOT structurally 1-row
  // (global aggregate / limit / literal frame) but are deliberately
  // broadcast bounded sets. Each entry is a labeled exception with the
  // reason it is scale-safe; the sweep also fails if an entry goes
  // stale (no longer triggers), so the list cannot rot.
  private val allowBnljBuild = Map(
    "q_knn_brute" -> ("exact ANN baseline (labeled non-scale path): " +
      "broadcasts the fixed filter-selected probe-vector set against a " +
      "single linear corpus scan — linear in corpus, never quadratic"),
    "q_knn_recall" -> ("recall evaluation composes the q_knn_brute " +
      "baseline as its exact leg — the same fixed probe-set broadcast; " +
      "the IVF leg and the intersection are equi-joins"),
    // q_knn_mips moved off this list in r15: its probe-set BNLJ now sits
    // BELOW the orderedSmall staging boundary (the registered plan
    // truncates at the staged LogicalRDD), so the sweep cannot see it —
    // the dedicated scale-seam test below keeps policing the operator's
    // subtree through SimilarityQueries.knnMipsScale.
    // q_knn_pq moved off this list with q_knn_mips (r15) — same
    // orderedSmall truncation, same scale-seam test below.
    "q_search_hybrid_rrf" -> ("hybrid retrieval broadcasts the fixed " +
      "probe set for the vector leg (the BM25 leg is equi-joined)"),
    "q_chapter_assign" -> ("T15 interval-overlap range join: broadcasts " +
      "the chapter-interval dimension (distinct chapters — " +
      "metadata-scale) under the pages scan"))

  // Fixture-audit note (NOT an allowlist entry — its joins are plain
  // equi-joins and pass the sweep untouched): q_rel_join_card's
  // exact_* columns come from a full-outer DISTINCT-key audit join
  // that exists to measure the KMV estimator's error on the fixture.
  // At 100 TB only the sketch legs would run (two ≤256-long partials
  // folded in ONE union job — Sketches.kmvOverlap) and the audit
  // columns would be dropped with their join; this is by intent, not
  // an oversight.

  /** Structurally bounded broadcast side: a global aggregate (exactly one
    * row), an explicit limit, or a literal frame — walked down through
    * row-preserving wrappers only, so an unbounded scan can never be
    * masked by an unrelated bounded branch. */
  private def boundedBuild(p: SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.{ProjectExec, FilterExec, SortExec,
      TakeOrderedAndProjectExec, GlobalLimitExec, CollectLimitExec,
      LocalLimitExec, LocalTableScanExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    p match {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
           _: CollectLimitExec | _: LocalLimitExec => true
      case _: LocalTableScanExec => true // literal frame, driver-sized
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        boundedBuild(a.inputPlan)
      case n if n.isInstanceOf[ProjectExec] || n.isInstanceOf[FilterExec] ||
        n.isInstanceOf[SortExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange] ||
        n.nodeName.contains("WholeStageCodegen") ||
        n.nodeName == "InputAdapter" ||
        n.nodeName.contains("QueryStage") ||
        n.nodeName.contains("ReusedExchange") ||
        n.nodeName.contains("AQEShuffleRead") =>
        n.children.exists(boundedBuild)
      case _ => false
    }
  }

  test("default-deny: no CartesianProduct in any registered query plan") {
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      val cart = names(q).filter(_.contains("CartesianProduct"))
      if (allowCartesian.contains(q))
        assert(cart.nonEmpty, s"stale allowlist entry: $q no longer has a " +
          "CartesianProduct — remove it from allowCartesian")
      else assert(cart.isEmpty, s"$q contains $cart (not allowlisted)")
    }
  }

  test("default-deny: every BroadcastNestedLoopJoin broadcasts a bounded side") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      val unbounded = nodes(planOf(q)).collect {
        case b: BroadcastNestedLoopJoinExec =>
          val build =
            if (b.buildSide.toString.contains("Left")) b.left else b.right
          (b, build)
      }.filterNot { case (_, build) => boundedBuild(build) }
      if (allowBnljBuild.contains(q))
        assert(unbounded.nonEmpty, s"stale allowlist entry: $q no longer " +
          "has a non-1-row BNLJ build side — remove it from allowBnljBuild")
      else assert(unbounded.isEmpty,
        s"$q broadcasts an unbounded side through BroadcastNestedLoopJoin " +
          s"(not allowlisted): ${unbounded.map(_._2.nodeName)}")
    }
  }

  test("staged ANN scale subtrees still broadcast exactly the probe set") {
    // q_knn_mips' and q_knn_pq's deliberate non-1-row BNLJs (the fixed
    // filter-selected probe-vector set against one linear corpus scan)
    // moved below the orderedSmall staging boundary in r14, out of the
    // registered-plan sweep's sight. Keep the exceptions honest the same
    // way the allowlist's staleness check did: each operator's subtree
    // (through its seam) must still carry one, and nothing else
    // unbounded.
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val seams = Seq(
      "q_knn_mips" -> graft.queries.SimilarityQueries.knnMipsScale _,
      "q_knn_pq" -> graft.queries.SimilarityQueries.knnPqScale _)
    seams.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      assert(!nodes(plan).exists(_.nodeName.contains("CartesianProduct")),
        s"$name scale subtree grew a CartesianProduct")
      val unbounded = nodes(plan).collect {
        case b: BroadcastNestedLoopJoinExec =>
          val build =
            if (b.buildSide.toString.contains("Left")) b.left else b.right
          (b, build)
      }.filterNot { case (_, build) => boundedBuild(build) }
      assert(unbounded.nonEmpty,
        s"stale exception: $name no longer has a non-1-row BNLJ build " +
          "side below the staging boundary — fold it back into the sweep")
      // every non-1-row build must be a narrow probe-set projection
      // (an id plus at most the probe vector / its derived table) —
      // the same labeled-waiver shape the allowlist documented; a wide
      // corpus-side frame can never slip in under this exception
      unbounded.foreach { case (_, build) =>
        assert(build.output.size <= 3 &&
          build.output.exists(a =>
            a.name.contains("id") || a.name.contains("vec")),
          s"$name BNLJ build side is not the probe set: ${build.output}")
      }
    }
  }

  test("no single-partition window stages anywhere in the query surface") {
    import org.apache.spark.sql.execution.window.WindowExec
    // A global window is a scale hazard only when its input is unbounded.
    // A WindowExec sitting above a limit (the top-k-then-rank idiom:
    // TakeOrderedAndProject pushes the heavy work distributed, the window
    // ranks ≤ k rows) is bounded by construction and allowed.
    //
    // The limit must sit on the window's DIRECT input path — we walk down
    // only through row-preserving structural nodes (Project/Sort/Exchange
    // and the codegen/AQE wrappers). An unrelated limit deep in some other
    // branch (e.g. a limited dimension side of a join) must NOT mask a
    // genuinely unbounded single-partition window.
    import org.apache.spark.sql.execution.{ProjectExec, SortExec,
      TakeOrderedAndProjectExec, GlobalLimitExec, CollectLimitExec,
      LocalLimitExec}
    def bounded(p: SparkPlan): Boolean = p match {
      case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
           _: CollectLimitExec | _: LocalLimitExec => true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        bounded(a.inputPlan)
      case n if n.isInstanceOf[ProjectExec] || n.isInstanceOf[SortExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange] ||
        n.nodeName.contains("WholeStageCodegen") ||
        n.nodeName == "InputAdapter" ||
        n.nodeName.contains("QueryStage") ||
        n.nodeName.contains("AQEShuffleRead") =>
        n.children.exists(bounded)
      case _ => false
    }
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      val unpartitioned = nodes(planOf(q)).collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
          !bounded(w.child) => w
      }
      assert(unpartitioned.isEmpty,
        s"$q has an unbounded global (single-partition) WindowExec")
    }
  }

  test("near-dup candidate exchanges move ids only, never the vectors") {
    // the r7 regression this pins: cosinePairsCore once carried both
    // 64-dim vectors through the (table,bucket) self-join and the pair
    // dedup — O(candidates × dims) shuffle, measured 21s vs 4.7s at
    // sf0.1. Every shuffle below the pair-dedup aggregate must carry
    // only scalar columns; the arrays may appear only in the verify
    // joins above it.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.types.ArrayType
    // the REGISTERED q_sim_cosine_pairs plan truncates at the
    // orderedSmall lazy-checkpoint LogicalRDD (r14), hiding the pair
    // generator — walk the operator's scale subtree through the seam
    val plan = graft.queries.SimilarityQueries
      .cosinePairsScale(spark, sfDir).queryExecution.executedPlan
    // the pair-dedup aggregate groups by (vec_a, vec_b)
    val dedups = nodes(plan).collect {
      case a: BaseAggregateExec
        if a.groupingExpressions.size == 2 &&
          a.groupingExpressions.forall(_.references.forall(r =>
            r.name == "vec_a" || r.name == "vec_b")) => a
    }
    assert(dedups.nonEmpty, "pair-dedup aggregate not found in the plan")
    val arrayShuffles = dedups.flatMap(nodes(_)).collect {
      case e: ShuffleExchangeExec
        if e.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
    }
    assert(arrayShuffles.isEmpty,
      s"vector arrays crossing a candidate/dedup exchange: $arrayShuffles")
  }

  test("line dedup keeps its skew-safe shape on the registered query") {
    // the hot keys of C4 line dedup ARE the duplicated lines: the
    // first-occurrence pass must stay a partial-combinable aggregate
    // (ObjectHash/Sort aggregate with a Partial min), never a window
    // partitioned by the line value
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Min, Partial}
    val all = nodes(planOf("q_corpus_line_dedup"))
    val lineWindows = all.collect {
      case w: WindowExec
        if w.partitionSpec.exists(_.references.exists(_.name == "line")) => w
    }
    assert(lineWindows.isEmpty, "per-line window reintroduced (skew hotspot)")
    assert(all.exists {
      case a: BaseAggregateExec => a.aggregateExpressions.exists(ae =>
        ae.mode == Partial && ae.aggregateFunction.isInstanceOf[Min])
      case _ => false
    }, "expected a map-side partial min(struct) first-occurrence pass")
  }

  test("projection pruning reaches the parquet scan") {
    // q_text_quality projects 2 derived columns from a 1-table scan: the
    // scan must not read the full documents schema
    val scans = nodes(planOf("q_text_quality")).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val cols = s.requiredSchema.fieldNames.toSet
      assert(cols.subsetOf(Set("doc_id", "text")),
        s"scan reads more than needed: $cols")
    }
  }

  test("filter pushdown reaches the scan for selective queries") {
    val scans = nodes(planOf("q_sample_chapters")).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_ != "[]")),
      "no pushed filters on a filtered scan")
  }

  test("small dimension joins broadcast in the relational battery") {
    val n = names("q_rel_revenue_by_nation")
    assert(n.exists(_.contains("BroadcastHashJoin")),
      s"expected a broadcast join, got: ${n.distinct.mkString(", ")}")
  }

  test("bucketed tables co-locate the big join: zero exchanges") {
    // the 100 TB CDC-join strategy from README: bucket both sides on the
    // join key and the shuffle disappears — proven here on the session
    // catalog, not just claimed
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets")
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    val od = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    try {
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/li").saveAsTable("b_lineitem")
      od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/od").saveAsTable("b_orders")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        val shuffles = nodes(joined.queryExecution.executedPlan)
          .filter(_.nodeName.contains("Exchange"))
        assert(shuffles.isEmpty,
          s"bucketed join still shuffles: ${shuffles.map(_.nodeName)}")
        assert(joined.count() > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
