package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Graph.pageRank semantics: centrality ordering on a star, teleport-only
  * mass for isolated vertices, determinism on the fixture graph. */
class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("star graph: center outranks leaves; isolated vertex keeps teleport") {
    val vertices = (0L to 4L).toDF("id")          // 4 = isolated
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val out = Graph.pageRank(vertices, "id", pairs, "a", "b")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val byId = out.map(x => x._1 -> x).toMap
    assert(byId(0L)._2 === 3L && byId(1L)._2 === 1L && byId(4L)._2 === 0L)
    assert(byId(0L)._3 > byId(1L)._3)
    assert(byId(1L)._3 === byId(2L)._3 && byId(2L)._3 === byId(3L)._3)
    // isolated: r = (1-d)/N after every iteration (no in-edges)
    assert(math.abs(byId(4L)._3 - 0.15 / 5) < 1e-6)
    assert(byId(4L)._3 < byId(1L)._3)
  }

  test("clusterRepresentatives: one keeper per cluster, the most central") {
    // two components: a star {0..3} (center 0 must win) and a pair {5,6}
    // (equal rank — tie breaks to the smaller id); 4 is isolated and is
    // its own cluster's representative by construction
    val vertices = (0L to 6L).toDF("id")
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (5L, 6L)).toDF("a", "b")
    val out = Graph.clusterRepresentatives(vertices, "id", pairs, "a", "b")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4))).toSeq
    assert(out.map(x => (x._1, x._2)) === Seq(
      (0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 4L), (5L, 5L), (6L, 5L)))
    assert(out.filter(_._3).map(_._1) === Seq(0L, 4L, 5L))
    // exactly one representative per cluster
    val perCluster = out.groupBy(_._2).view.mapValues(_.count(_._3)).toMap
    assert(perCluster.values.forall(_ == 1))
  }

  test("clusterRepresentatives plan: selection aggregates, never windows") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    val vertices = (0L to 50L).toDF("id")
    val pairs = (1L to 50L).map(i => (0L, i)).toDF("a", "b")
    val out = Graph.clusterRepresentatives(vertices, "id", pairs, "a", "b")
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.inputPlan)
        case other => other.children
      }
      (p +: kids.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
    }
    val windows = nodes(out.queryExecution.executedPlan).collect {
      case w: WindowExec => w
    }
    assert(windows.isEmpty,
      "per-cluster keep decision must be a struct-min aggregate, not a window")
  }

  test("fixture graph: deterministic across runs, ranks positive") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val pairs = Similarity.cosinePairs(emb, 0.35)
      .select(col("vec_a"), col("vec_b"))
    def run() = Graph.pageRank(emb.select(col("vec_id")), "vec_id",
      pairs, "vec_a", "vec_b").orderBy("vec_id").collect().toSeq
    val a = run(); val b = run()
    assert(a === b)
    assert(a.forall(_.getDouble(2) > 0))
    // higher-degree vertices dominate the top ranks on a near-dup graph
    val top = a.maxBy(_.getDouble(2))
    assert(top.getLong(1) >= a.map(_.getLong(1)).max / 2)
  }
}
