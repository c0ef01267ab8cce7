package graft.ops

import graft.SparkSpecBase

/** Incremental connected components: the label-contraction shortcut
  * must equal the from-scratch recompute over old ∪ new edges — on
  * merges of existing clusters, new-vertex chains, bridges between an
  * old cluster and a new vertex, and untouched singletons.
  */
class IncrementalCcSpec extends SparkSpecBase {

  import spark.implicits._

  private def fullCc(vertices: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(vertices.toDF("id"), "id",
      edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def incremental(oldV: Seq[Long], oldE: Seq[(Long, Long)],
      newV: Seq[Long], newE: Seq[(Long, Long)]): Map[Long, Long] = {
    val labels = Dedup.connectedComponents(oldV.toDF("id"), "id",
      oldE.toDF("a", "b"), "a", "b")
    Dedup.incrementalComponents(labels, "id", "cluster_id",
      newE.toDF("a", "b"), "a", "b", (oldV ++ newV).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("equals the full recompute across merge/bridge/chain/singleton") {
    // yesterday: clusters {1,2,3}, {10,11}, {20,21,22}, singletons 30, 31
    val oldV = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L, 30L, 31L)
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
    // today: 40-41-42 chain (new-only), a bridge 42-10 into an old
    // cluster, and a MERGE of two old clusters via 3-20; 43 isolated
    val newV = Seq(40L, 41L, 42L, 43L)
    val newE = Seq((40L, 41L), (41L, 42L), (42L, 10L), (3L, 20L))
    val inc = incremental(oldV, oldE, newV, newE)
    val full = fullCc(oldV ++ newV, oldE ++ newE)
    assert(inc === full)
    // the structural expectations, spelled out
    assert(Seq(1L, 2L, 3L, 20L, 21L, 22L).map(inc).toSet === Set(1L))
    assert(Seq(10L, 11L, 40L, 41L, 42L).map(inc).toSet === Set(10L))
    assert(inc(30L) === 30L && inc(43L) === 43L)
  }

  test("no new edges: yesterday's assignment is a fixpoint") {
    val oldV = Seq(1L, 2L, 3L, 7L)
    val oldE = Seq((2L, 3L), (1L, 3L))
    val inc = incremental(oldV, oldE, Seq(9L), Seq.empty)
    assert(inc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 9L))
  }

  test("label contraction carries one edge per non-minimum vertex") {
    // the scale claim: the old graph re-enters as <= |V_old| edges
    // regardless of |E_old| — here a dense K6 (15 edges) contracts to 5
    val k6 = for (i <- 1L to 6L; j <- i + 1 to 6L) yield (i, j)
    val labels = Dedup.connectedComponents(
      (1L to 6L).toDF("id"), "id", k6.toDF("a", "b"), "a", "b")
    val labelEdges = labels.filter("id <> cluster_id").count()
    assert(labelEdges === 5L)
    val inc = incremental((1L to 6L).toSeq, k6, Seq(9L), Seq((6L, 9L)))
    assert(inc === fullCc((1L to 6L) :+ 9L, k6 :+ (6L, 9L)))
  }
}
