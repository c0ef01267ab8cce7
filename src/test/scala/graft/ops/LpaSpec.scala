package graft.ops

import graft.SparkSpecBase

/** Label propagation: exactness against an in-memory synchronous
  * reference (most-frequent neighbor label, ties to the smallest), the
  * structural property that motivates it (a single bridge edge does NOT
  * merge two dense communities the way connected components would), the
  * isolated-vertex keep rule, and partitioning determinism.
  */
class LpaSpec extends SparkSpecBase {

  private def lpa(edges: Seq[(Long, Long)], vertices: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.labelPropagation(vertices.toDF("id"), "id",
      edges.toDF("a", "b"), "a", "b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** The operator's exact contract, restated imperatively: synchronous
    * rounds, votes from BOTH directions of every listed pair, argmax by
    * (count desc, label asc), no-neighbor vertices keep their label. */
  private def ref(edges: Seq[(Long, Long)], vertices: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lbl = vertices.map(v => v -> v).toMap
    (1 to rounds).foreach { _ =>
      val cur = lbl
      lbl = vertices.map { v =>
        val votes = adj.getOrElse(v, Nil).map(cur)
        if (votes.isEmpty) v -> cur(v)
        else v -> votes.groupBy(identity).toSeq
          .map { case (l, o) => (l, o.size) }
          .minBy { case (l, n) => (-n, l) }._1
      }.toMap
    }
    lbl
  }

  private def k5(base: Long): Seq[(Long, Long)] =
    for (i <- base until base + 5; j <- i + 1 until base + 5) yield (i, j)

  test("two K5 cliques over one bridge separate; CC would merge them") {
    // clique A = {1..5}, clique B = {6..10}, one borderline bridge 5-6,
    // plus an isolated vertex 11 (no votes -> keeps its own label)
    val edges = k5(1) ++ k5(6) :+ (5L, 6L)
    val vertices = (1L to 11L).toSeq
    val got = lpa(edges, vertices, rounds = 4)
    assert(got === ref(edges, vertices, 4))
    // the structural claim: both cliques label-uniform, and DIFFERENT
    assert((1L to 5L).map(got).toSet.size === 1)
    assert((6L to 10L).map(got).toSet.size === 1)
    assert(got(1L) !== got(6L))
    assert(got(11L) === 11L)
    // the contrast operator: CC merges everything reachable
    import spark.implicits._
    val cc = Dedup.connectedComponents(vertices.toDF("id"), "id",
      edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 10L).map(cc).toSet.size === 1)
  }

  test("matches the reference on a messy mixed graph, round for round") {
    // triangle, a chain into it, a star, and a 4-cycle (the structure
    // where synchronous LPA can oscillate - the fixed round count is
    // the contract, so the reference must agree at EVERY depth)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (6L, 7L), (6L, 8L), (6L, 9L), (10L, 11L), (11L, 12L), (12L, 13L),
      (13L, 10L))
    val vertices = (1L to 13L).toSeq
    (1 to 5).foreach { r =>
      assert(lpa(edges, vertices, r) === ref(edges, vertices, r),
        s"diverged at rounds=$r")
    }
  }

  test("result is independent of input partitioning and row order") {
    import spark.implicits._
    val edges = (k5(1) ++ k5(6) :+ (5L, 6L)).reverse
    val vertices = (1L to 10L).toSeq
    val shuffled = Graph.labelPropagation(
      vertices.reverse.toDF("id").repartition(7), "id",
      edges.toDF("a", "b").repartition(13), "a", "b", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === ref(k5(1) ++ k5(6) :+ (5L, 6L), vertices, 4))
  }
}
