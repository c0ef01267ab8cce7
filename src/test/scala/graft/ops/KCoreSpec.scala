package graft.ops

import graft.SparkSpecBase

/** k-core peeling: exactness against an in-memory reference on
  * structured graphs (clique + chain + cycle + tree), the cascade case
  * where one peel triggers the next, and higher-k behavior.
  */
class KCoreSpec extends SparkSpecBase {

  private def core(edges: Seq[(Long, Long)], vertices: Seq[Long],
      k: Int): Map[Long, Int] = {
    import spark.implicits._
    Graph.kCore(vertices.toDF("id"), "id", edges.toDF("s", "d"), "s", "d", k)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  private def refCore(edges0: Seq[(Long, Long)], vertices: Seq[Long],
      k: Int): Map[Long, Int] = {
    var e = edges0.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    var changed = true
    while (changed) {
      val deg = e.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (v, l) => v -> l.size }
      val bad = deg.collect { case (v, d) if d < k => v }.toSet
      changed = bad.nonEmpty
      e = e.filterNot(p => bad(p._1) || bad(p._2))
    }
    val surv = e.flatMap(p => Seq(p._1, p._2)).toSet
    vertices.map(v => v -> (if (surv(v)) 1 else 0)).toMap
  }

  // K4 (1-4), a chain hanging off it (5-6-7), a 5-cycle (10-14), and a
  // star (20 center, 21-24 leaves)
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (6L, 7L),
    (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 10L),
    (20L, 21L), (20L, 22L), (20L, 23L), (20L, 24L))
  private val vertices = (1L to 7L) ++ (10L to 14L) ++ (20L to 24L)

  test("2-core: cycles and cliques survive, chains and stars peel away") {
    val got = core(edges, vertices, 2)
    assert(got === refCore(edges, vertices, 2))
    // the cascade: peeling 7 exposes 6, then 5 — all gone; the cycle
    // and the K4 survive; the whole star disappears (center included)
    assert((1L to 4L).forall(got(_) == 1))
    assert((5L to 7L).forall(got(_) == 0))
    assert((10L to 14L).forall(got(_) == 1))
    assert((20L to 24L).forall(got(_) == 0))
  }

  test("3-core: only the K4 survives") {
    val got = core(edges, vertices, 3)
    assert(got === refCore(edges, vertices, 3))
    assert((1L to 4L).forall(got(_) == 1))
    assert(got.filter(_._2 == 1).keySet === Set(1L, 2L, 3L, 4L))
  }

  test("k above the max coreness empties the core") {
    assert(core(edges, vertices, 4).values.forall(_ == 0))
  }
}
