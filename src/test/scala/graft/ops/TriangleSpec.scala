package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Triangle counting: exactness against an in-memory all-triples
  * reference on a structured small graph, the star/chain zero cases,
  * and the degree-ordered orientation's hub-safety property (bounded
  * out-degree — the reason the wedge join survives power-law graphs).
  */
class TriangleSpec extends SparkSpecBase {

  private def triCount(edges: Seq[(Long, Long)],
      vertices: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangleCounts(vertices.toDF("id"), "id",
      edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def bruteRef(edges: Seq[(Long, Long)],
      vertices: Seq[Long]): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val vs = vertices.sorted
    val tri = for {
      a <- vs; b <- vs if a < b && e((a, b))
      c <- vs if b < c && e((b, c)) && e((a, c))
    } yield (a, b, c)
    val per = tri.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (v, l) => v -> l.size.toLong }
    vertices.map(v => v -> per.getOrElse(v, 0L)).toMap
  }

  test("matches the all-triples reference on a mixed small graph") {
    // two cliques (K4 + K3) sharing a vertex, a pendant chain, a
    // duplicate edge, and a reversed edge — the messy-input cases
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (4L, 5L), (5L, 6L), (6L, 4L), // K3 sharing vertex 4
      (6L, 7L), (7L, 8L), // chain
      (2L, 1L), // reversed duplicate
      (3L, 1L), // another duplicate
      (9L, 9L)) // self loop
    val vertices = (1L to 10L).toSeq
    val got = triCount(edges, vertices)
    val ref = bruteRef(edges, vertices)
    assert(got === ref)
    // K4 vertices touch 3 triangles each (+1 for vertex 4's K3)
    assert(got(1L) === 3L && got(4L) === 4L && got(10L) === 0L)
  }

  test("star and chain graphs are triangle-free") {
    val star = (2L to 40L).map(i => (1L, i))
    assert(triCount(star, (1L to 40L).toSeq).values.forall(_ == 0L))
    val chain = (1L until 30L).map(i => (i, i + 1))
    assert(triCount(chain, (1L to 30L).toSeq).values.forall(_ == 0L))
  }

  test("orientation bounds hub out-degree (wedge volume stays linear)") {
    import spark.implicits._
    // a 200-leaf hub plus a small clique: the hub's edges must all
    // orient TOWARD it (leaves have degree 1), so its out-degree is 0
    // and the wedge self-join generates no hub explosion — asserted on
    // the PRODUCTION orientation path, not a spec-local copy
    val hub = (2L to 201L).map(i => (1L, i))
    val clique = Seq((202L, 203L), (203L, 204L), (202L, 204L))
    val edges = (hub ++ clique).toDF("s", "d")
    val oriented = Graph.orientByDegree(
      Graph.canonicalEdges(edges, "s", "d"))
    val hubOut = oriented.filter(col("s") === 1L).count()
    assert(hubOut === 0L, s"hub emitted $hubOut out-edges")
    // every canonical edge is oriented exactly once
    assert(oriented.count() === 203L)
  }

  test("string id columns canonicalize numerically, not lexicographically") {
    import spark.implicits._
    // ids 9, 10, 11: least('10','9') = '10' lexicographically, which
    // would break the a < b invariant and silently drop the triangle
    val edges = Seq(("9", "10"), ("10", "11"), ("9", "11")).toDF("s", "d")
    val got = Graph.triangleCounts(
      Seq(9L, 10L, 11L).toDF("id"), "id", edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(9L -> 1L, 10L -> 1L, 11L -> 1L))
  }
}
