package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Min-label-propagation connected components: known graph shapes, long
  * chains (multi-round convergence), isolated vertices, and the survivor
  * contract (cluster id = min member id). */
class ConnectedComponentsSpec extends SparkSpecBase {

  private def cc(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(
      vs.toDF("id"), "id", es.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle, pair, and isolates") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L, 6L, 9L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("a long chain converges across many propagation rounds") {
    val n = 40L
    val vs = (1L to n)
    val es = (1L until n).map(i => (i, i + 1))
    val got = cc(vs, es)
    assert(got.values.toSet == Set(1L))
  }

  test("edge direction is irrelevant (symmetric closure)") {
    assert(cc(Seq(1L, 2L, 3L), Seq((3L, 2L), (2L, 1L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("no edges: every vertex is its own survivor") {
    val got = cc(Seq(7L, 8L), Seq.empty)
    assert(got == Map(7L -> 7L, 8L -> 8L))
  }

  test("1,000-node path graph converges in O(log n) rounds, not O(n)") {
    import spark.implicits._
    val n = 1000L
    val vs = (0L until n).toDF("id")
    val es = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) =
      Dedup.connectedComponentsRounds(vs, "id", es, "src", "dst")
    // pointer-halving: label distance ~doubles per round → ~11 rounds for
    // diameter 999; 20 is a generous regression bound (plain min-label
    // propagation would need 999)
    assert(rounds <= 20, s"took $rounds rounds")
    val labs = labels.collect().map(r => r.getLong(1)).toSet
    assert(labs == Set(0L))
  }

  test("maxRounds guard fails loudly instead of returning partial merges") {
    import spark.implicits._
    val vs = (0L until 200L).toDF("id")
    val es = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(vs, "id", es, "src", "dst", maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
