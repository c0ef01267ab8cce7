package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The KMV sketch's distributed-correctness contract: the aggregated
  * state must equal the k smallest distinct hashes of the input as a
  * pure set function — same answer under any partitioning — and the
  * estimator must actually estimate (bounded relative error at
  * cardinalities far above k).
  */
class KmvSketchSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 64

  private def report(hashes: Seq[(String, Long)], parts: Int) =
    Sketches.kmvDistinct(
      hashes.toDF("g", "hv").repartition(parts), "g", "hv", K)

  test("sketch state equals the k smallest distinct hashes, any partitioning") {
    val rnd = new scala.util.Random(7)
    // duplicates on purpose: the sketch must dedup, not count
    val vals = Seq.fill(5000)(rnd.nextLong().abs % (1L << 60))
    val hashes = (vals ++ vals.take(1000)).map(("g1", _))
    val expectKth = vals.distinct.sorted.apply(K - 1)
    for (parts <- Seq(1, 3, 16)) {
      val row = report(hashes, parts).collect().head
      assert(row.getAs[Long]("sketch_size") === K)
      assert(row.getAs[Long]("kth_hash") === expectKth,
        s"kth hash differs at $parts partitions")
      assert(row.getAs[Long]("exact_distinct") === vals.distinct.size)
    }
  }

  test("small groups are exact: sketch holds everything below k") {
    val hashes = (1L to 10L).map(h => ("tiny", h * 1000))
    val row = report(hashes, 4).collect().head
    assert(row.getAs[Long]("sketch_size") === 10)
    assert(row.isNullAt(row.fieldIndex("kth_hash")))
    assert(row.getAs[Double]("est_distinct") === 10.0)
    assert(row.getAs[Double]("rel_err") === 0.0)
  }

  test("estimator lands within 25% at 100x the sketch size") {
    // uniform 60-bit hashes, n >> k — the regime the estimator exists for
    val rnd = new scala.util.Random(13)
    val n = 100 * K
    val hashes = Seq.fill(n)(rnd.nextLong().abs % (1L << 60))
      .distinct.map(("big", _))
    val row = report(hashes, 8).collect().head
    val est = row.getAs[Double]("est_distinct")
    val exact = row.getAs[Long]("exact_distinct")
    assert(math.abs(est - exact) / exact < 0.25,
      s"estimate $est too far from $exact")
  }

  test("merge of partial sketches never exceeds k and stays sorted") {
    val agg = new Sketches.KmvAggregator(8)
    val a = agg.merge(Array(1L, 3L, 5L, 7L, 9L, 11L, 13L, 15L),
      Array(2L, 3L, 6L, 7L, 10L, 11L, 14L, 15L))
    assert(a.toSeq === Seq(1L, 2L, 3L, 5L, 6L, 7L, 9L, 10L))
    val b = agg.merge(Array.emptyLongArray, Array(4L, 8L))
    assert(b.toSeq === Seq(4L, 8L))
    // reduce displaces the max once full, ignores non-members above it
    val full = Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L)
    assert(agg.reduce(full, 8L).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    assert(agg.reduce(full, 10L).toSeq === full.toSeq)
    assert(agg.reduce(full, 4L).toSeq === full.toSeq)
  }
}
