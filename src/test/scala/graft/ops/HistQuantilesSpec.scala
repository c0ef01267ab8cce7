package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Log-histogram quantiles: exactness against an in-memory restatement
  * of the bin/pick/decode contract, the bounded-bin-count and
  * bounded-relative-error guarantees that justify the sketch, the
  * small-value clamp, and partitioning determinism.
  */
class HistQuantilesSpec extends SparkSpecBase {

  private val Probs = Seq(0.5, 0.9, 0.99)

  /** The operator's exact contract, restated imperatively. */
  private def ref(values: Seq[Long]): Seq[Double] = {
    def key(v0: Long): Long = {
      val v = math.max(v0, 4L)
      val e = 64 - java.lang.Long.numberOfLeadingZeros(v) - 1
      4L * e + (v >> (e - 2)) - 4
    }
    val binned = values.groupBy(key).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val n = values.size.toLong
    Probs.map { p =>
      val r = math.ceil(p * n).toLong
      var cum = 0L
      val k = binned.collectFirst {
        case (b, c) if { cum += c; cum >= r } => b
      }.get
      val mid = (1L << (k / 4 - 2)).toDouble * ((k % 4) + 4.5)
      BigDecimal(mid).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  private def run(values: Seq[Long], parts: Int = 4): (Long, Seq[Double]) = {
    import spark.implicits._
    val row = Sketches.histQuantiles(
      values.map(("g", _)).toDF("g", "v").repartition(parts), "g", "v",
      Probs).collect().head
    (row.getLong(1), Seq(row.getDouble(2), row.getDouble(3),
      row.getDouble(4)))
  }

  test("matches the in-memory contract across magnitudes") {
    // deterministic multi-decade sample: 1..10^6, geometric-ish spread
    val values = (1 to 5000).map(i => ((i.toLong * 2654435761L) % 999983) + 1)
    val (n, est) = run(values)
    assert(n === values.size.toLong)
    assert(est === ref(values))
    // determinism under partitioning and order
    assert(run(values.reverse, parts = 13)._2 === est)
  }

  test("relative error vs the true quantile is bin-bounded") {
    val values = (1 to 20000).map(i =>
      math.round(math.pow(10.0, 1 + 4.0 * ((i * 2654435761L % 10007) / 10007.0))))
    val (_, est) = run(values)
    val sorted = values.sorted
    Probs.zip(est).foreach { case (p, e) =>
      val exact = sorted((math.ceil(p * values.size) - 1).toInt).toDouble
      // bin width is <= 1/4 of the value; midpoint error <= 1/8 + slop
      assert(math.abs(e - exact) / exact < 0.15,
        s"p=$p est=$e exact=$exact")
    }
  }

  test("values below 4 clamp into the v=4 bin (key 4e+sub = 8)") {
    val (n, est) = run(Seq(1L, 2L, 3L, 4L))
    assert(n === 4L)
    // every value lands in the [4, 5) bin whose midpoint is 4.5
    assert(est === Seq(4.5, 4.5, 4.5))
  }

  test("bin count stays bounded regardless of input size") {
    val keys = (1 to 100000).map { i =>
      val v = math.max((i.toLong * 48271L) % (1L << 40), 4L)
      val e = 64 - java.lang.Long.numberOfLeadingZeros(v) - 1
      4L * e + (v >> (e - 2)) - 4
    }.distinct
    assert(keys.size <= 4 * 62, s"${keys.size} bins")
  }
}
