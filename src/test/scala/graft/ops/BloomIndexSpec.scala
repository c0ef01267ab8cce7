package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Bloom skip-index invariants: zero false negatives over the ENTIRE
  * key universe, a false-positive rate inside the analytic bound, and
  * partitioning-independence of the stored words.
  */
class BloomIndexSpec extends SparkSpecBase {

  private val (mBits, k) = (1008, 3)

  private def orders = Tables.orders(spark, sfDir)
    .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
      col("o_custkey"))

  test("no false negatives: every true (key, part) pair is a candidate") {
    val index = BloomIndex.build(orders, "month", "o_custkey", mBits, k)
    val allKeys = orders.select(col("o_custkey").as("key")).distinct()
    val cand = BloomIndex.mightContain(index, allKeys, "key", mBits, k)
      .select(col("key"), col("part").as("month"))
    val truth = orders.select(col("o_custkey").as("key"), col("month"))
      .distinct()
    val missed = truth.join(cand, Seq("key", "month"), "left_anti").count()
    assert(missed === 0L)
  }

  test("false-positive rate stays inside the (1-e^-kn/m)^k bound") {
    val index = BloomIndex.build(orders, "month", "o_custkey", mBits, k)
    val allKeys = orders.select(col("o_custkey").as("key")).distinct()
    val cand = BloomIndex.mightContain(index, allKeys, "key", mBits, k)
      .select(col("key"), col("part").as("month"))
    val truth = orders.select(col("o_custkey").as("key"), col("month"))
      .distinct()
    val nCand = cand.count()
    val nTrue = truth.count()
    val fps = nCand - truth.join(cand, Seq("key", "month")).count()
    // worst-month load: n keys in m bits
    val maxLoad = truth.groupBy("month").count()
      .agg(max("count")).collect().head.getLong(0)
    val pFp = math.pow(1 - math.exp(-k.toDouble * maxLoad / mBits), k)
    val nProbes = allKeys.count()
    val nMonths = truth.select("month").distinct().count()
    // probes x months negative trials, 3x slack on the expectation
    val bound = math.max(3, (3 * pFp * nProbes * nMonths).toLong)
    assert(fps >= 0 && fps <= bound,
      s"$fps false positives over ${nProbes * nMonths} trials " +
        s"(p=$pFp, bound $bound); candidates $nCand vs true $nTrue")
  }

  test("index words are independent of input partitioning") {
    def words(parts: Int) =
      BloomIndex.build(orders.repartition(parts), "month", "o_custkey",
        mBits, k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = words(3)
    assert(a.nonEmpty)
    assert(a === words(7))
    // the 63-bit word contract: no sign bits, words in range
    a.foreach { case ((_, w), bits) =>
      assert(w >= 0 && w < mBits / BloomIndex.WordBits)
      assert(bits > 0, "stored word must be non-empty")
    }
  }
}
