package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** HyperLogLog: the register file against an in-memory bit-arithmetic
  * reference, the estimator's published error bound on a real-sized
  * hash stream, the small-range linear-counting branch, the elementwise
  * register merge law (the property that makes it a sketch), and
  * partitioning determinism.
  */
class HllSpec extends SparkSpecBase {

  private val P = 8
  private val M = 1L << P
  private val RhoBits = 52 // 60-bit hash minus p=8 index bits

  /** 60-bit md5-prefix hashes of i.toString — the production hash
    * convention (Sketches.HashBits), computed through the engine. */
  private def hashes(n: Int, tag: String): Seq[Long] = {
    import spark.implicits._
    (0 until n).map(i => s"$tag-$i").toDF("s")
      .select(conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("hv"))
      .collect().map(_.getLong(0)).toSeq
  }

  private def refRegisters(hvs: Seq[Long]): Map[Long, Int] =
    hvs.groupBy(_ % M).map { case (idx, vs) =>
      idx -> vs.map { hv =>
        val rem = hv / M
        if (rem == 0) RhoBits + 1
        else RhoBits - (63 - java.lang.Long.numberOfLeadingZeros(rem))
      }.max
    }

  private def sparkRegisters(hvs: Seq[Long], parts: Int = 4): Map[Long, Int] = {
    import spark.implicits._
    Sketches.hllRegisters(
      hvs.map(("g", _)).toDF("g", "hv").repartition(parts), "g", "hv", P)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
  }

  test("register file matches the bit-arithmetic reference") {
    val hvs = hashes(3000, "reg")
    assert(sparkRegisters(hvs) === refRegisters(hvs))
    // and is invariant under partitioning and duplication
    assert(sparkRegisters(hvs ++ hvs, parts = 11) === refRegisters(hvs))
  }

  test("estimate lands inside the published error bound at n=20k") {
    import spark.implicits._
    val n = 20000
    val df = (0 until n).map(i => ("g", s"est-$i")).toDF("g", "s")
      .select(col("g"),
        conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("hv"))
    val row = Sketches.hllDistinct(df, "g", "hv", P).collect().head
    val est = row.getAs[Double]("est_distinct")
    val exact = row.getAs[Long]("exact_distinct")
    assert(exact === n.toLong)
    // sigma = 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5% (deterministic
    // given the fixed hash, so this is a regression pin, not a flake)
    assert(math.abs(est - exact) / exact < 0.195,
      s"est $est vs exact $exact")
  }

  test("small range takes the linear-counting branch") {
    import spark.implicits._
    val hvs = hashes(5, "lc")
    val row = Sketches.hllDistinct(
      hvs.map(("g", _)).toDF("g", "hv"), "g", "hv", P).collect().head
    val zeros = row.getAs[Long]("zero_regs")
    assert(zeros === M - 5) // 5 distinct hashes -> 5 occupied registers
    // the branch's exact arithmetic: m * ln(m/zeros), ln 9-rounded
    val lc = BigDecimal(256.0 * BigDecimal(math.log(256.0 / zeros))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("est_distinct") === lc)
    assert(math.abs(lc - 5.0) < 0.1) // LC is near-exact down here
  }

  test("small-m alpha constants (Flajolet 2007 table) drive the estimator") {
    import spark.implicits._
    // p=4 (m=16): the asymptotic 0.7213/(1+1.079/m) formula is biased
    // down here (r10 ADVICE) — the published alpha_16 = 0.673 must be
    // what the raw branch multiplies by
    val p = 4; val m = 1L << p; val rhoBits = 60 - p
    val hvs = hashes(2000, "alpha")
    val regs = hvs.groupBy(_ % m).map { case (i, vs) =>
      i -> vs.map { hv =>
        val rem = hv / m
        if (rem == 0) rhoBits + 1
        else rhoBits - (63 - java.lang.Long.numberOfLeadingZeros(rem))
      }.max
    }
    assert(regs.size === m) // every register occupied -> raw branch
    val regSum = regs.values.map(r => BigInt(1) << (60 - r)).sum +
      BigInt(0) // absent-register term is zero here
    val raw = 0.673 * (m * m).toDouble * math.pow(2.0, 60) /
      regSum.toDouble
    val expected = BigDecimal(raw)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Sketches.hllDistinct(
      hvs.map(("g", _)).toDF("g", "hv"), "g", "hv", p).collect().head
    assert(row.getAs[Double]("est_distinct") === expected)
  }

  test("registers merge by elementwise max (the sketch law)") {
    val a = hashes(800, "ma")
    val b = hashes(900, "mb")
    val merged = (refRegisters(a).toSeq ++ refRegisters(b).toSeq)
      .groupBy(_._1).map { case (i, vs) => i -> vs.map(_._2).max }
    assert(sparkRegisters(a ++ b) === merged)
  }
}
