package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** mutualInformation: I = 0 for independent columns, I = H (NMI = 1)
  * for a bijection, hand math on a small joint, and the constant-column
  * NMI null guard. */
class MutualInfoSpec extends SparkSpecBase {
  import spark.implicits._

  test("independent columns have zero MI") {
    // perfectly balanced 2×2: every cell n/4 → each term ln(1) = 0
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .flatMap(Seq.fill(5)(_)).toDF("u", "v")
    val r = Profiler.mutualInformation(df, "u", "v").collect().head
    assert(r.getAs[Double]("mi_nats") === 0.0)
    assert(r.getAs[Double]("nmi") === 0.0)
  }

  test("a bijection has MI = H and NMI = 1") {
    val df = Seq(("a", "x"), ("b", "y"), ("c", "z"))
      .flatMap(Seq.fill(4)(_)).toDF("u", "v")
    val r = Profiler.mutualInformation(df, "u", "v").collect().head
    val h = math.rint(math.log(3.0) * 1e6) / 1e6 // uniform over 3
    assert(r.getAs[Double]("mi_nats") === h)
    assert(r.getAs[Double]("h_x") === h)
    assert(r.getAs[Double]("nmi") === 1.0)
  }

  test("hand math on an asymmetric 2×2 joint") {
    // counts: (a,x)=2 (a,y)=1 (b,x)=1 → n=4; cx: a=3 b=1; cy: x=3 y=1
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("u", "v")
    val r = Profiler.mutualInformation(df, "u", "v").collect().head
    def ln9(x: Double) = math.rint(math.log(x) * 1e9) / 1e9
    def t(cxy: Double, cx: Double, cy: Double) =
      math.rint(cxy / 4 * ln9(cxy * 4 / (cx * cy)) * 1e9) / 1e9
    val mi = BigDecimal(t(2, 3, 3)) + BigDecimal(t(1, 3, 1)) +
      BigDecimal(t(1, 1, 3))
    assert(r.getAs[Double]("mi_nats") ===
      (mi.setScale(6, BigDecimal.RoundingMode.HALF_UP)).toDouble)
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("n_cells") === 3L)
  }

  test("constant column: NMI is NULL, not Infinity") {
    val df = Seq(("a", "x"), ("a", "y")).toDF("u", "v")
    val r = Profiler.mutualInformation(df, "u", "v").collect().head
    assert(r.getAs[Double]("h_x") === 0.0)
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }
}
