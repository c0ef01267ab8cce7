package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** RhpSignature must be drop-in equal to the T×b per-plane
  * `when(graft_dot(v, plane) > 0, 1<<p).otherwise(0)` + sum formulation
  * it replaced (which overflowed janino's 64 KB method limit at adaptive
  * table counts) — including the legacy null semantics: a null vector, a
  * null element, or a dims-mismatched vector made every per-plane dot
  * null, so every bucket summed to 0. */
class RhpSignatureSpec extends SparkSpecBase {
  import spark.implicits._

  private val Tables = 7
  private val Planes = 5
  private val Dims = 16

  private def planes: Array[Array[Double]] =
    graft.ops.Similarity.planeWeights(Tables * Planes, Dims)

  /** The replaced formulation, reconstructed literally. */
  private def legacyBuckets(v: org.apache.spark.sql.Column) =
    (0 until Tables).map { t =>
      (0 until Planes).map { p =>
        val w = planes(t * Planes + p)
        val planeCol = array(w.toIndexedSeq.map(lit): _*)
        when(GraftFunctions.dot(v, planeCol) > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    }

  test("equal to the per-plane when(dot > 0) formulation on random vectors") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(Dims)(rnd.nextGaussian()).toSeq)
    }.toDF("id", "v")
    val sig = GraftFunctions.rhpSignature(col("v"), planes, Planes)
    val cols = legacyBuckets(col("v"))
    val rows = vecs.select(array(cols: _*).as("legacy"), sig.as("kernel"))
      .as[(Seq[Int], Seq[Int])].collect()
    rows.foreach { case (legacy, kernel) =>
      assert(kernel === legacy)
    }
    // sanity: buckets are not degenerate across the batch
    assert(rows.map(_._2).distinct.length > 100)
  }

  test("legacy null semantics: null vector / null element / dims mismatch -> all-zero buckets") {
    val vecs = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Double]]),
      (2L, Seq[java.lang.Double](1.0, null, 3.0) ++
        Seq.fill[java.lang.Double](Dims - 3)(0.5)),
      (3L, Seq[java.lang.Double](1.0, 2.0)), // wrong dims
      (4L, Seq.fill[java.lang.Double](Dims)(1.0))
    ).toDF("id", "v")
    val sig = GraftFunctions.rhpSignature(col("v"), planes, Planes)
    val rows = vecs.select(col("id"), sig.as("kernel"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(rows(1L) === Seq.fill(Tables)(0))
    assert(rows(2L) === Seq.fill(Tables)(0))
    assert(rows(3L) === Seq.fill(Tables)(0))
    assert(rows(4L).exists(_ != 0), "a real vector must set some bucket bit")
    rows.values.foreach(s => assert(s.length === Tables))
  }

  test("interpreted eval equals the codegen path") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 50).map(_ => Array.fill(Dims)(rnd.nextGaussian()))
    val expr = RhpSignature(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true),
      planes, Planes)
    data.foreach { v =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v))
      val interp = expr.eval(row)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
      val kernel = GraftFnUtil.rhpSignature(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
        planes, Planes).toIntArray()
      assert(interp.toSeq === kernel.toSeq)
    }
  }
}
