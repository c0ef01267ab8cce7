package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** DoReMi-lite invariants: excess loss is non-negative (Gibbs), the
  * per-step weights are a distribution, and multiplicative weights
  * concentrate monotonically onto the max-excess domain as steps grow. */
class DomainReweightSpec extends SparkSpecBase {
  import spark.implicits._

  // three domains: one templated (low excess — its own LM ≈ global on
  // its tokens), one idiosyncratic vocabulary (high excess), one mixed
  private val docs = Seq(
    ("tmpl", "the quick brown fox jumps over the lazy dog"),
    ("tmpl", "the quick brown fox jumps over the lazy dog"),
    ("rare", "zqx wvu ytr zqx plm okn ijb zqx wvu plm"),
    ("rare", "okn ijb zqx wvu ytr plm zqx okn ijb wvu"),
    ("mix", "the quick zqx fox plm over the okn dog"),
    ("mix", "the lazy wvu dog ytr jumps the ijb fox"))
    .toDF("source", "text")

  private lazy val out = KeywordSearch
    .domainReweight(docs, "source", "text", eta = 2.0, steps = 4)
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))

  test("excess NLL is non-negative and constant across steps") {
    val bySrc = out.groupBy(_._1).view.mapValues(_.map(_._3).distinct).toMap
    bySrc.foreach { case (s, ex) =>
      assert(ex.size == 1, s"excess for $s must not vary by step")
      assert(ex.head >= -1e-6, s"excess for $s is ${ex.head} — Gibbs violated")
    }
  }

  test("weights are a distribution at every step") {
    out.groupBy(_._2).foreach { case (step, rows) =>
      val sum = rows.map(_._4).sum
      assert(math.abs(sum - 1.0) < 1e-4,
        s"step $step weights sum to $sum")
    }
  }

  test("multiplicative weights concentrate on the max-excess domain") {
    val maxSrc = out.groupBy(_._1).view.mapValues(_.head._3)
      .toSeq.maxBy(_._2)._1
    val traj = out.filter(_._1 == maxSrc).sortBy(_._2).map(_._4)
    assert(traj.zip(traj.tail).forall { case (a, b) => b >= a },
      s"$maxSrc weight trajectory not monotone: ${traj.toSeq}")
    assert(traj.last > 1.0 / 3 + 1e-6,
      "max-excess domain must end above uniform")
  }
}
