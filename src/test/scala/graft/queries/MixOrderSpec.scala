package graft.queries

import graft.SparkSpecBase

/** Stride-scheduled mixture interleave: the emitted order realizes the
  * temperature mixture at EVERY prefix (the property that makes it a
  * data-loader order rather than a sorted dump), each source streams
  * in its within-source sequence, mix_pos is a dense permutation, and
  * reruns agree exactly.
  */
class MixOrderSpec extends SparkSpecBase {

  private lazy val rows = CorpusQueries.mixOrder(spark, sfDir)
    .collect().map(r => (r.getAs[Long]("mix_pos"), r.getAs[Long]("doc_id"),
      r.getAs[String]("source"), r.getAs[Long]("seq_in_source"),
      r.getAs[Double]("vtime"))).toSeq

  private lazy val shares = graft.ops.CorpusFilters.temperatureMix(
    graft.Tables.documents(spark, sfDir), "source", "text", 0.7)
    .collect().map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_docs"), r.getAs[Double]("temp_share"))).toMap

  test("mix_pos is a dense permutation; sources stream in sequence order") {
    assert(rows.map(_._1).sorted === (1L to rows.length.toLong))
    rows.groupBy(_._3).foreach { case (src, rs) =>
      val inEmitOrder = rs.sortBy(_._1).map(_._4)
      assert(inEmitOrder === (1L to rs.length.toLong),
        s"$src must be emitted in its within-source sequence")
      assert(rs.length.toLong === shares(src)._1)
    }
  }

  test("every virtual-time prefix realizes the mixture to within one doc") {
    // stride law: up to virtual time T (while no source is exhausted),
    // source s has emitted #{k : (k-1/2)/w_s <= T} = floor(w_s*T + 1/2)
    // docs — within half a stride of the target w_s*T
    val horizon = shares.values
      .map { case (n, w) => (n - 0.5) / w }.min
    Seq(0.25, 0.5, 0.9).foreach { frac =>
      val t = horizon * frac
      val prefix = rows.filter(_._5 <= t)
      assert(prefix.nonEmpty)
      shares.foreach { case (src, (_, w)) =>
        val got = prefix.count(_._3 == src)
        val want = w * t
        assert(math.abs(got - want) <= 1.0,
          s"$src at T=$t: emitted $got, stride target $want")
      }
    }
  }

  test("reruns emit the identical order (pure function of the corpus)") {
    val again = CorpusQueries.mixOrder(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("mix_pos"), r.getAs[Long]("doc_id")))
      .toSeq
    assert(again === rows.map(t => (t._1, t._2)))
  }

  test("plan shape: MintRank exchanges, window only over the limited dim") {
    val plan = CorpusQueries.mixOrder(spark, sfDir)
      .queryExecution.executedPlan
    // the only Window in the plan must sit above the strata limit
    // (PlanGuardSpec proves boundedness structurally for the whole
    // surface; here we just pin that MintRank, not a window, ranks docs)
    val winInputs = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    winInputs.foreach { w =>
      assert(w.child.collectLeaves().forall(
        !_.toString.contains("documents")),
        "a doc-scale window slipped in; docs must rank through MintRank")
    }
    assert(plan.toString.contains("MintRank"))
  }
}
