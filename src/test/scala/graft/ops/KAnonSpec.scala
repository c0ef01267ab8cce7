package graft.ops

import graft.SparkSpecBase

/** k-anonymous release: the ≥k invariant on every emitted count, the
  * generalization ladder (fine → coarse → suppressed), and event
  * conservation across levels. */
class KAnonSpec extends SparkSpecBase {

  private val K = 5

  private def run(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    Privacy.kAnonRelease(rows.toDF("event_type", "user_id", "value"),
      "event_type", "user_id", "value", k = K)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("level"),
        Option(r.getAs[java.lang.Double]("bucket_lo")).map(_.doubleValue),
        Option(r.getAs[java.lang.Long]("n_users")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("n_events")).map(_.longValue)))
  }

  test("ladder: fine when k users share a bucket, coarse when only the " +
      "coarse bucket reaches k, suppressed otherwise") {
    val rows =
      // A: 5 users in fine bucket [0,10) -> released fine
      (0 until 5).map(u => ("A", u.toLong, 3.0 + u)) ++
      // B: 5 users in 5 DIFFERENT fine buckets of coarse [0,100) ->
      // each fine cell has 1 user; coarse has 5 -> released coarse
      (0 until 5).map(u => ("B", u.toLong, u * 17.0)) ++
      // C: 2 users only -> suppressed, counts NULLed (remainder < k)
      Seq(("C", 1L, 5.0), ("C", 2L, 6.0)) ++
      // D: 5 users scattered across 5 coarse buckets -> nothing
      // releases, but the remainder itself reaches k -> suppressed
      // WITH counts
      (0 until 5).map(u => ("D", u.toLong, u * 101.0))
    val out = run(rows)
    assert(out.filter(_._1 == "A") ===
      Seq(("A", "fine", Some(0.0), Some(5L), Some(5L))))
    assert(out.filter(_._1 == "B") ===
      Seq(("B", "coarse", Some(0.0), Some(5L), Some(5L))))
    assert(out.filter(_._1 == "C") ===
      Seq(("C", "suppressed", None, None, None)))
    assert(out.filter(_._1 == "D") ===
      Seq(("D", "suppressed", None, Some(5L), Some(5L))))
  }

  test("invariant: every emitted count describes >= k users; " +
      "conservation when nothing is NULLed") {
    // deterministic pseudo-random corpus: 60 users, values 0..399
    val rows = (0 until 3000).map { i =>
      (s"t${i % 3}", (i * 7 % 60).toLong, (i * 13 % 400).toDouble)
    }
    val out = run(rows)
    assert(out.nonEmpty)
    out.foreach { r =>
      r._4.foreach(nu => assert(nu >= K, s"row $r violates k-anonymity"))
    }
    // all three types have >= k remainder users here, so nothing is
    // NULLed and events must conserve exactly
    val total = out.flatMap(_._5).sum
    assert(total == 3000L,
      s"released+suppressed events = $total, expected 3000")
  }

  test("pseudonym: stable, distinct per id, join-preserving") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ids = (0 until 50).map(i => Tuple1(i.toLong % 20)).toDF("uid")
    val toks = ids.select(col("uid"),
      Privacy.pseudonym(col("uid"), "s1").as("tok")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // stable: every occurrence of an id gets the same token
    toks.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).distinct.length == 1)
    }
    // distinct ids -> distinct tokens; token never leaks the raw id
    val byId = toks.toMap
    assert(byId.values.toSeq.distinct.length == 20)
    byId.foreach { case (id, t) =>
      assert(t.length == 64 && !t.contains(id.toString + ":"))
    }
    // join-preserving: grouping by token gives the same count multiset
    // as grouping by the raw id
    val rawCounts = toks.groupBy(_._1).values.map(_.length).toSeq.sorted
    val tokCounts = toks.groupBy(_._2).values.map(_.length).toSeq.sorted
    assert(rawCounts == tokCounts)
    // a different salt is a different token universe
    val other = ids.select(Privacy.pseudonym(col("uid"), "s2").as("t"))
      .collect().map(_.getString(0)).toSet
    assert(other.intersect(byId.values.toSet).isEmpty)
  }
}
