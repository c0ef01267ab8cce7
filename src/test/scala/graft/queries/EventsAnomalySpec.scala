package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The cleared-form z-test must agree with an exact rational reference
  * (BigInt — no floats anywhere), and the flag rate must look like a
  * 3σ tail, not a degenerate all-or-nothing. */
class EventsAnomalySpec extends SparkSpecBase {
  import spark.implicits._

  test("cleared integer z-test == exact BigInt |x-mu| > 3*sigma") {
    val rows = EventsQueries.anomalies(spark, sfDir)
      .select("event_type", "cents", "is_anomaly")
      .as[(String, Long, Boolean)].collect()
    val byType = rows.groupBy(_._1)
    byType.foreach { case (t, rs) =>
      val n = BigInt(rs.length)
      val s = rs.map(r => BigInt(r._2)).sum
      val ss = rs.map(r => BigInt(r._2) * r._2).sum
      rs.foreach { case (_, c, flag) =>
        val d = n * c - s
        val want = d * d > 9 * (n * ss - s * s)
        assert(flag == want, s"type $t cents $c: got $flag want $want")
      }
    }
    val flagged = rows.count(_._3)
    assert(flagged > 0, "no anomalies at all — degenerate fixture?")
    assert(flagged < rows.length / 10,
      s"$flagged of ${rows.length} flagged — not a 3-sigma tail")
  }
}
