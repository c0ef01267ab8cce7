package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The q_enrich_cost_report oracle leans on one Spark internal fact: a
  * `repartition(P, expr)` places a row at pmod(murmur3_42(expr), P).
  * EnrichQueries.costPartOf precomputes that map for expr = doc_id % P;
  * this spec pins it against a LIVE repartition (via
  * spark_partition_id), so a Spark upgrade that changes the hash or the
  * partition-id arithmetic fails here with a named invariant instead of
  * as an opaque oracle mismatch. */
class CostLayoutSpec extends SparkSpecBase {

  test("costPartOf matches live repartition placement for every group") {
    val p = EnrichQueries.costParts
    val live = spark.range(0, 64) // several doc_ids per group
      .repartition(p, pmod(col("id"), lit(p)))
      .select(pmod(col("id"), lit(p)).as("g"), spark_partition_id().as("pid"))
      .distinct()
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong)
      .toMap
    assert(live.size == p.toLong, s"groups must map 1:1, got $live")
    (0L until p).foreach { g =>
      assert(live(g) == EnrichQueries.costPartOf(g),
        s"group $g: live partition ${live(g)} != precomputed ${EnrichQueries.costPartOf(g)}")
    }
  }

  test("cost report is layout-independent: same row from 1 and 13 input partitions") {
    val a = EnrichQueries.costReport(spark, sfDir).head
    val b = {
      // same data, hostile incoming layout — the deterministic
      // repartition inside the query must erase it
      val df = spark.read.parquet(s"$sfDir/documents.parquet").repartition(13)
      val tmp = java.nio.file.Files.createTempDirectory("costlayout").toString
      df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      EnrichQueries.costReport(spark, tmp).head
    }
    assert(a == b, s"cost report must not depend on input layout: $a vs $b")
  }
}
