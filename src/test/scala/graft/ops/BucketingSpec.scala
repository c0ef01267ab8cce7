package graft.ops

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The reason bucketed tables exist: an equi-join of two tables
  * bucketed on the join key must plan with NO shuffle exchange on
  * either side (and, being in-bucket sorted, no extra sort of the scan
  * output). This spec pins that plan property — a regression here means
  * the ingest-time partitioning is being paid again on every query.
  */
class BucketingSpec extends SparkSpecBase {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.inputPlan)
      case other => other.children
    }
    (p +: kids.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed equi-join plans with zero shuffle exchanges") {
    // force the sort-merge path: a broadcast would hide the property
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = Bucketing.writeBucketed(spark,
        graft.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_quantity")),
        "graft_spec_bkt_li", "l_orderkey", 4)
      val o = Bucketing.writeBucketed(spark,
        graft.Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderpriority")),
        "graft_spec_bkt_o", "o_orderkey", 4)
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val shuffles = nodes(joined.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join should not shuffle, found: $shuffles")

      // and the result is the same as the un-bucketed join
      val plain = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"))
        .join(graft.Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() === plain.count())
      assert(joined.agg(sum(col("l_quantity").cast("decimal(18,2)")))
        .collect().head.getDecimal(0) ===
        plain.agg(sum(col("l_quantity").cast("decimal(18,2)")))
          .collect().head.getDecimal(0))
    }
  }

  test("ensureBucketed ingests once and reuses the table afterwards") {
    val df = graft.Tables.region(spark, sfDir)
    val first = Bucketing.ensureBucketed(spark, df, "graft_spec_bkt_r",
      "r_regionkey", 2)
    val n1 = first.count()
    assert(n1 > 0)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_spec_bkt_r")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing() = fs.listStatus(loc)
      .map(s => (s.getPath.getName, s.getModificationTime)).toSeq.sorted
    val before = listing()
    // a second ensure must NOT rewrite: same files, same mtimes
    val second = Bucketing.ensureBucketed(spark,
      sys.error("df thunk must not be forced on reuse"), "graft_spec_bkt_r",
      "r_regionkey", 2)
    assert(second.count() === n1)
    assert(listing() === before, "ensureBucketed rewrote an existing table")
  }

  test("re-writing a bucketed table is idempotent across catalog resets") {
    // simulate the stale-location hazard first: a previous session's
    // managed-table directory exists but the (in-memory) catalog has
    // never heard of the table — Spark refuses to create a managed
    // table over a non-empty location unless the writer clears it
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_spec_bkt_n")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    val stale = fs.create(new org.apache.hadoop.fs.Path(loc, "stale.bin"))
    stale.write(Array[Byte](1, 2, 3)); stale.close()

    val once = Bucketing.writeBucketed(spark,
      graft.Tables.nation(spark, sfDir), "graft_spec_bkt_n",
      "n_nationkey", 2)
    val n1 = once.count()
    assert(n1 > 0)
    // second write must replace, not fail or double up
    val twice = Bucketing.writeBucketed(spark,
      graft.Tables.nation(spark, sfDir), "graft_spec_bkt_n",
      "n_nationkey", 2)
    assert(twice.count() === n1)
  }
}
