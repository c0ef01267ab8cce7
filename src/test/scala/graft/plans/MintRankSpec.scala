package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.SparkSpecBase

/** MintRank must reproduce the zipWithIndex rank bit-for-bit, stay
  * multi-partition (no single-partition collapse), and append the rank
  * without disturbing the child's columns. */
class MintRankSpec extends SparkSpecBase {

  private lazy val df = {
    import spark.implicits._
    // deliberately unsorted, with enough rows to span partitions
    (1 to 5000).map(i => ((i * 7919) % 5000, s"name_${(i * 104729) % 5000}"))
      .toDF("k", "name")
  }

  test("rank matches the zipWithIndex formulation exactly") {
    val minted = MintRank.withRank(df, Seq("name", "k"))
      .select(col("k"), col("name"), col("_rank"))
      .collect().map(_.toSeq)

    val sorted = df
      .repartitionByRange(col("name"), col("k"))
      .sortWithinPartitions(col("name"), col("k"))
    val schema = sorted.schema.add("_rank", LongType, nullable = false)
    val viaZip = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      }, schema).collect().map(_.toSeq)

    assert(minted.sortBy(_.toString) sameElements viaZip.sortBy(_.toString))
  }

  test("rank is a dense 1..N permutation consistent with the total order") {
    val rows = MintRank.withRank(df, Seq("name", "k")).collect()
    val n = rows.length
    assert(rows.map(_.getAs[Long]("_rank")).sorted.toSeq == (1L to n).toSeq)
    val byRank = rows.sortBy(_.getAs[Long]("_rank"))
      .map(r => (r.getAs[String]("name"), r.getAs[Int]("k"))).toSeq
    assert(byRank == byRank.sorted)
  }

  test("physical plan: MintRankExec over a range exchange, multi-partition") {
    val minted = MintRank.withRank(df.repartition(7), Seq("name", "k"))
    val plan = minted.queryExecution.executedPlan.toString
    assert(plan.contains("MintRank "), plan)
    // the planner owns the sort: a range exchange, never SinglePartition
    // (AQE may still coalesce this tiny input's shuffle — that is runtime
    // right-sizing, not a single-partition plan)
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("empty input and single-row input") {
    import spark.implicits._
    val empty = MintRank.withRank(
      Seq.empty[(Int, String)].toDF("k", "name"), Seq("name"))
    assert(empty.count() == 0)
    val one = MintRank.withRank(Seq((1, "x")).toDF("k", "name"), Seq("name"))
      .collect()
    assert(one.map(_.getAs[Long]("_rank")).toSeq == Seq(1L))
  }
}
