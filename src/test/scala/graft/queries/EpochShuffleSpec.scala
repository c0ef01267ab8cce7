package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffle: round-robin shard balance (the
  * by-construction law), per-shard dense sequences, epoch-to-epoch
  * permutation change, full determinism, and the scale shape (a
  * MintRank range exchange — no Window, no single-partition stage).
  */
class EpochShuffleSpec extends SparkSpecBase {

  private lazy val out = CorpusQueries.epochShuffle(spark, sfDir)
    .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
      r.getLong(3))).toSeq

  private lazy val nDocs = graft.Tables.documents(spark, sfDir).count()

  test("every (epoch, doc) appears exactly once; shards balance to ±1") {
    val epochs = out.map(_._1).distinct.sorted
    assert(epochs === Seq(0, 1))
    epochs.foreach { e =>
      val rows = out.filter(_._1 == e)
      assert(rows.map(_._2).distinct.length.toLong === nDocs)
      val sizes = rows.groupBy(_._3).view.mapValues(_.size).toMap
      assert(sizes.keySet === (0 until 8).toSet)
      assert(sizes.values.max - sizes.values.min <= 1,
        s"epoch $e shard sizes: $sizes")
      // dense within-shard sequence starting at 1
      sizes.foreach { case (s, n) =>
        val seqs = rows.filter(_._3 == s).map(_._4).sorted
        assert(seqs === (1L to n.toLong), s"epoch $e shard $s")
      }
    }
  }

  test("different epochs are different permutations of the same corpus") {
    val order0 = out.filter(_._1 == 0).sortBy(t => (t._3, t._4)).map(_._2)
    val order1 = out.filter(_._1 == 1).sortBy(t => (t._3, t._4)).map(_._2)
    assert(order0.sorted === order1.sorted) // same multiset
    assert(order0 !== order1)               // different order
    // and a doc's shard moves between epochs for a healthy fraction
    val s0 = out.filter(_._1 == 0).map(t => t._2 -> t._3).toMap
    val moved = out.filter(_._1 == 1).count(t => s0(t._2) != t._3)
    assert(moved > nDocs / 4, s"only $moved of $nDocs docs changed shard")
  }

  test("assignment is a pure function of (epoch, doc_id): reruns agree") {
    val again = CorpusQueries.epochShuffle(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(again === out)
  }

  test("plan shape: MintRank's range exchange, no Window stage") {
    val plan = CorpusQueries.epochShuffle(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MintRank"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }
}
