package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Sorted-neighborhood blocking: window semantics equal a Window-function
  * reference implementation; the reversed pass recovers early-position
  * edits the forward sort scatters; MintRank keeps the plan free of
  * one-partition windows. */
class SortedNeighborhoodSpec extends SparkSpecBase {

  /** Reference: same semantics via SQL window functions (fine in a spec;
    * the product path avoids the one-partition window). */
  private def reference(m: DataFrame, window: Int, maxDist: Int,
      keys: Seq[String]): Set[(Long, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    keys.map { k =>
      val keyed = m.withColumn("_key", expr(k))
      val ranked = keyed.withColumn("_rank",
        row_number().over(Window.orderBy(col("_key"), col("name"),
          col("mention_id"))).cast("long"))
      ranked.as("a").join(ranked.as("b"),
          col("b._rank") > col("a._rank") &&
            col("b._rank") <= col("a._rank") + (window - 1))
        .select(least(col("a.mention_id"), col("b.mention_id")).as("id_a"),
          greatest(col("a.mention_id"), col("b.mention_id")).as("id_b"),
          when(col("a.mention_id") < col("b.mention_id"), col("a.name"))
            .otherwise(col("b.name")).as("name_a"),
          when(col("a.mention_id") < col("b.mention_id"), col("b.name"))
            .otherwise(col("a.name")).as("name_b"))
    }.reduce(_.unionByName(_))
      .dropDuplicates("id_a", "id_b")
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= maxDist)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("lev"))).toSet
  }

  private def sn(m: DataFrame, window: Int, maxDist: Int,
      keys: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column])
      : Set[(Long, Long, Long)] =
    EntityResolution.sortedNeighborhoodPairs(m, "mention_id", "name",
      window, maxDist, keys)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("lev"))).toSet

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      // clustered names: families of 3 that sort near each other, with
      // distance-1 edits inside a family and noise across families
      val fam = i / 3
      val base = f"name-$fam%04d-suffix"
      val nm = (i % 3) match {
        case 0 => base
        case 1 => base.updated(5, '@') // substitution inside the key
        case 2 => base + "x"           // insertion at the end
      }
      (i.toLong, nm)
    }.toDF("mention_id", "name")
  }

  test("window semantics equal the window-function reference") {
    val m = corpus(90)
    for (w <- Seq(2, 4, 7); k <- Seq(1, 2)) {
      val got = sn(m, w, k, Seq(identity, reverse))
      val want = reference(m, w, k, Seq("name", "reverse(name)"))
      assert(got == want,
        s"w=$w k=$k: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"w=$w k=$k: degenerate fixture")
    }
  }

  test("reversed pass recovers early-position edits the forward sort misses") {
    import spark.implicits._
    // the planted pair differs in char 1 only; fillers sort between
    // them in forward order but share no suffix
    val planted = Seq((100L, "aqqqqqqqq"), (101L, "bqqqqqqqq"))
    // "az…" sorts after "aq…" and before "b…" — the fillers wedge the
    // planted pair > window apart in the forward order only
    val fillers = (0 until 40).map(i => (i.toLong, f"az$i%03d-filler"))
    val m = (planted ++ fillers).toDF("mention_id", "name")
    val forwardOnly = sn(m, 4, 1, Seq(identity))
    val both = sn(m, 4, 1, Seq(identity, reverse))
    assert(!forwardOnly.contains((100L, 101L, 1L)),
      "fixture broken: forward pass alone should miss the planted pair")
    assert(both.contains((100L, 101L, 1L)),
      "reversed pass must recover the early-position edit")
  }

  test("exact duplicates land in-window at distance 0") {
    import spark.implicits._
    val m = Seq((1L, "same-name"), (2L, "same-name"), (3L, "zz-other"))
      .toDF("mention_id", "name")
    val got = sn(m, 2, 1, Seq(identity))
    assert(got == Set((1L, 2L, 0L)))
  }
}
