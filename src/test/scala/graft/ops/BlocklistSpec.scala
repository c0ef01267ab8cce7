package graft.ops

import graft.SparkSpecBase

/** Blocklist phrase scan (CorpusFilters.blocklistScan): positional
  * occurrence counts, block/flag/keep cascade, top-phrase tiebreak. */
class BlocklistSpec extends SparkSpecBase {

  private val dict = Seq(
    ("bad phrase here", "block"),
    ("risky words", "flag"),
    ("mild concern", "flag"))

  private def scan(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    CorpusFilters.blocklistScan(rows.toDF("doc_id", "text"),
      "doc_id", "text", dict)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_phrases"),
          r.getAs[String]("top_phrase"), r.getAs[String]("verdict"))))
      .toMap
  }

  test("verdict cascade: block beats flag beats keep") {
    val out = scan(Seq(
      (1L, "prefix bad phrase here suffix"),             // block phrase once
      (2L, "risky words and then risky words again"),    // 2 flag hits
      (3L, "only mild concern once"),                    // 1 flag hit < 2
      (4L, "nothing matches in this document"),          // zero hits
      (5L, "bad phrase here plus risky words everywhere"))) // block wins
    assert(out(1L) == ((1L, 1L, "bad phrase here", "block")))
    assert(out(2L) == ((2L, 1L, "risky words", "flag")))
    assert(out(3L) == ((1L, 1L, "mild concern", "keep")))
    assert(out(4L) == ((0L, 0L, null, "keep")))
    assert(out(5L)._4 == "block")
    assert(out(5L)._1 == 2L && out(5L)._2 == 2L)
  }

  test("positional counting: overlapping occurrences each count") {
    import spark.implicits._
    val out = CorpusFilters.blocklistScan(
      Seq((1L, "risky risky risky risky")).toDF("doc_id", "text"),
      "doc_id", "text", Seq(("risky risky", "flag")))
      .collect().head
    // 2-gram "risky risky" matches at positions 1, 2 and 3
    assert(out.getAs[Long]("n_hits") == 3L)
    assert(out.getAs[String]("verdict") == "flag")
  }

  test("top phrase: max count, lexicographic tiebreak") {
    val out = scan(Seq(
      // "mild concern" and "risky words" once each -> tie -> lexicographic
      (1L, "mild concern then risky words"),
      // "risky words" twice beats "mild concern" once
      (2L, "risky words mild concern risky words")))
    assert(out(1L)._3 == "mild concern")
    assert(out(2L)._3 == "risky words")
    assert(out(1L)._4 == "flag") // 2 total flag hits
  }

  test("null text yields a keep row, not a dropped doc") {
    val out = scan(Seq((1L, null.asInstanceOf[String]), (2L, "risky words")))
    assert(out(1L) == ((0L, 0L, null, "keep")))
    assert(out.size == 2)
  }
}
