package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** tfidfTopK: hand-computed scores on a tiny corpus, term-text
  * tiebreak, the k bound, and agreement between the broadcast and
  * shuffle df-join paths. The registered q_text_keywords adds the
  * DuckDB hash check over the documents fixture. */
class TfidfSpec extends SparkSpecBase {
  import spark.implicits._

  // N = 3; df(apple)=2, df(banana)=2, df(cherry)=2 →
  // idf = round(ln(4/3), 9) = 0.287682072 for every term
  private val docs = Seq(
    (1L, "apple apple banana"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry")).toDF("doc_id", "text")

  test("scores match hand math; ranking is score-then-term") {
    val out = KeywordSearch.tfidfTopK(docs, "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rk"))
      .select(col("doc_id"), col("rk"), col("term"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val idf = math.rint(math.log(4.0 / 3.0) * 1e9) / 1e9
    def s(tf: Int, dl: Int): Double =
      math.rint(tf * idf / dl * 1e6) / 1e6
    assert(out.toSeq === Seq(
      (1L, 1L, "apple", s(2, 3)), (1L, 2L, "banana", s(1, 3)),
      // doc 2: equal scores — banana before cherry by term text
      (2L, 1L, "banana", s(1, 2)), (2L, 2L, "cherry", s(1, 2)),
      (3L, 1L, "cherry", s(2, 3)), (3L, 2L, "apple", s(1, 3))))
  }

  test("k bounds the per-doc output") {
    val out = KeywordSearch.tfidfTopK(docs, "doc_id", "text", k = 1)
    assert(out.groupBy(col("doc_id")).count()
      .collect().forall(_.getLong(1) === 1L))
  }

  test("broadcast and shuffle df-join paths agree") {
    val b = KeywordSearch.tfidfTopK(docs, "doc_id", "text", k = 3,
      broadcastDf = true).collect().map(_.toString).toSet
    val s = KeywordSearch.tfidfTopK(docs, "doc_id", "text", k = 3,
      broadcastDf = false).collect().map(_.toString).toSet
    assert(b === s)
  }

  test("a corpus-unique term outranks common ones regardless of tf") {
    val d = Seq(
      (1L, "the the the zebra"),
      (2L, "the quick fox"),
      (3L, "the lazy dog")).toDF("doc_id", "text")
    val top = KeywordSearch.tfidfTopK(d, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 1L).select(col("term"))
      .collect().head.getString(0)
    // idf(the)=ln(4/4)=0: even tf=3 scores 0; zebra (df=1) wins
    assert(top === "zebra")
  }
}
