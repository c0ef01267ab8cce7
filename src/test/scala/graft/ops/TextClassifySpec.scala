package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Multinomial NB semantics pinned against an independent in-memory
  * model on a hand-built fixture (same rounding contract: 9-rounded
  * logs, exact decimal accumulation, max-score/min-label argmax), plus
  * the degenerate paths (OOV-only doc, token-less doc, single-class
  * training) and an accuracy sanity bound on the real corpus.
  */
class TextClassifySpec extends SparkSpecBase {
  import spark.implicits._

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent reference scorer: exact BigDecimal accumulation over
    * the same 9-rounded log terms the operator defines. */
  private def refScores(train: Seq[(String, String)], text: String)
      : Map[String, BigDecimal] = {
    val toks = (s: String) => s.split("\\s+").filter(_.nonEmpty).toSeq
    val cnt = train.flatMap { case (c, t) => toks(t).map(c -> _) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val vocab = cnt.keys.map(_._2).toSet
    val tot = cnt.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val classes = train.map(_._1).distinct.sorted
    val nd = train.groupBy(_._1).map { case (c, d) => c -> d.size }
    val dec = (x: Double) => BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    classes.map { c =>
      val denom = (tot.getOrElse(c, 0L) + vocab.size).toDouble
      val prior = dec(r9(math.log(nd(c).toDouble / train.size)))
      val r0 = dec(r9(math.log(1.0 / denom)))
      val docToks = toks(text).filter(vocab.contains)
      val l = BigDecimal(docToks.size)
      val byTok = docToks.groupBy(identity).map { case (t, v) => t -> v.size }
      val s1 = byTok.toSeq.map { case (t, m) =>
        val dterm = cnt.get((c, t)).map(n =>
          dec(r9(math.log((n + 1.0) / denom))) - r0).getOrElse(BigDecimal(0))
        BigDecimal(m) * dterm
      }.sum
      c -> (prior + l * r0 + s1)
    }.toMap
  }

  private val fixtureTrain = Seq(
    ("spam", "buy cheap pills now"),
    ("spam", "cheap cheap offer now"),
    ("ham", "meeting notes for the team"),
    ("ham", "the team ships the release"),
    ("ham", "release notes for review"))

  private def run(test: Seq[(Long, String, String)]) = {
    val trainDf = fixtureTrain.toDF("lang", "text")
      .withColumn("doc_id", monotonically_increasing_id())
    val testDf = test.toDF("doc_id", "lang", "text")
    TextClassify.naiveBayes(trainDf, testDf, "doc_id", "lang", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
  }

  test("fixture scores and argmax match the independent reference model") {
    val docs = Seq(
      (1L, "spam", "cheap pills now now"),
      (2L, "ham", "the team release notes"),
      (3L, "ham", "review for the team meeting"))
    val got = run(docs)
    docs.zip(got).foreach { case ((id, truth, text), (gid, gt, pred, score, l)) =>
      assert(gid == id && gt == truth)
      val ref = refScores(fixtureTrain, text)
      val want = ref.toSeq.minBy { case (c, s) => (-s, c) }
      assert(pred == want._1, s"doc $id predicted $pred, reference ${want._1}")
      assert(score ==
        want._2.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val vocab = fixtureTrain.flatMap(_._2.split("\\s+")).toSet
      assert(l == text.split("\\s+").count(vocab.contains))
    }
  }

  test("OOV-only doc falls back to the prior argmax with zero vocab mass") {
    val got = run(Seq((9L, "ham", "zzz qqq xxx")))
    val (_, _, pred, score, l) = got.head
    assert(l == 0L)
    // ham has 3/5 of the training docs: max prior, and with zero vocab
    // tokens the score IS the rounded prior
    assert(pred == "ham")
    assert(score == BigDecimal(r9(math.log(3.0 / 5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("token-less doc (empty text) classifies by prior, not NaN") {
    val got = run(Seq((10L, "ham", "")))
    val (_, _, pred, score, l) = got.head
    assert(pred == "ham" && l == 0L && !score.isNaN)
  }

  test("single-class training labels everything with that class") {
    val trainDf = Seq(("only", "a b c"), ("only", "c d"))
      .toDF("lang", "text").withColumn("doc_id", lit(0L))
    val testDf = Seq((1L, "only", "a d zzz")).toDF("doc_id", "lang", "text")
    val out = TextClassify
      .naiveBayes(trainDf, testDf, "doc_id", "lang", "text").collect()
    assert(out.length == 1 && out.head.getString(2) == "only")
  }

  test("corpus sanity: held-out language accuracy beats chance") {
    // the synthetic corpus's lang classes share ONE vocabulary (the
    // generator draws every language's text from the same word list
    // with mildly different mixes), so a unigram model tops out around
    // 0.4 here — the bound asserts it extracts that distributional
    // signal (2× the 5-class chance rate), not fluent-language accuracy
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val out = TextClassify.naiveBayes(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "lang", "text")
    val (hit, n) = out.select(
        sum((col("lang_true") === col("lang_pred")).cast("long")),
        count(lit(1)))
      .as[(Long, Long)].head()
    assert(n > 0 && hit.toDouble / n > 0.3,
      s"accuracy ${hit.toDouble / n} at n=$n — 5-class chance is 0.2")
  }
}
