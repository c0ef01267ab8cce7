package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** BM25 + unigram-LM scoring: hand-computed values on a tiny corpus,
  * invariants on the fixture corpus. */
class KeywordSearchSpec extends SparkSpecBase {
  import spark.implicits._

  private def tiny = Seq(
    (1L, "cat sat on the mat"),        // 5 tokens, one 'cat'
    (2L, "cat cat dog"),               // 3 tokens, two 'cat'
    (3L, "dog runs far away today"),   // 5 tokens, no 'cat'
    (4L, "the mat sat still here")     // 5 tokens, no 'cat'
  ).toDF("doc_id", "text")

  test("bm25: hand-computed score for a single-term query") {
    val out = KeywordSearch.bm25TopK(tiny, "doc_id", "text", Seq("cat"), k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // N=4, avgdl=4.5, df(cat)=2 → idf = ln(1 + 2.5/2.5) = ln 2 ≈ 0.693147181
    // doc2: tf=2, dl=3 → ln2·2·2.2/(2+1.2·(0.25+0.75·3/4.5)) = ln2·4.4/2.9 ≈ 1.051672
    // doc1: tf=1, dl=5 → ln2·2.2/(1+1.2·(0.25+0.75·5/4.5)) = ln2·2.2/2.3 ≈ 0.663010
    assert(out.length === 2)
    assert(out(0)._1 === 2L && out(0)._2 === 1)
    assert(math.abs(out(0)._3 - 1.051672) < 1e-5)
    assert(out(1)._1 === 1L && out(1)._2 === 2)
    assert(math.abs(out(1)._3 - 0.663010) < 1e-5)
  }

  test("bm25: rarer term dominates ranking on the fixture corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = KeywordSearch.bm25TopK(docs, "doc_id", "text",
      Seq("dup", "spark", "merge"), k = 10).collect()
    assert(out.length === 10)
    // every top-10 doc must contain the rare term: its idf dwarfs the
    // common terms', so no dup-less doc can outscore a dup-bearing one
    val dupDocs = docs.filter(col("text").rlike("(^| )dup( |$)"))
      .select("doc_id").as[Long].collect().toSet
    assert(out.forall(r => dupDocs.contains(r.getLong(0))))
    // ranks dense from 1, scores non-increasing
    assert(out.map(_.getInt(1)).toSeq === (1 to 10))
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("unigram nll: hand-computed values on the tiny corpus") {
    val out = KeywordSearch.unigramNll(tiny, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // total=18 tokens; counts: cat=3 dog=2 the=2 sat=2 mat=2 on=1 runs=1
    // far=1 away=1 today=1 still=1 here=1
    def nll(cnts: Seq[Int]): Double = {
      def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      val s = cnts.map(c => r9(math.log(c))).sum
      (BigDecimal(math.log(18)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        - s / cnts.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 4L))
    assert(out(0)._2 === 5L)
    assert(math.abs(out(0)._3 - nll(Seq(3, 2, 1, 2, 2))) < 1e-9)  // cat sat on the mat
    assert(math.abs(out(1)._3 - nll(Seq(3, 3, 2))) < 1e-9)        // cat cat dog
  }

  test("unigram nll: a repeated-word doc scores lower than a diverse one") {
    val docs = Seq(
      (1L, "alpha alpha alpha alpha alpha alpha alpha alpha"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val out = KeywordSearch.unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(out(0) < out(1))
  }

  test("vocab entropy: ln(k) for a uniform corpus, 0 for a constant one") {
    val uniform = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val u = KeywordSearch.vocabEntropy(uniform, "text").head
    assert(u.getLong(0) === 4L && u.getLong(1) === 4L)
    assert(math.abs(u.getDouble(2) - math.log(4)) < 1e-6)
    val const = Seq((1L, "a a a a a a")).toDF("doc_id", "text")
    val c = KeywordSearch.vocabEntropy(const, "text").head
    assert(c.getLong(0) === 1L && math.abs(c.getDouble(2)) < 1e-6)
  }

  test("bigram nll: zero for deterministic order, positive for mixed order") {
    val docs = Seq(
      (1L, "a b a b a b a b"),  // after 'a' always 'b'; after 'b' always 'a'
      (2L, "c d d c c d c c")   // mixed continuations
    ).toDF("doc_id", "text")
    val out = KeywordSearch.bigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(math.abs(out(0)) < 1e-9)
    assert(out(1) > 0.1)
  }

  test("zipf fit: negative slope on the fixture, near -1 on a zipfian corpus") {
    val fixture = graft.queries.SearchQueries.zipfFit(spark, sfDir).head
    assert(fixture.getDouble(1) < 0.0)
    // crafted corpus with freq(rank r) = round(1000/r): slope ~ -1
    val words = (1 to 50).flatMap(r =>
      Seq.fill(math.max(1000 / r, 1))(s"w$r")).mkString(" ")
    val df = Seq((1L, words)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("zipf").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fit = graft.queries.SearchQueries.zipfFit(spark, tmp).head
    assert(math.abs(fit.getDouble(1) - (-1.0)) < 0.05, s"slope=${fit.getDouble(1)}")
  }

  test("unigram nll: shuffle-join path agrees with broadcast path") {
    val docs = graft.Tables.documents(spark, sfDir).limit(200)
    val a = KeywordSearch.unigramNll(docs, "doc_id", "text",
      broadcastVocab = true).orderBy("doc_id").collect().toSeq
    val b = KeywordSearch.unigramNll(docs, "doc_id", "text",
      broadcastVocab = false).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("rrf fusion: hand-computed scores, missing legs contribute zero") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rk")
    val vec = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rk")
    val out = KeywordSearch.rrfFuse(
      Seq("lex" -> lex, "vec" -> vec), "doc_id", k = 3, c = 60)
      .orderBy("rk").collect()
    // 20: 1/62 + 1/61 = 0.032522; 10: 1/61 = 0.016393; 40: 1/62 = 0.016129
    assert(out.map(_.getLong(0)).toSeq === Seq(20L, 10L, 40L))
    assert(out.map(_.getDouble(1)).toSeq === Seq(0.032522, 0.016393, 0.016129))
    assert(out.map(_.getInt(2)).toSeq === Seq(1, 2, 3))
    // doc 40 was not retrieved by the lex leg; doc 10 not by the vec leg
    assert(out(2).isNullAt(3) && out(1).isNullAt(4))
  }

  test("rrf fusion: a doc found by both legs outranks single-leg docs of equal depth") {
    val q = graft.queries.SearchQueries.hybridRrf(spark, "/root/testdata/sf0.01")
    val rows = q.collect()
    assert(rows.length === 10)
    // ranks dense, fused scores non-increasing
    assert(rows.map(_.getInt(2)).toSeq === (1 to 10))
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // any doc present in BOTH legs must beat every single-leg doc
    // (2/(60+20) > 1/61 for any single-leg rank), so if one exists it is rank 1
    val both = rows.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
    if (both.nonEmpty) assert(!rows(0).isNullAt(3) && !rows(0).isNullAt(4))
  }

  test("dsir: hand-computed log ratios on a two-word corpus") {
    val docs = Seq((1L, "alpha alpha"), (2L, "beta beta")).toDF("doc_id", "text")
    val out = KeywordSearch.dsirLogRatio(docs, "doc_id", "text",
      col("doc_id") === 1L).orderBy("doc_id").collect()
    // V=2, tot_r=4, tot_t=2
    // alpha: ln(3/4) - ln(3/6) = ln 1.5 = 0.405465; beta: ln(1/4) - ln(3/6) = -ln 2
    assert(out(0).getLong(1) === 2L && out(1).getLong(1) === 2L)
    assert(math.abs(out(0).getDouble(2) - 0.405465) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - (-0.693147)) < 1e-6)
  }

  test("dsir: target documents average above non-target on the fixture corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val w = KeywordSearch.dsirLogRatio(docs, "doc_id", "text",
      col("source") === "src0")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val m = w.groupBy((col("source") === "src0").as("is_t"))
      .agg(avg(col("dsir_logw")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"target mean ${m(true)} should exceed non-target mean ${m(false)}")
  }
}
