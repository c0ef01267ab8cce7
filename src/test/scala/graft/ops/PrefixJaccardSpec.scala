package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Prefix-filter exact Jaccard join (Dedup.prefixJaccardPairs): the
  * losslessness claim is that it equals the brute-force all-pairs join
  * bit-for-bit — including pairs sitting exactly ON the threshold —
  * while generating candidates only from each set's rarest shingles. */
class PrefixJaccardSpec extends SparkSpecBase {

  /** Uncapped all-pairs ground truth over the same shingle sets. */
  private def bruteForce(docs: DataFrame, t: Double): Set[(Long, Long, Long, Double)] = {
    val sh = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"))).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= t)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_inter"), r.getAs[Double]("jaccard")))
      .toSet
  }

  private def prefixPairs(docs: DataFrame, t: Double): Set[(Long, Long, Long, Double)] =
    Dedup.prefixJaccardPairs(docs, "doc_id", "text", t).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_inter"), r.getAs[Double]("jaccard")))
      .toSet

  test("lossless: equals brute-force all-pairs on a mixed-length corpus") {
    import spark.implicits._
    // deterministic corpus: 12 near-dup families of varying sizes and
    // mutation depth, plus singletons — lengths 5..40 words so prefix
    // lengths and length-filter bounds all vary
    val docs = (0 until 72).map { i =>
      val fam = i % 12
      val base = (0 until (5 + 3 * fam)).map(w => s"fam${fam}_w$w")
      val mut = (i / 12) match {
        case 0 => base
        case k => base.updated(base.size - 1, s"mut${i}_$k") ++
          (0 until (k - 1)).map(j => s"tail${i}_$j")
      }
      (i.toLong, mut.mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val brute = bruteForce(docs, t)
      val pref = prefixPairs(docs, t)
      assert(pref == brute,
        s"t=$t: prefix join diverged from brute force — " +
          s"missing=${(brute -- pref).take(3)} extra=${(pref -- brute).take(3)}")
      assert(brute.nonEmpty, s"t=$t: degenerate fixture, no pairs at all")
    }
  }

  test("threshold boundary: J exactly at t kept, just below dropped") {
    import spark.implicits._
    val w6 = (1 to 6).map(i => s"common$i").mkString(" ")
    // 8-word docs sharing their first 6 words: 6 shingles each, 4
    // shared -> J = 4/8 = 0.5 exactly; the 9-word variants have 7
    // shingles, still 4 shared -> J = 4/10 = 0.4 < 0.5
    val docs = Seq(
      (1L, s"$w6 ax1 ax2"), (2L, s"$w6 bx1 bx2"),
      (3L, s"$w6 cy1 cy2 cy3"), (4L, s"$w6 dy1 dy2 dy3"))
      .toDF("doc_id", "text")
    val got = prefixPairs(docs, 0.5)
    assert(got == Set((1L, 2L, 4L, 0.5)),
      s"expected exactly the on-threshold pair, got $got")
  }

  test("boilerplate corpus: candidates stay at the true pairs only") {
    import spark.implicits._
    val boiler = "this disclaimer appears verbatim in every single document"
    val n = 100
    // 30-word docs: 8 boilerplate + 22 unique words. Unique-shingle mass
    // (24 of 28 shingles) exceeds the t=0.5 prefix (15), so no prefix
    // ever reaches the corpus-hot boilerplate shingles.
    val docs = (0 until n).map { i =>
      val tag = if (i == 7 || i == 8) "dup" else s"u$i"
      val tail = (0 until 22).map(w => s"${tag}_w$w").mkString(" ")
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val (cand, _) = Dedup.prefixJaccardCandidates(docs, "doc_id", "text", 0.5)
    val candidates = cand.collect()
    assert(candidates.length == 1,
      s"expected exactly the planted candidate pair, got ${candidates.length}")
    val out = prefixPairs(docs, 0.5)
    assert(out.size == 1 && out.head._1 == 7L && out.head._2 == 8L)
    // identical 30-word texts -> identical shingle sets -> J = 1.0
    assert(out.head._4 == 1.0)
  }

  test("incremental: equals brute-force incoming x corpus, df-0 unseen rule") {
    import spark.implicits._
    // corpus: 40 docs; incoming: near-dups of corpus docs (found), a
    // doc of entirely UNSEEN shingles (df 0 everywhere — must yield
    // nothing, not crash), and a half-new doc straddling the threshold
    val corpus = (0 until 40).map { i =>
      (i.toLong, (0 until 10).map(w => s"c${i}_w$w").mkString(" "))
    }.toDF("doc_id", "text")
    val incoming = Seq(
      (100L, (0 until 10).map(w => s"c7_w$w").mkString(" ")),   // = doc 7
      (101L, ((0 until 9).map(w => s"c3_w$w") :+ "novel").mkString(" ")),
      (102L, (0 until 10).map(w => s"new_w$w").mkString(" ")))  // all unseen
      .toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8)) {
      val got = Dedup.prefixJaccardAgainst(corpus, incoming,
        "doc_id", "text", t).collect()
        .map(r => (r.getAs[Long]("incoming_id"), r.getAs[Long]("corpus_id"),
          r.getAs[Long]("n_inter"), r.getAs[Double]("jaccard"))).toSet
      // brute force: shared shingles across the two sides
      val shOf = (d: org.apache.spark.sql.DataFrame) =>
        d.select(col("doc_id"), explode(Dedup.shingles(col("text")))
          .as("shingle"))
      val want = shOf(incoming).as("a")
        .join(shOf(corpus).as("b"), col("a.shingle") === col("b.shingle"))
        .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ic"))
        .agg(count(lit(1)).as("ni"))
        .join(shOf(incoming).groupBy(col("doc_id").as("ia"))
          .agg(count(lit(1)).as("na")), "ia")
        .join(shOf(corpus).groupBy(col("doc_id").as("ic"))
          .agg(count(lit(1)).as("nb")), "ic")
        .withColumn("j", round(col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")), 6))
        .filter(col("j") >= t)
        .collect()
        .map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ic"),
          r.getAs[Long]("ni"), r.getAs[Double]("j"))).toSet
      assert(got == want, s"t=$t: got $got want $want")
      if (t == 0.5) {
        assert(got.exists(_._1 == 100L), "exact copy must match its source")
        assert(!got.exists(_._1 == 102L), "all-unseen doc must match nothing")
      }
    }
  }

  test("single-shingle short docs and null text behave like the oracle") {
    import spark.implicits._
    // <3-word docs shingle to [whole text]; null text yields no rows
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other one"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = prefixPairs(docs, 0.5)
    assert(got == Set((1L, 2L, 1L, 1.0)), s"got $got")
  }
}
