package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** CorpusFilters unit battery: exact metric values on crafted docs (the
  * registered q_corpus_* queries add the DuckDB cross-engine check on the
  * fixture corpus; here we pin the semantics on inputs where the right
  * answer is computable by hand). */
class CorpusFiltersSpec extends SparkSpecBase {
  import CorpusFilters._

  test("wordNgrams builds space-joined grams and is empty below n words") {
    val df = spark.range(1).select(lit("a b c d").as("t"))
    val grams = df.select(wordNgrams(col("t"), 2).as("g")).head.getSeq[String](0)
    assert(grams == Seq("a b", "b c", "c d"))
    val short = df.select(wordNgrams(lit("solo"), 2).as("g")).head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("synthesizeLines groups words 3-per-line, remainder on last line") {
    val out = spark.range(1)
      .select(synthesizeLines(lit("a b c d e f g h"), 3).as("t"))
      .head.getString(0)
    assert(out == "a b c\nd e f\ng h")
  }

  test("duplicateLineStats: 3-of-5 duplicate lines") {
    import spark.implicits._
    // lines: a, b, a, c, a  -> dup group {a:3}; frac 3/5; chars 3*1/5*1
    val df = Seq((1L, "a\nb\na\nc\na")).toDF("doc_id", "text")
    val r = duplicateLineStats(df, "doc_id", "text").head
    assert(r.getAs[Long]("n_lines") == 5L)
    assert(r.getAs[Double]("dup_line_frac") == 0.6)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.6)
  }

  test("topNgramStats: deterministic lexicographic tiebreak") {
    import spark.implicits._
    // "x y x y x": 2-grams x y (2), y x (2) — tie broken to 'x y'
    val df = Seq((1L, "x y x y x")).toDF("doc_id", "text")
    val r = topNgramStats(df, "doc_id", "text", 2).head
    assert(r.getAs[String]("top_gram") == "x y")
    assert(r.getAs[Long]("top_gram_count") == 2L)
    // 2 * len("x y") / len("x y x y x") = 6/9
    assert(r.getAs[Double]("top_gram_char_frac") == math.rint(6.0 / 9.0 * 1e6) / 1e6)
  }

  test("duplicateNgramStats counts chars of grams occurring >= 2 times") {
    import spark.implicits._
    // grams: x y (2), y x (2) -> dup chars 4*3=12 over 9 chars (overlap
    // makes the fraction exceed 1 by design, as in the Gopher metric)
    val df = Seq((1L, "x y x y x"), (2L, "p q r s t")).toDF("doc_id", "text")
    val r = duplicateNgramStats(df, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("dup_2gram_char_frac") == math.rint(12.0 / 9.0 * 1e6) / 1e6)
    assert(r(1).getAs[Double]("dup_2gram_char_frac") == 0.0)
  }

  test("decontaminate flags only docs sharing a probe n-gram") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),   // shares 'alpha beta gamma' + 'beta gamma delta'? probe has 'alpha beta gamma' only
      (2L, "zeta eta theta iota")).toDF("doc_id", "text")
    val probes = Seq((99L, "alpha beta gamma")).toDF("doc_id", "text")
    val r = decontaminate(corpus, probes, "doc_id", "text", 3).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("doc_id") == 1L)
    assert(row.getAs[Long]("n_hits") == 1L)   // 'alpha beta gamma'
    assert(row.getAs[Long]("n_grams") == 2L)  // + 'beta gamma delta'
    assert(row.getAs[Double]("overlap_frac") == 0.5)
  }

  test("redactPii replaces email, IPv4, phone and counts each") {
    val t = lit("mail me at bob.smith@corp.example.org from 192.168.1.1 or call 555-0142 now")
    val r = spark.range(1).select(
      piiCount(t, emailRe).as("e"), piiCount(t, ipv4Re).as("i"),
      piiCount(t, phoneRe).as("p"), redactPii(t).as("red")).head
    assert(r.getAs[Int]("e") == 1 && r.getAs[Int]("i") == 1 && r.getAs[Int]("p") == 1)
    assert(r.getAs[String]("red") ==
      "mail me at <EMAIL> from <IP> or call <PHONE> now")
  }

  test("rateThresholdHex endpoints and monotonicity") {
    assert(rateThresholdHex(5, 5) == "ffffffff")
    assert(rateThresholdHex(0, 5) == "")
    val ts = (1L to 5L).map(rateThresholdHex(_, 5))
    assert(ts == ts.sorted && ts.distinct == ts)
  }

  test("keep-list cascade: every branch fires on a planted corpus") {
    import spark.implicits._
    val stops = Seq("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")
    // good doc: long, varied, stopword-rich — survives every gate
    val good = (0 until 120).map(i =>
      if (i % 3 == 0) stops((i / 3) % 10) else s"word$i").mkString(" ")
    // block repeated once: every 3-gram duplicates (dup3 high) while the
    // top 2-gram occurs only twice (top2 frac low)
    val block = (0 until 60).map(i =>
      if (i % 6 == 0) stops((i / 6) % 10) else s"uniq$i").mkString(" ")
    val docs = Seq(
      (1L, good),                                    // keep
      (2L, good),                                    // exact_dup (survivor 1)
      (3L, Array.fill(60)("spam").mkString(" ")),    // top_gram_repetition
      (4L, "x y"),                                   // low_quality
      (5L, block + " " + block))                     // dup_ngram_repetition
      .map { case (id, t) => (id, t, "en", s"src${id % 3}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("keeplist").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CorpusQueries.keepList(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(1L) == ((true, "")), s"good doc: ${out(1L)}")
    assert(out(2L) == ((false, "exact_dup")), s"dup doc: ${out(2L)}")
    assert(out(3L) == ((false, "top_gram_repetition")), s"spam doc: ${out(3L)}")
    assert(out(4L) == ((false, "low_quality")), s"short doc: ${out(4L)}")
    assert(out(5L) == ((false, "dup_ngram_repetition")), s"block doc: ${out(5L)}")
  }

  test("stratifiedSample: rate-1 keeps all, rate-0 keeps none, reruns agree") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "stratum")
    val all = stratifiedSample(df, "doc_id", "stratum",
      Map("a" -> ((5L, 5L)), "b" -> ((0L, 5L))))
    assert(all.count() == 100)
    assert(all.select("stratum").distinct().head.getString(0) == "a")
    val half = stratifiedSample(df, "doc_id", "stratum",
      Map("a" -> ((2L, 5L)), "b" -> ((2L, 5L))))
    val ids1 = half.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = half.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2) && ids1.nonEmpty && ids1.length < 200)
  }

  test("soft filter: keep rate tracks mean quality; reruns agree") {
    val out = graft.queries.CorpusQueries.softFilter(spark, "/root/testdata/sf0.01")
    val stats = out.agg(avg(col("quality")), avg(col("keep").cast("double")))
      .head
    // uniform draws: E[keep] = E[quality]; 500 docs → ±~0.07 at 3σ
    assert(math.abs(stats.getDouble(0) - stats.getDouble(1)) < 0.1,
      s"mean quality ${stats.getDouble(0)} vs keep rate ${stats.getDouble(1)}")
    val a = out.filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.queries.CorpusQueries.softFilter(spark, "/root/testdata/sf0.01")
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty && a.size < 500)
  }

  test("budget select: inclusive boundary, per-source budget respected") {
    val out = graft.queries.CorpusQueries.budgetSelect(spark, sfDir)
    // every non-taken doc's predecessor set already filled the budget:
    // cum_toks - n_toks >= budget for all taken=false rows
    assert(out.filter(!col("taken") &&
      col("cum_toks") - col("n_toks") < 2000).count() === 0)
    // the last taken doc per source may cross the budget (inclusive);
    // all earlier taken rows are strictly inside
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    val bad = out.withColumn("nxt", lead(col("taken"), 1).over(w))
      .filter(col("taken") && col("nxt") === true &&
        col("cum_toks") - col("n_toks") >= 2000)
      .count()
    assert(bad === 0)
    assert(out.filter(col("taken")).count() > 0)
  }

  test("lineDedup: first corpus-wide occurrence survives, docs rebuilt in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nboiler\nbeta"),   // all first occurrences
      (2L, "boiler\ngamma\nboiler"), // 'boiler' seen in doc 1 -> both dropped
      (3L, "delta\ngamma")           // 'gamma' seen in doc 2 -> dropped
    ).toDF("doc_id", "text")
    val out = lineDedup(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    def m(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    assert(out === Seq(
      (1L, 3L, 3L, m("alpha\nboiler\nbeta")),
      (2L, 3L, 1L, m("gamma")),
      (3L, 2L, 1L, m("delta"))))
  }

  test("lineDedup: skew-safe plan — hot line aggregates, never windows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Min, Partial}
    // a planted hot key: one boilerplate line occurring 10,000 times
    // across 1,000 docs — the real-corpus shape (the duplicated lines
    // ARE the hot ones). A row_number window partitioned by line would
    // funnel all 10k occurrences into one task's sort.
    val docs = (1L to 1000L).map { i =>
      (i, (Seq.fill(10)("boiler plate") :+ s"unique-$i").mkString("\n"))
    }.toDF("doc_id", "text")
    val out = lineDedup(docs, "doc_id", "text")
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.inputPlan)
        case other => other.children
      }
      (p +: kids.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
    }
    val all = nodes(out.queryExecution.executedPlan)
    val lineWindows = all.collect {
      case w: WindowExec
        if w.partitionSpec.exists(_.references.exists(_.name == "line")) => w
    }
    assert(lineWindows.isEmpty,
      "first-occurrence must not be a per-line window (skew hotspot)")
    val partialMin = all.exists {
      case a: BaseAggregateExec => a.aggregateExpressions.exists(ae =>
        ae.mode == Partial && ae.aggregateFunction.isInstanceOf[Min])
      case _ => false
    }
    assert(partialMin,
      "expected a map-side partial min(struct) for first occurrence")
    // and the semantics hold: only doc 1 keeps the boilerplate
    val rows = out.orderBy("doc_id").limit(2).collect()
    assert(rows(0).getLong(0) === 1L && rows(0).getLong(1) === 11L &&
      rows(0).getLong(2) === 2L) // 1 boiler line + unique-1 survive in doc 1
    assert(rows(1).getLong(1) === 11L && rows(1).getLong(2) === 1L)
  }

  test("3-way split: ~98/1/1 proportions, stable under corpus growth") {
    val full = graft.queries.CorpusQueries.split3(spark, "/root/testdata/sf0.01")
    val counts = full.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.93 && counts("train") / n < 1.0)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
    // hash-stability: the sf0.001 subset's assignments agree with the
    // same doc_ids' assignments in the larger corpus
    val small = graft.queries.CorpusQueries.split3(spark, sfDir)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = full.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.forall { case (id, s) => big.get(id).forall(_ == s) })
  }

  test("packSequences: hand-checked placement on a crafted stratum") {
    import spark.implicits._
    // budget 10; stream: 4 + 8 + 10 + 3 tokens
    //   doc 1: [0,4)   seq 0..0, offset 0, splits 0
    //   doc 2: [4,12)  seq 0..1, offset 4, splits 1  (cut at 10)
    //   doc 3: [12,22) seq 1..2, offset 2, splits 1  (cut at 20)
    //   doc 4: [22,25) seq 2..2, offset 2, splits 0
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val df = Seq((1L, "s", words(4)), (2L, "s", words(8)),
      (3L, "s", words(10)), (4L, "s", words(3)))
      .toDF("doc_id", "source", "text")
    val out = packSequences(df, "doc_id", "source", "text", 10)
      .orderBy("doc_id")
      .select("doc_id", "cum_start", "first_seq", "last_seq", "seq_offset",
        "n_splits")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out === Seq(
      (1L, 0L, 0L, 0L, 0L, 0L),
      (2L, 4L, 0L, 1L, 4L, 1L),
      (3L, 12L, 1L, 2L, 2L, 1L),
      (4L, 22L, 2L, 2L, 2L, 0L)))
  }

  test("packSequences: spans tile each stratum's stream with no gaps") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = packSequences(docs, "doc_id", "source", "text", 256)
    // within each source, next doc's cum_start == this doc's cum_end
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val gaps = out
      .withColumn("cum_end", col("cum_start") + col("n_toks"))
      .withColumn("next_start", lead(col("cum_start"), 1).over(w))
      .filter(col("next_start").isNotNull &&
        col("next_start") =!= col("cum_end"))
      .count()
    assert(gaps === 0)
    // first doc of every source starts at offset 0 of sequence 0
    val badFirst = out
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 &&
        (col("cum_start") =!= 0 || col("first_seq") =!= 0))
      .count()
    assert(badFirst === 0)
  }

  test("substringDupStats: cross-doc and within-doc recurring grams counted") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e"),           // shares "b c d" with doc 2
      (2L, "x b c d y"),
      (3L, "p q r s t"),           // all grams unique
      (4L, "m n o m n o m n"))     // every 3-gram occurs twice WITHIN the doc
      .toDF("doc_id", "text")
    val out = substringDupStats(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out === Seq(
      (1L, 3L, 1L, 0.333333),
      (2L, 3L, 1L, 0.333333),
      (3L, 3L, 0L, 0.0),
      (4L, 6L, 6L, 1.0)))
  }

  test("substringDupStats: docs shorter than n words emit no row") {
    import spark.implicits._
    val df = Seq((1L, "just two"), (2L, "one two three four")).toDF("doc_id", "text")
    val out = substringDupStats(df, "doc_id", "text", 3)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("dropDuplicatedSubstrings: first corpus-wide tile survives, docs rebuilt") {
    import spark.implicits._
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val df = Seq(
      (1L, "a b c d e f g"),   // tiles: "a b c", "d e f", "g"
      (2L, "a b c x y z"),     // "a b c" duplicated (doc 1 tile 0 wins), "x y z" kept
      (3L, "g h i"))           // "g h i" != doc 1's short tile "g" — kept
      .toDF("doc_id", "text")
    val out = dropDuplicatedSubstrings(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(out === Seq(
      (1L, 3L, 3L, md5Of("a b c d e f g")),
      (2L, 2L, 1L, md5Of("x y z")),
      (3L, 1L, 1L, md5Of("g h i"))))
  }

  test("dropDuplicatedSubstrings: within-doc repeats keep only the first tile") {
    import spark.implicits._
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    // tiles: "m n o" (kept), "m n o" (dropped), "m n" (distinct value, kept)
    val df = Seq((1L, "m n o m n o m n")).toDF("doc_id", "text")
    val r = dropDuplicatedSubstrings(df, "doc_id", "text", 3).head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) ===
      ((3L, 2L, md5Of("m n o m n"))))
  }
}
