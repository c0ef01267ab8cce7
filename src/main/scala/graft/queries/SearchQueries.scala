package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.KeywordSearch

/** Lexical retrieval + statistical LM scoring over `documents`: BM25
  * top-k for a bag-of-terms query and unigram-LM negative log-likelihood
  * per document. Both DuckDB hash-checked — the mirrors restate the
  * Scala arithmetic term by term (same operation order, ln rounded to 9
  * at the source, DECIMAL(28,12) partial sums) rather than algebraically
  * simplifying, so the doubles agree bit-for-bit after the final
  * 6-decimal round.
  */
object SearchQueries extends QueryModule {

  /** One rare term ("dup": df≈5% of docs) + two common ones — the score
    * separation comes from the rare term, exactly like a real query. */
  private val Terms = Seq("dup", "spark", "merge")
  private val K = 10
  private val K1 = 1.2
  private val B = 0.75

  /** BM25 top-10 for the fixed query; Lucene-variant idf. */
  def bm25(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.bm25TopK(Tables.documents(spark, dir), "doc_id", "text",
      Terms, K, K1, B)
      .orderBy(col("rk"))

  /** Per-doc unigram NLL (nats/token) under the corpus distribution. */
  def unigramNll(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.unigramNll(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Corpus unigram-entropy report (1 row). */
  def vocabEntropy(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.vocabEntropy(Tables.documents(spark, dir), "text")

  /** Per-source token-length distribution: exact interpolated
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, both
    * rank = p·(n−1) linear interpolation). At 100 TB the same report
    * runs on `approx_percentile` sketches; the exact form is the oracle
    * surface. */
  def lengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val toks = size(split(col("text"), "\\s+")).cast("long")
    Tables.documents(spark, dir)
      .select(col("source"), toks.as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(percentile(col("n_toks"), lit(0.5)), 6).as("p50"),
        round(percentile(col("n_toks"), lit(0.9)), 6).as("p90"),
        round(percentile(col("n_toks"), lit(0.99)), 6).as("p99"))
      .orderBy(col("source"))
  }

  /** Zipf-law fit over the frequency head: least-squares slope and
    * intercept of ln(freq) on ln(rank) for the top-1000 words (natural
    * text → slope ≈ −1; a badly skewed or synthetic corpus shows up as
    * a large deviation — a one-row corpus-health indicator).
    *
    * Determinism: rank comes from orderBy+limit (TakeOrderedAndProject —
    * bounded, so the rank window runs over ≤1000 rows); the four
    * regression sums are DECIMAL sums of 9-rounded ln values; the
    * closed-form slope/intercept are computed in double at the end and
    * rounded to 6. */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = KeywordSearch.unigramCounts(
      Tables.documents(spark, dir), "text")
    val top = vocab.orderBy(col("cnt").desc, col("word")).limit(1000)
    // products taken in DOUBLE then rounded before the DECIMAL cast:
    // decimal*decimal type-widening rules differ between engines, but a
    // 9-rounded double product is the same bits everywhere
    val ranked = top.withColumn("rn",
      row_number().over(Window.orderBy(col("cnt").desc, col("word"))))
      .select(
        round(log(col("rn")), 9).as("x"),
        round(log(col("cnt")), 9).as("y"))
    ranked
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,12)")).as("sx"),
        sum(col("y").cast("decimal(28,12)")).as("sy"),
        sum(round(col("x") * col("y"), 9).cast("decimal(28,12)")).as("sxy"),
        sum(round(col("x") * col("x"), 9).cast("decimal(28,12)")).as("sxx"))
      .select(col("n"),
        round((col("n") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("slope"),
        round((col("sy").cast("double") -
          ((col("n") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"))) *
            col("sx").cast("double")) / col("n"), 6).as("intercept"))
  }

  /** Per-doc bigram NLL (nats/bigram) under the corpus bigram LM. */
  def bigramNll(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.bigramNll(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_search_bm25" -> bm25,
    "q_corpus_unigram_nll" -> unigramNll,
    "q_corpus_bigram_nll" -> bigramNll,
    "q_corpus_vocab_entropy" -> vocabEntropy,
    "q_corpus_length_pctl" -> lengthPercentiles,
    "q_corpus_zipf" -> zipfFit)

  private val termList = Terms.map(t => s"'$t'").mkString(", ")

  private val bm25Sql: String =
    s"""WITH lens AS (
       |  SELECT doc_id, len(regexp_split_to_array(text, '\\s+')) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM lens),
       |tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM tok
       |  WHERE term IN ($termList) GROUP BY 1, 2),
       |idf AS (
       |  SELECT term,
       |    ROUND(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 9) AS idf
       |  FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       |    stats),
       |scored AS (
       |  SELECT t.doc_id, l.dl,
       |    ROUND(CAST(SUM(CAST(ROUND(
       |      i.idf * (t.tf * ($K1 + 1)) /
       |        (t.tf + $K1 * (1.0 - $B + $B * l.dl / s.avgdl)), 9)
       |      AS DECIMAL(28,12))) AS DOUBLE), 6) AS score,
       |    COUNT(*) AS n_terms_matched
       |  FROM tf t
       |  JOIN idf i USING (term)
       |  JOIN lens l USING (doc_id), stats s
       |  GROUP BY t.doc_id, l.dl),
       |ranked AS (
       |  SELECT doc_id, score, n_terms_matched, dl,
       |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
       |  FROM scored)
       |SELECT doc_id, rk, score, n_terms_matched, dl
       |FROM ranked WHERE rk <= $K ORDER BY rk""".stripMargin

  private val nllSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word
      |  FROM documents),
      |vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
      |tot AS (SELECT SUM(cnt) AS total FROM vocab),
      |j AS (
      |  SELECT t.doc_id,
      |    CAST(ROUND(ln(v.cnt), 9) AS DECIMAL(28,12)) AS lncnt
      |  FROM tok t JOIN vocab v USING (word))
      |SELECT doc_id, COUNT(*) AS n_toks,
      |  ROUND(ROUND(ln(total), 9)
      |    - CAST(SUM(lncnt) AS DOUBLE) / COUNT(*), 6) AS nll_nats
      |FROM j, tot GROUP BY doc_id, total ORDER BY doc_id""".stripMargin

  private val entropySql: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
      |  FROM documents),
      |vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
      |agg AS (
      |  SELECT COUNT(*) AS vocab_size, SUM(cnt) AS total_tokens,
      |    SUM(CAST(ROUND(cnt * ROUND(ln(cnt), 9), 6) AS DECIMAL(28,12)))
      |      AS sum_clc
      |  FROM vocab)
      |SELECT vocab_size, CAST(total_tokens AS BIGINT) AS total_tokens,
      |  ROUND(ROUND(ln(total_tokens), 9)
      |    - CAST(sum_clc AS DOUBLE) / total_tokens, 6) AS entropy_nats
      |FROM agg""".stripMargin

  private val pctlSql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_toks
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  ROUND(quantile_cont(n_toks, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(n_toks, 0.9), 6) AS p90,
      |  ROUND(quantile_cont(n_toks, 0.99), 6) AS p99
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  private val zipfSql: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(text, '\s+')) AS word
      |  FROM documents),
      |vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
      |top AS (SELECT word, cnt FROM vocab ORDER BY cnt DESC, word LIMIT 1000),
      |ranked AS (
      |  SELECT ROUND(ln(ROW_NUMBER() OVER (ORDER BY cnt DESC, word)), 9) AS x,
      |    ROUND(ln(cnt), 9) AS y
      |  FROM top),
      |sums AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CAST(x AS DECIMAL(28,12))) AS sx,
      |    SUM(CAST(y AS DECIMAL(28,12))) AS sy,
      |    SUM(CAST(ROUND(x * y, 9) AS DECIMAL(28,12))) AS sxy,
      |    SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,12))) AS sxx
      |  FROM ranked)
      |SELECT n,
      |  ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
      |    AS slope,
      |  ROUND((CAST(sy AS DOUBLE)
      |    - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |      * CAST(sx AS DOUBLE)) / n, 6) AS intercept
      |FROM sums""".stripMargin

  private val bigramSql: String =
    """WITH tw AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS w
      |  FROM documents WHERE len(regexp_split_to_array(text, '\s+')) >= 2),
      |dp AS (
      |  SELECT doc_id,
      |    unnest(list_slice(w, 1, len(w) - 1)) AS prev,
      |    unnest(list_slice(w, 2, len(w))) AS cur
      |  FROM tw),
      |tab AS (SELECT prev, cur, COUNT(*) AS c2 FROM dp GROUP BY 1, 2),
      |terms AS (
      |  SELECT prev, cur,
      |    CAST(ROUND(ln(SUM(c2) OVER (PARTITION BY prev)), 9)
      |      - ROUND(ln(c2), 9) AS DECIMAL(28,12)) AS term
      |  FROM tab)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  ROUND(CAST(SUM(term) AS DOUBLE) / COUNT(*), 6) AS bigram_nll
      |FROM dp JOIN terms USING (prev, cur)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q_search_bm25" -> bm25Sql,
    "q_corpus_unigram_nll" -> nllSql,
    "q_corpus_bigram_nll" -> bigramSql,
    "q_corpus_vocab_entropy" -> entropySql,
    "q_corpus_length_pctl" -> pctlSql,
    "q_corpus_zipf" -> zipfSql)
}
