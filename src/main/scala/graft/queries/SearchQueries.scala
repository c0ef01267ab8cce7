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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_search_bm25" -> bm25,
    "q_corpus_unigram_nll" -> unigramNll,
    "q_corpus_vocab_entropy" -> vocabEntropy,
    "q_corpus_length_pctl" -> lengthPercentiles)

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

  override def oracle: Map[String, String] = Map(
    "q_search_bm25" -> bm25Sql,
    "q_corpus_unigram_nll" -> nllSql,
    "q_corpus_vocab_entropy" -> entropySql,
    "q_corpus_length_pctl" -> pctlSql)
}
