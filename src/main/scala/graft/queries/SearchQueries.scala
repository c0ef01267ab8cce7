package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{FreqSketch, KeywordSearch, Similarity, Sketches}

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

  /** Persisted-inverted-index round trip: tokenize + save the posting
    * lists once (term-bucket-partitioned, atomically published), then
    * answer the same fixed query from the index — static bucket pruning
    * + shared scoring make the result identical to q_search_bm25 by
    * construction, so this verifies the persistence layer against the
    * same DuckDB mirror. The index dir is keyed by data dir AND process
    * (the knnIvfPqIndex convention: concurrent bench/verify must not
    * interleave a build with a read). */
  def bm25Index(spark: SparkSession, dir: String): DataFrame = {
    val ixDir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_inv_index_" + java.util.UUID.nameUUIDFromBytes(
        dir.getBytes("UTF-8")).toString.take(8) +
        "_p" + ProcessHandle.current().pid()).getAbsolutePath
    graft.ops.InvertedIndex.save(Tables.documents(spark, dir),
      "doc_id", "text", ixDir)
    graft.ops.InvertedIndex.bm25TopK(spark, ixDir, Terms, K, K1, B)
      .orderBy(col("rk"))
  }

  /** Per-doc unigram NLL (nats/token) under the corpus distribution. */
  def unigramNll(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.unigramNll(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Corpus unigram-entropy report (1 row). */
  def vocabEntropy(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.vocabEntropy(Tables.documents(spark, dir), "text")

  /** DoReMi-lite mixture tuning: per-source excess unigram NLL →
    * multiplicative-weights trajectory (η = 2, steps 1..4). */
  def domainReweight(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.domainReweight(Tables.documents(spark, dir),
      "source", "text", DrEta, DrSteps)
      .orderBy(col("source"), col("step"))

  private val DrEta = 2.0
  private val DrSteps = 4

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

  /** Per-source token-length quantiles from the bounded-state log
    * histogram (4·⌊log₂⌋ + 2 mantissa bits — ≤ 248 counter rows per
    * source shuffle, no value sort), next to the exact interpolated
    * percentiles as the audit columns: the 100 TB version of
    * q_corpus_length_pctl, with its quantization error measured in the
    * output. The mirror rebuilds the identical integer-keyed histogram
    * and midpoint picks. */
  def histPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val toks = size(split(col("text"), "\\s+")).cast("long")
    val base = Tables.documents(spark, dir)
      .select(col("source"), toks.as("n_toks"))
    val est = Sketches.histQuantiles(base, "source", "n_toks",
      Seq(0.5, 0.9, 0.99))
    val exact = base.groupBy(col("source"))
      .agg(round(percentile(col("n_toks"), lit(0.5)), 6).as("p50_exact"),
        round(percentile(col("n_toks"), lit(0.9)), 6).as("p90_exact"),
        round(percentile(col("n_toks"), lit(0.99)), 6).as("p99_exact"))
    est.join(exact, "source")
      .select(col("source"), col("n_rows").as("n_docs"),
        col("p50_est"), col("p90_est"), col("p99_est"),
        col("p50_exact"), col("p90_exact"), col("p99_exact"),
        round(abs(col("p50_est") - col("p50_exact")) / col("p50_exact"), 6)
          .as("rel_p50"),
        round(abs(col("p90_est") - col("p90_exact")) / col("p90_exact"), 6)
          .as("rel_p90"),
        round(abs(col("p99_est") - col("p99_exact")) / col("p99_exact"), 6)
          .as("rel_p99"))
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

  private val LegK = 20
  private val FuseK = 10
  private val RrfC = 60
  private val QueryVecId = 0L

  /** Hybrid retrieval: BM25 top-20 (the fixed bag-of-terms query) and
    * exact-cosine top-20 of query vector 0 (doc_id ≡ vec_id in the
    * fixture corpus), fused by reciprocal-rank fusion (c = 60) into a
    * final top-10. The production hybrid-search shape: ranks cross the
    * legs, never raw scores. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val lex = KeywordSearch.bm25TopK(Tables.documents(spark, dir),
        "doc_id", "text", Terms, LegK, K1, B)
      .select(col("doc_id"), col("rk"))
    val emb = Tables.embeddings(spark, dir)
    val vec = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") === QueryVecId), LegK)
      .select(col("neighbor_id").as("doc_id"), col("rk"))
    KeywordSearch.rrfFuse(Seq("lex" -> lex, "vec" -> vec),
      "doc_id", FuseK, RrfC)
      .orderBy(col("rk"))
  }

  private val DsirTarget = "src0"

  /** DSIR importance weights: per-doc mean log-ratio of the add-one
    * target (source = src0) unigram LM to the raw corpus LM — the
    * importance-resampling rank key for target-matched data selection. */
  def dsir(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.dsirLogRatio(Tables.documents(spark, dir),
      "doc_id", "text", col("source") === DsirTarget)
      .orderBy(col("doc_id"))

  private val KmvK = 256

  /** Per-source distinct-shingle cardinality via the bounded-state KMV
    * sketch (k = 256): the distinct-count report that still runs when
    * the corpus is 100 TB — only k hashes per (partition, source) ever
    * shuffle. The exact count rides along as the audit column; the
    * oracle rebuilds the identical sketch (k smallest distinct 60-bit
    * md5-prefix hashes) in SQL and checks estimate AND state. */
  def distinctKmv(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.GraftFunctions.shingles(col("text"), 3))
          .as("gram"))
      .select(col("source"),
        conv(substring(md5(col("gram").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("hv"))
    Sketches.kmvDistinct(grams, "source", "hv", KmvK)
      .orderBy(col("source"))
  }

  /** Pairwise cross-source contamination matrix: for every source pair,
    * the KMV-estimated shared-shingle cardinality and Jaccard (the
    * 100 TB path — one bounded aggregate, |sources| sketches of ≤ k
    * longs) NEXT TO the exact intersection/union/Jaccard audit legs
    * (affordable here because |sources| is small and each shingle hash
    * lands in ≤ |sources| groups, so the self-join fan-out is bounded).
    * One staged distinct (source, hv) frame feeds sketches, sizes, and
    * the exact self-join — the corpus text is tokenized ONCE. */
  def overlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.ops.Checkpoints.stage(
      Tables.documents(spark, dir)
        .select(col("source"),
          explode(graft.functions.GraftFunctions.shingles(col("text"), 3))
            .as("gram"))
        .select(col("source"),
          conv(substring(md5(col("gram").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("hv"))
        .distinct(), eager = true)
    val est = Sketches.kmvOverlapMatrix(sh, "source", "hv", KmvK)
      .select(col("group_a").as("source_a"), col("group_b").as("source_b"),
        col("u_size"), col("n_both"), col("est_union"), col("est_inter"),
        col("est_jaccard"))
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.hv") === col("y.hv") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("exact_inter"))
    // the pair spine IS the sketch matrix — a driver-built local
    // relation (structurally bounded, satisfying the BNLJ plan guard),
    // so every audit leg attaches with a plain equi-join; a
    // `sizes < sizes` inequality join would put an unbounded aggregate
    // on the broadcast side of a nested-loop join
    est
      .join(sizes.select(col("source").as("source_a"), col("n").as("n_a")),
        Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("n").as("n_b")),
        Seq("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .withColumn("exact_union", col("n_a") + col("n_b") - col("exact_inter"))
      .withColumn("exact_jaccard",
        round(col("exact_inter") / col("exact_union").cast("double"), 6))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("exact_inter"), col("exact_union"), col("exact_jaccard"),
        col("u_size"), col("n_both"), col("est_union"), col("est_inter"),
        col("est_jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private val HllP = 8

  /** Per-source distinct-shingle cardinality via HyperLogLog (p = 8,
    * m = 256 registers): the fixed-size companion to the KMV report —
    * same hash stream, 2^p six-bit ranks instead of k exact hashes, and
    * a register MAX that is monotone (so the identical plan is the
    * streaming leg's state). The oracle rebuilds the full register file
    * from the same portable hash via string bit arithmetic and checks
    * the integer register sum AND the estimator's error bound.
    *
    * Hash-surface hardening (r10: the driver comparator hash-FAILed
    * this row while local reruns matched at both SFs — reg_sum is the
    * whole surface's only value past 2^63): reg_sum crosses the compare
    * as a STRING on both engines (int128/DECIMAL(38,0) serialization
    * can never diverge on plain digits), and the double-typed estimate
    * + rel_err cross as a tolerance BOOLEAN (3σ = 3·1.04/√256 = 0.195)
    * per the q_corpus_curriculum_approx convention — each engine judges
    * its own estimator against its own exact count, so no float
    * division rides the wire. HllSpec still pins the exact estimator
    * arithmetic in-memory. */
  def distinctHll(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.GraftFunctions.shingles(col("text"), 3))
          .as("gram"))
      .select(col("source"),
        conv(substring(md5(col("gram").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("hv"))
    Sketches.hllDistinct(grams, "source", "hv", HllP)
      .select(col("source"), col("zero_regs"),
        col("reg_sum").cast("string").as("reg_sum"),
        col("exact_distinct"),
        (col("rel_err") <= lit(0.195)).as("est_ok"))
      .orderBy(col("source"))
  }

  private val CmsDepth = 4
  private val CmsWidth = 2048

  /** Count-min sketch over the corpus's per-doc-distinct 3-gram
    * shingles (the dedup family's vocabulary — ~16k distinct grams at
    * sf0.001, so the 4 x 2048 matrix is under real collision pressure,
    * unlike the fixture's 31-word unigram vocab): build the counter
    * matrix, then point-estimate the 20 most frequent grams against it
    * next to their exact counts (est_n >= exact_n by construction — the
    * spec pins the bound, the oracle rebuilds the exact counters via
    * the same portable md5-prefix hash in SQL). */
  def cmsTopK(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(graft.functions.GraftFunctions.shingles(col("text"), 3))
        .as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
    val sketch = FreqSketch.countMin(vocab, "gram", "cnt",
      CmsDepth, CmsWidth)
    val top = vocab.orderBy(col("cnt").desc, col("gram")).limit(20)
    FreqSketch.estimate(sketch, top, "gram", CmsDepth, CmsWidth)
      .select(col("gram"), col("cnt").as("exact_n"), col("est_n"))
      .orderBy(col("exact_n").desc, col("gram"))
  }

  /** TF-IDF top-3 keywords per document (KeywordSearch.tfidfTopK):
    * smooth idf ln((N+1)/(df+1)) rounded at the source, score =
    * tf·idf/dl rounded to 6, term-text tiebreak — rank-stable across
    * engines. */
  def keywords(spark: SparkSession, dir: String): DataFrame =
    KeywordSearch.tfidfTopK(Tables.documents(spark, dir), "doc_id", "text",
      k = 3)
      .orderBy(col("doc_id"), col("rk"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_keywords" -> keywords,
    "q_corpus_cms_topk" -> cmsTopK,
    "q_search_bm25" -> bm25,
    "q_search_bm25_index" -> bm25Index,
    "q_search_hybrid_rrf" -> hybridRrf,
    "q_corpus_unigram_nll" -> unigramNll,
    "q_corpus_bigram_nll" -> bigramNll,
    "q_corpus_vocab_entropy" -> vocabEntropy,
    "q_corpus_domain_reweight" -> domainReweight,
    "q_corpus_length_pctl" -> lengthPercentiles,
    "q_corpus_zipf" -> zipfFit,
    "q_corpus_dsir" -> dsir,
    "q_corpus_distinct_kmv" -> distinctKmv,
    "q_corpus_overlap_matrix" -> overlapMatrix,
    "q_corpus_distinct_hll" -> distinctHll,
    "q_corpus_hist_pctl" -> histPercentiles)

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

  /** Mirrors domainReweight site for site: 9-rounded ln, 6-rounded
    * products DECIMAL-summed, 9-rounded exp, DECIMAL step normalizers,
    * single 6-rounded double divisions. η and steps inlined from the
    * query constants. */
  private val domainReweightSql: String =
    """WITH words AS (
      |  SELECT source AS d, unnest(regexp_split_to_array(text, '\s+')) AS word
      |  FROM documents),
      |dw AS (SELECT d, word, COUNT(*) AS dcnt FROM words GROUP BY 1, 2),
      |gl AS (SELECT word, SUM(dcnt) AS gcnt FROM dw GROUP BY 1),
      |gt AS (SELECT SUM(dcnt) AS gtot FROM dw),
      |perdom AS (
      |  SELECT d, SUM(dcnt) AS n_toks,
      |    SUM(CAST(ROUND(dcnt * ROUND(ln(gcnt), 9), 6) AS DECIMAL(28,12)))
      |      AS sum_g,
      |    SUM(CAST(ROUND(dcnt * ROUND(ln(dcnt), 9), 6) AS DECIMAL(28,12)))
      |      AS sum_o
      |  FROM dw JOIN gl USING (word) GROUP BY 1),
      |ex AS (
      |  SELECT d, n_toks,
      |    ROUND((ROUND(ln(gtot), 9)
      |        - CAST(sum_g AS DOUBLE) / CAST(n_toks AS DOUBLE))
      |      - (ROUND(ln(n_toks), 9)
      |        - CAST(sum_o AS DOUBLE) / CAST(n_toks AS DOUBLE)), 6)
      |      AS excess_nll
      |  FROM perdom, gt),
      |st AS (
      |  SELECT d, n_toks, excess_nll, s.step,
      |    ROUND(exp(2.0 * s.step * excess_nll), 9) AS boost
      |  FROM ex, (SELECT unnest(generate_series(1, 4)) AS step) s),
      |tot AS (SELECT step, SUM(CAST(boost AS DECIMAL(28,12))) AS norm
      |        FROM st GROUP BY 1)
      |SELECT st.d AS source, CAST(st.step AS BIGINT) AS step,
      |  CAST(st.n_toks AS BIGINT) AS n_toks, st.excess_nll,
      |  ROUND(st.boost / CAST(tot.norm AS DOUBLE), 6) AS weight
      |FROM st JOIN tot USING (step)
      |ORDER BY source, step""".stripMargin

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

  /** Hybrid mirror: the bm25 CTE chain at k=20 (rank only), the brute
    * cosine chain for query vector 0 at k=20, then the RRF fold — the
    * reciprocals are 9-rounded and added left-to-right (lex + vec)
    * exactly as `KeywordSearch.rrfFuse` folds its legs. */
  private val hybridSql: String =
    s"""WITH lex0 AS (
       |  SELECT doc_id, len(regexp_split_to_array(text, '\\s+')) AS dl,
       |    list_filter(regexp_split_to_array(text, '\\s+'),
       |      t -> t IN ($termList)) AS ts
       |  FROM documents),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM lex0),
       |tf AS (
       |  SELECT doc_id, dl, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(ts) AS term FROM lex0)
       |  GROUP BY 1, 2, 3),
       |idf AS (
       |  SELECT term,
       |    ROUND(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 9) AS idf
       |  FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       |    stats),
       |scored AS (
       |  SELECT t.doc_id,
       |    ROUND(CAST(SUM(CAST(ROUND(
       |      i.idf * (t.tf * ($K1 + 1)) /
       |        (t.tf + $K1 * (1.0 - $B + $B * t.dl / s.avgdl)), 9)
       |      AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
       |  FROM tf t
       |  JOIN idf i USING (term), stats s
       |  GROUP BY t.doc_id),
       |lexrank AS (
       |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk_lex
       |  FROM scored ORDER BY score DESC, doc_id LIMIT $LegK),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
       |  FROM e),
       |qv AS (SELECT v, nrm FROM n WHERE vec_id = $QueryVecId),
       |cos AS (
       |  SELECT a.vec_id,
       |    ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * q.v[i]))
       |      / (a.nrm * q.nrm), 4) AS cos
       |  FROM n a, qv q WHERE a.vec_id <> $QueryVecId),
       |vecrank AS (
       |  SELECT vec_id AS doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rk_vec
       |  FROM cos ORDER BY cos DESC, vec_id LIMIT $LegK),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.rk_lex, v.rk_vec,
       |    ROUND(COALESCE(ROUND(1.0 / ($RrfC + l.rk_lex), 9), 0)
       |      + COALESCE(ROUND(1.0 / ($RrfC + v.rk_vec), 9), 0), 6) AS rrf
       |  FROM lexrank l FULL OUTER JOIN vecrank v USING (doc_id)),
       |top AS (
       |  SELECT doc_id, rrf, rk_lex, rk_vec
       |  FROM fused ORDER BY rrf DESC, doc_id LIMIT $FuseK)
       |SELECT doc_id, rrf,
       |  ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rk, rk_lex, rk_vec
       |FROM top ORDER BY rk""".stripMargin

  /** DSIR mirror: one token table, raw + target counts from the same
    * grouped scan, add-one terms differenced on 9-rounded lns. */
  private val dsirSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source, unnest(regexp_split_to_array(text, '\\s+')) AS word
       |  FROM documents),
       |vocab AS (
       |  SELECT word, COUNT(*) AS cr,
       |    SUM(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END) AS ct
       |  FROM tok GROUP BY 1),
       |tots AS (
       |  SELECT SUM(cr) AS tot_r, SUM(ct) AS tot_t, COUNT(*) AS v
       |  FROM vocab),
       |terms AS (
       |  SELECT word,
       |    CAST(ROUND(ln((ct + 1.0) / (tot_t + v)), 9)
       |      - ROUND(ln((cr + 1.0) / (tot_r + v)), 9)
       |      AS DECIMAL(28,12)) AS term
       |  FROM vocab, tots)
       |SELECT doc_id, COUNT(*) AS n_toks,
       |  -- + 0.0 normalizes -0.0 (mirrors the Spark side's guard)
       |  ROUND(CAST(SUM(term) AS DOUBLE) / COUNT(*), 6) + 0.0 AS dsir_logw
       |FROM tok JOIN terms USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val cmsSql: String =
    s"""WITH t AS (
       |  SELECT text, regexp_split_to_array(text, '\\s+') AS w
       |  FROM documents),
       |sh AS (
       |  SELECT unnest(CASE WHEN len(w) < 3 THEN [text]
       |    ELSE list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
       |      i -> array_to_string(list_transform(range(i, i+3), j -> w[j]), ' '))) END)
       |    AS gram
       |  FROM t),
       |vocab AS (SELECT gram, COUNT(*) AS cnt FROM sh GROUP BY 1),
       |depths AS (SELECT unnest(range(0, $CmsDepth)) AS depth),
       |cells AS (
       |  SELECT d.depth,
       |    CAST('0x' || substr(md5(CAST(d.depth AS VARCHAR) || ':' || v.gram),
       |      1, 15) AS BIGINT) % $CmsWidth AS cell,
       |    v.cnt
       |  FROM vocab v CROSS JOIN depths d),
       |sketch AS (
       |  SELECT depth, cell, CAST(SUM(cnt) AS BIGINT) AS counter
       |  FROM cells GROUP BY 1, 2),
       |top AS (SELECT gram, cnt FROM vocab ORDER BY cnt DESC, gram LIMIT 20),
       |probes AS (
       |  SELECT t.gram, t.cnt, d.depth,
       |    CAST('0x' || substr(md5(CAST(d.depth AS VARCHAR) || ':' || t.gram),
       |      1, 15) AS BIGINT) % $CmsWidth AS cell
       |  FROM top t CROSS JOIN depths d)
       |SELECT p.gram, p.cnt AS exact_n, MIN(s.counter) AS est_n
       |FROM probes p JOIN sketch s USING (depth, cell)
       |GROUP BY p.gram, p.cnt
       |ORDER BY exact_n DESC, gram""".stripMargin

  override def oracle: Map[String, String] = Map(
    // same tokenization as nllSql; dl = array length (empty tokens
    // count, matching Spark's size(split(...))); idf ln rounded to 9 at
    // the source, score = tf·idf/dl with the same left-assoc op order
    "q_text_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (
        |  SELECT doc_id, len(regexp_split_to_array(text, '\s+')) AS dl
        |  FROM documents),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |    ROUND(CAST(t.tf AS DOUBLE)
        |      * ROUND(ln(CAST(n.n_docs + 1 AS DOUBLE) / (d.df + 1)), 9)
        |      / l.dl, 6) AS score
        |  FROM tf t JOIN dfq d USING (term) JOIN dl l USING (doc_id), n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, tf, df, score FROM ranked
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q_corpus_cms_topk" -> cmsSql,
    "q_search_bm25" -> bm25Sql,
    // the persisted-index round trip must reproduce the from-scratch
    // path bit-for-bit (shared bm25Rank), so it shares the mirror
    "q_search_bm25_index" -> bm25Sql,
    "q_search_hybrid_rrf" -> hybridSql,
    "q_corpus_unigram_nll" -> nllSql,
    "q_corpus_bigram_nll" -> bigramSql,
    "q_corpus_vocab_entropy" -> entropySql,
    "q_corpus_domain_reweight" -> domainReweightSql,
    "q_corpus_length_pctl" -> pctlSql,
    "q_corpus_zipf" -> zipfSql,
    "q_corpus_dsir" -> dsirSql,
    "q_corpus_distinct_kmv" -> kmvSql,
    "q_corpus_overlap_matrix" -> overlapMatrixSql,
    "q_corpus_distinct_hll" -> hllSql,
    "q_corpus_hist_pctl" -> histSql)

  /** Rebuilds the KMV sketch in SQL: same per-doc distinct 3-gram
    * shingles as the dedup family, same 60-bit md5-prefix hash, rank
    * the distinct hashes per source, keep rank ≤ k. The estimator
    * constants (255 · 2^60) fold identically as doubles (2^60 and
    * 255·2^60 are both exactly representable). */
  private def kmvSql: String =
    s"""WITH t AS (
       |  SELECT source, text, regexp_split_to_array(text, '\\s+') AS w
       |  FROM documents
       |), sh AS (
       |  SELECT source, unnest(CASE WHEN len(w) < 3 THEN [text]
       |    ELSE list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
       |      i -> array_to_string(list_transform(range(i, i+3), j -> w[j]), ' '))) END)
       |    AS gram
       |  FROM t
       |), h AS (
       |  SELECT DISTINCT source,
       |    CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) AS hv
       |  FROM sh
       |), rk AS (
       |  SELECT source, hv,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn,
       |    COUNT(*) OVER (PARTITION BY source) AS nd
       |  FROM h
       |), agg AS (
       |  SELECT source,
       |    CAST(LEAST(MAX(nd), $KmvK) AS BIGINT) AS sketch_size,
       |    MAX(CASE WHEN rn = $KmvK THEN hv END) AS kth_hash,
       |    CASE WHEN MAX(nd) < $KmvK THEN CAST(LEAST(MAX(nd), $KmvK) AS DOUBLE)
       |      ELSE ROUND(${KmvK - 1}.0 * 1152921504606846976.0 /
       |        CAST(MAX(CASE WHEN rn = $KmvK THEN hv END) AS DOUBLE), 4) END
       |      AS est_distinct,
       |    CAST(MAX(nd) AS BIGINT) AS exact_distinct
       |  FROM rk GROUP BY source)
       |SELECT source, sketch_size, kth_hash, est_distinct, exact_distinct,
       |  ROUND(ABS(est_distinct - exact_distinct)
       |    / CAST(exact_distinct AS DOUBLE), 6) AS rel_err
       |FROM agg ORDER BY source""".stripMargin

  /** Replays the KMV pair estimator exactly: same portable md5 hash
    * stream, per-source k smallest, per-pair union-take-k, n_both over
    * that union, est_union from the kth union hash — then the exact
    * intersection/union legs from the full distinct hash sets. Rounding
    * order matches the Scala site for site (est_union rounded to 4
    * BEFORE the est_inter multiply). */
  private def overlapMatrixSql: String =
    s"""WITH t AS (
       |  SELECT source, text, regexp_split_to_array(text, '\\s+') AS w
       |  FROM documents
       |), sh AS (
       |  SELECT source, unnest(CASE WHEN len(w) < 3 THEN [text]
       |    ELSE list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
       |      i -> array_to_string(list_transform(range(i, i+3), j -> w[j]), ' '))) END)
       |    AS gram
       |  FROM t
       |), h AS (
       |  SELECT DISTINCT source,
       |    CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) AS hv
       |  FROM sh
       |), rk AS (
       |  SELECT source, hv,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
       |  FROM h
       |), sk AS (SELECT source, hv FROM rk WHERE rn <= $KmvK
       |), sz AS (SELECT source, COUNT(*) AS n FROM h GROUP BY source
       |), pr AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    a.n AS n_a, b.n AS n_b
       |  FROM sz a JOIN sz b ON a.source < b.source
       |), pu AS (
       |  SELECT p.source_a, p.source_b, s.hv,
       |    MAX(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
       |    MAX(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
       |  FROM pr p JOIN sk s
       |    ON s.source = p.source_a OR s.source = p.source_b
       |  GROUP BY 1, 2, 3
       |), ru AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source_a, source_b
       |    ORDER BY hv) AS rn
       |  FROM pu
       |), ag AS (
       |  SELECT source_a, source_b,
       |    COUNT(*) AS u_size,
       |    CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
       |    MAX(CASE WHEN rn = $KmvK THEN hv END) AS kth
       |  FROM ru WHERE rn <= $KmvK GROUP BY 1, 2
       |), es AS (
       |  SELECT source_a, source_b, u_size, n_both,
       |    CASE WHEN u_size < $KmvK THEN CAST(u_size AS DOUBLE)
       |      ELSE ROUND(${KmvK - 1}.0 * 1152921504606846976.0
       |        / CAST(kth AS DOUBLE), 4) END AS est_union,
       |    ROUND(n_both / CAST(u_size AS DOUBLE), 4) AS est_jaccard
       |  FROM ag
       |), ex AS (
       |  SELECT x.source AS source_a, y.source AS source_b,
       |    COUNT(*) AS exact_inter
       |  FROM h x JOIN h y ON x.hv = y.hv AND x.source < y.source
       |  GROUP BY 1, 2)
       |SELECT p.source_a, p.source_b, p.n_a, p.n_b,
       |  COALESCE(ex.exact_inter, 0) AS exact_inter,
       |  p.n_a + p.n_b - COALESCE(ex.exact_inter, 0) AS exact_union,
       |  ROUND(COALESCE(ex.exact_inter, 0)
       |    / CAST(p.n_a + p.n_b - COALESCE(ex.exact_inter, 0) AS DOUBLE), 6)
       |    AS exact_jaccard,
       |  es.u_size, es.n_both, es.est_union,
       |  ROUND(es.n_both / CAST(es.u_size AS DOUBLE) * es.est_union, 4)
       |    AS est_inter,
       |  es.est_jaccard
       |FROM pr p
       |LEFT JOIN ex ON ex.source_a = p.source_a AND ex.source_b = p.source_b
       |JOIN es ON es.source_a = p.source_a AND es.source_b = p.source_b
       |ORDER BY p.source_a, p.source_b""".stripMargin

  /** Rebuilds the log-histogram quantile sketch in SQL: the same
    * integer bin key (values clamp at 4; key = 4·(length(bin(v))−1) +
    * v // 2^(e−2) − 4), the same cumulative-count pick at ⌈p·n⌉, the
    * same dyadic midpoint decode — next to the exact quantile_cont
    * audits (≡ Spark `percentile`, both p·(n−1) linear interpolation). */
  private def histSql: String =
    """WITH t AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS v
      |  FROM documents
      |), k AS (
      |  SELECT source,
      |    4 * (length(bin(GREATEST(v, 4))) - 1)
      |      + GREATEST(v, 4)
      |        // (CAST(1 AS BIGINT) << (length(bin(GREATEST(v, 4))) - 3))
      |      - 4 AS key
      |  FROM t
      |), binned AS (
      |  SELECT source, key, COUNT(*) AS cnt FROM k GROUP BY 1, 2
      |), wb AS (
      |  SELECT source, key, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY key)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM binned
      |), sel AS (
      |  SELECT source, MAX(n) AS n_docs,
      |    MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN key END) AS k50,
      |    MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN key END) AS k90,
      |    MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN key END) AS k99
      |  FROM wb GROUP BY source
      |), dec AS (
      |  SELECT source, n_docs,
      |    ROUND(CAST(CAST(1 AS BIGINT) << (CAST(k50 // 4 AS INT) - 2)
      |      AS DOUBLE) * ((k50 % 4) + 4.5), 6) AS p50_est,
      |    ROUND(CAST(CAST(1 AS BIGINT) << (CAST(k90 // 4 AS INT) - 2)
      |      AS DOUBLE) * ((k90 % 4) + 4.5), 6) AS p90_est,
      |    ROUND(CAST(CAST(1 AS BIGINT) << (CAST(k99 // 4 AS INT) - 2)
      |      AS DOUBLE) * ((k99 % 4) + 4.5), 6) AS p99_est
      |  FROM sel
      |), ex AS (
      |  SELECT source,
      |    ROUND(quantile_cont(v, 0.5), 6) AS p50_exact,
      |    ROUND(quantile_cont(v, 0.9), 6) AS p90_exact,
      |    ROUND(quantile_cont(v, 0.99), 6) AS p99_exact
      |  FROM t GROUP BY source)
      |SELECT d.source, d.n_docs, d.p50_est, d.p90_est, d.p99_est,
      |  x.p50_exact, x.p90_exact, x.p99_exact,
      |  ROUND(ABS(d.p50_est - x.p50_exact) / x.p50_exact, 6) AS rel_p50,
      |  ROUND(ABS(d.p90_est - x.p90_exact) / x.p90_exact, 6) AS rel_p90,
      |  ROUND(ABS(d.p99_est - x.p99_exact) / x.p99_exact, 6) AS rel_p99
      |FROM dec d JOIN ex x USING (source) ORDER BY source""".stripMargin

  /** Rebuilds the HLL register file in SQL from the same hash stream as
    * the KMV mirror: register index = hv mod 256, rank = first set bit
    * of the remaining 52 bits via the portable lpad(bin(.)) string form
    * (rank 53 when all-zero), register = MAX rank. The register sum is
    * exact HUGEINT (Spark: DECIMAL(38,0) — it can reach 2^68) and
    * crosses the compare as VARCHAR digits (see distinctHll); the α
    * literal chain and the one double divide are written in the same
    * left-to-right order as the Scala; linear counting fires only at
    * raw ≤ 2.5m with zero registers present (never on this fixture —
    * the spec exercises that branch in-memory). */
  private def hllSql: String =
    s"""WITH t AS (
       |  SELECT source, text, regexp_split_to_array(text, '\\s+') AS w
       |  FROM documents
       |), sh AS (
       |  SELECT source, unnest(CASE WHEN len(w) < 3 THEN [text]
       |    ELSE list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
       |      i -> array_to_string(list_transform(range(i, i+3), j -> w[j]), ' '))) END)
       |    AS gram
       |  FROM t
       |), h AS (
       |  SELECT DISTINCT source,
       |    CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) AS hv
       |  FROM sh
       |), regs AS (
       |  SELECT source, hv % 256 AS idx,
       |    MAX(CASE WHEN instr(lpad(bin(hv // 256), 52, '0'), '1') = 0 THEN 53
       |      ELSE instr(lpad(bin(hv // 256), 52, '0'), '1') END) AS reg
       |  FROM h GROUP BY 1, 2
       |), agg AS (
       |  SELECT source, COUNT(*) AS n_regs,
       |    SUM(CAST(CAST(1 AS BIGINT) << (60 - reg) AS HUGEINT)) AS pow_present
       |  FROM regs GROUP BY 1
       |), ex AS (
       |  SELECT source, COUNT(*) AS exact_distinct FROM h GROUP BY 1
       |), fin AS (
       |  SELECT source, CAST(256 - n_regs AS BIGINT) AS zero_regs,
       |    pow_present + CAST(256 - n_regs AS HUGEINT)
       |      * CAST(1152921504606846976 AS HUGEINT) AS rs
       |  FROM agg
       |), est AS (
       |  SELECT source, zero_regs, rs,
       |    (0.7213 / (1 + 1.079 / 256.0)) * 65536.0 * 1152921504606846976.0
       |      / CAST(rs AS DOUBLE) AS raw
       |  FROM fin
       |), sel AS (
       |  SELECT source, zero_regs, rs,
       |    ROUND(CASE WHEN raw <= 640.0 AND zero_regs > 0
       |      THEN 256.0 * ROUND(ln(256.0 / zero_regs), 9)
       |      ELSE raw END, 4) AS est_distinct
       |  FROM est)
       |SELECT s.source, s.zero_regs, CAST(s.rs AS VARCHAR) AS reg_sum,
       |  x.exact_distinct,
       |  ROUND(ABS(s.est_distinct - x.exact_distinct)
       |    / CAST(x.exact_distinct AS DOUBLE), 6) <= 0.195 AS est_ok
       |FROM sel s JOIN ex x USING (source) ORDER BY source""".stripMargin
}
