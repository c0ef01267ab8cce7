package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TextAnalysis._

/** Text-analysis battery over the `documents` table: token counting, quality
  * scoring, language ID, fingerprinting — the column-level half of a
  * training-data pipeline (the reference's analogues are the token
  * estimators and content validators, SURVEY §2.6 T1/T2, §2.8).
  *
  * Everything is pure Catalyst expressions in the projection of a parquet
  * scan — no UDFs, no shuffle except the final aggregates — so at 100 TB
  * these run at scan speed with full whole-stage codegen.
  */
object TextQueries extends QueryModule {

  /** Per-document token/char stats + exact fingerprint. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      tokenCountWs(col("text")).as("n_tokens_ws"),
      tokenCountRegex(col("text")).as("n_tokens_re"),
      punctCount(col("text")).as("n_punct"),
      digitCount(col("text")).as("n_digits"),
      length(col("text")).as("n_chars_actual"),
      fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Language-ID heuristic: stopword-marker hit ratios + argmax prediction. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("lang").as("lang_truth"),
      round(langScore(col("text"), "en"), 6).as("score_en"),
      round(langScore(col("text"), "es"), 6).as("score_es"),
      round(langScore(col("text"), "fr"), 6).as("score_fr"),
      langPredict(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** Composite quality score + keep/drop decision at 0.5. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      round(qualityScore(col("text")), 6).as("quality"),
      (round(qualityScore(col("text")), 6) >= 0.5).as("keep"))
      .orderBy(col("doc_id"))

  /** Corpus-level source report: docs, mean length, quality histogram. */
  def sourceReport(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"),
        round(qualityScore(col("text")), 6).as("q"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        // decimal sum → exact, order-independent; the plain avg(double) is
        // summation-order-dependent and can flip the 6th digit between engines
        round(sum(col("q").cast("decimal(28,12)")).cast("double") / count(lit(1)), 6)
          .as("avg_quality"),
        count(when(col("q") >= 0.5, 1)).as("n_keep"))
      .orderBy(col("source"))

  /** Winnowing fingerprints (rolling-hash k-grams, window-min selection) —
    * the near-dup document fingerprint of a training-data pipeline. One
    * codegen'd O(n) pass per row (graft.functions.WinnowFingerprints);
    * the DuckDB oracle recomputes every gram hash, window min, and the
    * collapsed fingerprint list from scratch. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val fps = graft.functions.GraftFunctions.winnow(col("text"), 8, 8)
    Tables.documents(spark, dir)
      .select(col("doc_id"), fps.as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fps"),
        col("fps").getItem(0).as("first_fp"),
        md5(array_join(transform(col("fps"), _.cast("string")), ","))
          .as("checksum"))
      .orderBy(col("doc_id"))
  }

  /** TRAINED language classifier (multinomial Naive Bayes, add-one
    * smoothing) — the learned counterpart of the marker-list heuristic in
    * q_text_langid and the shape of the fastText-style classifier stage
    * real pipelines use for domain/language tagging. Train on 4/5 of the
    * corpus by doc_id, predict the held-out 1/5; output carries ground
    * truth alongside the prediction so the query doubles as an accuracy
    * audit. The DuckDB mirror retrains the full model from scratch. */
  def nbClassify(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.TextClassify.naiveBayes(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "lang", "text")
      .orderBy(col("doc_id"))
  }

  private val BpeMerges = 8

  /** Trained BPE merge table: the 8 highest-frequency character-pair
    * merges learned from the corpus vocabulary (rank, symbols, winning
    * pair count). The DuckDB mirror replays all 8 training rounds as
    * unrolled CTEs over the same framed-string segmentation. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.mergeTable(
      Tables.documents(spark, dir), "text", BpeMerges)
      .orderBy(col("merge_rank"))

  /** Per-document REAL token counts under the trained BPE vocabulary —
    * tokenize-by-lookup against the final segmentation, the number the
    * token-budget operators estimate. */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.Bpe.tokenCounts(docs, docs, "doc_id", "text", BpeMerges)
      .orderBy(col("doc_id"))
  }

  private val UgVocab = 20
  private val UgIters = 2

  /** Trained unigram-LM (SentencePiece-style) vocabulary after 2 EM
    * rounds: (piece, n_count, logp_nano) — the probabilistic tokenizer
    * next to q_text_bpe_merges' merge table. Everything crosses the
    * engines as exact integers (nano-grid log-probs); the mirror
    * unrolls seed + both EM rounds, each with a full per-position
    * Viterbi DP, as CTEs. */
  def unigramVocab(spark: SparkSession, dir: String): DataFrame =
    graft.ops.UnigramLm.vocabTable(
      Tables.documents(spark, dir), "text", vocabSize = UgVocab,
      emIters = UgIters)
      .orderBy(col("piece"))

  /** Per-document Viterbi tokenization under the trained unigram table:
    * (doc_id, n_words, n_pieces, nll_nano) — piece counts and the
    * exact-integer negative log-likelihood, the numbers a tokenizer
    * bake-off (BPE vs unigram) actually compares. */
  def unigramTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.ops.UnigramLm.tokenCounts(docs, docs, "doc_id", "text",
      vocabSize = UgVocab, emIters = UgIters)
      .orderBy(col("doc_id"))
  }

  /** Robust per-source score normalization (median/MAD z-scores,
    * winsorized at ±3): the feature-scaling step between raw quality
    * scores and any cross-source comparison (curriculum phases, mixture
    * weights, filter thresholds) — mean/stddev normalization is exactly
    * what a heavy-tailed quality distribution breaks, so the location
    * is the median and the scale is 1.4826·MAD (the normal-consistent
    * estimator), with a NULL z for a degenerate (MAD = 0) source
    * instead of a division blow-up.
    *
    * Scale shape: two bounded per-source aggregates (median, then MAD
    * over the broadcast-joined deviations) + a broadcast of the
    * source-level stats back under the scan — no window, no per-doc
    * shuffle beyond the two group-bys. At 100 TB the exact percentile
    * swaps to approx_percentile / the log-histogram sketch (the
    * q_corpus_length_pctl convention); the exact form is the oracle
    * surface.
    *
    * Determinism (the round-11 sf0.1 gate caught the naive form): the
    * engines' percentile interpolations agree only MATHEMATICALLY —
    * a + (b−a)·f vs (1−f)·a + f·b differ in the last ulp over
    * arbitrary doubles, and ROUND(·, 6) amplifies an ulp at a .5e−6
    * boundary into a hash mismatch (one row in 5000 at sf0.1). So the
    * median/MAD run on a 1e6-SCALED INTEGER grid: quality micro-units
    * are exact longs, the p = 0.5 interpolation fraction is only ever
    * 0 or ½, and every candidate formula is EXACT over dyadic inputs —
    * med_micro/mad_micro are bit-identical doubles by construction,
    * and z is one subtract, one multiply, one divide, one 6-round from
    * them (the α literal crosses as 1.4826e0 so DuckDB parses a
    * DOUBLE, not a DECIMAL). */
  def qualityRobust(spark: SparkSession, dir: String): DataFrame =
    qualityRobustOver(Tables.documents(spark, dir))

  /** [[qualityRobust]] over any (doc_id, source, text) frame — the scale
    * ladder's seam, so its rung times the registered operator itself. */
  private[graft] def qualityRobustOver(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(col("doc_id"), col("source"),
        round(qualityScore(col("text")), 6).as("quality"))
      .withColumn("qi", round(col("quality") * 1e6, 0).cast("long"))
    val med = docs.groupBy(col("source"))
      .agg(percentile(col("qi"), lit(0.5)).as("med_micro"))
    val withMed = docs.join(broadcast(med), "source")
    val mad = withMed
      .select(col("source"), abs(col("qi") - col("med_micro")).as("dev"))
      .groupBy(col("source"))
      .agg(percentile(col("dev"), lit(0.5)).as("mad_micro"))
    val z = round((col("qi") - col("med_micro")) /
      (lit(1.4826) * col("mad_micro")), 6)
    withMed.join(broadcast(mad), "source")
      .withColumn("z", when(col("mad_micro") > 0, z))
      .withColumn("z_wins", when(col("mad_micro") > 0,
        greatest(lit(-3.0), least(lit(3.0), col("z")))))
      .select(col("doc_id"), col("source"), col("quality"),
        col("med_micro"), col("mad_micro"), col("z"), col("z_wins"))
      .orderBy(col("doc_id"))
  }

  /** The deterministic non-ASCII tail the normalization query appends
    * (the fixture text is ASCII, which NFC fixes by definition):
    * space, e + COMBINING ACUTE (composes to é, −1 char), TAB (a Cc —
    * stripped to space), then a 3-space run (collapsed). Mirrored in
    * the oracle as chr() concatenation. */
  private val NormTail = " e\u0301\tx   y"

  /** Canonical normalization over documents: NFC (native expression) +
    * control strip + whitespace collapse + trim, one codegen'd
    * projection — no shuffle, scan speed. */
  def normalize(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(col("text"), lit(NormTail))
    Tables.documents(spark, dir).select(col("doc_id"),
      length(raw).cast("long").as("n_raw"),
      length(graft.functions.GraftFunctions.nfc(raw)).cast("long")
        .as("n_nfc"),
      normalizeText(raw).as("norm_text"))
      .withColumn("n_norm", length(col("norm_text")).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** W12 deep-breadcrumb gate (r12 VERDICT #3): the documents fixture's
    * period-3 heading cycle exercises the hierarchy fold only at trivial
    * depth, so the running-stack truncation law (a shallower heading
    * truncates the stack; levels may skip; " > " join) was guarded by
    * parity alone. This query synthesizes a deterministic heading stream
    * FROM the documents table — per doc_id < 4096: group = doc_id % 8,
    * level = 1 + (md5-60bit("bc:" || doc_id) mod 5), the portable hash
    * convention both engines replay; the resulting 1..5 walk reaches
    * full 5-deep stacks, multi-entry truncations, and level skips in
    * both directions (DeepBreadcrumbSpec pins each structural property;
    * a plain arithmetic walk was tried first and capped at depth 3 —
    * an AP mod 5 is too ordered) — and runs the
    * REAL operator (`Sections.hierarchyString`, the same fold
    * DocPipeline applies per chapter) over each group's ordered stream.
    * The DuckDB mirror rebuilds every breadcrumb RELATIONALLY (latest
    * prior heading per shallower level, invalidated by any strictly
    * shallower heading in between — a self-join + NOT EXISTS, not a
    * restatement of the fold), so agreement is a genuine cross-engine
    * check of multi-level stack semantics.
    *
    * Scale shape: parallel across groups, sequential within one (the
    * DocPipeline chapter contract); the doc_id cap bounds the synthesized
    * stream — and the mirror's quadratic self-join — identically at
    * every SF. */
  def deepBreadcrumbs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.text.Sections
    val heads = Tables.documents(spark, dir)
      .filter(col("doc_id") < 4096)
      .select(
        (col("doc_id") % 8).as("grp"),
        col("doc_id").as("seq"),
        (lit(1) + conv(substring(md5(
          concat_ws(":", lit("bc"), col("doc_id")).cast("binary")), 1, 15),
          16, 10).cast("long") % 5).cast("int").as("level"))
      .withColumn("title", concat(lit("H"), col("level").cast("string"),
        lit("."), col("seq").cast("string")))
      .as[(Long, Long, Int, String)]
    heads.groupByKey(_._1)
      .flatMapGroups { (g: Long, it: Iterator[(Long, Long, Int, String)]) =>
        val rows = it.toIndexedSeq.sortBy(_._2)
        val secs = rows.map(r => Sections.Section(
          title = r._4, level = r._3, content = "", tokenCount = 0,
          parentTitle = "", startPage = None, endPage = None, pageCount = 0))
        rows.indices.map { i =>
          (g, rows(i)._2, rows(i)._3.toLong, rows(i)._4,
            Sections.hierarchyString(secs, i))
        }
      }
      .toDF("grp", "seq", "level", "title", "breadcrumb")
      .orderBy(col("grp"), col("seq"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sections_deep_breadcrumbs" -> deepBreadcrumbs,
    "q_text_normalize" -> normalize,
    "q_text_stats" -> textStats,
    "q_text_langid" -> langId,
    "q_text_quality" -> quality,
    "q_text_quality_robust" -> qualityRobust,
    "q_text_fingerprint" -> fingerprints,
    "q_text_nb_classify" -> nbClassify,
    "q_text_bpe_merges" -> bpeMerges,
    "q_text_bpe_tokens" -> bpeTokens,
    "q_text_unigram_vocab" -> unigramVocab,
    "q_text_unigram_tokens" -> unigramTokens,
    "q_text_source_report" -> sourceReport)

  // DuckDB mirrors. Shared fragments keep Spark and SQL in lockstep; every
  // double computation is written in the same operation order on both sides
  // and rounded to 6 digits before comparison.
  private val enList = stopEn.map(s => s"'$s'").mkString(", ")
  private val esList = stopEs.map(s => s"'$s'").mkString(", ")
  private val frList = stopFr.map(s => s"'$s'").mkString(", ")

  private def scoreSql(list: String): String =
    s"""CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x IN ($list))) AS DOUBLE)
       | / GREATEST(len(regexp_split_to_array(text, '\\s+')), 1)""".stripMargin.replace("\n", "")

  private[queries] val qualitySql: String = {
    val n = "CAST(length(text) AS DOUBLE)"
    val punct = "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)"
    val digit = "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)"
    s"""0.4 * LEAST($n / 500.0, 1.0)
       | + 0.3 * (${scoreSql(enList)})
       | + 0.15 * (1.0 - LEAST($punct / GREATEST($n, 1.0) * 10.0, 1.0))
       | + 0.15 * (1.0 - LEAST($digit / GREATEST($n, 1.0) * 10.0, 1.0))""".stripMargin.replace("\n", "")
  }

  /** Unrolled BPE training rounds: seg0 is the framed character
    * segmentation (chr(1) sym chr(2) per symbol — same frames as
    * ops.Bpe); round r counts adjacent pairs weighted by word count,
    * b$r picks the winner (count DESC, then lexicographic), seg${r+1}
    * applies it via the same literal replace. Integer math only. */
  private def bpeCte(k: Int): String = {
    val base =
      """WITH tok AS (
        |  SELECT doc_id, t FROM documents,
        |    UNNEST(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS u(t)
        |), words AS (
        |  SELECT t AS w, COUNT(*) AS cnt FROM tok GROUP BY t
        |), seg0 AS (
        |  SELECT w, cnt,
        |    regexp_replace(w, '(.)', chr(1) || '\1' || chr(2), 'g') AS seg
        |  FROM words
        |)""".stripMargin
    val rounds = (0 until k).map { r =>
      s""", p$r AS (
         |  SELECT x.a, x.b, CAST(SUM(x.cnt) AS BIGINT) AS s FROM (
         |    SELECT q.cnt, q.syms[CAST(u.i AS INT)] AS a,
         |      q.syms[CAST(u.i AS INT) + 1] AS b
         |    FROM (SELECT cnt, string_split(substr(seg, 2, length(seg) - 2),
         |        chr(2) || chr(1)) AS syms FROM seg$r) q,
         |      UNNEST(range(1, len(q.syms))) AS u(i)
         |  ) x GROUP BY x.a, x.b
         |), b$r AS (
         |  SELECT a, b, s FROM p$r ORDER BY s DESC, a, b LIMIT 1
         |), seg${r + 1} AS (
         |  SELECT s.w, s.cnt,
         |    COALESCE(replace(s.seg,
         |      chr(1) || b.a || chr(2) || chr(1) || b.b || chr(2),
         |      chr(1) || b.a || b.b || chr(2)), s.seg) AS seg
         |  FROM seg$r s LEFT JOIN b$r b ON TRUE
         |)""".stripMargin
    }.mkString
    base + rounds
  }

  // --- unigram-LM mirrors: seed + unrolled EM rounds, each with a full
  // per-position Viterbi DP. All scores are BIGINT nano-grid log-probs,
  // so the DP is exact integer arithmetic; MATERIALIZED everywhere a
  // CTE is referenced by multiple later legs (each position's winner
  // feeds up to 4 later candidate legs — default inlining would copy
  // the chain 4^12 times, the kcore lesson at a higher branching
  // factor). The DP unrolls to UgMaxWord positions; a corpus with a
  // longer word poisons the output loudly instead of truncating. ---

  private val UgMaxLen = 4
  private val UgMaxWord = 12

  private val ugBase: String =
    """WITH tok AS (
      |  SELECT doc_id, t FROM documents,
      |    UNNEST(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS u(t)
      |), words AS MATERIALIZED (
      |  SELECT t AS w, COUNT(*) AS cnt FROM tok GROUP BY t
      |)""".stripMargin

  /** Seed vocabulary: all substrings to UgMaxLen freq-weighted; every
    * single char + the top UgVocab multi-char pieces (freq DESC, piece
    * ASC); nano-grid log-probs over the kept total. */
  private def ugSeedCtes: String =
    s""", cand AS MATERIALIZED (
       |  SELECT substr(w.w, CAST(s.i AS INT), CAST(l.l AS INT)) AS piece,
       |    CAST(SUM(w.cnt) AS BIGINT) AS freq
       |  FROM words w,
       |    UNNEST(range(1, length(w.w) + 1)) AS s(i),
       |    UNNEST(range(1, ${UgMaxLen + 1})) AS l(l)
       |  WHERE CAST(s.i AS INT) + CAST(l.l AS INT) - 1 <= length(w.w)
       |  GROUP BY 1
       |), seedm AS (
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq,
       |      ROW_NUMBER() OVER (ORDER BY freq DESC, piece) AS rn
       |    FROM cand WHERE length(piece) > 1) WHERE rn <= $UgVocab
       |), seed AS MATERIALIZED (
       |  SELECT piece, freq FROM cand WHERE length(piece) = 1
       |  UNION ALL SELECT piece, freq FROM seedm
       |), v0 AS MATERIALIZED (
       |  SELECT piece, freq AS n_count,
       |    CAST(ROUND(LN(CAST(freq AS DOUBLE) / tt.t) * 1e9, 0) AS BIGINT)
       |      AS logp_nano
       |  FROM seed, (SELECT CAST(SUM(freq) AS DOUBLE) AS t FROM seed) tt
       |)""".stripMargin

  /** One Viterbi pass of every distinct word under vocab CTE `vname`:
    * position i's winner = best (score DESC, piece-length DESC) over
    * the ≤UgMaxLen pieces ending at i — exactly UnigramLm.viterbi's
    * tie law. Exposes `${p}fin` (w, cnt, score, seg) with seg the
    * chr(1)-joined piece sequence. */
  private def ugVitCtes(vname: String, p: String): String = {
    val d0 =
      s""", ${p}d0 AS (
         |  SELECT w, cnt, CAST(0 AS BIGINT) AS score, '' AS seg FROM words)""".stripMargin
    val steps = (1 to UgMaxWord).map { i =>
      val legs = (1 to math.min(UgMaxLen, i)).map { l =>
        s"""    SELECT d.w, d.cnt, d.score + v.logp_nano AS score, $l AS l,
           |      d.seg || chr(1) || v.piece AS seg
           |    FROM ${p}d${i - l} d JOIN $vname v
           |      ON v.piece = substr(d.w, ${i - l + 1}, $l)
           |    WHERE length(d.w) >= $i""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s""", ${p}c$i AS (
         |$legs
         |), ${p}d$i AS MATERIALIZED (
         |  SELECT w, cnt, score, seg FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY w
         |      ORDER BY score DESC, l DESC) AS rn
         |    FROM ${p}c$i) WHERE rn = 1
         |)""".stripMargin
    }.mkString
    val fin = (1 to UgMaxWord).map(i =>
      s"SELECT w, cnt, score, seg FROM ${p}d$i WHERE length(w) = $i")
      .mkString("\n  UNION ALL ")
    d0 + steps +
      s""", ${p}fin AS MATERIALIZED (
         |  $fin
         |)""".stripMargin
  }

  /** M-step: freq-weighted piece counts of `${p}fin`'s segmentations,
    * +1 Laplace on single chars, zero-count pieces pruned, nano-grid
    * log-probs re-derived → `$outV`. */
  private def ugMStep(p: String, prevV: String, outV: String): String =
    s""", ${p}mc AS MATERIALIZED (
       |  SELECT u.piece, CAST(SUM(f.cnt) AS BIGINT) AS c
       |  FROM ${p}fin f,
       |    UNNEST(string_split(substr(f.seg, 2), chr(1))) AS u(piece)
       |  GROUP BY u.piece
       |), ${p}kk AS MATERIALIZED (
       |  SELECT piece, c2 FROM (
       |    SELECT pv.piece,
       |      COALESCE(mc.c, 0)
       |        + (CASE WHEN length(pv.piece) = 1 THEN 1 ELSE 0 END) AS c2
       |    FROM $prevV pv LEFT JOIN ${p}mc mc ON mc.piece = pv.piece)
       |  WHERE c2 > 0
       |), $outV AS MATERIALIZED (
       |  SELECT piece, c2 AS n_count,
       |    CAST(ROUND(LN(CAST(c2 AS DOUBLE) / tt.t) * 1e9, 0) AS BIGINT)
       |      AS logp_nano
       |  FROM ${p}kk, (SELECT CAST(SUM(c2) AS DOUBLE) AS t FROM ${p}kk) tt
       |)""".stripMargin

  private def ugTrainedCtes: String =
    ugBase + ugSeedCtes +
      ugVitCtes("v0", "a") + ugMStep("a", "v0", "v1") +
      ugVitCtes("v1", "b") + ugMStep("b", "v1", "v2")

  private val ugLongWordPoison =
    s"EXISTS (SELECT 1 FROM words WHERE length(w) > $UgMaxWord)"

  private def ugVocabSql: String =
    ugTrainedCtes +
      s"""
         |SELECT piece, n_count, logp_nano FROM v2
         |UNION ALL
         |SELECT 'POISON_WORD_OVER_${UgMaxWord}', CAST(-1 AS BIGINT),
         |  CAST(-1 AS BIGINT)
         |WHERE $ugLongWordPoison
         |ORDER BY piece""".stripMargin

  private def ugTokensSql: String =
    ugTrainedCtes + ugVitCtes("v2", "c") +
      s"""
         |SELECT * FROM (
         |  SELECT t.doc_id, COUNT(*) AS n_words,
         |    CAST(SUM(len(string_split(substr(f.seg, 2), chr(1)))) AS BIGINT)
         |      AS n_pieces,
         |    CAST(SUM(-f.score) AS BIGINT) AS nll_nano
         |  FROM tok t JOIN cfin f ON f.w = t.t
         |  GROUP BY t.doc_id
         |  UNION ALL
         |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
         |    CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
         |  WHERE EXISTS (SELECT 1 FROM tok t LEFT JOIN cfin f ON f.w = t.t
         |                WHERE f.w IS NULL)
         |     OR $ugLongWordPoison)
         |ORDER BY doc_id""".stripMargin

  /** Mirror of q_text_normalize: the tail rebuilt with chr()
    * (chr(769) = COMBINING ACUTE, chr(9) = TAB), nfc_normalize for the
    * native expression, the same RE2-safe category classes, 'g' flags
    * for Spark's replace-all default. */
  private val normalizeSql: String = {
    val raw = "text || ' e' || chr(769) || chr(9) || 'x   y'"
    val norm = s"trim(regexp_replace(regexp_replace(nfc_normalize($raw), " +
      s"'[\\p{Cc}\\p{Cf}]', ' ', 'g'), '\\s+', ' ', 'g'))"
    s"""SELECT doc_id,
       |  length($raw) AS n_raw,
       |  length(nfc_normalize($raw)) AS n_nfc,
       |  $norm AS norm_text,
       |  length($norm) AS n_norm
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  override def oracle: Map[String, String] = Map(
    // relational rebuild of the stack fold: the ancestor at each
    // shallower level is the LATEST prior heading of that level with no
    // strictly shallower heading in between (that is exactly the
    // truncation law); string_agg in level order + the section's own
    // title mirrors the " > " join
    "q_sections_deep_breadcrumbs" ->
      """WITH lv AS (
        |  SELECT doc_id,
        |    1 + CAST('0x' || substr(md5('bc:' || CAST(doc_id AS VARCHAR)),
        |      1, 15) AS BIGINT) % 5 AS level
        |  FROM documents WHERE doc_id < 4096),
        |h AS (
        |  SELECT doc_id % 8 AS grp, doc_id AS seq, level,
        |    'H' || CAST(level AS VARCHAR) || '.' || CAST(doc_id AS VARCHAR)
        |      AS title
        |  FROM lv),
        |anc AS (
        |  SELECT c.grp, c.seq, p.level AS plevel, p.title AS ptitle,
        |    ROW_NUMBER() OVER (PARTITION BY c.grp, c.seq, p.level
        |      ORDER BY p.seq DESC) AS rn
        |  FROM h c JOIN h p
        |    ON p.grp = c.grp AND p.seq < c.seq AND p.level < c.level
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM h k WHERE k.grp = c.grp AND k.seq > p.seq
        |      AND k.seq < c.seq AND k.level < p.level)),
        |crumbs AS (
        |  SELECT grp, seq, string_agg(ptitle, ' > ' ORDER BY plevel) AS prefix
        |  FROM anc WHERE rn = 1 GROUP BY grp, seq)
        |SELECT h.grp, h.seq, CAST(h.level AS BIGINT) AS level, h.title,
        |  CASE WHEN c.prefix IS NULL THEN h.title
        |       ELSE c.prefix || ' > ' || h.title END AS breadcrumb
        |FROM h LEFT JOIN crumbs c ON c.grp = h.grp AND c.seq = h.seq
        |ORDER BY h.grp, h.seq""".stripMargin,
    "q_text_normalize" -> normalizeSql,
    "q_text_stats" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(text, '\s+')) AS n_tokens_ws,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens_re,
        |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
        |  length(text) AS n_chars_actual,
        |  md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      s"""SELECT doc_id, lang AS lang_truth,
         |  ROUND(${scoreSql(enList)}, 6) AS score_en,
         |  ROUND(${scoreSql(esList)}, 6) AS score_es,
         |  ROUND(${scoreSql(frList)}, 6) AS score_fr,
         |  CASE WHEN (${scoreSql(enList)}) >= (${scoreSql(esList)})
         |        AND (${scoreSql(enList)}) >= (${scoreSql(frList)}) THEN 'en'
         |       WHEN (${scoreSql(esList)}) >= (${scoreSql(frList)}) THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""SELECT doc_id,
         |  ROUND($qualitySql, 6) AS quality,
         |  ROUND($qualitySql, 6) >= 0.5 AS keep
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality_robust" ->
      s"""WITH q AS (
         |  SELECT doc_id, source, ROUND($qualitySql, 6) AS quality,
         |    CAST(ROUND(ROUND($qualitySql, 6) * 1e6, 0) AS BIGINT) AS qi
         |  FROM documents),
         |m AS (
         |  SELECT source, quantile_cont(qi, 0.5) AS med_micro
         |  FROM q GROUP BY 1),
         |d AS (
         |  SELECT q.doc_id, q.source, q.quality, q.qi, m.med_micro,
         |    ABS(q.qi - m.med_micro) AS dev
         |  FROM q JOIN m USING (source)),
         |md AS (
         |  SELECT source, quantile_cont(dev, 0.5) AS mad_micro
         |  FROM d GROUP BY 1)
         |SELECT d.doc_id, d.source, d.quality, d.med_micro, md.mad_micro,
         |  CASE WHEN md.mad_micro > 0 THEN
         |    ROUND((d.qi - d.med_micro) / (1.4826e0 * md.mad_micro), 6)
         |    END AS z,
         |  CASE WHEN md.mad_micro > 0 THEN
         |    GREATEST(-3.0e0, LEAST(3.0e0,
         |      ROUND((d.qi - d.med_micro) / (1.4826e0 * md.mad_micro), 6)))
         |    END AS z_wins
         |FROM d JOIN md USING (source) ORDER BY doc_id""".stripMargin,
    // Rebuilds the winnowing fingerprints from scratch: per-position Horner
    // gram hashes (≡ the Spark side's rolling recurrence mod 1e9+7),
    // window minima via list_slice, consecutive dupes collapsed.
    "q_text_fingerprint" ->
      """WITH g AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(text) < 8 THEN
        |      [list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(range(1, length(text)+1), j -> CAST(unicode(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
        |         (a,b) -> (a*131+b) % 1000000007)]
        |    ELSE
        |      list_transform(range(1, length(text)-8+2), i ->
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(range(CAST(i AS INT), CAST(i AS INT)+8), j -> CAST(unicode(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
        |          (a,b) -> (a*131+b) % 1000000007))
        |    END AS hs
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) <= 8 THEN [list_min(hs)]
        |    ELSE list_transform(range(1, len(hs)-8+2), p -> list_min(list_slice(hs, CAST(p AS INT), CAST(p AS INT)+8-1)))
        |    END AS mins
        |  FROM g),
        |f AS (
        |  SELECT doc_id,
        |    list_transform(list_filter(range(1, len(mins)+1), p -> p = 1 OR mins[CAST(p AS INT)] != mins[CAST(p AS INT)-1]), p -> mins[CAST(p AS INT)]) AS fps
        |  FROM m)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps, fps[1] AS first_fp,
        |  md5(array_to_string(fps, ',')) AS checksum
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_text_bpe_merges" -> (bpeCte(BpeMerges) + "\n" +
      (0 until BpeMerges).map(r =>
        s"SELECT $r AS merge_rank, a AS sym_a, b AS sym_b, s AS pair_count FROM b$r")
        .mkString("\nUNION ALL\n") +
      "\nORDER BY merge_rank"),
    // The registered query trains and scores the SAME documents, so
    // every scored word is in-vocabulary and the lookup join is total.
    // The Spark side's OOV path (merge replay on the char segmentation)
    // is therefore unreachable here — rather than mirror it, the `oov`
    // sentinel unions a poison row (doc_id -1) if any scored word ever
    // misses the vocabulary, so a future query change that opens the
    // OOV path fails the gate loudly instead of silently diverging.
    "q_text_bpe_tokens" -> (bpeCte(BpeMerges) +
      s""", vocab AS (
         |  SELECT w, len(string_split(substr(seg, 2, length(seg) - 2),
         |    chr(2) || chr(1))) AS n_syms
         |  FROM seg$BpeMerges
         |)
         |SELECT doc_id, n_bpe_tokens, n_words FROM (
         |  SELECT t.doc_id,
         |    CAST(SUM(v.n_syms) AS BIGINT) AS n_bpe_tokens,
         |    COUNT(*) AS n_words
         |  FROM tok t LEFT JOIN vocab v ON t.t = v.w
         |  GROUP BY t.doc_id
         |  UNION ALL
         |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
         |  WHERE EXISTS (SELECT 1 FROM tok t LEFT JOIN vocab v
         |                ON t.t = v.w WHERE v.w IS NULL))
         |ORDER BY doc_id""".stripMargin),
    // Full from-scratch NB retrain: same tokenization, same 9-rounded
    // log terms cast to DECIMAL(28,12), same exact decimal score
    // arithmetic, same max-score/min-label argmax (via window order).
    "q_text_nb_classify" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, t
        |  FROM documents,
        |    UNNEST(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS u(t)
        |), cnt AS (
        |  SELECT lang AS c, t, COUNT(*) AS n
        |  FROM tok WHERE doc_id % 5 <> 0 GROUP BY lang, t
        |), vsz AS (
        |  SELECT COUNT(DISTINCT t) AS v FROM cnt
        |), tot AS (
        |  SELECT c, SUM(n) AS tot FROM cnt GROUP BY c
        |), traindocs AS (
        |  SELECT lang AS c, COUNT(*) AS nd FROM documents WHERE doc_id % 5 <> 0 GROUP BY lang
        |), ntrain AS (
        |  SELECT COUNT(*) AS n FROM documents WHERE doc_id % 5 <> 0
        |), classes AS (
        |  SELECT d.c,
        |    CAST(ROUND(ln(CAST(d.nd AS DOUBLE) / CAST(nt.n AS DOUBLE)), 9) AS DECIMAL(28,12)) AS prior,
        |    CAST(ROUND(ln(1.0 / CAST(COALESCE(tt.tot, 0) + vsz.v AS DOUBLE)), 9) AS DECIMAL(28,12)) AS r0,
        |    COALESCE(tt.tot, 0) + vsz.v AS denom
        |  FROM traindocs d CROSS JOIN ntrain nt CROSS JOIN vsz
        |  LEFT JOIN tot tt ON d.c = tt.c
        |), terms AS (
        |  SELECT cnt.c, cnt.t,
        |    CAST(CAST(ROUND(ln((cnt.n + 1.0) / CAST(cl.denom AS DOUBLE)), 9) AS DECIMAL(28,12))
        |       - CAST(ROUND(ln(1.0 / CAST(cl.denom AS DOUBLE)), 9) AS DECIMAL(28,12))
        |       AS DECIMAL(28,12)) AS dterm
        |  FROM cnt JOIN classes cl ON cnt.c = cl.c
        |), testtok AS (
        |  SELECT doc_id, t, COUNT(*) AS m
        |  FROM tok WHERE doc_id % 5 = 0 GROUP BY doc_id, t
        |), inv AS (
        |  SELECT tt.doc_id, tt.t, tt.m
        |  FROM testtok tt JOIN (SELECT DISTINCT t FROM cnt) vocab USING (t)
        |), ld AS (
        |  SELECT doc_id, CAST(SUM(m) AS BIGINT) AS l FROM inv GROUP BY doc_id
        |), seen AS (
        |  SELECT i.doc_id, te.c,
        |    SUM(CAST(CAST(i.m AS DECIMAL(9,0)) * te.dterm AS DECIMAL(28,12))) AS s1
        |  FROM inv i JOIN terms te ON i.t = te.t GROUP BY i.doc_id, te.c
        |), scored AS (
        |  SELECT d.doc_id, d.lang AS lt, c.c,
        |    COALESCE(ld.l, 0) AS l,
        |    CAST(c.prior + CAST(CAST(COALESCE(ld.l, 0) AS DECIMAL(9,0)) * c.r0 AS DECIMAL(28,12))
        |       + CAST(COALESCE(s.s1, 0) AS DECIMAL(28,12)) AS DECIMAL(28,12)) AS score
        |  FROM documents d CROSS JOIN classes c
        |  LEFT JOIN ld ON d.doc_id = ld.doc_id
        |  LEFT JOIN seen s ON d.doc_id = s.doc_id AND c.c = s.c
        |  WHERE d.doc_id % 5 = 0
        |)
        |SELECT doc_id, lt AS lang_true, c AS lang_pred,
        |  ROUND(CAST(score AS DOUBLE), 6) AS score, l AS n_vocab_tokens
        |FROM scored
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, c ASC) = 1
        |ORDER BY doc_id""".stripMargin,
    "q_text_unigram_vocab" -> ugVocabSql,
    "q_text_unigram_tokens" -> ugTokensSql,
    "q_text_source_report" ->
      s"""WITH scored AS (
         |  SELECT source, n_chars, ROUND($qualitySql, 6) AS q FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  ROUND(CAST(SUM(CAST(q AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
         |    AS avg_quality,
         |  COUNT(CASE WHEN q >= 0.5 THEN 1 END) AS n_keep
         |FROM scored GROUP BY source ORDER BY source""".stripMargin)
}
