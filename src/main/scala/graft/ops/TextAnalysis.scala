package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for a training-data pipeline:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is pure Catalyst expressions (regexp/array functions, no
  * UDFs) so whole-stage codegen applies and the operators scale linearly
  * with the scan — the 100 TB path is "run these in the projection of a
  * parquet scan", nothing more.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Whitespace tokens with empties dropped (a leading/trailing
    * whitespace split yields "" in both engines; neither should count).
    * THE shared tokenization contract of the trained-model operators —
    * TextClassify and Bpe both build on this exact column, and their
    * DuckDB oracles mirror it as
    * `list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')`;
    * a tweak here must land in those mirrors too. */
  private[ops] def tokensNonEmpty(text: Column): Column =
    filter(tokens(text), t => t =!= "")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces + standalone punctuation. */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Digit character count. */
  def digitCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[0-9]", ""))

  private def hitRatio(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(words.map(x => x: Any): _*))).cast("double") /
      greatest(size(toks), lit(1))
  }

  val stopEn: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is", "for", "on", "with")
  val stopEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por")
  val stopFr: Seq[String] = Seq("le", "la", "de", "et", "un", "que", "les", "des", "est", "pour")

  /** Stopword-hit ratio for a language's marker list (n-gram-free lang-ID
    * heuristic; the reference has no lang-ID — this is a pipeline addition). */
  def langScore(text: Column, lang: String): Column = lang match {
    case "en" => hitRatio(text, stopEn)
    case "es" => hitRatio(text, stopEs)
    case "fr" => hitRatio(text, stopFr)
    case other => throw new IllegalArgumentException(s"no marker list for $other")
  }

  /** Argmax of the three lang scores with fixed priority en > es > fr. */
  def langPredict(text: Column): Column = {
    val (en, es, fr) = (langScore(text, "en"), langScore(text, "es"), langScore(text, "fr"))
    when(en >= es && en >= fr, lit("en"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with low
    * punctuation/digit noise and a sane stopword rate. */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val lenScore = least(n / lit(500.0), lit(1.0))
    val punctPenalty = least(punctCount(text).cast("double") / greatest(n, lit(1.0)) * 10.0, lit(1.0))
    val digitPenalty = least(digitCount(text).cast("double") / greatest(n, lit(1.0)) * 10.0, lit(1.0))
    val stop = langScore(text, "en")
    lit(0.4) * lenScore + lit(0.3) * stop + lit(0.15) * (lit(1.0) - punctPenalty) +
      lit(0.15) * (lit(1.0) - digitPenalty)
  }

  /** Exact content fingerprint (G15-style hash, per row). */
  def fingerprint(text: Column): Column = md5(text)

  /** Canonical text normalization — the normalize-before-everything
    * stage of a training pipeline (dedup, tokenization, and fingerprints
    * all assume one canonical byte form): Unicode NFC composition
    * (native codegen'd expression — Spark has no public normalize
    * function), control/format chars → space, whitespace runs collapsed,
    * ends trimmed. Regexes avoid lookaround and use stable general
    * categories, so the DuckDB mirror (`nfc_normalize` + the same
    * RE2 classes) is byte-identical on BMP text. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.GraftFunctions.nfc(text),
        "[\\p{Cc}\\p{Cf}]", " "),
      "\\s+", " "))
}
