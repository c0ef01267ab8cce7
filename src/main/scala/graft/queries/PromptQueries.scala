package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.enrich.Prompts

/** Prompt building as a first-class engine surface (L2/L4): the
  * parity-tested builders run distributed over the documents table, and
  * the DuckDB oracle recomputes every output length structurally — the
  * formatted prompt's length is the template's fixed length plus the
  * lengths of the substituted fields (byte content is pinned separately
  * by PromptParitySpec).
  */
object PromptQueries extends QueryModule {

  private val details = Seq("concise", "standard", "detailed")

  // fixed template length + per-field occurrence counts, probed by
  // running each builder with empty fields and one-char sentinels at
  // module init (a template may use a field 0 or N times — sab99 takes a
  // detail_level argument but never substitutes it)
  private def shape(build: (String, String, String, String) => String) = {
    val base = build("", "", "", "").length
    (base, build("X", "", "", "").length - base,
      build("", "X", "", "").length - base,
      build("", "", "X", "").length - base,
      build("", "", "", "X").length - base)
  }
  private lazy val (catBase, catM, catD, catS, catF) =
    shape((m, d, s, f) => Prompts.catalogMessages(m, d, s, f).head.content)
  private lazy val (sabBase, sabM, sabD, sabS, sabF) =
    shape((m, d, s, f) => Prompts.sab99Messages(m, d, s, f).head.content)
  private lazy val chapUserBase =
    Prompts.chapterAnalysis("", None, isFinalSegment = false)(1).content.length
  private val chapSysLen = Prompts.chapterSystemPrompt.length

  def manifest(spark: SparkSession, dir: String): DataFrame = {
    val catUdf = udf { (text: String, detail: String, source: String, fn: String) =>
      Prompts.catalogMessages(text, detail, source, fn).head.content
    }
    val sabUdf = udf { (text: String, detail: String, source: String, fn: String) =>
      Prompts.sab99Messages(text, detail, source, fn).head.content
    }
    val chapUdf = udf { (text: String) =>
      Prompts.chapterAnalysis(text, None, isFinalSegment = false)(1).content
    }
    val detail = element_at(
      array(details.map(lit): _*), (col("doc_id") % 3 + 1).cast("int"))
    val filename = concat(lit("doc_"), col("doc_id"), lit(".pdf"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .withColumn("detail_level", detail)
      .select(col("doc_id"), col("detail_level"),
        length(catUdf(col("text"), col("detail_level"), col("source"), filename))
          .as("catalog_sys_len"),
        length(sabUdf(col("text"), col("detail_level"), col("source"), filename))
          .as("sab99_sys_len"),
        lit(chapSysLen).as("chapter_sys_len"),
        length(chapUdf(col("text"))).as("chapter_user_len"))
      .orderBy(col("doc_id"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_prompt_manifest" -> manifest)

  override def oracle: Map[String, String] = Map(
    "q_prompt_manifest" -> {
      val detailSql =
        "['concise', 'standard', 'detailed'][CAST(doc_id % 3 AS INTEGER) + 1]"
      def fieldsSql(m: Int, d: Int, s: Int, f: Int) =
        s"$m * length(text) + $d * length($detailSql) + $s * length(source)" +
          s" + $f * length('doc_' || CAST(doc_id AS VARCHAR) || '.pdf')"
      s"""SELECT doc_id, $detailSql AS detail_level,
         |  $catBase + ${fieldsSql(catM, catD, catS, catF)} AS catalog_sys_len,
         |  $sabBase + ${fieldsSql(sabM, sabD, sabS, sabF)} AS sab99_sys_len,
         |  $chapSysLen AS chapter_sys_len,
         |  $chapUserBase + length(text) AS chapter_user_len
         |FROM documents ORDER BY doc_id""".stripMargin
    })
}
