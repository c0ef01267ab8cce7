package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stage-5/6 export surface (SURVEY S8–S10, V6): the 28-column
  * `iris_semantic_search` projection, pgvector text serialization, and the
  * overwrite-by-key master merge.
  *
  * Scale posture: the master merge is an anti-join + union — at 100 TB the
  * master lives as partitioned parquet and the merge becomes a partition
  * overwrite (`replaceWhere`-style) on `document_id`; the operator's
  * contract is unchanged. The JDBC path (S9) mirrors the reference's
  * staged-COPY: write to a staging table with `embedding TEXT`, then one
  * `INSERT ... SELECT ... embedding::vector(N)` statement server-side.
  */
object DbExport {

  /** Fixed output column order (stage_05_csv_export.py:102-131). */
  val databaseColumns: Seq[String] = Seq(
    "id", "document_id", "filename", "filepath", "source_filename",
    "chapter_number", "chapter_name", "chapter_summary", "chapter_page_count",
    "section_number", "section_summary", "section_start_page",
    "section_end_page", "section_page_count", "section_start_reference",
    "section_end_reference", "chunk_number", "chunk_content",
    "chunk_start_page", "chunk_end_page", "chunk_start_reference",
    "chunk_end_reference", "embedding", "extra1", "extra2", "extra3",
    "created_at", "last_modified")

  /** Auto-generated / intentionally-empty columns at export time. */
  val emptyColumns: Seq[String] =
    Seq("id", "extra1", "extra2", "extra3", "created_at", "last_modified")

  /** pgvector text literal `[x,y,...]`; empty string for null
    * (stage_05_csv_export.py:444-454 — this is NOT json). Deliberate
    * divergence from the reference's `str(float(x))`: the reference
    * holds python doubles, this engine stores float32 arrays — and the
    * component rendering here is ENGINE-PORTABLE fixed-point at scale
    * 15: u = round(x·10¹⁵) computed in double (IEEE multiply is
    * correctly rounded, so any engine lands on the identical integer;
    * half-away-from-zero ties agree between BigDecimal HALF_UP and
    * C-family round()), then the digits are assembled with pure
    * integer/string ops. 15 fractional digits round-trip every float32
    * component this pipeline can produce (|x| ≥ 2⁻²⁶ after unit
    * normalization), and the DuckDB oracle rebuilds the literal
    * byte-for-byte — which a shortest-repr float→string cast cannot
    * (Java and other engines disagree on exponent forms and digits). */
  def embeddingLiteral(embedding: Column): Column =
    when(embedding.isNull || size(embedding) === 0, lit(""))
      .otherwise(concat(lit("["),
        array_join(transform(embedding, componentLiteral(_)), ","),
        lit("]")))

  /** One component at fixed scale 15 via exact integer assembly. */
  private def componentLiteral(x: Column): Column = {
    val u = round(x.cast("double") * lit(1.0e15)).cast("long")
    val pad = lpad(abs(u).cast("string"), 16, "0")
    concat(when(u < 0, lit("-")).otherwise(lit("")),
      substring(pad, 1, 1), lit("."), substring(pad, 2, 15))
  }

  /** Project any chunk-shaped frame onto the 28 columns in fixed order,
    * serializing `embedding` and nulling the auto columns. Source columns
    * missing from the input become null columns (nullable contract). */
  def toDbRows(chunks: DataFrame): DataFrame = {
    val present = chunks.columns.toSet
    val cols = databaseColumns.map {
      case c if emptyColumns.contains(c) => lit(null).cast("string").as(c)
      case "embedding" if present("embedding") =>
        embeddingLiteral(col("embedding")).as("embedding")
      case c if present(c) => col(c)
      case c => lit(null).cast("string").as(c)
    }
    chunks.select(cols: _*)
  }

  /** S8 (stage_05_csv_export.py:532-580): overwrite-by-key master merge —
    * drop the master's rows for the incoming document ids, append fresh. */
  def replaceByKey(master: DataFrame, fresh: DataFrame, key: String): DataFrame = {
    val keys = fresh.select(col(key)).distinct()
    master.join(broadcast(keys), Seq(key), "left_anti")
      .unionByName(fresh.select(master.columns.toIndexedSeq.map(col): _*))
  }
}
