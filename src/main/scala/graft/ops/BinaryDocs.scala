package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Binary-document split/merge operators (SURVEY S12/S15/S16):
  *  - split one document blob into per-page blobs
  *    (`catalog search/stage2_process_documents.py:367-396` extracts each
  *    PDF page as its own PDF);
  *  - merge an ordered group of blobs back into one document
  *    (`semantic search - iasb prep/stage_00_pdf_merger.py:302-333`).
  *
  * The page codec is a seam: real PDF paging needs pdfbox (absent from
  * this offline container — probed), so `StubCodec` pages on fixed-size
  * boundaries, which makes split→merge an exact byte round-trip that the
  * DuckDB oracle can verify end-to-end via content hashes. Everything
  * around the codec — the distributed explode, the grouped ordered binary
  * reassembly — is the real engine path.
  *
  * Scale posture: split is a flatMap (no shuffle); merge is one shuffle on
  * the group key with the page sort done inside `sort_array` on the
  * grouped struct — binary payloads move through exactly one exchange and
  * are never collected to the driver.
  */
object BinaryDocs {

  /** Pluggable pager. `split` must preserve bytes: concat(split(b)) == b. */
  trait PageCodec extends Serializable {
    def split(doc: Array[Byte]): Seq[Array[Byte]]
    def merge(pages: Seq[Array[Byte]]): Array[Byte]
  }

  /** STUB codec (no pdfbox in this environment): fixed-size byte pages.
    * Deterministic and byte-preserving, so round-trip equality is a hard
    * oracle even though real PDF structure is absent. */
  final class StubCodec(pageSize: Int = 256) extends PageCodec {
    require(pageSize > 0)
    override def split(doc: Array[Byte]): Seq[Array[Byte]] =
      if (doc == null || doc.isEmpty) Seq.empty
      else doc.grouped(pageSize).toSeq
    override def merge(pages: Seq[Array[Byte]]): Array[Byte] =
      pages.foldLeft(Array.emptyByteArray)(_ ++ _)
  }

  /** S12/S15: explode (doc_id, blob) into (doc_id, page_number, page)
    * rows, page_number 1-based in document order. Pure flatMap — scales
    * with the scan, no shuffle. */
  def splitPages(docs: Dataset[(Long, Array[Byte])],
      codec: PageCodec = new StubCodec()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (id, blob) =>
      codec.split(blob).iterator.zipWithIndex.map { case (p, i) =>
        (id, i + 1, p)
      }
    }.toDF("doc_id", "page_number", "page")
  }

  /** S17/S18 seam: render one row's fields into one document blob (the
    * reference renders each spreadsheet row as a styled PDF,
    * `catalog search - excel prep/excel_to_pdf_prep.py:177-330`, and
    * converts DOCX via an external tool). The layout engine is
    * presentation; the engine contract is the row→document mapping. */
  trait RowRenderer extends Serializable {
    def render(rowId: Long, fields: Seq[(String, String)]): Array[Byte]
  }

  /** STUB renderer (no ReportLab/LibreOffice analogue offline): a
    * deterministic textual layout — title line plus one bracketed section
    * per field — so outputs are byte-recomputable by the oracle. */
  object StubRowRenderer extends RowRenderer {
    override def render(rowId: Long,
        fields: Seq[(String, String)]): Array[Byte] =
      (s"ROW $rowId\n" +
        fields.map { case (k, v) => s"[$k] $v\n" }.mkString)
        .getBytes("UTF-8")
  }

  /** S17: render every row into a document blob. Input: `rowIdCol` plus
    * string field columns (callers cast); output adds `doc` and
    * `n_bytes`. Pure projection — scales with the scan. */
  def renderRows(df: DataFrame, rowIdCol: String,
      renderer: RowRenderer = StubRowRenderer): DataFrame = {
    val fieldCols = df.columns.filter(_ != rowIdCol).toSeq
    val renderUdf = udf { (id: Long, vs: Seq[String]) =>
      renderer.render(id, fieldCols.zip(vs.map(v => if (v == null) "" else v)))
    }
    df.withColumn("doc",
        renderUdf(col(rowIdCol), array(fieldCols.map(col): _*)))
      .withColumn("n_bytes", length(col("doc")))
  }

  /** S16: reassemble pages into one blob per group, in page order — one
    * shuffle on the group key; ordering via sort_array on (page_number,
    * page) structs so no window or secondary sort is needed. */
  def mergeGroups(pages: DataFrame, keyCols: Seq[String],
      orderCol: String = "page_number", pageCol: String = "page",
      codec: PageCodec = new StubCodec()): DataFrame = {
    val mergeUdf = udf { ps: Seq[Array[Byte]] => codec.merge(ps) }
    pages
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col(orderCol), col(pageCol))))
        .as("_ordered"))
      .withColumn("merged", mergeUdf(col(s"_ordered.$pageCol")))
      .withColumn("n_pages", size(col("_ordered")))
      .drop("_ordered")
  }
}
