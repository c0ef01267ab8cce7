package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Multimodal

/** Multimodal plumbing exercised over synthetic binary payloads derived
  * from the documents table (text bytes as stand-in media — the decode is
  * a marked stub; the schema/partition/batch path is real). The per-item
  * features are rows-only (hash-derived stub values); the audit IS
  * oracle-checked — item counts, payload byte totals, and the validity
  * rule are recomputed by DuckDB, and the unit-norm/dims invariants the
  * stub guarantees are pinned at zero. */
object MultimodalQueries extends QueryModule {

  /** The session's enricher for the multimodal stages — deterministic
    * stub behind the same replay-cache seam as EnrichQueries.enricher
    * (spark.graft.enrich.cache.dir), defined once so the wiring cannot
    * diverge between call sites. */
  private def enricher(spark: org.apache.spark.sql.SparkSession): graft.enrich.Enricher =
    graft.enrich.CachingEnricher.maybeCached(spark,
      new graft.enrich.DeterministicEnricher(64))

  private def media(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
  }

  /** Decode + feature-extract; per-item inventory. The stub decoder's
    * metadata is md5-derived, so every cell is recomputed by the oracle. */
  def features(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extract(media(spark, dir))
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("duration_ms"), col("valid"), size(col("features")).as("dims"),
        col("n_bytes"))
      .orderBy(col("media_id"))

  /** Frame sampling over the fixture's video items (doc_id % 3 = 2):
    * 1-frame-per-second timestamps capped at 8, each frame's md5
    * fingerprint — the video-side plumbing of the multimodal family.
    * The stub's duration and proportional byte slices are md5/integer
    * arithmetic, so the oracle recomputes every row (timestamps, frame
    * counts, AND fingerprints) from the text payloads, with the
    * phash mirror's ASCII guard for the byte≡char equivalence. */
  def frameSampleQ(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(media(spark, dir))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Per-kind audit: all valid, fixed dims, unit norms. Zero violations. */
  def mediaAudit(spark: SparkSession, dir: String): DataFrame = {
    val f = Multimodal.extract(media(spark, dir))
    val norm = sqrt(aggregate(col("features"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    f.withColumn("nrm", when(col("features").isNotNull, norm))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_items"),
        count(when(!col("valid"), 1)).as("invalid_items"),
        count(when(col("valid") && size(col("features")) =!= 32, 1))
          .as("dim_violations"),
        count(when(col("valid") && abs(col("nrm") - 1.0) > 1e-3, 1))
          .as("norm_violations"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("kind"))
  }

  /** S20/S21 (L8): six vision passes + Markdown synthesis per page, via
    * the enrichment seam (deterministic stub analyzer; the pass set and
    * message assembly are the parity-tested Prompts). Output shape is
    * fully recomputable: the oracle reconstructs the synthesized
    * markdown's layout (fixed-width pass tags, byte-count digits) in SQL
    * and compares lengths, pass counts, and page numbers. */
  def visionMarkdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pages = Tables.documents(spark, dir)
      .select(col("doc_id"), lit(1).cast("int").as("page"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Int, Array[Byte])]
    graft.ops.EnrichStages.visionPages(pages,
      enricher(spark))
      .toDF("doc_id", "page_number", "markdown", "n_passes")
      .select(col("doc_id"), col("page_number"), col("n_passes"),
        length(col("markdown")).as("md_len"))
      .orderBy(col("doc_id"))
  }

  private val OcrPageChars = 240
  private val EmptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"

  /** S13/S14: the deterministic OCR path, value-checked end to end.
    * Documents page on 240-CHARACTER boundaries (both engines' substring
    * is char-based, so the pager is cross-engine exact — the byte pager
    * is separately covered by q_binary_split_merge); each page goes
    * through the OCR seam as its UTF-8 bytes; per doc the oracle
    * recomputes the page count and the md5 of the reassembled
    * page-ordered markdown — the stub's md5-derived scan tag makes the
    * FULL markdown portable, not just its length. Empty docs keep a row
    * (0 pages, hash of empty). */
  def ocrPagesQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val pages = docs
      .select(col("doc_id"),
        posexplode(
          when(length(col("text")) > 0,
            transform(
              // `/` on Columns is DOUBLE division — cast for the page count
              sequence(lit(0),
                ((length(col("text")) - 1) / OcrPageChars).cast("int")),
              i => col("text").substr(i * OcrPageChars + 1, lit(OcrPageChars))))
            .otherwise(array().cast("array<string>")))
          .as(Seq("pos", "page")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("page_number"),
        encode(col("page"), "UTF-8").as("image"))
      .as[(Long, Int, Array[Byte])]
    val md = graft.ops.EnrichStages.ocrPages(pages,
      enricher(spark))
      .toDF("doc_id", "page_number", "md")
    val perDoc = md.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pages"),
        md5(array_join(
          transform(
            sort_array(collect_list(struct(col("page_number"), col("md")))),
            s => s.getField("md")),
          "\n\n")).as("ocr_fp"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pages"), lit(0L)).as("n_pages"),
        coalesce(col("ocr_fp"), lit(EmptyMd5)).as("ocr_fp"))
      .orderBy(col("doc_id"))
  }

  /** S12/S15/S16: document → per-page blobs → grouped ordered reassembly.
    * The stub codec pages on 256-byte boundaries, so the merge must
    * reproduce the original bytes exactly — the oracle recomputes page
    * counts and the full content hash from the source table. */
  def binarySplitMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    val merged = graft.ops.BinaryDocs.mergeGroups(
      graft.ops.BinaryDocs.splitPages(docs), Seq("doc_id"))
    // empty documents produce zero pages (nothing to merge) but must not
    // vanish from the round-trip report: 0 pages, hash of empty content
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    docs.toDF("doc_id", "payload").select(col("doc_id"))
      .join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pages"), lit(0)).as("n_pages"),
        coalesce(md5(col("merged")), lit(emptyMd5)).as("content_fp"))
      .orderBy(col("doc_id"))
  }

  /** S17: every orders row rendered to a document blob via the renderer
    * seam; the oracle reconstructs the stub layout byte-for-byte. */
  def rowRender(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir).select(
      col("o_orderkey").as("row_id"),
      col("o_orderkey").cast("string").as("order_key"),
      col("o_custkey").cast("string").as("cust_key"),
      col("o_orderpriority").as("priority"),
      col("o_orderstatus").as("status"))
    graft.ops.BinaryDocs.renderRows(src, "row_id")
      .select(col("row_id"), col("n_bytes"), md5(col("doc")).as("fp"))
      .orderBy(col("row_id"))
  }

  /** The vision-catalog pipeline end to end (`catalog search - vision`
    * stages 2→3): document blob → per-page split → six vision passes +
    * markdown synthesis per page → ordered markdown merge → catalog
    * describe + embed. The oracle reconstructs page counts and the TOTAL
    * synthesized markdown length across all pages (page-number digits and
    * last-page byte counts included) purely from the source bytes —
    * a value check across four composed stages. */
  def visionCatalog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sessionEnricher = enricher(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    val pages = graft.ops.BinaryDocs.splitPages(docs)
      .select(col("doc_id"), col("page_number").cast("int"), col("page"))
      .as[(Long, Int, Array[Byte])]
    val md = graft.ops.EnrichStages.visionPages(pages, sessionEnricher)
      .toDF("doc_id", "page_number", "markdown", "n_passes")
    val perDoc = md.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_pages"),
        sum(length(col("markdown"))).as("total_md_len"),
        array_join(
          sort_array(collect_list(struct(col("page_number"), col("markdown"))))
            .getField("markdown"), "\n\n").as("document_md"))
    val described = graft.ops.EnrichStages.describeDocuments(
      perDoc.select(col("doc_id"), col("document_md")).as[(Long, String)],
      sessionEnricher)
      .toDF("doc_id", "description", "usage", "desc_vec", "usage_vec")
      .select(col("doc_id"), size(col("desc_vec")).as("desc_dims"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(perDoc.drop("document_md"), Seq("doc_id"), "left")
      .join(described, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pages"), lit(0)).as("n_pages"),
        coalesce(col("total_md_len"), lit(0L)).cast("long").as("total_md_len"),
        col("desc_dims"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual-hash image near-dup pairs (the multimodal face of the
    * dedup family): each document yields its payload plus a slightly
    * "re-encoded" variant (4 bytes appended — the planted near-dup),
    * every item gets a 64-bit aHash over the stub's locality-preserving
    * strided thumbnail, and banded LSH + exact Hamming ≤ 10 emits the
    * duplicate pairs. The oracle rebuilds pixels, threshold bits, bands,
    * candidates, and Hamming distances from scratch — including the
    * banding's recall behavior, not an easier brute-force restatement —
    * and carries a loud ASCII guard (the stub's byte sums are mirrored
    * through per-char code points, exact only while payloads are ASCII;
    * a non-ASCII fixture would poison-row, never silently drift). */
  def phashPairsQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val m = docs.select((col("doc_id") * 2).as("media_id"),
        lit("image").as("kind"), encode(col("text"), "UTF-8").as("payload"))
      .unionByName(docs.select((col("doc_id") * 2 + 1).as("media_id"),
        lit("image").as("kind"),
        encode(concat(col("text"), lit("!!!!")), "UTF-8").as("payload")))
      .as[(Long, String, Array[Byte])]
    Multimodal.pHashPairs(Multimodal.pHash(m))
      .orderBy(col("id_a"), col("id_b"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ocr_pages" -> ocrPagesQ,
    "q_media_features" -> features,
    "q_media_audit" -> mediaAudit,
    "q_media_phash_pairs" -> phashPairsQ,
    "q_media_frame_sample" -> frameSampleQ,
    "q_vision_markdown" -> visionMarkdown,
    "q_binary_split_merge" -> binarySplitMerge,
    "q_row_render" -> rowRender,
    "q_vision_catalog" -> visionCatalog)

  /** The synthesized markdown rebuilt in SQL with a fixed-width tag
    * placeholder — structure (headers, separators, byte-count digits) is
    * real recomputation; only the 8-hex content tag is shape-pinned. */
  // single-line: the interpolation target goes through stripMargin, which
  // would eat the leading '|' of a wrapped '||'. Parameterized on the page
  // label and byte-count expressions so single-page and per-page variants
  // share one generator.
  private def visionMdLen(pageExpr: String, bytesExpr: String): String = {
    val parts = graft.enrich.Prompts.visionPasses.map { case (name, _) =>
      s"chr(10) || chr(10) || '## ${name.toUpperCase.replace('_', ' ')}' || chr(10)" +
        s" || '[$name xxxxxxxx] ' || CAST($bytesExpr AS VARCHAR)" +
        " || ' bytes analyzed'"
    }.mkString(" || ")
    s"length('# Page ' || CAST($pageExpr AS VARCHAR) || $parts)"
  }

  private def visionMdLenSql: String =
    visionMdLen("1", "octet_length(encode(text))")

  /** The aHash threshold-bit sum for one 32-bit half: bit j set iff
    * 64·p[base+j+1] > s (DuckDB lists are 1-indexed). */
  private def halfBitsSql(base: Int): String =
    (0 until 32).map(j =>
      s"(CASE WHEN 64 * p[${base + j + 1}] > s THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")

  private def phashPairsSql: String =
    s"""WITH m AS (
       |  SELECT doc_id * 2 AS media_id, text AS t FROM documents
       |  UNION ALL
       |  SELECT doc_id * 2 + 1, text || '!!!!' FROM documents),
       |px AS (
       |  -- pixel i = floor-mean of bytes at positions ≡ i mod 64 (the
       |  -- term count is ceil((len−i)/64); 0 terms → pixel 0) — the
       |  -- mirror of StubDecoder.thumbnail's content-driven mean
       |  SELECT media_id,
       |    list_transform(range(0, 64), i ->
       |      CAST(CASE WHEN i < length(t)
       |        THEN list_sum(list_transform(range(0, (length(t) + 63) // 64), r ->
       |          CASE WHEN i + 64 * r + 1 <= length(t)
       |            THEN unicode(substr(t, CAST(i + 64 * r + 1 AS INT), 1))
       |            ELSE 0 END)) // ((length(t) - i - 1) // 64 + 1)
       |        ELSE 0 END AS BIGINT)) AS p
       |  FROM m WHERE length(t) > 0),
       |hb AS (
       |  SELECT media_id, p, list_sum(p) AS s FROM px),
       |h AS (
       |  SELECT media_id,
       |    ${halfBitsSql(32)} AS hi32,
       |    ${halfBitsSql(0)} AS lo32
       |  FROM hb),
       |bands AS (
       |  SELECT media_id, hi32, lo32, 0 AS k, lo32 % 65536 AS band FROM h
       |  UNION ALL SELECT media_id, hi32, lo32, 1, (lo32 // 65536) % 65536 FROM h
       |  UNION ALL SELECT media_id, hi32, lo32, 2, hi32 % 65536 FROM h
       |  UNION ALL SELECT media_id, hi32, lo32, 3, (hi32 // 65536) % 65536 FROM h),
       |cand AS (
       |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
       |    a.hi32 AS ha, a.lo32 AS la, b.hi32 AS hb, b.lo32 AS lb
       |  FROM bands a JOIN bands b
       |    ON a.k = b.k AND a.band = b.band AND a.media_id < b.media_id),
       |pairs AS (
       |  SELECT id_a, id_b,
       |    CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS INTEGER)
       |      AS hamming
       |  FROM cand)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 10
       |  UNION ALL
       |  -- ASCII guard: the pixel mirror equates code points with bytes;
       |  -- a non-ASCII payload would silently diverge, so it poisons
       |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), -1
       |  WHERE EXISTS (SELECT 1 FROM m
       |                WHERE octet_length(encode(t)) <> length(t)))
       |ORDER BY id_a, id_b""".stripMargin

  /** Frame-sample mirror: the stub's md5-derived duration
    * ((h32 // 7) % 600000 + 1000), the capped 1 Hz timestamp ladder,
    * the proportional byte-slice offsets, and each frame's md5 — all
    * recomputed from the text payloads. Char-based substring equals the
    * Spark side's byte-based slice only over ASCII payloads, so the
    * phash mirror's ASCII guard poisons on any non-ASCII fixture. */
  private def frameSampleSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, text AS t
      |  FROM documents WHERE doc_id % 3 = 2),
      |h AS (
      |  SELECT media_id, t,
      |    CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h32,
      |    CAST(length(t) AS BIGINT) AS len
      |  FROM m WHERE length(t) > 0),
      |d AS (
      |  SELECT media_id, t, len,
      |    (h32 // 7) % 600000 + 1000 AS dur,
      |    LEAST((((h32 // 7) % 600000 + 1000) - 1) // 1000 + 1, 8)
      |      AS n_frames
      |  FROM h),
      |f AS (
      |  SELECT media_id, t, len, dur, n_frames,
      |    CAST(unnest(range(0, n_frames)) AS BIGINT) AS fi
      |  FROM d),
      |o AS (
      |  SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
      |    fi * 1000 AS frame_ms,
      |    md5(substring(t, CAST((fi * 1000 * len) // dur + 1 AS INT), 64))
      |      AS frame_fp,
      |    CAST(n_frames AS INTEGER) AS n_frames
      |  FROM f)
      |SELECT media_id, frame_idx, frame_ms, frame_fp, n_frames FROM (
      |  SELECT * FROM o
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), -1, CAST(-1 AS BIGINT), 'non-ascii', -1
      |  WHERE EXISTS (SELECT 1 FROM m
      |                WHERE octet_length(encode(t)) <> length(t)))
      |ORDER BY media_id, frame_idx""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q_media_phash_pairs" -> phashPairsSql,
    "q_media_frame_sample" -> frameSampleSql,
    // the OCR markdown rebuilt byte-for-byte: char-boundary pages, the
    // stub's md5 scan tag, UTF-8 byte counts, ordered reassembly hash
    "q_ocr_pages" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS n FROM documents),
         |pg AS (
         |  -- CASE guards the empty doc: DuckDB's // truncates toward
         |  -- zero, so (0-1)//$OcrPageChars is 0 (not -1) and an
         |  -- unguarded range would emit one page where Spark emits none
         |  SELECT doc_id, text,
         |    CAST(unnest(range(0, CASE WHEN n > 0
         |      THEN (n - 1) // $OcrPageChars + 1 ELSE 0 END)) AS BIGINT) AS p
         |  FROM d),
         |page AS (
         |  SELECT doc_id, p + 1 AS page_number,
         |    substring(text, CAST(p * $OcrPageChars + 1 AS INT), $OcrPageChars) AS pt
         |  FROM pg),
         |md AS (
         |  SELECT doc_id, page_number,
         |    '# OCR Page ' || CAST(page_number AS VARCHAR) || chr(10) || chr(10)
         |      || '[scan ' || md5(pt) || '] '
         |      || CAST(octet_length(encode(pt)) AS VARCHAR) || ' bytes' AS m
         |  FROM page),
         |agg AS (
         |  SELECT doc_id, COUNT(*) AS n_pages,
         |    md5(string_agg(m, chr(10) || chr(10) ORDER BY page_number)) AS ocr_fp
         |  FROM md GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(a.n_pages, 0) AS n_pages,
         |  COALESCE(a.ocr_fp, '$EmptyMd5') AS ocr_fp
         |FROM d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // every cell recomputed: kind dispatch, md5-derived stub metadata,
    // empty-payload invalidity, byte lengths, fixed feature dims
    "q_media_features" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |    octet_length(encode(text)) AS nb,
        |    CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id AS media_id, kind,
        |  CAST(CASE WHEN nb = 0 THEN 0
        |    WHEN kind IN ('image', 'video') THEN h % 1920 + 64
        |    ELSE 0 END AS INTEGER) AS width,
        |  CAST(CASE WHEN nb = 0 THEN 0
        |    WHEN kind IN ('image', 'video') THEN (h // 1920) % 1080 + 64
        |    ELSE 0 END AS INTEGER) AS height,
        |  CAST(CASE WHEN nb = 0 THEN 0
        |    WHEN kind = 'audio' THEN h % 600000 + 1000
        |    WHEN kind = 'video' THEN (h // 7) % 600000 + 1000
        |    ELSE 0 END AS BIGINT) AS duration_ms,
        |  nb > 0 AS valid,
        |  CASE WHEN nb = 0 THEN NULL ELSE 32 END AS dims,
        |  CAST(nb AS INTEGER) AS n_bytes
        |FROM d ORDER BY media_id""".stripMargin,
    // n_items/invalid_items/total_bytes recomputed (kind dispatch, the
    // empty-payload validity rule, UTF-8 byte length); dim/norm violations
    // are structural invariants of the extractor — pinned at zero.
    "q_media_audit" ->
      """SELECT
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |  COUNT(*) AS n_items,
        |  COUNT(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END)
        |    AS invalid_items,
        |  0 AS dim_violations,
        |  0 AS norm_violations,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_vision_markdown" ->
      s"""SELECT doc_id, 1 AS page_number, 6 AS n_passes,
         |  $visionMdLenSql AS md_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    // split→merge round-trip: page count and the reassembled content hash
    // both recomputed from the source bytes (256-byte stub pages)
    "q_binary_split_merge" ->
      """SELECT doc_id,
        |  CAST(ceil(octet_length(encode(text)) / 256.0) AS INTEGER) AS n_pages,
        |  md5(text) AS content_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // four composed stages value-checked: ceil-split page counts, per-page
    // synthesized-markdown lengths (256-byte pages, variable last page,
    // page-number digits) summed per document, embedding materialization
    "q_vision_catalog" -> {
      val mdLen = visionMdLen("pg",
        "CASE WHEN pg < n_pages THEN 256 ELSE n - (n_pages - 1) * 256 END")
      s"""WITH d AS (
         |  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
         |), p AS (
         |  SELECT doc_id, n, CAST(ceil(n / 256.0) AS INTEGER) AS n_pages FROM d
         |), pg AS (
         |  SELECT doc_id, n, n_pages,
         |    unnest(generate_series(1, n_pages)) AS pg
         |  FROM p WHERE n_pages > 0
         |), lens AS (
         |  SELECT doc_id, SUM($mdLen) AS s FROM pg GROUP BY doc_id
         |)
         |SELECT p.doc_id, p.n_pages,
         |  CAST(COALESCE(l.s, 0) AS BIGINT) AS total_md_len,
         |  CASE WHEN p.n_pages = 0 THEN NULL ELSE 64 END AS desc_dims
         |FROM p LEFT JOIN lens l ON l.doc_id = p.doc_id
         |ORDER BY p.doc_id""".stripMargin
    },
    // the rendered document rebuilt field-for-field in SQL
    "q_row_render" ->
      """WITH rendered AS (
        |  SELECT o_orderkey AS row_id,
        |    'ROW ' || CAST(o_orderkey AS VARCHAR) || chr(10)
        |      || '[order_key] ' || CAST(o_orderkey AS VARCHAR) || chr(10)
        |      || '[cust_key] ' || CAST(o_custkey AS VARCHAR) || chr(10)
        |      || '[priority] ' || o_orderpriority || chr(10)
        |      || '[status] ' || o_orderstatus || chr(10) AS doc
        |  FROM orders)
        |SELECT row_id, CAST(octet_length(encode(doc)) AS INTEGER) AS n_bytes,
        |  md5(doc) AS fp
        |FROM rendered ORDER BY row_id""".stripMargin)
}
