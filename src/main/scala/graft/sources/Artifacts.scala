package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.hadoop.fs.{FileUtil, Path}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Single-file artifact contract (SURVEY S4/S7 + V7/V10): every reference
  * stage publishes one pretty-printed JSON array
  * (`semantic search/stage_01_chapter_processing.py:1063-1072`), the master
  * CSV is rewritten whole with a timestamped backup and a deployment copy
  * (`catalog search/stage_05_csv_export.py:697-725`-style; semantic search
  * shares the layout), writes go through a temp file + rename with up to 3
  * retries (`catalog search/stage4_update_csv.py:224-304`), runs emit a
  * deployment-metadata JSON (`stage5_output_final_csv.py:431-474`), and
  * empty-CDC rounds are signalled by flag files
  * (`stage1_extract_csv.py:725-780`).
  *
  * Scale posture: a single output file is inherently a coalesce(1) — the
  * upstream plan still computes distributed and the one-partition stage
  * only streams rows to disk; nothing is collected to the driver (the
  * pretty-JSON publisher streams the NDJSON part file through Jackson one
  * row at a time).
  */
object Artifacts {

  final case class PublishResult(master: String, backup: String,
      deployment: String)

  private def fs(p: Path, df: DataFrame) =
    p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())

  /** Retry an IO action up to `maxRetries` times with the reference's
    * progressive waits ((attempt+1)*5 s there; injectable here so specs
    * run instantly). */
  private[sources] def withRetries[A](maxRetries: Int,
      sleep: Int => Unit = _ => ())(op: () => A): A = {
    var attempt = 0
    while (true) {
      try return op()
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          sleep(attempt * 5)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write `df` as ONE csv file at `target` (temp dir + rename of the
    * single part file — atomic publish, no partial file visible). */
  private def writeSingleCsv(df: DataFrame, orderCols: Seq[String],
      target: Path, maxRetries: Int, sleep: Int => Unit): Unit = {
    import org.apache.spark.sql.functions.col
    val hfs = fs(target, df)
    withRetries(maxRetries, sleep) { () =>
      val tmp = new Path(target.getParent,
        s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
      try {
        df.orderBy(orderCols.map(col): _*).coalesce(1)
          .write.option("header", true).mode("overwrite").csv(tmp.toString)
        val part = hfs.listStatus(tmp)
          .map(_.getPath).find(_.getName.startsWith("part-"))
          .getOrElse(throw new java.io.IOException(s"no part file in $tmp"))
        hfs.mkdirs(target.getParent)
        hfs.delete(target, false)
        if (!hfs.rename(part, target))
          throw new java.io.IOException(s"rename $part -> $target failed")
      } finally hfs.delete(tmp, true)
    }
  }

  /** S7/S8 file side: rewrite the master CSV whole, then lay down the
    * timestamped backup and deployment copies (both exact byte copies of
    * the master, as the reference writes the same `csv_bytes` three
    * times). `timestamp` uses the reference's `%Y-%m-%d_%H-%M-%S`. */
  def publishMasterCsv(df: DataFrame, orderCols: Seq[String], baseDir: String,
      masterName: String, deploymentPrefix: String, timestamp: String,
      maxRetries: Int = 3, sleep: Int => Unit = _ => ()): PublishResult = {
    val base = new Path(baseDir)
    val hfs = fs(base, df)
    val master = new Path(base, s"$masterName.csv")
    writeSingleCsv(df, orderCols, master, maxRetries, sleep)
    val backup = new Path(new Path(base, "backups"),
      s"${masterName}_$timestamp.csv")
    val deployment = new Path(new Path(base, "deployment"),
      s"${deploymentPrefix}_$timestamp.csv")
    val conf = df.sparkSession.sessionState.newHadoopConf()
    Seq(backup, deployment).foreach { dst =>
      withRetries(maxRetries, sleep) { () =>
        hfs.mkdirs(dst.getParent)
        FileUtil.copy(hfs, master, hfs, dst, false, true, conf)
      }
    }
    PublishResult(master.toString, backup.toString, deployment.toString)
  }

  /** S4: publish `df` as ONE pretty-printed JSON array (2-space indent,
    * `"key": value` separators, nulls kept, rows in `orderCols` order —
    * the shape of the reference's `json.dumps(list, indent=2)` stage
    * artifacts; key order follows the schema rather than dict insertion).
    * The distributed plan writes ordered NDJSON to a temp dir; the part
    * file is then STREAMED through Jackson row by row, so driver memory
    * stays O(row), not O(table). */
  def writeJsonArray(df: DataFrame, orderCols: Seq[String], target: String,
      maxRetries: Int = 3, sleep: Int => Unit = _ => ()): Unit = {
    import org.apache.spark.sql.functions.col
    val dst = new Path(target)
    val hfs = fs(dst, df)
    withRetries(maxRetries, sleep) { () =>
      val tmp = new Path(dst.getParent,
        s".${dst.getName}.tmp-${java.util.UUID.randomUUID()}")
      try {
        df.orderBy(orderCols.map(col): _*).coalesce(1)
          .write.option("ignoreNullFields", false) // python json keeps nulls
          .mode("overwrite").json(tmp.toString)
        val part = hfs.listStatus(tmp)
          .map(_.getPath).find(_.getName.startsWith("part-"))
          .getOrElse(throw new java.io.IOException(s"no part file in $tmp"))
        hfs.mkdirs(dst.getParent)
        val mapper = new ObjectMapper
        // python-style separators: '"key": value', not Jackson's ' : '
        val seps = com.fasterxml.jackson.core.util.Separators
          .createDefaultInstance()
          .withObjectFieldValueSpacing(
            com.fasterxml.jackson.core.util.Separators.Spacing.AFTER)
        val printer = new com.fasterxml.jackson.core.util.DefaultPrettyPrinter()
          .withSeparators(seps)
        printer.indentArraysWith(com.fasterxml.jackson.core.util
          .DefaultIndenter.SYSTEM_LINEFEED_INSTANCE)
        val writer = mapper.writer(printer)
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(hfs.open(part), "UTF-8"))
        val tmpOut = new Path(dst.getParent, s".${dst.getName}.publishing")
        val out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(hfs.create(tmpOut, true), "UTF-8"))
        try {
          out.write("[")
          var first = true
          var line = in.readLine()
          while (line != null) {
            if (line.nonEmpty) {
              val pretty = writer.writeValueAsString(mapper.readTree(line))
                .replace("\n", "\n  ")
              out.write(if (first) "\n  " else ",\n  ")
              out.write(pretty)
              first = false
            }
            line = in.readLine()
          }
          out.write("\n]")
        } finally { in.close(); out.close() }
        hfs.delete(dst, false)
        if (!hfs.rename(tmpOut, dst))
          throw new java.io.IOException(s"rename $tmpOut -> $dst failed")
      } finally {
        hfs.delete(tmp, true)
        hfs.delete(new Path(dst.getParent, s".${dst.getName}.publishing"), false)
      }
    }
  }

  /** S3: whole-file JSON-array input — the reference reads each stage
    * artifact as one pretty-printed array and asserts the top level IS a
    * list before processing (`stage_01_chapter_processing.py` input
    * contract). `multiLine` mode parses the array distributed; the
    * list-assert reads only the first non-whitespace byte. */
  def readJsonArray(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val p = new Path(path)
    val hfs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = hfs.open(p)
    try {
      var c = in.read()
      while (c != -1 && Character.isWhitespace(c)) c = in.read()
      require(c == '[',
        s"$path is not a JSON array (first byte '${c.toChar}') — " +
          "stage artifacts must be whole-file JSON lists")
    } finally in.close()
    spark.read.option("multiLine", true).json(path)
  }

  // -------------------------------------------------------------------
  // V10 — skip/refresh flag files
  // -------------------------------------------------------------------

  val SkipFlag = "_SKIP_SUBSEQUENT_STAGES.flag"
  val RefreshFlag = "_FULL_REFRESH.flag"

  /** End-of-CDC flag management: create the skip flag iff there is no work
    * (nothing to process AND nothing to delete), else remove it; create or
    * remove the full-refresh flag per the run mode. Flags are empty files,
    * as the reference writes them. */
  def manageFlags(df: DataFrame, dir: String, nToProcess: Long,
      nToDelete: Long, fullRefresh: Boolean): Unit = {
    val base = new Path(dir)
    val hfs = fs(base, df)
    hfs.mkdirs(base)
    val skip = new Path(base, SkipFlag)
    val refresh = new Path(base, RefreshFlag)
    if (nToProcess == 0 && nToDelete == 0) hfs.create(skip, true).close()
    else hfs.delete(skip, false)
    if (fullRefresh) hfs.create(refresh, true).close()
    else hfs.delete(refresh, false)
  }

  /** Consumer side: a downstream stage starts by checking the skip flag. */
  def shouldSkip(df: DataFrame, dir: String): Boolean =
    fs(new Path(dir, SkipFlag), df).exists(new Path(dir, SkipFlag))

  def isFullRefresh(df: DataFrame, dir: String): Boolean =
    fs(new Path(dir, RefreshFlag), df).exists(new Path(dir, RefreshFlag))

  // -------------------------------------------------------------------
  // V8 — archive a run directory
  // -------------------------------------------------------------------

  /** V8: zip every regular file under `dir` (relative paths preserved,
    * entries sorted for a deterministic archive) into `zipPath` — the
    * reference's end-of-run archive step. Driver-side by design: run
    * artifacts are metadata-scale. Returns the number of entries. */
  def archiveRun(df: DataFrame, dir: String, zipPath: String): Int = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val hfs = fs(new Path(dir), df)
    val base = hfs.makeQualified(new Path(dir))
    def walk(p: Path): Seq[FileStatus] =
      hfs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st)
      }
    val files = walk(base).sortBy(_.getPath.toString)
    val out = new java.util.zip.ZipOutputStream(
      hfs.create(new Path(zipPath), true))
    try {
      files.foreach { st =>
        val rel = base.toUri.relativize(st.getPath.toUri).getPath
        val entry = new java.util.zip.ZipEntry(rel)
        entry.setTime(0L) // deterministic archive bytes
        out.putNextEntry(entry)
        val in = hfs.open(st.getPath)
        try {
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        out.closeEntry()
      }
    } finally out.close()
    files.length
  }

  // -------------------------------------------------------------------
  // V7 — deployment metadata + summary report
  // -------------------------------------------------------------------

  /** Distributed, order-independent content hash of a frame: md5 of each
    * row's canonical concat, folded by summing the first-8-hex-digit
    * values (the reference hashes a driver-side JSON dump, which is
    * order-sensitive and single-node; this is the distributed
    * reformulation — same integrity goal, scan-speed compute). */
  def contentHash(df: DataFrame): String = {
    import org.apache.spark.sql.functions._
    val cols = df.columns.toIndexedSeq.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000")))
    val row = df.select(
      conv(substring(md5(concat_ws("\u0001", cols: _*)), 1, 8), 16, 10)
        .cast("long").as("h"))
      .agg(coalesce(sum(col("h")), lit(0L)).as("s"),
        count(lit(1)).as("n")).collect()(0)
    f"${row.getLong(0)}%016x-${row.getLong(1)}"
  }

  /** V7: the deployment metadata JSON for IT pickup
    * (`stage5_output_final_csv.py:431-474`): file names, counts, hashes,
    * schema, delete query, import order, SUCCESS/WARNING status. */
  def deploymentMetadata(catalog: DataFrame, content: DataFrame,
      timestamp: String, sources: Seq[String],
      validationIssues: Seq[String] = Nil): String = {
    val mapper = new ObjectMapper
    val root = mapper.createObjectNode()
    val sourceList = sources.map(s => s"'$s'").mkString(", ")
    val deleteQuery =
      s"DELETE FROM apg_catalog WHERE document_source IN ($sourceList); " +
        s"DELETE FROM apg_content WHERE document_source IN ($sourceList);"

    def arr(node: ObjectNode, name: String, vs: Seq[String]): ArrayNode = {
      val a = node.putArray(name); vs.foreach(a.add); a
    }
    val info = root.putObject("deployment_info")
    info.put("timestamp", timestamp)
    arr(info, "document_sources", sources)
    info.put("pipeline_version", "CSV_Migration_v1.0")
    info.put("stage5_version", "2.0")

    val nCatalog = catalog.count(); val nContent = content.count()
    val files = root.putObject("file_info")
    files.put("catalog_file", s"catalog_$timestamp.csv")
    files.put("content_file", s"content_$timestamp.csv")
    files.put("catalog_records", nCatalog)
    files.put("content_records", nContent)
    files.put("catalog_hash", contentHash(catalog))
    files.put("content_hash", contentHash(content))

    val schema = root.putObject("schema_info")
    arr(schema, "catalog_columns", catalog.columns.toIndexedSeq)
    arr(schema, "content_columns", content.columns.toIndexedSeq)
    val targets = schema.putObject("target_tables")
    targets.put("catalog", "apg_catalog")
    targets.put("content", "apg_content")

    val instr = root.putObject("instructions")
    arr(instr, "import_order", Seq(
      "Delete existing records for document_source",
      "Import catalog CSV", "Import content CSV"))
    instr.put("delete_query", deleteQuery)
    arr(instr, "notes", Seq(
      "CSV files are formatted for PostgreSQL COPY command",
      "Timestamp columns are in UTC format",
      "Embedding columns contain JSON strings or NULL",
      "Files have been validated for data integrity"))

    val summary = root.putObject("summary")
    summary.put("status",
      if (validationIssues.isEmpty) "SUCCESS" else "WARNING")
    summary.put("total_records", nCatalog + nContent)
    arr(summary, "validation_issues", validationIssues)

    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}
