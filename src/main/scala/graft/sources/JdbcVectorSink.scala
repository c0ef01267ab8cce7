package graft.sources

import org.apache.spark.sql.DataFrame

/** Postgres/pgvector sink (SURVEY S9/S10;
  * semantic search/stage_06_database_upload.py:161-581).
  *
  * Spark has no pgvector type, so the reference's staged-COPY pattern is
  * kept: rows land in a staging table whose `embedding` column is TEXT
  * (the `[x,y,...]` literal from DbExport.embeddingLiteral), then one
  * server-side `INSERT ... SELECT` casts `embedding::vector(N)` into the
  * target. Batch size mirrors the reference's 1000 (INSERT_BATCH_SIZE,
  * stage_06:92).
  *
  * No database exists in this environment — the writer is exercised only
  * through its SQL generation (unit-tested); the `write` path is the
  * standard JDBC batch writer and needs no custom code.
  */
object JdbcVectorSink {

  final case class Target(url: String, table: String, stagingTable: String,
      vectorCols: Map[String, Int], user: String, password: String,
      batchSize: Int = 1000)

  /** Validate an identifier (optionally schema-qualified) against the
    * SQL-safe charset. Names come from config, not user data, but they
    * are interpolated into DDL/DML — reject anything that would need
    * quoting games. */
  private[graft] def ident(name: String): String = {
    // split with -1: trailing dots must yield an (invalid) empty segment
    // rather than being silently discarded
    val parts = name.split("\\.", -1)
    require(parts.nonEmpty &&
      parts.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"unsafe SQL identifier: '$name'")
    name
  }

  /** S10 pre-action: full-table refresh. `TRUNCATE` when permitted; the
    * reference's fallback deletes in 10k batches (stage_06:562-581) —
    * that loop is a driver-side client concern. */
  def clearSql(t: Target): String = s"TRUNCATE TABLE ${ident(t.table)}"

  /** Server-side cast-insert from staging into the target (S9). */
  def castInsertSql(t: Target, columns: Seq[String]): String = {
    val selectCols = columns.map { c =>
      t.vectorCols.get(c) match {
        case Some(dims) =>
          s"NULLIF(${ident(c)}, '')::vector($dims) AS ${ident(c)}"
        case None => ident(c)
      }
    }
    s"""INSERT INTO ${ident(t.table)} (${columns.map(ident).mkString(", ")})
       |SELECT ${selectCols.mkString(", ")}
       |FROM ${ident(t.stagingTable)}""".stripMargin
  }

  /** Post-upload verification query (stage_06:339-362). */
  def verifySql(t: Target): String =
    s"SELECT COUNT(*) AS n_rows, COUNT(embedding) AS n_embedded FROM ${ident(t.table)}"

  /** Stage rows (embedding already serialized to text) into the staging
    * table via the standard JDBC batch writer, then run the cast-insert.
    * The two statements run through a plain JDBC connection on the driver
    * (DDL/DML are single statements — no distribution needed), inside ONE
    * transaction: a failed cast-insert rolls back the TRUNCATE, so the
    * production table is never left empty (the reference's deploy-replace
    * contract, stage_06:525-559). */
  def upload(df: DataFrame, t: Target): Unit = {
    df.write
      .format("jdbc")
      .option("url", t.url)
      .option("dbtable", ident(t.stagingTable))
      .option("user", t.user)
      .option("password", t.password)
      .option("batchsize", t.batchSize)
      .option("truncate", true)
      .mode("overwrite")
      .save()
    val conn = java.sql.DriverManager.getConnection(t.url, t.user, t.password)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.execute(clearSql(t))
        st.execute(castInsertSql(t, df.columns.toSeq))
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }
}
