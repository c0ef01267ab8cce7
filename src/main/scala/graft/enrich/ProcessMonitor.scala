package graft.enrich

import java.sql.Timestamp
import java.util.UUID

/** S22: the process-monitor sink — CostMeter totals become one
  * `process_monitor_logs` row per stage run
  * (`database-schema.sql:258-280`; the reference's monitor writer is the
  * per-stage logging half of its pipeline wrappers).
  *
  * The row is assembled driver-side (accumulator totals are only valid
  * after an action) and appended through a plain JDBC prepared statement —
  * a single row per stage needs no distribution. The llm_calls JSONB
  * payload follows the schema comment's shape exactly:
  * `[{"model", "input_tokens", "output_tokens", "cost", "response_time_ms"}]`,
  * one aggregated entry for chat calls and one for embedding calls.
  *
  * No database exists in this environment, so the write path is exercised
  * through SQL generation + parameter binding (ProcessMonitorSpec); the
  * `append` entry point is the same two calls against a live connection.
  */
object ProcessMonitor {

  /** One stage run's monitor row (core fields of process_monitor_logs;
    * log_id/log_timestamp are server-side defaults). */
  final case class StageLog(
      runUuid: UUID,
      modelName: String,
      stageName: String,
      stageStart: Timestamp,
      stageEnd: Timestamp,
      llmCallsJson: String,
      totalTokens: Long,
      totalCostUsd: BigDecimal,
      status: String,
      decisionDetails: Option[String] = None,
      errorMessage: Option[String] = None) {
    def durationMs: Long = stageEnd.getTime - stageStart.getTime
  }

  /** Locale-pinned decimal for the JSON payload. */
  private def num(v: BigDecimal): String = v.bigDecimal.toPlainString

  /** Assemble a stage row from a drained CostMeter. `avgLatencyMs` stands
    * in for per-call response times (the deterministic enricher has no
    * network; a live enricher records real latencies the same way). */
  def fromMeter(meter: CostMeter, runUuid: UUID, modelName: String,
      stageName: String, stageStart: Timestamp, stageEnd: Timestamp,
      status: String, decisionDetails: Option[String] = None,
      errorMessage: Option[String] = None,
      avgLatencyMs: Long = 0L): StageLog = {
    val chatCost = BigDecimal(meter.promptTokens.value) * 0.01 / 1000 +
      BigDecimal(meter.completionTokens.value) * 0.03 / 1000
    val embedCost = BigDecimal(meter.embedTokens.value) * 0.00013 / 1000
    val calls = Seq(
      (s"$modelName-chat", meter.chatCalls.value, meter.promptTokens.value,
        meter.completionTokens.value, chatCost),
      (s"$modelName-embedding", meter.embedCalls.value,
        meter.embedTokens.value, 0L, embedCost))
      .filter(_._2 > 0)
      .map { case (model, _, inTok, outTok, cost) =>
        s"""{"model": "$model", "input_tokens": $inTok, """ +
          s""""output_tokens": $outTok, "cost": ${num(cost.setScale(6, BigDecimal.RoundingMode.HALF_UP))}, """ +
          s""""response_time_ms": $avgLatencyMs}"""
      }
    StageLog(
      runUuid = runUuid, modelName = modelName, stageName = stageName,
      stageStart = stageStart, stageEnd = stageEnd,
      llmCallsJson = calls.mkString("[", ", ", "]"),
      totalTokens = meter.promptTokens.value + meter.completionTokens.value +
        meter.embedTokens.value,
      totalCostUsd = BigDecimal(meter.costUsd)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP),
      status = status, decisionDetails = decisionDetails,
      errorMessage = errorMessage)
  }

  /** Parameterized INSERT for the monitor table (identifier validated
    * through the same charset gate as the vector sink). `llm_calls` casts
    * text → jsonb server-side. */
  def insertSql(table: String): String = {
    val t = graft.sources.JdbcVectorSink.ident(table)
    s"INSERT INTO $t (run_uuid, model_name, stage_name, stage_start_time, " +
      "stage_end_time, duration_ms, llm_calls, total_tokens, total_cost, " +
      "status, decision_details, error_message) " +
      "VALUES (?::uuid, ?, ?, ?, ?, ?, ?::jsonb, ?, ?, ?, ?, ?)"
  }

  /** Bind order for `insertSql` — split out so the spec pins the exact
    * wire values without a database. */
  def bindValues(log: StageLog): Seq[Any] = Seq(
    log.runUuid.toString, log.modelName, log.stageName, log.stageStart,
    log.stageEnd, log.durationMs, log.llmCallsJson, log.totalTokens,
    log.totalCostUsd.bigDecimal, log.status,
    log.decisionDetails.orNull, log.errorMessage.orNull)

  /** Append one stage row over a live connection (autocommit single
    * insert; the enclosing refresh job owns any wider transaction). */
  def append(conn: java.sql.Connection, table: String, log: StageLog): Unit = {
    val ps = conn.prepareStatement(insertSql(table))
    try {
      bindValues(log).zipWithIndex.foreach { case (v, i) =>
        v match {
          case null => ps.setNull(i + 1, java.sql.Types.VARCHAR)
          case ts: Timestamp => ps.setTimestamp(i + 1, ts)
          case l: Long => ps.setLong(i + 1, l)
          case bd: java.math.BigDecimal => ps.setBigDecimal(i + 1, bd)
          case s: String => ps.setString(i + 1, s)
          case other => ps.setObject(i + 1, other)
        }
      }
      ps.executeUpdate()
      ()
    } finally ps.close()
  }
}
