package graft.enrich

import java.sql.Timestamp
import java.util.UUID

import graft.SparkSpecBase

/** S22: one monitor row per stage run, with cost/token fields that match
  * the drained CostMeter and a schema-shaped llm_calls payload. */
class ProcessMonitorSpec extends SparkSpecBase {

  private def runStage(): CostMeter = {
    import spark.implicits._
    val meter = new CostMeter(spark)
    val metered = new MeteredEnricher(new DeterministicEnricher(8), meter)
    val docs = Seq((1L, "alpha beta. gamma delta."), (2L, "epsilon zeta."))
      .toDS()
    graft.ops.EnrichStages.describeDocuments(docs, metered).count()
    meter
  }

  test("fromMeter: one row per stage run with cost/token fields") {
    val meter = runStage()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 10:00:42")
    val log = ProcessMonitor.fromMeter(meter, UUID.randomUUID(), "graft",
      "stage3_generate_summaries", t0, t1, "Success")

    assert(log.durationMs == 42000L)
    assert(log.totalTokens ==
      meter.promptTokens.value + meter.completionTokens.value +
        meter.embedTokens.value)
    assert(log.totalCostUsd ==
      BigDecimal(meter.costUsd).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    // call counts are execution-count dependent (Spark may re-evaluate a
    // partition) — the monitor row's contract is consistency with the
    // DRAINED meter, not a specific plan shape
    assert(meter.chatCalls.value > 0L && meter.embedCalls.value > 0L)

    // llm_calls follows the schema comment's shape: one aggregated chat
    // entry, one embedding entry
    assert(log.llmCallsJson.startsWith("[{\"model\": \"graft-chat\""))
    assert(log.llmCallsJson.contains("\"model\": \"graft-embedding\""))
    assert(log.llmCallsJson.contains(
      s""""input_tokens": ${meter.promptTokens.value}"""))
    assert(log.llmCallsJson.contains(
      s""""output_tokens": ${meter.completionTokens.value}"""))
  }

  test("insertSql + bindValues: schema columns in bind order") {
    val sql = ProcessMonitor.insertSql("process_monitor_logs")
    assert(sql.contains("INSERT INTO process_monitor_logs"))
    Seq("run_uuid", "model_name", "stage_name", "stage_start_time",
      "stage_end_time", "duration_ms", "llm_calls", "total_tokens",
      "total_cost", "status", "decision_details", "error_message")
      .foreach(c => assert(sql.contains(c), s"missing column $c"))
    assert(sql.contains("?::jsonb") && sql.contains("?::uuid"))
    assert(sql.count(_ == '?') == 12)

    val meter = runStage()
    val log = ProcessMonitor.fromMeter(meter, UUID.randomUUID(), "graft",
      "stage1", Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-01-01 10:00:01"), "Success")
    val binds = ProcessMonitor.bindValues(log)
    assert(binds.length == 12)
    assert(binds(1) == "graft" && binds(2) == "stage1")
    assert(binds(7) == log.totalTokens)
    assert(binds(9) == "Success")
    assert(binds(10) == null && binds(11) == null)

    // unsafe table names are rejected before reaching SQL
    intercept[IllegalArgumentException] {
      ProcessMonitor.insertSql("logs; DROP TABLE x")
    }
  }
}
