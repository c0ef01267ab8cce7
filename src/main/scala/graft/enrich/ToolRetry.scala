package graft.enrich

import com.fasterxml.jackson.databind.ObjectMapper

/** L1: strict tool-enforcement retry state machine, the reference's most
  * exercised call path (`semantic search/stage_01_chapter_processing.py:
  * 419-503`; identical shape in stage_02:1430-1530).
  *
  * Semantics reproduced exactly (PromptParitySpec asserts the attempt
  * trace against goldens from running the reference with a scripted fake
  * client):
  *   - up to 5 attempts (`TOOL_RESPONSE_RETRIES`);
  *   - attempts after the first insert an enforcement system message
  *     BEFORE the last message (`messages[:-1] + [enforcement] + [last]`);
  *   - wrong tool / no tool call / malformed JSON / missing-or-empty
  *     required field → sleep 3 s (`TOOL_RESPONSE_RETRY_DELAY`) and retry;
  *   - API errors → exponential backoff `3 * 2^min(attempt, 3)` s;
  *   - the sleep happens on EVERY failed attempt, including the last.
  *
  * Pure control flow: the transport is injected as `call`, the clock as
  * `sleep`, so the machine is unit-testable without any network.
  */
object ToolRetry {

  val MaxAttempts = 5
  val RetryDelaySec = 3

  /** Outcome of one transport call, as seen by the state machine. */
  sealed trait Attempt
  /** The model called a tool (possibly the wrong one / bad arguments). */
  final case class ToolCall(name: String, argumentsJson: String) extends Attempt
  /** The model answered in plain text. */
  case object NoToolCall extends Attempt
  /** Transport-level API error — backs off exponentially. */
  final case class ApiError(message: String) extends Attempt
  /** Any other unexpected error — flat retry delay. */
  final case class OtherError(message: String) extends Attempt

  /** Final result: validated arguments (None = retries exhausted), the
    * sleep schedule actually taken, and the attempt count. */
  final case class Result(args: Option[Map[String, String]],
      sleptSec: Vector[Int], attempts: Int)

  def enforcementMessage(toolName: String): ChatMessage =
    ChatMessage("system",
      s"CRITICAL: You MUST use the '$toolName' tool to provide your response. Do not respond with plain text.")

  /** Messages for the given attempt: the enforcement message is inserted
    * before the last message on every retry. */
  def enhanced(messages: Seq[ChatMessage], toolName: String,
      attempt: Int): Seq[ChatMessage] =
    if (attempt == 0) messages
    else messages.dropRight(1) ++
      Seq(enforcementMessage(toolName), messages.last)

  private val mapper = new ObjectMapper

  /** Parse tool arguments and require every `required` field present and
    * non-empty (the reference's python-truthiness check). Returns all
    * top-level string fields on success. */
  private[enrich] def validArgs(argumentsJson: String,
      required: Seq[String]): Option[Map[String, String]] =
    try {
      val node = mapper.readTree(argumentsJson)
      if (node == null || !node.isObject) None
      else {
        val missing = required.exists { f =>
          val v = node.get(f)
          v == null || !v.isTextual || v.asText.isEmpty
        }
        if (missing) None
        else {
          import scala.jdk.CollectionConverters._
          Some(node.properties().asScala
            .filter(_.getValue.isTextual)
            .map(e => e.getKey -> e.getValue.asText).toMap)
        }
      }
    } catch { case _: Exception => None }

  /** Run the retry loop. `call` receives the (possibly enforcement-
    * enhanced) messages for each attempt. */
  def run(messages: Seq[ChatMessage], toolName: String,
      required: Seq[String], call: Seq[ChatMessage] => Attempt,
      sleep: Int => Unit = _ => ()): Result = {
    require(messages.nonEmpty, "messages list is empty")
    var slept = Vector.empty[Int]
    def pause(sec: Int): Unit = { slept :+= sec; sleep(sec) }
    var attempt = 0
    while (attempt < MaxAttempts) {
      val outcome =
        try call(enhanced(messages, toolName, attempt))
        catch { case e: Exception => OtherError(e.getMessage) }
      outcome match {
        case ToolCall(name, args) if name == toolName =>
          validArgs(args, required) match {
            case Some(a) => return Result(Some(a), slept, attempt + 1)
            case None => pause(RetryDelaySec)
          }
        case ToolCall(_, _) => pause(RetryDelaySec)
        case NoToolCall => pause(RetryDelaySec)
        case ApiError(_) => pause(RetryDelaySec * (1 << math.min(attempt, 3)))
        case OtherError(_) => pause(RetryDelaySec)
      }
      attempt += 1
    }
    Result(None, slept, MaxAttempts)
  }
}
