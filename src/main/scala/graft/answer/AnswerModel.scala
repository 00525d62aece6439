package graft.answer

import graft.util.Retry

/** Pluggable LLM seam (A-17, reference `getAnswer`,
  * src/clients/vector-client.ts:424-489). The engine's deterministic core
  * ends at the assembled prompt ([[graft.query.ContextAssembler]]); the
  * chat call is a driver-side connector behind this trait, exactly like
  * the reference's ConversationChain boundary — and like the reference,
  * a failed call yields None rather than an exception
  * (vector-client.ts:483-488 returns undefined).
  */
trait AnswerModel extends Serializable {
  def answer(prompt: String): Option[String]
}

/** Deterministic default for tests and offline runs. */
final class EchoAnswerModel extends AnswerModel {
  override def answer(prompt: String): Option[String] =
    Some("ECHO: " + prompt.linesIterator.take(2).mkString(" | "))
}

/** Production skeleton: wraps an injected chat transport with the
  * reference's retry policy (2 retries at 1 s, vector-client.ts:478-482).
  */
final class RetryingAnswerModel(
    call: String => String,
    maxRetries: Int = 2,
    delayMs: Long = 1000) extends AnswerModel {
  override def answer(prompt: String): Option[String] =
    try Some(Retry.withBackoff(maxRetries, delayMs)(call(prompt)))
    catch { case _: Throwable => None }
}
