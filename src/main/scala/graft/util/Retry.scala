package graft.util

/** Retry with exponential backoff (reference A-18,
  * src/clients/vector-client.ts:332-351: maxRetries=5, initialDelay
  * 500 ms, delay ×2 per attempt). Used by external-call connectors only —
  * Spark task retries (`spark.task.maxFailures`) cover task-level faults.
  */
object Retry {

  def withBackoff[T](
      maxRetries: Int = 5,
      initialDelayMs: Long = 500,
      sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    var delay = initialDelayMs
    while (true) {
      try return f
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
