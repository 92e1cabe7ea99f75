package graft.wallet

/** Retry wrapper mirroring the reference's Airflow task policy
  * (`retries=1, retry_delay=5min` — ref `dags/s3-etl-wallet-csv.py:38-39`).
  * Safe to apply around whole jobs because every sink in this engine is
  * idempotent (overwrite semantics / append-to-fresh-table), per
  * SURVEY.md §2.8: scheduling is a thin loop around idempotent jobs,
  * not engine code. */
object Retry {
  def withRetry[T](retries: Int, delayMs: Long)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if attempt < retries =>
          attempt += 1
          System.err.println(
            s"[retry] attempt $attempt/$retries after failure: ${e.getMessage}; sleeping ${delayMs}ms")
          Thread.sleep(delayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
