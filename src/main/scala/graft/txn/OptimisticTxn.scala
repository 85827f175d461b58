package graft.txn

/** Optimistic-concurrency retry around the log's create-no-overwrite
  * commit protocol. [[TxnLog.commit]] guarantees mutual exclusion per
  * version — a losing racer gets "concurrent commit: version v already
  * exists" — and every [[TableWriter]] operation reads
  * `snapshotLatest()` at invocation time. Re-invoking the WHOLE
  * operation against the fresh snapshot is therefore a serializable
  * retry: the loser's second attempt sees the winner's files, re-derives
  * its affected-file set, and produces the state a serial execution
  * would have produced. (Delta optimizes the common cases by REBASING
  * the prepared actions instead of re-executing — appends commute, and a
  * rewrite only needs re-execution when the interleaved commit touched
  * an overlapping file set. That optimization drops in here without
  * changing callers; correctness today comes from full re-execution,
  * which is the conservative end of the same protocol.)
  */
object OptimisticTxn {

  /** Run `op` at the next free version, retrying on commit collision.
    * `op` receives the version to commit as and must either commit at
    * exactly that version or throw. Returns the version that committed.
    */
  def retrying(
      log: TxnLog,
      maxRetries: Int = 10)(op: Long => Unit): Long = {
    var attempt = 0
    while (true) {
      val v = log.latestVersion().map(_ + 1).getOrElse(0L)
      try {
        op(v)
        return v
      } catch {
        case e: IllegalStateException
            if e.getMessage != null &&
              e.getMessage.startsWith("concurrent commit") =>
          attempt += 1
          if (attempt > maxRetries)
            throw new IllegalStateException(
              s"commit still colliding after $maxRetries retries at " +
                s"${log.tablePath} — livelock or a stuck writer", e)
          // tiny jittered backoff: losers re-read the log, not the data,
          // so contention cost is metadata-sized
          Thread.sleep(1L + scala.util.Random.nextInt(8))
      }
    }
    -1L // unreachable
  }
}
