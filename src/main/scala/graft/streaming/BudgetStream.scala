package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Online token-budget admission via Spark 4's `transformWithState` — the
  * arbitrary-state API that supersedes flatMapGroupsWithState (typed state
  * handles, per-state TTL, timers decoupled from watermarks, RocksDB-only
  * state store). The engine keeps both: the older API on the session/
  * near-dup paths ([[EventStreamOps.sessionize]], [[DocStreamOps]])
  * because it runs on any state store, and this operator on the new one.
  *
  * Semantics: the streaming half of
  * [[graft.operators.TrainPrepOps.tokenBudget]] — documents stream in per
  * source shard; each is admitted while the shard's cumulative token count
  * is under budget. Admission is arrival-order greedy (an online gate
  * cannot sort the future by quality; the batch operator does the
  * quality-ordered version over a closed corpus).
  *
  * Scale: state per source shard is ONE long — the cumulative counter —
  * so the state store holds #shards × 8 bytes regardless of stream
  * length; a TTL reclaims shards that stop producing.
  */
object BudgetStream {

  /** Incoming doc (token count precomputed upstream, e.g. by the curation
    * transform). */
  final case class DocTokens(doc_id: Long, source: String, n_tokens: Long)

  /** Admission verdict: cum_tokens is the shard's total AFTER this doc. */
  final case class Admission(
      doc_id: Long, source: String, n_tokens: Long, cum_tokens: Long, admitted: Boolean)

  private class BudgetProcessor(budget: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, DocTokens, Admission] {
    @transient private var cum: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum_tokens", Encoders.scalaLong, ttl)

    override def handleInputRows(
        source: String, rows: Iterator[DocTokens],
        timerValues: TimerValues): Iterator[Admission] = {
      var c = if (cum.exists()) cum.get() else 0L
      // arrival order within a batch is nondeterministic post-shuffle;
      // doc_id order makes replays and tests reproducible
      val out = rows.toSeq.sortBy(_.doc_id).map { doc =>
        val admitted = c < budget
        if (admitted) c += doc.n_tokens
        Admission(doc.doc_id, source, doc.n_tokens, c, admitted)
      }
      cum.update(c)
      out.iterator
    }
  }

  /** Apply the budget gate to a stream of [[DocTokens]] keyed by source.
    * Requires the RocksDB state store provider (a transformWithState
    * constraint):
    * `spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`.
    */
  def admit(
      docs: Dataset[DocTokens],
      budget: Long,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Admission] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(
        new BudgetProcessor(budget, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
