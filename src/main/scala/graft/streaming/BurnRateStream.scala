package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Online SLO error-budget burn-rate monitor — the streaming twin of
  * [[graft.operators.TimeSeriesOps.sloBurnRateOf]], on Spark 4's
  * `transformWithState` (same API stance as [[BudgetStream]] /
  * [[AnomalyStream]]: typed state handle + TTL, RocksDB state store).
  *
  * Semantics mirror the batch operator bucket for bucket: per service
  * key, each CLOSED hour emits its short-window burn (that hour's error
  * share over the budget) and long-window burn (trailing `longWin` hours
  * including the closed one), with the alert firing only when BOTH
  * exceed `alertMult`× — the two-window conjunction that pages on
  * sustained burn, not one bad minute. The batch operator's dense-grid
  * stance is preserved online: when an arriving event jumps past the
  * open hour, every skipped (empty) hour is closed as a (0, 0) bucket —
  * quiet hours burn 0 but still occupy their slot of the long window.
  * A bucket closes when the first event of a LATER hour arrives; events
  * for already-closed hours are dropped (the watermark analog — the
  * batch replay is what gets late data right, [[AnomalyStream]]'s
  * documented stance).
  *
  * Scale: state per service is `longWin − 1` (err, tot) pairs plus the
  * open bucket — independent of stream length; TTL reclaims services
  * that stop emitting. Burn arithmetic is the batch operator's exact
  * long half-up division, so a closed bucket's numbers are bit-equal to
  * the batch replay over the same events.
  */
object BurnRateStream {

  final case class ServiceEvent(service: String, ts_ms: Long, is_error: Boolean)

  /** A closed, scored hourly bucket. Burn ratios are quantized ppm longs
    * (1 000 000 = exactly on budget) — the batch operator's contract, so
    * the two surfaces stay bit-comparable with no float formatting.
    */
  final case class BurnBucket(
      service: String, bucket_ms: Long, n_events: Long, n_errors: Long,
      burn_short_ppm: Long, burn_long_ppm: Long, is_alert: Boolean)

  // state classes stay public: Encoders.product codegen emits Java that
  // calls the accessors directly, and a private nested case class forces
  // the interpreted-serde fallback on every state read/write
  final case class HistBucket(err: Long, tot: Long)
  final case class BurnState(
      openHour: Long, openErr: Long, openTot: Long, hist: Seq[HistBucket])

  private val HourMs = 3600000L

  /** Half-up long division (graft.operators.Num.halfUpDiv, JVM-side):
    * exact for the 10⁻⁶-ppm burn sums any real window produces (overflow
    * bound: err < 9.2e6 per window at the 1e12 scale factor — an hourly
    * error count past that is itself the alert).
    */
  private def halfUp(num: Long, den: Long): Long = (2 * num + den) / (2 * den)

  private class BurnProcessor(
      budgetPpm: Long, longWin: Int, alertMult: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, ServiceEvent, BurnBucket] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[BurnState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BurnState](
        "burn_ring", Encoders.product[BurnState], ttl)

    private def burnMicro(err: Long, tot: Long): Long =
      halfUp(1000000000000L * err, math.max(tot, 1L) * budgetPpm)

    /** Close the open bucket: emit its scored row, push it on the ring. */
    private def close(key: String, s: BurnState): (BurnBucket, BurnState) = {
      val window = (s.hist :+ HistBucket(s.openErr, s.openTot))
        .takeRight(longWin)
      val bs = burnMicro(s.openErr, s.openTot)
      val bl = burnMicro(window.map(_.err).sum, window.map(_.tot).sum)
      val alertMicro = alertMult * 1000000L
      val bucket = BurnBucket(key, s.openHour, s.openTot, s.openErr,
        bs, bl, bs >= alertMicro && bl >= alertMicro)
      (bucket, BurnState(s.openHour + HourMs, 0L, 0L,
        window.takeRight(longWin - 1)))
    }

    override def handleInputRows(
        service: String, rows: Iterator[ServiceEvent],
        timerValues: TimerValues): Iterator[BurnBucket] = {
      var s = if (st.exists()) st.get() else null
      val out = scala.collection.mutable.ArrayBuffer[BurnBucket]()
      // arrival order within a batch is nondeterministic post-shuffle;
      // event-time order makes replays and the batch twin agree
      rows.toSeq.sortBy(_.ts_ms).foreach { ev =>
        val hour = math.floorDiv(ev.ts_ms, HourMs) * HourMs
        if (s == null) s = BurnState(hour, 0L, 0L, Seq.empty)
        // close the open hour and every skipped empty hour (dense grid)
        while (s.openHour < hour) {
          val (bucket, next) = close(service, s)
          out += bucket
          s = next
        }
        if (hour == s.openHour) // late events for closed hours: dropped
          s = s.copy(openErr = s.openErr + (if (ev.is_error) 1L else 0L),
            openTot = s.openTot + 1L)
      }
      if (s != null) st.update(s)
      out.iterator
    }
  }

  /** Apply the burn monitor to a stream of [[ServiceEvent]] keyed by
    * service. Requires the RocksDB state store provider (a
    * transformWithState constraint).
    */
  def monitor(
      events: Dataset[ServiceEvent],
      budgetPpm: Long = 10000L,
      longWin: Int = 6,
      alertMult: Long = 2L,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[BurnBucket] = {
    require(budgetPpm >= 1 && longWin >= 1 && alertMult >= 1,
      s"invalid monitor config ($budgetPpm, $longWin, $alertMult)")
    import events.sparkSession.implicits._
    events.groupByKey(_.service)
      .transformWithState(
        new BurnProcessor(budgetPpm, longWin, alertMult, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
