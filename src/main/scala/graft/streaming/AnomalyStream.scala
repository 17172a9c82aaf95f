package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Online rolling z-score anomaly detection — the streaming twin of
  * [[graft.operators.TimeSeriesOps.anomalies]], on Spark 4's
  * `transformWithState` (same API stance as [[BudgetStream]]: typed state
  * handle + TTL, RocksDB state store).
  *
  * Semantics mirror the batch operator: per event type, each completed
  * hourly bucket is scored against the mean/variance of the `lookback`
  * preceding OBSERVED buckets (empty hours don't enter the ring, exactly
  * like the batch window over the bucket rollup), using the same
  * integer-sum formula and 4-dp rounding — so a closed bucket's score is
  * the number the batch replay would produce. A bucket closes when the
  * first event of a LATER hour arrives; events for already-closed hours
  * are dropped (the watermark analog — an online monitor can't un-ring an
  * alert; the batch operator is the replay that gets late data right).
  *
  * Scale: state per event type is `lookback` longs plus the open bucket —
  * independent of stream length; TTL reclaims types that stop emitting.
  */
object AnomalyStream {

  final case class TypedEvent(event_type: String, ts_ms: Long)

  /** A closed, scored bucket. `z` is None while variance is 0. */
  final case class ScoredBucket(
      event_type: String, bucket_ms: Long, n: Long,
      mean_n: Double, z: Option[Double], is_anomaly: Boolean)

  final case class RingState(curHour: Long, curCount: Long, history: Seq[Long])

  private val HourMs = 3600000L

  private def rnd4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private class AnomalyProcessor(lookback: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, TypedEvent, ScoredBucket] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[RingState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RingState]("ring", Encoders.product[RingState], ttl)

    private def score(key: String, s: RingState): Option[ScoredBucket] =
      if (s.history.size < lookback) None
      else {
        // identical arithmetic to the batch operator: exact integer sums
        // combined in one double expression
        val c = lookback.toDouble
        val sum = s.history.sum.toDouble
        val sq = s.history.map(x => x * x).sum.toDouble
        val mean = sum / c
        val vr = (sq - sum * sum / c) / (c - 1)
        val z = if (vr > 0) Some(rnd4((s.curCount - mean) / math.sqrt(vr))) else None
        Some(ScoredBucket(key, s.curHour, s.curCount, rnd4(mean), z,
          z.exists(v => math.abs(v) >= 3d)))
      }

    override def handleInputRows(
        key: String, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[ScoredBucket] = {
      var s = if (st.exists()) st.get() else RingState(Long.MinValue, 0L, Nil)
      val out = Seq.newBuilder[ScoredBucket]
      // post-shuffle arrival order is nondeterministic; ts order makes
      // replays and tests reproducible (same stance as BudgetStream)
      rows.toSeq.sortBy(_.ts_ms).foreach { e =>
        val h = Math.floorDiv(e.ts_ms, HourMs) * HourMs
        if (h == s.curHour) s = s.copy(curCount = s.curCount + 1)
        else if (h > s.curHour) {
          if (s.curHour != Long.MinValue) {
            score(key, s).foreach(out += _)
            s = RingState(h, 1L, (s.history :+ s.curCount).takeRight(lookback))
          } else s = RingState(h, 1L, Nil)
        }
        // h < curHour: late event for a closed bucket — dropped
      }
      st.update(s)
      out.result().iterator
    }
  }

  /** Score completed hourly buckets of a typed event stream. Requires the
    * RocksDB state store provider (a transformWithState constraint).
    */
  def detect(
      events: Dataset[TypedEvent],
      lookback: Int = 24,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[ScoredBucket] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(
        new AnomalyProcessor(lookback, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
