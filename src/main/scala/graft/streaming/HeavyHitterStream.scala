package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.functions.HeavyHitters.{HHState, SpaceSaving}

/** Online heavy-hitters — the streaming twin of the batch Space-Saving
  * aggregator ([[graft.functions.HeavyHitters]]), completing the
  * batch/stream pairing the engine keeps throughout (curate, anomaly,
  * funnel, templates, near-dup). Per shard (source, language, tenant) the
  * processor maintains ONE bounded sketch and emits a `Promotion` row the
  * first time a term is PROVEN heavy — its lower-bound count
  * (`count − err`, the Space-Saving guarantee) exceeds `1/denom` of the
  * shard's stream so far. "Term X just became a top-1/denom term in
  * shard Y" is the alert form of the batch top-k report: append-mode
  * friendly, exactly-once per (shard, term).
  *
  * Folding reuses the batch aggregator's `reduce` verbatim, so a shard
  * processed in one batch carries the identical summary the batch
  * operator computes on one partition; with capacity ≥ the shard's
  * distinct-term count the sketch degenerates to exact counting and the
  * stream's counts equal the batch `groupBy` exactly (the parity spec).
  *
  * State per shard: `m` sketch entries + one long + the promoted-term
  * set (≤ m entries live; promoted terms outside the sketch stay only in
  * the map) — independent of stream length; TTL reclaims idle shards.
  */
object HeavyHitterStream {

  /** One observed term occurrence; `seq` makes replay order stable. */
  final case class TermObs(shard: String, term: String, seq: Long)

  /** First proof that `term` holds > 1/denom of `shard`'s stream:
    * `est_count` overestimates the true count by at most `err`.
    */
  final case class Promotion(
      shard: String, term: String, est_count: Long, err: Long, n_total: Long)

  final case class SketchState(
      terms: Seq[String], counts: Seq[Long], errs: Seq[Long], total: Long)

  private class HHProcessor(m: Int, denom: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, TermObs, Promotion] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[SketchState] = _
    @transient private var promoted: org.apache.spark.sql.streaming.MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[SketchState](
        "sketch", Encoders.product[SketchState], ttl)
      promoted = getHandle.getMapState[String, Boolean](
        "promoted", Encoders.STRING, Encoders.scalaBoolean, ttl)
    }

    override def handleInputRows(
        shard: String, rows: Iterator[TermObs],
        timerValues: TimerValues): Iterator[Promotion] = {
      val agg = new SpaceSaving(m)
      val prev = if (st.exists()) st.get() else SketchState(Nil, Nil, Nil, 0L)
      val buf = HHState(
        prev.terms.lazyZip(prev.counts).lazyZip(prev.errs)
          .map(graft.functions.HeavyHitters.HHEntry.apply).toVector)
      var total = prev.total
      // seq order: replay-stable folding (the batch aggregator's
      // partition-order sensitivity is inherent to Space-Saving; pinning
      // seq order makes THIS stream's summary reproducible)
      rows.toSeq.sortBy(_.seq).foreach { o =>
        agg.reduce(buf, o.term)
        total += 1
      }
      st.update(SketchState(
        buf.entries.map(_.term), buf.entries.map(_.count),
        buf.entries.map(_.err), total))
      val threshold = total / denom
      buf.entries
        .filter(e => e.count - e.err > threshold)
        .sortBy(e => (-(e.count - e.err), e.term))
        .filter(e => !promoted.containsKey(e.term))
        .map { e =>
          promoted.updateValue(e.term, true)
          Promotion(shard, e.term, e.count, e.err, total)
        }
        .iterator
    }
  }

  /** Emit one promotion per (shard, term) when the term is first PROVEN
    * to hold > 1/denom of the shard's stream. Requires the RocksDB state
    * store provider (a transformWithState constraint).
    */
  def promotions(
      terms: Dataset[TermObs],
      m: Int = 100,
      denom: Int = 10,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Promotion] = {
    import terms.sparkSession.implicits._
    terms.groupByKey(_.shard)
      .transformWithState(
        new HHProcessor(m, denom, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
