package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Online log-template discovery — the streaming half of
  * [[graft.operators.LogOps.templates]]: as lines stream in per container,
  * each is masked to its template (same digit-run rule as the batch
  * operator) and an alert row is emitted the FIRST time a container
  * produces a template never seen from it before. "A new log pattern
  * appeared" is the highest-signal alert a log pipeline emits — new error
  * shapes, new code paths, new abuse patterns all announce themselves as
  * novel templates.
  *
  * State: one MapState per container keyed by template — bounded by the
  * template vocabulary BY CONSTRUCTION (masking exists to collapse line
  * cardinality), not by stream length; TTL reclaims containers that stop
  * logging. Uses `transformWithState` (same stance as [[BudgetStream]] /
  * [[AnomalyStream]]).
  */
object TemplateStream {

  final case class LogLine(container_id: String, seq: Long, ts_ms: Long, line: String)

  /** First sighting of a template on a container. */
  final case class NewTemplate(
      container_id: String, template: String, first_seq: Long, first_ms: Long)

  /** The batch operator's masking rule, verbatim. */
  def mask(line: String): String = line.replaceAll("[0-9]+", "<N>")

  private class TemplateProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, LogLine, NewTemplate] {
    @transient private var seen: org.apache.spark.sql.streaming.MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[String, Boolean](
        "seen_templates", Encoders.STRING, Encoders.scalaBoolean, ttl)

    override def handleInputRows(
        container: String, rows: Iterator[LogLine],
        timerValues: TimerValues): Iterator[NewTemplate] = {
      // seq order: "first sighting" must be replay-stable, not
      // shuffle-arrival-stable
      rows.toSeq.sortBy(_.seq).iterator.flatMap { l =>
        val t = mask(l.line)
        if (seen.containsKey(t)) Iterator.empty
        else {
          seen.updateValue(t, true)
          Iterator.single(NewTemplate(container, t, l.seq, l.ts_ms))
        }
      }
    }
  }

  /** Emit one alert per (container, template) first sighting. Requires the
    * RocksDB state store provider (a transformWithState constraint).
    */
  def firstSightings(
      lines: Dataset[LogLine],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[NewTemplate] = {
    import lines.sparkSession.implicits._
    lines.groupByKey(_.container_id)
      .transformWithState(
        new TemplateProcessor(ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
