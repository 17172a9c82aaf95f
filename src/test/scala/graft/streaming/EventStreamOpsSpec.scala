package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.EventStreamOps._

/** Watermarked windows + stateful sessionization driven via MemoryStream. */
class EventStreamOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds(minute * 60L))

  test("watermarked tumbling windows emit closed windows deterministically") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = windowedCounts(in.toDS(), lateness = "5 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      in.addData(
        Event(ts(10), 1, "click", 1.0),
        Event(ts(40), 1, "click", 2.0),
        Event(ts(50), 2, "error", 0.5))
      q.processAllAvailable()
      // watermark at :50 − 5min = :45 → hour-0 window [00:00,01:00) still open
      assert(spark.table("wc").count() === 0)
      // an event at 02:10 pushes the watermark past hour 1 → hour 0 closes
      in.addData(Event(ts(130), 3, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val h0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
      assert(rows === Set((h0, "click", 2L, 3.0), (h0, "error", 1L, 0.5)))
    } finally q.stop()
  }

  test("dedupStream drops repeats within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = dedupStream(in.toDS(), lateness = "5 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      in.addData(
        Event(ts(1), 1, "click", 1.0),
        Event(ts(1), 1, "click-copy", 9.9),  // same (user, ts) → duplicate
        Event(ts(1), 2, "click", 1.0),       // other user survives
        Event(ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(ts(1), 1, "late-dup", 0.0)) // still within watermark
      q.processAllAvailable()
      val rows = spark.table("dedup").as[Event].collect()
      assert(rows.length === 3)
      assert(rows.map(e => (e.user_id, e.ts.getTime)).toSet.size === 3)
    } finally q.stop()
  }

  test("stream-stream interval join pairs errors with prior clicks, time-bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = clicksBeforeErrors(in.toDS(), intervalMs = 5L * 60 * 1000,
        lateness = "1 minutes")
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      in.addData(
        Event(ts(0), 1, "click", 1.0),   // 8 min before the error → outside
        Event(ts(5), 1, "click", 1.0),   // 3 min before → inside
        Event(ts(7), 2, "click", 1.0),   // other user → excluded
        Event(ts(8), 1, "error", 0.0),
        Event(ts(9), 1, "click", 1.0))   // after the error → excluded
      q.processAllAvailable()
      // push both watermarks far ahead so the joined row is emitted
      in.addData(Event(ts(60), 3, "click", 0.0), Event(ts(60), 3, "error", 0.0))
      q.processAllAvailable()
      in.addData(Event(ts(120), 3, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains((1L, ts(8).getTime, ts(5).getTime)))
      assert(!rows.exists { case (u, _, c) => u == 1L && c != ts(5).getTime })
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: gap splits, timeout closes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapMs = 10L * 60 * 1000, lateness = "1 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // user 1: events at :00,:05 (one session), then :30 (new session after gap)
      in.addData(Event(ts(0), 1, "a", 0), Event(ts(5), 1, "b", 0))
      q.processAllAvailable()
      in.addData(Event(ts(30), 1, "c", 0))
      q.processAllAvailable()
      // first session closes as soon as state sees the out-of-gap event
      val afterSplit = spark.table("sess").as[Session].collect()
      assert(afterSplit.toSet === Set(Session(1, ts(0).getTime, ts(5).getTime, 2)))
      // advance watermark far ahead → the open session times out and closes
      in.addData(Event(ts(120), 2, "z", 0))
      q.processAllAvailable()
      in.addData(Event(ts(180), 2, "z2", 0)) // extra batch so the timeout fires
      q.processAllAvailable()
      val all = spark.table("sess").as[Session].collect().toSet
      assert(all.contains(Session(1, ts(30).getTime, ts(30).getTime, 1)))
    } finally q.stop()
  }

  test("funnelStream advances per-user state in order and matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = funnelStream(in.toDS(), lateness = "1 minutes")
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // u1 completes the first three steps across two batches; u2's
      // purchase arrives before any signup → no advance for u2
      in.addData(
        Event(ts(0), 1, "signup", 0), Event(ts(1), 1, "view", 0),
        Event(ts(2), 2, "purchase", 0))
      q.processAllAvailable()
      in.addData(
        Event(ts(3), 1, "click", 0),
        Event(ts(4), 1, "view", 0)) // repeat of a passed step: no advance
      q.processAllAvailable()
      val rows = spark.table("funnel_adv").as[FunnelAdvance].collect()
      assert(rows.filter(_.user_id == 2L).isEmpty)
      val u1 = rows.filter(_.user_id == 1L).sortBy(_.step)
      assert(u1.map(a => (a.step, a.step_type)).toSeq ===
        Seq((1, "signup"), (2, "view"), (3, "click")))
      // cross-batch persistence: the click advance must cite the batch-2 ts
      assert(u1.last.ts_ms === ts(3).getTime)
    } finally q.stop()
  }
}
