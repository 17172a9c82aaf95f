package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.BurnRateStream._

/** transformWithState burn-rate monitor driven via MemoryStream, checked
  * decision-for-decision against the batch operator on the same events
  * (the DocStreamOps stance: the stream IS the batch semantics, minus
  * the still-open trailing hour).
  */
class BurnRateStreamSpec extends SparkSpec {

  private val H = 3600000L
  private val T0 = 1700000000000L / H * H // hour-aligned epoch base

  // hour 0: 10% errors (burn 10x) · hour 1: quiet-but-present (0 errors)
  // hours 2-3: EMPTY (dense-grid gap) · hour 4: 50% errors (burn 50x)
  // hour 5: closes hour 4; stays open (not emitted)
  private def events: Seq[ServiceEvent] =
    (0 until 10).map(i => ServiceEvent("api", T0 + i * 1000L, i == 0)) ++
      (0 until 5).map(i => ServiceEvent("api", T0 + H + i * 1000L, false)) ++
      (0 until 4).map(i => ServiceEvent("api", T0 + 4 * H + i * 1000L, i % 2 == 0)) ++
      Seq(ServiceEvent("api", T0 + 5 * H, false))

  test("closed buckets equal the batch dense-grid burn rates, incl. empty hours") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[ServiceEvent]
    val q = monitor(in.toDS(), budgetPpm = 10000L)
      .writeStream.format("memory").queryName("burn")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      val (first, rest) = events.splitAt(7) // split mid-hour across batches
      in.addData(first: _*)
      q.processAllAvailable()
      in.addData(rest: _*)
      q.processAllAvailable()
      val got = spark.table("burn").as[BurnBucket].collect()
        .sortBy(_.bucket_ms)

      val batch = graft.operators.TimeSeriesOps.sloBurnRateOf(
        events.toDF("service", "ts_ms", "is_error")
          .select(timestamp_millis(col("ts_ms")).as("ts"),
            when(col("is_error"), "error").otherwise("click").as("event_type")))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))))
        .toMap

      assert(got.map(_.bucket_ms).toSeq ===
        (0 until 5).map(i => T0 + i * H)) // all closed hours, open one absent
      got.foreach { b =>
        val (tot, err, bs, bl, alert) = batch(b.bucket_ms)
        assert(b.n_events === tot, s"tot @${b.bucket_ms}")
        assert(b.n_errors === err, s"err @${b.bucket_ms}")
        assert(b.burn_short_ppm === bs, s"burn_short_ppm @${b.bucket_ms}")
        assert(b.burn_long_ppm === bl, s"burn_long_ppm @${b.bucket_ms}")
        assert(b.is_alert === alert, s"alert @${b.bucket_ms}")
      }
      // semantics spot-checks: hour 0 burns 10x (alert), empty hours burn 0,
      // hour 4's long window spans the gap
      assert(got(0).burn_short_ppm === 10000000L && got(0).is_alert)
      assert(got(2).n_events === 0L && got(2).burn_short_ppm === 0L)
      assert(got(4).burn_short_ppm === 50000000L && got(4).is_alert)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
