package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.TimeSeriesOps
import graft.streaming.AnomalyStream._

/** Streaming anomaly detector: cross-batch ring persistence, late-event
  * drop, and score-for-score parity with the batch operator on the same
  * events.
  */
class AnomalyStreamSpec extends SparkSpec {

  private val HourMs = 3600000L

  // hours 0..5 counts 3,5,3,5,9,4; hour 6 holds one sentinel that closes 5
  private val counts = Seq(3, 5, 3, 5, 9, 4, 1)
  private def eventsFor(hours: Range): Seq[TypedEvent] =
    hours.flatMap(h => (0 until counts(h)).map(i =>
      TypedEvent("error", h * HourMs + i * 1000L)))

  test("closed buckets score exactly like the batch operator; state spans batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TypedEvent]
    val q = detect(in.toDS(), lookback = 4)
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      in.addData(eventsFor(0 to 3))
      q.processAllAvailable()
      // ring survives the batch boundary; a late hour-0 event must be dropped
      in.addData(eventsFor(4 to 6) :+ TypedEvent("error", 1000L))
      q.processAllAvailable()
      val got = spark.table("anom").as[ScoredBucket].collect()
        .map(b => b.bucket_ms -> b).toMap

      // only hours 4 and 5 close with a full 4-bucket history
      assert(got.keySet === Set(4 * HourMs, 5 * HourMs))
      val h4 = got(4 * HourMs)
      assert(h4.n === 9L && h4.mean_n === 4.0)
      assert(h4.z.exists(z => math.abs(z - 5.0 / math.sqrt(4.0 / 3)) < 5e-4))
      assert(h4.is_anomaly)
      val h5 = got(5 * HourMs)
      assert(h5.n === 4L && h5.mean_n === 5.5 && !h5.is_anomaly)

      // parity: the batch operator on the same events produces the same
      // numbers for the buckets the stream closed
      val batchDf = eventsFor(0 to 6).toDF("event_type", "ts_ms")
        .select(col("event_type"), timestamp_millis(col("ts_ms")).as("ts"))
      val batch = TimeSeriesOps.anomaliesOf(batchDf, lookback = 4).collect()
        .map(r => r.getAs[Long]("bucket_ms") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("mean_n"),
            Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue()),
            r.getAs[Boolean]("is_anomaly")))).toMap
      for (h <- Seq(4L * HourMs, 5L * HourMs)) {
        val s = got(h)
        assert(batch(h) === ((s.n, s.mean_n, s.z, s.is_anomaly)), s"bucket $h diverged")
      }
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ring state survives a checkpointed query RESTART") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-anom-ckpt").toString
    val in = MemoryStream[TypedEvent]
    // memory sink can't recover from a checkpoint; foreachBatch can
    val sunk = new java.util.concurrent.ConcurrentLinkedQueue[ScoredBucket]()
    def start() = detect(in.toDS(), lookback = 4)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ScoredBucket], _: Long) =>
        batch.collect().foreach(sunk.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      val q1 = start()
      in.addData(eventsFor(0 to 3)) // fills the ring: closed buckets 0..2
      q1.processAllAvailable()
      q1.stop()
      // a NEW query from the same checkpoint must still hold hours 0..3
      val q2 = start()
      try {
        in.addData(eventsFor(4 to 6))
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val got = sunk.asScala.map(b => b.bucket_ms -> b).toMap
        // hour 4 scores against the PRE-RESTART history 3,5,3,5
        assert(got.contains(4 * HourMs), s"ring lost across restart: ${got.keys}")
        assert(got(4 * HourMs).mean_n === 4.0) // mean of pre-restart 3,5,3,5
        assert(got(4 * HourMs).is_anomaly)
      } finally q2.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
