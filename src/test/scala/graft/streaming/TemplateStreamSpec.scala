package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.LogOps
import graft.streaming.TemplateStream._

/** Online template discovery: first-sighting alerts only, per-container
  * isolation, cross-batch memory, and masking parity with the batch
  * operator.
  */
class TemplateStreamSpec extends SparkSpec {

  test("alerts fire once per (container, template), with cross-batch memory") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[LogLine]
    val q = firstSightings(in.toDS())
      .writeStream.format("memory").queryName("tmpl")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      in.addData(
        LogLine("c1", 1, 1000, "GET /api/user/123 took 45ms"),
        LogLine("c1", 2, 2000, "GET /api/user/99 took 3ms"),
        LogLine("c1", 3, 3000, "connection lost"),
        LogLine("c2", 1, 1000, "GET /api/user/7 took 9ms"))
      q.processAllAvailable()
      // batch 2: same templates again (silent) + one genuinely new shape
      in.addData(
        LogLine("c1", 4, 4000, "GET /api/user/1000 took 800ms"),
        LogLine("c1", 5, 5000, "OOM killed pid 4242"))
      q.processAllAvailable()
      val got = spark.table("tmpl").as[NewTemplate].collect()
        .map(t => (t.container_id, t.template) -> ((t.first_seq, t.first_ms))).toMap

      // c1: api template (seq 1), connection lost (seq 3), OOM (seq 5);
      // c2 sights the api template independently
      assert(got.keySet === Set(
        ("c1", "GET /api/user/<N> took <N>ms"),
        ("c1", "connection lost"),
        ("c1", "OOM killed pid <N>"),
        ("c2", "GET /api/user/<N> took <N>ms")))
      assert(got(("c1", "GET /api/user/<N> took <N>ms")) === ((1L, 1000L)))
      assert(got(("c1", "OOM killed pid <N>")) === ((5L, 5000L)))

      // masking parity with the batch operator on the same lines
      import spark.implicits._
      val lines = Seq(
        (0L, 1L, 0L, "GET /api/user/123 took 45ms"),
        (0L, 2L, 0L, "connection lost"),
        (0L, 3L, 0L, "OOM killed pid 4242"))
        .toDF("c", "seq", "ts_nano", "line")
      val batchTemplates = LogOps.templates(lines, "c", "seq", "ts_nano", col("line"))
        .collect().map(_.getAs[String]("template")).toSet
      assert(batchTemplates ===
        got.keySet.collect { case ("c1", t) => t })
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
