package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.BudgetStream._

/** transformWithState budget gate driven via MemoryStream (RocksDB state
  * store — a transformWithState requirement).
  */
class BudgetStreamSpec extends SparkSpec {

  test("budget gate admits per-source until the budget is crossed, across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[DocTokens]
    val q = admit(in.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("budget")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      in.addData(
        DocTokens(1, "a", 60), DocTokens(2, "a", 30),
        DocTokens(1, "b", 90))
      q.processAllAvailable()
      // batch 2: a is at 90 (< 100) → doc 3 admitted, pushing it past
      // budget; doc 4 then rejected. b is at 90 → doc 5 admitted.
      in.addData(
        DocTokens(3, "a", 50), DocTokens(4, "a", 10),
        DocTokens(5, "b", 40), DocTokens(6, "b", 1))
      q.processAllAvailable()
      val rows = spark.table("budget").as[Admission].collect()
        .map(a => (a.source, a.doc_id) -> ((a.cum_tokens, a.admitted))).toMap
      assert(rows(("a", 1L)) === ((60L, true)))
      assert(rows(("a", 2L)) === ((90L, true)))
      assert(rows(("a", 3L)) === ((140L, true)))  // crossed the line while open
      assert(rows(("a", 4L)) === ((140L, false))) // gate now closed
      assert(rows(("b", 1L)) === ((90L, true)))
      assert(rows(("b", 5L)) === ((130L, true)))
      assert(rows(("b", 6L)) === ((130L, false)))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
