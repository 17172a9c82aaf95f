package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.streaming.DriftStream._

/** transformWithState drift monitor driven via MemoryStream, checked
  * row-for-row against the batch TVD operator on the same corpus (the
  * BurnRateStream stance: latest emission per source IS the batch
  * verdict).
  */
class DriftStreamSpec extends SparkSpec {

  test("latest drift row per source equals the batch operator, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val docsDf = Tables.documents(spark, sf0001)
    val scored = docsDf.select(col("source"), col("doc_id"),
        round(graft.operators.CurationOps.qualityCol * 1e4, 0).cast("long")
          .as("q4"))
      .as[DocQuality].collect().toSeq
    val ids = scored.map(_.doc_id)
    val boundary = Math.floorDiv(ids.min + ids.max, 2L)

    val in = MemoryStream[DocQuality]
    val q = monitor(in.toDS(), boundary)
      .writeStream.format("memory").queryName("drift")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // three uneven batches, shuffled order — accumulation must commute
      val shuffled = scored.sortBy(d => (d.q4 * 31 + d.doc_id) % 101)
      val (b1, rest) = shuffled.splitAt(shuffled.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
      // latest emission per source (MemoryStream sink preserves batch order)
      val emitted = spark.table("drift").as[DriftRow].collect()
      val latest = emitted.zipWithIndex
        .groupBy(_._1.source).map { case (_, v) => v.maxBy(_._2)._1 }
        .toSeq.sortBy(_.source)

      val batch = graft.operators.TrainPrepOps.qualityDriftOf(docsDf).collect()
        .map(r => DriftRow(r.getAs[String]("source"),
          r.getAs[Long]("n_early"), r.getAs[Long]("n_late"),
          r.getAs[Double]("tvd"), r.getAs[Int]("top_shift_bucket"),
          r.getAs[Double]("top_shift")))
        .sortBy(_.source)

      assert(latest.length === batch.length)
      latest.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally q.stop()
  }

  test("sources emit only when touched; single-half sources score zero shares") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[DocQuality]
    val q = monitor(in.toDS(), boundaryId = 100L)
      .writeStream.format("memory").queryName("drift2")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      in.addData(DocQuality("a", 1L, 5000L)) // early half only
      q.processAllAvailable()
      val r1 = spark.table("drift2").as[DriftRow].collect()
      assert(r1.length === 1)
      // all mass in one (empty-late) half: late shares are zero, TVD is
      // half the early mass = 0.5, the shift sits on q4=5000's decile
      assert(r1.head === DriftRow("a", 1L, 0L, 0.5, 5, -1.0))
      in.addData(DocQuality("b", 200L, 9999L)) // late half, new source
      q.processAllAvailable()
      val r2 = spark.table("drift2").as[DriftRow].collect()
      assert(r2.length === 2, "source a must not re-emit untouched")
    } finally q.stop()
  }
}
