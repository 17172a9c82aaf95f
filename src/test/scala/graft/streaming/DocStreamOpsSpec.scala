package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.DocStreamOps._

/** Streaming MinHash/LSH near-dup tagging: near-repeats are tagged against
  * the recent-state window, distinct docs are not, and bucket state expires
  * on the event-time TTL.
  */
class DocStreamOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds(minute * 60L))

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest to hide from every hunter"

  test("near-repeat is tagged, distinct doc is not, expired bucket forgets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Doc]
    val q = nearDupTags(in.toDS(), minEst = 0.5,
      lateness = "1 minute", bucketTtlMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("dup_tags")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      in.addData(
        Doc(ts(0), 1L, base),
        Doc(ts(1), 2L, base + " with one tiny extra clause appended"),
        Doc(ts(2), 3L, "completely different text about spark catalyst " +
          "optimizer rules and whole stage code generation pipelines today"))
      q.processAllAvailable()
      val tags = spark.table("dup_tags").as[DupTag].collect()
      assert(tags.nonEmpty, "near-identical doc 2 must collide with doc 1")
      assert(tags.map(t => (t.doc_id, t.dup_of)).distinct.toSeq == Seq((2L, 1L)))
      assert(tags.forall(_.est_jaccard >= 0.5))

      // advance event time far past the TTL: buckets for docs 1-3 expire,
      // so a later near-copy of doc 1 has nothing to match against
      in.addData(Doc(ts(90), 4L, "watermark advancing filler text that " +
        "matches nothing else in this stream at all even slightly today"))
      q.processAllAvailable()
      in.addData(Doc(ts(95), 5L, base))
      q.processAllAvailable()
      val after = spark.table("dup_tags").as[DupTag].collect()
      assert(!after.exists(_.doc_id == 5L),
        "doc 5 arrived after the bucket TTL — state must be gone")
    } finally q.stop()
  }

  test("short documents (no shingles) pass through untagged, no crash") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Doc]
    val q = nearDupTags(in.toDS())
      .writeStream.format("memory").queryName("dup_tags_short")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      in.addData(Doc(ts(0), 1L, "too short"), Doc(ts(1), 2L, "too short"))
      q.processAllAvailable()
      assert(spark.table("dup_tags_short").count() == 0)
    } finally q.stop()
  }
}
