package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.functions.ProtoLogCodec
import graft.functions.ProtoLogCodec.LogEntry

/** The facade end-to-end: the reference user's whole workflow through one
  * object.
  */
class GraftSpec extends SparkSpec {

  private val t0 = 1700000000000000000L

  test("start → read (since/tail) → cleanup → stop lifecycle") {
    val root = Files.createTempDirectory("graft-facade").toString
    val g = Graft(spark, root)

    val dir = Paths.get(root, "staging", "web")
    Files.createDirectories(dir)
    val bytes = (0 until 30).map { i =>
      ProtoLogCodec.frame(ProtoLogCodec.encode(LogEntry(
        "stdout", t0 + i * 1000000000L, s"msg $i".getBytes, partial = false, None)))
    }.foldLeft(Array.emptyByteArray)(_ ++ _)
    Files.write(dir.resolve("b0.pblog"), bytes)

    g.startLogging("web", Trigger.AvailableNow()).awaitTermination(60000)
    assert(g.activeContainers === Set("web"))
    assert(g.countLogs("web") === 30)

    val since = java.time.Instant.ofEpochSecond(0, t0 + 10 * 1000000000L).toString
    val got = g.readLogs(Some("web"), since = Some(since), tail = 5)
      .select("line").collect().map(_.getString(0))
    assert(got.toSeq === (25 until 30).map(i => s"msg $i\n"))

    // zero-time sentinel = unset (docker sends it for "no bound")
    assert(g.readLogs(Some("web"), since = Some(operators.LogOps.ZeroTime)).count() === 30)

    assert(g.cleanup(age = None, maxLines = Some(10L)) === 1)
    assert(g.countLogs("web") === 10)

    g.stopLogging("web", deleteWhenStopped = true)
    assert(g.activeContainers.isEmpty)
    assert(!Files.exists(Paths.get(root, "logs", "container_id=web")))
  }
}
