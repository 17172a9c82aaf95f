package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.functions.ProtoLogCodec
import graft.functions.ProtoLogCodec.LogEntry
import graft.streaming.LogIngest

/** Ingest→visible-in-follow latency (VERDICT r10 #6): the reference's
  * follow contract is a 1 s poll over the per-container SQLite table
  * (logsqlite src/logger.rs:287-288); this measures the equivalent
  * end-to-end number for the Spark path —
  *
  *   producer appends framed protobuf → LogIngest micro-batch (100 ms
  *   trigger, transactional manifest commit) → parquet table →
  *   LogIngest.follow (1 s trigger) → emit
  *
  * Each line carries its WRITE wall-clock in `time_nano`; the follow
  * callback stamps arrival with the same clock, so the reported p50/p99
  * is producer-pen-down to follower-sees-it, including file-source
  * discovery on both hops.
  *
  * Usage: runMain graft.tools.FollowLatencyBench [seconds] [linesPerSec] [containers]
  * Defaults: 20 s at 10,000 lines/s per container, 1 container (the
  * reference's design point is one FIFO per container).
  */
object FollowLatencyBench {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(20)
    val rate = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val containers = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("graft-flatency").toString
    val (staging, table, ckpt) = (s"$base/staging", s"$base/logs", s"$base/ckpt")
    (0 until containers).foreach(c =>
      Files.createDirectories(Paths.get(staging, s"c$c")))
    def wallNano(): Long = System.currentTimeMillis() * 1000000L

    // bootstrap: the follower requires a committed table (partition layout
    // is fixed at stream start — LogIngest.follow fails loudly otherwise),
    // so land one marker line per container first, exactly the reference's
    // StartLogging-creates-the-db-before-ReadLogs ordering.
    (0 until containers).foreach { c =>
      Files.write(Paths.get(staging, s"c$c", "b_boot.pblog"),
        ProtoLogCodec.frame(ProtoLogCodec.encode(LogEntry(
          "stdout", wallNano(), "boot".getBytes("UTF-8"), partial = false, None))))
    }
    LogIngest.start(spark, staging, table, ckpt, Trigger.AvailableNow())
      .awaitTermination(120000)

    val ingest = LogIngest.start(spark, staging, table, ckpt,
      Trigger.ProcessingTime("100 milliseconds"))

    // arrival stamps: (write_nano, seen_nano) per line, driver-side queue
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val follow = LogIngest.follow(spark, table, containerId = None,
      sinceNano = None, untilNano = None,
      emit = { batch =>
        val now = wallNano()
        val rows = batch.select("ts_nano").collect()
        if (rows.nonEmpty && !rows(0).get(0).isInstanceOf[java.lang.Long])
          println(s"[debug] emit schema=${batch.schema.simpleString}\n" +
            s"[debug] row0=${rows(0)} class=${rows(0).get(0).getClass}")
        rows.foreach(r => seen.add((r.getLong(0), now)))
      })

    // producer: per-container burst every 100 ms at `rate` lines/s
    val burstEvery = 100L // ms
    val perBurst = math.max(1, (rate * burstEvery / 1000L).toInt)
    val produced = new java.util.concurrent.atomic.AtomicLong(0L)
    val producers = (0 until containers).map { c =>
      new Thread(() => {
        val dir = Paths.get(staging, s"c$c")
        val deadline = System.nanoTime() + seconds * 1000000000L
        var b = 0
        while (System.nanoTime() < deadline) {
          val t0 = System.nanoTime()
          val out = new java.io.ByteArrayOutputStream(perBurst * 96)
          val w = wallNano()
          (0 until perBurst).foreach { i =>
            out.write(ProtoLogCodec.frame(ProtoLogCodec.encode(LogEntry(
              "stdout", w,
              s"level=info msg=probe burst=$b i=$i".getBytes("UTF-8"),
              partial = false, None))))
          }
          // write-then-rename: the file source must never read a torn file
          val tmp = dir.resolve(f".b$b%06d.tmp")
          Files.write(tmp, out.toByteArray,
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
          Files.move(tmp, dir.resolve(f"b$b%06d.pblog"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          b += 1
          produced.addAndGet(perBurst)
          val elapsedMs = (System.nanoTime() - t0) / 1000000L
          if (elapsedMs < burstEvery) Thread.sleep(burstEvery - elapsedMs)
        }
      }, s"producer-c$c")
    }
    val t0 = System.nanoTime()
    val produceFrom = wallNano() // excludes the bootstrap markers
    producers.foreach(_.start())
    producers.foreach(_.join())
    // drain: give the two hops time to flush the tail, then stop
    val expected = produced.get()
    val drainDeadline = System.nanoTime() + 30000000000L
    while (seen.size() < expected + containers && // + bootstrap markers
        System.nanoTime() < drainDeadline)
      Thread.sleep(200)
    follow.stop(); ingest.stop()
    val wall = (System.nanoTime() - t0) / 1e9

    import scala.jdk.CollectionConverters._
    val lats = seen.asScala.toArray
      .filter(_._1 >= produceFrom) // bootstrap markers are not samples
      .map { case (w, s) => (s - w) / 1e9 }.sorted
    def pct(p: Double): Double =
      if (lats.isEmpty) Double.NaN else lats((p * (lats.length - 1)).toInt)
    println(f"[follow-latency] containers=$containers rate=$rate/s " +
      f"duration=${seconds}s produced=$expected seen=${lats.length} " +
      f"(${lats.length * 100.0 / math.max(expected, 1)}%.1f%%) wall=$wall%.1f s")
    println(f"[follow-latency] p50=${pct(0.50)}%.3f s p90=${pct(0.90)}%.3f s " +
      f"p99=${pct(0.99)}%.3f s max=${if (lats.isEmpty) Double.NaN else lats.last}%.3f s " +
      "(reference contract: 1 s poll cadence)")
    spark.stop()
  }
}
