package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.streaming.{IngestMetrics, LogIngest}
import graft.streaming.LogIngest.LogRow

/** Ingest source for logfmt capture files — the fourth wire format into
  * the engine's one log table (framed protobuf = the reference's plugin
  * stream, json-file = docker's default driver, syslog = RFC 5424
  * shippers, logfmt = the `key=value` convention of Heroku and the Go/
  * Grafana logging stacks).
  *
  * Line grammar: space-separated `key=value` pairs; a value is either a
  * bare token (no spaces) or double-quoted with `\"`/`\\` escapes. The
  * event time comes from the first of `ts`/`time`/`timestamp` (ISO-8601,
  * parsed via `java.time.Instant` — full nanosecond fidelity, same stance
  * as [[JsonFileLog]]); `level` maps to the `source` column (lowercased;
  * absent → `info`) so severity-sliced scans stay pushdown-friendly
  * predicates on a low-cardinality string, mirroring [[SyslogLog]].
  *
  * The stored line is the RAW logfmt line (newline-appended, SURVEY §1.3
  * invariant): logfmt is self-describing, so keeping it verbatim preserves
  * the full key-value payload for downstream extraction and
  * `LogOps.templates` mining. Structurally corrupt lines (token without
  * `=`, unterminated quote, missing/unparseable timestamp) are skipped and
  * counted via [[IngestMetrics]] — the shared permissive-decode policy.
  */
object LogfmtLog {

  private val TsKeys = Seq("ts", "time", "timestamp")

  /** Parse one logfmt line into ordered key-value pairs; None when the
    * line is structurally corrupt (bare token, empty key, unclosed quote).
    */
  def parseKvs(line: String): Option[Vector[(String, String)]] = {
    val out = Vector.newBuilder[(String, String)]
    val n = line.length
    var i = 0
    while (i < n) {
      while (i < n && line.charAt(i) == ' ') i += 1
      if (i < n) {
        val ks = i
        while (i < n && line.charAt(i) != '=' && line.charAt(i) != ' ') i += 1
        if (i >= n || line.charAt(i) != '=' || i == ks) return None
        val key = line.substring(ks, i)
        i += 1
        if (i < n && line.charAt(i) == '"') {
          i += 1
          val sb = new StringBuilder
          var closed = false
          while (i < n && !closed) {
            val c = line.charAt(i)
            if (c == '\\' && i + 1 < n) { sb.append(line.charAt(i + 1)); i += 2 }
            else if (c == '"') { closed = true; i += 1 }
            else { sb.append(c); i += 1 }
          }
          if (!closed) return None
          out += key -> sb.toString
        } else {
          val vs = i
          while (i < n && line.charAt(i) != ' ') i += 1
          out += key -> line.substring(vs, i)
        }
      }
    }
    Some(out.result())
  }

  /** Parse one line to (ts_nano, source, raw line); None when corrupt. */
  def parseLine(line: String): Option[(Long, String)] =
    parseKvs(line).flatMap { kvs =>
      val m = kvs.toMap
      TsKeys.collectFirst { case k if m.contains(k) => m(k) }.flatMap { tsStr =>
        try {
          val inst = java.time.Instant.parse(tsStr)
          val tsNano = Math.addExact(
            Math.multiplyExact(inst.getEpochSecond, 1000000000L), inst.getNano.toLong)
          Some((tsNano, m.get("level").map(_.toLowerCase).getOrElse("info")))
        } catch {
          case _: java.time.format.DateTimeParseException => None
          case _: ArithmeticException => None
        }
      }
    }

  /** Decode one logfmt capture burst into log rows (same monotone-seq rule
    * as the other three wire formats).
    */
  def decodeBurst(
      containerId: String,
      bytes: Array[Byte],
      skipCounter: Option[org.apache.spark.util.LongAccumulator] = None): Iterator[LogRow] = {
    var prevSeq = Long.MinValue
    new String(bytes, "UTF-8").linesIterator.filter(_.nonEmpty).flatMap { raw =>
      parseLine(raw) match {
        case None =>
          skipCounter.foreach(_.add(1L))
          Iterator.empty
        case Some((tsNano, source)) =>
          val line = raw + "\n"
          val base = (tsNano / 1000L) * 1000L
          val seq = if (base > prevSeq) base else prevSeq + 1
          prevSeq = seq
          Iterator.single(LogRow(
            container_id = containerId,
            seq = seq,
            ts_nano = tsNano,
            source = source,
            line = line,
            partial = false,
            partial_id = None,
            partial_last = None,
            partial_ordinal = None,
            message = graft.functions.ProtoLogCodec.encode(
              graft.functions.ProtoLogCodec.LogEntry(
                source = source, timeNano = tsNano,
                line = line.getBytes("UTF-8"), partial = false,
                partialMeta = None))))
      }
    }
  }

  /** Streaming decode of `.log` logfmt captures under
    * `stagingDir/<container_id>/` (mirror of [[SyslogLog.stream]]).
    */
  def stream(
      spark: SparkSession,
      stagingDir: String,
      containerId: Option[String] = None): Dataset[LogRow] = {
    import spark.implicits._
    val skipped = IngestMetrics.skippedFrames(spark)
    spark.readStream
      .format("binaryFile")
      .option("pathGlobFilter", "*.log")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .load(containerId.map(id => s"$stagingDir/$id").getOrElse(s"$stagingDir/*"))
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val parts = path.stripSuffix("/").split("/")
        decodeBurst(parts(parts.length - 2), content, Some(skipped))
      }
  }

  /** Backfill/tail logfmt captures into the engine's partitioned table —
    * the same transactional sink as the other three wire formats.
    */
  def start(
      spark: SparkSession,
      stagingDir: String,
      tableDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("100 milliseconds"),
      containerId: Option[String] = None,
      writeSaltBuckets: Int = 1): StreamingQuery =
    LogIngest.startFrom(stream(spark, stagingDir, containerId),
      tableDir, checkpointDir, trigger, writeSaltBuckets)
}
