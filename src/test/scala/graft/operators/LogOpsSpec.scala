package graft.operators

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.LogOps._

/** Reference read/retention semantics (SURVEY.md §5 edge cases) on tiny
  * in-memory frames.
  */
class LogOpsSpec extends SparkSpec {

  private lazy val logs: DataFrame = {
    import spark.implicits._
    // two containers, seq strictly increasing with ts
    (1 to 100).map { i =>
      val t = Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 60L)
      (i.toLong % 2, i.toLong, LogOps.nanos(t))
    }.toDF("c", "seq", "ts_nano")
  }

  private def seqs(df: DataFrame): Seq[Long] =
    df.select("seq").collect().map(_.getLong(0)).toSeq

  test("zero-time sentinel means unset (src/docker.rs:150-166)") {
    val r = normalize(None, Some(ZeroTime), Some("2024-01-01T01:00:00Z"), 0, follow = false)
    assert(r.since === None)
    assert(r.until === Some(Instant.parse("2024-01-01T01:00:00Z")))
  }

  test("tail < 1 means unbounded (src/docker.rs:144-148)") {
    assert(normalize(None, None, None, 0, follow = false).tail === None)
    assert(normalize(None, None, None, -1, follow = false).tail === None)
    assert(normalize(None, None, None, 5, follow = false).tail === Some(5L))
  }

  test("follow ignores tail (src/logger.rs:386)") {
    assert(normalize(None, None, None, 5, follow = true).tail === None)
  }

  test("range scan filters and orders by seq") {
    val r = normalize(Some(0L), Some("2024-01-01T00:30:00Z"),
      Some("2024-01-01T01:00:00Z"), 0, follow = false)
    // container 0 = even seq; minutes 30..60 → seq 30..60
    assert(seqs(readRange(logs, "c", "seq", "ts_nano", r)) ===
      (30L to 60L by 2))
  }

  test("tail(k) ≡ last k of the full scan, in ascending order") {
    val full = normalize(Some(1L), None, None, 0, follow = false)
    val tail = normalize(Some(1L), None, None, 7, follow = false)
    val all = seqs(readRange(logs, "c", "seq", "ts_nano", full))
    assert(seqs(readRange(logs, "c", "seq", "ts_nano", tail)) === all.takeRight(7))
  }

  test("tail > nrows starts from row 0 (src/logger.rs:367)") {
    val r = normalize(Some(1L), None, None, 1000, follow = false)
    assert(seqs(readRange(logs, "c", "seq", "ts_nano", r)).size === 50)
  }

  test("page = sort + offset + limit") {
    assert(seqs(page(logs, "seq", offset = 10, limit = 5)) === (11L to 15L))
  }

  test("retention max-lines keeps exactly min(k, n) newest per container") {
    val out = retentionSurvivors(logs, "c", "seq", "ts_nano", None, Some(10L))
    val byC = out.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    assert(byC(0L).toSeq === (82L to 100L by 2))
    assert(byC(1L).toSeq === (81L to 99L by 2))
    val tiny = retentionSurvivors(logs.where(col("seq") <= 4), "c", "seq", "ts_nano", None, Some(10L))
    assert(tiny.count() === 4) // k > n keeps everything
  }

  test("retention edge quotas: 0 deletes everything; null container is its own group") {
    assert(retentionSurvivors(logs, "c", "seq", "ts_nano", None, Some(0L)).count() === 0L)
    // null-key rows must form their own quota group (the rank window's
    // semantics) — an equi-join on the container key would drop them
    val withNull = logs.select(
      when(col("seq") <= 3, lit(null)).otherwise(col("c")).as("c"),
      col("seq"), col("ts_nano"))
    val out = retentionSurvivors(withNull, "c", "seq", "ts_nano", None, Some(2L))
    val nulls = out.where(col("c").isNull).collect().map(_.getLong(1)).sorted
    assert(nulls.toSeq === Seq(2L, 3L))
  }

  test("combined age+lines retention: survivors must satisfy BOTH (cleaner.rs:97 OR-delete)") {
    // delete if (ts < cutoff) OR (rank > k)  ⇔  keep if fresh AND within k
    val cutoff = Instant.parse("2024-01-01T01:00:00Z") // keeps seq >= 60
    val out = retentionSurvivors(logs, "c", "seq", "ts_nano", Some(cutoff), Some(10L))
    val got = seqs(out.orderBy("seq"))
    // within-10-newest per container: evens 82..100, odds 81..99 — all >= 60
    assert(got.sorted === ((81L to 99L by 2) ++ (82L to 100L by 2)).sorted)
    // age bites when the cutoff is newer than the rank window
    val cutoff2 = Instant.parse("2024-01-01T01:30:00Z") // keeps seq >= 90
    val out2 = retentionSurvivors(logs, "c", "seq", "ts_nano", Some(cutoff2), Some(10L))
    assert(seqs(out2.orderBy("seq")).forall(_ >= 90L))
  }

  test("derived ts_nano: range bounds translate to the raw column, exactly") {
    import spark.implicits._
    // model of Tables.events' NTZ branch: raw NTZ micros column `t_raw`,
    // derived ts_nano tagged with physCol metadata
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(graft.Tables.PhysColKey, "t_raw")
      .putString(graft.Tables.PhysUnitKey, graft.Tables.UnitNtzMicros)
      .build()
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val df = (0 to 10).map { i =>
      (i.toLong, java.time.LocalDateTime.ofInstant(base.plusMillis(i * 500L),
        java.time.ZoneOffset.UTC))
    }.toDF("seq", "t_raw")
      .withColumn("ts_nano",
        (unix_micros(col("t_raw").cast("timestamp")) * lit(1000L)).as("ts_nano", md))
    def got(c: org.apache.spark.sql.Column): Seq[Long] =
      df.where(c).select("seq").collect().map(_.getLong(0)).toSeq.sorted
    val n0 = LogOps.nanos(base)
    // aligned bounds hit exactly
    assert(got(tsNanoGeq(df, "ts_nano", n0 + 2500L * 1000000L)) === (5L to 10L))
    assert(got(tsNanoLeq(df, "ts_nano", n0 + 2500L * 1000000L)) === (0L to 5L))
    // sub-µs offsets: geq rounds the µs bound UP, leq rounds DOWN — both
    // remain exact because every ts_nano is a multiple of 1000
    assert(got(tsNanoGeq(df, "ts_nano", n0 + 2500L * 1000000L + 1)) === (6L to 10L))
    assert(got(tsNanoLeq(df, "ts_nano", n0 + 2500L * 1000000L - 1)) === (0L to 4L))
    // and the translated predicate names the raw column (pushable form):
    // the Filter line must reference t_raw, not the derived ts_nano
    val filterLine = df.where(tsNanoGeq(df, "ts_nano", n0))
      .queryExecution.analyzed.toString.linesIterator
      .find(_.contains("Filter")).getOrElse("")
    assert(filterLine.contains("t_raw") && !filterLine.contains("ts_nano"),
      s"expected raw-column predicate, got: $filterLine")
  }

  test("raw-long ts_nano (no metadata): bounds compare the nanos directly") {
    val since = Instant.parse("2024-01-01T00:30:00Z")
    val viaHelper = seqs(logs.where(
      tsNanoGeq(logs, "ts_nano", LogOps.nanos(since))).orderBy(col("seq")))
    val direct = seqs(logs.where(
      col("ts_nano") >= LogOps.nanos(since)).orderBy(col("seq")))
    assert(viaHelper === direct && viaHelper.nonEmpty)
  }

  test("readRange prunes date partitions on the ingest layout, same results") {
    import spark.implicits._
    // a 10-day table in the LogIngest physical layout (date partition dirs)
    val dir = java.nio.file.Files.createTempDirectory("graft-datep").toString
    val rows = (0 until 240).map { h =>
      val t = Instant.parse("2024-03-01T00:30:00Z").plusSeconds(h * 3600L)
      ("c1", h.toLong, LogOps.nanos(t),
        java.time.LocalDate.ofEpochDay(LogOps.nanos(t) / (86400L * 1000000000L)))
    }
    rows.toDF("container_id", "seq", "ts_nano", "date")
      .write.mode("overwrite").partitionBy("date").parquet(dir)
    val table = spark.read.parquet(dir)
    val req = normalize(Some("c1"), Some("2024-03-04T00:00:00Z"),
      Some("2024-03-05T23:00:00Z"), tail = 0, follow = false)
    val pruned = LogOps.readRange(table, "container_id", "seq", "ts_nano", req,
      datePartCol = Some("date"))
    // results identical to the pure ts_nano filter (bounds are a superset)
    val expect = rows.filter { case (_, _, n, _) =>
      n >= LogOps.nanos(Instant.parse("2024-03-04T00:00:00Z")) &&
      n <= LogOps.nanos(Instant.parse("2024-03-05T23:00:00Z"))
    }.map(_._2)
    assert(seqs(pruned) === expect)
    // and the scan only touches the two in-range date directories
    // (AQE off for this assertion: its wrapper hides the scan node until
    // execution; the pruning itself is identical either way)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p2 = LogOps.readRange(spark.read.parquet(dir), "container_id", "seq",
        "ts_nano", req, datePartCol = Some("date")).queryExecution.executedPlan
      val pf = p2.toString.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(pf.contains("date"), s"no partition filter on date:\n$p2")
      val scanned: Int = p2.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(scanned === 2, s"expected 2 date partitions scanned, got $scanned")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("date pruning is opt-in: an unrelated DateType 'date' column is untouched") {
    import spark.implicits._
    // a frame whose `date` is a BUSINESS date, deliberately unequal to the
    // UTC day of ts_nano — the ADVICE r8 hazard case
    val rows = (0 until 48).map { h =>
      val t = Instant.parse("2024-03-01T00:30:00Z").plusSeconds(h * 3600L)
      ("c1", h.toLong, LogOps.nanos(t), java.time.LocalDate.of(1999, 1, 1))
    }
    val df = rows.toDF("container_id", "seq", "ts_nano", "date")
    val req = normalize(Some("c1"), Some("2024-03-01T12:00:00Z"),
      Some("2024-03-02T12:00:00Z"), tail = 0, follow = false)
    // default (no opt-in): rows survive purely on ts_nano — the 1999 business
    // dates must NOT eliminate them
    val got = seqs(LogOps.readRange(df, "container_id", "seq", "ts_nano", req))
    assert(got === (12L to 35L), "opt-out readRange must ignore the date column")
    // opting in against the same frame asserts the layout contract the frame
    // violates — the result would silently drop every row, so the caller who
    // opts in has declared the contract and gets the (empty) pruned answer;
    // the point of opt-in is exactly that this cannot happen by default
    val pruned = LogOps.readRange(df, "container_id", "seq", "ts_nano", req,
      datePartCol = Some("date"))
    assert(seqs(pruned).isEmpty)
  }

  test("naming an absent or non-DateType datePartCol fails loudly") {
    val req = normalize(Some("c"), Some("2024-01-01T00:30:00Z"), None, 0, follow = false)
    val e1 = intercept[IllegalArgumentException] {
      LogOps.readRange(logs, "c", "seq", "ts_nano", req, datePartCol = Some("date"))
    }
    assert(e1.getMessage.contains("datePartCol"))
    val e2 = intercept[IllegalArgumentException] {
      // seq exists but is LongType, not DateType
      LogOps.readRange(logs, "c", "seq", "ts_nano", req, datePartCol = Some("seq"))
    }
    assert(e2.getMessage.contains("DateType"))
  }

  test("unknown phys-unit metadata on ts_nano fails loudly, never silently") {
    import spark.implicits._
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(graft.Tables.PhysColKey, "ts")
      .putString(graft.Tables.PhysUnitKey, "fortnights")
      .build()
    val df = Seq(("c1", 1L, 1000000000L)).toDF("c", "seq", "ts_nano")
      .withColumn("ts_nano", col("ts_nano").as("ts_nano", meta))
    val e = intercept[IllegalStateException] {
      LogOps.tsNanoGeq(df, "ts_nano", 0L)
    }
    assert(e.getMessage.contains("fortnights"))
  }

  test("template mining: digit runs mask to one template; stats per template") {
    import spark.implicits._
    val t0 = Instant.parse("2024-01-01T00:00:00Z")
    val rows = Seq(
      (0L, 1L, "GET /api/user/123 took 45ms"),
      (1L, 2L, "GET /api/user/9876 took 7ms"),
      (0L, 3L, "GET /api/user/5 took 120ms"),
      (0L, 4L, "connection lost"))
      .map { case (c, seq, line) =>
        (c, seq, LogOps.nanos(t0.plusSeconds(seq * 60L)), line)
      }.toDF("c", "seq", "ts_nano", "line")
    val got = templates(rows, "c", "seq", "ts_nano", col("line")).collect()
    assert(got.length === 2)
    // most frequent first
    val top = got(0)
    assert(top.getAs[String]("template") === "GET /api/user/<N> took <N>ms")
    assert(top.getAs[Long]("n") === 3L)
    assert(top.getAs[Long]("n_containers") === 2L)
    assert(top.getAs[Long]("example_seq") === 1L)
    assert(top.getAs[Long]("first_ms") === t0.plusSeconds(60L).toEpochMilli)
    assert(top.getAs[Long]("last_ms") === t0.plusSeconds(180L).toEpochMilli)
    assert(got(1).getAs[String]("template") === "connection lost")
    assert(got(1).getAs[Long]("n") === 1L)
  }

  test("partial-line reassembly: ordinal order, interleaved groups, orphan, passthrough") {
    import spark.implicits._
    // container 0: group "a" arrives OUT of ordinal order, interleaved with
    // group "b" (which never sees its `last` → orphan) and two whole lines;
    // container 1 reuses partial_id "a" — ids are only unique per container.
    val rows = Seq(
      // (c, seq, line, partial, pid, plast, pord)
      (0L, 1L, "he", true, Some("a"), Some(false), Some(0)),
      (0L, 2L, "wor", true, Some("b"), Some(false), Some(0)),
      (0L, 3L, "lo", true, Some("a"), Some(true), Some(2)),
      (0L, 4L, "l", true, Some("a"), Some(false), Some(1)),
      (0L, 5L, "plain", false, None, None, None),
      (0L, 6L, "ld", true, Some("b"), Some(false), Some(1)),
      (1L, 7L, "other", true, Some("a"), Some(true), Some(1)),
      (1L, 8L, "an", true, Some("a"), Some(false), Some(0)))
      .map { case (c, seq, line, p, pid, pl, po) =>
        (c, seq, seq * 1000L, line, p, pid, pl, po)
      }
      .toDF("c", "seq", "ts_nano", "line",
        "partial", "partial_id", "partial_last", "partial_ordinal")
    val got = reassemblePartials(rows, "c", "seq", "ts_nano", "line")
      .orderBy(col("seq")).collect()
    val lines = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getInt(4), r.getBoolean(5)))
    assert(lines === Array(
      (0L, 1L, 1000L, "hello", 3, true),   // a: ordinals 0,2,1 → sorted
      (0L, 2L, 2000L, "world", 2, false),  // b: orphan, flagged incomplete
      (0L, 5L, 5000L, "plain", 1, true),   // passthrough
      (1L, 7L, 7000L, "another", 2, true))) // per-container id namespace
  }

  test("seq-uniqueness audit flags duplicated seqs, passes clean containers") {
    import spark.implicits._
    // container 0 clean; container 1 has seq 5 twice (a replayed batch)
    val withDup = logs.union(Seq((1L, 5L, 123L)).toDF("c", "seq", "ts_nano"))
    val audit = seqUniquenessAudit(withDup, "c", "seq")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(audit(0L) === ((50L, 50L, 0L, true)))
    assert(audit(1L) === ((51L, 50L, 1L, false)))
  }
}
