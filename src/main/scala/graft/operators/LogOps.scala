package graft.operators

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core log-query semantics of the reference engine, Spark-first.
  *
  * The reference (daschr/logsqlite) answers `docker logs --since --until
  * --tail --follow` with an indexed SQLite scan per container
  * (`src/logger.rs:291-464`). Here the same capability surface is a set of
  * declarative DataFrame transforms over a partitioned columnar log table:
  *
  *  - time-range scan  (logsqlite `src/logger.rs:320-343`)  → pushed-down
  *    range predicate + partition pruning on the container key;
  *  - tail-k          (`src/logger.rs:345-377` count+OFFSET) → top-k by the
  *    monotone sequence key; Catalyst plans `orderBy(desc).limit(k)` as
  *    TakeOrderedAndProject (per-partition partial top-k + merge) — strictly
  *    better than the reference's count+OFFSET two-pass at any scale;
  *  - count           (`src/logger.rs:347-355`)             → partial-agg count;
  *  - offset paging   (`src/logger.rs:358-361`)             → sort + offset/limit;
  *  - retention       (`src/cleaner.rs:82-129`)             → survivor predicate
  *    `ts >= age_cutoff AND rank_from_newest <= max_lines` (complement of the
  *    reference's `DELETE ... WHERE ts < ?1 OR ROWID < ?2` OR-semantics).
  *
  * Scale: all of these are embarrassingly parallel per container partition.
  * The only shuffle is the window in `retentionSurvivors` (hash-partitioned
  * by container key — co-located with how a production log table would be
  * bucketed). Tail-k never materializes more than k rows per partition.
  *
  * The driver fixture's `events` table stands in for the log table:
  * `user_id` ≈ container_id (partition key), `event_id` ≈ ROWID (unique,
  * monotone with ts — the `seq` column of SURVEY.md §1.3), `ts` ≈ event time.
  */
object LogOps {

  /** Docker's zero-time sentinel: "unset" (logsqlite `src/docker.rs:150-166`). */
  val ZeroTime = "0001-01-01T00:00:00Z"

  /** Normalized read request (logsqlite `src/docker.rs:118-166`). */
  final case class ReadRequest(
      container: Option[Any],
      since: Option[Instant],
      until: Option[Instant],
      tail: Option[Long],
      follow: Boolean)

  /** Sentinel / bounds normalization, mirroring the reference exactly:
    *  - zero-time since/until → unset (`src/docker.rs:150-166`)
    *  - tail < 1 → unbounded   (`src/docker.rs:144-148`)
    *  - follow ignores tail    (`src/logger.rs:386`)
    */
  def normalize(
      container: Option[Any],
      since: Option[String],
      until: Option[String],
      tail: Long,
      follow: Boolean): ReadRequest = {
    def parse(o: Option[String]): Option[Instant] =
      o.filter(_ != ZeroTime).map(Instant.parse)
    val t = if (follow || tail < 1) None else Some(tail)
    ReadRequest(container, parse(since), parse(until), t, follow)
  }

  /** Exact int64 nanoseconds since epoch — the authoritative filter/order
    * domain (SURVEY.md §1.3: Spark TimestampType truncates to µs).
    */
  def nanos(i: Instant): Long = i.getEpochSecond * 1000000000L + i.getNano

  // --- pushable nano-range predicates ------------------------------------
  //
  // When `ts_nano` is the raw file column (the engine's own ingest layout,
  // LogIngest), a plain long comparison reaches the parquet scan natively.
  // When it is DERIVED from a physical timestamp column (the driver fixture
  // stores ts as TIMESTAMP_NTZ µs since r7; Tables.events computes ts_nano
  // from it), a predicate on the derived expression can never push down, so
  // the scan would read ALL row groups — at 100 TB the pushed range IS the
  // index (the reference's idx_ts, logsqlite src/logger.rs:147). Tables
  // tags such a ts_nano with column metadata naming the raw column + unit;
  // these helpers translate each nano bound into an EXACT bound on the raw
  // column: ts_nano = µs*1000 by construction, so the ⌈·⌉/⌊·⌋-rounded µs
  // bounds are equivalences, not approximations.

  private def physOf(df: DataFrame, tsNanoCol: String): Option[(String, String)] =
    df.schema.fields.find(_.name == tsNanoCol).flatMap { f =>
      if (f.metadata.contains(graft.Tables.PhysColKey))
        Some((f.metadata.getString(graft.Tables.PhysColKey),
              f.metadata.getString(graft.Tables.PhysUnitKey)))
      else None
    }

  private def ntzOfMicros(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  private def instantOfMicros(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  private def bound(df: DataFrame, tsNanoCol: String, us: Long, geq: Boolean): Column =
    physOf(df, tsNanoCol) match {
      case Some((c, graft.Tables.UnitNtzMicros)) =>
        if (geq) col(c) >= lit(ntzOfMicros(us)) else col(c) <= lit(ntzOfMicros(us))
      case Some((c, graft.Tables.UnitLtzMicros)) =>
        if (geq) col(c) >= lit(instantOfMicros(us)) else col(c) <= lit(instantOfMicros(us))
      case Some((c, unknownUnit)) =>
        // Fail loudly: a future unit constant silently compared as raw nanos
        // would be a 1000x-wrong predicate (ADVICE r8).
        throw new IllegalStateException(
          s"column '$tsNanoCol' declares raw column '$c' with unrecognized " +
            s"${graft.Tables.PhysUnitKey}='$unknownUnit'")
      case None => // raw long nanos — compare directly (us is a nano value here)
        if (geq) col(tsNanoCol) >= us else col(tsNanoCol) <= us
    }

  /** `ts_nano >= nano`, expressed on the raw scan column when derived. */
  def tsNanoGeq(df: DataFrame, tsNanoCol: String, nano: Long): Column =
    if (physOf(df, tsNanoCol).isDefined)
      bound(df, tsNanoCol, Math.floorDiv(nano + 999L, 1000L), geq = true)
    else bound(df, tsNanoCol, nano, geq = true)

  /** `ts_nano <= nano`, expressed on the raw scan column when derived. */
  def tsNanoLeq(df: DataFrame, tsNanoCol: String, nano: Long): Column =
    if (physOf(df, tsNanoCol).isDefined)
      bound(df, tsNanoCol, Math.floorDiv(nano, 1000L), geq = false)
    else bound(df, tsNanoCol, nano, geq = false)

  /** Time-range scan, ordered by the sequence key.
    *
    * The range predicate compares the RAW int64 `ts_nano` column, never a
    * derived timestamp: a filter on `timestamp_micros(ts_nano div 1000)` is
    * a function of the column and cannot reach the parquet scan, while a
    * plain long comparison shows up in `PushedFilters` and prunes row
    * groups via min/max stats — at 100 TB this predicate IS the index
    * (the reference's idx_ts, logsqlite src/logger.rs:147).
    */
  def readRange(
      logs: DataFrame,
      containerCol: String,
      seqCol: String,
      tsNanoCol: String,
      req: ReadRequest,
      datePartCol: Option[String] = None): DataFrame = {
    var out = logs
    req.container.foreach(id => out = out.where(col(containerCol) === id))
    req.since.foreach(s => out = out.where(tsNanoGeq(logs, tsNanoCol, nanos(s))))
    req.until.foreach(u => out = out.where(tsNanoLeq(logs, tsNanoCol, nanos(u))))
    // Date-PARTITION pruning, OPT-IN: the ingest layout (LogIngest.logSchema)
    // stores `date` = the ts_nano UTC day as a partition directory. A ts_nano
    // range implies a date range, but Catalyst cannot derive one from the
    // other — without the redundant bounds below, a 1-hour read over a year
    // of logs still LISTS AND READS FOOTERS of all ~365 date dirs per
    // container. The derived bounds are supersets of the exact ts_nano
    // predicate (date = floor(ts_nano/day) is monotone), so they prune
    // directories without changing results — but ONLY under that layout
    // contract. The caller must opt in by naming the partition column
    // (Graft/LogIngest do): auto-detecting any DateType `date` column would
    // silently drop rows for a caller whose `date` is an unrelated business
    // date (ADVICE r8). Naming a column that is absent or not a DateType is
    // a broken contract and fails loudly rather than silently skipping.
    datePartCol.foreach { dc =>
      require(
        logs.schema.fields.exists(f =>
          f.name == dc && f.dataType == org.apache.spark.sql.types.DateType),
        s"datePartCol '$dc' must name a DateType column of the input (ingest layout contract)")
      val nanosPerDay = 86400L * 1000000000L
      req.since.foreach { s =>
        out = out.where(col(dc) >=
          lit(java.time.LocalDate.ofEpochDay(Math.floorDiv(nanos(s), nanosPerDay))))
      }
      req.until.foreach { u =>
        out = out.where(col(dc) <=
          lit(java.time.LocalDate.ofEpochDay(Math.floorDiv(nanos(u), nanosPerDay))))
      }
    }
    req.tail match {
      case Some(k) =>
        // TakeOrderedAndProject: partial top-k per partition, merge on driver
        // side of the exchange — O(k) memory, no full sort.
        out.orderBy(col(seqCol).desc)
          .limit(math.min(k, Int.MaxValue.toLong).toInt)
          .orderBy(col(seqCol).asc)
      case None => out.orderBy(col(seqCol).asc)
    }
  }

  /** COUNT(*) per container under a range predicate (O7 of SURVEY §2.1).
    * Partial aggregation (map-side combine) then a tiny shuffle on the
    * container key — no data movement proportional to row count.
    */
  def countByContainer(
      logs: DataFrame,
      containerCol: String,
      pred: Column): DataFrame =
    logs.where(pred).groupBy(col(containerCol)).agg(count(lit(1)).as("n"))

  /** LIMIT/OFFSET paging on the global sequence order (O8). */
  def page(logs: DataFrame, seqCol: String, offset: Int, limit: Int): DataFrame =
    logs.orderBy(col(seqCol).asc).offset(offset).limit(limit)

  /** Log template mining: collapse the variable parts of each line to a
    * placeholder and roll up by the resulting template — the Drain-family
    * "log parsing" operation every log-analytics engine runs first (the
    * reference stores lines verbatim and leaves pattern discovery to the
    * reader; this is that reader). Masking digit runs covers ids, counts,
    * sizes, ports, and timestamps-in-text, which is the bulk of log-line
    * variability.
    *
    * Per template: occurrence count, distinct containers emitting it,
    * first/last time seen, and the smallest sequence id as a retrievable
    * example. Scale: the masked template is a low-cardinality key BY
    * CONSTRUCTION (masking exists to collapse cardinality), so the rollup
    * partial-aggregates map-side and the shuffle carries one row per
    * (partition, template); distinct-container counting is the standard
    * two-phase partial distinct. No text beyond the template strings —
    * bounded by the template vocabulary, not the corpus — crosses the wire.
    */
  def templates(
      logs: DataFrame,
      containerCol: String,
      seqCol: String,
      tsNanoCol: String,
      lineCol: Column): DataFrame =
    logs
      .select(
        col(containerCol).as("container"),
        col(seqCol).as("seq"),
        // integer `div`, not `/`: double division loses ulps at ns magnitude
        expr(s"$tsNanoCol div 1000000").as("ts_ms"),
        regexp_replace(lineCol, "[0-9]+", "<N>").as("template"))
      .groupBy(col("template"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("container")).as("n_containers"),
        min(col("ts_ms")).as("first_ms"),
        max(col("ts_ms")).as("last_ms"),
        min(col("seq")).as("example_seq"))
      .orderBy(col("n").desc, col("template"))

  /** HTTP traffic rollup over access-log lines stored in the engine's log
    * table: per (method, status) request count, byte volume, and distinct
    * paths — the dashboard query of the CLF source
    * ([[graft.sources.AccessLog]] stores lines verbatim precisely so this
    * extraction stays possible downstream). Non-CLF lines (other wire
    * formats sharing the table) parse to null status and are dropped, so
    * the operator composes over a mixed-format table.
    *
    * Plan: per-row codegen'd regex extraction (the portable subset), then
    * one rollup on a (methods × statuses)-bounded key; distinct paths is
    * the standard two-phase partial distinct. Nothing but the small key
    * crosses the shuffle.
    */
  def accessStats(logs: DataFrame, lineCol: Column): DataFrame =
    logs
      .select(
        regexp_extract(lineCol, "\"([A-Z]+) ", 1).as("method"),
        nullif(regexp_extract(lineCol, "\" ([0-9]{3}) ", 1), lit(""))
          .cast("int").as("status"),
        regexp_extract(lineCol, "\"[A-Z]+ ([^ \"]+)", 1).as("path"),
        // length-guarded: a corrupt >18-digit size field must drop out
        // like every other malformed row, not abort the rollup via the
        // ANSI cast (the permissive-decode contract of the sources)
        when(length(regexp_extract(lineCol, "\" [0-9]{3} ([0-9]+)", 1))
          .between(1, 18),
          regexp_extract(lineCol, "\" [0-9]{3} ([0-9]+)", 1).cast("long"))
          .as("bytes"))
      .where(col("status").isNotNull && col("method") =!= "")
      .groupBy(col("method"), col("status"))
      .agg(
        count(lit(1)).as("n_requests"),
        sum(coalesce(col("bytes"), lit(0L))).as("total_bytes"),
        countDistinct(col("path")).as("n_paths"))
      .orderBy(col("method"), col("status"))

  /** Partial-line reassembly: stitch Docker's split log fragments back into
    * logical lines — the read-side complement of what the reference stores
    * but never performs (`src/entry.proto:13-17` defines
    * `PartialLogEntryMetadata {last, id, ordinal}`; the reference persists
    * it verbatim). Docker log drivers split any line over 16 KB into
    * fragments sharing a `partial_id` with an increasing `ordinal` and
    * `last` set on the final fragment; a log reader wants the LOGICAL line.
    *
    * Semantics: fragments with the same (container, partial_id) concatenate
    * in ordinal order into one logical line carrying the FIRST fragment's
    * seq and ts (where the line started); `complete` records whether the
    * closing `last` fragment was seen — a crashed container can orphan a
    * group, which is emitted best-effort and flagged rather than dropped.
    * Non-partial rows pass through as complete single-fragment lines.
    *
    * Plan: the passthrough branch is a narrow filter, zero shuffle; only
    * FRAGMENT rows — the small fraction of traffic coming from >16 KB
    * lines — shuffle, keyed by (container, partial_id), into a
    * collect_list + array_sort + concat aggregate. Each group is exactly
    * one logical line, so per-group state is bounded by that line's size,
    * never by the corpus — the partition strategy holds at any scale.
    * Expects the ingest layout's partial columns
    * ([[graft.streaming.LogIngest]]: `partial`, `partial_id`,
    * `partial_last`, `partial_ordinal`).
    */
  def reassemblePartials(
      logs: DataFrame,
      containerCol: String,
      seqCol: String,
      tsNanoCol: String,
      lineCol: String): DataFrame = {
    val isFrag = col("partial") && col("partial_id").isNotNull
    val whole = logs.where(!isFrag).select(
      col(containerCol), col(seqCol), col(tsNanoCol),
      col(lineCol).as("logical_line"),
      lit(1).as("n_frags"), lit(true).as("complete"))
    val stitched = logs.where(isFrag)
      .groupBy(col(containerCol), col("partial_id"))
      .agg(
        min(col(seqCol)).as(seqCol),
        min(col(tsNanoCol)).as(tsNanoCol),
        // struct sort orders by the leading field — the ordinal — so the
        // concat is fragment order regardless of arrival order
        concat_ws("", transform(
          array_sort(collect_list(struct(
            col("partial_ordinal").as("o"), col(lineCol).as("l")))),
          f => f.getField("l"))).as("logical_line"),
        count(lit(1)).cast("int").as("n_frags"),
        coalesce(max(col("partial_last")), lit(false)).as("complete"))
      .select(col(containerCol), col(seqCol), col(tsNanoCol),
        col("logical_line"), col("n_frags"), col("complete"))
    whole.unionByName(stitched)
  }

  /** Rows that SURVIVE `cleanup(age_cutoff, max_lines)` — the complement of
    * the reference's `DELETE FROM logs WHERE ts < ?1 OR ROWID < ?2`
    * (`src/cleaner.rs:82-102`): keep rows that are fresh enough AND within
    * the newest `maxLines` of their container. Expressed as a pure query so
    * it is oracle-checkable; the mutating form is a partition rewrite
    * (see graft.streaming.Retention).
    */
  def retentionSurvivors(
      logs: DataFrame,
      containerCol: String,
      seqCol: String,
      tsNanoCol: String,
      ageCutoff: Option[Instant],
      maxLines: Option[Long]): DataFrame = {
    // The reference computes the max-lines ROWID cutoff over ALL rows, then
    // ORs it with the age predicate in one DELETE — so the line rank must be
    // taken before the age filter, and both survivor conditions AND'ed.
    var out = logs
    maxLines.foreach { k =>
      // "newest k per container" as a THRESHOLD, not a rank window: a
      // row_number over partitionBy(container) routes each container's
      // entire history through one reducer task — one chatty container
      // serializes the sweep at scale. Sequence numbers are unique per
      // container (the reference's ROWID contract), so `rank ≤ k` ⟺
      // `seq ≥ k-th largest seq`; the k-bounded heap aggregate partials
      // map-side and the container→threshold row set broadcasts back as
      // a plain filter. Quotas beyond the heap cap (k longs per group in
      // the agg buffer) fall back to the rank window.
      if (k <= 0L) {
        // quota "keep 0 newest" deletes everything (rank <= 0 semantics)
        out = out.where(lit(false))
      } else if (k <= 1000000L) {
        val thr = out.groupBy(col(containerCol))
          .agg(graft.functions.KthLargestAgg
            .kthLargest(col(seqCol).cast("long"), k.toInt).as("__thr"))
          .withColumnRenamed(containerCol, "__thr_c")
        // null-safe key match: the rank window treated a null container as
        // its own group, an equi-join would silently drop those rows.
        // The threshold side is container-cardinality-sized — forced
        // broadcast only below the same stats gate packSequences uses;
        // past it, AQE picks the join (and its skew split handles a
        // chatty-container key far better than the old per-key window).
        val thrB =
          if (out.queryExecution.optimizedPlan.stats.sizeInBytes <=
            BigInt(256L << 20)) broadcast(thr)
          else thr
        out = out.join(thrB, col(containerCol) <=> col("__thr_c"))
          .where(col(seqCol) >= col("__thr"))
          .drop("__thr_c", "__thr")
      } else {
        val w = Window.partitionBy(col(containerCol)).orderBy(col(seqCol).desc)
        out = out
          .withColumn("__rank_from_newest", row_number().over(w))
          .where(col("__rank_from_newest") <= k)
          .drop("__rank_from_newest")
      }
    }
    ageCutoff.foreach(c => out = out.where(tsNanoGeq(logs, tsNanoCol, nanos(c))))
    out
  }

  /** Per-container sequence-uniqueness audit. The newest-k retention
    * threshold above ([[retentionSurvivors]]) keeps `seq >= k-th largest
    * seq`, which equals "newest k" ONLY under the reference's per-container
    * ROWID uniqueness contract — a duplicated seq (e.g. a replayed ingest
    * batch that bypassed the manifest gate) would over-retain SILENTLY.
    * This audit makes the contract checkable: `seq_unique = false` rows
    * are the containers where threshold-retention semantics degraded.
    * One hash rollup + a distinct expand per container; audit-grade cost.
    */
  def seqUniquenessAudit(
      logs: DataFrame, containerCol: String, seqCol: String): DataFrame =
    logs.groupBy(col(containerCol))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(seqCol)).as("n_distinct_seq"))
      .withColumn("n_dup_seq", col("n_rows") - col("n_distinct_seq"))
      .withColumn("seq_unique", col("n_dup_seq") === 0L)
      .orderBy(col(containerCol))
}
