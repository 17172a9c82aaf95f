package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator of SURVEY.md §2 (reference surface + north-star
  * extensions) is registered here as a named query over the driver parquet
  * fixtures, with a DuckDB ANSI-SQL twin in [[oracleSql]] where the
  * semantics are SQL-expressible (engine-specific hash functions — MinHash/
  * SimHash/LSH — and the stubbed media decode get rows-only checks).
  *
  * Determinism rules applied throughout (FIXTURES.md "Harness wiring"):
  * unique-key ORDER BY on every row-level result, exact (not approx)
  * distinct, doubles rounded, timestamps exposed as epoch-millis BIGINT,
  * DuckDB integer sums cast to BIGINT to match Spark's LongType.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): the
    * reference's raison d'être — "logs of container X between t1 and t2,
    * last k lines, in order" (SURVEY.md §7 minimum slice).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_log_tail_range")(spark, "/root/testdata/sf0.001")

  private type Q = (SparkSession, String) => DataFrame

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  private val evCols = Seq(
    col("event_id"), unix_millis(col("ts")).as("ts_ms"),
    col("user_id"), col("event_type"), col("value"))

  // ---- core log-query pack (reference semantics, SURVEY §2.1) -----------

  private val logQueries: Map[String, Q] = Map(
    "q_log_range" -> ((s, d) =>
      LogOps.readRange(ev(s, d), "user_id", "event_id", "ts_nano",
          LogOps.normalize(Some(42L), Some("2024-01-10T00:00:00Z"),
            Some("2024-01-20T00:00:00Z"), tail = 0, follow = false))
        .select(evCols: _*)),
    "q_log_tail" -> ((s, d) =>
      LogOps.readRange(ev(s, d), "user_id", "event_id", "ts_nano",
          LogOps.normalize(Some(7L), None, None, tail = 50, follow = false))
        .select(evCols: _*)),
    "q_log_tail_range" -> ((s, d) =>
      LogOps.readRange(ev(s, d), "user_id", "event_id", "ts_nano",
          LogOps.normalize(Some(7L), Some("2024-01-05T00:00:00Z"),
            Some("2024-01-25T00:00:00Z"), tail = 25, follow = false))
        .select(evCols: _*)),
    "q_log_count" -> ((s, d) => {
      val e = ev(s, d)
      LogOps.countByContainer(e, "user_id",
          LogOps.tsNanoGeq(e, "ts_nano", LogOps.nanos(java.time.Instant.parse("2024-01-10T00:00:00Z"))) &&
          LogOps.tsNanoLeq(e, "ts_nano", LogOps.nanos(java.time.Instant.parse("2024-01-15T00:00:00Z"))))
        .orderBy(col("user_id"))
    }),
    "q_log_page" -> ((s, d) =>
      LogOps.page(ev(s, d), "event_id", offset = 500, limit = 100)
        .select(evCols: _*)),
    "q_log_retention_age" -> ((s, d) =>
      LogOps.retentionSurvivors(ev(s, d), "user_id", "event_id", "ts_nano",
          ageCutoff = Some(java.time.Instant.parse("2024-01-15T00:00:00Z")),
          maxLines = None)
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
        .orderBy(col("event_id"))),
    "q_log_retention_lines" -> ((s, d) =>
      LogOps.retentionSurvivors(ev(s, d), "user_id", "event_id", "ts_nano",
          ageCutoff = None, maxLines = Some(20L))
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
        .orderBy(col("event_id"))),
    "q_log_retention_both" -> ((s, d) =>
      LogOps.retentionSurvivors(ev(s, d), "user_id", "event_id", "ts_nano",
          ageCutoff = Some(java.time.Instant.parse("2024-01-10T00:00:00Z")),
          maxLines = Some(40L))
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
        .orderBy(col("event_id"))),
    // NOT width-pinned (r15, measured): a ≥300k-events row-gated pin
    // before the regex normalize read 1.54 → 2.36 s b2b at the ×10
    // fixture — the roundrobin exchange of the full (type, props) rows
    // outprices the serial regex stage it parallelizes; the groupBy's
    // map-side partial agg already bounds what crosses the real shuffle
    "q_log_templates" -> ((s, d) =>
      LogOps.templates(ev(s, d), "user_id", "event_id", "ts_nano",
        concat_ws(" ", col("event_type"), col("props")))),
    // Partial-line reassembly proven as a ROUND TRIP on real data: chunk
    // every document's text into 256-char Docker-style fragments (multi-
    // chunk docs get partial metadata, single-chunk docs take the
    // passthrough path), reassemble, and the digest must equal md5 of the
    // original text — which is exactly what the twin computes without ever
    // seeing a fragment.
    "q_log_partials" -> ((s, d) => {
      val chunk = 256
      // NOT width-pinned (r15, measured): a ≥20k-docs row-gated pin on
      // the fragmentation explode read 1.45 → 1.63 s b2b at the ×10
      // fixture — the reassembly windows (partial_id ordering), not the
      // per-row chunking map, are this query's cost
      val exploded = Tables.documents(s, d).select(
        col("doc_id"),
        expr(s"posexplode(transform(sequence(0, int((greatest(length(text), 1) - 1) div $chunk)), i -> substring(text, i * $chunk + 1, $chunk)))")
          .as(Seq("ord", "frag")),
        expr(s"int((greatest(length(text), 1) - 1) div $chunk)").as("max_ord"))
      val logShaped = exploded.select(
        lit("c0").as("container_id"),
        (col("doc_id") * 100000L + col("ord")).as("seq"),
        (col("doc_id") * 100000L + col("ord")).as("ts_nano"),
        col("frag").as("message"),
        (col("max_ord") > 0).as("partial"),
        when(col("max_ord") > 0, col("doc_id").cast("string")).as("partial_id"),
        when(col("max_ord") > 0, col("ord") === col("max_ord")).as("partial_last"),
        when(col("max_ord") > 0, col("ord").cast("int")).as("partial_ordinal"))
      LogOps.reassemblePartials(logShaped, "container_id", "seq", "ts_nano", "message")
        .select(expr("CAST(seq div 100000 AS BIGINT)").as("doc_id"),
          col("n_frags"), col("complete"),
          length(col("logical_line")).cast("long").as("n_chars"),
          md5(col("logical_line")).as("digest"))
        .orderBy(col("doc_id"))
    }),
    // Retention-contract audit: newest-k threshold retention is exact only
    // if seq is unique per container (ADVICE r10) — surface violations
    // instead of letting them over-retain silently.
    "q_log_seq_audit" -> ((s, d) =>
      LogOps.seqUniquenessAudit(ev(s, d), "user_id", "event_id")),
    // The reference's on-disk artifact, reproduced: one SQLite db per
    // container (logs(ts, message) + idx_ts, rowid = ingest order) written
    // by graft's own format writer; the summary's (n_rows, xor-of-ts)
    // write receipt is what the twin checks, and SqliteExportSpec
    // validates the bytes with a real SQLite (PRAGMA integrity_check).
    // Scoped to 200 containers — the face is the format, not bulk volume.
    "q_log_sqlite_export" -> ((s, d) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_sqlite_q").toString
      graft.sources.SqliteLogExport.export(
        ev(s, d).where(col("user_id") < 200)
          .select(col("user_id").as("container_id"),
            col("event_id").as("seq"), col("ts_nano"),
            concat_ws(" ", col("event_type"), col("props"))
              .cast("binary").as("message")),
        out)
        .toDF()
        .select(col("container_id").cast("long").as("container_id"),
          col("n_rows"), col("ts_xor"))
        .orderBy(col("container_id"))
    }),
    // Writer→reader ROUND TRIP at the query layer: export a container
    // subset to SQLite files, walk them back with the pure-Scala b-tree
    // reader (the logsqlite MIGRATION path), and hash the recovered
    // content — the twin computes the same receipts from the source rows,
    // so any byte lost or reordered across the two format codecs fails
    // the driver gate.
    "q_log_sqlite_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_sqlite_rt").toString
      val logsIn = ev(s, d).where(col("user_id") < 50)
        .select(col("user_id").as("container_id"),
          col("event_id").as("seq"), col("ts_nano"),
          concat_ws(" ", col("event_type"), col("props"))
            .cast("binary").as("message"))
      graft.sources.SqliteLogExport.export(logsIn, out).collect()
      graft.sources.SqliteLogImport.read(s, out)
        .groupBy(col("container_id").cast("long").as("container_id"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(ts_nano)").as("ts_xor"),
          expr("bit_xor(cast(conv(substring(md5(message), 1, 15), 16, 10) as bigint))")
            .as("msg_xor"))
        .orderBy(col("container_id"))
    }))

  private val logOracles: Map[String, String] = Map(
    "q_log_sqlite_export" ->
      """SELECT user_id AS container_id, count(*) AS n_rows,
        |  bit_xor(epoch_ns(ts)) AS ts_xor
        |FROM events WHERE user_id < 200
        |GROUP BY user_id ORDER BY container_id""".stripMargin,
    "q_log_sqlite_roundtrip" ->
      """SELECT user_id AS container_id, count(*) AS n_rows,
        |  bit_xor(epoch_ns(ts)) AS ts_xor,
        |  bit_xor(CAST(('0x' || substr(md5(event_type || ' ' || props), 1, 15))
        |    AS BIGINT)) AS msg_xor
        |FROM events WHERE user_id < 50
        |GROUP BY user_id ORDER BY container_id""".stripMargin,
    "q_log_seq_audit" ->
      """SELECT user_id, count(*) AS n_rows,
        |  count(DISTINCT event_id) AS n_distinct_seq,
        |  count(*) - count(DISTINCT event_id) AS n_dup_seq,
        |  (count(*) = count(DISTINCT event_id)) AS seq_unique
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_log_range" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM events
        |WHERE user_id = 42
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q_log_tail" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM (SELECT * FROM events WHERE user_id = 7
        |      ORDER BY event_id DESC LIMIT 50)
        |ORDER BY event_id""".stripMargin,
    "q_log_tail_range" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM (SELECT * FROM events
        |      WHERE user_id = 7
        |        AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        |        AND ts <= TIMESTAMP '2024-01-25 00:00:00'
        |      ORDER BY event_id DESC LIMIT 25)
        |ORDER BY event_id""".stripMargin,
    "q_log_count" ->
      """SELECT user_id, count(*) AS n FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_log_page" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM events ORDER BY event_id LIMIT 100 OFFSET 500""".stripMargin,
    "q_log_retention_age" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id""".stripMargin,
    "q_log_retention_lines" ->
      """SELECT event_id, user_id, ts_ms FROM (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn <= 20 ORDER BY event_id""".stripMargin,
    "q_log_retention_both" ->
      """SELECT event_id, user_id, ts_ms FROM (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, ts,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 40 AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q_log_templates" ->
      """SELECT regexp_replace(event_type || ' ' || props, '[0-9]+', '<N>', 'g') AS template,
        |       count(*) AS n,
        |       count(DISTINCT user_id) AS n_containers,
        |       min(epoch_ms(ts)) AS first_ms,
        |       max(epoch_ms(ts)) AS last_ms,
        |       min(event_id) AS example_seq
        |FROM events
        |GROUP BY template
        |ORDER BY n DESC, template""".stripMargin,
    "q_log_partials" ->
      """SELECT doc_id,
        |  CAST((greatest(length(text), 1) + 255) // 256 AS INTEGER)
        |    AS n_frags,
        |  true AS complete,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin)

  // ---- relational pack (SURVEY §2.3 star schema) -------------------------

  private val relQueries: Map[String, Q] = Map(
    "q_rel_pricing_summary" -> (RelationalOps.pricingSummary _),
    "q_rel_revenue_by_nation" -> (RelationalOps.revenueByNation _),
    "q_rel_semi_join" -> (RelationalOps.customersWithUrgentOrders _),
    "q_rel_anti_join" -> (RelationalOps.dormantCustomers _),
    "q_rel_rollup" -> (RelationalOps.rollupReturns _),
    "q_rel_cube" -> (RelationalOps.cubeReturns _),
    "q_rel_quantiles" -> (RelationalOps.priceQuantiles _),
    "q_rel_distinct_approx" -> (RelationalOps.distinctPartsApprox _),
    "q_rel_distinct_merge" -> (RelationalOps.distinctMergeAudit _),
    "q_rel_quantiles_approx" -> (RelationalOps.priceQuantilesApprox _),
    "q_rel_window_rank" -> (RelationalOps.top3OrdersPerCustomer _),
    "q_rel_window_running" -> (RelationalOps.runningRevenue _),
    "q_rel_window_range" -> (RelationalOps.movingRevenue _),
    "q_rel_argmax" -> (RelationalOps.topCustomerPerNation _),
    "q_rel_topk" -> (RelationalOps.topOrders _),
    "q_rel_setops" -> (RelationalOps.buyerCohorts _),
    "q_rel_distinct_agg" -> (RelationalOps.distinctPartsPerFlag _),
    "q_rel_asof_lastclick" -> (RelationalOps.lastClickBeforeError _),
    "q_rel_subquery" -> (RelationalOps.partsAboveBrandAvg _),
    "q_rel_window_nav" -> (RelationalOps.orderTimeline _),
    "q_scalar_string" -> (ScalarOps.stringFuncs _),
    "q_scalar_date" -> (ScalarOps.dateFuncs _),
    "q_scalar_math" -> (ScalarOps.mathFuncs _),
    "q_scalar_cond" -> (ScalarOps.condFuncs _))

  private val relOracles: Map[String, String] = Map(
    "q_rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rel_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_rel_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_rel_anti_join" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q_rel_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_rel_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_rel_quantiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rel_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_rel_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders WHERE o_custkey <= 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // Deterministic arg-max: ties on the value break on the key (the
    // struct-max rule), mirrored via row_number over (value DESC, key DESC)
    "q_rel_argmax" ->
      """WITH j AS (
        |  SELECT n_name, c_custkey, c_acctbal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |best AS (
        |  SELECT n_name, c_custkey AS top_custkey,
        |         round(c_acctbal, 2) AS top_acctbal
        |  FROM (SELECT n_name, c_custkey, c_acctbal,
        |          row_number() OVER (PARTITION BY n_name
        |            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        |        FROM j) WHERE rn = 1),
        |st AS (SELECT n_name, count(*) AS n_customers,
        |         CASE WHEN sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) >= 0
        |           THEN ((2 * sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
        |                  + count(*)) // (2 * count(*)))::DOUBLE / 100.0
        |           ELSE -(((-2) * sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
        |                  + count(*)) // (2 * count(*)))::DOUBLE / 100.0
        |         END AS avg_acctbal
        |       FROM j GROUP BY n_name)
        |SELECT n_name, top_custkey, top_acctbal, n_customers, avg_acctbal
        |FROM best JOIN st USING (n_name) ORDER BY n_name""".stripMargin,
    // RANGE frame keyed on epoch-ms: 30 days = 2 592 000 000 ms exactly
    "q_rel_window_range" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS ms,
        |  count(*) OVER w AS n_30d,
        |  round(sum(o_totalprice) OVER w, 2) AS rev_30d
        |FROM orders WHERE o_custkey <= 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
        |             RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, ms, o_orderkey""".stripMargin,
    "q_rel_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_rel_setops" ->
      """WITH b95 AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |               AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
        |     b96 AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
        |SELECT o_custkey, cohort FROM (
        |  SELECT o_custkey, 'both' AS cohort
        |  FROM (SELECT o_custkey FROM b95 INTERSECT SELECT o_custkey FROM b96)
        |  UNION ALL
        |  SELECT o_custkey, 'only_1995' AS cohort
        |  FROM (SELECT o_custkey FROM b95 EXCEPT SELECT o_custkey FROM b96))
        |ORDER BY cohort, o_custkey""".stripMargin,
    "q_rel_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // sketch-calibration audits: exact yardsticks recomputed, tolerance
    // verdicts asserted TRUE (the sketch bits themselves are engine-local;
    // the accuracy CONTRACT is what the oracle pins)
    "q_rel_distinct_approx" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  TRUE AS parts_ok, TRUE AS supps_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the sketch union's accuracy contract is the pinned TRUE (the
    // distinct_approx convention); exact counts are replayed exactly
    "q_rel_distinct_merge" ->
      """WITH dd AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
        |per AS (SELECT l_returnflag, count(*) AS n_exact FROM dd GROUP BY 1)
        |SELECT (SELECT count(*) FROM per) AS n_groups,
        |  (SELECT CAST(sum(n_exact) AS BIGINT) FROM per) AS sum_group_exact,
        |  (SELECT count(DISTINCT l_partkey) FROM dd) AS global_exact,
        |  TRUE AS merged_ok""".stripMargin,
    "q_rel_quantiles_approx" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
        |  TRUE AS p50_ok, TRUE AS p95_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rel_asof_lastclick" ->
      """SELECT event_id, user_id, prior_click_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_click_id
        |  FROM events WHERE event_type IN ('error', 'click'))
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
    "q_rel_skew_audit" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events
        |           GROUP BY user_id),
        |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
        |             count(*) AS n_keys FROM c)
        |SELECT user_id, cnt,
        |  round(cnt::DOUBLE / total_rows, 6) AS share,
        |  round(cnt::DOUBLE * n_keys / total_rows, 4) AS skew_factor,
        |  total_rows, n_keys
        |FROM c, s ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin,
    "q_rel_order_dist" ->
      """SELECT c_count, count(*) AS n_custs FROM (
        |  SELECT c.c_custkey,
        |    CAST(coalesce(count(o.o_orderkey), 0) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY c_count""".stripMargin,
    "q_rel_profile" ->
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  round(CAST(min(o_orderkey) AS DOUBLE), 4) AS min_num,
        |  round(CAST(max(o_orderkey) AS DOUBLE), 4) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_custkey),
        |  round(CAST(min(o_custkey) AS DOUBLE), 4),
        |  round(CAST(max(o_custkey) AS DOUBLE), 4),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderstatus),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*),
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_totalprice),
        |  round(CAST(min(o_totalprice) AS DOUBLE), 4),
        |  round(CAST(max(o_totalprice) AS DOUBLE), 4),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*),
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderdate),
        |  CAST(epoch_ms(min(o_orderdate)) AS DOUBLE),
        |  CAST(epoch_ms(max(o_orderdate)) AS DOUBLE),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderpriority),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  min(o_orderpriority), max(o_orderpriority)
        |FROM orders
        |ORDER BY col_name""".stripMargin,
    "q_rel_integrity" ->
      """SELECT 'lineitem_without_order' AS check, count(*) AS n_violations
        |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |UNION ALL
        |SELECT 'order_without_lineitem', count(*)
        |FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        |UNION ALL
        |SELECT 'order_without_customer', count(*)
        |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'customer_without_nation', count(*)
        |FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |ORDER BY "check"""".stripMargin,
    "q_rel_q6_discount" ->
      """SELECT count(*) AS n_items,
        |  round(sum(l_extendedprice * l_discount), 2) AS revenue_effect
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.08
        |  AND l_quantity < 24""".stripMargin,
    "q_rel_q3_shipping" ->
      """SELECT o.o_orderkey, epoch_ms(o.o_orderdate) AS o_date_ms,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
        |  AND l.l_shipdate  > TIMESTAMP '1996-06-01 00:00:00'
        |GROUP BY o.o_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_rel_q18_bigorders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
        |SELECT c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
        |  o_totalprice, round(qty, 2) AS total_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_rel_q14_promo" ->
      """WITH m AS (
        |  SELECT epoch_ms(date_trunc('month', l_shipdate)) AS month_ms,
        |    round(sum(CASE WHEN p_type = 'PROMO'
        |              THEN l_extendedprice * (1.0 - l_discount)
        |              ELSE 0.0 END), 2) AS promo_revenue,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT month_ms, promo_revenue, revenue,
        |  round(100.0 * promo_revenue / revenue, 4) AS promo_share
        |FROM m ORDER BY month_ms""".stripMargin,
    "q_rel_q2_mincost" ->
      """WITH unit AS (
        |  SELECT l_partkey, l_suppkey,
        |    round(l_extendedprice / l_quantity, 6) AS u
        |  FROM lineitem),
        |ps AS (SELECT l_partkey, l_suppkey, min(u) AS pair_best
        |       FROM unit GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY l_partkey ORDER BY pair_best, l_suppkey) AS rn
        |      FROM ps)
        |SELECT p.p_partkey, p.p_brand, r.l_suppkey AS s_suppkey, s.s_name,
        |  n.n_name, rg.r_name, r.pair_best AS best_price
        |FROM r
        |JOIN part p ON r.l_partkey = p.p_partkey
        |JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region rg ON n.n_regionkey = rg.r_regionkey
        |WHERE r.rn = 1 ORDER BY p.p_partkey""".stripMargin,
    "q_rel_q10_returns" ->
      """WITH agg AS (
        |  SELECT o_custkey,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS ret_revenue,
        |    count(*) AS n_items
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, n_name, ret_revenue, n_items
        |FROM agg
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY ret_revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_rel_q4_late" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rel_q5_region" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_rel_q7_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS yr,
        |  CAST((sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0)
        |                 AS BIGINT)) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_rel_q8_share" ->
      """WITH v AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    round(sum(CASE WHEN sn.n_name = 'NATION_3'
        |              THEN l_extendedprice * (1.0 - l_discount)
        |              ELSE 0.0 END), 2) AS nation_revenue,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA'
        |  GROUP BY 1)
        |SELECT yr, nation_revenue, total_revenue,
        |  round(100.0 * nation_revenue / total_revenue, 4) AS mkt_share
        |FROM v ORDER BY yr""".stripMargin,
    "q_rel_q9_profit" ->
      """SELECT n_name, CAST(year(l_shipdate) AS INTEGER) AS yr,
        |  round(sum(l_extendedprice * (1.0 - l_discount)
        |            - 0.5 * p_retailprice * l_quantity), 2) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_rel_q15_topsupp" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM r)
        |ORDER BY s_suppkey""".stripMargin,
    "q_rel_q17_smallqty" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |a AS (SELECT l_partkey AS ak, round(avg(l_quantity), 6) AS avg_qty
        |      FROM li GROUP BY 1)
        |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM li JOIN a ON l_partkey = ak
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q_rel_q19_bands" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 20
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 30
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_rel_q21_waiting" ->
      """WITH pair AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |             THEN 1 ELSE 0 END) AS was_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |v AS (SELECT l_orderkey FROM pair GROUP BY 1
        |      HAVING count(*) >= 2 AND sum(was_late) = 1)
        |SELECT s_suppkey, s_name, count(*) AS n_waiting_orders
        |FROM pair JOIN v USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE was_late = 1
        |GROUP BY 1, 2
        |ORDER BY n_waiting_orders DESC, s_suppkey LIMIT 10""".stripMargin,
    "q_rel_q11_important" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS rev_c
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(rev_c) AS total_c, count(*) AS n_parts FROM pp)
        |SELECT p_partkey, p_name, rev_c::DOUBLE / 100.0 AS revenue
        |FROM pp CROSS JOIN t
        |JOIN part ON l_partkey = p_partkey
        |WHERE rev_c::HUGEINT * 2 * n_parts > total_c::HUGEINT * 3
        |ORDER BY revenue DESC, p_partkey""".stripMargin,
    "q_rel_q16_diversity" ->
      """SELECT p_type, CAST(p_size // 10 AS INTEGER) AS size_bucket,
        |  count(DISTINCT l_suppkey) AS n_suppliers
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#9'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_rel_q20_dominant" ->
      """WITH pq AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS q_pair
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%gear%'
        |  GROUP BY 1, 2),
        |t AS (SELECT l_partkey, sum(q_pair) AS q_total FROM pq GROUP BY 1),
        |sh AS (SELECT pq.l_partkey, pq.l_suppkey,
        |         CAST(round(q_pair / q_total * 1000000.0, 0) AS BIGINT) AS sq,
        |         row_number() OVER (PARTITION BY pq.l_partkey
        |           ORDER BY q_pair DESC, pq.l_suppkey) AS rn
        |       FROM pq JOIN t USING (l_partkey))
        |SELECT s_suppkey, s_name, count(*) AS n_led_parts,
        |  ((2 * sum(sq) + count(*)) // (2 * count(*)))::DOUBLE / 1000000.0
        |    AS mean_led_share
        |FROM sh JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rn = 1
        |GROUP BY 1, 2 ORDER BY s_suppkey""".stripMargin,
    "q_rel_q12_priority" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_rel_q22_idle_rich" ->
      """WITH ab AS (SELECT avg(c_acctbal) AS avg_bal FROM customer
        |            WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, count(*) AS n_custs,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer CROSS JOIN ab
        |WHERE c_acctbal > round(avg_bal, 2)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_rel_histogram" ->
      """SELECT bucket, count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo_price,
        |  round(max(o_totalprice), 2) AS hi_price,
        |  round(CAST(bucket AS DOUBLE) * 30000.0, 2) AS bucket_lo
        |FROM (SELECT o_totalprice,
        |        CAST(least(floor(o_totalprice / 30000.0), 19) AS INTEGER) AS bucket
        |      FROM orders)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_rel_outliers" ->
      """WITH q AS (SELECT o_orderpriority,
        |    quantile_cont(o_totalprice, 0.25) AS q1,
        |    quantile_cont(o_totalprice, 0.75) AS q3
        |  FROM orders GROUP BY o_orderpriority),
        |f AS (SELECT o_orderpriority, q1, q3,
        |        q1 - (q3 - q1) * 1.5 AS lo_fence,
        |        q3 + (q3 - q1) * 1.5 AS hi_fence
        |      FROM q)
        |SELECT o.o_orderpriority, count(*) AS n,
        |  round(any_value(f.q1), 2) AS q1, round(any_value(f.q3), 2) AS q3,
        |  CAST(sum(CASE WHEN o.o_totalprice < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low,
        |  CAST(sum(CASE WHEN o.o_totalprice > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_high
        |FROM orders o JOIN f USING (o_orderpriority)
        |GROUP BY o.o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rel_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    // Quintiles via broadcast boundaries, not ntile — see
    // RelationalOps.rfmSegments; boundary ties score low on both engines.
    "q_rel_rfm" ->
      """WITH pc AS (SELECT o_custkey, max(epoch_ms(o_orderdate)) AS last_ms,
        |              count(*) AS n_orders,
        |              round(sum(o_totalprice), 2) AS monetary
        |            FROM orders GROUP BY o_custkey),
        |ref AS (SELECT max(last_ms) AS ref_ms FROM pc),
        |rc AS (SELECT o_custkey AS c_custkey,
        |         CAST((ref_ms - last_ms) // 86400000 AS INTEGER) AS recency_days,
        |         n_orders, monetary
        |       FROM pc, ref),
        |b AS (SELECT
        |  round(quantile_cont(recency_days, 0.2), 4) AS r20,
        |  round(quantile_cont(recency_days, 0.4), 4) AS r40,
        |  round(quantile_cont(recency_days, 0.6), 4) AS r60,
        |  round(quantile_cont(recency_days, 0.8), 4) AS r80,
        |  round(quantile_cont(n_orders, 0.2), 4) AS f20,
        |  round(quantile_cont(n_orders, 0.4), 4) AS f40,
        |  round(quantile_cont(n_orders, 0.6), 4) AS f60,
        |  round(quantile_cont(n_orders, 0.8), 4) AS f80,
        |  round(quantile_cont(monetary, 0.2), 4) AS m20,
        |  round(quantile_cont(monetary, 0.4), 4) AS m40,
        |  round(quantile_cont(monetary, 0.6), 4) AS m60,
        |  round(quantile_cont(monetary, 0.8), 4) AS m80
        |FROM rc),
        |scored AS (SELECT c_custkey, recency_days, n_orders, monetary,
        |  1 + CASE WHEN recency_days < r80 THEN 1 ELSE 0 END
        |    + CASE WHEN recency_days < r60 THEN 1 ELSE 0 END
        |    + CASE WHEN recency_days < r40 THEN 1 ELSE 0 END
        |    + CASE WHEN recency_days < r20 THEN 1 ELSE 0 END AS r,
        |  1 + CASE WHEN n_orders > f20 THEN 1 ELSE 0 END
        |    + CASE WHEN n_orders > f40 THEN 1 ELSE 0 END
        |    + CASE WHEN n_orders > f60 THEN 1 ELSE 0 END
        |    + CASE WHEN n_orders > f80 THEN 1 ELSE 0 END AS f,
        |  1 + CASE WHEN monetary > m20 THEN 1 ELSE 0 END
        |    + CASE WHEN monetary > m40 THEN 1 ELSE 0 END
        |    + CASE WHEN monetary > m60 THEN 1 ELSE 0 END
        |    + CASE WHEN monetary > m80 THEN 1 ELSE 0 END AS m
        |FROM rc, b)
        |SELECT c_custkey, recency_days, n_orders, monetary, r, f, m,
        |  r * 100 + f * 10 + m AS segment
        |FROM scored ORDER BY c_custkey""".stripMargin)

  private val subqueryOracles: Map[String, String] = Map(
    "q_rel_subquery" ->
      """SELECT p.p_partkey, p.p_brand, round(p.p_retailprice, 2) AS price
        |FROM part p
        |WHERE p.p_retailprice > (SELECT avg(p2.p_retailprice) * 1.05
        |                         FROM part p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p.p_partkey""".stripMargin,
    "q_rel_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  first_value(o_orderkey) OVER w AS first_order
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)

  private val scalarOracles: Map[String, String] = Map(
    "q_scalar_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substring(p_name, 1, 4) AS name_prefix,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
        |  lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
        |  translate(p_type, 'AEIOU', 'aeiou') AS type_lowered_vowels,
        |  p_brand || '/' || p_type AS brand_type,
        |  reverse(p_name) AS name_rev,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
        |  CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INTEGER)
        |    AS days_to_y2k,
        |  epoch_ms(o_orderdate + INTERVAL 90 DAY) AS due_ms,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,
    // Portable-regex subset (classes/quantifiers/groups) — Java regex and
    // RE2 agree; DuckDB regexp_replace needs the 'g' flag to match
    // Spark's replace-all semantics
    "q_scalar_regex" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_numbers,
        |  COALESCE(CASE WHEN length(regexp_extract(text, '([0-9]+)', 1))
        |                     BETWEEN 1 AND 18
        |                THEN CAST(regexp_extract(text, '([0-9]+)', 1) AS BIGINT)
        |           END, -1) AS first_number,
        |  substr(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 40)
        |    AS masked_prefix,
        |  regexp_matches(text, '[aeiou]{3}') AS has_vowel_run,
        |  CAST(len(regexp_extract_all(text, '[a-z]+[0-9]')) AS INTEGER)
        |    AS n_alnum_borders,
        |  CAST(len(string_split_regex(text, '[0-9]+')) AS INTEGER)
        |    AS n_nonnum_segments
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(-l_extendedprice), 2) AS abs_price,
        |  round(sqrt(l_extendedprice), 4) AS sqrt_price,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(power(l_tax + 1, 2), 6) AS tax_factor_sq,
        |  l_orderkey % 7 AS key_mod7,
        |  CAST(sign(l_quantity - 25) AS INTEGER) AS qty_side
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scalar_cond" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'R' THEN 'returned'
        |       WHEN l_linestatus = 'O' THEN 'open' ELSE 'closed' END AS status_class,
        |  round(coalesce(nullif(l_tax, 0.0), l_discount), 2) AS tax_or_disc,
        |  round(greatest(l_tax, l_discount), 2) AS rate_hi,
        |  round(least(l_tax, l_discount), 2) AS rate_lo,
        |  l_quantity > 30 AS bulk
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // ---- time-series pack ---------------------------------------------------

  private val tsQueries: Map[String, Q] = Map(
    "q_ts_hourly" -> (TimeSeriesOps.hourlyByType _),
    "q_ts_hourly_dense" -> (TimeSeriesOps.hourlyDense _),
    "q_ts_hourly_increment" -> (TimeSeriesOps.hourlyIncrement _),
    "q_ts_sliding" -> (TimeSeriesOps.slidingActivity _),
    "q_ts_sessions" -> (TimeSeriesOps.sessions _),
    "q_ts_props_stats" -> (TimeSeriesOps.propsKeyStats _),
    "q_ts_purchase_props" -> (TimeSeriesOps.purchaseProps _),
    "q_ts_user_diversity" -> ((s, d) => EventAnalyticsOps.userDiversity(s, d)),
    "q_ts_trend" -> ((s, d) => TimeSeriesOps.trendFit(s, d)),
    "q_ts_autocorr" -> ((s, d) => TimeSeriesOps.dailyAutocorr(s, d)),
    "q_ts_slo_burn" -> ((s, d) => TimeSeriesOps.sloBurnRate(s, d)),
    "q_ts_pivot" -> (TimeSeriesOps.eventTypePivot _),
    "q_ts_range_join" -> ((s, d) => TimeSeriesOps.eventsNearErrors(s, d)),
    "q_ts_seasonality" -> (TimeSeriesOps.seasonality _),
    "q_ts_forecast" -> ((s, d) => TimeSeriesOps.forecastBacktest(s, d)),
    "q_ts_changepoints" -> ((s, d) => TimeSeriesOps.changepoints(s, d)),
    "q_ts_funnel" -> (EventAnalyticsOps.funnel _),
    "q_ts_cohort" -> (EventAnalyticsOps.cohortRetention _),
    "q_ts_transitions" -> (EventAnalyticsOps.transitionMatrix _),
    "q_ts_anomaly" -> ((s, d) => TimeSeriesOps.anomalies(s, d)),
    "q_ts_paths" -> ((s, d) => EventAnalyticsOps.topPaths(s, d)),
    "q_ts_funnel_timing" -> (EventAnalyticsOps.funnelTiming _),
    "q_ts_rolling_actives" -> ((s, d) => EventAnalyticsOps.rollingActives(s, d)),
    "q_ts_interarrival" -> (EventAnalyticsOps.interArrival _),
    "q_ts_concentration" -> (EventAnalyticsOps.activityConcentration _),
    "q_ts_attribution" -> (EventAnalyticsOps.lastTouchAttribution _),
    "q_ts_independence" -> (EventAnalyticsOps.typeDayIndependence _),
    "q_ts_predictability" -> (EventAnalyticsOps.transitionPredictability _),
    "q_ts_dispersion" -> (TimeSeriesOps.hourlyDispersion _),
    "q_ts_baskets" -> ((s, d) => EventAnalyticsOps.sessionBaskets(s, d)))

  private val tsOracles: Map[String, String] = Map(
    "q_ts_predictability" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS from_type
        |  FROM events),
        |cells AS (SELECT from_type, event_type AS to_type, count(*) AS n
        |          FROM o WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |top AS (SELECT from_type, to_type AS top_next, n AS top_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY from_type
        |      ORDER BY n DESC, to_type DESC) AS rn FROM cells) WHERE rn = 1),
        |agg AS (SELECT from_type, sum(n) AS n_transitions,
        |          count(*) AS n_next_types
        |        FROM cells GROUP BY 1)
        |SELECT a.from_type,
        |  CAST(a.n_transitions AS BIGINT) AS n_transitions,
        |  CAST(a.n_next_types AS BIGINT) AS n_next_types,
        |  t.top_next, CAST(t.top_n AS BIGINT) AS top_n,
        |  CAST((2 * 1000000 * t.top_n + a.n_transitions)
        |    // (2 * a.n_transitions) AS DOUBLE) / 1e6 AS top1_acc
        |FROM agg a JOIN top t ON a.from_type = t.from_type
        |ORDER BY a.from_type""".stripMargin,
    "q_ts_dispersion" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |             count(*) AS c
        |           FROM events GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM h),
        |agg AS (SELECT event_type, sum(c) AS s,
        |          sum(c::HUGEINT * c::HUGEINT) AS q, count(*) AS nz
        |        FROM h GROUP BY 1),
        |wb AS (SELECT *, (epoch_ms(h1) - epoch_ms(h0)) // 3600000 + 1 AS n
        |       FROM agg CROSS JOIN b)
        |SELECT event_type,
        |  CAST(n AS BIGINT) AS n_hours,
        |  CAST(nz AS BIGINT) AS nonzero_hours,
        |  CAST(s AS BIGINT) AS n_events,
        |  CAST((2 * 1000000 * s + n) // (2 * n) AS DOUBLE) / 1e6
        |    AS mean_per_hour,
        |  CAST((2 * 1000000 * (n::HUGEINT * q - s::HUGEINT * s::HUGEINT)
        |        + n::HUGEINT * s)
        |    // (2 * n::HUGEINT * s) AS DOUBLE) / 1e6 AS dispersion
        |FROM wb ORDER BY event_type""".stripMargin,
    "q_ts_hourly" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_ms, event_type""".stripMargin,
    "q_ts_forecast" ->
      """WITH ev AS (SELECT event_type, ts,
        |              CAST(isodow(ts) AS INTEGER) AS iso_dow,
        |              CAST(hour(ts) AS INTEGER) AS hr,
        |              date_trunc('hour', ts) AS hour_ts
        |            FROM events),
        |sp AS (SELECT date_trunc('day', max(ts)) - INTERVAL 7 DAY AS split_ts
        |       FROM ev),
        |hourly AS (SELECT event_type, hour_ts, iso_dow, hr,
        |             hour_ts >= split_ts AS is_test, count(*) AS n
        |           FROM ev CROSS JOIN sp GROUP BY 1, 2, 3, 4, 5),
        |model AS (SELECT event_type, iso_dow, hr, round(avg(n), 4) AS pred
        |          FROM hourly WHERE NOT is_test GROUP BY 1, 2, 3)
        |SELECT h.event_type, count(*) AS n_test_hours,
        |  ((2 * sum(CAST(round(abs(h.n - m.pred) * 10000.0, 0) AS BIGINT))
        |    + count(*)) // (2 * count(*)))::DOUBLE / 10000.0 AS mae,
        |  (CASE WHEN sum(CAST(round((h.n - m.pred) * 10000.0, 0) AS BIGINT)) >= 0
        |   THEN (2 * sum(CAST(round((h.n - m.pred) * 10000.0, 0) AS BIGINT))
        |         + count(*)) // (2 * count(*))
        |   ELSE -((-2 * sum(CAST(round((h.n - m.pred) * 10000.0, 0) AS BIGINT))
        |         + count(*)) // (2 * count(*)))
        |   END)::DOUBLE / 10000.0 AS bias
        |FROM hourly h JOIN model m USING (event_type, iso_dow, hr)
        |WHERE h.is_test
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ts_changepoints" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |sh AS (SELECT event_type, epoch_ms(day) AS day_ms,
        |         count(n) OVER b AS nb, count(n) OVER a AS na_,
        |         round(sum(n) OVER b::DOUBLE / 7, 4) AS before_avg,
        |         round(sum(n) OVER a::DOUBLE / 7, 4) AS after_avg
        |       FROM daily
        |       WINDOW b AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
        |              a AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)),
        |ranked AS (
        |  SELECT event_type, day_ms, before_avg, after_avg,
        |    round(abs(after_avg - before_avg), 4) AS shift,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY round(abs(after_avg - before_avg), 4) DESC, day_ms)
        |      AS rank
        |  FROM sh WHERE nb = 7 AND na_ = 7)
        |SELECT event_type, day_ms, before_avg, after_avg, shift,
        |  CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    "q_ts_seasonality" ->
      """WITH grid AS (
        |  SELECT CAST(isodow(ts) AS INTEGER) AS iso_dow,
        |    CAST(hour(ts) AS INTEGER) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT iso_dow, sum(n) AS day_n FROM grid GROUP BY 1)
        |SELECT g.iso_dow, g.hr, g.n,
        |  round(CAST(g.n AS DOUBLE) / d.day_n, 6) AS day_share
        |FROM grid g JOIN d USING (iso_dow) ORDER BY iso_dow, hr""".stripMargin,
    // Dense grid from generate_series × distinct types; zero-fill +
    // IGNORE NULLS forward fill mirrors Spark's last(ignoreNulls) window
    "q_ts_hourly_dense" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type,
        |         count(*) AS n, sum(value) AS sv, avg(value) AS av
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
        |grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |         FROM span),
        |g AS (SELECT h, event_type
        |      FROM grid CROSS JOIN (SELECT DISTINCT event_type FROM hourly))
        |SELECT epoch_ms(h) AS bucket_ms, event_type,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n,
        |  round(COALESCE(sv, 0.0), 2) AS sum_value,
        |  round(last_value(av IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS ff_avg
        |FROM g LEFT JOIN hourly USING (h, event_type)
        |ORDER BY bucket_ms, event_type""".stripMargin,
    // Full recompute over ALL events — the twin asserts the semantic
    // contract (incremental merge ≡ recompute), not the incremental plan;
    // status derives from the same event_id % 10 split rule
    "q_ts_hourly_increment" ->
      """WITH all_h AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type,
        |         count(*) AS n, sum(value) AS sv
        |  FROM events GROUP BY 1, 2),
        |base_h AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS bn
        |  FROM events WHERE event_id % 10 <> 0 GROUP BY 1, 2),
        |late_h AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS ln
        |  FROM events WHERE event_id % 10 = 0 GROUP BY 1, 2)
        |SELECT epoch_ms(h) AS bucket_ms, event_type, n,
        |  round(sv, 2) AS sum_value,
        |  CASE WHEN ln IS NULL THEN 'unchanged'
        |       WHEN bn IS NULL THEN 'new'
        |       ELSE 'merged' END AS status
        |FROM all_h LEFT JOIN base_h USING (h, event_type)
        |           LEFT JOIN late_h USING (h, event_type)
        |ORDER BY bucket_ms, event_type""".stripMargin,
    "q_ts_sliding" ->
      """SELECT epoch_ms(ws) AS window_start_ms, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM (SELECT unnest([date_trunc('hour', ts),
        |                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
        |             value
        |      FROM events)
        |GROUP BY ws ORDER BY window_start_ms""".stripMargin,
    "q_ts_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ms
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts_ms,
        |    CAST(sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
        |                  THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM e)
        |SELECT user_id, session_id,
        |  min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "q_ts_props_stats" ->
      """SELECT event_type, count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_ts_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events WHERE user_id < 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_ts_range_join" ->
      """SELECT e.event_id AS err_id, count(*) AS n_nearby,
        |  min(epoch_ms(o.ts)) AS first_ms, max(epoch_ms(o.ts)) AS last_ms
        |FROM events e JOIN events o
        |  ON e.user_id = o.user_id
        | AND abs(epoch_ms(o.ts) - epoch_ms(e.ts)) <= 300000
        | AND o.event_id <> e.event_id
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id ORDER BY err_id""".stripMargin,
    "q_ts_slo_burn" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, count(*) AS tot,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
        |grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |         FROM b),
        |dense AS (SELECT g.h, coalesce(tot, 0) AS tot, coalesce(err, 0) AS err
        |          FROM grid g LEFT JOIN hourly ON hourly.h = g.h),
        |wl AS (SELECT h, tot, err,
        |  sum(err) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        |    AS errl,
        |  sum(tot) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        |    AS totl
        |  FROM dense),
        |r AS (SELECT h, tot, err,
        |  CAST((2 * 1000000000000 * err + greatest(tot, 1) * 10000)
        |       // (2 * greatest(tot, 1) * 10000) AS BIGINT)
        |    AS burn_short_ppm,
        |  CAST((2 * 1000000000000 * errl + greatest(totl, 1) * 10000)
        |       // (2 * greatest(totl, 1) * 10000) AS BIGINT)
        |    AS burn_long_ppm
        |  FROM wl)
        |SELECT epoch_ms(h) AS bucket_ms, tot AS n_events, CAST(err AS BIGINT) AS n_errors,
        |  burn_short_ppm, burn_long_ppm,
        |  (burn_short_ppm >= 2000000 AND burn_long_ppm >= 2000000) AS is_alert
        |FROM r ORDER BY bucket_ms""".stripMargin,
    "q_ts_autocorr" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |                 count(*) AS c
        |               FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |grid AS (SELECT event_type, unnest(
        |           generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |         FROM (SELECT DISTINCT event_type FROM daily) CROSS JOIN b),
        |dense AS (SELECT g.event_type, g.day, coalesce(daily.c, 0) AS y
        |          FROM grid g LEFT JOIN daily
        |            ON daily.event_type = g.event_type AND daily.day = g.day),
        |ld AS (SELECT event_type, y,
        |         lead(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
        |         lead(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
        |       FROM dense),
        |f AS (SELECT event_type, count(*) AS n_days,
        |        count(y1) AS n1, sum(CASE WHEN y1 IS NOT NULL THEN y END) AS sa1,
        |        sum(y1) AS sb1,
        |        sum(CASE WHEN y1 IS NOT NULL THEN y*y END) AS saa1,
        |        sum(y1*y1) AS sbb1, sum(y*y1) AS sab1,
        |        count(y7) AS n7, sum(CASE WHEN y7 IS NOT NULL THEN y END) AS sa7,
        |        sum(y7) AS sb7,
        |        sum(CASE WHEN y7 IS NOT NULL THEN y*y END) AS saa7,
        |        sum(y7*y7) AS sbb7, sum(y*y7) AS sab7
        |      FROM ld GROUP BY 1)
        |SELECT event_type, n_days,
        |  CASE WHEN n1*saa1 - sa1*sa1 <= 0 OR n1*sbb1 - sb1*sb1 <= 0 THEN 0.0
        |       ELSE round(CAST(n1*sab1 - sa1*sb1 AS DOUBLE)
        |         / (sqrt(CAST(n1*saa1 - sa1*sa1 AS DOUBLE))
        |            * sqrt(CAST(n1*sbb1 - sb1*sb1 AS DOUBLE))), 6) END AS r_lag1,
        |  CASE WHEN n7*saa7 - sa7*sa7 <= 0 OR n7*sbb7 - sb7*sb7 <= 0 THEN 0.0
        |       ELSE round(CAST(n7*sab7 - sa7*sb7 AS DOUBLE)
        |         / (sqrt(CAST(n7*saa7 - sa7*sa7 AS DOUBLE))
        |            * sqrt(CAST(n7*sbb7 - sb7*sb7 AS DOUBLE))), 6) END AS r_lag7
        |FROM f ORDER BY event_type""".stripMargin,
    "q_ts_trend" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |                 count(*) AS c
        |               FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |grid AS (SELECT event_type, d0, unnest(
        |           generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |         FROM (SELECT DISTINCT event_type FROM daily) CROSS JOIN b),
        |xy AS (SELECT g.event_type,
        |         (epoch_ms(g.day) - epoch_ms(g.d0)) // 86400000 AS x,
        |         coalesce(daily.c, 0) AS y
        |       FROM grid g LEFT JOIN daily
        |         ON daily.event_type = g.event_type AND daily.day = g.day),
        |f AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
        |      FROM xy GROUP BY 1)
        |SELECT event_type, n AS n_days, CAST(sy AS BIGINT) AS n_events,
        |  CASE WHEN n*sxx - sx*sx = 0 THEN 0.0
        |       ELSE CAST(CASE WHEN (n*sxy - sx*sy) * 1000000 >= 0
        |         THEN (2 * (n*sxy - sx*sy) * 1000000 + (n*sxx - sx*sx))
        |              // (2 * (n*sxx - sx*sx))
        |         ELSE -((-2 * (n*sxy - sx*sy) * 1000000 + (n*sxx - sx*sx))
        |              // (2 * (n*sxx - sx*sx))) END AS DOUBLE) / 1e6 END
        |    AS slope_per_day,
        |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN 0.0
        |       ELSE round((n*sxy - sx*sy)::DOUBLE * (n*sxy - sx*sy)::DOUBLE
        |         / ((n*sxx - sx*sx)::DOUBLE * (n*syy - sy*sy)::DOUBLE), 6)
        |       END AS r2
        |FROM f ORDER BY event_type""".stripMargin,
    "q_ts_user_diversity" ->
      """WITH uc AS (SELECT user_id, event_type, count(*) AS c
        |            FROM events GROUP BY 1, 2),
        |g AS (SELECT user_id, sum(c) AS n, sum(c*c) AS ssq
        |      FROM uc GROUP BY 1),
        |q AS (SELECT n,
        |        (2 * 1000000 * (n*n - ssq) + n*n) // (2 * n*n) AS gini_ppm
        |      FROM g)
        |SELECT CAST(gini_ppm // 100000 AS INTEGER) AS decile,
        |  count(*) AS n_users,
        |  CAST((2 * sum(gini_ppm) + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 1e6 AS mean_gini,
        |  CAST((2 * sum(n) + count(*)) // (2 * count(*)) AS DOUBLE)
        |    AS mean_events,
        |  CAST(sum(CASE WHEN gini_ppm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_single_type
        |FROM q GROUP BY 1 ORDER BY decile""".stripMargin,
    "q_ts_purchase_props" ->
      """SELECT event_id, user_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value
        |FROM events WHERE event_type = 'purchase' AND user_id < 10
        |ORDER BY event_id""".stripMargin,
    // Stepwise-min CTE chain ≡ the Spark greedy walk: the greedy
    // earliest-match chain exists iff any ordered chain does, and both
    // sides sequence on the unique event_id.
    "q_ts_funnel" ->
      """WITH s1 AS (SELECT user_id, min(event_id) AS e1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(event_id) AS e2 FROM events e
        |       JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND event_id > e1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(event_id) AS e3 FROM events e
        |       JOIN s2 USING (user_id)
        |       WHERE event_type = 'click' AND event_id > e2 GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(event_id) AS e4 FROM events e
        |       JOIN s3 USING (user_id)
        |       WHERE event_type = 'purchase' AND event_id > e3 GROUP BY e.user_id)
        |SELECT step_idx, step, n_users FROM (
        |  SELECT 1 AS step_idx, 'signup' AS step, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'view', count(*) FROM s2
        |  UNION ALL SELECT 3, 'click', count(*) FROM s3
        |  UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
        |WHERE n_users > 0 ORDER BY step_idx""".stripMargin,
    "q_ts_cohort" ->
      """WITH u AS (SELECT user_id, min(date_trunc('day', ts)) AS d0
        |           FROM events GROUP BY user_id)
        |SELECT epoch_ms(d0) AS cohort_ms,
        |  CAST(datediff('day', d0, date_trunc('day', ts)) AS INTEGER) AS offset_days,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN u USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_ms, offset_days""".stripMargin,
    "q_ts_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
        |      AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS n,
        |  round(count(*) / sum(count(*)) OVER (PARTITION BY from_type), 6) AS p
        |FROM o WHERE from_type IS NOT NULL
        |GROUP BY from_type, event_type ORDER BY from_type, to_type""".stripMargin,
    // Rolling stats from exact-integer window sums (Σn, Σn², c) combined
    // with the same double expression on both engines — see
    // TimeSeriesOps.anomalies determinism note.
    "q_ts_anomaly" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, h, n,
        |        sum(n) OVER win AS s,
        |        sum(n * n) OVER win AS sq,
        |        count(n) OVER win AS c
        |      FROM h
        |      WINDOW win AS (PARTITION BY event_type ORDER BY h
        |                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT event_type, epoch_ms(h) AS bucket_ms, n,
        |        CAST(s AS DOUBLE) / c AS mean,
        |        (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / c) / (c - 1) AS vr
        |      FROM w WHERE c = 24)
        |SELECT event_type, bucket_ms, n,
        |  round(mean, 4) AS mean_n,
        |  CASE WHEN vr > 0 THEN round((n - mean) / sqrt(vr), 4) END AS z,
        |  coalesce(abs(CASE WHEN vr > 0
        |                    THEN round((n - mean) / sqrt(vr), 4) END) >= 3,
        |           false) AS is_anomaly
        |FROM m ORDER BY event_type, bucket_ms""".stripMargin,
    "q_ts_paths" ->
      """WITH o AS (SELECT event_type AS s1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS s2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS s3
        |  FROM events)
        |SELECT s1, s2, s3, count(*) AS n
        |FROM o WHERE s2 IS NOT NULL AND s3 IS NOT NULL
        |GROUP BY s1, s2, s3
        |ORDER BY n DESC, s1, s2, s3 LIMIT 15""".stripMargin,
    // Same stepwise-min chain as q_ts_funnel, carrying the endpoint
    // timestamps: the greedy walk's chain IS (e1, e2, e3, e4).
    "q_ts_funnel_timing" ->
      """WITH s1 AS (SELECT user_id, min(event_id) AS e1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(event_id) AS e2 FROM events e
        |       JOIN s1 USING (user_id)
        |       WHERE event_type = 'view' AND event_id > e1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(event_id) AS e3 FROM events e
        |       JOIN s2 USING (user_id)
        |       WHERE event_type = 'click' AND event_id > e2 GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, min(event_id) AS e4 FROM events e
        |       JOIN s3 USING (user_id)
        |       WHERE event_type = 'purchase' AND event_id > e3 GROUP BY e.user_id),
        |conv AS (SELECT epoch_ms(b.ts) - epoch_ms(a.ts) AS dur_ms
        |         FROM s4 JOIN s1 USING (user_id)
        |         JOIN events a ON a.event_id = e1
        |         JOIN events b ON b.event_id = e4)
        |SELECT count(*) AS n_converted,
        |  min(dur_ms) AS min_ms,
        |  round(quantile_cont(dur_ms, 0.5), 2) AS p50_ms,
        |  round(quantile_cont(dur_ms, 0.9), 2) AS p90_ms,
        |  max(dur_ms) AS max_ms
        |FROM conv""".stripMargin,
    "q_ts_rolling_actives" ->
      """WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |daily AS (SELECT epoch_ms(d) AS day_ms, count(*) AS dau FROM ud GROUP BY d),
        |r AS (SELECT user_id, d + to_days(CAST(i AS INTEGER)) AS w
        |      FROM ud, (SELECT unnest(range(0, 7)) AS i)),
        |roll AS (SELECT epoch_ms(w) AS day_ms,
        |           count(DISTINCT user_id) AS active_7d
        |         FROM r GROUP BY w)
        |SELECT day_ms, dau, active_7d,
        |  round(CAST(dau AS DOUBLE) / active_7d, 6) AS stickiness
        |FROM daily JOIN roll USING (day_ms)
        |ORDER BY day_ms""".stripMargin,
    "q_ts_interarrival" ->
      """WITH g AS (SELECT user_id,
        |    epoch_ms(ts) - lag(epoch_ms(ts))
        |      OVER (PARTITION BY user_id ORDER BY event_id) AS gap_ms
        |  FROM events),
        |u AS (SELECT user_id, count(*) AS n_gaps,
        |        quantile_cont(gap_ms, 0.5) AS p50, max(gap_ms) AS max_gap
        |      FROM g WHERE gap_ms IS NOT NULL GROUP BY user_id)
        |SELECT CAST(length(bin(n_gaps)) - 1 AS INTEGER) AS gap_band,
        |  count(*) AS n_users,
        |  round(avg(p50), 2) AS avg_p50_ms,
        |  max(max_gap) AS max_gap_ms
        |FROM u GROUP BY gap_band ORDER BY gap_band""".stripMargin,
    // Dense grid restores zero-observed cells; Spark dayofweek is 1-based
    // (Sun=1), DuckDB 0-based → +1; nano-quantized cell contributions
    "q_ts_independence" ->
      """WITH obs AS (
        |  SELECT event_type AS t, dayofweek(ts) + 1 AS d, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |grid AS (SELECT t, d FROM (SELECT DISTINCT t FROM obs)
        |         CROSS JOIN (SELECT DISTINCT d FROM obs)),
        |cells AS (SELECT g.t, g.d, CAST(COALESCE(o, 0) AS BIGINT) AS o
        |          FROM grid g LEFT JOIN obs USING (t, d)),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |          count(DISTINCT t) AS r, count(DISTINCT d) AS c
        |        FROM cells),
        |m AS (SELECT o,
        |        CAST(sum(o) OVER (PARTITION BY t) AS BIGINT) AS rt,
        |        CAST(sum(o) OVER (PARTITION BY d) AS BIGINT) AS ct
        |      FROM cells),
        |q AS (SELECT CAST(round((o - e) * (o - e) / e * 1e9) AS BIGINT) AS cq
        |      FROM (SELECT o, rt::DOUBLE * ct / n AS e FROM m CROSS JOIN tot)),
        |s AS (SELECT CAST(sum(cq) AS BIGINT) AS sumq FROM q)
        |SELECT n AS n_events, r AS n_types, c AS n_days,
        |  (r - 1) * (c - 1) AS dof,
        |  round(sumq::DOUBLE / 1e9, 4) AS chi2,
        |  round(sqrt(sumq::DOUBLE / 1e9 / (n * least(r - 1, c - 1))), 6)
        |    AS cramers_v
        |FROM tot CROSS JOIN s""".stripMargin,
    "q_ts_attribution" ->
      """WITH a AS (
        |  SELECT event_type, value,
        |    COALESCE(last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'direct')
        |      AS channel
        |  FROM events),
        |p AS (SELECT channel, value FROM a WHERE event_type = 'purchase'),
        |tot AS (SELECT count(*) AS total_purchases FROM p)
        |SELECT channel, count(*) AS n_purchases,
        |  round(count(*)::DOUBLE / total_purchases, 6) AS share,
        |  round(sum(value), 2) AS attributed_value
        |FROM p CROSS JOIN tot
        |GROUP BY channel, total_purchases ORDER BY channel""".stripMargin,
    // Histogram-formulation Gini/top-share: integer-exact rank sums per
    // count group (m(m+1) is even → // 2 stays integer), shares cut inside
    // one group via min(cum_e - (cum_u - k) * c) — same as the Spark plan
    "q_ts_concentration" ->
      """WITH uc AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |hist AS (SELECT c, count(*) AS m FROM uc GROUP BY c),
        |a AS (SELECT c, m,
        |        CAST(COALESCE(sum(m) OVER (ORDER BY c
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS start
        |      FROM hist),
        |tot AS (SELECT CAST(sum(m) AS BIGINT) AS n_users,
        |          CAST(sum(c * m) AS BIGINT) AS n_events,
        |          CAST(sum(c * (m * start + (m * (m + 1)) // 2)) AS BIGINT) AS t
        |        FROM a),
        |d AS (SELECT c, m,
        |        CAST(sum(m) OVER w AS BIGINT) AS cum_u,
        |        CAST(sum(c * m) OVER w AS BIGINT) AS cum_e
        |      FROM hist
        |      WINDOW w AS (ORDER BY c DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |ks AS (SELECT (n_users + 99) // 100 AS k1, (n_users + 9) // 10 AS k10
        |       FROM tot),
        |tops AS (SELECT
        |    CAST(min(CASE WHEN cum_u >= k1
        |      THEN cum_e - (cum_u - k1) * c END) AS BIGINT) AS e1,
        |    CAST(min(CASE WHEN cum_u >= k10
        |      THEN cum_e - (cum_u - k10) * c END) AS BIGINT) AS e10,
        |    max(c) AS max_c
        |  FROM d CROSS JOIN ks)
        |SELECT n_users, n_events,
        |  round(2.0 * t / (n_users::DOUBLE * n_events)
        |    - (n_users + 1.0) / n_users, 6) AS gini,
        |  round(e1::DOUBLE / n_events, 6) AS top1_share,
        |  round(e10::DOUBLE / n_events, 6) AS top10_share,
        |  round(max_c::DOUBLE / n_events, 6) AS max_user_share
        |FROM tot CROSS JOIN tops""".stripMargin,
    // Same gaps-and-islands session assignment as q_ts_sessions
    // sessions are ts-ordered with an INCLUSIVE 30-min gap (diff_ms <=
    // 1800000 shares a session) — the q_ts_sessions boundary semantics
    "q_ts_baskets" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        |           FROM events),
        |s0 AS (SELECT user_id, event_id, event_type, ms,
        |        CASE WHEN lag(ms) OVER win IS NULL
        |             OR ms - lag(ms) OVER win > 1800000
        |             THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s1 AS (SELECT user_id, event_type,
        |        sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        |      FROM s0),
        |bk AS (SELECT DISTINCT
        |         user_id || '#' || CAST(session_no AS VARCHAR) AS sid,
        |         event_type
        |       FROM s1),
        |tot AS (SELECT count(DISTINCT sid) AS n_sessions FROM bk),
        |tc AS (SELECT event_type, count(*) AS n_type FROM bk GROUP BY event_type),
        |p AS (SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_both
        |      FROM bk a JOIN bk b ON a.sid = b.sid AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT ta, tb, n_both,
        |  round(CAST(n_both AS DOUBLE) / n_sessions, 6) AS support,
        |  round(CAST(n_both AS DOUBLE) / na.n_type, 6) AS confidence,
        |  round(CAST(n_both AS DOUBLE) * n_sessions
        |        / (na.n_type * nb.n_type), 6) AS lift
        |FROM p JOIN tc na ON p.ta = na.event_type
        |       JOIN tc nb ON p.tb = nb.event_type, tot
        |ORDER BY ta, tb""".stripMargin)

  // ---- text / dedup pack --------------------------------------------------

  private val textQueries: Map[String, Q] = Map(
    "q_text_token_stats" -> (TextOps.tokenStats _),
    "q_text_term_freq" -> (TextOps.termFrequency _),
    "q_text_lang_stats" -> (TextOps.langStats _),
    "q_text_quality" -> (TextOps.qualityScore _),
    "q_text_fingerprints" -> (TextOps.fingerprints _),
    "q_text_langid" -> (TextOps.languageId _),
    "q_text_langid_calib" -> (TextOps.langIdCalibration _),
    // Space-Saving candidates + exact recount of the <= m survivors:
    // the published over-threshold rows are deterministic (sketch
    // guarantee), so this IS hash-checked; sketch internals are pinned
    // by HeavyHittersSpec
    "q_text_heavy_hitters" -> ((s, d) => TextOps.heavyTermsExact(s, d)),
    "q_text_tfidf" -> ((s, d) => TextOps.tfIdf(s, d)),
    "q_text_zipf" -> (TextOps.zipfProfile _),
    "q_text_fertility" -> (TextOps.tokenizerFertility _),
    "q_text_ttr" -> (TextOps.typeTokenRatio _),
    "q_text_vocab_growth" -> ((s, d) => TextOps.vocabGrowth(s, d)),
    "q_text_typo_pairs" -> ((s, d) => TextOps.typoPairs(s, d)),
    "q_text_length_profile" -> (TextOps.lengthProfile _),
    "q_text_bm25" -> ((s, d) => RetrievalOps.bm25TopK(s, d)),
    "q_text_tfidf_pairs" -> ((s, d) => RetrievalOps.tfidfSimilarPairs(s, d)),
    "q_text_inverted_index" -> (RetrievalOps.invertedIndex _),
    "q_text_unigram_logprob" -> (RetrievalOps.unigramLogProb _),
    "q_text_bigram_logprob" -> (RetrievalOps.bigramLogProb _),
    "q_text_bpe_pairs" -> ((s, d) => RetrievalOps.bpePairCounts(s, d)),
    "q_text_bigram_lm" -> ((s, d) => RetrievalOps.bigramLm(s, d)),
    "q_prep_snapshot_diff" -> (TrainPrepOps.snapshotDiff _),
    "q_prep_merge_changes" -> (TrainPrepOps.mergeChanges _),
    "q_prep_weighted_sample" -> ((s, d) => TrainPrepOps.weightedSample(s, d)),
    "q_prep_quality_tiers" -> ((s, d) => TrainPrepOps.qualityTiers(s, d)),
    "q_rel_skew_audit" ->
      ((s, d) => graft.plans.SkewOps.keySkewAudit(Tables.events(s, d), "user_id")),
    "q_rel_order_dist" -> (RelationalOps.orderCountDistribution _),
    "q_rel_profile" -> (RelationalOps.profileOrders _),
    "q_rel_rfm" -> (RelationalOps.rfmSegments _),
    "q_dedup_exact" -> (DedupOps.exactDuplicates _),
    "q_dedup_impact" -> (DedupOps.dedupImpact _),
    "q_dedup_blocks" -> ((s, d) => DedupOps.blockDuplicates(s, d)),
    "q_dedup_dup_shingles" -> ((s, d) => DedupOps.dupShingleFrac(s, d)),
    "q_dedup_block_rewrite" -> ((s, d) => DedupOps.blockDedupRewrite(s, d)),
    "q_dedup_incremental" -> ((s, d) => DedupOps.incrementalDedup(s, d)),
    "q_dedup_ngram_jaccard" -> ((s, d) => DedupOps.ngramJaccardPairs(s, d, minSim = 0.2, maxDf = 1000L)),
    "q_dedup_canon_pairs" -> ((s, d) => DedupOps.canonNearDupPairs(s, d, minSim = 0.2, maxDf = 1000L)),
    "q_dedup_containment" -> ((s, d) => DedupOps.containmentPairs(s, d, minCont = 0.6, maxDf = 1000L)),
    "q_dedup_novelty" -> (DedupOps.contentNovelty _),
    "q_dedup_minhash_lsh" -> ((s, d) => DedupOps.minhashLshPairs(s, d)),
    "q_dedup_sketch_calib" -> (DedupOps.sketchCalibration _),
    "q_dedup_lsh_tuning" -> ((s, d) => DedupOps.lshTuningCurve(s, d)),
    "q_dedup_threshold_curve" -> ((s, d) => DedupOps.thresholdCurve(s, d)),
    "q_dedup_dup_spans" -> ((s, d) => DedupOps.dupSpans(s, d)),
    "q_dedup_span_rewrite" -> ((s, d) => DedupOps.dupSpanRewrite(s, d)),
    "q_dedup_span_sources" -> ((s, d) => DedupOps.dupSpanSources(s, d)),
    "q_dedup_cluster_sizes" -> ((s, d) => DedupOps.clusterSizeProfile(s, d)),
    "q_dedup_transitivity" -> ((s, d) => DedupOps.clusterTransitivity(s, d)),
    "q_text_collocations" -> ((s, d) => TextOps.collocations(s, d)),
    // fixture docs only repeat SHORT runs internally (synthetic vocab) —
    // k=2/minRun=3 exercises the machinery with non-trivial yield; real
    // corpora run the 5/8 defaults
    "q_text_repeat_spans" -> ((s, d) => TextOps.repeatSpans(s, d, k = 2, minRun = 3)),
    "q_dedup_nearest" -> ((s, d) => DedupOps.nearestNeighbors(s, d)),
    "q_dedup_simhash" -> ((s, d) => DedupOps.simhashPairs(s, d)),
    "q_dedup_clusters" -> ((s, d) => DedupOps.duplicateClusters(s, d)),
    "q_dedup_cluster_reps" -> ((s, d) => DedupOps.clusterReps(s, d)),
    "q_dedup_cross_source" -> ((s, d) => DedupOps.crossSourceLeakage(s, d)),
    "q_dedup_degree_dist" -> ((s, d) => DedupOps.neardupDegreeDist(s, d)),
    "q_dedup_kcore" -> ((s, d) => DedupOps.kcorePeel(s, d)),
    "q_dedup_triangles" -> ((s, d) => DedupOps.neardupTriangles(s, d)),
    "q_dedup_hybrid" -> ((s, d) => DedupOps.hybridNearDup(s, d)),
    // deterministic arrival batch: every 25th document re-submitted under
    // a shifted id (the verbatim-resubmission shape of real log/crawl
    // ingest); statuses exercise joined/new, the spec plants merged
    "q_dedup_incr_clusters" -> ((s, d) => DedupOps.incrementalClusters(s, d,
      graft.Tables.documents(s, d).where(col("doc_id") % 25 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))),
    "q_text_burstiness" -> ((s, d) => TextOps.termBurstiness(s, d)),
    "q_text_bpe_merges" -> ((s, d) => RetrievalOps.bpeMerges(s, d)),
    "q_text_bpe_fertility" -> ((s, d) => RetrievalOps.bpeFertility(s, d)),
    "q_dedup_df_profile" -> ((s, d) => DedupOps.shingleDfProfile(s, d)),
    "q_dedup_winnow_pairs" -> ((s, d) => DedupOps.winnowPairs(s, d)),
    "q_dedup_boilerplate" -> ((s, d) => DedupOps.boilerplate(s, d)),
    "q_text_keyphrases" -> ((s, d) => TextOps.keyphrases(s, d)),
    "q_text_char_diversity" -> ((s, d) => TextOps.charDiversity(s, d)),
    "q_text_winnow_profile" -> ((s, d) => TextOps.winnowProfile(s, d)),
    "q_prep_cluster_split" -> ((s, d) => TrainPrepOps.clusterSafeSplit(s, d)),
    "q_prep_source_budget" -> (TrainPrepOps.sourceBudgetCurve _),
    "q_prep_effective_tokens" -> ((s, d) => TrainPrepOps.effectiveTokens(s, d)),
    "q_text_lang_confusion" -> (TextOps.langConfusion _),
    "q_text_source_divergence" -> (TextOps.sourceDivergence _),
    "q_text_signal_corr" -> (TextOps.signalCorr _),
    "q_rel_integrity" -> (RelationalOps.integrityAudit _),
    "q_rel_q6_discount" -> (RelationalOps.discountRevenue _),
    "q_rel_q3_shipping" -> ((s, d) => RelationalOps.shippingPriority(s, d)),
    "q_rel_q18_bigorders" -> ((s, d) => RelationalOps.largeVolumeCustomers(s, d)),
    "q_rel_q14_promo" -> (RelationalOps.promoRevenueShare _),
    "q_rel_q2_mincost" -> (RelationalOps.minCostSupplier _),
    "q_rel_q10_returns" -> ((s, d) => RelationalOps.topReturnedCustomers(s, d)),
    "q_rel_q12_priority" -> (RelationalOps.shipmodePriority _),
    "q_rel_q22_idle_rich" -> (RelationalOps.idleRichCustomers _),
    "q_rel_q4_late" -> (RelationalOps.latePriorityOrders _),
    "q_rel_q5_region" -> ((s, d) => RelationalOps.regionalSupplierVolume(s, d)),
    "q_rel_q7_trade" -> (RelationalOps.nationTradeVolume _),
    "q_rel_q8_share" -> ((s, d) => RelationalOps.nationMarketShare(s, d)),
    "q_rel_q9_profit" -> ((s, d) => RelationalOps.productFamilyProfit(s, d)),
    "q_rel_q15_topsupp" -> (RelationalOps.topSupplierByRevenue _),
    "q_rel_q17_smallqty" -> ((s, d) => RelationalOps.smallQuantityRevenue(s, d)),
    "q_rel_q19_bands" -> (RelationalOps.disjunctiveBandRevenue _),
    "q_rel_q21_waiting" -> ((s, d) => RelationalOps.soleLateSuppliers(s, d)),
    "q_rel_q11_important" -> (RelationalOps.importantParts _),
    "q_rel_q16_diversity" -> ((s, d) => RelationalOps.supplierDiversity(s, d)),
    "q_rel_q20_dominant" -> ((s, d) => RelationalOps.dominantSuppliers(s, d)),
    "q_rel_histogram" -> ((s, d) => RelationalOps.priceHistogram(s, d)),
    "q_rel_outliers" -> (RelationalOps.outlierAudit _),
    "q_rel_grouping_sets" -> (RelationalOps.groupingSetsReturns _),
    "q_scalar_regex" -> (ScalarOps.regexFuncs _),
    "q_curate" -> ((s, d) => CurationOps.curate(s, d)),
    "q_curate_funnel" -> ((s, d) => CurationOps.curationFunnel(s, d)),
    "q_curate_calibration" -> (CurationOps.qualityCalibration _))

  private val textOracles: Map[String, String] = Map(
    "q_text_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_regex_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_measured,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_fertility" ->
      """WITH pd AS (SELECT lang,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS nrx,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nws,
        |  CAST(length(text) AS BIGINT) AS nch
        |  FROM documents),
        |q AS (SELECT lang, nrx, nws,
        |  (2 * 1000000 * nrx + greatest(nws, 1)) // (2 * greatest(nws, 1))
        |    AS fert_ppm,
        |  (2 * 100000000 * nrx + greatest(nch, 1)) // (2 * greatest(nch, 1))
        |    AS per100_ppm
        |  FROM pd)
        |SELECT lang, count(*) AS n_docs,
        |  CAST((2 * sum(fert_ppm) + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 1e6 AS mean_fertility,
        |  CAST((2 * sum(per100_ppm) + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 1e6 AS mean_tokens_per_100ch,
        |  CAST((2 * 1000000 * sum(nrx) + sum(nws)) // (2 * sum(nws))
        |    AS DOUBLE) / 1e6 AS corpus_fertility
        |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_vocab_growth" ->
      """WITH f AS (
        |  SELECT [round(quantile_cont(doc_id, 0.1), 6),
        |          round(quantile_cont(doc_id, 0.2), 6),
        |          round(quantile_cont(doc_id, 0.3), 6),
        |          round(quantile_cont(doc_id, 0.4), 6),
        |          round(quantile_cont(doc_id, 0.5), 6),
        |          round(quantile_cont(doc_id, 0.6), 6),
        |          round(quantile_cont(doc_id, 0.7), 6),
        |          round(quantile_cont(doc_id, 0.8), 6),
        |          round(quantile_cont(doc_id, 0.9), 6)] AS fs
        |  FROM documents),
        |grid AS (
        |  SELECT CAST(len(list_filter(fs, x -> x < doc_id)) + 1 AS INTEGER)
        |           AS decile,
        |         count(*) AS n_docs,
        |         sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS n_tokens
        |  FROM documents CROSS JOIN f GROUP BY 1),
        |fs2 AS (
        |  SELECT term, min(doc_id) AS first_doc
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY term),
        |newt AS (
        |  SELECT CAST(len(list_filter(fs, x -> x < first_doc)) + 1 AS INTEGER)
        |           AS decile,
        |         count(*) AS new_terms
        |  FROM fs2 CROSS JOIN f GROUP BY 1),
        |j AS (
        |  SELECT g.decile, g.n_docs, g.n_tokens,
        |         coalesce(n.new_terms, 0) AS new_terms
        |  FROM grid g LEFT JOIN newt n USING (decile)),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (ORDER BY decile) AS cum_tokens,
        |            sum(new_terms) OVER (ORDER BY decile) AS cum_vocab
        |  FROM j)
        |SELECT decile,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(new_terms AS BIGINT) AS new_terms,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
        |  CAST(cum_vocab AS BIGINT) AS cum_vocab,
        |  CAST((2 * 1000000 * cum_vocab + cum_tokens) // (2 * cum_tokens)
        |    AS BIGINT) AS types_per_mtok
        |FROM c ORDER BY decile""".stripMargin,
    "q_text_ttr" ->
      """WITH pd AS (SELECT
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_typ
        |  FROM documents),
        |q AS (SELECT n_tok,
        |  (2 * 1000000 * n_typ + greatest(n_tok, 1)) // (2 * greatest(n_tok, 1))
        |    AS ttr_ppm
        |  FROM pd)
        |SELECT CAST(ttr_ppm // 100000 AS INTEGER) AS decile,
        |  count(*) AS n_docs,
        |  CAST((2 * sum(ttr_ppm) + count(*)) // (2 * count(*)) AS BIGINT)
        |    AS mean_ttr_ppm,
        |  CAST((2 * sum(n_tok) + count(*)) // (2 * count(*)) AS BIGINT) AS mean_tokens
        |FROM q GROUP BY 1 ORDER BY decile""".stripMargin,
    "q_text_term_freq" ->
      """SELECT term, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin,
    // full BPE induction replayed as unrolled per-round CTEs — the
    // k-means twin's trick applied to tokenizer training
    "q_text_bpe_merges" ->
      s"""WITH ${duckBpeCtes(6)}
         |SELECT * FROM (
         |  ${(1 to 6).map(i =>
               s"SELECT $i AS round, l AS left_sym, r AS right_sym, " +
                 s"l || r AS merged, n FROM b$i")
               .mkString("\n  UNION ALL ")}
         |) ORDER BY round""".stripMargin,
    "q_text_bpe_fertility" ->
      s"""WITH ${duckBpeCtes(6)},
         |enc AS (SELECT w, len(regexp_extract_all(seq, '[^~]+')) AS n_syms
         |        FROM v6)
         |SELECT source, count(*) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(length(tw.w)) AS BIGINT) AS n_chars,
         |  ((2 * (CAST(sum(n_syms) AS BIGINT) * 1000000) + count(*))
         |   // (2 * count(*)))::DOUBLE / 1000000.0 AS fertility,
         |  ((2 * (CAST(sum(length(tw.w)) AS BIGINT) * 1000000)
         |    + CAST(sum(n_syms) AS BIGINT))
         |   // (2 * CAST(sum(n_syms) AS BIGINT)))::DOUBLE / 1000000.0
         |    AS chars_per_token
         |FROM (SELECT source, unnest(string_split(text, ' ')) AS w
         |      FROM documents) tw
         |JOIN enc ON enc.w = tw.w
         |GROUP BY source ORDER BY source""".stripMargin,
    // VMR = (n·Σx² − (Σx)²)/(n·Σx) in exact long arithmetic, half-up at
    // micro-units — the engine's rational spelling replayed verbatim
    "q_text_burstiness" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  GROUP BY 1, 2),
        |st AS (SELECT term, count(*) AS df,
        |         CAST(sum(tf) AS BIGINT) AS total_tf,
        |         CAST(sum(tf * tf) AS BIGINT) AS tf_sq
        |       FROM tf GROUP BY 1)
        |SELECT term, df, total_tf,
        |  ((2 * (total_tf * 1000000) + df) // (2 * df))::DOUBLE / 1000000.0
        |    AS mean_tf,
        |  ((2 * ((df * tf_sq - total_tf * total_tf) * 1000000)
        |    + (df * total_tf)) // (2 * (df * total_tf)))::DOUBLE / 1000000.0
        |    AS vmr
        |FROM st ORDER BY df DESC, term LIMIT 20""".stripMargin,
    // deterministic by the Space-Saving guarantee: every term with true
    // count·m > N is in the summary, and the exact recount makes the
    // published rows independent of sketch arrival order
    "q_text_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |c AS (SELECT term, count(*) AS count FROM t GROUP BY term),
        |n AS (SELECT CAST(sum(count) AS BIGINT) AS n_stream FROM c)
        |SELECT term, count FROM c, n WHERE count * 200 > n_stream
        |ORDER BY count DESC, term LIMIT 20""".stripMargin,
    "q_text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  round((length(text) - len(toks) + 1)::DOUBLE / len(toks), 4) AS avg_token_len,
        |  round(len(list_filter(toks, t -> t IN ('the', 'a', 'of')))::DOUBLE
        |        / len(toks), 4) AS stopword_ratio,
        |  CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS INTEGER) AS n_punct,
        |  round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |        * (len(list_distinct(toks))::DOUBLE / len(toks)), 4) AS quality
        |FROM (SELECT *, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_text_fingerprints" ->
      """SELECT doc_id, md5(text) AS md5,
        |  toks[1] || '|' || toks[len(toks) // 2 + 1] || '|' || toks[-1] AS sketch
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS canonical_doc_id, count(*) AS n_copies,
        |  md5(text) AS fp
        |FROM documents GROUP BY md5(text) ORDER BY canonical_doc_id""".stripMargin,
    // idf over the WHOLE corpus; only the doc_id < 20 slice is emitted
    "q_text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |         unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, n_tok, term, count(*) AS cnt
        |       FROM terms GROUP BY 1, 2, 3),
        |idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.term,
        |  round(tf.cnt::DOUBLE / tf.n_tok, 6) AS tf,
        |  idf.df,
        |  round((tf.cnt::DOUBLE / tf.n_tok) * ln(n.n_docs::DOUBLE / idf.df), 6)
        |    AS tfidf
        |FROM tf JOIN idf USING (term) CROSS JOIN n
        |WHERE tf.doc_id < 20
        |ORDER BY tf.doc_id, tf.term""".stripMargin,
    "q_text_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        |           FROM documents),
        |s AS (
        |  SELECT doc_id, lang, p.lng,
        |    round(len(list_filter(toks, x -> list_contains(p.words, x)))::DOUBLE
        |          / greatest(len(toks), 1), 6) AS score
        |  FROM t, (VALUES ('de', ['der','die','das','und','ist']),
        |                  ('en', ['the','a','of','and','to']),
        |                  ('es', ['el','la','de','que','y']),
        |                  ('fr', ['le','la','les','et','que']),
        |                  ('zh', ['的','是','了','在','我'])) AS p(lng, words))
        |SELECT doc_id, lang_actual, lang_predicted, confidence FROM (
        |  SELECT doc_id, lang AS lang_actual, lng AS lang_predicted,
        |         score AS confidence,
        |         -- Spark's greatest() over (score, lang) structs breaks
        |         -- score ties on the LARGEST language code
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, lng DESC) AS rn
        |  FROM s) WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    // q_text_langid's scoring CTE + a confidence-decile calibration rollup
    "q_text_langid_calib" ->
      """WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        |           FROM documents),
        |s AS (
        |  SELECT doc_id, lang, p.lng,
        |    round(len(list_filter(toks, x -> list_contains(p.words, x)))::DOUBLE
        |          / greatest(len(toks), 1), 6) AS score
        |  FROM t, (VALUES ('de', ['der','die','das','und','ist']),
        |                  ('en', ['the','a','of','and','to']),
        |                  ('es', ['el','la','de','que','y']),
        |                  ('fr', ['le','la','les','et','que']),
        |                  ('zh', ['的','是','了','在','我'])) AS p(lng, words)),
        |best AS (SELECT doc_id,
        |           CAST(round(score * 1e6) AS BIGINT) AS cq,
        |           CASE WHEN lng = lang THEN 1 ELSE 0 END AS ok
        |         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                 ORDER BY score DESC, lng DESC) AS rn FROM s)
        |         WHERE rn = 1)
        |SELECT CAST(cq // 100000 AS INTEGER) AS decile,
        |  count(*) AS n_docs,
        |  CAST((2 * 1000000 * sum(ok) + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 1e6 AS accuracy,
        |  CAST((2 * sum(cq) + count(*)) // (2 * count(*)) AS DOUBLE) / 1e6
        |    AS mean_confidence
        |FROM best GROUP BY 1 ORDER BY decile""".stripMargin,
    // q_text_langid's scoring CTE + a |langs|² rollup
    "q_text_lang_confusion" ->
      """WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        |           FROM documents),
        |s AS (
        |  SELECT doc_id, lang, p.lng,
        |    round(len(list_filter(toks, x -> list_contains(p.words, x)))::DOUBLE
        |          / greatest(len(toks), 1), 6) AS score
        |  FROM t, (VALUES ('de', ['der','die','das','und','ist']),
        |                  ('en', ['the','a','of','and','to']),
        |                  ('es', ['el','la','de','que','y']),
        |                  ('fr', ['le','la','les','et','que']),
        |                  ('zh', ['的','是','了','在','我'])) AS p(lng, words)),
        |pred AS (SELECT doc_id, lang_actual, lang_predicted, confidence FROM (
        |  SELECT doc_id, lang AS lang_actual, lng AS lang_predicted,
        |         score AS confidence,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, lng DESC) AS rn
        |  FROM s) WHERE rn = 1)
        |SELECT lang_actual, lang_predicted, count(*) AS n,
        |  round(avg(confidence), 4) AS avg_confidence
        |FROM pred GROUP BY lang_actual, lang_predicted
        |ORDER BY lang_actual, lang_predicted""".stripMargin,
    // Pairwise JS divergence from shared terms only (one-sided mass is the
    // closed form ln2·(1−shared/total)); per-term contributions quantized
    // to integer nano-units so the sum is order-independent; ln(2) is the
    // same literal on both engines
    "q_text_source_divergence" ->
      """WITH cnt AS (
        |  SELECT source, term, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS tok,
        |               count(*) AS vocab
        |        FROM cnt GROUP BY 1),
        |sh AS (SELECT x.source AS sa, y.source AS sb, x.c AS ca, y.c AS cb,
        |         x.c::DOUBLE / ta.tok AS p, y.c::DOUBLE / tb.tok AS q
        |       FROM cnt x JOIN cnt y ON x.term = y.term AND x.source < y.source
        |       JOIN tot ta ON ta.source = x.source
        |       JOIN tot tb ON tb.source = y.source),
        |ag AS (SELECT sa, sb, count(*) AS shared_terms,
        |         CAST(sum(ca) AS BIGINT) AS ash, CAST(sum(cb) AS BIGINT) AS bsh,
        |         CAST(sum(CAST(round((p * ln(2.0 * p / (p + q))
        |           + q * ln(2.0 * q / (p + q))) * 1e9) AS BIGINT)) AS BIGINT)
        |           AS sum_cq
        |       FROM sh GROUP BY 1, 2)
        |SELECT ta.source AS source_a, tb.source AS source_b,
        |  ta.vocab AS vocab_a, tb.vocab AS vocab_b,
        |  COALESCE(shared_terms, 0) AS shared_terms,
        |  round(COALESCE(shared_terms, 0)::DOUBLE
        |    / (ta.vocab + tb.vocab - COALESCE(shared_terms, 0)), 6)
        |    AS vocab_jaccard,
        |  round(0.5 * (COALESCE(sum_cq, 0)::DOUBLE / 1e9
        |    + 0.6931471805599453 * (1.0 - COALESCE(ash, 0)::DOUBLE / ta.tok)
        |    + 0.6931471805599453 * (1.0 - COALESCE(bsh, 0)::DOUBLE / tb.tok)), 6)
        |    AS js_divergence,
        |  round(1.0 - COALESCE(bsh, 0)::DOUBLE / tb.tok, 6) AS oov_b_in_a,
        |  round(1.0 - COALESCE(ash, 0)::DOUBLE / ta.tok, 6) AS oov_a_in_b
        |FROM tot ta JOIN tot tb ON ta.source < tb.source
        |LEFT JOIN ag ON ag.sa = ta.source AND ag.sb = tb.source
        |ORDER BY source_a, source_b""".stripMargin,
    // Explicit sum-formula Pearson (see TextOps.signalCorr): built-in
    // corr() implementations differ algorithmically across engines.
    "q_text_signal_corr" ->
      """WITH b AS (SELECT
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS x,
        |    round(least(len(string_split(text, ' '))::DOUBLE / 50.0, 1.0)
        |          * (len(list_distinct(string_split(text, ' ')))::DOUBLE
        |             / len(string_split(text, ' '))), 4) AS y,
        |    CAST(n_chars AS DOUBLE) AS z
        |  FROM documents),
        |s AS (SELECT count(*) AS n,
        |        sum(x) AS s_x, sum(y) AS s_y, sum(z) AS s_z,
        |        sum(x * x) AS s_xx, sum(y * y) AS s_yy, sum(z * z) AS s_zz,
        |        sum(x * y) AS s_xy, sum(z * y) AS s_zy, sum(x * z) AS s_xz
        |      FROM b)
        |SELECT n,
        |  round((n * s_xy - s_x * s_y)
        |    / sqrt((n * s_xx - s_x * s_x) * (n * s_yy - s_y * s_y)), 4)
        |    AS corr_tokens_quality,
        |  round((n * s_zy - s_z * s_y)
        |    / sqrt((n * s_zz - s_z * s_z) * (n * s_yy - s_y * s_y)), 4)
        |    AS corr_chars_quality,
        |  round((n * s_xz - s_x * s_z)
        |    / sqrt((n * s_xx - s_x * s_x) * (n * s_zz - s_z * s_z)), 4)
        |    AS corr_tokens_chars
        |FROM s""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped)
        |SELECT a, b, jaccard FROM (
        |  SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard FROM (
        |    SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |           count(*) AS inter
        |    FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |    GROUP BY 1, 2, 3, 4))
        |WHERE jaccard >= 0.2 ORDER BY a, b""".stripMargin,
    "q_dedup_canon_pairs" ->
      """WITH grp AS (SELECT min(doc_id) AS doc_id, count(*) AS w
        |             FROM documents GROUP BY md5(text)),
        |t AS (SELECT d.doc_id, string_split(d.text, ' ') AS toks
        |      FROM documents d JOIN grp g USING (doc_id)),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
        |  FROM (
        |    SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |           count(*) AS inter
        |    FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |    GROUP BY 1, 2, 3, 4))
        |SELECT p.a, p.b, p.jaccard, ga.w AS wa, gb.w AS wb,
        |  CAST(ga.w * gb.w AS BIGINT) AS raw_pairs
        |FROM pairs p
        |JOIN grp ga ON p.a = ga.doc_id
        |JOIN grp gb ON p.b = gb.doc_id
        |WHERE p.jaccard >= 0.2 ORDER BY p.a, p.b""".stripMargin,
    "q_dedup_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |gl AS (SELECT doc_id, len(toks) AS dl,
        |         [{'pos': i, 'gram': array_to_string(toks[i:i+4], ' ')}
        |          for i in range(1, len(toks) - 3)] AS gs
        |       FROM t WHERE len(toks) >= 5),
        |g AS (SELECT doc_id, u.gram AS gram, u.pos AS pos
        |      FROM (SELECT doc_id, unnest(gs) AS u FROM gl)),
        |keep AS (SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1) q
        |  WHERE df <= 1000),
        |gg AS (SELECT g.* FROM g JOIN keep USING (gram)),
        |seeds AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa,
        |            x.pos - y.pos AS diag
        |          FROM gg x JOIN gg y USING (gram) WHERE x.doc_id < y.doc_id),
        |runs AS (SELECT a, b, count(*) + 4 AS run_tokens FROM (
        |    SELECT a, b, diag,
        |      pa - row_number() OVER (PARTITION BY a, b, diag ORDER BY pa)
        |        AS grp
        |    FROM seeds) GROUP BY a, b, diag, grp
        |  HAVING count(*) + 4 >= 8),
        |lens AS (SELECT doc_id, dl FROM gl)
        |SELECT r.a, r.b, CAST(r.n_runs AS BIGINT) AS n_runs,
        |  r.max_run_tokens, CAST(r.dup_tokens AS BIGINT) AS dup_tokens,
        |  CAST((2 * r.dup_tokens * 1000000 + least(la.dl, lb.dl))
        |      // (2 * least(la.dl, lb.dl)) AS DOUBLE) / 1e6 AS dup_frac
        |FROM (SELECT a, b, count(*) AS n_runs, max(run_tokens)
        |        AS max_run_tokens, sum(run_tokens) AS dup_tokens
        |      FROM runs GROUP BY a, b) r
        |JOIN lens la ON r.a = la.doc_id
        |JOIN lens lb ON r.b = lb.doc_id
        |ORDER BY r.a, r.b""".stripMargin,
    "q_dedup_cluster_sizes" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, inter::DOUBLE / (na + nb - inter) AS jac FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |edges AS (SELECT a AS x, b AS y FROM pairs
        |          UNION SELECT b AS x, a AS y FROM pairs),
        |reach AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
        |  WHERE e.y <> r.x),
        |cl AS (SELECT x AS doc_id, least(x, min(y)) AS cluster_id
        |       FROM reach GROUP BY x),
        |sizes AS (SELECT cluster_id, count(*) AS sz FROM cl GROUP BY 1)
        |SELECT CAST(length(bin(sz)) - 1 AS INTEGER) AS size_bucket,
        |  count(*) AS n_clusters,
        |  CAST(sum(sz) AS BIGINT) AS n_docs,
        |  CAST(sum(sz - 1) AS BIGINT) AS dup_excess
        |FROM sizes GROUP BY 1 ORDER BY size_bucket""".stripMargin,
    "q_dedup_transitivity" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, inter::DOUBLE / (na + nb - inter) AS jac FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |edges AS (SELECT a AS x, b AS y FROM pairs
        |          UNION SELECT b AS x, a AS y FROM pairs),
        |reach AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
        |  WHERE e.y <> r.x),
        |cl AS (SELECT x AS doc_id, least(x, min(y)) AS cluster_id
        |       FROM reach GROUP BY x),
        |direct AS (SELECT c.cluster_id, count(*) AS n_direct
        |           FROM pairs p JOIN cl c ON p.a = c.doc_id GROUP BY 1),
        |pc AS (SELECT s.cluster_id, s.sz, d.n_direct,
        |         s.sz * (s.sz - 1) // 2 AS poss
        |       FROM (SELECT cluster_id, count(*) AS sz FROM cl GROUP BY 1) s
        |       JOIN direct d ON s.cluster_id = d.cluster_id)
        |SELECT CAST(length(bin(sz)) - 1 AS INTEGER) AS size_bucket,
        |  count(*) AS n_clusters,
        |  CAST(sum(poss) AS BIGINT) AS possible_pairs,
        |  CAST(sum(n_direct) AS BIGINT) AS direct_pairs,
        |  CAST((2 * (sum(poss) - sum(n_direct)) * 1000000 + sum(poss))
        |      // (2 * sum(poss)) AS DOUBLE) / 1e6 AS closure_inflation
        |FROM pc GROUP BY 1 ORDER BY size_bucket""".stripMargin,
    "q_text_repeat_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |gl AS (SELECT doc_id, len(toks) AS dl,
        |         [{'pos': i, 'gram': array_to_string(toks[i:i+1], ' ')}
        |          for i in range(1, len(toks))] AS gs
        |       FROM t WHERE len(toks) >= 2),
        |g AS (SELECT doc_id, u.gram AS gram, u.pos AS pos
        |      FROM (SELECT doc_id, unnest(gs) AS u FROM gl)),
        |keep AS (SELECT doc_id, gram FROM (
        |    SELECT doc_id, gram, count(*) AS tf FROM g GROUP BY 1, 2) q
        |  WHERE tf BETWEEN 2 AND 100),
        |gg AS (SELECT g.* FROM g JOIN keep USING (doc_id, gram)),
        |seeds AS (SELECT x.doc_id AS doc_id, x.pos AS pa,
        |            y.pos - x.pos AS diag
        |          FROM gg x JOIN gg y
        |          ON x.doc_id = y.doc_id AND x.gram = y.gram
        |            AND x.pos < y.pos),
        |runs AS (SELECT doc_id, diag, count(*) + 1 AS run_tokens,
        |           min(pa) AS pa_start FROM (
        |    SELECT doc_id, diag, pa,
        |      pa - row_number() OVER (PARTITION BY doc_id, diag ORDER BY pa)
        |        AS grp
        |    FROM seeds) GROUP BY doc_id, diag, grp
        |  HAVING count(*) + 1 >= 3),
        |iv AS (SELECT DISTINCT doc_id, pa_start + diag AS s0,
        |         pa_start + diag + run_tokens - 1 AS e0 FROM runs),
        |mg AS (SELECT doc_id, s0, e0,
        |         max(e0) OVER (PARTITION BY doc_id ORDER BY s0, e0
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |       FROM iv),
        |grps AS (SELECT doc_id, s0, e0,
        |           sum(CASE WHEN pm IS NULL OR s0 > pm + 1 THEN 1 ELSE 0 END)
        |             OVER (PARTITION BY doc_id ORDER BY s0, e0
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS grp
        |         FROM mg),
        |spans AS (SELECT doc_id, grp, min(s0) AS s, max(e0) AS e
        |          FROM grps GROUP BY 1, 2),
        |red AS (SELECT doc_id, sum(e - s + 1) AS redundant_tokens
        |        FROM spans GROUP BY 1),
        |best AS (SELECT doc_id, n_runs, run_tokens AS max_run_tokens,
        |           diag AS max_run_period FROM (
        |    SELECT doc_id, run_tokens, diag,
        |      count(*) OVER (PARTITION BY doc_id) AS n_runs,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY run_tokens DESC, diag ASC) AS rn
        |    FROM runs) WHERE rn = 1)
        |SELECT b.doc_id, CAST(b.n_runs AS BIGINT) AS n_runs,
        |  b.max_run_tokens, b.max_run_period,
        |  CAST(r.redundant_tokens AS BIGINT) AS redundant_tokens,
        |  l.dl AS tokens_total,
        |  CAST((2 * r.redundant_tokens * 1000000 + l.dl) // (2 * l.dl)
        |    AS DOUBLE) / 1e6 AS redundancy_frac
        |FROM best b
        |JOIN red r ON b.doc_id = r.doc_id
        |JOIN gl l ON b.doc_id = l.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q_text_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |bg0 AS (SELECT unnest([{'w1': toks[i], 'w2': toks[i+1]}
        |                       for i in range(1, len(toks))]) AS bg
        |        FROM t WHERE len(toks) >= 2),
        |bgc AS (SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS c_ab
        |        FROM bg0 GROUP BY 1, 2),
        |btot AS (SELECT CAST(sum(c_ab) AS HUGEINT) AS nb FROM bgc),
        |unic AS (SELECT w, count(*) AS c FROM (
        |    SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        |ntot AS (SELECT CAST(sum(c) AS HUGEINT) AS nt FROM unic)
        |SELECT b.w1, b.w2, b.c_ab, ua.c AS c_a, ub.c AS c_b,
        |  CAST((2 * CAST(b.c_ab AS HUGEINT) * nt * nt * 1000000
        |        + nb * ua.c * ub.c)
        |      // (2 * nb * ua.c * ub.c) AS DOUBLE) / 1e6 AS lift
        |FROM bgc b
        |JOIN unic ua ON b.w1 = ua.w
        |JOIN unic ub ON b.w2 = ub.w
        |CROSS JOIN btot CROSS JOIN ntot
        |WHERE b.c_ab >= 5
        |ORDER BY lift DESC, b.w1, b.w2 LIMIT 30""".stripMargin,
    "q_dedup_span_sources" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |gl AS (SELECT doc_id,
        |         [{'pos': i, 'gram': array_to_string(toks[i:i+4], ' ')}
        |          for i in range(1, len(toks) - 3)] AS gs
        |       FROM t WHERE len(toks) >= 5),
        |g AS (SELECT doc_id, u.gram AS gram, u.pos AS pos
        |      FROM (SELECT doc_id, unnest(gs) AS u FROM gl)),
        |keep AS (SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1) q
        |  WHERE df <= 1000),
        |gg AS (SELECT g.* FROM g JOIN keep USING (gram)),
        |seeds AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa,
        |            x.pos - y.pos AS diag
        |          FROM gg x JOIN gg y USING (gram) WHERE x.doc_id < y.doc_id),
        |runs AS (SELECT a, b, count(*) + 4 AS run_tokens FROM (
        |    SELECT a, b, diag, pa,
        |      pa - row_number() OVER (PARTITION BY a, b, diag ORDER BY pa)
        |        AS grp
        |    FROM seeds) GROUP BY a, b, diag, grp
        |  HAVING count(*) + 4 >= 8)
        |SELECT sa.source AS source_a, sb.source AS source_b,
        |  count(*) AS n_runs,
        |  count(DISTINCT (r.a, r.b)) AS n_pairs,
        |  CAST(sum(r.run_tokens) AS BIGINT) AS run_tokens_sum,
        |  max(r.run_tokens) AS max_run_tokens
        |FROM runs r
        |JOIN documents sa ON r.a = sa.doc_id
        |JOIN documents sb ON r.b = sb.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_dedup_span_rewrite" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |gl AS (SELECT doc_id, len(toks) AS dl,
        |         [{'pos': i, 'gram': array_to_string(toks[i:i+4], ' ')}
        |          for i in range(1, len(toks) - 3)] AS gs
        |       FROM t WHERE len(toks) >= 5),
        |g AS (SELECT doc_id, u.gram AS gram, u.pos AS pos
        |      FROM (SELECT doc_id, unnest(gs) AS u FROM gl)),
        |keep AS (SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1) q
        |  WHERE df <= 1000),
        |gg AS (SELECT g.* FROM g JOIN keep USING (gram)),
        |seeds AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa,
        |            x.pos - y.pos AS diag
        |          FROM gg x JOIN gg y USING (gram) WHERE x.doc_id < y.doc_id),
        |runs AS (SELECT a, b, diag, count(*) + 4 AS run_tokens,
        |           min(pa) AS pa_start FROM (
        |    SELECT a, b, diag, pa,
        |      pa - row_number() OVER (PARTITION BY a, b, diag ORDER BY pa)
        |        AS grp
        |    FROM seeds) GROUP BY a, b, diag, grp
        |  HAVING count(*) + 4 >= 8),
        |iv AS (SELECT DISTINCT b AS doc_id, pa_start - diag AS s0,
        |         pa_start - diag + run_tokens - 1 AS e0 FROM runs),
        |mg AS (SELECT doc_id, s0, e0,
        |         max(e0) OVER (PARTITION BY doc_id ORDER BY s0, e0
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |       FROM iv),
        |grps AS (SELECT doc_id, s0, e0,
        |           sum(CASE WHEN pm IS NULL OR s0 > pm + 1 THEN 1 ELSE 0 END)
        |             OVER (PARTITION BY doc_id ORDER BY s0, e0
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS grp
        |         FROM mg),
        |spans AS (SELECT doc_id, grp, min(s0) AS s, max(e0) AS e
        |          FROM grps GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*) AS n_spans,
        |          sum(e - s + 1) AS tokens_removed FROM spans GROUP BY 1)
        |SELECT a.doc_id, CAST(a.n_spans AS BIGINT) AS n_spans,
        |  l.dl AS tokens_before,
        |  CAST(a.tokens_removed AS BIGINT) AS tokens_removed,
        |  CAST(l.dl - a.tokens_removed AS BIGINT) AS tokens_after,
        |  CAST((2 * a.tokens_removed * 1000000 + l.dl) // (2 * l.dl)
        |    AS DOUBLE) / 1e6 AS removed_frac
        |FROM agg a JOIN gl l ON a.doc_id = l.doc_id
        |ORDER BY a.doc_id""".stripMargin,
    "q_dedup_threshold_curve" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b,
        |    CAST(round(round(inter::DOUBLE / (na + nb - inter), 6) * 1e6, 0)
        |      AS BIGINT) AS jq
        |  FROM (
        |    SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |           count(*) AS inter
        |    FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |    GROUP BY 1, 2, 3, 4)),
        |surv AS (SELECT a, b, jq, thr FROM pairs CROSS JOIN
        |    (SELECT unnest([0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
        |       ::DOUBLE[]) AS thr)
        |  WHERE jq >= CAST(round(thr * 1e6, 0) AS BIGINT)),
        |bythr AS (SELECT thr AS threshold, count(*) AS n_pairs,
        |            sum(jq) AS sj
        |          FROM surv GROUP BY 1),
        |docs AS (SELECT thr AS threshold, count(DISTINCT doc_id) AS n_docs
        |         FROM (SELECT thr, unnest([a, b]) AS doc_id FROM surv)
        |         GROUP BY 1)
        |SELECT b.threshold,
        |  CAST(b.n_pairs AS BIGINT) AS n_pairs,
        |  CAST(d.n_docs AS BIGINT) AS n_docs,
        |  CAST((2 * sj + n_pairs) // (2 * n_pairs) AS DOUBLE) / 1e6
        |    AS mean_jaccard
        |FROM bythr b JOIN docs d ON b.threshold = d.threshold
        |ORDER BY b.threshold""".stripMargin,
    // full MinHash+LSH replay: portable integer hashing (md5-prefix base
    // hash, (a·h+b) mod 2³¹−1 permutations) makes signatures, banding,
    // candidates and the estimate bit-identical across engines
    "q_dedup_minhash_lsh" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |hs AS (SELECT doc_id,
        |         list_transform(shl,
        |           sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT % 2147483647)
        |           AS hl
        |       FROM shs),
        |sg AS (SELECT doc_id,
        |         list_transform(range(32), i ->
        |           list_min(list_transform(hl,
        |             h -> ((i + 1) * h + i * 7919) % 2147483647))) AS sig
        |       FROM hs),
        |banded AS (SELECT doc_id, sig, b AS band,
        |             md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bucket
        |           FROM sg, (SELECT unnest(range(8)) AS b)),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |           round(len(list_filter(range(32),
        |             i -> x.sig[i+1] = y.sig[i+1]))::DOUBLE / 32, 6) AS est_jaccard
        |         FROM banded x JOIN banded y
        |           ON x.band = y.band AND x.bucket = y.bucket
        |           AND x.doc_id < y.doc_id)
        |SELECT a, b, est_jaccard FROM cand WHERE est_jaccard >= 0.5
        |ORDER BY a, b""".stripMargin,
    // composes the minhash replay (est) with the df-capped exact pair
    // stage (ex) — shared t/shs CTEs — then micro-quantized band rollup
    "q_dedup_sketch_calib" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |hs AS (SELECT doc_id,
        |         list_transform(shl,
        |           sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT % 2147483647)
        |           AS hl
        |       FROM shs),
        |sg AS (SELECT doc_id,
        |         list_transform(range(32), i ->
        |           list_min(list_transform(hl,
        |             h -> ((i + 1) * h + i * 7919) % 2147483647))) AS sig
        |       FROM hs),
        |banded AS (SELECT doc_id, sig, b AS band,
        |             md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bucket
        |           FROM sg, (SELECT unnest(range(8)) AS b)),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |           round(len(list_filter(range(32),
        |             i -> x.sig[i+1] = y.sig[i+1]))::DOUBLE / 32, 6) AS est_jaccard
        |         FROM banded x JOIN banded y
        |           ON x.band = y.band AND x.bucket = y.bucket
        |           AND x.doc_id < y.doc_id),
        |est AS (SELECT a, b, est_jaccard FROM cand WHERE est_jaccard >= 0.5),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |ex AS (SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
        |       FROM (
        |         SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |                count(*) AS inter
        |         FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |         GROUP BY 1, 2, 3, 4)),
        |j AS (SELECT CAST(floor(est_jaccard * 10) AS INTEGER) AS band10,
        |        CAST(round(est_jaccard * 1e6) AS BIGINT) AS eq,
        |        CAST(round(coalesce(jaccard, 0.0) * 1e6) AS BIGINT) AS xq
        |      FROM est LEFT JOIN ex USING (a, b)),
        |g AS (SELECT band10, count(*) AS n_pairs, sum(eq) AS seq, sum(xq) AS sxq,
        |        sum(abs(eq - xq)) AS serr, max(abs(eq - xq)) AS merr
        |      FROM j GROUP BY 1)
        |SELECT round(band10 / 10.0, 1) AS est_band, n_pairs,
        |  round(CAST(seq AS DOUBLE) / n_pairs / 1e6, 6) AS mean_est,
        |  round(CAST(sxq AS DOUBLE) / n_pairs / 1e6, 6) AS mean_exact,
        |  round(CAST(serr AS DOUBLE) / n_pairs / 1e6, 6) AS mean_abs_err,
        |  round(CAST(merr AS DOUBLE) / 1e6, 6) AS max_abs_err
        |FROM g ORDER BY est_band""".stripMargin,
    "q_dedup_nearest" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |shx AS (SELECT doc_id, sh,
        |          count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |ex AS (SELECT a, b,
        |         CAST(round(round(inter::DOUBLE / (na + nb - inter), 6) * 1e6)
        |           AS BIGINT) AS jq
        |       FROM (
        |         SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |                count(*) AS inter
        |         FROM shx x JOIN shx y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |         GROUP BY 1, 2, 3, 4)),
        |dirs AS (SELECT a AS doc_id, b AS nbr, jq FROM ex
        |         UNION ALL SELECT b, a, jq FROM ex),
        |r AS (SELECT doc_id, nbr, jq,
        |        count(*) OVER (PARTITION BY doc_id) AS n_candidates,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY jq DESC, nbr ASC) AS rn
        |      FROM dirs)
        |SELECT doc_id, nbr AS nearest_doc,
        |  round(CAST(jq AS DOUBLE) / 1e6, 6) AS jaccard, n_candidates
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_lsh_tuning" -> {
      // same signature + exact-pair replay as q_dedup_sketch_calib, then
      // three band geometries (r rows over 32/r bands) counted against
      // the exact Jaccard >= 0.5 truth set
      def bandCtes(r: Int): String = {
        val nb = 32 / r
        s"""b$r AS (SELECT doc_id, b AS band,
           |         md5(array_to_string(sig[b*$r+1:b*$r+$r], ',')) AS bucket
           |       FROM sg, (SELECT unnest(range($nb)) AS b)),
           |c$r AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |        FROM b$r x JOIN b$r y
           |          ON x.band = y.band AND x.bucket = y.bucket
           |          AND x.doc_id < y.doc_id),
           |g$r AS (SELECT $r AS rows_per_band, $nb AS n_bands,
           |          count(*) AS n_cand, count(tp.a) AS n_hit
           |        FROM c$r LEFT JOIN tp
           |          ON c$r.a = tp.a AND c$r.b = tp.b)""".stripMargin
      }
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |shs AS (SELECT doc_id,
         |          list_distinct([array_to_string(toks[i:i+2], ' ')
         |                         for i in range(1, len(toks) - 1)]) AS shl
         |        FROM t WHERE len(toks) >= 3),
         |hs AS (SELECT doc_id,
         |         list_transform(shl,
         |           sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT % 2147483647)
         |           AS hl
         |       FROM shs),
         |sg AS (SELECT doc_id,
         |         list_transform(range(32), i ->
         |           list_min(list_transform(hl,
         |             h -> ((i + 1) * h + i * 7919) % 2147483647))) AS sig
         |       FROM hs),
         |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
         |capped AS (SELECT doc_id, sh FROM (
         |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
         |  WHERE df <= 1000),
         |shx AS (SELECT doc_id, sh,
         |          count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
         |ex AS (SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard
         |       FROM (
         |         SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
         |                count(*) AS inter
         |         FROM shx x JOIN shx y ON x.sh = y.sh AND x.doc_id < y.doc_id
         |         GROUP BY 1, 2, 3, 4)),
         |tp AS (SELECT a, b FROM ex WHERE jaccard >= 0.5),
         |nt AS (SELECT count(*) AS n_true FROM tp),
         |${bandCtes(2)},
         |${bandCtes(4)},
         |${bandCtes(8)}
         |SELECT rows_per_band, n_bands, n_cand, n_true,
         |  CAST((2 * 1000000 * n_hit + greatest(n_true, 1))
         |       // (2 * greatest(n_true, 1)) AS DOUBLE) / 1e6 AS recall,
         |  CAST((2 * 1000000 * n_hit + greatest(n_cand, 1))
         |       // (2 * greatest(n_cand, 1)) AS DOUBLE) / 1e6 AS precision
         |FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g4
         |      UNION ALL SELECT * FROM g8) CROSS JOIN nt
         |ORDER BY rows_per_band""".stripMargin
    },
    // full SimHash replay: md5-nibble token bits, per-bit majority vote,
    // 16-bit chunk packing and the pigeonhole candidate join — all
    // portable integer/string arithmetic, so the pair set hash-checks
    "q_dedup_simhash" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS tk FROM t),
        |h AS (SELECT doc_id, n, md5(tk) AS hx FROM tok),
        |bj AS (SELECT doc_id, n, j,
        |         CASE WHEN j % 4 = 0 THEN (d // 8) & 1
        |              WHEN j % 4 = 1 THEN (d // 4) & 1
        |              WHEN j % 4 = 2 THEN (d // 2) & 1
        |              ELSE d & 1 END AS bit
        |       FROM (SELECT doc_id, n, j,
        |               strpos('0123456789abcdef', substr(hx, j // 4 + 1, 1)) - 1
        |                 AS d
        |             FROM h, (SELECT unnest(range(64)) AS j))),
        |votes AS (SELECT doc_id, j,
        |            CASE WHEN 2 * sum(bit) > any_value(n) THEN 1 ELSE 0 END
        |              AS b
        |          FROM bj GROUP BY doc_id, j),
        |cks AS (SELECT doc_id, j // 16 AS chunk,
        |          CAST(sum(b << (j % 16)) AS BIGINT) AS ck
        |        FROM votes GROUP BY doc_id, j // 16),
        |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |          FROM cks x JOIN cks y
        |            ON x.chunk = y.chunk AND x.ck = y.ck
        |            AND x.doc_id < y.doc_id),
        |ham AS (SELECT p.a, p.b,
        |          CAST(sum(bit_count(xor(x.ck, y.ck))) AS INTEGER) AS hamming
        |        FROM pairs p
        |        JOIN cks x ON x.doc_id = p.a
        |        JOIN cks y ON y.doc_id = p.b AND y.chunk = x.chunk
        |        GROUP BY p.a, p.b)
        |SELECT a, b, hamming FROM ham WHERE hamming <= 3 ORDER BY a, b""".stripMargin,
    // First-occurrence novelty over the same distinct-shingle CTE
    "q_dedup_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |f AS (SELECT doc_id,
        |        min(doc_id) OVER (PARTITION BY sh) AS first_doc
        |      FROM sh0)
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::DOUBLE
        |        / count(*), 6) AS novelty
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Same capped-shingle CTE; containment verdict (|A∩B| / min set size)
    "q_dedup_containment" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped)
        |SELECT a, b, containment, jaccard FROM (
        |  SELECT a, b,
        |         round(inter::DOUBLE / least(na, nb), 6) AS containment,
        |         round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard FROM (
        |    SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |           count(*) AS inter
        |    FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |    GROUP BY 1, 2, 3, 4))
        |WHERE containment >= 0.6 ORDER BY a, b""".stripMargin,
    // Connected components of the ngram-Jaccard pair graph. The Spark side
    // is iterative min-label propagation; the twin computes the same
    // components via recursive-CTE transitive closure (UNION dedups, so
    // cycles terminate) — tractable at oracle scale, exact semantics.
    "q_dedup_clusters" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, inter::DOUBLE / (na + nb - inter) AS jac FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |edges AS (SELECT a AS x, b AS y FROM pairs
        |          UNION SELECT b AS x, a AS y FROM pairs),
        |reach AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
        |  WHERE e.y <> r.x)
        |SELECT x AS doc_id, least(x, min(y)) AS cluster_id
        |FROM reach GROUP BY x ORDER BY doc_id""".stripMargin,
    "q_dedup_boilerplate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |idx AS (SELECT sh0.doc_id, sh, source
        |        FROM sh0 JOIN documents USING (doc_id)),
        |nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs
        |       FROM idx GROUP BY 1),
        |sdf AS (SELECT source, sh, count(*) AS df FROM idx GROUP BY 1, 2),
        |fl AS (SELECT s.source, s.sh,
        |         (s.df >= 2 AND s.df * 5 >= nd.n_docs) AS boiler
        |       FROM sdf s JOIN nd USING (source)),
        |pd AS (SELECT i.source, i.doc_id,
        |         (2 * 1000000 * sum(CASE WHEN f.boiler THEN 1 ELSE 0 END)
        |          + count(*)) // (2 * count(*)) AS frac_ppm
        |       FROM idx i JOIN fl f ON f.source = i.source AND f.sh = i.sh
        |       GROUP BY 1, 2),
        |vocab AS (SELECT source, count(*) AS n_shingles,
        |            CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
        |              AS n_boiler_shingles
        |          FROM fl GROUP BY 1)
        |SELECT source, count(*) AS n_docs, n_shingles, n_boiler_shingles,
        |  CAST((2 * sum(frac_ppm) + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 1e6 AS mean_doc_boiler_frac,
        |  CAST(max(frac_ppm) AS DOUBLE) / 1e6 AS max_doc_boiler_frac
        |FROM pd JOIN vocab USING (source)
        |GROUP BY source, n_shingles, n_boiler_shingles
        |ORDER BY source""".stripMargin,
    "q_dedup_winnow_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |hs AS (SELECT doc_id,
        |    list_transform(range(1, len(toks) - 1),
        |      i -> ('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
        |            1, 15))::BIGINT) AS h
        |  FROM t WHERE len(toks) >= 3),
        |pos AS (SELECT doc_id, unnest(
        |    list_transform(range(1, len(h) + 1), i ->
        |      CASE WHEN
        |        (CASE WHEN i > 1 AND h[i-1] < h[i] THEN 1
        |              WHEN i > 2 AND h[i-2] < h[i] THEN 2
        |              WHEN i > 3 AND h[i-3] < h[i] THEN 3 ELSE 4 END)
        |      + (CASE WHEN h[i+1] < h[i] THEN 1
        |              WHEN h[i+2] < h[i] THEN 2
        |              WHEN h[i+3] < h[i] THEN 3 ELSE 4 END) > 4
        |      THEN h[i] ELSE NULL END)) AS fp
        |  FROM hs),
        |sel AS (SELECT DISTINCT doc_id, fp FROM pos WHERE fp IS NOT NULL),
        |capped AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 1000),
        |idx AS (SELECT s.doc_id, s.fp FROM sel s JOIN capped USING (fp)),
        |nfp AS (SELECT doc_id, count(*) AS n_fp FROM sel GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS n_shared_fp
        |  FROM idx a JOIN idx b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT doc_a, doc_b, n_shared_fp,
        |  na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
        |  CAST((2 * n_shared_fp * 1000000 + least(na.n_fp, nb.n_fp))
        |       // (2 * least(na.n_fp, nb.n_fp)) AS DOUBLE) / 1e6
        |    AS containment
        |FROM pairs
        |JOIN nfp na ON na.doc_id = doc_a
        |JOIN nfp nb ON nb.doc_id = doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_df_profile" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |df AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY 1)
        |SELECT CAST(length(bin(df)) - 1 AS INTEGER) AS df_bucket,
        |  count(*) AS n_shingles,
        |  CAST(sum(df) AS BIGINT) AS n_postings,
        |  CAST(sum(CASE WHEN df > 1000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_capped_shingles,
        |  CAST(sum(CASE WHEN df > 1000 THEN df ELSE 0 END) AS BIGINT)
        |    AS capped_postings
        |FROM df GROUP BY 1 ORDER BY df_bucket""".stripMargin,
    // q_dedup_ngram_jaccard's pair CTE + two shrinking degree rollups
    "q_dedup_kcore" -> kcoreTwin(k = 2, rounds = 3),
    "q_dedup_degree_dist" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jac FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |deg AS (SELECT doc_id, count(*) AS degree FROM (
        |    SELECT a AS doc_id FROM pairs
        |    UNION ALL SELECT b AS doc_id FROM pairs)
        |  GROUP BY 1)
        |SELECT degree, count(*) AS n_docs
        |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin,
    // same pair CTE; triangles counted once via a < b < c ordered joins
    // (orientation-invariant, so the oracle needn't replay the engine's
    // degree-ordered compact-forward plan)
    "q_dedup_triangles" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jac FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |deg AS (SELECT doc_id, count(*) AS degree FROM (
        |    SELECT a AS doc_id FROM pairs
        |    UNION ALL SELECT b AS doc_id FROM pairs)
        |  GROUP BY 1),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM pairs e1
        |        JOIN pairs e2 ON e2.a = e1.b
        |        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM pairs) AS n_edges,
        |  (SELECT CAST(coalesce(sum(degree * (degree - 1) // 2), 0) AS BIGINT)
        |   FROM deg) AS n_wedges,
        |  n_triangles,
        |  CASE WHEN (SELECT coalesce(sum(degree * (degree - 1) // 2), 0)
        |             FROM deg) = 0
        |    THEN 0.0
        |    ELSE ((2 * (n_triangles * 3000000) +
        |           (SELECT sum(degree * (degree - 1) // 2) FROM deg))
        |          // (2 * (SELECT sum(degree * (degree - 1) // 2) FROM deg)))
        |         ::DOUBLE / 1000000.0 END AS transitivity
        |FROM tri""".stripMargin,
    // incremental attach replayed end-to-end: the corpus closure (the
    // q_dedup_clusters twin) gives the snapshot labels, batch edges join
    // the SNAPSHOT capped index, corpus endpoints contract to their
    // label, and a SECOND recursive closure runs on the contracted graph
    "q_dedup_incr_clusters" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jac
        |    FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |edges AS (SELECT a AS x, b AS y FROM pairs
        |          UNION SELECT b AS x, a AS y FROM pairs),
        |reach AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
        |  WHERE e.y <> r.x),
        |lab AS (SELECT x AS doc_id, least(x, min(y)) AS cluster_id
        |        FROM reach GROUP BY x),
        |bt AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |       WHERE doc_id % 25 = 0),
        |btt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM bt),
        |bshs AS (SELECT doc_id,
        |           list_distinct([array_to_string(toks[i:i+2], ' ')
        |                          for i in range(1, len(toks) - 1)]) AS shl
        |         FROM btt WHERE len(toks) >= 3),
        |bsh0 AS (SELECT doc_id, unnest(shl) AS sh FROM bshs),
        |bcapped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df
        |    FROM bsh0)
        |  WHERE df <= 1000),
        |bsh AS (SELECT doc_id, sh,
        |          count(*) OVER (PARTITION BY doc_id) AS n_sh FROM bcapped),
        |bce AS (
        |  SELECT b, c FROM (
        |    SELECT x.doc_id AS b, y.doc_id AS c, x.n_sh AS nb, y.n_sh AS nc,
        |           count(*) AS inter
        |    FROM bsh x JOIN sh y ON x.sh = y.sh
        |    GROUP BY 1, 2, 3, 4)
        |  WHERE round(inter::DOUBLE / (nb + nc - inter), 6) >= 0.2),
        |bbe AS (
        |  SELECT a, b FROM (
        |    SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |           count(*) AS inter
        |    FROM bsh x JOIN bsh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |    GROUP BY 1, 2, 3, 4)
        |  WHERE round(inter::DOUBLE / (na + nb - inter), 6) >= 0.2),
        |cont AS (SELECT bce.b AS a, coalesce(l.cluster_id, bce.c) AS b
        |         FROM bce LEFT JOIN lab l ON l.doc_id = bce.c),
        |allnew AS (SELECT a, b FROM cont UNION SELECT a, b FROM bbe),
        |e2 AS (SELECT a AS x, b AS y FROM allnew
        |       UNION SELECT b AS x, a AS y FROM allnew),
        |reach2 AS (
        |  SELECT x, y FROM e2
        |  UNION
        |  SELECT r.x, e.y FROM reach2 r JOIN e2 e ON r.y = e.x
        |  WHERE e.y <> r.x),
        |comp AS (SELECT x AS node, least(x, min(y)) AS cluster_id
        |         FROM reach2 GROUP BY x),
        |sup AS (SELECT DISTINCT b AS node FROM allnew
        |        WHERE b NOT IN (SELECT doc_id FROM bt)),
        |cstat AS (SELECT c.cluster_id, count(*) AS n_corpus
        |          FROM comp c JOIN sup ON sup.node = c.node GROUP BY 1)
        |SELECT bt.doc_id,
        |  coalesce(comp.cluster_id, bt.doc_id) AS cluster,
        |  coalesce(cstat.n_corpus, 0) AS n_corpus_clusters,
        |  CASE WHEN coalesce(cstat.n_corpus, 0) = 0 THEN 'new'
        |       WHEN cstat.n_corpus = 1 THEN 'joined'
        |       ELSE 'merged' END AS status
        |FROM bt
        |LEFT JOIN comp ON comp.node = bt.doc_id
        |LEFT JOIN cstat ON cstat.cluster_id = comp.cluster_id
        |ORDER BY doc_id""".stripMargin,
    // lexical candidates (same pair CTE, carrying jaccard) verified by
    // embedding cosine where both endpoints are embedded; the CASE keeps
    // NULL-coverage pairs 'unverified' before the threshold comparison
    "q_dedup_hybrid" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |shs AS (SELECT doc_id,
         |          list_distinct([array_to_string(toks[i:i+2], ' ')
         |                         for i in range(1, len(toks) - 1)]) AS shl
         |        FROM t WHERE len(toks) >= 3),
         |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
         |capped AS (SELECT doc_id, sh FROM (
         |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
         |  WHERE df <= 1000),
         |sh AS (SELECT doc_id, sh,
         |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
         |pairs AS (
         |  SELECT a, b, jac AS jaccard FROM (
         |    SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jac FROM (
         |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
         |             count(*) AS inter
         |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
         |      GROUP BY 1, 2, 3, 4))
         |  WHERE jac >= 0.2),
         |j AS (SELECT p.a, p.b, p.jaccard,
         |        CASE WHEN x.vec_id IS NOT NULL AND y.vec_id IS NOT NULL
         |             THEN round(${duckCos("x.embedding", "y.embedding")}, 6)
         |        END AS cos_sim
         |      FROM pairs p
         |      LEFT JOIN embeddings x ON x.vec_id = p.a
         |      LEFT JOIN embeddings y ON y.vec_id = p.b)
         |SELECT a, b, jaccard, cos_sim,
         |  CASE WHEN cos_sim IS NULL THEN 'unverified'
         |       WHEN cos_sim >= 0.0 THEN 'confirmed'
         |       ELSE 'rejected' END AS verdict
         |FROM j ORDER BY a, b""".stripMargin,
    "q_text_winnow_profile" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks
        |           FROM documents),
        |hs AS (SELECT source,
        |    list_transform(range(1, len(toks) - 1),
        |      i -> ('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
        |            1, 15))::BIGINT) AS h
        |  FROM t WHERE len(toks) >= 3),
        |pos AS (SELECT source, unnest(
        |    list_transform(range(1, len(h) + 1), i ->
        |      CASE WHEN
        |        (CASE WHEN i > 1 AND h[i-1] < h[i] THEN 1
        |              WHEN i > 2 AND h[i-2] < h[i] THEN 2
        |              WHEN i > 3 AND h[i-3] < h[i] THEN 3 ELSE 4 END)
        |      + (CASE WHEN h[i+1] < h[i] THEN 1
        |              WHEN h[i+2] < h[i] THEN 2
        |              WHEN h[i+3] < h[i] THEN 3 ELSE 4 END) > 4
        |      THEN h[i] ELSE NULL END)) AS fp
        |  FROM hs),
        |g AS (SELECT source, fp, count(*) AS c FROM pos GROUP BY 1, 2)
        |SELECT source,
        |  CAST(sum(c) AS BIGINT) AS n_positions,
        |  CAST(sum(CASE WHEN fp IS NOT NULL THEN c ELSE 0 END) AS BIGINT)
        |    AS n_selected,
        |  CAST((2 * sum(CASE WHEN fp IS NOT NULL THEN c ELSE 0 END) * 1000000
        |        + sum(c)) // (2 * sum(c)) AS DOUBLE) / 1e6 AS density,
        |  CAST(sum(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_distinct_fp,
        |  CAST(sum(CASE WHEN fp IS NOT NULL AND c > 1 THEN c ELSE 0 END)
        |    AS BIGINT) AS n_dup_positions
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "q_text_char_diversity" ->
      """WITH cs AS (SELECT source, length(text) AS n,
        |              string_split(text, '') AS c FROM documents),
        |g AS (SELECT source, n,
        |  list_sum(list_transform(list_distinct(c),
        |    ch -> CAST(len(list_filter(c, x -> x = ch)) AS BIGINT)
        |          * len(list_filter(c, x -> x = ch)))) AS ssq,
        |  CAST(list_max(list_transform(list_distinct(c),
        |    ch -> len(list_filter(c, x -> x = ch)))) AS BIGINT) AS mx
        | FROM cs),
        |q AS (SELECT source,
        |  (2 * 1000000 * (n*n - ssq) + n*n) // (2 * n*n) AS gini_ppm,
        |  (2 * 1000000 * mx + n) // (2 * n) AS topchar_ppm FROM g)
        |SELECT source, count(*) AS n_docs,
        |  CAST((2 * sum(gini_ppm) + count(*)) // (2 * count(*)) AS DOUBLE)
        |    / 1e6 AS mean_gini,
        |  CAST(min(gini_ppm) AS DOUBLE) / 1e6 AS min_gini,
        |  CAST(sum(CASE WHEN gini_ppm < 915000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low,
        |  CAST(max(topchar_ppm) AS DOUBLE) / 1e6 AS max_topchar
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q_text_keyphrases" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |g AS (SELECT source, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS n_src FROM g GROUP BY 1),
        |ns AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
        |sc AS (SELECT source, term, tf, n_src,
        |         tf * CAST(round((ln((n_sources + 1)::DOUBLE / (n_src + 1))
        |              + 1.0) * 1000000.0, 0) AS BIGINT) AS score_q,
        |         ('0x' || substr(md5(term), 1, 15))::BIGINT AS tid
        |       FROM g CROSS JOIN ns JOIN df USING (term)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY score_q DESC, tid) AS rank
        |      FROM sc)
        |SELECT source, CAST(rank AS INTEGER) AS rank, term, tf, n_src,
        |  round(score_q::DOUBLE / 1000000.0, 6) AS score
        |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    // q_dedup_ngram_jaccard's pair CTE + a source join per endpoint
    "q_dedup_cross_source" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b, jaccard FROM (
        |    SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jaccard FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jaccard >= 0.2)
        |SELECT least(da.source, db.source) AS source_lo,
        |  greatest(da.source, db.source) AS source_hi,
        |  count(*) AS n_pairs,
        |  ((2 * sum(CAST(round(jaccard * 1000000.0, 0) AS BIGINT)) + count(*))
        |   // (2 * count(*)))::DOUBLE / 1000000.0 AS mean_jaccard
        |FROM pairs
        |JOIN documents da ON a = da.doc_id
        |JOIN documents db ON b = db.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q_dedup_clusters' recursive-CTE body + the hashSplit assignment on
    // the component id (singletons fall back to their own doc_id)
    "q_prep_cluster_split" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, inter::DOUBLE / (na + nb - inter) AS jac FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |edges AS (SELECT a AS x, b AS y FROM pairs
        |          UNION SELECT b AS x, a AS y FROM pairs),
        |reach AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
        |  WHERE e.y <> r.x),
        |cl AS (SELECT x AS doc_id, least(x, min(y)) AS cluster_id
        |       FROM reach GROUP BY x),
        |keyed AS (SELECT d.doc_id,
        |            coalesce(cl.cluster_id, d.doc_id) AS group_key
        |          FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
        |SELECT doc_id, group_key,
        |  CASE WHEN substring(md5('split:' || group_key::VARCHAR), 1, 2) < 'cc'
        |       THEN 'train'
        |       WHEN substring(md5('split:' || group_key::VARCHAR), 1, 2) < 'e6'
        |       THEN 'val' ELSE 'test' END AS split
        |FROM keyed ORDER BY doc_id""".stripMargin,
    // q_dedup_clusters' recursive-CTE body + per-cluster sizes discounting
    // each doc's token count
    "q_prep_effective_tokens" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, inter::DOUBLE / (na + nb - inter) AS jac FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |edges AS (SELECT a AS x, b AS y FROM pairs
        |          UNION SELECT b AS x, a AS y FROM pairs),
        |reach AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
        |  WHERE e.y <> r.x),
        |cl AS (SELECT x AS doc_id, least(x, min(y)) AS cluster_id
        |       FROM reach GROUP BY x),
        |sizes AS (SELECT cluster_id, count(*) AS csize FROM cl GROUP BY 1),
        |ws AS (SELECT cl.doc_id, sizes.csize
        |       FROM cl JOIN sizes USING (cluster_id)),
        |q AS (SELECT d.source, len(string_split(d.text, ' ')) AS n_tok,
        |        CAST(round(len(string_split(d.text, ' '))::DOUBLE
        |             / coalesce(ws.csize, 1) * 1000000.0, 0) AS BIGINT) AS eff_q
        |      FROM documents d LEFT JOIN ws ON d.doc_id = ws.doc_id)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
        |  ((2 * sum(eff_q) + 10000) // 20000)::DOUBLE / 100.0
        |    AS effective_tokens,
        |  round((((2 * sum(eff_q) + 10000) // 20000)::DOUBLE / 100.0)
        |        / sum(n_tok), 6) AS retention
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_prep_source_budget" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks
        |           FROM documents),
        |b AS (SELECT source,
        |        least(CAST(floor(round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |              * (len(list_distinct(toks))::DOUBLE / len(toks)), 4)
        |              * 10) AS INTEGER), 9) AS qbucket,
        |        len(toks) AS n_tok
        |      FROM t),
        |g AS (SELECT source, qbucket, count(*) AS n_docs,
        |        CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |      FROM b GROUP BY 1, 2)
        |SELECT source, qbucket, n_docs, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY qbucket DESC)
        |       AS BIGINT) AS cum_tokens,
        |  round(sum(n_tokens) OVER (PARTITION BY source ORDER BY qbucket DESC)::DOUBLE
        |        / sum(n_tokens) OVER (PARTITION BY source), 6) AS cum_share
        |FROM g ORDER BY source, qbucket DESC""".stripMargin,
    // q_dedup_clusters' recursive-CTE body + quality ranking per cluster
    "q_dedup_cluster_reps" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
        |capped AS (SELECT doc_id, sh FROM (
        |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
        |  WHERE df <= 1000),
        |sh AS (SELECT doc_id, sh,
        |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
        |pairs AS (
        |  SELECT a, b FROM (
        |    SELECT a, b, inter::DOUBLE / (na + nb - inter) AS jac FROM (
        |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
        |             count(*) AS inter
        |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |      GROUP BY 1, 2, 3, 4))
        |  WHERE jac >= 0.2),
        |edges AS (SELECT a AS x, b AS y FROM pairs
        |          UNION SELECT b AS x, a AS y FROM pairs),
        |reach AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
        |  WHERE e.y <> r.x),
        |cl AS (SELECT x AS doc_id, least(x, min(y)) AS cluster_id
        |       FROM reach GROUP BY x),
        |q AS (SELECT doc_id,
        |        round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |              * (len(list_distinct(toks))::DOUBLE / len(toks)), 4)
        |          AS quality
        |      FROM t)
        |SELECT doc_id, cluster_id, quality, rn = 1 AS is_rep,
        |  first_value(doc_id) OVER (PARTITION BY cluster_id
        |    ORDER BY quality DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS rep_id
        |FROM (SELECT cl.doc_id, cl.cluster_id, q.quality,
        |        row_number() OVER (PARTITION BY cluster_id
        |          ORDER BY quality DESC, cl.doc_id) AS rn
        |      FROM cl JOIN q USING (doc_id))
        |ORDER BY doc_id""".stripMargin,
    // End-to-end curation pipeline: langid + quality + exact dedup + CASE
    // decision. Rule order (too_short → low_quality → duplicate → kept)
    // is part of the contract and mirrored exactly here.
    "q_curate" ->
      """WITH t AS (SELECT doc_id, text, md5(text) AS fp,
        |             string_split(text, ' ') AS toks,
        |             string_split(lower(text), ' ') AS ltoks
        |           FROM documents),
        |langs AS (
        |  SELECT doc_id, lng AS lang_predicted, score AS confidence FROM (
        |    SELECT doc_id, p.lng,
        |      round(len(list_filter(ltoks, x -> list_contains(p.words, x)))::DOUBLE
        |            / greatest(len(ltoks), 1), 6) AS score,
        |      row_number() OVER (PARTITION BY doc_id
        |                         ORDER BY round(len(list_filter(ltoks,
        |                           x -> list_contains(p.words, x)))::DOUBLE
        |                           / greatest(len(ltoks), 1), 6) DESC,
        |                           p.lng DESC) AS rn
        |    FROM t, (VALUES ('de', ['der','die','das','und','ist']),
        |                    ('en', ['the','a','of','and','to']),
        |                    ('es', ['el','la','de','que','y']),
        |                    ('fr', ['le','la','les','et','que']),
        |                    ('zh', ['的','是','了','在','我'])) AS p(lng, words))
        |  WHERE rn = 1),
        |sig AS (SELECT doc_id, fp,
        |          CAST(len(toks) AS INTEGER) AS n_tokens,
        |          round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |                * (len(list_distinct(toks))::DOUBLE / len(toks)), 4)
        |            AS quality
        |        FROM t),
        |canon AS (SELECT fp, min(doc_id) AS canonical FROM sig GROUP BY fp)
        |SELECT s.doc_id, l.lang_predicted, l.confidence, s.quality, s.n_tokens,
        |  (s.doc_id <> c.canonical) AS is_dup_copy,
        |  CASE WHEN s.n_tokens < 20 THEN 'too_short'
        |       WHEN s.quality < 0.5 THEN 'low_quality'
        |       WHEN s.doc_id <> c.canonical THEN 'duplicate'
        |       ELSE 'kept' END AS decision
        |FROM sig s JOIN canon c USING (fp) JOIN langs l USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,
    "q_curate_funnel" ->
      """WITH t AS (SELECT doc_id, text, md5(text) AS fp,
        |             string_split(text, ' ') AS toks
        |           FROM documents),
        |sig AS (SELECT doc_id, fp,
        |          CAST(len(toks) AS INTEGER) AS n_tokens,
        |          round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |                * (len(list_distinct(toks))::DOUBLE / len(toks)), 4)
        |            AS quality
        |        FROM t),
        |canon AS (SELECT fp, min(doc_id) AS canonical FROM sig GROUP BY fp),
        |dec AS (
        |  SELECT s.doc_id, s.n_tokens, s.quality,
        |    CASE WHEN s.n_tokens < 20 THEN 'too_short'
        |         WHEN s.quality < 0.5 THEN 'low_quality'
        |         WHEN s.doc_id <> c.canonical THEN 'duplicate'
        |         ELSE 'kept' END AS decision
        |  FROM sig s JOIN canon c USING (fp))
        |SELECT decision, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  round(avg(quality), 4) AS avg_quality
        |FROM dec GROUP BY decision ORDER BY decision""".stripMargin,
    // Decile boundaries via quantile_cont (the percentile twin the RFM
    // query established); bucket by comparison, dup flag via fp window
    "q_curate_calibration" ->
      """WITH sig AS (
        |  SELECT doc_id, md5(text) AS fp,
        |    round(least(len(string_split(text, ' '))::DOUBLE / 50.0, 1.0)
        |          * (len(list_distinct(string_split(text, ' ')))::DOUBLE
        |             / len(string_split(text, ' '))), 4) AS quality,
        |    len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |f AS (SELECT *, count(*) OVER (PARTITION BY fp) > 1 AS is_dup FROM sig),
        |b AS (SELECT
        |    round(quantile_cont(quality, 0.1), 4) AS q1,
        |    round(quantile_cont(quality, 0.2), 4) AS q2,
        |    round(quantile_cont(quality, 0.3), 4) AS q3,
        |    round(quantile_cont(quality, 0.4), 4) AS q4,
        |    round(quantile_cont(quality, 0.5), 4) AS q5,
        |    round(quantile_cont(quality, 0.6), 4) AS q6,
        |    round(quantile_cont(quality, 0.7), 4) AS q7,
        |    round(quantile_cont(quality, 0.8), 4) AS q8,
        |    round(quantile_cont(quality, 0.9), 4) AS q9
        |  FROM sig),
        |x AS (SELECT
        |    1 + (quality > q1)::INT + (quality > q2)::INT + (quality > q3)::INT
        |      + (quality > q4)::INT + (quality > q5)::INT + (quality > q6)::INT
        |      + (quality > q7)::INT + (quality > q8)::INT + (quality > q9)::INT
        |      AS decile,
        |    is_dup, quality, n_tokens
        |  FROM f CROSS JOIN b)
        |SELECT decile, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
        |  round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
        |    AS dup_rate,
        |  round(avg(quality), 4) AS avg_quality,
        |  round(avg(n_tokens), 2) AS avg_tokens
        |FROM x GROUP BY decile ORDER BY decile""".stripMargin,
    "q_text_zipf" ->
      """WITH tc AS (SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term)
        |SELECT CAST(length(bin(cnt)) - 1 AS INTEGER) AS freq_bucket,
        |  count(*) AS n_terms, CAST(sum(cnt) AS BIGINT) AS n_occurrences,
        |  min(cnt) AS min_cnt, max(cnt) AS max_cnt
        |FROM tc GROUP BY 1 ORDER BY freq_bucket""".stripMargin,
    // SymSpell deletion-neighborhood join (see TextOps.typoPairs): two
    // terms within edit distance 2 always share a depth-2 deletion.
    "q_text_typo_pairs" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |v AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term
        |      HAVING length(term) >= 2),
        |d1 AS (SELECT term, cnt,
        |         substr(term, 1, i - 1) || substr(term, i + 1, length(term) - i) AS key
        |       FROM (SELECT term, cnt, unnest(range(1, length(term) + 1)) AS i FROM v)),
        |d2 AS (SELECT term, cnt,
        |         substr(term, 1, i - 1) || substr(term, i + 1, j - i - 1)
        |           || substr(term, j + 1, length(term) - j) AS key
        |       FROM (SELECT term, cnt, i, unnest(range(i + 1, length(term) + 1)) AS j
        |             FROM (SELECT term, cnt, unnest(range(1, length(term))) AS i FROM v))),
        |k AS (SELECT DISTINCT term, cnt, key FROM (
        |        SELECT term, cnt, term AS key FROM v
        |        UNION ALL SELECT * FROM d1
        |        UNION ALL SELECT * FROM d2))
        |SELECT DISTINCT a.term AS term_a, b.term AS term_b,
        |       a.cnt AS cnt_a, b.cnt AS cnt_b,
        |       CAST(levenshtein(a.term, b.term) AS INTEGER) AS lev
        |FROM k a JOIN k b USING (key)
        |WHERE a.term < b.term AND levenshtein(a.term, b.term) <= 2
        |ORDER BY term_a, term_b""".stripMargin,
    "q_text_length_profile" ->
      """SELECT source, count(*) AS n_docs,
        |  min(n_chars) AS min_chars,
        |  round(quantile_cont(n_chars, 0.25), 2) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 2) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 2) AS p75,
        |  round(quantile_cont(n_chars, 0.95), 2) AS p95,
        |  max(n_chars) AS max_chars,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_impact" ->
      """WITH g AS (SELECT md5(text) AS fp, count(*) AS group_size
        |           FROM documents GROUP BY fp)
        |SELECT group_size, count(*) AS n_groups,
        |  group_size * count(*) AS n_docs,
        |  (group_size - 1) * count(*) AS n_removable
        |FROM g GROUP BY group_size ORDER BY group_size""".stripMargin,
    "q_dedup_block_rewrite" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, CAST(len(toks) // 16 AS INTEGER) AS nb, toks
        |      FROM t WHERE len(toks) >= 16),
        |e AS (SELECT doc_id, nb, unnest(range(0, nb)) AS bi, toks FROM b),
        |blk AS (SELECT doc_id, nb, CAST(bi AS INTEGER) AS bi,
        |          md5(array_to_string(toks[bi*16 + 1 : bi*16 + 16], ' ')) AS bfp
        |        FROM e),
        |k AS (SELECT doc_id, nb, bi, bfp,
        |        row_number() OVER (PARTITION BY bfp ORDER BY doc_id, bi) = 1
        |          AS keep
        |      FROM blk)
        |SELECT doc_id, nb AS n_blocks,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / nb, 6)
        |    AS kept_frac,
        |  md5(coalesce(string_agg(CASE WHEN keep THEN bfp END, ''
        |                          ORDER BY bi), '')) AS kept_fp
        |FROM k GROUP BY doc_id, nb ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
        |idx AS (SELECT DISTINCT fp FROM d WHERE source <> 'src0'),
        |b AS (SELECT doc_id, fp,
        |        min(doc_id) OVER (PARTITION BY fp) AS first_id
        |      FROM d WHERE source = 'src0')
        |SELECT doc_id, fp,
        |  CASE WHEN fp IN (SELECT fp FROM idx) THEN 'dup_of_corpus'
        |       WHEN first_id < doc_id THEN 'dup_in_batch'
        |       ELSE 'unique' END AS status
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_dedup_blocks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, CAST(len(toks) // 16 AS INTEGER) AS nb, toks
        |      FROM t WHERE len(toks) >= 16),
        |e AS (SELECT doc_id, nb, unnest(range(0, nb)) AS bi, toks FROM b),
        |blk AS (SELECT doc_id, nb,
        |          md5(array_to_string(toks[bi*16 + 1 : bi*16 + 16], ' ')) AS bfp
        |        FROM e),
        |wc AS (SELECT doc_id, nb,
        |         CASE WHEN count(*) OVER (PARTITION BY bfp) > 1
        |              THEN 1 ELSE 0 END AS is_dup
        |       FROM blk)
        |SELECT doc_id, nb AS n_blocks,
        |  CAST(sum(is_dup) AS BIGINT) AS n_dup_blocks,
        |  round(sum(is_dup)::DOUBLE / nb, 6) AS dup_block_frac
        |FROM wc GROUP BY doc_id, nb ORDER BY doc_id""".stripMargin,
    "q_dedup_dup_shingles" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id,
        |         substr(md5(array_to_string(t[i : i + 4], ' ')), 1, 16) AS sfp
        |       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i
        |             FROM t WHERE len(t) >= 5)),
        |c AS (SELECT sfp, count(*) AS cnt FROM sh GROUP BY sfp)
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
        |  round(CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
        |    AS dup_frac
        |FROM sh JOIN c USING (sfp)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_prf_topk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(t)) AS avgdl,
        |  sum(CASE WHEN list_contains(t, 'spark') THEN 1.0 ELSE 0.0 END) AS df0,
        |  sum(CASE WHEN list_contains(t, 'hash') THEN 1.0 ELSE 0.0 END) AS df1,
        |  sum(CASE WHEN list_contains(t, 'join') THEN 1.0 ELSE 0.0 END) AS df2
        |  FROM t),
        |r1 AS (SELECT doc_id FROM (SELECT doc_id,
        |  round(
        |    ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
        |      * len(list_filter(t, x -> x = 'spark'))::DOUBLE * 2.2
        |      / (len(list_filter(t, x -> x = 'spark'))::DOUBLE
        |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl))
        |  + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
        |      * len(list_filter(t, x -> x = 'hash'))::DOUBLE * 2.2
        |      / (len(list_filter(t, x -> x = 'hash'))::DOUBLE
        |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl))
        |  + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
        |      * len(list_filter(t, x -> x = 'join'))::DOUBLE * 2.2
        |      / (len(list_filter(t, x -> x = 'join'))::DOUBLE
        |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl)), 6) AS bm25
        |  FROM t, st) WHERE bm25 > 0 ORDER BY bm25 DESC, doc_id LIMIT 3),
        |fbc AS (SELECT term, count(*) AS tf_fb
        |        FROM (SELECT unnest(t.t) AS term FROM t JOIN r1 USING (doc_id))
        |        WHERE term NOT IN ('spark', 'hash', 'join') GROUP BY 1),
        |dfs AS (SELECT term, count(*) AS df_fb FROM (
        |          SELECT DISTINCT u.doc_id, u.term
        |          FROM (SELECT doc_id, unnest(t) AS term FROM t) u
        |          JOIN fbc USING (term)) GROUP BY 1),
        |expt AS (SELECT term, 0.5 AS w FROM (
        |          SELECT f.term,
        |            f.tf_fb * CAST(round(ln(n_docs / df_fb) * 1e6, 0) AS BIGINT)
        |              AS wq
        |          FROM fbc f JOIN dfs USING (term) CROSS JOIN st)
        |         ORDER BY wq DESC, term LIMIT 3),
        |q AS (SELECT unnest(['spark', 'hash', 'join']) AS term, 1.0 AS w
        |      UNION ALL SELECT term, w FROM expt),
        |m AS (SELECT u.doc_id, u.term, count(*) AS tf, max(u.dl) AS dl,
        |        max(q.w) AS w
        |      FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM t) u
        |      JOIN q USING (term) GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM m GROUP BY 1),
        |ct AS (SELECT doc_id, CAST(round(
        |         w * ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |           * tf::DOUBLE * 2.2
        |           / (tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl::DOUBLE / avgdl))
        |         * 1e6, 0) AS BIGINT) AS cq
        |       FROM m JOIN dfq USING (term) CROSS JOIN st)
        |SELECT doc_id, CAST(sum(cq) AS DOUBLE) / 1e6 AS prf_score
        |FROM ct GROUP BY doc_id
        |ORDER BY prf_score DESC, doc_id LIMIT 10""".stripMargin,
    "q_text_bm25" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(t)) AS avgdl,
        |  sum(CASE WHEN list_contains(t, 'spark') THEN 1.0 ELSE 0.0 END) AS df0,
        |  sum(CASE WHEN list_contains(t, 'hash') THEN 1.0 ELSE 0.0 END) AS df1,
        |  sum(CASE WHEN list_contains(t, 'join') THEN 1.0 ELSE 0.0 END) AS df2
        |  FROM t),
        |sc AS (SELECT doc_id,
        |  round(
        |    ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
        |      * len(list_filter(t, x -> x = 'spark'))::DOUBLE * 2.2
        |      / (len(list_filter(t, x -> x = 'spark'))::DOUBLE
        |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl))
        |  + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
        |      * len(list_filter(t, x -> x = 'hash'))::DOUBLE * 2.2
        |      / (len(list_filter(t, x -> x = 'hash'))::DOUBLE
        |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl))
        |  + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
        |      * len(list_filter(t, x -> x = 'join'))::DOUBLE * 2.2
        |      / (len(list_filter(t, x -> x = 'join'))::DOUBLE
        |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl)), 6) AS bm25
        |FROM t, st)
        |SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,
    // Sparse tf-idf cosine pairs: weights quantized to integer micro-units
    // so the dot/norm sums are order-independent on both engines; the one
    // double expression (dot / (sqrt·sqrt)) is identical IEEE math.
    "q_text_tfidf_pairs" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |tok AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |               unnest(string_split(text, ' ')) AS term
        |        FROM documents),
        |tf AS (SELECT doc_id, n_tok, term, count(*) AS cnt
        |       FROM tok GROUP BY 1, 2, 3),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |w AS (SELECT doc_id, term,
        |        CAST(round((cnt::DOUBLE / n_tok)
        |          * ln(n_docs::DOUBLE / df) * 1e6) AS BIGINT) AS wq
        |      FROM tf JOIN df USING (term) CROSS JOIN n
        |      WHERE df * 10 <= n_docs AND df <= 1000),
        |norms AS (SELECT doc_id, sum(wq * wq) AS nq FROM w GROUP BY 1),
        |dots AS (SELECT x.doc_id AS a, y.doc_id AS b, sum(x.wq * y.wq) AS dot
        |         FROM w x JOIN w y ON x.term = y.term AND x.doc_id < y.doc_id
        |         GROUP BY 1, 2)
        |SELECT a, b, cosine FROM (
        |  SELECT a, b, round(dot::DOUBLE
        |    / (sqrt(na.nq::DOUBLE) * sqrt(nb.nq::DOUBLE)), 6) AS cosine
        |  FROM dots JOIN norms na ON dots.a = na.doc_id
        |            JOIN norms nb ON dots.b = nb.doc_id)
        |WHERE cosine >= 0.5 ORDER BY a, b""".stripMargin,
    "q_text_inverted_index" ->
      """WITH tf AS (
        |  SELECT term, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY term, doc_id)
        |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
        |  CAST(sum(idh) % 1000000007 AS BIGINT) AS postings_sig1,
        |  CAST(sum(idh * idh % 1000000007) % 1000000007 AS BIGINT)
        |    AS postings_sig2
        |FROM (SELECT *,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |          % 2147483647 AS idh
        |      FROM tf)
        |GROUP BY term ORDER BY term""".stripMargin,
    "q_text_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |v AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
        |tot AS (SELECT sum(cnt)::DOUBLE AS total FROM v),
        |lp AS (SELECT term, ln(cnt::DOUBLE / total) AS logp FROM v, tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(logp), 4) AS avg_logp
        |FROM tok JOIN lp USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |b AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        |      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM t)),
        |lm0 AS (SELECT w1, w2, count(*) AS n FROM b GROUP BY w1, w2),
        |lm AS (SELECT w1, w2,
        |         ln(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY w1)) AS logp
        |       FROM lm0)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(logp), 4) AS avg_logp
        |FROM b JOIN lm USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |p AS (SELECT substr(w, i, 1) AS left_sym,
        |             substr(w, i + 1, 1) AS right_sym
        |      FROM (SELECT w, unnest(range(1, length(w))) AS i FROM w))
        |SELECT left_sym, right_sym, count(*) AS n
        |FROM p GROUP BY left_sym, right_sym
        |ORDER BY n DESC, left_sym, right_sym LIMIT 30""".stripMargin,
    "q_text_bigram_lm" ->
      """WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
        |b AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM t)),
        |c AS (SELECT w1, w2, count(*) AS n FROM b GROUP BY w1, w2),
        |r AS (SELECT w1, w2, n,
        |        round(n / sum(n) OVER (PARTITION BY w1), 6) AS p,
        |        CAST(row_number() OVER (PARTITION BY w1
        |          ORDER BY n DESC, w2) AS INTEGER) AS rank
        |      FROM c)
        |SELECT w1, w2, n, p, rank FROM r WHERE rank <= 3
        |ORDER BY w1, rank""".stripMargin)

  // ---- training-set preparation pack (TrainPrepOps) -----------------------

  private val prepQueries: Map[String, Q] = Map(
    "q_prep_split" -> (TrainPrepOps.hashSplit _),
    "q_prep_split_stats" -> (TrainPrepOps.splitStats _),
    "q_prep_shard_balance" -> ((s, d) => TrainPrepOps.shardBalance(s, d)),
    "q_prep_quality_norm" -> (TrainPrepOps.qualityNormalize _),
    "q_prep_dataset_card" -> (TrainPrepOps.datasetCard _),
    "q_prep_packing_curve" -> ((s, d) => TrainPrepOps.packingCurve(s, d)),
    "q_prep_quality_drift" -> (TrainPrepOps.qualityDrift _),
    "q_prep_quality_auc" -> (TrainPrepOps.qualityAuc _),
    "q_prep_sample" -> ((s, d) => TrainPrepOps.stratifiedSample(s, d)),
    "q_prep_decontam" -> ((s, d) => TrainPrepOps.decontaminate(s, d)),
    "q_prep_bloom_decontam" -> ((s, d) => TrainPrepOps.bloomDecontaminate(s, d)),
    "q_prep_decontam_curve" -> ((s, d) => TrainPrepOps.decontamCurve(s, d)),
    "q_prep_repetition" -> ((s, d) => TrainPrepOps.repetitionStats(s, d)),
    "q_prep_pii" -> (TrainPrepOps.piiRedact _),
    "q_prep_chunks" -> ((s, d) => TrainPrepOps.chunk(s, d)),
    "q_prep_mixture" -> (TrainPrepOps.mixtureStats _),
    "q_prep_pack" -> ((s, d) => TrainPrepOps.packSequences(s, d)),
    "q_prep_pack_stats" -> ((s, d) => TrainPrepOps.packStats(s, d)),
    "q_prep_leakage" -> ((s, d) => TrainPrepOps.splitLeakage(s, d)),
    "q_prep_mixture_weights" -> (TrainPrepOps.mixtureWeights _),
    "q_prep_token_budget" -> ((s, d) => TrainPrepOps.tokenBudget(s, d)),
    "q_prep_waterfill" -> ((s, d) => TrainPrepOps.waterfillBudget(s, d)))

  private val prepOracles: Map[String, String] = Map(
    "q_prep_quality_auc" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |shs AS (SELECT doc_id,
        |          list_distinct([array_to_string(toks[i:i+2], ' ')
        |                         for i in range(1, len(toks) - 1)]) AS shl
        |        FROM t WHERE len(toks) >= 3),
        |hs AS (SELECT doc_id,
        |         list_transform(shl,
        |           sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT % 2147483647)
        |           AS hl
        |       FROM shs),
        |sg AS (SELECT doc_id,
        |         list_transform(range(32), i ->
        |           list_min(list_transform(hl,
        |             h -> ((i + 1) * h + i * 7919) % 2147483647))) AS sig
        |       FROM hs),
        |banded AS (SELECT doc_id, sig, b AS band,
        |             md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bucket
        |           FROM sg, (SELECT unnest(range(8)) AS b)),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |           round(len(list_filter(range(32),
        |             i -> x.sig[i+1] = y.sig[i+1]))::DOUBLE / 32, 6) AS est_jaccard
        |         FROM banded x JOIN banded y
        |           ON x.band = y.band AND x.bucket = y.bucket
        |           AND x.doc_id < y.doc_id),
        |est AS (SELECT a, b FROM cand WHERE est_jaccard >= 0.5),
        |dup_ids AS (SELECT DISTINCT doc_id FROM
        |  (SELECT a AS doc_id FROM est UNION ALL SELECT b AS doc_id FROM est)),
        |scored AS (
        |  SELECT d.doc_id,
        |    CAST(round(round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |      * (len(list_distinct(toks))::DOUBLE / len(toks)), 4) * 10000, 0)
        |      AS BIGINT) AS q4
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents) d),
        |flagged AS (
        |  SELECT q4, di.doc_id IS NOT NULL AS dup
        |  FROM scored s LEFT JOIN dup_ids di ON s.doc_id = di.doc_id),
        |hist AS (
        |  SELECT q4,
        |    sum(CASE WHEN NOT dup THEN 1 ELSE 0 END) AS pos,
        |    sum(CASE WHEN dup THEN 1 ELSE 0 END) AS neg
        |  FROM flagged GROUP BY q4),
        |g AS (
        |  SELECT *, coalesce(sum(neg) OVER (ORDER BY q4
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM hist),
        |agg AS (
        |  SELECT sum(pos) AS n_unique, sum(neg) AS n_dup,
        |    sum(pos::HUGEINT * (2 * neg_below + neg)::HUGEINT) AS two_u
        |  FROM g)
        |SELECT CAST(n_unique AS BIGINT) AS n_unique,
        |  CAST(n_dup AS BIGINT) AS n_dup,
        |  CASE WHEN n_unique = 0 OR n_dup = 0 THEN NULL
        |       ELSE CAST((2::HUGEINT * 1000000 * two_u
        |              + 2::HUGEINT * n_unique * n_dup)
        |            // (4::HUGEINT * n_unique * n_dup) AS DOUBLE) / 1e6
        |  END AS auc
        |FROM agg""".stripMargin,
    "q_prep_quality_drift" ->
      """WITH b AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx
        |           FROM documents),
        |base AS (
        |  SELECT source,
        |    CAST(least(CAST(round(round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |      * (len(list_distinct(toks))::DOUBLE / len(toks)), 4) * 10000,
        |      0) AS BIGINT) // 1000, 9) AS INTEGER) AS bucket,
        |    doc_id <= (mn + mx) // 2 AS early
        |  FROM (SELECT *, string_split(text, ' ') AS toks FROM documents)
        |  CROSS JOIN b),
        |cells AS (
        |  SELECT source, bucket,
        |    sum(CASE WHEN early THEN 1 ELSE 0 END) AS ne,
        |    sum(CASE WHEN early THEN 0 ELSE 1 END) AS nl
        |  FROM base GROUP BY source, bucket),
        |g AS (
        |  SELECT *, sum(ne) OVER (PARTITION BY source) AS n_early,
        |            sum(nl) OVER (PARTITION BY source) AS n_late
        |  FROM cells),
        |dd AS (
        |  SELECT source, bucket, ne, nl, n_early, n_late,
        |    (CASE WHEN n_late > 0
        |          THEN (2 * 1000000 * nl + n_late) // (2 * n_late)
        |          ELSE 0 END)
        |    - (CASE WHEN n_early > 0
        |            THEN (2 * 1000000 * ne + n_early) // (2 * n_early)
        |            ELSE 0 END) AS dppm
        |  FROM g),
        |top AS (
        |  SELECT source, bucket AS top_shift_bucket, dppm AS top_dppm
        |  FROM (SELECT *, row_number() OVER (PARTITION BY source
        |          ORDER BY abs(dppm) DESC, bucket DESC) AS rn FROM dd)
        |  WHERE rn = 1),
        |agg AS (
        |  SELECT source, sum(ne) AS n_early, sum(nl) AS n_late,
        |         sum(abs(dppm)) AS sad
        |  FROM dd GROUP BY source)
        |SELECT a.source,
        |  CAST(a.n_early AS BIGINT) AS n_early,
        |  CAST(a.n_late AS BIGINT) AS n_late,
        |  CAST((2 * sad + 2) // 4 AS DOUBLE) / 1e6 AS tvd,
        |  t.top_shift_bucket,
        |  CAST(t.top_dppm AS DOUBLE) / 1e6 AS top_shift
        |FROM agg a JOIN top t USING (source) ORDER BY a.source""".stripMargin,
    "q_prep_packing_curve" ->
      """WITH hist AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
        |         count(*) AS n
        |  FROM documents GROUP BY 1),
        |g AS (
        |  SELECT ctx, len, n FROM hist
        |  CROSS JOIN (SELECT unnest([256, 512, 1024, 2048, 4096, 8192]
        |    ::BIGINT[]) AS ctx)),
        |agg AS (
        |  SELECT ctx,
        |    sum(n) AS n_docs,
        |    sum(len * n) AS n_tokens,
        |    sum(CASE WHEN len > ctx THEN n ELSE 0 END) AS n_docs_over_ctx,
        |    sum(CASE WHEN len > ctx THEN (len - ctx) * n ELSE 0 END)
        |      AS trunc_tokens_lost,
        |    sum(((len + ctx - 1) // ctx) * n) AS pad_seqs
        |  FROM g GROUP BY ctx),
        |agg2 AS (
        |  SELECT *, (n_tokens + ctx - 1) // ctx AS concat_seqs FROM agg)
        |SELECT ctx,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_docs_over_ctx AS BIGINT) AS n_docs_over_ctx,
        |  CAST((2 * 1000000 * n_docs_over_ctx + n_docs) // (2 * n_docs)
        |    AS DOUBLE) / 1e6 AS over_ctx_frac,
        |  CAST(trunc_tokens_lost AS BIGINT) AS trunc_tokens_lost,
        |  CAST((2 * 1000000 * trunc_tokens_lost + n_tokens) // (2 * n_tokens)
        |    AS DOUBLE) / 1e6 AS trunc_loss_frac,
        |  CAST(pad_seqs AS BIGINT) AS pad_seqs,
        |  CAST((2 * 1000000 * n_tokens + pad_seqs * ctx)
        |    // (2 * pad_seqs * ctx) AS DOUBLE) / 1e6 AS pad_utilization,
        |  CAST(concat_seqs AS BIGINT) AS concat_seqs,
        |  CAST((2 * 1000000 * n_tokens + concat_seqs * ctx)
        |    // (2 * concat_seqs * ctx) AS DOUBLE) / 1e6 AS concat_utilization
        |FROM agg2 ORDER BY ctx""".stripMargin,
    "q_prep_dataset_card" ->
      """WITH base AS (
        |  SELECT source, lang, n_chars,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    md5(text) AS fp,
        |    CAST(round(round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |      * (len(list_distinct(toks))::DOUBLE / len(toks)), 4) * 10000, 0)
        |      AS BIGINT) AS q4
        |  FROM (SELECT *, string_split(text, ' ') AS toks FROM documents)),
        |cells AS (
        |  SELECT source, lang, count(*) AS nd, sum(n_tok) AS nt,
        |    sum(n_chars) AS nc, sum(q4) AS qs
        |  FROM base GROUP BY source, lang),
        |by_src AS (
        |  SELECT source, sum(nd) AS n_docs, sum(nt) AS n_tokens,
        |    sum(nc) AS n_chars, sum(qs) AS q_sum, count(*) AS n_langs
        |  FROM cells GROUP BY source),
        |top AS (
        |  SELECT source, lang AS top_lang, nd AS top_nd
        |  FROM (SELECT source, lang, nd, row_number() OVER (
        |          PARTITION BY source ORDER BY nd DESC, lang DESC) AS rn
        |        FROM cells) WHERE rn = 1),
        |uniq AS (
        |  SELECT source, count(DISTINCT fp) AS n_unique_texts
        |  FROM base GROUP BY source),
        |tot AS (SELECT sum(n_docs) AS tot_docs, sum(n_tokens) AS tot_tokens
        |        FROM by_src)
        |SELECT b.source,
        |  CAST(b.n_docs AS BIGINT) AS n_docs,
        |  CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(b.n_chars AS BIGINT) AS n_chars,
        |  CAST((2 * 1000000 * b.n_docs + tot_docs) // (2 * tot_docs)
        |    AS DOUBLE) / 1e6 AS doc_share,
        |  CAST((2 * 1000000 * b.n_tokens + tot_tokens) // (2 * tot_tokens)
        |    AS DOUBLE) / 1e6 AS token_share,
        |  CAST((2 * 1000000 * b.n_tokens + b.n_docs) // (2 * b.n_docs)
        |    AS DOUBLE) / 1e6 AS mean_doc_tokens,
        |  CAST((2 * b.q_sum * 100 + b.n_docs) // (2 * b.n_docs)
        |    AS DOUBLE) / 1e6 AS mean_quality,
        |  b.n_langs,
        |  t.top_lang,
        |  CAST((2 * 1000000 * t.top_nd + b.n_docs) // (2 * b.n_docs)
        |    AS DOUBLE) / 1e6 AS top_lang_share,
        |  CAST(b.n_docs - u.n_unique_texts AS BIGINT) AS n_exact_dup_docs,
        |  CAST((2 * 1000000 * (b.n_docs - u.n_unique_texts) + b.n_docs)
        |    // (2 * b.n_docs) AS DOUBLE) / 1e6 AS dup_rate
        |FROM by_src b
        |JOIN top t ON b.source = t.source
        |JOIN uniq u ON b.source = u.source
        |CROSS JOIN tot
        |ORDER BY b.source""".stripMargin,
    "q_prep_split" ->
      """SELECT doc_id, lang, bucket,
        |  CASE WHEN bucket < 'cc' THEN 'train'
        |       WHEN bucket < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |        substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_prep_quality_norm" ->
      """WITH sc AS (SELECT doc_id, source,
        |    round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |          * (len(list_distinct(toks))::DOUBLE / len(toks)), 4)
        |      AS quality
        |  FROM (SELECT *, string_split(text, ' ') AS toks FROM documents)),
        |f AS (SELECT source,
        |        round(quantile_cont(quality, 0.05), 6) AS p05,
        |        round(quantile_cont(quality, 0.95), 6) AS p95
        |      FROM sc GROUP BY 1),
        |j AS (SELECT sc.source, p05, p95,
        |        CAST(round(CASE WHEN p95 > p05
        |          THEN (least(greatest(quality, p05), p95) - p05)
        |               / (p95 - p05) ELSE 0.0 END * 1e6) AS BIGINT) AS nq,
        |        CASE WHEN quality < p05 THEN 1 ELSE 0 END AS lo,
        |        CASE WHEN quality > p95 THEN 1 ELSE 0 END AS hi
        |      FROM sc JOIN f ON sc.source = f.source)
        |SELECT source, count(*) AS n_docs, min(p05) AS p05, min(p95) AS p95,
        |  CAST((2 * sum(nq) + count(*)) // (2 * count(*)) AS DOUBLE) / 1e6
        |    AS mean_norm,
        |  CAST(sum(lo) AS BIGINT) AS n_clipped_low,
        |  CAST(sum(hi) AS BIGINT) AS n_clipped_high
        |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "q_prep_shard_balance" ->
      """WITH pd AS (SELECT
        |  ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |    ::BIGINT % 16 AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |per AS (SELECT shard, count(*) AS n_docs, sum(n_tok) AS n_tokens
        |        FROM pd GROUP BY 1),
        |tot AS (SELECT sum(n_tokens) AS tot_tokens FROM per)
        |SELECT shard, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST((2 * 1000000 * n_tokens + tot_tokens) // (2 * tot_tokens)
        |    AS DOUBLE) / 1e6 AS token_share,
        |  CAST((2 * 1000000 * n_tokens * 16 + tot_tokens) // (2 * tot_tokens)
        |    AS DOUBLE) / 1e6 AS skew
        |FROM per CROSS JOIN tot ORDER BY shard""".stripMargin,
    "q_prep_split_stats" ->
      """WITH s AS (
        |  SELECT lang, len(string_split(text, ' ')) AS n_tok,
        |    substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 'cc' THEN 'train'
        |            WHEN bucket < 'e6' THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  count(DISTINCT lang) AS n_langs
        |FROM s GROUP BY 1 ORDER BY split""".stripMargin,
    "q_prep_sample" ->
      """SELECT doc_id, lang, sample_rank FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 5 ORDER BY lang, sample_rank""".stripMargin,
    "q_prep_decontam_curve" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, substring(md5(sh), 1, 16) AS shk FROM (
        |    SELECT doc_id,
        |      unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                            for i in range(1, len(toks) - 1)])) AS sh
        |    FROM t WHERE len(toks) >= 3)),
        |ev AS (SELECT DISTINCT shk FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, shk FROM sh WHERE doc_id % 10 <> 0),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
        |hit AS (SELECT doc_id, count(*) AS n_tainted FROM tr
        |        WHERE shk IN (SELECT shk FROM ev) GROUP BY doc_id),
        |td AS (SELECT t.doc_id, t.n_shingles,
        |         coalesce(h.n_tainted, 0) AS n_tainted,
        |         round(coalesce(h.n_tainted, 0)::DOUBLE / t.n_shingles, 6)
        |           AS tainted_frac
        |       FROM tot t LEFT JOIN hit h USING (doc_id)),
        |g AS (SELECT thr, n_shingles, n_tainted, tainted_frac
        |      FROM td CROSS JOIN
        |        (SELECT unnest([0.01, 0.02, 0.05, 0.1, 0.2, 0.5]::DOUBLE[])
        |           AS thr)),
        |agg AS (SELECT thr AS threshold, count(*) AS n_docs,
        |          sum(CASE WHEN tainted_frac >= thr THEN 1 ELSE 0 END)
        |            AS n_flagged,
        |          sum(n_shingles) AS tot_shingles,
        |          sum(CASE WHEN tainted_frac >= thr THEN n_shingles
        |              ELSE 0 END) AS flagged_shingles,
        |          sum(CASE WHEN tainted_frac >= thr THEN n_tainted
        |              ELSE 0 END) AS flagged_tainted
        |        FROM g GROUP BY 1)
        |SELECT threshold,
        |  CAST(n_flagged AS BIGINT) AS n_flagged,
        |  CAST((2 * 1000000 * n_flagged + n_docs) // (2 * n_docs)
        |    AS DOUBLE) / 1e6 AS flagged_doc_frac,
        |  CAST((2 * 1000000 * flagged_shingles + tot_shingles)
        |    // (2 * tot_shingles) AS DOUBLE) / 1e6 AS flagged_shingle_frac,
        |  CAST(flagged_tainted AS BIGINT) AS flagged_tainted
        |FROM agg ORDER BY threshold""".stripMargin,
    "q_prep_decontam" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, substring(md5(sh), 1, 16) AS shk FROM (
        |    SELECT doc_id,
        |      unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                            for i in range(1, len(toks) - 1)])) AS sh
        |    FROM t WHERE len(toks) >= 3)),
        |ev AS (SELECT DISTINCT shk FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, shk FROM sh WHERE doc_id % 10 <> 0),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
        |hit AS (SELECT doc_id, count(*) AS n_tainted FROM tr
        |        WHERE shk IN (SELECT shk FROM ev) GROUP BY doc_id)
        |SELECT t.doc_id, t.n_shingles,
        |  coalesce(h.n_tainted, 0) AS n_tainted,
        |  round(coalesce(h.n_tainted, 0)::DOUBLE / t.n_shingles, 6) AS tainted_frac,
        |  round(coalesce(h.n_tainted, 0)::DOUBLE / t.n_shingles, 6) >= 0.05
        |    AS is_contaminated
        |FROM tot t LEFT JOIN hit h USING (doc_id) ORDER BY doc_id""".stripMargin,
    // Bloom prefilter + exact confirm is output-identical to the exact
    // decontam by construction (the filter only prunes work, never
    // changes membership) — the twin IS the exact query
    "q_prep_bloom_decontam" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id, substring(md5(sh), 1, 16) AS shk FROM (
        |    SELECT doc_id,
        |      unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                            for i in range(1, len(toks) - 1)])) AS sh
        |    FROM t WHERE len(toks) >= 3)),
        |ev AS (SELECT DISTINCT shk FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, shk FROM sh WHERE doc_id % 10 <> 0),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
        |hit AS (SELECT doc_id, count(*) AS n_tainted FROM tr
        |        WHERE shk IN (SELECT shk FROM ev) GROUP BY doc_id)
        |SELECT t.doc_id, t.n_shingles,
        |  coalesce(h.n_tainted, 0) AS n_tainted,
        |  round(coalesce(h.n_tainted, 0)::DOUBLE / t.n_shingles, 6) AS tainted_frac,
        |  round(coalesce(h.n_tainted, 0)::DOUBLE / t.n_shingles, 6) >= 0.05
        |    AS is_contaminated
        |FROM tot t LEFT JOIN hit h USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_prep_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest([array_to_string(toks[i:i+1], ' ')
        |                 for i in range(1, len(toks))]) AS bg
        |       FROM t WHERE len(toks) >= 2),
        |c AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |r AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |        count(*) AS n_distinct_bigrams, max(cnt) AS top_bigram_cnt
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_distinct_bigrams, top_bigram_cnt,
        |  round(top_bigram_cnt::DOUBLE / n_bigrams, 6) AS top_bigram_frac,
        |  round(1.0 - n_distinct_bigrams::DOUBLE / n_bigrams, 6) AS dup_bigram_frac,
        |  round(1.0 - n_distinct_bigrams::DOUBLE / n_bigrams, 6) > 0.2
        |    AS is_repetitive
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_prep_pii" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+')) AS INTEGER) AS n_emails,
        |    CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER)
        |      AS n_digit_runs,
        |    regexp_replace(regexp_replace(text,
        |        '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
        |      '[0-9]+', '<NUM>', 'g') AS red
        |  FROM documents)
        |SELECT doc_id, n_emails, n_digit_runs,
        |  CAST(length(red) AS INTEGER) AS n_chars_redacted,
        |  md5(red) AS redacted_fp
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_prep_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |        unnest(range(CAST(ceil(len(toks) / 48.0) AS BIGINT))) AS ci
        |      FROM t)
        |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
        |  CAST(len(toks[ci*48 + 1 : ci*48 + 64]) AS INTEGER) AS n_chunk_tokens,
        |  md5(array_to_string(toks[ci*48 + 1 : ci*48 + 64], ' ')) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_prep_mixture" ->
      """WITH d AS (SELECT source, lang, n_chars,
        |             len(string_split(text, ' ')) AS n_tok FROM documents),
        |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tot_tokens FROM d)
        |SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  round(sum(n_tok)::DOUBLE / (SELECT tot_tokens FROM tot), 6)
        |    AS token_share
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q_prep_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |             len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          - n_tokens AS BIGINT) AS cb
        |      FROM t)
        |SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
        |  cb // 512 AS first_seq,
        |  (cb + n_tokens - 1) // 512 AS last_seq,
        |  cb % 512 AS seq_offset,
        |  CAST((cb + n_tokens - 1) // 512 - cb // 512 + 1 AS INTEGER)
        |    AS n_seqs_spanned
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_prep_pack_stats" ->
      """WITH t AS (SELECT source,
        |             len(string_split(text, ' ')) AS n_tok FROM documents),
        |g AS (SELECT source, count(*) AS n_docs,
        |        CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM t GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |  (n_tokens + 511) // 512 AS n_seqs,
        |  ((n_tokens + 511) // 512) * 512 - n_tokens AS pad_tokens,
        |  round(n_tokens::DOUBLE / (((n_tokens + 511) // 512) * 512), 6)
        |    AS utilization
        |FROM g ORDER BY source""".stripMargin,
    "q_prep_leakage" ->
      """WITH f AS (
        |  SELECT doc_id, md5(text) AS fp,
        |    CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
        |              < 'cc' THEN 'train'
        |         WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
        |              < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  a.split AS split_a, b.split AS split_b, a.fp AS fp
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |WHERE a.split <> b.split
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_prep_mixture_weights" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_tokens, sqrt(n_tokens::DOUBLE) AS w_raw FROM per),
        |tot AS (SELECT sum(w_raw) AS tot_w,
        |          CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM w)
        |SELECT source, n_tokens,
        |  round(n_tokens::DOUBLE / (SELECT tot_tokens FROM tot), 6)
        |    AS natural_share,
        |  round(w_raw / (SELECT tot_w FROM tot), 6) AS weight,
        |  round(w_raw / (SELECT tot_w FROM tot)
        |        * (SELECT tot_tokens FROM tot)::DOUBLE / n_tokens, 6) AS epochs
        |FROM w ORDER BY source""".stripMargin,
    "q_prep_waterfill" ->
      """WITH caps AS (SELECT source,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |          AS cap_tokens
        |      FROM documents GROUP BY 1),
        |tot AS (SELECT sum(cap_tokens) AS total, count(*) AS n FROM caps),
        |t AS (SELECT source, cap_tokens,
        |        CAST(row_number() OVER (ORDER BY cap_tokens, source)
        |          AS BIGINT) AS i,
        |        coalesce(sum(cap_tokens) OVER (ORDER BY cap_tokens, source
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS prefix,
        |        total, n, (total * 1) // 2 AS budget
        |      FROM caps CROSS JOIN tot),
        |f AS (SELECT *, cap_tokens * (n - i + 1) <= budget - prefix
        |        AS funded FROM t),
        |line AS (SELECT sum(CASE WHEN funded THEN cap_tokens ELSE 0 END)
        |           AS fsum,
        |         sum(CASE WHEN funded THEN 1 ELSE 0 END) AS nf FROM f)
        |SELECT source, cap_tokens,
        |  CAST(CASE WHEN funded THEN cap_tokens ELSE wl END AS BIGINT)
        |    AS alloc_tokens,
        |  funded, CAST(wl AS BIGINT) AS waterline,
        |  CAST((2 * (CASE WHEN funded THEN cap_tokens ELSE wl END) * 1000000
        |        + cap_tokens) // (2 * cap_tokens) AS DOUBLE) / 1e6 AS util
        |FROM (SELECT f.*, CASE WHEN n = nf THEN budget
        |        ELSE (budget - fsum) // (n - nf) END AS wl
        |      FROM f CROSS JOIN line)
        |ORDER BY source""".stripMargin,
    "q_prep_token_budget" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id, source,
        |        round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |              * (len(list_distinct(toks))::DOUBLE / len(toks)), 4)
        |          AS quality,
        |        CAST(len(toks) AS INTEGER) AS n_tokens
        |      FROM t),
        |c AS (SELECT doc_id, source, quality, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY source
        |          ORDER BY quality DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum_tokens
        |      FROM q)
        |SELECT doc_id, source, quality, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens - n_tokens < 10000 ORDER BY doc_id""".stripMargin,
    "q_prep_snapshot_diff" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END)
        |      AS old_fp
        |  FROM documents WHERE doc_id % 5 <> 4),
        |n AS (SELECT doc_id, md5(text) AS new_fp
        |      FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN old_fp <> new_fp THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  old_fp, new_fp
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_prep_merge_changes" ->
      """WITH snap AS (
        |  SELECT doc_id, text, 'S' AS op, 1 AS pri FROM documents
        |  WHERE doc_id % 5 <> 4),
        |chg AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text,
        |    CASE WHEN doc_id % 11 = 0 THEN 'D' ELSE 'U' END AS op, 0 AS pri
        |  FROM documents
        |  WHERE doc_id % 7 = 0 OR doc_id % 5 = 4 OR doc_id % 11 = 0),
        |u AS (SELECT * FROM snap UNION ALL SELECT * FROM chg),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY pri)
        |        AS rn FROM u)
        |SELECT doc_id, md5(text) AS fp,
        |  CASE WHEN op = 'S' THEN 'carried' ELSE 'applied' END AS provenance
        |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY doc_id""".stripMargin,
    "q_prep_weighted_sample" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id, source,
        |        greatest(round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |          * (len(list_distinct(toks))::DOUBLE / len(toks)), 4), 0.0001)
        |          AS weight,
        |        ((doc_id * 2654435761) % 1000003 + 1)::DOUBLE / 1000004 AS u
        |      FROM t),
        |r AS (SELECT doc_id, source, weight,
        |        round(power(u, 1.0 / weight), 6) AS es_key FROM q),
        |w AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
        |        ORDER BY es_key DESC, doc_id) AS INTEGER) AS sample_rank
        |      FROM r)
        |SELECT doc_id, source, weight, es_key, sample_rank
        |FROM w WHERE sample_rank <= 25 ORDER BY source, sample_rank""".stripMargin,
    "q_prep_quality_tiers" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id, source,
        |        round(least(len(toks)::DOUBLE / 50.0, 1.0)
        |              * (len(list_distinct(toks))::DOUBLE / len(toks)), 4)
        |          AS quality,
        |        len(toks) AS n_tokens
        |      FROM t),
        |r AS (SELECT source, quality, n_tokens,
        |        CAST(ntile(4) OVER (PARTITION BY source
        |          ORDER BY quality DESC, doc_id) AS INTEGER) AS tier
        |      FROM q)
        |SELECT source, tier, count(*) AS n_docs,
        |  round(min(quality), 4) AS min_quality,
        |  round(max(quality), 4) AS max_quality,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM r GROUP BY source, tier ORDER BY source, tier""".stripMargin)

  // ---- vector / multimodal pack -------------------------------------------

  private val vecQueries: Map[String, Q] = Map(
    "q_vec_cosine_topk" -> ((s, d) => VectorOps.cosineTopK(s, d)),
    "q_vec_ivf_topk" -> ((s, d) => VectorOps.ivfTopK(s, d)),
    "q_vec_neardup" -> ((s, d) => VectorOps.nearDupPairsExact(s, d, minSim = 0.4, maxId = 500)),
    "q_vec_neardup_lsh" -> ((s, d) => VectorOps.nearDupPairsLsh(s, d)),
    // learned-quantizer ANN: iterative float k-means has no tractable SQL
    // twin → rows-only; exactness vs a plain-Scala reference Lloyd's is
    // asserted in KmeansIvfSpec
    "q_vec_ivf_kmeans" -> ((s, d) => VectorOps.ivfKmeansTopK(s, d)),
    "q_vec_kmeans_cells" -> ((s, d) => VectorOps.kmeansCellStats(s, d)),
    "q_vec_centroid_norms" -> (VectorOps.labelCentroidNorms _),
    "q_vec_dim_stats" -> (VectorOps.dimStats _),
    "q_vec_label_affinity" -> (VectorOps.labelAffinity _),
    "q_text_prefix_dups" -> ((s, d) => TextOps.prefixDups(s, d)),
    "q_text_hybrid_topk" -> ((s, d) => RetrievalOps.hybridTopK(s, d)),
    "q_text_prf_topk" -> ((s, d) => RetrievalOps.prfTopK(s, d)),
    "q_text_ranker_rbo" -> ((s, d) => RetrievalOps.rankerAgreement(s, d)),
    "q_vec_centroids" -> (VectorOps.labelCentroids _),
    "q_vec_quantize" -> (VectorOps.quantizeInt8 _),
    "q_vec_quant_error" -> (VectorOps.quantError _),
    "q_vec_pq" -> (VectorOps.pqEncode _),
    "q_vec_pq_topk" -> ((s, d) => VectorOps.pqTopK(s, d)),
    "q_vec_ivfpq_topk" -> ((s, d) => VectorOps.ivfPqTopK(s, d)),
    "q_vec_hard_negatives" -> ((s, d) => VectorOps.hardNegatives(s, d)),
    "q_vec_outliers" -> ((s, d) => VectorOps.labelOutliers(s, d)),
    "q_vec_semdedup" -> ((s, d) => VectorOps.semanticDedup(s, d)),
    "q_vec_sem_decontam" -> ((s, d) => VectorOps.semanticDecontam(s, d)),
    "q_vec_ivf_probe_curve" -> ((s, d) => VectorOps.ivfProbeCurve(s, d)),
    "q_vec_batch_topk" -> ((s, d) => VectorOps.batchTopK(s, d)),
    "q_vec_hubness" -> ((s, d) => VectorOps.hubness(s, d)),
    "q_media_decode_plan" -> ((s, d) => MultimodalOps.decodePlan(s, d)),
    "q_vec_matryoshka" -> ((s, d) => VectorOps.matryoshkaAudit(s, d)),
    "q_vec_pca_component" -> ((s, d) => VectorOps.pcaComponent(s, d)),
    "q_vec_pca_scores" -> ((s, d) => VectorOps.pcaLabelScores(s, d)),
    "q_vec_logreg_model" -> ((s, d) => VectorOps.logRegModel(s, d)),
    "q_vec_logreg_eval" -> ((s, d) => VectorOps.logRegEval(s, d)),
    "q_vec_ivf_recall" -> ((s, d) => VectorOps.ivfRecallAudit(s, d)),
    "q_vec_quant_recall" -> ((s, d) => VectorOps.quantRecallAudit(s, d)),
    "q_vec_sim_pagerank" -> ((s, d) => VectorOps.simGraphPageRank(s, d)),
    "q_vec_mmr" -> ((s, d) => VectorOps.mmrTopK(s, d)),
    "q_vec_pq_recall" -> ((s, d) => VectorOps.pqRecallAudit(s, d)),
    "q_vec_centroid_drift" -> (VectorOps.centroidDrift _),
    "q_vec_knn_eval" -> ((s, d) => VectorOps.knnEval(s, d)),
    "q_vec_cluster_quality" -> ((s, d) => VectorOps.clusterQualityAudit(s, d)),
    "q_media_metadata" -> (MultimodalOps.mediaMetadata _),
    "q_media_dedup" -> (MultimodalOps.mediaDedup _),
    "q_media_frames" -> ((s, d) => MultimodalOps.frameSample(s, d)),
    "q_media_features" -> (MultimodalOps.extractFeatures _),
    "q_media_features_meta" -> (MultimodalOps.extractFeaturesMeta _),
    "q_media_resize" -> ((s, d) => MultimodalOps.resizeStub(s, d)))

  private def duckCos(v1: String, v2: String): String = duckCosN(v1, v2, 64)

  /** Replays [[graft.operators.DedupOps.kcorePeel]] as the RAW
    * bounded peel, unrolled one CTE trio (deg/nodes/edges) per round —
    * the engine runs the closed-form peel on the exact-dup contracted
    * graph; the twin's raw formulation agreeing is the check.
    */
  private def kcoreTwin(k: Int, rounds: Int): String = {
    val peels = (1 to rounds).map { r =>
      val p = r - 1
      s"""d$r AS MATERIALIZED (SELECT doc_id, count(*) AS deg FROM (
         |    SELECT a AS doc_id FROM e$p UNION ALL SELECT b AS doc_id FROM e$p)
         |  GROUP BY 1),
         |n$r AS MATERIALIZED (SELECT doc_id FROM d$r WHERE deg >= $k),
         |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e$p e
         |        JOIN n$r x ON e.a = x.doc_id
         |        JOIN n$r y ON e.b = y.doc_id),
         |s$r AS (SELECT $r AS round,
         |          (SELECT count(*) FROM n$r) AS n_docs,
         |          (SELECT count(*) FROM e$r) AS n_edges)""".stripMargin
    }.mkString(",\n")
    val outs = (0 to rounds).map(r => s"SELECT * FROM s$r")
      .mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |shs AS (SELECT doc_id,
       |          list_distinct([array_to_string(toks[i:i+2], ' ')
       |                         for i in range(1, len(toks) - 1)]) AS shl
       |        FROM t WHERE len(toks) >= 3),
       |sh0 AS (SELECT doc_id, unnest(shl) AS sh FROM shs),
       |capped AS (SELECT doc_id, sh FROM (
       |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
       |  WHERE df <= 1000),
       |sh AS MATERIALIZED (SELECT doc_id, sh,
       |         count(*) OVER (PARTITION BY doc_id) AS n_sh FROM capped),
       |e0 AS MATERIALIZED (
       |  SELECT a, b FROM (
       |    SELECT a, b, round(inter::DOUBLE / (na + nb - inter), 6) AS jac FROM (
       |      SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
       |             count(*) AS inter
       |      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
       |      GROUP BY 1, 2, 3, 4))
       |  WHERE jac >= 0.2),
       |n0 AS MATERIALIZED (SELECT DISTINCT doc_id FROM (
       |    SELECT a AS doc_id FROM e0 UNION ALL SELECT b AS doc_id FROM e0)),
       |s0 AS (SELECT 0 AS round,
       |         (SELECT count(*) FROM n0) AS n_docs,
       |         (SELECT count(*) FROM e0) AS n_edges),
       |$peels
       |$outs
       |ORDER BY round""".stripMargin
  }

  /** Replays [[graft.operators.VectorOps.mmrTopK]]'s greedy selection as
    * `k` unrolled argmax CTEs (the Lloyd's/BPE twin trick): pool and
    * pool×pool similarities micro-quantize exactly like the engine, each
    * step's pick maximizes the SAME integer objective
    * `λnum·relq − (λden−λnum)·msq` with ties to the smaller vec_id.
    */
  private def mmrTwin(queryId: Long, k: Int, pool: Int,
      lambdaNum: Long, lambdaDen: Long): String = {
    val mu = lambdaDen - lambdaNum
    val steps = (2 to k).map { i =>
      val prev = i - 1
      s"""cand$i AS (
         |  SELECT r.vec_id, r.label, r.relq, max(s.sq) AS msq
         |  FROM relm r JOIN sims s ON s.va = r.vec_id
         |    AND s.vb IN (SELECT vec_id FROM sel$prev)
         |  WHERE r.vec_id NOT IN (SELECT vec_id FROM sel$prev)
         |  GROUP BY r.vec_id, r.label, r.relq),
         |pick$i AS (
         |  SELECT vec_id, label, relq, msq, $lambdaNum*relq - $mu*msq AS num
         |  FROM cand$i ORDER BY num DESC, vec_id LIMIT 1),
         |sel$i AS (SELECT vec_id FROM sel$prev
         |          UNION ALL SELECT vec_id FROM pick$i)""".stripMargin
    }.mkString(",\n")
    val outs = (1 to k).map { i =>
      s"""SELECT $i AS rank, vec_id, label, relq/1e6 AS rel,
         |  ${if (i == 1) "CAST(0 AS DOUBLE)" else "msq/1e6"} AS max_sim_prior,
         |  CAST(num AS DOUBLE)/${lambdaDen}e6 AS mmr_score FROM pick$i"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings
       |           WHERE vec_id = $queryId),
       |pool AS (
       |  SELECT vec_id, label,
       |    round(${duckCos("embedding", "qv")}, 6) AS rel, embedding
       |  FROM embeddings, q WHERE vec_id <> $queryId
       |  ORDER BY rel DESC, vec_id LIMIT $pool),
       |relm AS (SELECT vec_id, label,
       |           CAST(round(rel*1e6, 0) AS BIGINT) AS relq FROM pool),
       |sims AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb,
       |    CAST(round(round(${duckCos("a.embedding", "b.embedding")}, 6)
       |               *1e6, 0) AS BIGINT) AS sq
       |  FROM pool a, pool b WHERE a.vec_id <> b.vec_id),
       |pick1 AS (
       |  SELECT vec_id, label, relq, CAST(0 AS BIGINT) AS msq,
       |    $lambdaNum*relq AS num
       |  FROM relm ORDER BY num DESC, vec_id LIMIT 1),
       |sel1 AS (SELECT vec_id FROM pick1),
       |$steps
       |$outs
       |ORDER BY rank""".stripMargin
  }

  /** Replays [[graft.operators.RetrievalOps.bpeLearn]] as unrolled CTEs
    * (the k-means/PCA twin trick): per round, frequency-weighted adjacent
    * pair counts over the `~~`-separated symbol strings, the (n DESC, l,
    * r) argmax, and the boundary-anchored `replace` application — every
    * string operation identical to the engine's, so the learned merges
    * and final segmentation are bit-identical. Returns the CTE chain (no
    * WITH keyword, no trailing comma); round i's winner is `b<i>(l, r,
    * n)`, the final vocab is `v<rounds>(w, freq, seq)`.
    */
  private def duckBpeCtes(rounds: Int = 6): String = {
    // MATERIALIZED is load-bearing: each v_i is referenced twice and each
    // b_i three times — inlined CTEs re-evaluate the whole prefix chain
    // per reference (3^rounds blowup measured as a hang at 6 rounds)
    val v0 =
      """v0 AS MATERIALIZED (SELECT w, count(*) AS freq,
        |  '~~' || regexp_replace(w, '(.)', '\1~~', 'g') AS seq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE regexp_matches(w, '^[a-z]+$')
        |  GROUP BY w)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""b$i AS MATERIALIZED (
         |  SELECT string_split(pr, '~')[1] AS l,
         |    string_split(pr, '~')[2] AS r, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT freq,
         |      unnest([syms[j] || '~' || syms[j + 1]
         |              for j in range(1, len(syms))]) AS pr
         |    FROM (SELECT freq, regexp_extract_all(seq, '[^~]+') AS syms
         |          FROM v${i - 1})
         |    WHERE len(syms) >= 2)
         |  GROUP BY 1, 2 ORDER BY n DESC, l, r LIMIT 1),
         |v$i AS MATERIALIZED (SELECT w, freq,
         |  replace(seq,
         |    '~' || (SELECT l FROM b$i) || '~~' || (SELECT r FROM b$i) || '~',
         |    '~' || (SELECT l || r FROM b$i) || '~') AS seq
         |  FROM v${i - 1})""".stripMargin
    }
    (v0 +: steps).mkString(",\n")
  }

  /** Replays [[graft.operators.VectorOps.trainPca]] as unrolled CTEs (the
    * k-means twin's trick): nano-quantized mean, then per iteration the
    * centered dot, micro-quantized per-dimension contribution sums, and a
    * left-fold normalization — every arithmetic step in the same order as
    * the Spark side, so the final `v<iters>` list is bit-identical.
    * Returns the CTE chain (no WITH keyword, no trailing comma); the final
    * direction is `v<iters>.vv`, the mean is `mv.mv`, centered rows are
    * `sh(label, sh)`.
    */
  private def duckPcaCtes(iters: Int = 3): String = {
    val dim = 64
    val msums = (0 until dim).map(i =>
      s"sum(CAST(round(CAST(embedding[${i + 1}] AS DOUBLE) * 1e9) AS BIGINT)) AS s$i")
      .mkString(", ")
    val mlist = (0 until dim).map(i => s"(CAST(s$i AS DOUBLE) / n) / 1e9")
      .mkString("[", ", ", "]")
    val v0 = List.fill(dim)("0.125").mkString("[", ", ", "]")
    val sb = new StringBuilder
    sb ++= s"stats AS (SELECT count(*) AS n, $msums FROM embeddings),\n"
    sb ++= s"mv AS (SELECT $mlist AS mv FROM stats),\n"
    sb ++= s"sh AS (SELECT label, list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST(embedding[i] AS DOUBLE) - mv[i]) AS sh FROM embeddings, mv),\n"
    sb ++= s"v0 AS (SELECT $v0 AS vv)"
    for (t <- 1 to iters) {
      val wsums = (0 until dim).map(i =>
        s"sum(CAST(round((sh[${i + 1}] * dt) * 1e6) AS BIGINT)) AS w$i").mkString(", ")
      val wlist = (0 until dim).map(i => s"CAST(w$i AS DOUBLE) / 1e6")
        .mkString("[", ", ", "]")
      sb ++= s",\nd$t AS (SELECT sh, list_sum(list_transform(range(1, ${dim + 1}), " +
        s"i -> sh[i] * vv[i])) AS dt FROM sh, v${t - 1}),\n"
      sb ++= s"ws$t AS (SELECT $wsums FROM d$t),\n"
      sb ++= s"w$t AS (SELECT $wlist AS wv FROM ws$t),\n"
      sb ++= s"v$t AS (SELECT list_transform(wv, x -> x / sqrt(list_sum(" +
        s"list_transform(range(1, ${dim + 1}), i -> wv[i] * wv[i])))) AS vv FROM w$t)"
    }
    sb.toString
  }

  /** Replays [[graft.operators.VectorOps.trainLogReg]] as unrolled CTEs
    * (the PCA twin's trick): per iteration the current-weight dot + the
    * rational fast-sigmoid error, micro-quantized per-dimension gradient
    * sums, and the literal update expression w − lr·(G/1e6)/n — every
    * arithmetic step in the same order as the Spark side, so the final
    * `w<iters>` (wv, bias) is bit-identical. Returns the CTE chain (no
    * WITH keyword, no trailing comma); rows are `ed(y, v)`.
    */
  private def duckLogRegCtes(iters: Int = 3): String = {
    val dim = 64
    val v0 = List.fill(dim)("0.0").mkString("[", ", ", "]")
    val sb = new StringBuilder
    sb ++= "ed AS (SELECT CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y, " +
      "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),\n"
    sb ++= "nn AS (SELECT count(*) AS n FROM ed),\n"
    sb ++= s"w0 AS (SELECT $v0 AS wv, 0.0 AS bias)"
    for (t <- 1 to iters) {
      val gsums = (0 until dim).map(i =>
        s"sum(CAST(round((err * v[${i + 1}]) * 1e6) AS BIGINT)) AS g$i")
        .mkString(", ") +
        ", sum(CAST(round(err * 1e6) AS BIGINT)) AS gb"
      val wlist = (0 until dim).map(i =>
        s"wv[${i + 1}] - 0.5 * ((CAST(g$i AS DOUBLE) / 1e6) / n)")
        .mkString("[", ", ", "]")
      sb ++= s",\nz$t AS (SELECT y, v, list_sum(list_transform(range(1, ${dim + 1}), " +
        s"i -> v[i] * wv[i])) + bias AS z FROM ed, w${t - 1}),\n"
      sb ++= s"e$t AS (SELECT v, (0.5 * (1.0 + z / (1.0 + abs(z))) - y) AS err " +
        s"FROM z$t),\n"
      sb ++= s"gs$t AS (SELECT $gsums FROM e$t),\n"
      sb ++= s"w$t AS (SELECT $wlist AS wv, " +
        s"bias - 0.5 * ((CAST(gb AS DOUBLE) / 1e6) / n) AS bias " +
        s"FROM w${t - 1}, gs$t, nn)"
    }
    sb.toString
  }

  /** Cosine over the first `n` list elements — left-fold accumulation
    * order identical to the native CosineSim expression.
    */
  private def duckCosN(v1: String, v2: String, n: Int): String =
    s"""list_sum(list_transform(range(1, ${n + 1}),
       |    i -> CAST($v1[i] AS DOUBLE) * CAST($v2[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1, ${n + 1}),
       |      i -> CAST($v1[i] AS DOUBLE) * CAST($v1[i] AS DOUBLE))))
       |  * sqrt(list_sum(list_transform(range(1, ${n + 1}),
       |      i -> CAST($v2[i] AS DOUBLE) * CAST($v2[i] AS DOUBLE)))))""".stripMargin

  private val duckPqCodes: String =
    """[list_sum([CASE WHEN embedding[i*8 + j + 1] > 0 THEN (1 << j) ELSE 0 END
      |           for j in range(0, 8)])
      | for i in range(0, 8)]""".stripMargin

  /** Unrolled Lloyd's k-means as DuckDB CTEs: `e` (embeddings as double
    * lists), `c0` (seed centroids = k lowest vec_ids) … `c&lt;iters&gt;`.
    * Replays graft's trainKmeans bit-for-bit: assignment is a sequential
    * left-fold squared-L2 with first-minimum tie-break
    * (Sketch.nearestCentroid), centroid updates are nano-unit quantized
    * means (VectorAgg.centroidQ), empty cells keep the previous centroid.
    * Recursion is unrolled because DuckDB lambdas can't carry correlated
    * subqueries — each iteration references the previous CTE by name.
    */
  private def duckKmeansCtes(k: Int = 16, iters: Int = 5, dim: Int = 64): String = {
    val e =
      """e AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |      FROM embeddings)""".stripMargin
    val c0 =
      s"""c0 AS (SELECT list(v ORDER BY vec_id) AS cents FROM (
         |  SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $k))""".stripMargin
    def iter(i: Int): String =
      s"""c$i AS (
         |  SELECT list(coalesce(nc.c, p.cents[g.i + 1]) ORDER BY g.i) AS cents
         |  FROM c${i - 1} p
         |  CROSS JOIN (SELECT unnest(range($k)) AS i) g
         |  LEFT JOIN (
         |    SELECT cell, list(mean ORDER BY j) AS c FROM (
         |      SELECT a.cell, jj.j AS j,
         |        CAST(sum(CAST(round(a.v[jj.j + 1] * 1e9) AS BIGINT)) AS DOUBLE)
         |          / count(*) / 1e9 AS mean
         |      FROM (
         |        SELECT v, list_position(d, list_min(d)) - 1 AS cell FROM (
         |          SELECT e.v AS v, list_transform(range($k), ci ->
         |            list_sum(list_transform(range($dim), j2 ->
         |              (e.v[j2 + 1] - p2.cents[ci + 1][j2 + 1])
         |              * (e.v[j2 + 1] - p2.cents[ci + 1][j2 + 1])))) AS d
         |          FROM e, c${i - 1} p2)
         |      ) a
         |      CROSS JOIN (SELECT unnest(range($dim)) AS j) jj
         |      GROUP BY a.cell, jj.j
         |    ) GROUP BY cell
         |  ) nc ON nc.cell = g.i
         |)""".stripMargin
    (Seq(e, c0) ++ (1 to iters).map(iter)).mkString(",\n")
  }

  /** Final-model cell assignment over `e` given centroids CTE `cN`. */
  private def duckKmeansAssign(centsCte: String, k: Int = 16, dim: Int = 64): String =
    s"""asn AS (
       |  SELECT vec_id, v, list_position(d, list_min(d)) - 1 AS cell FROM (
       |    SELECT e.vec_id, e.v, list_transform(range($k), ci ->
       |      list_sum(list_transform(range($dim), j2 ->
       |        (e.v[j2 + 1] - p.cents[ci + 1][j2 + 1])
       |        * (e.v[j2 + 1] - p.cents[ci + 1][j2 + 1])))) AS d
       |    FROM e, $centsCte p))""".stripMargin

  private val vecOracles: Map[String, String] = Map(
    "q_vec_kmeans_cells" ->
      s"""WITH ${duckKmeansCtes()},
         |${duckKmeansAssign("c5")}
         |SELECT CAST(cell AS INTEGER) AS cell, count(*) AS n
         |FROM asn GROUP BY cell ORDER BY cell""".stripMargin,
    "q_vec_ivf_kmeans" ->
      s"""WITH ${duckKmeansCtes()},
         |${duckKmeansAssign("c5")},
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |pd AS (SELECT ci AS cell,
         |         list_sum(list_transform(range(64), j2 ->
         |           (q.qv[j2 + 1] - p.cents[ci + 1][j2 + 1])
         |           * (q.qv[j2 + 1] - p.cents[ci + 1][j2 + 1]))) AS dd
         |       FROM c5 p, q, (SELECT unnest(range(16)) AS ci)),
         |probe AS (SELECT cell FROM pd ORDER BY dd, cell LIMIT 2)
         |SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell,
         |  round(${duckCos("a.v", "q.qv")}, 6) AS cos_sim
         |FROM asn a, q
         |WHERE a.cell IN (SELECT cell FROM probe) AND a.vec_id <> 0
         |ORDER BY cos_sim DESC, a.vec_id LIMIT 10""".stripMargin,
    "q_vec_pq" ->
      s"""SELECT vec_id, label,
         |  array_to_string(
         |    list_transform($duckPqCodes, c -> lpad(hex(c), 2, '0')), '')
         |    AS codes_hex
         |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_vec_pq_topk" ->
      s"""WITH c AS (SELECT vec_id, label, $duckPqCodes AS codes
         |           FROM embeddings),
         |q AS (SELECT codes AS qcodes FROM c WHERE vec_id = 0)
         |SELECT vec_id, label,
         |  CAST(list_sum([bit_count(xor(codes[i+1], qcodes[i+1]))
         |                 for i in range(0, 8)]) AS INTEGER) AS pq_dist
         |FROM c, q WHERE vec_id <> 0
         |ORDER BY pq_dist, vec_id LIMIT 10""".stripMargin,
    "q_vec_pq_recall" ->
      s"""WITH c AS (SELECT vec_id, embedding, $duckPqCodes AS codes
         |           FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS qv, codes AS qcodes
         |      FROM c WHERE vec_id < 5),
         |sims AS (
         |  SELECT q.q_id, c.vec_id,
         |    round(${duckCos("c.embedding", "qv")}, 6) AS sim_full,
         |    list_sum([bit_count(xor(c.codes[i+1], qcodes[i+1]))
         |              for i in range(0, 8)]) AS pq_dist
         |  FROM c, q WHERE c.vec_id <> q.q_id),
         |rf AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY sim_full DESC, vec_id) AS rn
         |       FROM sims),
         |rp AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY pq_dist ASC, vec_id) AS rn
         |       FROM sims),
         |ov AS (
         |  SELECT fa.q_id, count(*) AS n_ov
         |  FROM (SELECT q_id, vec_id FROM rf WHERE rn <= 10) fa
         |  JOIN (SELECT q_id, vec_id FROM rp WHERE rn <= 10) pa
         |    USING (q_id, vec_id)
         |  GROUP BY 1)
         |SELECT q_id, CAST(coalesce(n_ov, 0) AS BIGINT) AS n_overlap,
         |  round(coalesce(n_ov, 0) / 10.0, 4) AS overlap_frac
         |FROM q LEFT JOIN ov USING (q_id) ORDER BY q_id""".stripMargin,
    "q_vec_knn_eval" ->
      s"""WITH q AS (SELECT vec_id AS q_id, label AS label_true,
         |             embedding AS qv
         |           FROM embeddings WHERE vec_id < 20),
         |sims AS (SELECT q.q_id, q.label_true, e.vec_id, e.label AS lbl,
         |    round(${duckCos("e.embedding", "qv")}, 6) AS sim
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         |top AS (SELECT q_id, label_true, lbl FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY sim DESC, vec_id) AS rn FROM sims)
         |  WHERE rn <= 10),
         |v AS (SELECT q_id, label_true, lbl, count(*) AS votes
         |      FROM top GROUP BY 1, 2, 3),
         |best AS (SELECT q_id, label_true, lbl AS label_pred,
         |           votes AS n_votes,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY votes DESC, lbl ASC) AS rn
         |         FROM v)
         |SELECT q_id, label_true, label_pred, n_votes,
         |  (label_pred = label_true) AS correct
         |FROM best WHERE rn = 1 ORDER BY q_id""".stripMargin,
    "q_vec_centroid_drift" -> {
      val dims = 64
      val qsums = (0 until dims).map(i =>
        s"sum(CAST(round(CAST(embedding[${i + 1}] AS DOUBLE) * 1e9) AS BIGINT)) AS q$i")
        .mkString(",\n  ")
      val comps = (0 until dims).map(i =>
        s"CAST(q$i AS DOUBLE) / n / 1e9 AS c$i").mkString(",\n  ")
      val dot = (0 until dims).map(i => s"a.c$i * b.c$i").mkString(" + ")
      val na = (0 until dims).map(i => s"a.c$i * a.c$i").mkString(" + ")
      val nb = (0 until dims).map(i => s"b.c$i * b.c$i").mkString(" + ")
      s"""WITH m AS (SELECT (min(vec_id) + max(vec_id)) // 2 AS mid
         |           FROM embeddings),
         |h AS (SELECT label, (vec_id <= mid) AS early, count(*) AS n,
         |  $qsums
         |  FROM embeddings CROSS JOIN m GROUP BY 1, 2),
         |c AS (SELECT label, early, n,
         |  $comps
         |  FROM h)
         |SELECT a.label, a.n AS n_early, b.n AS n_late,
         |  round(($dot) / (sqrt($na) * sqrt($nb)), 6) AS cos_halves
         |FROM c a JOIN c b ON a.label = b.label AND a.early AND NOT b.early
         |ORDER BY a.label""".stripMargin
    },
    "q_vec_cluster_quality" -> {
      val dims = 64
      val qsums = (0 until dims).map(i =>
        s"sum(CAST(round(CAST(embedding[${i + 1}] AS DOUBLE) * 1e9) AS BIGINT)) AS q$i")
        .mkString(",\n  ")
      val ccomps = (0 until dims).map(i =>
        s"CAST(q$i AS DOUBLE) / n / 1e9 AS c$i").mkString(",\n  ")
      val gcomps = (0 until dims).map(i =>
        s"CAST(q$i AS DOUBLE) / n / 1e9 AS g$i").mkString(",\n  ")
      val dotEC = (0 until dims)
        .map(i => s"CAST(e.embedding[${i + 1}] AS DOUBLE) * c.c$i")
        .mkString(" + ")
      val normE = (0 until dims)
        .map(i => s"CAST(e.embedding[${i + 1}] AS DOUBLE) * CAST(e.embedding[${i + 1}] AS DOUBLE)")
        .mkString(" + ")
      val normC = (0 until dims).map(i => s"c.c$i * c.c$i").mkString(" + ")
      val dotCG = (0 until dims).map(i => s"c.c$i * g.g$i").mkString(" + ")
      val normG = (0 until dims).map(i => s"g.g$i * g.g$i").mkString(" + ")
      s"""WITH c0 AS (SELECT label, count(*) AS n,
         |  $qsums
         |  FROM embeddings GROUP BY label),
         |c AS (SELECT label,
         |  $ccomps
         |  FROM c0),
         |g0 AS (SELECT count(*) AS n,
         |  $qsums
         |  FROM embeddings),
         |g AS (SELECT
         |  $gcomps
         |  FROM g0),
         |coh AS (
         |  SELECT e.label, count(*) AS n_vecs,
         |    sum(CAST(round(1e6 * round(($dotEC)
         |          / (sqrt($normE) * sqrt($normC)), 6)) AS BIGINT)) AS ssq
         |  FROM embeddings e JOIN c ON e.label = c.label
         |  GROUP BY e.label)
         |SELECT coh.label, n_vecs,
         |  CAST(CASE WHEN ssq >= 0
         |       THEN (2 * ssq + n_vecs) // (2 * n_vecs)
         |       ELSE -((-2 * ssq + n_vecs) // (2 * n_vecs)) END
         |    AS DOUBLE) / 1e6 AS cohesion,
         |  round(($dotCG) / (sqrt($normC) * sqrt($normG)), 6) AS sep_global
         |FROM coh JOIN c ON coh.label = c.label CROSS JOIN g
         |ORDER BY coh.label""".stripMargin
    },
    "q_vec_ivfpq_topk" ->
      s"""WITH cells AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(1, 5),
         |      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |                THEN power(2.0, i - 1) ELSE 0.0 END)) AS BIGINT) AS cell,
         |    $duckPqCodes AS codes
         |  FROM embeddings),
         |q AS (SELECT cell AS qcell, codes AS qcodes, embedding AS qv
         |      FROM cells WHERE vec_id = 0)
         |SELECT vec_id, cell,
         |  CAST(list_sum([bit_count(xor(codes[i+1], qcodes[i+1]))
         |                 for i in range(0, 8)]) AS INTEGER) AS pq_dist,
         |  round(${duckCos("embedding", "qv")}, 6) AS cos_sim
         |FROM cells, q WHERE cell = qcell AND vec_id <> 0
         |ORDER BY pq_dist, vec_id LIMIT 10""".stripMargin,
    "q_vec_hard_negatives" ->
      s"""WITH a AS (SELECT vec_id AS anchor_id, label AS anchor_label,
         |             embedding AS av
         |           FROM embeddings WHERE vec_id < 4),
         |s AS (SELECT anchor_id, anchor_label, vec_id, label,
         |        round(${duckCos("embedding", "av")}, 6) AS cos_sim
         |      FROM embeddings, a WHERE label <> anchor_label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
         |        ORDER BY cos_sim DESC, vec_id) AS neg_rank
         |      FROM s)
         |SELECT anchor_id, anchor_label, vec_id, label, cos_sim, neg_rank
         |FROM r WHERE neg_rank <= 5 ORDER BY anchor_id, neg_rank""".stripMargin,
    "q_vec_outliers" -> {
      val cdefs = (0 until 64)
        .map(i => s"round(avg(CAST(embedding[${i + 1}] AS DOUBLE)), 6) AS c${i}")
        .mkString(",\n  ")
      val dist2 = (0 until 64)
        .map(i => s"(CAST(embedding[${i + 1}] AS DOUBLE) - c$i) * " +
          s"(CAST(embedding[${i + 1}] AS DOUBLE) - c$i)")
        .mkString(" + ")
      s"""WITH cent AS (SELECT label,
         |  $cdefs
         |  FROM embeddings GROUP BY label),
         |d AS (SELECT e.label, e.vec_id,
         |        round(sqrt($dist2), 6) AS dist
         |      FROM embeddings e JOIN cent USING (label)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY label
         |        ORDER BY dist DESC, vec_id) AS outlier_rank FROM d)
         |SELECT label, vec_id, dist, outlier_rank
         |FROM r WHERE outlier_rank <= 3 ORDER BY label, outlier_rank""".stripMargin
    },
    "q_vec_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label,
         |  round(${duckCos("embedding", "qv")}, 6) AS cos_sim
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_vec_mmr" ->
      mmrTwin(queryId = 0L, k = 5, pool = 20, lambdaNum = 7L, lambdaDen = 10L),
    "q_vec_ivf_topk" ->
      s"""WITH cells AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(1, 5),
         |      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |                THEN power(2.0, i - 1) ELSE 0.0 END)) AS BIGINT) AS cell
         |  FROM embeddings),
         |q AS (SELECT embedding AS qv, cell AS qcell FROM cells WHERE vec_id = 0)
         |SELECT vec_id, cell,
         |  round(${duckCos("embedding", "qv")}, 6) AS cos_sim
         |FROM cells, q WHERE cell = qcell AND vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "q_vec_neardup" ->
      s"""SELECT a, b, cos_sim FROM (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |    round(${duckCos("x.embedding", "y.embedding")}, 6) AS cos_sim
         |  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
         |  WHERE x.vec_id <= 500 AND y.vec_id <= 500)
         |WHERE cos_sim >= 0.4 ORDER BY a, b""".stripMargin,
    // the sign-bit cell() bucketing is deterministic arithmetic, so the
    // LSH candidate generation itself is oracle-checkable: same cells CTE
    // as q_vec_ivf_topk, self-joined on cell
    "q_vec_neardup_lsh" ->
      s"""WITH n AS (SELECT count(*) AS n_vec FROM embeddings),
         |b AS (SELECT CASE WHEN n_vec <= 4096 THEN 4 WHEN n_vec <= 8192 THEN 5 WHEN n_vec <= 16384 THEN 6 WHEN n_vec <= 32768 THEN 7 WHEN n_vec <= 65536 THEN 8 WHEN n_vec <= 131072 THEN 9 WHEN n_vec <= 262144 THEN 10 WHEN n_vec <= 524288 THEN 11 WHEN n_vec <= 1048576 THEN 12 WHEN n_vec <= 2097152 THEN 13 WHEN n_vec <= 4194304 THEN 14 WHEN n_vec <= 8388608 THEN 15 WHEN n_vec <= 16777216 THEN 16 WHEN n_vec <= 33554432 THEN 17 WHEN n_vec <= 67108864 THEN 18 WHEN n_vec <= 134217728 THEN 19 ELSE 20 END AS bits FROM n),
         |cells AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(1, bits + 1),
         |      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |                THEN power(2.0, i - 1) ELSE 0.0 END)) AS BIGINT) AS cell
         |  FROM embeddings CROSS JOIN b)
         |SELECT a, b, cos_sim FROM (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |    round(${duckCos("x.embedding", "y.embedding")}, 6) AS cos_sim
         |  FROM cells x JOIN cells y
         |    ON x.cell = y.cell AND x.vec_id < y.vec_id)
         |WHERE cos_sim >= 0.4 ORDER BY a, b""".stripMargin,
    // same corpus-adaptive bit chain as q_vec_neardup_lsh — the
    // constant-bits original was the O(n^2/16) defect the honest x100
    // sweep caught at 277 s
    "q_vec_semdedup" ->
      s"""WITH n AS (SELECT count(*) AS n_vec FROM embeddings),
         |b AS (SELECT CASE WHEN n_vec <= 4096 THEN 4 WHEN n_vec <= 8192 THEN 5 WHEN n_vec <= 16384 THEN 6 WHEN n_vec <= 32768 THEN 7 WHEN n_vec <= 65536 THEN 8 WHEN n_vec <= 131072 THEN 9 WHEN n_vec <= 262144 THEN 10 WHEN n_vec <= 524288 THEN 11 WHEN n_vec <= 1048576 THEN 12 WHEN n_vec <= 2097152 THEN 13 WHEN n_vec <= 4194304 THEN 14 WHEN n_vec <= 8388608 THEN 15 WHEN n_vec <= 16777216 THEN 16 WHEN n_vec <= 33554432 THEN 17 WHEN n_vec <= 67108864 THEN 18 WHEN n_vec <= 134217728 THEN 19 ELSE 20 END AS bits FROM n),
         |cells AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(1, bits + 1),
         |      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |                THEN power(2.0, i - 1) ELSE 0.0 END)) AS BIGINT) AS cell
         |  FROM embeddings CROSS JOIN b)
         |SELECT y.vec_id, y.cell,
         |  CASE WHEN min(x.vec_id) IS NULL THEN 'kept' ELSE 'dropped' END
         |    AS status,
         |  min(x.vec_id) AS dropped_by
         |FROM cells y LEFT JOIN cells x
         |  ON x.cell = y.cell AND x.vec_id < y.vec_id
         | AND round(${duckCos("x.embedding", "y.embedding")}, 6) >= 0.4
         |GROUP BY y.vec_id, y.cell ORDER BY y.vec_id""".stripMargin,
    "q_vec_ivf_probe_curve" ->
      s"""WITH cells AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(1, 5),
         |      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |                THEN power(2.0, i - 1) ELSE 0.0 END)) AS BIGINT) AS cell
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS qv, cell AS qcell
         |      FROM cells WHERE vec_id < 8),
         |ranked AS (
         |  SELECT q_id, cell, CAST(row_number() OVER (
         |      PARTITION BY q_id ORDER BY
         |        abs((cell // 1) % 2 - (qcell // 1) % 2)
         |      + abs((cell // 2) % 2 - (qcell // 2) % 2)
         |      + abs((cell // 4) % 2 - (qcell // 4) % 2)
         |      + abs((cell // 8) % 2 - (qcell // 8) % 2), cell)
         |    AS BIGINT) AS crank
         |  FROM q CROSS JOIN (SELECT DISTINCT cell FROM cells)),
         |sims AS (
         |  SELECT q.q_id, c.vec_id, r.crank,
         |    round(${duckCos("c.embedding", "qv")}, 6) AS sim
         |  FROM cells c
         |  JOIN q ON c.vec_id <> q.q_id
         |  JOIN ranked r ON r.q_id = q.q_id AND r.cell = c.cell),
         |rf AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
         |       FROM sims),
         |ps AS (SELECT unnest([1, 2, 4, 8]) AS probes),
         |pi AS (SELECT s.*, probes FROM sims s CROSS JOIN ps
         |       WHERE s.crank <= probes),
         |ri AS (SELECT q_id, probes, vec_id, row_number() OVER (
         |         PARTITION BY q_id, probes ORDER BY sim DESC, vec_id) AS rn
         |       FROM pi),
         |ov AS (SELECT pa.probes, fa.q_id, count(*) AS n_ov
         |       FROM (SELECT q_id, vec_id FROM rf WHERE rn <= 10) fa
         |       JOIN (SELECT q_id, probes, vec_id FROM ri WHERE rn <= 10) pa
         |         USING (q_id, vec_id)
         |       GROUP BY 1, 2),
         |nc AS (SELECT probes, q_id, count(*) AS cands
         |       FROM pi GROUP BY 1, 2),
         |grid AS (SELECT q_id, probes FROM q CROSS JOIN ps)
         |SELECT probes, CAST(sum(coalesce(nc.cands, 0)) AS BIGINT)
         |    AS total_cands,
         |  CAST((2 * 1000000 * sum(coalesce(ov.n_ov, 0)) + count(*) * 10)
         |       // (2 * count(*) * 10) AS DOUBLE) / 1e6 AS mean_recall,
         |  CAST(min(coalesce(ov.n_ov, 0)) AS DOUBLE) / 10.0 AS min_recall
         |FROM grid LEFT JOIN ov USING (q_id, probes)
         |          LEFT JOIN nc USING (q_id, probes)
         |GROUP BY probes ORDER BY probes""".stripMargin,
    "q_vec_sem_decontam" ->
      s"""WITH ev AS (SELECT embedding AS evv FROM embeddings
         |            WHERE vec_id % 20 = 0 AND vec_id < 10000),
         |sims AS (
         |  SELECT t.vec_id, t.label,
         |    CAST(round(${duckCos("t.embedding", "e.evv")} * 1e6, 0) AS BIGINT)
         |      AS simq
         |  FROM embeddings t, ev e WHERE t.vec_id % 20 <> 0),
         |ms AS (SELECT vec_id, label, max(simq) AS msimq
         |       FROM sims GROUP BY 1, 2)
         |SELECT label, count(*) AS n_train,
         |  CAST(sum(CASE WHEN msimq >= 350000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged,
         |  CAST(max(msimq) AS DOUBLE) / 1e6 AS max_maxsim,
         |  CAST(CASE WHEN sum(msimq) >= 0
         |       THEN (2 * sum(msimq) + count(*)) // (2 * count(*))
         |       ELSE -((-2 * sum(msimq) + count(*)) // (2 * count(*))) END
         |    AS DOUBLE) / 1e6 AS mean_maxsim
         |FROM ms GROUP BY label ORDER BY label""".stripMargin,
    "q_vec_hubness" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 50),
         |cand AS (
         |  SELECT q.q_id, e.vec_id,
         |    round(${duckCos("e.embedding", "q.qv")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
         |r AS (SELECT q_id, vec_id,
         |        row_number() OVER (PARTITION BY q_id
         |          ORDER BY sim DESC, vec_id) AS rk
         |      FROM cand),
         |occs AS (SELECT vec_id, count(*) AS occ FROM r WHERE rk <= 10
         |         GROUP BY 1)
         |SELECT occ AS occurrences, count(*) AS n_vectors
         |FROM occs GROUP BY 1 ORDER BY occurrences""".stripMargin,
    "q_vec_batch_topk" ->
      s"""WITH cells AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(1, 5),
         |      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |                THEN power(2.0, i - 1) ELSE 0.0 END)) AS BIGINT) AS cell
         |  FROM embeddings),
         |cand AS (
         |  SELECT q.vec_id AS query_id, c.vec_id,
         |    round(${duckCos("c.embedding", "q.embedding")}, 6) AS cos_sim
         |  FROM cells q JOIN cells c
         |    ON q.cell = c.cell AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 8),
         |r AS (SELECT query_id, vec_id, cos_sim,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rk
         |      FROM cand)
         |SELECT query_id, rk, vec_id, cos_sim FROM r WHERE rk <= 5
         |ORDER BY query_id, rk""".stripMargin,
    "q_vec_quant_recall" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |dqe AS (SELECT vec_id, embedding,
         |          list_transform(
         |            list_transform(embedding, x -> CAST(x AS DOUBLE)),
         |            x -> round(x * 127.0 / greatest(list_max(list_transform(
         |                   list_transform(embedding, y -> CAST(y AS DOUBLE)),
         |                   y -> abs(y))), 1e-12))
         |                 * greatest(list_max(list_transform(
         |                   list_transform(embedding, y -> CAST(y AS DOUBLE)),
         |                   y -> abs(y))), 1e-12) / 127.0) AS dqv
         |        FROM embeddings),
         |sims AS (
         |  SELECT q.q_id, e.vec_id,
         |    round(${duckCos("e.embedding", "qv")}, 6) AS sim_full,
         |    round(${duckCos("e.dqv", "qv")}, 6) AS sim_q
         |  FROM dqe e, q WHERE e.vec_id <> q.q_id),
         |rf AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY sim_full DESC, vec_id) AS rn
         |       FROM sims),
         |rq AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY sim_q DESC, vec_id) AS rn
         |       FROM sims),
         |ov AS (
         |  SELECT fa.q_id, count(*) AS n_ov
         |  FROM (SELECT q_id, vec_id FROM rf WHERE rn <= 10) fa
         |  JOIN (SELECT q_id, vec_id FROM rq WHERE rn <= 10) qa
         |    USING (q_id, vec_id)
         |  GROUP BY 1)
         |SELECT q_id, CAST(coalesce(n_ov, 0) AS BIGINT) AS n_overlap,
         |  round(coalesce(n_ov, 0) / 10.0, 4) AS overlap_frac
         |FROM q LEFT JOIN ov USING (q_id) ORDER BY q_id""".stripMargin,
    "q_vec_matryoshka" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |sims AS (
         |  SELECT q.q_id, e.vec_id,
         |    round(${duckCos("e.embedding", "qv")}, 6) AS sim_full,
         |    round(${duckCosN("e.embedding", "qv", 16)}, 6) AS sim_pre
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         |rf AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY sim_full DESC, vec_id) AS rn
         |       FROM sims),
         |rp AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY sim_pre DESC, vec_id) AS rn
         |       FROM sims),
         |ov AS (
         |  SELECT fa.q_id, count(*) AS n_ov
         |  FROM (SELECT q_id, vec_id FROM rf WHERE rn <= 10) fa
         |  JOIN (SELECT q_id, vec_id FROM rp WHERE rn <= 10) pa
         |    USING (q_id, vec_id)
         |  GROUP BY 1)
         |SELECT q_id, CAST(coalesce(n_ov, 0) AS BIGINT) AS n_overlap,
         |  round(coalesce(n_ov, 0) / 10.0, 4) AS overlap_frac
         |FROM q LEFT JOIN ov USING (q_id) ORDER BY q_id""".stripMargin,
    "q_vec_pca_component" ->
      s"""WITH ${duckPcaCtes(3)}
         |SELECT CAST(i AS INTEGER) AS dim,
         |  round(mv[i + 1], 6) AS mean_d,
         |  round(vv[i + 1], 6) AS loading
         |FROM range(0, 64) t(i), mv, v3 ORDER BY dim""".stripMargin,
    "q_vec_logreg_model" ->
      s"""WITH ${duckLogRegCtes(3)}
         |SELECT CAST(i AS INTEGER) AS dim,
         |  round(CASE WHEN i = 64 THEN bias ELSE wv[i + 1] END, 6) AS weight
         |FROM range(0, 65) t(i), w3 ORDER BY dim""".stripMargin,
    "q_vec_logreg_eval" ->
      s"""WITH ${duckLogRegCtes(3)},
         |sc AS (SELECT label,
         |         CAST(round((0.5 * (1.0 + z / (1.0 + abs(z)))) * 1e6) AS BIGINT)
         |           AS pq
         |       FROM (SELECT label, list_sum(list_transform(range(1, 65),
         |               i -> CAST(embedding[i] AS DOUBLE) * wv[i])) + bias AS z
         |             FROM embeddings, w3))
         |SELECT label, count(*) AS n,
         |  CAST(sum(CASE WHEN pq >= 500000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pred_pos,
         |  round((CAST(sum(pq) AS DOUBLE) / count(*)) / 1e6, 6) AS mean_p
         |FROM sc GROUP BY label ORDER BY label""".stripMargin,
    "q_vec_sim_pagerank" -> {
      val iters = 5
      val sb = new StringBuilder
      sb ++= s"""WITH nv AS (SELECT count(*) AS n_vec FROM embeddings),
        |bb AS (SELECT CASE WHEN n_vec <= 4096 THEN 4 WHEN n_vec <= 8192 THEN 5 WHEN n_vec <= 16384 THEN 6 WHEN n_vec <= 32768 THEN 7 WHEN n_vec <= 65536 THEN 8 WHEN n_vec <= 131072 THEN 9 WHEN n_vec <= 262144 THEN 10 WHEN n_vec <= 524288 THEN 11 WHEN n_vec <= 1048576 THEN 12 WHEN n_vec <= 2097152 THEN 13 WHEN n_vec <= 4194304 THEN 14 WHEN n_vec <= 8388608 THEN 15 WHEN n_vec <= 16777216 THEN 16 WHEN n_vec <= 33554432 THEN 17 WHEN n_vec <= 67108864 THEN 18 WHEN n_vec <= 134217728 THEN 19 ELSE 20 END AS bits FROM nv),
        |cells AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_sum(list_transform(range(1, bits + 1),
        |      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
        |                THEN power(2.0, i - 1) ELSE 0.0 END)) AS BIGINT) AS cell
        |  FROM embeddings CROSS JOIN bb),
        |prp AS (
        |  SELECT a, b FROM (
        |    SELECT x.vec_id AS a, y.vec_id AS b,
        |      round(${duckCos("x.embedding", "y.embedding")}, 6) AS cos_sim
        |    FROM cells x JOIN cells y
        |      ON x.cell = y.cell AND x.vec_id < y.vec_id)
        |  WHERE cos_sim >= 0.4),
        |edges AS (SELECT a AS src, b AS dst FROM prp
        |          UNION ALL SELECT b AS src, a AS dst FROM prp),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
        |nodes AS (SELECT vec_id FROM embeddings),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |p0 AS (SELECT vec_id, CAST(round(1e9 / n) AS BIGINT) AS pq
        |       FROM nodes, nn)""".stripMargin
      for (t <- 1 to iters) {
        sb ++= s""",
          |c$t AS (SELECT ed.dst, sum(p.pq // ed.deg) AS sc
          |        FROM ed JOIN p${t - 1} p ON ed.src = p.vec_id GROUP BY 1),
          |p$t AS (SELECT nodes.vec_id,
          |          CAST(round(0.15 * 1e9 / nn.n) AS BIGINT)
          |          + CAST(round(coalesce(c.sc, 0) * 0.85) AS BIGINT) AS pq
          |        FROM nodes CROSS JOIN nn
          |        LEFT JOIN c$t c ON nodes.vec_id = c.dst)""".stripMargin
      }
      sb ++= s"""
        |SELECT p.vec_id, round(CAST(p.pq AS DOUBLE) / 1e9, 6) AS pagerank,
        |  coalesce(d.deg, 0) AS n_neighbors
        |FROM p$iters p LEFT JOIN deg d ON p.vec_id = d.src
        |ORDER BY p.vec_id""".stripMargin
      sb.toString
    },
    "q_vec_ivf_recall" ->
      s"""WITH cells AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(range(1, 5),
         |      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
         |                THEN power(2.0, i - 1) ELSE 0.0 END)) AS BIGINT) AS cell
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS qv, cell AS qcell
         |      FROM cells WHERE vec_id < 5),
         |sims AS (
         |  SELECT q.q_id, c.vec_id,
         |    round(${duckCos("c.embedding", "qv")}, 6) AS sim,
         |    c.cell = q.qcell AS in_cell
         |  FROM cells c, q WHERE c.vec_id <> q.q_id),
         |rf AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
         |       FROM sims),
         |ri AS (SELECT q_id, vec_id, row_number() OVER (
         |         PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
         |       FROM sims WHERE in_cell),
         |nc AS (SELECT q_id, count(*) FILTER (WHERE in_cell) AS n_cc
         |       FROM sims GROUP BY 1),
         |ov AS (
         |  SELECT fa.q_id, count(*) AS n_ov
         |  FROM (SELECT q_id, vec_id FROM rf WHERE rn <= 10) fa
         |  JOIN (SELECT q_id, vec_id FROM ri WHERE rn <= 10) pa
         |    USING (q_id, vec_id)
         |  GROUP BY 1)
         |SELECT q.q_id, CAST(coalesce(nc.n_cc, 0) AS BIGINT) AS n_cell_cands,
         |  CAST(coalesce(ov.n_ov, 0) AS BIGINT) AS n_overlap,
         |  round(coalesce(ov.n_ov, 0) / 10.0, 4) AS recall_at_k
         |FROM q LEFT JOIN nc USING (q_id) LEFT JOIN ov USING (q_id)
         |ORDER BY q_id""".stripMargin,
    "q_vec_pca_scores" ->
      s"""WITH ${duckPcaCtes(3)},
         |sc AS (SELECT label,
         |         CAST(round(list_sum(list_transform(range(1, 65),
         |           i -> sh[i] * vv[i])) * 1e6) AS BIGINT) AS sq
         |       FROM sh, v3)
         |SELECT label, count(*) AS n,
         |  round((CAST(sum(sq) AS DOUBLE) / count(*)) / 1e6, 6) AS mean_score,
         |  round(CAST(min(sq) AS DOUBLE) / 1e6, 6) AS min_score,
         |  round(CAST(max(sq) AS DOUBLE) / 1e6, 6) AS max_score
         |FROM sc GROUP BY label ORDER BY label""".stripMargin,
    "q_vec_centroid_norms" -> {
      val dims = (0 until 64)
        .map(i => s"sum(CAST(embedding[${i + 1}] AS DOUBLE)) AS s$i").mkString(",\n  ")
      val normExpr = (0 until 64).map(i => s"(s$i / n) * (s$i / n)").mkString(" + ")
      s"""SELECT label, n, round(sqrt($normExpr), 6) AS centroid_norm FROM (
         |  SELECT label, count(*) AS n,
         |  $dims
         |  FROM embeddings GROUP BY label) ORDER BY label""".stripMargin
    },
    "q_vec_label_affinity" -> {
      val dims = (0 until 64)
        .map(i => s"sum(CAST(embedding[${i + 1}] AS DOUBLE)) AS s$i").mkString(",\n  ")
      val comps = (0 until 64).map(i => s"s$i / n AS c$i").mkString(",\n  ")
      val dot = (0 until 64).map(i => s"a.c$i * b.c$i").mkString(" + ")
      val na = (0 until 64).map(i => s"a.c$i * a.c$i").mkString(" + ")
      val nb = (0 until 64).map(i => s"b.c$i * b.c$i").mkString(" + ")
      s"""WITH c0 AS (SELECT label, count(*) AS n,
         |  $dims
         |  FROM embeddings GROUP BY label),
         |c AS (SELECT label,
         |  $comps
         |  FROM c0)
         |SELECT a.label AS la, b.label AS lb,
         |  round(($dot) / (sqrt($na) * sqrt($nb)), 6) AS cos_sim
         |FROM c a JOIN c b ON a.label < b.label
         |ORDER BY la, lb""".stripMargin
    },
    "q_text_prefix_dups" ->
      """SELECT pfx_fp, count(*) AS n_docs,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM (SELECT doc_id,
        |        substr(md5(array_to_string(string_split(text, ' ')[1:8], ' ')), 1, 16)
        |          AS pfx_fp
        |      FROM documents)
        |GROUP BY pfx_fp HAVING count(*) > 1
        |ORDER BY n_docs DESC, pfx_fp""".stripMargin,
    "q_vec_dim_stats" ->
      """WITH x AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
        |             unnest(range(0, 64)) AS dim
        |           FROM embeddings)
        |SELECT dim, count(*) AS n,
        |  round(sum(x) / count(*), 6) AS mean,
        |  round(sqrt((sum(x * x) - sum(x) * sum(x) / count(*)) / (count(*) - 1)), 4)
        |    AS std,
        |  min(x) AS min_x, max(x) AS max_x
        |FROM x GROUP BY dim ORDER BY dim""".stripMargin,
    "q_text_hybrid_topk" -> {
      val bmBody =
        """SELECT doc_id,
          |  round(
          |    ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
          |      * len(list_filter(t, x -> x = 'spark'))::DOUBLE * 2.2
          |      / (len(list_filter(t, x -> x = 'spark'))::DOUBLE
          |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl))
          |  + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
          |      * len(list_filter(t, x -> x = 'hash'))::DOUBLE * 2.2
          |      / (len(list_filter(t, x -> x = 'hash'))::DOUBLE
          |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl))
          |  + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
          |      * len(list_filter(t, x -> x = 'join'))::DOUBLE * 2.2
          |      / (len(list_filter(t, x -> x = 'join'))::DOUBLE
          |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl)), 6) AS bm25
          |FROM t, st""".stripMargin
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(t)) AS avgdl,
         |  sum(CASE WHEN list_contains(t, 'spark') THEN 1.0 ELSE 0.0 END) AS df0,
         |  sum(CASE WHEN list_contains(t, 'hash') THEN 1.0 ELSE 0.0 END) AS df1,
         |  sum(CASE WHEN list_contains(t, 'join') THEN 1.0 ELSE 0.0 END) AS df2
         |  FROM t),
         |sc AS ($bmBody),
         |bm AS (SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_bm
         |       FROM (SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
         |             ORDER BY bm25 DESC, doc_id LIMIT 20)),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cz AS (SELECT vec_id, round(${duckCos("embedding", "qv")}, 6) AS cos_sim
         |       FROM embeddings, q WHERE vec_id <> 0
         |       ORDER BY cos_sim DESC, vec_id LIMIT 20),
         |cs AS (SELECT vec_id AS doc_id,
         |         CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS r_cos
         |       FROM cz)
         |SELECT coalesce(bm.doc_id, cs.doc_id) AS doc_id,
         |  round(coalesce(1.0 / (60 + r_bm), 0) + coalesce(1.0 / (60 + r_cos), 0), 6)
         |    AS rrf,
         |  r_bm, r_cos
         |FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
    },
    // RBO over the same two ranker CTEs as q_text_hybrid_topk; per-depth
    // contributions nano-quantized; (1-p) written as the same subtraction
    // both engines — two literals for "0.1" are two different doubles
    "q_text_ranker_rbo" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |st AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(t)) AS avgdl,
         |  sum(CASE WHEN list_contains(t, 'spark') THEN 1.0 ELSE 0.0 END) AS df0,
         |  sum(CASE WHEN list_contains(t, 'hash') THEN 1.0 ELSE 0.0 END) AS df1,
         |  sum(CASE WHEN list_contains(t, 'join') THEN 1.0 ELSE 0.0 END) AS df2
         |  FROM t),
         |sc AS (SELECT doc_id,
         |  round(
         |    ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
         |      * len(list_filter(t, x -> x = 'spark'))::DOUBLE * 2.2
         |      / (len(list_filter(t, x -> x = 'spark'))::DOUBLE
         |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl))
         |  + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
         |      * len(list_filter(t, x -> x = 'hash'))::DOUBLE * 2.2
         |      / (len(list_filter(t, x -> x = 'hash'))::DOUBLE
         |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl))
         |  + ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5))
         |      * len(list_filter(t, x -> x = 'join'))::DOUBLE * 2.2
         |      / (len(list_filter(t, x -> x = 'join'))::DOUBLE
         |         + 1.2 * (0.25 + 0.75 * len(t)::DOUBLE / avgdl)), 6) AS bm25
         |  FROM t, st),
         |bm AS (SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_bm
         |       FROM (SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
         |             ORDER BY bm25 DESC, doc_id LIMIT 20)),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cz AS (SELECT vec_id, round(${duckCos("embedding", "qv")}, 6) AS cos_sim
         |       FROM embeddings, q WHERE vec_id <> 0
         |       ORDER BY cos_sim DESC, vec_id LIMIT 20),
         |cs AS (SELECT vec_id AS doc_id,
         |         CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS r_cos
         |       FROM cz),
         |agree AS (SELECT bm.doc_id, r_bm, r_cos
         |          FROM bm JOIN cs ON bm.doc_id = cs.doc_id),
         |depths AS (SELECT CAST(unnest(range(1, 21)) AS INTEGER) AS dpt),
         |ovd AS (SELECT dpt, count(b.doc_id) AS ov
         |        FROM depths d LEFT JOIN agree b
         |          ON b.r_bm <= d.dpt AND b.r_cos <= d.dpt
         |        GROUP BY dpt),
         |c AS (SELECT dpt, ov,
         |        CAST(round(power(0.9, dpt - 1) * ov / dpt * 1e9) AS BIGINT) AS cq
         |      FROM ovd)
         |SELECT 20 AS k,
         |  CAST(max(CASE WHEN dpt = 20 THEN ov END) AS BIGINT) AS overlap_at_k,
         |  round((1.0 - 0.9) * CAST(sum(cq) AS BIGINT) / 1e9, 6) AS rbo
         |FROM c""".stripMargin,
    "q_media_frames" ->
      """SELECT doc_id AS media_id, i AS frame_idx,
        |  md5(text || '#' || CAST(i AS VARCHAR)) AS frame_fp
        |FROM documents, (SELECT unnest(range(3)) AS i)
        |WHERE doc_id % 3 = 2
        |ORDER BY media_id, frame_idx""".stripMargin,
    "q_vec_centroids" ->
      """SELECT label, count(*) AS n,
        |  round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c0,
        |  round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c1,
        |  round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS c2,
        |  round(avg(CAST(embedding[4] AS DOUBLE)), 6) AS c3
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q_media_decode_plan" ->
      """WITH m AS (SELECT
        |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
        |      AS modality,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT modality,
        |  CAST(length(bin(n_bytes)) - 1 AS INTEGER) AS size_bucket,
        |  count(*) AS n_items,
        |  CAST(sum(n_bytes) AS BIGINT) AS bytes_total,
        |  CAST(sum(n_bytes) + 4194303 AS BIGINT) // 4194304 AS n_partitions
        |FROM m GROUP BY 1, 2 ORDER BY modality, size_bucket""".stripMargin,
    "q_media_metadata" ->
      """SELECT doc_id AS media_id,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS checksum,
        |  substring(hex(encode(text)), 1, 16) AS magic
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_media_dedup" ->
      """WITH g AS (SELECT
        |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
        |      AS modality,
        |    md5(text) AS checksum,
        |    count(*) AS cnt,
        |    min(CAST(octet_length(encode(text)) AS BIGINT)) AS n_bytes
        |  FROM documents GROUP BY 1, 2)
        |SELECT modality, CAST(sum(cnt) AS BIGINT) AS n_media,
        |  count(*) AS n_distinct,
        |  CAST(sum(cnt - 1) AS BIGINT) AS n_dup_copies,
        |  CAST(sum(cnt * n_bytes) AS BIGINT) AS bytes_total,
        |  CAST((2 * 1000000 * (sum(cnt * n_bytes) - sum(n_bytes))
        |        + greatest(sum(cnt * n_bytes), 1))
        |       // (2 * greatest(sum(cnt * n_bytes), 1)) AS DOUBLE) / 1e6
        |    AS savings
        |FROM g GROUP BY modality ORDER BY modality""".stripMargin,
    "q_media_features_meta" ->
      """SELECT doc_id AS media_id,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,
    // the stub decoder's f0/f1 are byte-class histogram fractions
    // (byte % 8 = 0 / 1); the corpus is pure ASCII (bytes = chars), so a
    // regex char-class count reproduces them exactly — the mapPartitions
    // decode stage is hash-verified end to end, fake features included
    "q_media_features" ->
      """SELECT doc_id AS media_id,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS checksum,
        |  round((strlen(text) - strlen(regexp_replace(text, '[ (08@HPX`hpx]', '', 'g')))::DOUBLE
        |        / greatest(strlen(text), 1), 6) AS f0,
        |  round((strlen(text) - strlen(regexp_replace(text, '[!)19AIQYaiqy]', '', 'g')))::DOUBLE
        |        / greatest(strlen(text), 1), 6) AS f1
        |FROM documents ORDER BY media_id""".stripMargin,
    // int8 roundtrip reconstruction error; per-vector errors quantize to
    // nano-units before the label sums (order-independent), max is free
    "q_vec_quant_error" ->
      """WITH e AS (SELECT label,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT label, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS ma
        |      FROM e),
        |r AS (SELECT label, v,
        |        list_transform(v, x -> x - round(x * 127.0 / ma) * ma / 127.0)
        |          AS dv
        |      FROM m),
        |s2 AS (SELECT label, len(v) AS dim,
        |         list_sum(list_transform(dv, x -> x * x)) AS err_sq,
        |         list_sum(list_transform(v, x -> x * x)) AS norm_sq
        |       FROM r),
        |qn AS (SELECT label,
        |         CAST(round(err_sq / greatest(norm_sq, 1e-12) * 1e9) AS BIGINT)
        |           AS rq,
        |         CAST(round(err_sq / CAST(dim AS DOUBLE) * 1e9) AS BIGINT)
        |           AS mq
        |       FROM s2)
        |SELECT label, count(*) AS n_vecs,
        |  round(CAST(sum(rq) AS DOUBLE) / count(*) / 1e9, 6) AS avg_rel_err,
        |  round(CAST(max(rq) AS DOUBLE) / 1e9, 6) AS max_rel_err,
        |  round(CAST(sum(mq) AS DOUBLE) / count(*) / 1e9, 6) AS avg_mse
        |FROM qn GROUP BY label ORDER BY label""".stripMargin,
    "q_vec_quantize" ->
      """WITH e AS (SELECT vec_id, label,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, label, v,
        |        greatest(list_max(list_transform(v, x -> abs(x))), 1e-12)
        |          AS max_abs
        |      FROM e),
        |q AS (SELECT vec_id, label, max_abs,
        |        list_transform(v, x -> CAST(round(x * 127.0 / max_abs)
        |                                    AS INTEGER)) AS qv
        |      FROM m)
        |SELECT vec_id, label, round(max_abs, 6) AS max_abs,
        |  qv[1] AS q0, qv[2] AS q1, qv[3] AS q2, qv[4] AS q3,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_media_resize" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |             (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
        |               AS modality,
        |             encode(text) AS payload
        |           FROM documents),
        |h AS (SELECT media_id, modality,
        |        CAST(octet_length(payload) AS INTEGER) AS n_bytes,
        |        hex(payload) AS hx FROM m),
        |r AS (SELECT media_id, modality, n_bytes,
        |        least(64, CAST(ceil(n_bytes / 4.0) AS INTEGER)) AS n_out, hx
        |      FROM h),
        |x AS (SELECT media_id, modality, n_bytes, n_out,
        |        array_to_string(list_transform(range(0, n_out),
        |          i -> substring(hx, CAST(i*8 + 1 AS INTEGER), 2)), '')
        |          AS resized_hex
        |      FROM r)
        |SELECT media_id, modality, n_bytes, n_out AS n_resized_bytes,
        |  resized_hex, md5(resized_hex) AS resized_fp
        |FROM x ORDER BY media_id""".stripMargin)

  // ---- public contract -----------------------------------------------------

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    logQueries ++ relQueries ++ tsQueries ++ textQueries ++ prepQueries ++ vecQueries

  /** Oracle twins that REPLAY the engine's own algorithm as unrolled SQL
    * (greedy/iterative operators with no independent deterministic SQL
    * formulation — MMR's argmax chain, Lloyd's rounds, power iteration,
    * GD epochs, BPE merges, the k-core peel). A replay twin proves
    * engine≡twin DETERMINISM, not correctness; the correctness evidence
    * is an independent brute-force property spec, linked to the query id
    * by a `brute-force anchor: <id>` tag in the spec source. RegistrySpec
    * lints the pairing at build time, so a future replay twin cannot land
    * without its independent check (VERDICT r11 #5).
    */
  def replayTwins: Set[String] = Set(
    "q_vec_mmr",
    "q_vec_ivf_kmeans", "q_vec_kmeans_cells",
    "q_vec_pca_component", "q_vec_pca_scores",
    "q_vec_logreg_model", "q_vec_logreg_eval",
    "q_vec_sim_pagerank", "q_vec_ivf_probe_curve",
    "q_text_bpe_merges", "q_text_bpe_fertility",
    "q_dedup_kcore")

  /** DuckDB twins. Keys absent here (minhash/simhash/langid/media features)
    * use engine-specific hashing or stubbed decodes → rows-only check.
    */
  def oracleSql: Map[String, String] =
    logOracles ++ relOracles ++ subqueryOracles ++ scalarOracles ++ tsOracles ++ textOracles ++ prepOracles ++ vecOracles
}
